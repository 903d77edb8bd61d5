package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer training (Sennrich et al. 2016, "Neural
 * Machine Translation of Rare Words with Subword Units") — the
 * vocabulary-learning step of a training-data pipeline, distributed the
 * Spark-declarative way.
 *
 * Word-level BPE: the corpus is reduced ONCE to (distinct word, count) —
 * Zipf-bounded, so every later round works on vocabulary-sized data, not
 * corpus-sized. Each round counts adjacent symbol pairs weighted by word
 * frequency (one shuffle over the vocabulary), picks the most frequent
 * pair (count desc, pair string asc — a total, engine-independent order),
 * and applies the merge as a literal left-to-right non-overlapping string
 * replace on the space-joined, space-sentineled symbol form.
 *
 * Merge-application semantics, precisely: the pattern ` a b ` consumes
 * its trailing space, so inside a run of the same winning pair the next
 * match needs a fresh leading space — `a a a a` merges to `(aa, a, a)`,
 * where reference BPE implementations that rescan from the merged token
 * produce `(aa, aa)`. Outside same-symbol runs the two agree. The
 * upside bought with that corner: `replace` has these exact
 * non-rescanning semantics in Spark AND standard SQL engines, so the
 * whole training (and the encode below) replays bit-identically in an
 * external engine — which is what makes the pipeline auditable.
 *
 * Only ONE (pair, freq) row reaches the driver per round; the symbol
 * table stays distributed. At 100 TB the vocabulary reduction is the one
 * corpus-sized shuffle; rounds then cost vocabulary-sized scans —
 * reference implementations keep incremental pair-count deltas instead,
 * which is the same asymptotic work re-expressed iteratively.
 */
object Bpe {

  /**
   * Learn `rounds` BPE merges from `textCol`. Tokenization: trim + split
   * on whitespace runs, empty tokens dropped, case-sensitive (the corpus
   * convention shared with [[Dedup.tokenJaccardPairs]]).
   *
   * Returns (round, lhs, rhs, freq): merge number (1-based), the merged
   * symbol pair, and its weighted occurrence count at pick time.
   *
   * `batchK` (default 1) is the production-scale path: each DRIVER round
   * collects the top candidate pairs once and greedily applies up to
   * `batchK` of them that are symbol-disjoint (no lhs/rhs/merged symbol
   * shared between picks — disjoint merges cannot interact, so each is
   * applied against the same pair statistics it was ranked under). This is
   * standard batched BPE: a 32k-merge train needs ~32k/batchK driver
   * round-trips instead of 32k. batchK = 1 reproduces classic sequential
   * BPE exactly (the oracle-replayable path); batched picks can diverge
   * from sequential order when a merge would have changed the counts of a
   * later pick in the same batch, which is the documented approximation.
   */
  /** Vocabulary cap for the driver-incremental exact path: (word, cnt)
    * pairs collected to the driver. ~60 MB at the default; override with
    * spark conf `graft.bpe.maxDriverVocab` (0 disables the driver path). */
  private val DefaultMaxDriverVocab = 2000000L

  def bpeMerges(df: DataFrame, textCol: String, rounds: Int,
      batchK: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rounds >= 1, "need rounds >= 1")
    val words = df
      .select(explode(filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

    // Exact-and-fast dispatch (batchK <= 1 = the sequential-semantics
    // contract): after the ONE corpus-sized shuffle reduces to (word, cnt),
    // probe whether the vocabulary fits the driver cap (cap+1 limit — the
    // AsOfJoin discipline, never an unguarded collect). If it fits, run the
    // classic incremental-pair-count merge loop in driver memory: bit-equal
    // to the distributed sequential loop (BpeSpec pins parity) at ZERO Spark
    // jobs per merge instead of one full recount each — the 32k-merge train
    // becomes 2 jobs + driver compute. Oversized vocabularies fall through
    // to the distributed sequential loop below (exact, 1 job/merge).
    if (batchK <= 1) {
      val cap = spark.conf.getOption("graft.bpe.maxDriverVocab")
        .map(_.toLong).getOrElse(DefaultMaxDriverVocab)
      if (cap > 0) {
        val probeCap = math.min(cap, (Int.MaxValue - 2).toLong).toInt
        val probe = words.limit(probeCap + 1).collect()
        if (probe.length <= probeCap) {
          val vocab = probe.map(r => (r.getString(0), r.getLong(1)))
          val merges = mergesInMemory(vocab, rounds)
          return spark.createDataset(merges).toDF("round", "lhs", "rhs", "freq")
        }
      }
    }
    // ' c h a r s ' — leading/trailing sentinels make every adjacency a
    // bounded ' a b ' pattern for the literal replace
    var syms = words.select($"word", $"cnt",
      concat(lit(" "), array_join(filter(split($"word", ""), c => c =!= ""), " "), lit(" ")).as("sym"))
    // adjacent pairs of the current symbol sequence, skipped for 1-symbol
    // words (sequence() would run descending on an empty span)
    val pairsCol = {
      val s = split(trim($"sym"), " ")
      when(size(s) >= 2,
        transform(sequence(lit(1), size(s) - 1),
          i => concat(element_at(s, i), lit(" "), element_at(s, i + 1))))
        .otherwise(array().cast("array<string>"))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    if (batchK <= 1) {
      // sequential path: one driver round-trip per merge, engine-replayable
      var r = 1
      while (r <= rounds) {
        val top = syms.select($"cnt", explode(pairsCol).as("pair"))
          .groupBy("pair").agg(sum($"cnt").as("f"))
          .orderBy(desc("f"), asc("pair")).limit(1)
          .collect()
        if (top.nonEmpty) {
          val pair = top(0).getString(0)
          val Array(a, b) = pair.split(" ", 2)
          out += ((r, a, b, top(0).getLong(1)))
          syms = syms.withColumn("sym",
            replace($"sym", lit(s" $a $b "), lit(s" $a$b ")))
        }
        r += 1
      }
    } else {
      var exhausted = false
      while (out.length < rounds && !exhausted) {
        val want = math.min(batchK, rounds - out.length)
        // over-fetch: the greedy symbol-disjoint filter below discards
        // candidates overlapping an earlier (higher-ranked) pick
        val top = syms.select($"cnt", explode(pairsCol).as("pair"))
          .groupBy("pair").agg(sum($"cnt").as("f"))
          .orderBy(desc("f"), asc("pair")).limit(want * 4)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val used = scala.collection.mutable.Set.empty[String]
          val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          val it = top.iterator
          while (it.hasNext && picked.length < want) {
            val row = it.next()
            val Array(a, b) = row.getString(0).split(" ", 2)
            if (!used(a) && !used(b) && !used(a + b)) {
              used += a; used += b; used += (a + b)
              picked += ((a, b, row.getLong(1)))
            }
          }
          picked.foreach { case (a, b, f) => out += ((out.length + 1, a, b, f)) }
          // one projection applies the whole batch; localCheckpoint cuts the
          // lineage so the plan stays bounded across thousands of merges
          val newSym = picked.foldLeft($"sym": Column) { case (c, (a, b, _)) =>
            replace(c, lit(s" $a $b "), lit(s" $a$b "))
          }
          syms = syms.select($"word", $"cnt", newSym.as("sym")).localCheckpoint()
        }
      }
    }
    spark.createDataset(out.toSeq).toDF("round", "lhs", "rhs", "freq")
  }

  /**
   * Driver-memory exact BPE merge loop over a collected (word, cnt)
   * vocabulary — the classic incremental algorithm (maintain pair counts
   * and an inverted pair -> words index; a merge touches ONLY the words
   * containing its pair), which is what reference tokenizer trainers do.
   * Semantics are IDENTICAL to the distributed sequential loop: same
   * ` a b ` -> ` ab ` literal non-rescanning replace (java.lang.String
   * .replace and Spark's replace share it), same (count desc, pair asc)
   * total order, counts maintained by per-word delta recount (subtract the
   * word's old pair multiset, add its new one) — exact by construction,
   * even for the self-overlap corner where a replaced word still contains
   * the pair (` a b a b ` -> ` ab a b `).
   */
  private[pipeline] def mergesInMemory(
      vocab: Array[(String, Long)], rounds: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    // code-point split (matches Spark's split(word, '') and DuckDB slicing)
    def symForm(w: String): String = {
      val sb = new StringBuilder(" ")
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        sb.appendAll(Character.toChars(cp)); sb.append(' ')
        i += Character.charCount(cp)
      }
      sb.toString
    }
    def wordPairs(sym: String): mutable.HashMap[String, Int] = {
      val toks = sym.trim.split(" ")
      val m = mutable.HashMap.empty[String, Int]
      var i = 0
      while (i < toks.length - 1) {
        val p = toks(i) + " " + toks(i + 1)
        m.update(p, m.getOrElse(p, 0) + 1)
        i += 1
      }
      m
    }
    val n = vocab.length
    val syms = new Array[String](n)
    val cnts = new Array[Long](n)
    val pairF = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[String, mutable.HashSet[Int]]
    var i = 0
    while (i < n) {
      syms(i) = symForm(vocab(i)._1); cnts(i) = vocab(i)._2
      wordPairs(syms(i)).foreach { case (p, m) =>
        pairF.update(p, pairF.getOrElse(p, 0L) + m * cnts(i))
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
      i += 1
    }
    // argmax structure: head = (max f, lexicographically smallest pair)
    val heap = mutable.TreeSet.empty[(Long, String)](Ordering.fromLessThan {
      (a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    })
    pairF.foreach { case (p, f) => heap += ((f, p)) }
    def bump(p: String, delta: Long): Unit = {
      val old = pairF.getOrElse(p, 0L)
      if (old != 0L) heap -= ((old, p))
      val neu = old + delta
      if (neu != 0L) { pairF.update(p, neu); heap += ((neu, p)) }
      else pairF.remove(p)
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    while (r <= rounds && heap.nonEmpty) {
      val (f, pair) = heap.head
      val Array(a, b) = pair.split(" ", 2)
      out += ((r, a, b, f))
      val affected = pairWords.getOrElse(pair, mutable.HashSet.empty).toArray
      val pat = s" $a $b "; val rep = s" $a$b "
      affected.foreach { w =>
        val old = syms(w)
        val neu = old.replace(pat, rep)
        if (neu != old) {
          val oldP = wordPairs(old); val newP = wordPairs(neu)
          (oldP.keySet ++ newP.keySet).foreach { p =>
            val d = newP.getOrElse(p, 0) - oldP.getOrElse(p, 0)
            if (d != 0) bump(p, d.toLong * cnts(w))
            val had = oldP.contains(p); val has = newP.contains(p)
            if (has && !had) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += w
            else if (had && !has) {
              val s = pairWords(p); s -= w
              if (s.isEmpty) pairWords.remove(p)
            }
          }
          syms(w) = neu
        }
      }
      r += 1
    }
    out.toSeq
  }

  /**
   * WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
   * vocabulary learner): identical merge mechanics to BPE, but each
   * round picks the pair maximizing the LIKELIHOOD score
   * count(ab) / (count(a)·count(b)) — the pair whose merge most
   * increases a unigram LM's corpus likelihood — instead of raw
   * frequency. Ties break on the pair string, a total engine-portable
   * order; the score itself is one IEEE double division over exact
   * BIGINT counts, so ordering replays bit-identically cross-engine.
   *
   * Same two-tier execution as [[bpeMerges]]: a cap-probed
   * driver-incremental path (pair counts AND symbol counts maintained by
   * per-word deltas; argmax is a linear scan per round — O(1) Spark
   * jobs for the whole train), falling back to the distributed
   * sequential loop (one pair-count + one symbol-count aggregation per
   * round) when the vocabulary exceeds `graft.bpe.maxDriverVocab`.
   * Encoding a corpus with the learned table is [[bpeEncode]] — the
   * replace chain is representation-identical (the ## continuation
   * prefix some WordPiece vocab files display is a serialization
   * convention, not a training difference).
   *
   * @return (round, lhs, rhs, freq, score): merge number (1-based), the
   *         merged pair, its weighted count and its likelihood score at
   *         pick time (raw double — round at the consumer).
   */
  def wordPieceMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rounds >= 1, "need rounds >= 1")
    val words = df
      .select(explode(filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val cap = spark.conf.getOption("graft.bpe.maxDriverVocab")
      .map(_.toLong).getOrElse(DefaultMaxDriverVocab)
    if (cap > 0) {
      val probeCap = math.min(cap, (Int.MaxValue - 2).toLong).toInt
      val probe = words.limit(probeCap + 1).collect()
      if (probe.length <= probeCap) {
        val vocab = probe.map(r => (r.getString(0), r.getLong(1)))
        val merges = wordPieceInMemory(vocab, rounds)
        return spark.createDataset(merges).toDF("round", "lhs", "rhs", "freq", "score")
      }
    }
    var syms = words.select($"word", $"cnt",
      concat(lit(" "), array_join(filter(split($"word", ""), c => c =!= ""), " "), lit(" ")).as("sym"))
    val pairsCol = {
      val s = split(trim($"sym"), " ")
      when(size(s) >= 2,
        transform(sequence(lit(1), size(s) - 1),
          i => concat(element_at(s, i), lit(" "), element_at(s, i + 1))))
        .otherwise(array().cast("array<string>"))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Double)]
    var r = 1
    while (r <= rounds) {
      val symF = syms.select($"cnt", explode(split(trim($"sym"), " ")).as("s"))
        .groupBy("s").agg(sum($"cnt").as("sf"))
      val top = syms.select($"cnt", explode(pairsCol).as("pair"))
        .groupBy("pair").agg(sum($"cnt").as("pf"))
        .withColumn("a", split($"pair", " ").getItem(0))
        .withColumn("b", split($"pair", " ").getItem(1))
        .join(symF.select($"s".as("a"), $"sf".as("fa")), Seq("a"))
        .join(symF.select($"s".as("b"), $"sf".as("fb")), Seq("b"))
        .withColumn("score",
          $"pf".cast("double") / ($"fa".cast("double") * $"fb".cast("double")))
        .orderBy(desc("score"), asc("pair")).limit(1)
        .select($"pair", $"pf", $"score")
        .collect()
      if (top.nonEmpty) {
        val pair = top(0).getString(0)
        val Array(a, b) = pair.split(" ", 2)
        out += ((r, a, b, top(0).getLong(1), top(0).getDouble(2)))
        syms = syms.withColumn("sym",
          replace($"sym", lit(s" $a $b "), lit(s" $a$b ")))
      }
      r += 1
    }
    spark.createDataset(out.toSeq).toDF("round", "lhs", "rhs", "freq", "score")
  }

  /**
   * Driver-memory WordPiece loop — [[mergesInMemory]]'s incremental
   * delta maintenance extended with a symbol-count table (a merge
   * changes count(a), count(b) and count(ab), which shifts the scores
   * of every pair touching those symbols — so the argmax is a linear
   * scan over the live pair table per round rather than a heap, exact
   * and O(rounds·|pairs|)). Score arithmetic is the identical
   * double-division expression as the distributed path.
   */
  private[pipeline] def wordPieceInMemory(
      vocab: Array[(String, Long)], rounds: Int): Seq[(Int, String, String, Long, Double)] = {
    import scala.collection.mutable
    def symForm(w: String): String = {
      val sb = new StringBuilder(" ")
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        sb.appendAll(Character.toChars(cp)); sb.append(' ')
        i += Character.charCount(cp)
      }
      sb.toString
    }
    def wordPairs(sym: String): mutable.HashMap[String, Int] = {
      val toks = sym.trim.split(" ")
      val m = mutable.HashMap.empty[String, Int]
      var i = 0
      while (i < toks.length - 1) {
        val p = toks(i) + " " + toks(i + 1)
        m.update(p, m.getOrElse(p, 0) + 1)
        i += 1
      }
      m
    }
    def wordSyms(sym: String): mutable.HashMap[String, Int] = {
      val m = mutable.HashMap.empty[String, Int]
      sym.trim.split(" ").foreach(s => m.update(s, m.getOrElse(s, 0) + 1))
      m
    }
    val n = vocab.length
    val syms = new Array[String](n)
    val cnts = new Array[Long](n)
    val pairF = mutable.HashMap.empty[String, Long]
    val symF = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[String, mutable.HashSet[Int]]
    var i = 0
    while (i < n) {
      syms(i) = symForm(vocab(i)._1); cnts(i) = vocab(i)._2
      wordPairs(syms(i)).foreach { case (p, m) =>
        pairF.update(p, pairF.getOrElse(p, 0L) + m * cnts(i))
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
      wordSyms(syms(i)).foreach { case (s, m) =>
        symF.update(s, symF.getOrElse(s, 0L) + m * cnts(i))
      }
      i += 1
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long, Double)]
    var r = 1
    while (r <= rounds && pairF.nonEmpty) {
      // linear-scan argmax: score desc, pair asc
      var bestP: String = null; var bestS = -1.0; var bestF = 0L
      pairF.foreach { case (p, f) =>
        val sp = p.indexOf(' ')
        val s = f.toDouble /
          (symF(p.substring(0, sp)).toDouble * symF(p.substring(sp + 1)).toDouble)
        if (s > bestS || (s == bestS && (bestP == null || p < bestP))) {
          bestP = p; bestS = s; bestF = f
        }
      }
      val Array(a, b) = bestP.split(" ", 2)
      out += ((r, a, b, bestF, bestS))
      val affected = pairWords.getOrElse(bestP, mutable.HashSet.empty).toArray
      val pat = s" $a $b "; val rep = s" $a$b "
      affected.foreach { w =>
        val old = syms(w)
        val neu = old.replace(pat, rep)
        if (neu != old) {
          val oldP = wordPairs(old); val newP = wordPairs(neu)
          (oldP.keySet ++ newP.keySet).foreach { p =>
            val d = newP.getOrElse(p, 0) - oldP.getOrElse(p, 0)
            if (d != 0) {
              val neuF = pairF.getOrElse(p, 0L) + d.toLong * cnts(w)
              if (neuF != 0L) pairF.update(p, neuF) else pairF.remove(p)
            }
            val had = oldP.contains(p); val has = newP.contains(p)
            if (has && !had) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += w
            else if (had && !has) {
              val s = pairWords(p); s -= w
              if (s.isEmpty) pairWords.remove(p)
            }
          }
          val oldS = wordSyms(old); val newS = wordSyms(neu)
          (oldS.keySet ++ newS.keySet).foreach { s =>
            val d = newS.getOrElse(s, 0) - oldS.getOrElse(s, 0)
            if (d != 0) {
              val neuF = symF.getOrElse(s, 0L) + d.toLong * cnts(w)
              if (neuF != 0L) symF.update(s, neuF) else symF.remove(s)
            }
          }
          syms(w) = neu
        }
      }
      r += 1
    }
    out.toSeq
  }

  /**
   * Encode `textCol` words with a learned merge table: apply the merges
   * in round order (same literal replace), then explode one row per
   * (word occurrence position, symbol). The encode side is a pure
   * per-row map — no shuffle; merges ride along as a broadcast-sized
   * literal chain baked into the plan.
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol), posexplode(
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")).as(Seq("word_pos", "word")))
    val sym0 = concat(lit(" "), array_join(filter(split($"word", ""), c => c =!= ""), " "), lit(" "))
    val symFinal = merges.foldLeft(sym0) { case (c, (a, b)) =>
      replace(c, lit(s" $a $b "), lit(s" $a$b "))
    }
    toks.select(col(idCol), $"word_pos", $"word",
      posexplode(split(trim(symFinal), " ")).as(Seq("sym_pos", "symbol")))
  }
}
