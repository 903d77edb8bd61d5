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
  def bpeMerges(df: DataFrame, textCol: String, rounds: Int,
      batchK: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rounds >= 1, "need rounds >= 1")
    val words = df
      .select(explode(filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
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
