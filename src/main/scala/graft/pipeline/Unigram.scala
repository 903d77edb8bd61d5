package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer trainer (SentencePiece's unigram model, Kudo 2018)
 * in the hard-EM (Viterbi) variant, fully relational — the tokenizer-family
 * companion of [[Bpe]] (merge-based) covering the other of the two
 * dominant subword algorithms.
 *
 * Algorithm: seed the vocabulary with the highest-frequency substrings
 * (length <= [[MaxPieceLen]]) plus ALL single characters (feasibility
 * floor); per EM round, segment every distinct word into the
 * maximum-likelihood piece sequence under the current piece log-probs,
 * then re-estimate probs from the chosen-segmentation counts (hard E-step
 * = Viterbi argmax; unused pieces prune themselves — and every word's
 * previous best segmentation survives into the next vocabulary, so
 * segmentation stays feasible by induction).
 *
 * The Viterbi argmax is relational rather than a per-row DP: words are
 * capped at [[MaxWordLen]] chars, so every candidate segmentation is one
 * of the 223 compositions of 1..8 into parts of 1..4 — a LITERAL table
 * (flattened to one row per part, [[compRows]]). Segmenting = one join
 * from words to compositions to the vocabulary, a decimal-folded score
 * sum, and an argmax window over <= 223 rows per word. Per-word work is a
 * constant ~500 piece lookups; the corpus-sized stages are the word-count
 * aggregation (map-side combined) and nothing else — distinct words are
 * Zipf-bounded, so every EM round runs on vocabulary-scale data, the same
 * property [[Bpe]] exploits.
 *
 * Determinism (the cross-engine hash contract): log-probs round to 6
 * decimals, scores fold as decimal(20,6) (order-independent), all argmax
 * ties break on the smallest composition id / lexicographic piece. The
 * entire trainer after word extraction is ONE portable SQL text
 * ([[coreSql]]) executed verbatim by Spark over a `uni_words` view and
 * embedded in the DuckDB oracle behind an engine-specific word-split CTE
 * (the Classifier.evalSelectSql discipline).
 */
object Unigram {
  val MaxWordLen = 8
  val MaxPieceLen = 4

  /** All compositions of n into ordered parts of size 1..MaxPieceLen,
    * enumerated first-part-ascending (the deterministic comp_id order). */
  private def compositions(n: Int): Seq[Seq[Int]] =
    if (n == 0) Seq(Seq.empty)
    else (1 to math.min(MaxPieceLen, n)).flatMap(f => compositions(n - f).map(f +: _))

  /** (n, comp_id, nparts, part_idx, off, len) — one row per composition part. */
  lazy val compRows: Seq[(Int, Int, Int, Int, Int, Int)] =
    for {
      n <- 1 to MaxWordLen
      (comp, ci) <- compositions(n).zipWithIndex
      offs = comp.scanLeft(1)(_ + _)
      (len, pi) <- comp.zipWithIndex
    } yield (n, ci + 1, comp.length, pi + 1, offs(pi), len)

  /** (n, off, len) — every substring slot of a length-n word up to MaxPieceLen. */
  lazy val subRows: Seq[(Int, Int, Int)] =
    for {
      n <- 1 to MaxWordLen
      off <- 1 to n
      len <- 1 to math.min(MaxPieceLen, n - off + 1)
    } yield (n, off, len)

  private def valuesSql(rows: Seq[Product]): String =
    rows.map(_.productIterator.mkString("(", ", ", ")")).mkString(", ")

  /**
   * The trainer as portable SQL (no leading WITH): expects a
   * `uni_words(word, freq)` relation of distinct words (1..MaxWordLen
   * chars); emits the top-`topK` vocabulary as (rank, piece, cnt, logp).
   */
  def coreSql(rounds: Int = 2, seedSize: Int = 150, topK: Int = 30,
              wordsRel: String = "uni_words"): String = {
    require(topK >= 1)
    s"""${cteChainSql(rounds, seedSize, wordsRel)}
       |SELECT cast(rk as int) AS rank, piece, cast(cnt as bigint) AS cnt,
       |  lp + 0.0 AS logp
       |FROM (SELECT piece, cnt, lp,
       |    row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |  FROM t$rounds) x
       |WHERE rk <= $topK ORDER BY rk""".stripMargin
  }

  /** The trainer's CTE chain alone (comps/subs/seed/t0..tN, no final
    * SELECT) — shared by [[coreSql]] and the [[encodeCoreSql]] tail. */
  def cteChainSql(rounds: Int = 2, seedSize: Int = 150,
                  wordsRel: String = "uni_words"): String = {
    require(rounds >= 1 && seedSize >= 1)
    val vocab = (0 to rounds).map(k => s"t$k")
    val roundCtes = (1 to rounds).map { k =>
      val prev = vocab(k - 1)
      s"""cand$k AS (
         |  SELECT w.word, w.freq, c.comp_id, c.nparts,
         |    cast(count(v.lp) as int) AS nhit,
         |    sum(cast(v.lp as decimal(20,6))) AS score
         |  FROM $wordsRel w
         |  JOIN comps c ON c.n = length(w.word)
         |  JOIN $prev v ON v.piece = substr(w.word, c.off, c.len)
         |  GROUP BY w.word, w.freq, c.comp_id, c.nparts),
         |best$k AS (
         |  SELECT word, freq, comp_id FROM (
         |    SELECT word, freq, comp_id,
         |      row_number() OVER (PARTITION BY word ORDER BY score DESC, comp_id) AS rk
         |    FROM cand$k WHERE nhit = nparts) x
         |  WHERE rk = 1),
         |cnt$k AS (
         |  SELECT substr(b.word, c.off, c.len) AS piece, sum(b.freq) AS cnt
         |  FROM best$k b
         |  JOIN comps c ON c.n = length(b.word) AND c.comp_id = b.comp_id
         |  GROUP BY 1),
         |t$k AS (
         |  SELECT piece, cnt,
         |    round(ln(cast(cnt as double) / tot.c), 6) AS lp
         |  FROM cnt$k CROSS JOIN (SELECT cast(sum(cnt) as double) AS c FROM cnt$k) tot)""".stripMargin
    }.mkString(",\n")
    s"""comps AS (SELECT * FROM (VALUES ${valuesSql(compRows)})
       |  AS t(n, comp_id, nparts, part_idx, off, len)),
       |subs AS (SELECT * FROM (VALUES ${valuesSql(subRows)}) AS t(n, off, len)),
       |seedraw AS (
       |  SELECT substr(w.word, s.off, s.len) AS piece, sum(w.freq) AS cnt
       |  FROM $wordsRel w JOIN subs s ON s.n = length(w.word)
       |  GROUP BY 1),
       |seed AS (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |    FROM seedraw) x
       |  WHERE rk <= $seedSize OR length(piece) = 1),
       |t0 AS (
       |  SELECT piece, cnt, round(ln(cast(cnt as double) / tot.c), 6) AS lp
       |  FROM seed CROSS JOIN (SELECT cast(sum(cnt) as double) AS c FROM seed) tot),
       |$roundCtes""".stripMargin
  }

  /**
   * Encoder core (the q228-style inference twin): train via
   * [[cteChainSql]], then tokenize every word OCCURRENCE with the final
   * round's Viterbi choice and report per-document piece statistics.
   * Expects `uni_words` AND a per-occurrence `doc_words(doc_id, word)`
   * relation; the per-doc join/aggregate is the only added corpus-sized
   * stage (one shuffle on the word, one on the doc id).
   */
  def encodeCoreSql(rounds: Int = 2, seedSize: Int = 150,
                    wordsRel: String = "uni_words",
                    docWordsRel: String = "doc_words"): String =
    s"""${cteChainSql(rounds, seedSize, wordsRel)},
       |seg AS (
       |  SELECT b.word, c.nparts
       |  FROM best$rounds b
       |  JOIN (SELECT DISTINCT n, comp_id, nparts FROM comps) c
       |    ON c.n = length(b.word) AND c.comp_id = b.comp_id)
       |SELECT d.doc_id,
       |  cast(count(*) as bigint) AS n_words,
       |  cast(sum(s.nparts) as bigint) AS n_tokens,
       |  round(cast(sum(s.nparts) as double) / count(*), 6) + 0.0 AS pieces_per_word
       |FROM $docWordsRel d JOIN seg s ON s.word = d.word
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /**
   * Train on a text column: extract `[a-z]+` words (lowercased, length
   * capped at [[MaxWordLen]] — longer words contribute their prefix
   * structure through shorter siblings and are out of scope for the
   * bounded-composition segmenter), aggregate distinct-word counts
   * (map-side combined, the ONLY corpus-sized stage), then run
   * [[coreSql]]. The seed/argmax windows run over Zipf-bounded
   * vocabulary data; swap the seed window for TakeOrdered at extreme
   * vocabulary sizes.
   */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def train(df: DataFrame, textCol: String,
            rounds: Int = 2, seedSize: Int = 150, topK: Int = 30): DataFrame = {
    val spark = df.sparkSession
    // per-call view name: a second train()/encode() must not rebind the
    // relation under an earlier call's still-lazy result
    val seq = viewSeq.incrementAndGet()
    val wordsRel = s"uni_words_$seq"
    // localCheckpoint: the words relation is referenced by seedraw and
    // every round's cand$k — inlined, each reference re-ran the corpus
    // explode+aggregate (census: 28 inlined scans). One pass, Zipf-bounded
    // output. seed/cnt$k are each referenced twice (body + their 1-row
    // total subquery); the cut-point staging pins the whole EM chain to
    // one execution per round (guide §1.2/§2.4).
    df.filter(col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .localCheckpoint()
      .createOrReplaceTempView(wordsRel)
    graft.SqlStaging.run(spark, "WITH " + coreSql(rounds, seedSize, topK, wordsRel),
      "seed" +: (1 to rounds).map(k => s"cnt$k"), s"uni_t$seq")
  }

  /** Tokenize a corpus with a freshly-trained vocabulary: per-doc word
    * count, piece count, and pieces-per-word under the final round's
    * Viterbi segmentation (see [[encodeCoreSql]]). */
  def encode(df: DataFrame, idCol: String, textCol: String,
             rounds: Int = 2, seedSize: Int = 150): DataFrame = {
    val spark = df.sparkSession
    val n = viewSeq.incrementAndGet()
    val (wordsRel, docWordsRel) = (s"uni_words_$n", s"doc_words_$n")
    val words = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
    // same staging as train; best$rounds gains a second consumer (seg),
    // so it joins the cut set. doc_words stays a lazy view: single
    // reference, one corpus pass at its only consumer.
    words.groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .localCheckpoint()
      .createOrReplaceTempView(wordsRel)
    words.createOrReplaceTempView(docWordsRel)
    graft.SqlStaging.run(spark,
      "WITH " + encodeCoreSql(rounds, seedSize, wordsRel, docWordsRel),
      Seq("seed") ++ (1 to rounds).map(k => s"cnt$k") :+ s"best$rounds", s"uni_e$n")
  }

  private def duckdbWordsCte(table: String, textCol: String): String =
    s"""uni_words AS (
       |  SELECT word, cast(count(*) as bigint) AS freq FROM (
       |    SELECT unnest(string_split_regex(lower($textCol), '[^a-z]+')) AS word
       |    FROM $table WHERE $textCol IS NOT NULL) w
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen
       |  GROUP BY word)""".stripMargin

  /** DuckDB oracle: engine-specific word split + the identical core. */
  def oracleSql(table: String, textCol: String,
                rounds: Int = 2, seedSize: Int = 150, topK: Int = 30): String =
    s"""WITH ${duckdbWordsCte(table, textCol)},
       |${coreSql(rounds, seedSize, topK)}""".stripMargin

  /** DuckDB oracle for [[encode]]. */
  def oracleEncodeSql(table: String, idCol: String, textCol: String,
                      rounds: Int = 2, seedSize: Int = 150): String =
    s"""WITH ${duckdbWordsCte(table, textCol)},
       |doc_words AS (
       |  SELECT doc_id, word FROM (
       |    SELECT $idCol AS doc_id,
       |      unnest(string_split_regex(lower($textCol), '[^a-z]+')) AS word
       |    FROM $table WHERE $textCol IS NOT NULL) w
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen),
       |${encodeCoreSql(rounds, seedSize)}""".stripMargin
}
