package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoRegistry
import graft.pipeline.{Bpe, Corpus, Dedup, Pca, Sessionize, Similarity, TextAnalysis, TextRegistry}
import graft.spatial.SpatialJoin

/**
 * Driver contract: one entry per implemented operator (SURVEY.md §2 + the
 * BASELINE.json pipeline extensions), with a DuckDB-runnable oracle where the
 * semantics are ANSI-SQL-expressible.
 *
 * Oracle design notes (no DuckDB spatial extension is available offline):
 * geometry inputs are synthesized DETERMINISTICALLY from integer keys
 * (FIXTURES.md §6), so every st_* result is analytically computable in plain
 * SQL — both engines then produce bit-identical doubles (integer-derived
 * doubles are exact; sqrt/trig are correctly-rounded or tolerance-rounded via
 * round()). Aggregated currency uses decimal casts so sums are
 * order-independent and exact on both engines.
 */
object SparkEntry {

  private def init(spark: SparkSession): SparkSession = {
    GeoRegistry.register(spark)
    TextRegistry.register(spark)
    spark
  }

  private def view(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach { n =>
      val df = spark.read.parquet(s"$dir/$n.parquet")
      // events.ts arrives differently depending on the parquet annotation:
      //  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; Verify/Bench
      //    set spark.sql.legacy.parquet.nanosAsLong so it arrives as a long we
      //    convert back to a timestamp (micro precision).
      //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ,
      //    which unix_micros()/window() reject. Sessions run with UTC session
      //    timezone, so the NTZ->TIMESTAMP cast is wall-clock-identity and
      //    matches DuckDB's naive-timestamp epoch_us() exactly.
      val fixed =
        if (n == "events") df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          case _ => df
        }
        else df
      fixed.createOrReplaceTempView(n)
    }

  /** Deterministic 64-dim query vector shared by Spark + oracle. */
  private[graft] val queryVec: Array[Double] =
    Array.tabulate(64)(i => ((i * 37) % 19 - 9) / 10.0)
  private def queryVecSql: String = queryVec.mkString("[", ", ", "]")

  // ---------------------------------------------------------------- flagship

  /** Flagship: spatial join (customer points in region boxes) + aggregation
    * on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q20_spatial_join")(spark, "/root/testdata/sf0.001")

  // -------------------------------------------------------------- catalog

  /** Customer point synthesis (shared Spark-side SQL fragment). */
  private val custPt =
    "st_point(cast(c_custkey % 360 - 180 as double), cast((c_custkey * 7) % 160 - 80 as double))"
  private val custX = "cast(c_custkey % 360 - 180 as double)"
  private val custY = "cast((c_custkey * 7) % 160 - 80 as double)"
  // square polygon: corner (x, y), side s = custkey % 10 + 1
  private val custSide = "cast(c_custkey % 10 + 1 as double)"

  private def sqlQuery(tables: Seq[String], text: String): (SparkSession, String) => DataFrame =
    (s, dir) => { init(s); view(s, dir, tables: _*); s.sql(text) }

  // Quality-classifier (q254) shared feature/label texts: engine-portable
  // SQL (length/replace/least/greatest, int/int division is double in both
  // Spark and DuckDB), evaluated by Spark for training/scoring and by the
  // DuckDB oracle CTE — identical parse trees, identical doubles.
  private val qcFeatureSqls = Seq(
    "least(n_chars, 2000) / 2000.0E0",
    "(length(text) - length(replace(text, ' ', ''))) / greatest(length(text), 1)",
    "(length(text) - length(replace(text, '.', ''))) / greatest(length(text), 1)")
  private val qcLabelSql =
    "CASE WHEN (length(text) - length(replace(text, ' ', ''))) >= 25 THEN 1.0E0 ELSE 0.0E0 END"
  private val qcWhere = "text IS NOT NULL AND n_chars IS NOT NULL"

  // q323 shared readability core: `base` must expose (doc_id, w, s, y)
  // punctuation-free text (e.g. token streams) counts as ONE sentence —
  // greatest(1, s) keeps the scores defined instead of dropping the doc
  private val readabilityCore =
    """SELECT doc_id, w AS n_words, greatest(1, s) AS n_sentences, y AS n_syllables,
      |  round(206.835 - 1.015 * (cast(w as double) / greatest(1, s))
      |    - 84.6 * (cast(y as double) / w), 6) + 0.0 AS flesch,
      |  round(0.39 * (cast(w as double) / greatest(1, s))
      |    + 11.8 * (cast(y as double) / w) - 15.59, 6) + 0.0 AS fk_grade
      |FROM base WHERE w > 0 ORDER BY doc_id""".stripMargin

  // q325 differentially-private counts: deterministic Laplace noise by
  // inverse-CDF over the shared md5-60bit uniform (TopicModel.Dialect
  // supplies the engine spelling). eps = 1, sensitivity 1 (counts).
  // true_n is emitted ONLY because this is an oracle-verified catalog —
  // a production release would drop it.
  private def dpCountsSql(d: graft.pipeline.TopicModel.Dialect): String = {
    val key = d.cat(Seq("l_returnflag", "':'", "l_linestatus"))
    s"""WITH g AS (
       |  SELECT l_returnflag, l_linestatus, cast(count(*) as bigint) AS n,
       |    cast(${d.md5Int(key)} % 1000000 as double) AS m
       |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
       |u AS (SELECT *, (m + 0.5) / 1000001.0 - 0.5 AS uu FROM g)
       |SELECT l_returnflag, l_linestatus, n AS true_n,
       |  round((CASE WHEN uu >= 0 THEN -1.0 ELSE 1.0 END)
       |    * ln(1.0 - 2.0 * abs(uu)), 6) + 0.0 AS noise,
       |  round(n + (CASE WHEN uu >= 0 THEN -1.0 ELSE 1.0 END)
       |    * ln(1.0 - 2.0 * abs(uu)), 6) + 0.0 AS noisy_n
       |FROM u ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  // q327 multi-touch attribution: first/last/linear click credit per
  // purchase within a 7-day lookback, aggregated by click hour-of-day.
  // `micros` is the engine spelling (unix_micros vs epoch_us).
  private def attributionSql(micros: String => String): String =
    s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       |c AS (SELECT event_id AS cid, user_id, ts FROM events WHERE event_type = 'click'),
       |pc AS (
       |  SELECT p.event_id, c.cid, c.ts AS cts
       |  FROM p JOIN c ON c.user_id = p.user_id
       |  WHERE c.ts < p.ts
       |    AND ${micros("p.ts")} - ${micros("c.ts")} <= 604800000000),
       |r AS (
       |  SELECT event_id, cid, cts,
       |    row_number() OVER (PARTITION BY event_id ORDER BY cts ASC, cid) AS rk_first,
       |    row_number() OVER (PARTITION BY event_id ORDER BY cts DESC, cid) AS rk_last,
       |    count(*) OVER (PARTITION BY event_id) AS n
       |  FROM pc)
       |SELECT cast(hour(cts) as int) AS click_hour,
       |  cast(sum(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END) as bigint) AS first_touch,
       |  cast(sum(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) as bigint) AS last_touch,
       |  round(cast(sum(cast(round(cast(1.0 as double) / n, 9) as decimal(20,9))) as double), 6) + 0.0 AS linear_credit
       |FROM r GROUP BY hour(cts) ORDER BY click_hour""".stripMargin

  // q328 simple exponential smoothing (alpha = 0.3) over daily event
  // counts via the closed form S_t = sum_i w(i,t) y_i — the raw stream
  // reduces to a metadata-sized daily table first, then the triangular
  // day-pair join is days^2 (tiny at any corpus scale). `dayNum` is the
  // engine spelling of the integer day number.
  private def expSmoothSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1),
       |idx AS (SELECT d, y, row_number() OVER (ORDER BY d) AS t,
       |               count(*) OVER () AS tn FROM daily),
       |lvl AS (
       |  SELECT a.t, a.d, a.y,
       |    sum(cast(round(
       |      CASE WHEN b.t = 1 THEN power(cast(0.7 as double), a.t - 1) * b.y
       |           ELSE cast(0.3 as double)
       |             * power(cast(0.7 as double), a.t - b.t) * b.y END, 9)
       |      as decimal(25,9))) AS s
       |  FROM idx a JOIN idx b ON b.t <= a.t
       |  WHERE a.t > a.tn - 5
       |  GROUP BY a.t, a.d, a.y)
       |SELECT cast(t as bigint) AS t, cast(d as bigint) AS day_num, y,
       |  round(cast(s as double), 6) + 0.0 AS level
       |FROM lvl ORDER BY t""".stripMargin

  // q326 IDW: portable text (identical on both engines); weights and
  // weighted values fold as round-9 decimals before the final ratio
  private val idwSql =
    """WITH t AS (
      |  SELECT n_nationkey AS tid,
      |    cast((n_nationkey * 29) % 360 - 180 as double) + 0.5 AS tx,
      |    cast((n_nationkey * 13) % 160 - 80 as double) + 0.5 AS ty
      |  FROM nation),
      |pts AS (
      |  SELECT cast(c_custkey % 360 - 180 as double) AS px,
      |    cast((c_custkey * 7) % 160 - 80 as double) AS py,
      |    cast(c_acctbal as double) AS v
      |  FROM customer),
      |nb AS (
      |  SELECT t.tid, t.tx, t.ty, p.v,
      |    (p.px - t.tx) * (p.px - t.tx) + (p.py - t.ty) * (p.py - t.ty) AS d2
      |  FROM t JOIN pts p
      |    ON p.px BETWEEN t.tx - 20.0 AND t.tx + 20.0
      |   AND p.py BETWEEN t.ty - 20.0 AND t.ty + 20.0)
      |SELECT tid, round(tx, 1) + 0.0 AS tx, round(ty, 1) + 0.0 AS ty,
      |  cast(count(*) as bigint) AS n_nb,
      |  round(cast(sum(cast(round(v / (1.0 + d2), 9) as decimal(25,9))) as double)
      |      / cast(sum(cast(round(cast(1.0 as double) / (1.0 + d2), 9) as decimal(25,9))) as double),
      |    6) + 0.0 AS idw
      |FROM nb GROUP BY tid, tx, ty ORDER BY tid""".stripMargin

  // q331 Gini: portable text
  private val giniSql =
    """WITH sp AS (
      |  SELECT o_custkey AS k,
      |    cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS x
      |  FROM orders GROUP BY o_custkey),
      |r AS (
      |  SELECT x, row_number() OVER (ORDER BY x, k) AS i,
      |    count(*) OVER () AS n
      |  FROM sp),
      |s AS (
      |  SELECT max(n) AS n,
      |    cast(sum(cast(round(i * x, 6) as decimal(30,6))) as double) AS six,
      |    cast(sum(cast(round(x, 6) as decimal(30,6))) as double) AS sx
      |  FROM r)
      |SELECT cast(n as bigint) AS n,
      |  round(2.0 * six / (n * sx) - (n + 1.0) / n, 6) + 0.0 AS gini
      |FROM s""".stripMargin

  // q332 Spearman: portable text (word count via the space-count proxy)
  private val spearmanSql =
    """WITH base AS (
      |  SELECT doc_id, cast(n_chars as double) AS x,
      |    cast(length(text) - length(replace(text, ' ', '')) + 1 as double) AS y
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |rk AS (
      |  SELECT doc_id, x, y,
      |    rank() OVER (ORDER BY x) + (count(*) OVER (PARTITION BY x) - 1) / cast(2.0 as double) AS rx,
      |    rank() OVER (ORDER BY y) + (count(*) OVER (PARTITION BY y) - 1) / cast(2.0 as double) AS ry
      |  FROM base),
      |s AS (
      |  SELECT cast(count(*) as double) AS n,
      |    cast(sum(cast(round(rx, 6) as decimal(30,6))) as double) AS sx,
      |    cast(sum(cast(round(ry, 6) as decimal(30,6))) as double) AS sy,
      |    cast(sum(cast(round(rx * ry, 6) as decimal(30,6))) as double) AS sxy,
      |    cast(sum(cast(round(rx * rx, 6) as decimal(30,6))) as double) AS sxx,
      |    cast(sum(cast(round(ry * ry, 6) as decimal(30,6))) as double) AS syy
      |  FROM rk)
      |SELECT cast(n as bigint) AS n,
      |  round((n * sxy - sx * sy)
      |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) + 0.0 AS rho
      |FROM s""".stripMargin

  // q333 A-Res weighted sample: key = u^(1/w), top-10 by (key DESC, id)
  private def aresSql(d: graft.pipeline.TopicModel.Dialect): String = {
    val key = d.cat(Seq("'ares:'", d.strCast("c_custkey")))
    s"""WITH w AS (
       |  SELECT c_custkey,
       |    greatest(cast(0.01 as double), cast(c_acctbal as double)) AS wt,
       |    (cast(${d.md5Int(key)} % 1000000 as double) + 0.5) / 1000000.0 AS u
       |  FROM customer)
       |SELECT c_custkey, round(wt, 2) + 0.0 AS wt,
       |  round(power(u, cast(1.0 as double) / wt), 9) + 0.0 AS ares_key
       |FROM w
       |ORDER BY ares_key DESC, c_custkey LIMIT 10""".stripMargin
  }

  // q334 feature hashing (the hashing-trick vectorizer): dim and sign
  // from the shared md5-60bit hash; per-dim corpus totals
  private def featureHashSql(tok: String, d: graft.pipeline.TopicModel.Dialect): String =
    s"""WITH tok AS ($tok),
       |h AS (
       |  SELECT word,
       |    cast(${d.md5Int(d.cat(Seq("'fh:'", "word")))} % 512 as int) AS dim,
       |    CASE WHEN ${d.md5Int(d.cat(Seq("'fs:'", "word")))} % 2 = 0
       |      THEN 1 ELSE -1 END AS sgn
       |  FROM (SELECT DISTINCT word FROM tok) w),
       |m AS (
       |  SELECT t.word, h.dim, h.sgn, cast(count(*) as bigint) AS c
       |  FROM tok t JOIN h ON h.word = t.word GROUP BY t.word, h.dim, h.sgn)
       |SELECT dim, cast(sum(sgn * c) as bigint) AS signed_mass,
       |  cast(count(*) as bigint) AS n_words,
       |  cast(sum(c) as bigint) AS n_tokens
       |FROM m GROUP BY dim ORDER BY n_tokens DESC, dim LIMIT 20""".stripMargin

  // q335 leave-fold-out target encoding (smoothing m = 10 toward the
  // global mean): category/fold sums are exact decimals; the encoding
  // is metadata-sized scalar algebra
  private def targetEncodingSql(d: graft.pipeline.TopicModel.Dialect): String =
    s"""WITH b AS (
       |  SELECT o_orderpriority AS cat,
       |    cast(${d.md5Int(d.cat(Seq("'tf:'", d.strCast("o_orderkey"))))} % 5 as int) AS fold,
       |    cast(o_totalprice as double) AS y
       |  FROM orders),
       |cf AS (SELECT cat, fold, cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(y, 6) as decimal(30,6))) as decimal(38,6)) AS s
       |  FROM b GROUP BY cat, fold),
       |ct AS (SELECT cat, cast(sum(n) as bigint) AS nc,
       |    cast(sum(s) as decimal(38,6)) AS sc FROM cf GROUP BY cat),
       |g AS (SELECT cast(sum(n) as bigint) AS ng,
       |    cast(sum(s) as decimal(38,6)) AS sg FROM cf)
       |SELECT cf.cat, cf.fold, cf.n AS fold_n,
       |  round((cast(ct.sc as double) - cast(cf.s as double)
       |       + (cast(g.sg as double) / g.ng) * cast(10.0 as double))
       |      / (ct.nc - cf.n + cast(10.0 as double)), 6) + 0.0 AS enc
       |FROM cf JOIN ct ON ct.cat = cf.cat CROSS JOIN g
       |ORDER BY cf.cat, cf.fold""".stripMargin

  // q336 permutation test (20 deterministic md5 label shuffles) for the
  // click-vs-view mean difference; the 20x fan-out is a constant
  private def permTestSql(d: graft.pipeline.TopicModel.Dialect): String = {
    def meanOf(flagExpr: String, v: String = "v") =
      s"""cast(sum(CASE WHEN $flagExpr THEN cast(round($v, 6) as decimal(30,6))
         |  ELSE cast(0 as decimal(30,6)) END) as double)
         |  / sum(CASE WHEN $flagExpr THEN 1 ELSE 0 END)""".stripMargin
    s"""WITH base AS (
       |  SELECT event_id, cast(value as double) AS v,
       |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp
       |  FROM events
       |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
       |obs AS (SELECT ${meanOf("grp = 1")} - ${meanOf("grp = 0")} AS d_obs,
       |  cast(sum(grp) as bigint) AS n1,
       |  cast(sum(1 - grp) as bigint) AS n2 FROM base),
       |pids AS (SELECT n_nationkey AS pid FROM nation WHERE n_nationkey < 20),
       |perm AS (
       |  SELECT p.pid, b.v,
       |    CASE WHEN ${d.md5Int(d.cat(Seq("'pm:'", d.strCast("b.event_id"),
              "':'", d.strCast("p.pid"))))} % 2 = 0 THEN 1 ELSE 0 END AS pg
       |  FROM base b CROSS JOIN pids p),
       |pd AS (SELECT pid, ${meanOf("pg = 1")} - ${meanOf("pg = 0")} AS dp
       |  FROM perm GROUP BY pid)
       |SELECT o.n1, o.n2, round(o.d_obs, 6) + 0.0 AS d_obs,
       |  cast(sum(CASE WHEN abs(pd.dp) >= abs(o.d_obs) THEN 1 ELSE 0 END) as bigint)
       |    AS n_extreme,
       |  round(sum(CASE WHEN abs(pd.dp) >= abs(o.d_obs) THEN 1 ELSE 0 END)
       |    / cast(20.0 as double), 6) + 0.0 AS p_value
       |FROM pd CROSS JOIN obs o
       |GROUP BY o.n1, o.n2, o.d_obs""".stripMargin
  }

  // q337 Mann-Whitney U with tie-corrected normal approximation:
  // one rank window + exact tie-group cubes; portable text
  private val mannWhitneySql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |rk AS (
      |  SELECT v, g,
      |    rank() OVER (ORDER BY v)
      |      + (count(*) OVER (PARTITION BY v) - 1) / cast(2.0 as double) AS r
      |  FROM base),
      |ties AS (
      |  SELECT cast(sum(tc * tc * tc - tc) as double) AS t3
      |  FROM (SELECT cast(count(*) as bigint) AS tc FROM base GROUP BY v) z),
      |s AS (
      |  SELECT cast(sum(g) as bigint) AS n1,
      |    cast(sum(1 - g) as bigint) AS n2,
      |    cast(sum(CASE WHEN g = 1 THEN cast(round(r, 6) as decimal(30,6))
      |      ELSE cast(0 as decimal(30,6)) END) as double) AS r1
      |  FROM rk)
      |SELECT s.n1, s.n2,
      |  round(s.r1 - s.n1 * (s.n1 + 1) / cast(2.0 as double), 6) + 0.0 AS u,
      |  round((s.r1 - s.n1 * (s.n1 + 1) / cast(2.0 as double)
      |       - s.n1 * s.n2 / cast(2.0 as double))
      |    / sqrt((s.n1 * s.n2 / cast(12.0 as double))
      |        * ((s.n1 + s.n2 + 1)
      |           - t.t3 / (cast(s.n1 + s.n2 as double) * (s.n1 + s.n2 - 1)))),
      |    6) + 0.0 AS z
      |FROM s CROSS JOIN ties t""".stripMargin

  // q338 Benford first-digit test: digit via decimal-string prefix (no
  // libm), exact counts, chi2 contributions in one deterministic tree
  private val benfordSql =
    """WITH d AS (
      |  SELECT cast(substring(cast(cast(o_totalprice as decimal(18,2)) as string), 1, 1) as int) AS dig
      |  FROM orders WHERE o_totalprice >= 1.0),
      |c AS (SELECT dig, cast(count(*) as bigint) AS n FROM d GROUP BY dig),
      |t AS (SELECT cast(sum(n) as bigint) AS tot FROM c)
      |SELECT c.dig, c.n,
      |  round(ln(1.0 + cast(1.0 as double) / c.dig) / ln(10.0), 6) + 0.0 AS expected_p,
      |  round(cast(c.n as double) / t.tot, 6) + 0.0 AS observed_p,
      |  round((cast(c.n as double) / t.tot
      |       - ln(1.0 + cast(1.0 as double) / c.dig) / ln(10.0))
      |      * (cast(c.n as double) / t.tot
      |       - ln(1.0 + cast(1.0 as double) / c.dig) / ln(10.0))
      |      / (ln(1.0 + cast(1.0 as double) / c.dig) / ln(10.0)) * t.tot,
      |    6) + 0.0 AS chi2_term
      |FROM c CROSS JOIN t ORDER BY c.dig""".stripMargin

  // q339 Welch's t-test (click vs view values): the whole test reduces to
  // TWO 1-row group summaries — per-group n / sum / sum-of-squares fold as
  // round-9 decimals (order-independent on both engines); mean, variance,
  // t, and the Welch-Satterthwaite df are scalar double algebra after.
  // At 100 TB this is ONE map-side-combined aggregation over the scan.
  private val welchSql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |s AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(v, 9) as decimal(30,9))) as double) AS s1,
      |    cast(sum(cast(round(v * v, 9) as decimal(30,9))) as double) AS s2
      |  FROM base GROUP BY g),
      |m AS (
      |  SELECT g, n, s1 / n AS mu,
      |    (s2 - s1 * s1 / n) / (n - 1.0) AS vr
      |  FROM s),
      |p AS (
      |  SELECT
      |    max(CASE WHEN g = 1 THEN n END) AS n1,
      |    max(CASE WHEN g = 0 THEN n END) AS n2,
      |    max(CASE WHEN g = 1 THEN mu END) AS mu1,
      |    max(CASE WHEN g = 0 THEN mu END) AS mu2,
      |    max(CASE WHEN g = 1 THEN vr END) AS v1,
      |    max(CASE WHEN g = 0 THEN vr END) AS v2
      |  FROM m)
      |SELECT n1, n2,
      |  round(mu1 - mu2, 6) + 0.0 AS mean_diff,
      |  round((mu1 - mu2) / sqrt(v1 / n1 + v2 / n2), 6) + 0.0 AS t,
      |  round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
      |      / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
      |       + (v2 / n2) * (v2 / n2) / (n2 - 1.0)), 6) + 0.0 AS df
      |FROM p""".stripMargin

  // q340 autocorrelation (lags 1-7) of the daily event-count series: the
  // raw stream reduces to the metadata-sized daily table first, so the
  // lag join is days x 7 regardless of corpus size. Counts are exact
  // integers, so the round-4 decimal folds lose nothing; Pearson r comes
  // from the five folded sums. `dayNum` is the engine spelling of the
  // integer day number (same contract as expSmoothSql).
  private def acfSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |lags AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS t(lg)),
       |pr AS (
       |  SELECT l.lg, a.y AS x, b.y AS y
       |  FROM lags l JOIN daily a ON 1 = 1
       |  JOIN daily b ON b.d = a.d + l.lg),
       |st AS (
       |  SELECT lg, cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(x, 4) as decimal(25,4))) as double) AS sx,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) as double) AS sy,
       |    cast(sum(cast(round(x * y, 4) as decimal(25,4))) as double) AS sxy,
       |    cast(sum(cast(round(x * x, 4) as decimal(25,4))) as double) AS sxx,
       |    cast(sum(cast(round(y * y, 4) as decimal(25,4))) as double) AS syy
       |  FROM pr GROUP BY lg)
       |SELECT cast(lg as int) AS lg, n,
       |  round((n * sxy - sx * sy)
       |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS acf
       |FROM st ORDER BY lg""".stripMargin

  // q341 Markov chain over per-user event sequences: transition counts
  // come from ONE lead() window (ts + event_id deterministic order), the
  // row-normalized matrix P is |states|^2 = 25 cells, and the stationary
  // vector is `iters` unrolled power-iteration rounds over those 25 cells
  // — every round a states-sized join, with round-9 decimal pins making
  // the iteration bit-exact cross-engine. At 100 TB the corpus-sized work
  // is the window + count; everything after is metadata-sized.
  private def markovCore(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""v$k AS (
         |  SELECT st.s,
         |    cast(round(cast(coalesce(m.nv, 0) as double), 9) as decimal(20,9)) AS v
         |  FROM states st LEFT JOIN (
         |    SELECT p.s2 AS s,
         |      sum(cast(round(cast(v${k - 1}.v as double) * cast(p.p as double), 12)
         |        as decimal(25,12))) AS nv
         |    FROM v${k - 1} JOIN p ON p.s = v${k - 1}.s GROUP BY p.s2) m
         |  ON m.s = st.s)""".stripMargin
    }.mkString(",\n")
    s"""seq AS (
       |  SELECT event_type AS s,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
       |  FROM events),
       |tr AS (
       |  SELECT s, s2, cast(count(*) as bigint) AS c
       |  FROM seq WHERE s2 IS NOT NULL GROUP BY s, s2),
       |tot AS (SELECT s, cast(sum(c) as bigint) AS n FROM tr GROUP BY s),
       |p AS (
       |  SELECT tr.s, tr.s2,
       |    cast(round(cast(tr.c as double) / tot.n, 9) as decimal(20,9)) AS p
       |  FROM tr JOIN tot ON tot.s = tr.s),
       |states AS (SELECT s FROM tot),
       |v0 AS (SELECT s, cast(0.2 as decimal(20,9)) AS v FROM states),
       |$rounds""".stripMargin
  }

  private def markovSql(iters: Int): String =
    s"""WITH ${markovCore(iters)}
       |SELECT v$iters.s AS state,
       |  round(cast(v$iters.v as double), 6) + 0.0 AS pi
       |FROM v$iters ORDER BY state""".stripMargin

  // q353 per-state next-event entropy + the chain's entropy rate
  // (stationary-weighted): both come straight off the q341 transition
  // CTEs — the corpus-sized work is shared, the entropy algebra is
  // 25-cell metadata.
  private def markovEntropySql(iters: Int): String =
    s"""WITH ${markovCore(iters)},
       |hs AS (
       |  SELECT s,
       |    cast(sum(cast(round(-cast(p as double) * ln(cast(p as double)), 9)
       |      as decimal(20,9))) as double) AS h
       |  FROM p GROUP BY s)
       |SELECT hs.s AS state,
       |  round(hs.h, 6) + 0.0 AS h_next,
       |  round(cast(v$iters.v as double), 6) + 0.0 AS pi,
       |  round(cast(sum(cast(round(cast(v$iters.v as double) * hs.h, 9)
       |      as decimal(20,9))) OVER () as double), 6) + 0.0 AS entropy_rate
       |FROM hs JOIN v$iters ON v$iters.s = hs.s
       |ORDER BY state""".stripMargin

  // q342 one-way ANOVA (event value by event_type): per-group decimal
  // sums stay decimal through the grand totals (5-group double addition
  // would be order-dependent), SSB/SSW fold as round-6 decimals, and the
  // F statistic is scalar algebra. ONE scan at any corpus size.
  private val anovaSql =
    """WITH base AS (
      |  SELECT event_type AS g, cast(value as double) AS v
      |  FROM events WHERE value IS NOT NULL),
      |s AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    sum(cast(round(v, 9) as decimal(30,9))) AS s1,
      |    sum(cast(round(v * v, 9) as decimal(30,9))) AS s2
      |  FROM base GROUP BY g),
      |gr AS (
      |  SELECT cast(sum(n) as bigint) AS nt, cast(count(*) as bigint) AS k,
      |    cast(sum(s1) as double) AS st
      |  FROM s),
      |parts AS (
      |  SELECT
      |    sum(cast(round(cast(s.s2 as double)
      |        - cast(s.s1 as double) * cast(s.s1 as double) / s.n, 6)
      |      as decimal(30,6))) AS ssw,
      |    sum(cast(round(s.n * (cast(s.s1 as double) / s.n - gr.st / gr.nt)
      |        * (cast(s.s1 as double) / s.n - gr.st / gr.nt), 6)
      |      as decimal(30,6))) AS ssb,
      |    max(gr.k) AS k, max(gr.nt) AS nt
      |  FROM s CROSS JOIN gr)
      |SELECT cast(k as bigint) AS k, nt AS n,
      |  round(cast(ssb as double), 4) + 0.0 AS ss_between,
      |  round(cast(ssw as double), 4) + 0.0 AS ss_within,
      |  round((cast(ssb as double) / (k - 1))
      |      / (cast(ssw as double) / (nt - k)), 6) + 0.0 AS f_stat
      |FROM parts""".stripMargin

  // q343 two-sample Kolmogorov-Smirnov (click vs view): the ECDF gap is
  // evaluated with INTEGER cumulative counts (|c1*n2 - c2*n1| max), so D
  // is exact — no floating comparison anywhere until the final scalar
  // division. The default RANGE window frame makes tied values peers on
  // both engines. The global sort is the scale cost; at 100 TB the same
  // statistic comes off value histograms (the q312/q331 guidance).
  private val ksSql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |n AS (
      |  SELECT cast(sum(g) as bigint) AS n1,
      |    cast(sum(1 - g) as bigint) AS n2
      |  FROM base),
      |cum AS (
      |  SELECT v,
      |    sum(g) OVER (ORDER BY v) AS c1,
      |    sum(1 - g) OVER (ORDER BY v) AS c2
      |  FROM base),
      |d AS (
      |  SELECT max(abs(c1 * n.n2 - c2 * n.n1)) AS dnum
      |  FROM cum CROSS JOIN n)
      |SELECT n.n1, n.n2,
      |  round(cast(d.dnum as double) / (n.n1 * n.n2), 6) + 0.0 AS ks_d,
      |  round(sqrt(cast(n.n1 as double) * n.n2 / (n.n1 + n.n2))
      |      * (cast(d.dnum as double) / (n.n1 * n.n2)), 6) + 0.0 AS ks_stat
      |FROM d CROSS JOIN n""".stripMargin

  // q344 Benjamini-Hochberg FDR step-up over per-nation deviation scores:
  // one aggregation produces the 25 p-values (p = exp(-|z|), a monotone
  // map of the decimal-folded z — deterministic and oracle-replayable);
  // the BH cutoff is a single window max over the suffix condition. The
  // multiple-testing machinery is metadata-sized at any corpus scale.
  private val bhFdrSql =
    """WITH cust AS (
      |  SELECT c_nationkey AS nk, cast(c_acctbal as double) AS x FROM customer),
      |g AS (
      |  SELECT nk, cast(count(*) as bigint) AS n,
      |    sum(cast(round(x, 6) as decimal(30,6))) AS s1,
      |    sum(cast(round(x * x, 6) as decimal(30,6))) AS s2
      |  FROM cust GROUP BY nk),
      |tot AS (
      |  SELECT cast(sum(n) as bigint) AS nt,
      |    cast(sum(s1) as double) AS st,
      |    cast(sum(s2) as double) AS st2
      |  FROM g),
      |pv AS (
      |  SELECT g.nk,
      |    round(exp(-abs((cast(g.s1 as double) / g.n - t.st / t.nt)
      |      * sqrt(cast(g.n as double))
      |      / sqrt(t.st2 / t.nt - (t.st / t.nt) * (t.st / t.nt)))), 9) + 0.0 AS p
      |  FROM g CROSS JOIN tot t),
      |ranked AS (
      |  SELECT nk, p, row_number() OVER (ORDER BY p, nk) AS i,
      |    count(*) OVER () AS m
      |  FROM pv),
      |cut AS (
      |  SELECT coalesce(max(CASE WHEN p <= i * cast(0.20 as double) / m
      |    THEN i END), 0) AS kmax FROM ranked)
      |SELECT n.n_name, round(r.p, 6) + 0.0 AS p_value,
      |  cast(r.i as bigint) AS rk,
      |  CASE WHEN r.i <= c.kmax THEN 1 ELSE 0 END AS rejected
      |FROM ranked r CROSS JOIN cut c
      |JOIN nation n ON n.n_nationkey = r.nk
      |ORDER BY r.i""".stripMargin

  // q345 pointwise mutual information over token co-occurrence: the pair
  // space is bounded by a deterministic top-50 vocabulary cap (df-ranked,
  // word tie-break) BEFORE the within-doc pair join — at 100 TB the
  // vocabulary cap, not the corpus, bounds the quadratic term. `tokCte`
  // is the engine tokenizer (same contract as naiveBayesSql).
  private def pmiSql(tokCte: String): String =
    s"""WITH tok AS ($tokCte),
       |dt AS (SELECT DISTINCT doc_id, word FROM tok WHERE length(word) >= 4),
       |df AS (SELECT word, cast(count(*) as bigint) AS c FROM dt GROUP BY word),
       |top AS (SELECT word, c FROM df ORDER BY c DESC, word LIMIT 50),
       |fd AS (SELECT dt.doc_id, dt.word, t.c
       |  FROM dt JOIN top t ON t.word = dt.word),
       |nd AS (SELECT cast(count(DISTINCT doc_id) as bigint) AS n FROM dt),
       |pairs AS (
       |  SELECT a.word AS w1, b.word AS w2, a.c AS c1, b.c AS c2,
       |    cast(count(*) as bigint) AS cab
       |  FROM fd a JOIN fd b ON b.doc_id = a.doc_id AND a.word < b.word
       |  GROUP BY a.word, b.word, a.c, b.c)
       |SELECT w1, w2, cab,
       |  round(ln(cast(cab as double) * n.n / (cast(c1 as double) * c2)), 6)
       |    + 0.0 AS pmi
       |FROM pairs CROSS JOIN nd n
       |WHERE cab >= 3
       |ORDER BY cab DESC, w1, w2
       |LIMIT 40""".stripMargin

  // q346 weight-of-evidence / information-value encoding of the price
  // bucket against the F-status label: integer counts per bucket, 0.5
  // Laplace guard, round-9 decimal fold for the IV total. ONE scan.
  private val woeSql =
    """WITH b AS (
      |  SELECT cast(floor(o_totalprice / 50000) as bigint) AS bucket,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      |  FROM orders),
      |c AS (
      |  SELECT bucket, cast(sum(1 - bad) as bigint) AS good,
      |    cast(sum(bad) as bigint) AS bad
      |  FROM b GROUP BY bucket),
      |t AS (
      |  SELECT cast(sum(good) as bigint) AS gt, cast(sum(bad) as bigint) AS bt
      |  FROM c),
      |w AS (
      |  SELECT c.bucket, c.good, c.bad,
      |    round(ln(((c.good + cast(0.5 as double)) / (t.gt + cast(0.5 as double)))
      |      / ((c.bad + cast(0.5 as double)) / (t.bt + cast(0.5 as double)))),
      |      6) + 0.0 AS woe,
      |    round(((c.good + cast(0.5 as double)) / (t.gt + cast(0.5 as double))
      |        - (c.bad + cast(0.5 as double)) / (t.bt + cast(0.5 as double)))
      |      * ln(((c.good + cast(0.5 as double)) / (t.gt + cast(0.5 as double)))
      |        / ((c.bad + cast(0.5 as double)) / (t.bt + cast(0.5 as double)))),
      |      9) AS ivt
      |  FROM c CROSS JOIN t)
      |SELECT bucket, good, bad, woe,
      |  round(cast(sum(cast(ivt as decimal(20,9))) OVER () as double), 6) + 0.0
      |    AS iv_total
      |FROM w ORDER BY bucket""".stripMargin

  // q347 Jensen-Shannon divergence between two sources' token
  // distributions: counts reduce per word in one aggregation; the two KL
  // halves fold as round-9 decimals over the union vocabulary (absent
  // words contribute zero by the CASE guard). `tokCte` yields
  // (source, word) in the engine's tokenizer spelling.
  private def jsDivergenceSql(tokCte: String): String =
    s"""WITH tok AS ($tokCte),
       |cnt AS (
       |  SELECT word,
       |    cast(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) as bigint) AS ca,
       |    cast(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) as bigint) AS cb
       |  FROM tok WHERE source IN ('src0', 'src1') GROUP BY word),
       |t AS (
       |  SELECT cast(sum(ca) as bigint) AS na, cast(sum(cb) as bigint) AS nb,
       |    cast(count(*) as bigint) AS vocab
       |  FROM cnt),
       |terms AS (
       |  SELECT
       |    sum(cast(round(CASE WHEN ca > 0 THEN
       |      (cast(ca as double) / t.na)
       |        * ln((cast(ca as double) / t.na)
       |          / ((cast(ca as double) / t.na + cast(cb as double) / t.nb) / 2))
       |      ELSE 0 END, 9) as decimal(20,9))) AS kla,
       |    sum(cast(round(CASE WHEN cb > 0 THEN
       |      (cast(cb as double) / t.nb)
       |        * ln((cast(cb as double) / t.nb)
       |          / ((cast(ca as double) / t.na + cast(cb as double) / t.nb) / 2))
       |      ELSE 0 END, 9) as decimal(20,9))) AS klb,
       |    max(t.na) AS na, max(t.nb) AS nb, max(t.vocab) AS vocab
       |  FROM cnt CROSS JOIN t)
       |SELECT na, nb, vocab,
       |  round(cast(kla as double) / 2 + cast(klb as double) / 2, 6) + 0.0 AS js
       |FROM terms""".stripMargin

  // q348 winnowing oracle (DuckDB): replays pipeline.Winnow's selection —
  // 8-char k-gram md5 hashes, rightmost-min in every 4-window, then the
  // bucket-capped shared-fingerprint pair join — as pure list algebra.
  // (The Spark side lives in pipeline/Winnow.scala; its localCheckpoint
  // barrier has no SQL spelling, which is why this text is duck-only.)
  /** DuckDB CTE chain computing the per-doc winnowing fingerprint set
    * (base -> hs -> arr -> fp), shared by the q348 and q391 oracles. */
  private def winnowFpCtes: String = {
    val md5i = (e: String) => s"('0x' || substr(md5($e), 1, 15))::BIGINT"
    s"""base AS (
       |  SELECT doc_id, lower(text) AS s,
       |    length(text) - 7 AS n
       |  FROM documents WHERE text IS NOT NULL AND length(text) >= 11),
       |hs AS (
       |  SELECT doc_id, n,
       |    list_transform(generate_series(1, n), i -> ${md5i("substring(s, i, 8)")}) AS h
       |  FROM base),
       |arr AS (
       |  SELECT doc_id, h,
       |    list_distinct(list_transform(generate_series(4, n), q ->
       |      list_max(list_filter(generate_series(q - 3, q), p ->
       |        h[p] = list_min(list_slice(h, q - 3, q)))))) AS sel
       |  FROM hs),
       |fp AS (
       |  SELECT DISTINCT doc_id, h[p] AS fph
       |  FROM (SELECT doc_id, h, unnest(sel) AS p FROM arr) z)""".stripMargin
  }

  private def winnowOracleSql: String = {
    s"""WITH $winnowFpCtes,
       |bkt AS (
       |  SELECT fph FROM fp GROUP BY fph
       |  HAVING count(*) BETWEEN 2 AND 50),
       |pr AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, cast(count(*) as bigint) AS shared
       |  FROM fp a JOIN bkt ON bkt.fph = a.fph
       |  JOIN fp b ON b.fph = a.fph AND b.doc_id > a.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT da, db, shared FROM pr
       |ORDER BY shared DESC, da, db
       |LIMIT 30""".stripMargin
  }

  // q349 item-item collaborative filtering: co-occurrence counts from the
  // within-order pair join (fan-out bounded by basket size — cap baskets
  // upstream at power-law scale, the Assoc.maxBasketSize guidance), cosine
  // over order-frequency, deterministic top-3 neighbors per item (rounded
  // cosine, then count, then key). The output sample (pa % 97) keeps the
  // catalog row count bounded without changing any per-item ranking.
  private val itemCooccurSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |cf AS (SELECT p, cast(count(*) as bigint) AS c FROM b GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b2.p AS pb, cast(count(*) as bigint) AS cab
      |  FROM b a JOIN b b2 ON b2.o = a.o AND b2.p <> a.p
      |  GROUP BY a.p, b2.p),
      |sim AS (
      |  SELECT pa, pb, cab,
      |    round(cast(cab as double) / sqrt(cast(ca.c as double) * cb.c), 6)
      |      + 0.0 AS cosine
      |  FROM pairs JOIN cf ca ON ca.p = pairs.pa JOIN cf cb ON cb.p = pairs.pb),
      |rk AS (
      |  SELECT pa, pb, cab, cosine,
      |    row_number() OVER (PARTITION BY pa
      |                       ORDER BY cosine DESC, cab DESC, pb) AS rnk
      |  FROM sim)
      |SELECT pa, pb, cab, cosine, cast(rnk as bigint) AS rnk
      |FROM rk WHERE rnk <= 3 AND pa % 97 = 0
      |ORDER BY pa, rnk""".stripMargin

  // q350 sequential patterns (a occurs before b, per user): the stream
  // reduces to one (user, type) min/max-ts row first, so the pattern join
  // is |types|^2 per user — never event x event.
  private val seqPatternsSql =
    """WITH ft AS (
      |  SELECT user_id, event_type, min(ts) AS fts, max(ts) AS lts
      |  FROM events GROUP BY user_id, event_type),
      |u AS (SELECT cast(count(DISTINCT user_id) as bigint) AS nu FROM events),
      |sup AS (
      |  SELECT a.event_type AS sa, b.event_type AS sb,
      |    cast(count(*) as bigint) AS c
      |  FROM ft a JOIN ft b ON b.user_id = a.user_id
      |    AND b.event_type <> a.event_type AND a.fts < b.lts
      |  GROUP BY a.event_type, b.event_type)
      |SELECT sa, sb, c, round(cast(c as double) / u.nu, 6) + 0.0 AS support
      |FROM sup CROSS JOIN u ORDER BY sa, sb""".stripMargin

  // q351 mutual information between order priority and status: joint and
  // marginal counts from ONE scan, MI folded as round-9 decimals.
  private val mutualInfoSql =
    """WITH j AS (
      |  SELECT o_orderpriority AS x, o_orderstatus AS y,
      |    cast(count(*) as bigint) AS c
      |  FROM orders GROUP BY o_orderpriority, o_orderstatus),
      |t AS (SELECT cast(sum(c) as bigint) AS n FROM j),
      |mx AS (SELECT x, cast(sum(c) as bigint) AS cx FROM j GROUP BY x),
      |my AS (SELECT y, cast(sum(c) as bigint) AS cy FROM j GROUP BY y)
      |SELECT
      |  cast(count(*) as bigint) AS cells,
      |  round(cast(sum(cast(round(
      |    (cast(j.c as double) / t.n)
      |      * ln(cast(j.c as double) * t.n / (cast(mx.cx as double) * my.cy)), 9)
      |    as decimal(20,9))) as double), 6) + 0.0 AS mi
      |FROM j JOIN mx ON mx.x = j.x JOIN my ON my.y = j.y CROSS JOIN t""".stripMargin

  // q352 Cramer's V association strength (priority x status): the chi-2
  // runs over the FULL marginal cross product (absent cells contribute
  // their expectation), decimal-folded; V is scalar algebra after.
  private val cramersVSql =
    """WITH j AS (
      |  SELECT o_orderpriority AS x, o_orderstatus AS y,
      |    cast(count(*) as bigint) AS c
      |  FROM orders GROUP BY o_orderpriority, o_orderstatus),
      |t AS (SELECT cast(sum(c) as bigint) AS n FROM j),
      |mx AS (SELECT x, cast(sum(c) as bigint) AS cx FROM j GROUP BY x),
      |my AS (SELECT y, cast(sum(c) as bigint) AS cy FROM j GROUP BY y),
      |rc AS (SELECT cast(count(*) as bigint) AS r FROM mx),
      |cc AS (SELECT cast(count(*) as bigint) AS cls FROM my),
      |cells AS (
      |  SELECT cast(coalesce(j.c, 0) as double) AS c,
      |    cast(mx.cx as double) * my.cy / t.n AS e
      |  FROM mx CROSS JOIN my CROSS JOIN t
      |  LEFT JOIN j ON j.x = mx.x AND j.y = my.y),
      |st AS (
      |  SELECT cast(sum(cast(round((c - e) * (c - e) / e, 9)
      |    as decimal(25,9))) as double) AS chi2
      |  FROM cells)
      |SELECT rc.r, cc.cls AS cols, t.n,
      |  round(st.chi2, 4) + 0.0 AS chi2,
      |  round(sqrt(st.chi2 / (t.n * least(rc.r - 1, cc.cls - 1))), 6) + 0.0
      |    AS cramers_v
      |FROM st CROSS JOIN rc CROSS JOIN cc CROSS JOIN t""".stripMargin

  // Spark-side barrier for the exact embedding pair queries: materialize
  // the per-point squared norm behind a tiny exchange so CollapseProject
  // cannot inline the dot product back into every PAIR reference
  // (measured 3x on q355/q370: the self-norms were recomputed 4M times
  // each at sf0.1). The pair distance keeps the exact association
  // ((n2a - 2ab) + n2b) both engines share.
  private def ptsBarrier(spark: Boolean): String =
    if (spark) "(SELECT id, v, n2 FROM ptsn DISTRIBUTE BY id)" else "ptsn"

  // q355 Local Outlier Factor (k=5) over the embedding corpus: kNN by
  // round-9-pinned squared euclidean (precomputed norms + one dot per
  // pair, the proven cross-engine vector arithmetic), reach-distance,
  // lrd, LOF — every
  // aggregation decimal-folded, every ranking tie-broken by id. This is
  // the exact all-pairs twin (the q51/q302 precedent); the at-scale
  // sibling runs the same reach-dist/lrd algebra over IVF-candidate
  // neighborhoods (Similarity.ivfKnnJoin) instead of the cross join.
  private def lofSql(dot: (String, String) => String, vecExpr: String,
      spark: Boolean): String =
    s"""WITH ptsn AS (
       |  SELECT vec_id AS id, $vecExpr AS v,
       |    ${dot(vecExpr, vecExpr)} AS n2
       |  FROM embeddings),
       |pts AS (SELECT * FROM ${ptsBarrier(spark)}),
       |d AS (
       |  SELECT a.id AS ia, b.id AS ib,
       |    round(a.n2 - 2 * ${dot("a.v", "b.v")} + b.n2, 9) AS d2
       |  FROM pts a JOIN pts b ON b.id <> a.id),
       |nn AS (
       |  SELECT ia, ib, d2,
       |    row_number() OVER (PARTITION BY ia ORDER BY d2, ib) AS rk
       |  FROM d),
       |knn AS (SELECT ia, ib, d2 FROM nn WHERE rk <= 5),
       |kd AS (SELECT ia AS id, max(d2) AS kdist FROM knn GROUP BY ia),
       |lrd AS (
       |  SELECT k.ia AS id,
       |    round(cast(5.0 as double)
       |      / cast(sum(cast(round(greatest(kd.kdist, k.d2), 9)
       |          as decimal(25,9))) as double), 9) AS lrd
       |  FROM knn k JOIN kd ON kd.id = k.ib GROUP BY k.ia),
       |lof AS (
       |  SELECT k.ia AS id,
       |    round(cast(sum(cast(round(lb.lrd, 9) as decimal(25,9))) as double)
       |      / (5 * la.lrd), 6) + 0.0 AS lof
       |  FROM knn k
       |  JOIN lrd la ON la.id = k.ia
       |  JOIN lrd lb ON lb.id = k.ib
       |  GROUP BY k.ia, la.lrd)
       |SELECT id, lof FROM lof ORDER BY lof DESC, id LIMIT 20""".stripMargin

  // q356 isotonic regression (calibration fit) by the minimax closed form
  // f_j = max_{i<=j} min_{k>=j} weightedAvg(y, i..k) — equivalent to PAV
  // but join-expressible: the stream reduces to ~100 price bins, prefix
  // sums give every segment average exactly (integer counts), and the
  // triangular segment relation is bins^2 — metadata-sized at any corpus
  // scale. The binned-PAV shape IS the production path (exact PAV over
  // raw rows is inherently sequential).
  private val isotonicSql =
    """WITH b AS (
      |  SELECT cast(floor(o_totalprice / 5000) as bigint) AS x,
      |    cast(count(*) as bigint) AS w,
      |    cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) AS sy
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT x, w, sy, row_number() OVER (ORDER BY x) AS j FROM b),
      |pre AS (
      |  SELECT j, x, w, sy,
      |    sum(w) OVER (ORDER BY j) AS cw,
      |    sum(sy) OVER (ORDER BY j) AS cy
      |  FROM idx),
      |seg AS (
      |  SELECT i.j AS i, k.j AS k,
      |    cast(k.cy - coalesce(p.cy, 0) as double)
      |      / (k.cw - coalesce(p.cw, 0)) AS m
      |  FROM pre i JOIN pre k ON k.j >= i.j
      |  LEFT JOIN pre p ON p.j = i.j - 1),
      |inner_min AS (
      |  SELECT s.i, jj.j, min(s.m) AS mn
      |  FROM seg s JOIN pre jj ON jj.j BETWEEN s.i AND s.k
      |  GROUP BY s.i, jj.j),
      |fit AS (
      |  SELECT j, max(mn) AS f FROM inner_min WHERE i <= j GROUP BY j)
      |SELECT pre.x, pre.w,
      |  round(cast(pre.sy as double) / pre.w, 6) + 0.0 AS observed,
      |  round(fit.f, 6) + 0.0 AS isotonic
      |FROM fit JOIN pre ON pre.j = fit.j
      |ORDER BY pre.x""".stripMargin

  // q357 Theil-Sen robust slope over the daily event-count series: all
  // C(days,2) pairwise slopes (metadata-sized after the daily reduction),
  // median via the parity-free 2r BETWEEN n AND n+2 middle-row pick, then
  // the median intercept at the chosen slope.
  private def theilSenSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |slopes AS (
       |  SELECT round((b.y - a.y) / (b.d - a.d), 9) AS sl
       |  FROM daily a JOIN daily b ON b.d > a.d),
       |rk AS (
       |  SELECT sl, row_number() OVER (ORDER BY sl) AS r,
       |    count(*) OVER () AS n
       |  FROM slopes),
       |med AS (
       |  SELECT cast(max(n) as bigint) AS n_pairs,
       |    round(cast(sum(CASE WHEN 2 * r BETWEEN n AND n + 2
       |        THEN cast(round(sl, 9) as decimal(25,9))
       |        ELSE cast(0 as decimal(25,9)) END) as double)
       |      / sum(CASE WHEN 2 * r BETWEEN n AND n + 2 THEN 1 ELSE 0 END),
       |      9) AS slope
       |  FROM rk),
       |res AS (
       |  SELECT daily.y - med.slope * daily.d AS b0, med.slope, med.n_pairs
       |  FROM daily CROSS JOIN med),
       |rk2 AS (
       |  SELECT b0, slope, n_pairs, row_number() OVER (ORDER BY b0) AS r,
       |    count(*) OVER () AS n
       |  FROM res)
       |SELECT max(n_pairs) AS n_pairs,
       |  round(max(slope), 6) + 0.0 AS slope,
       |  round(cast(sum(CASE WHEN 2 * r BETWEEN n AND n + 2
       |      THEN cast(round(b0, 9) as decimal(25,9))
       |      ELSE cast(0 as decimal(25,9)) END) as double)
       |    / sum(CASE WHEN 2 * r BETWEEN n AND n + 2 THEN 1 ELSE 0 END),
       |    6) + 0.0 AS intercept
       |FROM rk2""".stripMargin

  // q358 rolling 7-day OLS slope over daily counts: every window sum
  // folds as decimals inside the ROWS frame (integer-valued series, so
  // the round-4 pins are exact) — one window pass, no self-join.
  private def rollingOlsSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |win AS (
       |  SELECT d, y,
       |    count(*) OVER w AS n,
       |    cast(sum(cast(round(d, 4) as decimal(25,4))) OVER w as double) AS sx,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) OVER w as double) AS sy,
       |    cast(sum(cast(round(d * y, 4) as decimal(25,4))) OVER w as double) AS sxy,
       |    cast(sum(cast(round(d * d, 4) as decimal(25,4))) OVER w as double) AS sxx
       |  FROM daily
       |  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       |SELECT cast(d as bigint) AS d, y,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope
       |FROM win WHERE n = 7 ORDER BY d""".stripMargin

  // q359 degree assortativity (directed out-in): Pearson over each edge's
  // (source out-degree, target in-degree) — integer degrees, decimal
  // folds, one edges-sized join against the two degree tables. The
  // lineitem-derived graph (orders x parts) has irregular degrees; the
  // modular customer graph is degree-regular and would zero the variance.
  private val assortativitySql =
    """WITH e AS (
      |  SELECT DISTINCT l_orderkey % 300 AS s, l_partkey % 300 AS v
      |  FROM lineitem WHERE l_orderkey % 300 <> l_partkey % 300),
      |dout AS (SELECT s, cast(count(*) as bigint) AS ds FROM e GROUP BY s),
      |din AS (SELECT v, cast(count(*) as bigint) AS dv FROM e GROUP BY v),
      |j AS (
      |  SELECT cast(dout.ds as double) AS x, cast(din.dv as double) AS y
      |  FROM e JOIN dout ON dout.s = e.s JOIN din ON din.v = e.v),
      |st AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(x as decimal(20,1))) as double) AS sx,
      |    cast(sum(cast(y as decimal(20,1))) as double) AS sy,
      |    cast(sum(cast(x * y as decimal(25,1))) as double) AS sxy,
      |    cast(sum(cast(x * x as decimal(25,1))) as double) AS sxx,
      |    cast(sum(cast(y * y as decimal(25,1))) as double) AS syy
      |  FROM j)
      |SELECT n,
      |  round((n * sxy - sx * sy)
      |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
      |    AS assortativity
      |FROM st""".stripMargin

  // q360 modularity of a fixed node partition (c = node % 5) on the same
  // graph: Q = sum_c (e_c/m - (dout_c/m)(din_c/m)) — three edges-sized
  // aggregations, then 5-community decimal-folded algebra.
  private val modularitySql =
    """WITH eraw AS (
      |  SELECT c_custkey % 60 AS s, (c_custkey * 7 + 3) % 60 AS v FROM customer
      |  UNION ALL
      |  SELECT (c_custkey * 3) % 60 AS s, (c_custkey * 11 + 5) % 60 AS v FROM customer),
      |e AS (SELECT DISTINCT s, v FROM eraw WHERE s <> v),
      |m AS (SELECT cast(count(*) as bigint) AS m FROM e),
      |wc AS (
      |  SELECT s % 5 AS c, cast(count(*) as bigint) AS ec
      |  FROM e WHERE s % 5 = v % 5 GROUP BY s % 5),
      |dc AS (
      |  SELECT c, cast(sum(dout) as bigint) AS dout,
      |    cast(sum(din) as bigint) AS din
      |  FROM (
      |    SELECT s % 5 AS c, 1 AS dout, 0 AS din FROM e
      |    UNION ALL
      |    SELECT v % 5 AS c, 0 AS dout, 1 AS din FROM e) z
      |  GROUP BY c),
      |terms AS (
      |  SELECT dc.c,
      |    round(cast(coalesce(wc.ec, 0) as double) / m.m
      |      - (cast(dc.dout as double) / m.m) * (cast(dc.din as double) / m.m),
      |      9) AS q
      |  FROM dc LEFT JOIN wc ON wc.c = dc.c CROSS JOIN m)
      |SELECT cast(c as bigint) AS c, round(q, 6) + 0.0 AS q_c,
      |  round(cast(sum(cast(q as decimal(20,9))) OVER () as double), 6) + 0.0
      |    AS modularity
      |FROM terms ORDER BY c""".stripMargin

  // q361 Huber robust regression, 2 IRLS rounds over the daily series:
  // round 1 is the decimal-folded OLS, weights w = min(1, c/|r|) with
  // c = 1.345 * mean|r| (mean-absolute scale — deterministic, no median
  // sort), round 2 the weighted normal equations under round-9 pins.
  // Both rounds are ONE aggregation each over the days-sized table.
  private def huberSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT cast(${dayNum("ts")} as double) AS x, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |s1 AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(x, 4) as decimal(25,4))) as double) AS sx,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) as double) AS sy,
       |    cast(sum(cast(round(x * y, 4) as decimal(25,4))) as double) AS sxy,
       |    cast(sum(cast(round(x * x, 4) as decimal(25,4))) as double) AS sxx
       |  FROM daily),
       |f1 AS (
       |  SELECT n,
       |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1,
       |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a1
       |  FROM s1),
       |r AS (
       |  SELECT d.x, d.y, round(d.y - (f1.a1 + f1.b1 * d.x), 9) AS res,
       |    f1.a1, f1.b1
       |  FROM daily d CROSS JOIN f1),
       |sc AS (
       |  SELECT cast(1.345 as double)
       |    * cast(sum(cast(round(abs(res), 9) as decimal(25,9))) as double)
       |    / count(*) AS c
       |  FROM r),
       |w AS (
       |  SELECT r.x, r.y,
       |    round(CASE WHEN abs(r.res) <= sc.c THEN cast(1.0 as double)
       |      ELSE sc.c / abs(r.res) END, 9) AS w
       |  FROM r CROSS JOIN sc),
       |s2 AS (
       |  SELECT
       |    cast(sum(cast(round(w, 9) as decimal(25,9))) as double) AS sw,
       |    cast(sum(cast(round(w * x, 6) as decimal(25,6))) as double) AS swx,
       |    cast(sum(cast(round(w * y, 6) as decimal(25,6))) as double) AS swy,
       |    cast(sum(cast(round(w * x * y, 4) as decimal(25,4))) as double) AS swxy,
       |    cast(sum(cast(round(w * x * x, 4) as decimal(25,4))) as double) AS swxx
       |  FROM w)
       |SELECT f1.n,
       |  round(f1.b1, 6) + 0.0 AS ols_slope,
       |  round(f1.a1, 6) + 0.0 AS ols_intercept,
       |  round((s2.sw * s2.swxy - s2.swx * s2.swy)
       |      / (s2.sw * s2.swxx - s2.swx * s2.swx), 6) + 0.0 AS huber_slope,
       |  round((s2.swy - (s2.sw * s2.swxy - s2.swx * s2.swy)
       |        / (s2.sw * s2.swxx - s2.swx * s2.swx) * s2.swx) / s2.sw, 6) + 0.0
       |    AS huber_intercept
       |FROM f1 CROSS JOIN s2""".stripMargin

  // q362 RANSAC line fit over the daily series: 20 DETERMINISTIC trials
  // (md5-seeded point picks — the q325/q333 uniform), inlier counting at
  // a data-derived tolerance with round-9 pinned residuals, best trial by
  // (inliers, trial), then a decimal-folded OLS refit on its inliers.
  // Everything after the daily reduction is days x 20 — metadata-sized.
  private def ransacSql(d: graft.pipeline.TopicModel.Dialect,
      dayNum: String => String): String = {
    val h = (s: String) => d.md5Int(d.cat(Seq("'ransac:'", d.strCast(s))))
    val trials = (1 to 20).map(t => s"($t)").mkString(", ")
    s"""WITH daily AS (
       |  SELECT cast(${dayNum("ts")} as double) AS x, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |idx AS (
       |  SELECT x, y, row_number() OVER (ORDER BY x) AS i,
       |    count(*) OVER () AS n
       |  FROM daily),
       |tol AS (
       |  SELECT cast(0.15 as double)
       |    * cast(sum(cast(round(y, 4) as decimal(25,4))) as double) / count(*) AS tol
       |  FROM daily),
       |trials AS (SELECT * FROM (VALUES $trials) AS t(tr)),
       |pick AS (
       |  SELECT t.tr,
       |    ${h("t.tr")} % nn.n + 1 AS i1,
       |    ${h(d.cat(Seq("t.tr", "':b'")))} % (nn.n - 1) + 1 AS i2r
       |  FROM trials t CROSS JOIN (SELECT max(n) AS n FROM idx) nn),
       |line AS (
       |  SELECT p.tr,
       |    (b.y - a.y) / (b.x - a.x) AS slope,
       |    a.y - (b.y - a.y) / (b.x - a.x) * a.x AS icpt
       |  FROM pick p
       |  JOIN idx a ON a.i = p.i1
       |  JOIN idx b ON b.i = CASE WHEN p.i2r >= p.i1 THEN p.i2r + 1 ELSE p.i2r END),
       |inl AS (
       |  SELECT l.tr, l.slope, l.icpt,
       |    cast(sum(CASE WHEN round(abs(d2.y - (l.icpt + l.slope * d2.x)), 9)
       |      <= round(tol.tol, 9) THEN 1 ELSE 0 END) as bigint) AS n_in
       |  FROM line l CROSS JOIN daily d2 CROSS JOIN tol
       |  GROUP BY l.tr, l.slope, l.icpt),
       |best AS (
       |  SELECT tr, slope, icpt, n_in,
       |    row_number() OVER (ORDER BY n_in DESC, tr) AS rk
       |  FROM inl),
       |fit AS (
       |  SELECT b.tr, b.n_in,
       |    cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(d3.x, 4) as decimal(25,4))) as double) AS sx,
       |    cast(sum(cast(round(d3.y, 4) as decimal(25,4))) as double) AS sy,
       |    cast(sum(cast(round(d3.x * d3.y, 4) as decimal(25,4))) as double) AS sxy,
       |    cast(sum(cast(round(d3.x * d3.x, 4) as decimal(25,4))) as double) AS sxx
       |  FROM best b CROSS JOIN daily d3 CROSS JOIN tol
       |  WHERE b.rk = 1
       |    AND round(abs(d3.y - (b.icpt + b.slope * d3.x)), 9) <= round(tol.tol, 9)
       |  GROUP BY b.tr, b.n_in)
       |SELECT cast(tr as bigint) AS best_trial, n_in AS inliers,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
       |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
       |    + 0.0 AS intercept
       |FROM fit""".stripMargin
  }

  // q363 per-user burstiness: Fano factor + Goh-Barabasi B over the fixed
  // observation span. Zero days contribute nothing to the sums, so no
  // calendar spine is needed — one (user, day) reduction, one per-user
  // aggregation, exact integer sums throughout.
  private def burstinessSql(dayNum: String => String): String =
    s"""WITH ud AS (
       |  SELECT user_id, ${dayNum("ts")} AS d, cast(count(*) as bigint) AS c
       |  FROM events GROUP BY user_id, 2),
       |span AS (
       |  SELECT cast(max(d) - min(d) + 1 as bigint) AS days
       |  FROM (SELECT DISTINCT d FROM ud) z),
       |u AS (
       |  SELECT user_id,
       |    cast(sum(c) as bigint) AS s1,
       |    cast(sum(c * c) as bigint) AS s2
       |  FROM ud GROUP BY user_id),
       |st AS (
       |  SELECT u.user_id,
       |    cast(u.s1 as double) / sp.days AS mu,
       |    (u.s2 - cast(u.s1 as double) * u.s1 / sp.days) / (sp.days - 1) AS v
       |  FROM u CROSS JOIN span sp)
       |SELECT user_id,
       |  round(mu, 6) + 0.0 AS mean_daily,
       |  round(v / mu, 6) + 0.0 AS fano,
       |  round((sqrt(v) - mu) / (sqrt(v) + mu), 6) + 0.0 AS burstiness
       |FROM st ORDER BY round(v / mu, 6) DESC, user_id LIMIT 20""".stripMargin

  // q364 day-of-week uniformity chi-squared: dow = dayNum % 7 (no engine
  // dow spelling), integer counts, expected n/7.
  private def dowChi2Sql(dayNum: String => String): String =
    s"""WITH c AS (
       |  SELECT ${dayNum("ts")} % 7 AS dow, cast(count(*) as bigint) AS n
       |  FROM events GROUP BY 1),
       |t AS (SELECT cast(sum(n) as bigint) AS tot FROM c)
       |SELECT cast(c.dow as int) AS dow, c.n,
       |  round((c.n - cast(t.tot as double) / 7)
       |      * (c.n - cast(t.tot as double) / 7)
       |      / (cast(t.tot as double) / 7), 6) + 0.0 AS chi2_term,
       |  round(cast(sum(cast(round(
       |      (c.n - cast(t.tot as double) / 7)
       |        * (c.n - cast(t.tot as double) / 7)
       |        / (cast(t.tot as double) / 7), 9) as decimal(25,9)))
       |      OVER () as double), 4) + 0.0 AS chi2_total
       |FROM c CROSS JOIN t ORDER BY dow""".stripMargin

  // q365 moving-average type-token ratio (MATTR, window 20): per-doc
  // token array, one distinct-count per sliding window — the window
  // counts are INTEGERS, so the per-doc mean is exact rational
  // arithmetic, no floating fold at all until the final division.
  private def mattrSql(spark: Boolean): String = {
    val toks =
      if (spark) """filter(split(lower(trim(text)), '\\s+'), x -> x != '')"""
      else "regexp_extract_all(lower(trim(text)), '\\S+')"
    val sizeF = if (spark) "size" else "length"
    // Spark's sequence(20, n) runs DESCENDING when n < 20, and expression
    // inlining can evaluate this projection on rows the n >= 20 filter
    // would drop — guard inside the expression rather than relying on
    // operator order. (DuckDB's generate_series is empty when n < 20.)
    // Spark: the native one-pass kernel (window_distinct_counts) — the
    // HOF spelling pays O(n*w) interpreted array_distinct(slice(...))
    // per doc (measured ~6x at sf0.1). Counts are exact ints either way.
    val winCounts =
      if (spark) "window_distinct_counts(t, 20)"
      else
        "list_transform(generate_series(20, n), q -> length(list_distinct(list_slice(t, q - 19, q))))"
    val un = if (spark) "explode(wc) AS c" else "unnest(wc) AS c"
    // Spark: materialize the token array behind a per-doc exchange, or
    // CollapseProject re-inlines the split() into EVERY window lambda
    // reference (measured: the tokenizer ran once per window, 8.5 s ->
    // 1.4 s at sf0.1 with the barrier).
    val arrBarrier =
      if (spark) "(SELECT doc_id, t FROM arr0 DISTRIBUTE BY doc_id)" else "arr0"
    s"""WITH arr0 AS (
       |  SELECT doc_id, $toks AS t FROM documents WHERE text IS NOT NULL),
       |arr AS (SELECT * FROM $arrBarrier),
       |sized AS (SELECT doc_id, t, $sizeF(t) AS n FROM arr WHERE $sizeF(t) >= 20),
       |wins AS (SELECT doc_id, $winCounts AS wc FROM sized),
       |flat AS (SELECT doc_id, $un FROM wins),
       |agg AS (
       |  SELECT doc_id, cast(sum(c) as bigint) AS sc,
       |    cast(count(*) as bigint) AS nw
       |  FROM flat GROUP BY doc_id)
       |SELECT doc_id, nw AS n_windows,
       |  round(cast(sc as double) / (20 * nw), 6) + 0.0 AS mattr
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  // q366 keyword burst detection: token-by-day counts (synthetic
  // doc_id%30 day), burst = peak daily share over the uniform baseline
  // for tokens above a support floor — the Kleinberg-lite ratio test.
  // `tokCte` yields (doc_id, word).
  private def keywordBurstSql(tokCte: String): String =
    s"""WITH tok AS ($tokCte),
       |td AS (
       |  SELECT word, doc_id % 30 AS d, cast(count(*) as bigint) AS c
       |  FROM tok WHERE length(word) >= 4 GROUP BY word, doc_id % 30),
       |wt AS (SELECT word, cast(sum(c) as bigint) AS tot FROM td GROUP BY word),
       |mx AS (SELECT word, cast(max(c) as bigint) AS peak FROM td GROUP BY word)
       |SELECT wt.word, wt.tot, mx.peak,
       |  round((cast(mx.peak as double) + 1) / (cast(wt.tot as double) / 30 + 1),
       |    6) + 0.0 AS burst
       |FROM wt JOIN mx ON mx.word = wt.word
       |WHERE wt.tot >= 30
       |ORDER BY round((cast(mx.peak as double) + 1)
       |  / (cast(wt.tot as double) / 30 + 1), 6) DESC, wt.word
       |LIMIT 20""".stripMargin

  // q367 Hilbert-curve layout (order 8, 256x256): the classic xy2d loop
  // unrolled into 8 CASE-arithmetic rounds — pure integer algebra both
  // engines execute identically (no xor spelling needed: (3*rx)^ry is a
  // 4-way CASE). Semantic twin of the FlatGeobuf writer's Hilbert sort
  // (sources/FlatGeobuf.scala:59, bit-twiddled form); vs q259's Z-order,
  // consecutive Hilbert positions are always spatially adjacent, so
  // range-sharding by d gives strictly better bbox locality. At scale
  // the layout op is repartitionByRange on d — one shuffle, like q259.
  private def hilbertLayoutSql: String = {
    val rounds = (0 until 8).map { k =>
      val s = 128 >> k
      s"""h${k + 1} AS (
         |  SELECT id, px, py,
         |    d + ${s * s} * (CASE WHEN (x & $s) > 0 AND (y & $s) > 0 THEN 2
         |      WHEN (x & $s) > 0 THEN 3
         |      WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d,
         |    CASE WHEN (y & $s) = 0 THEN
         |        CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END
         |      ELSE x END AS x,
         |    CASE WHEN (y & $s) = 0 THEN
         |        CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END
         |      ELSE y END AS y
         |  FROM h$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (
       |  SELECT c_custkey AS id,
       |    cast(c_custkey % 256 as int) AS px,
       |    cast((c_custkey * 7) % 256 as int) AS py,
       |    cast(c_custkey % 256 as int) AS x,
       |    cast((c_custkey * 7) % 256 as int) AS y,
       |    0 AS d
       |  FROM customer),
       |$rounds
       |SELECT cast(floor(d / 1024.0) as bigint) AS shard,
       |  cast(count(*) as bigint) AS n,
       |  cast(min(d) as bigint) AS d_min, cast(max(d) as bigint) AS d_max,
       |  min(px) AS x_min, max(px) AS x_max,
       |  min(py) AS y_min, max(py) AS y_max
       |FROM h8 GROUP BY 1 ORDER BY shard""".stripMargin
  }

  // q368 contrastive negative sampling: k=4 negatives per document from a
  // DETERMINISTIC hash bucket of candidates (pool ~N/16 — at 100 TB the
  // bucket restriction, not the corpus, bounds the pair space), different
  // source required, ranked by the md5 uniform on the (doc, cand) pair.
  private def negativeSamplingSql(d: graft.pipeline.TopicModel.Dialect): String = {
    val h = d.md5Int(d.cat(Seq(d.strCast("a.doc_id"), "':'", d.strCast("c.doc_id"))))
    s"""WITH pool AS (SELECT doc_id, source FROM documents),
       |ranked AS (
       |  SELECT a.doc_id, c.doc_id AS neg_id,
       |    row_number() OVER (PARTITION BY a.doc_id ORDER BY $h, c.doc_id) AS rk
       |  FROM pool a JOIN pool c
       |    ON c.doc_id % 16 = (a.doc_id + 7) % 16
       |   AND c.source <> a.source)
       |SELECT doc_id, neg_id, cast(rk as bigint) AS rk
       |FROM ranked WHERE rk <= 4 AND doc_id % 10 = 0
       |ORDER BY doc_id, rk""".stripMargin
  }

  // q369 hard-negative mining: for each query vector, the top-3 most
  // cosine-similar DIFFERENT-label vectors (the contrastive-training
  // hard negatives). Exact twin at catalog scale; the at-scale sibling
  // probes IVF cells exactly like the q43/q278 ANN family.
  private def hardNegativesSql(dot: (String, String) => String,
      vecExpr: String): String =
    s"""WITH pts AS (
       |  SELECT vec_id AS id, $vecExpr AS v, label FROM embeddings),
       |ranked AS (
       |  SELECT q.id AS q_id, c.id AS neg_id,
       |    round(${dot("q.v", "c.v")}
       |      / (sqrt(${dot("q.v", "q.v")}) * sqrt(${dot("c.v", "c.v")})), 6)
       |      + 0.0 AS cosine,
       |    row_number() OVER (PARTITION BY q.id ORDER BY
       |      ${dot("q.v", "c.v")}
       |        / (sqrt(${dot("q.v", "q.v")}) * sqrt(${dot("c.v", "c.v")})) DESC,
       |      c.id) AS rk
       |  FROM pts q JOIN pts c ON c.label <> q.label
       |  WHERE q.id < 10)
       |SELECT q_id, neg_id, cosine, cast(rk as bigint) AS rk
       |FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  // q370 TwoNN intrinsic-dimension estimate (Facco et al. 2017): per
  // point the ratio of its two nearest-neighbor distances, MLE
  // d = n / sum(ln mu) — same exact-kNN machinery as q355's LOF, same
  // at-scale note (IVF-candidate neighborhoods replace the cross join).
  // Points with a zero first-neighbor distance (exact duplicates) are
  // excluded from the MLE, per the published estimator.
  private def twoNNSql(dot: (String, String) => String, vecExpr: String,
      spark: Boolean): String =
    s"""WITH ptsn AS (
       |  SELECT vec_id AS id, $vecExpr AS v,
       |    ${dot(vecExpr, vecExpr)} AS n2
       |  FROM embeddings),
       |pts AS (SELECT * FROM ${ptsBarrier(spark)}),
       |d AS (
       |  SELECT a.id AS ia, b.id AS ib,
       |    round(a.n2 - 2 * ${dot("a.v", "b.v")} + b.n2, 9) AS d2
       |  FROM pts a JOIN pts b ON b.id <> a.id),
       |nn AS (
       |  SELECT ia, d2,
       |    row_number() OVER (PARTITION BY ia ORDER BY d2, ib) AS rk
       |  FROM d),
       |two AS (
       |  SELECT ia,
       |    max(CASE WHEN rk = 1 THEN d2 END) AS d1,
       |    max(CASE WHEN rk = 2 THEN d2 END) AS dd2
       |  FROM nn WHERE rk <= 2 GROUP BY ia),
       |mu AS (
       |  SELECT ia, round(ln(sqrt(dd2 / d1)), 9) AS lnmu
       |  FROM two WHERE d1 > 0 AND dd2 > 0)
       |SELECT cast(count(*) as bigint) AS n,
       |  round(count(*)
       |    / cast(sum(cast(lnmu as decimal(25,9))) as double), 4) + 0.0
       |    AS intrinsic_dim
       |FROM mu""".stripMargin

  // q371 t-closeness (total-variation flavor): per equivalence class the
  // TV distance between its sensitive-value distribution and the global
  // one, over the FULL class x value grid (absent values contribute
  // p_global). Completes the q295 k-anonymity / l-diversity privacy
  // audit family.
  private val tClosenessSql =
    """WITH q AS (
      |  SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
      |    cast(floor(c.c_acctbal / 1000.0) as bigint) AS bal_bucket,
      |    o.o_orderpriority AS sensitive
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
      |g AS (SELECT sensitive, cast(count(*) as bigint) AS cg FROM q
      |  GROUP BY sensitive),
      |n AS (SELECT cast(sum(cg) as bigint) AS n FROM g),
      |cls AS (
      |  SELECT seg, nat, bal_bucket, cast(count(*) as bigint) AS k
      |  FROM q GROUP BY seg, nat, bal_bucket),
      |cv AS (
      |  SELECT seg, nat, bal_bucket, sensitive,
      |    cast(count(*) as bigint) AS c
      |  FROM q GROUP BY seg, nat, bal_bucket, sensitive),
      |tv AS (
      |  SELECT cls.seg, cls.nat, cls.bal_bucket, cls.k,
      |    round(cast(sum(cast(round(
      |      abs(cast(coalesce(cv.c, 0) as double) / cls.k
      |        - cast(g.cg as double) / n.n) / 2, 9) as decimal(20,9)))
      |      as double), 6) + 0.0 AS t
      |  FROM cls CROSS JOIN g CROSS JOIN n
      |  LEFT JOIN cv ON cv.seg = cls.seg AND cv.nat = cls.nat
      |    AND cv.bal_bucket = cls.bal_bucket AND cv.sensitive = g.sensitive
      |  GROUP BY cls.seg, cls.nat, cls.bal_bucket, cls.k)
      |SELECT seg, cast(nat as bigint) AS nat, bal_bucket, k, t
      |FROM tv ORDER BY t DESC, seg, nat, bal_bucket LIMIT 15""".stripMargin

  // q372 split-conformal prediction interval for the daily-count OLS:
  // train on even days, calibrate on odd days, q_hat = the
  // ceil((n+1)*0.9)-smallest absolute calibration residual (exact rank
  // pick — no quantile interpolation), coverage evaluated over all days.
  // Distribution-free 90% coverage guarantee; everything after the daily
  // reduction is days-sized.
  private def conformalSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT cast(${dayNum("ts")} as double) AS x, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |tr AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(x, 4) as decimal(25,4))) as double) AS sx,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) as double) AS sy,
       |    cast(sum(cast(round(x * y, 4) as decimal(25,4))) as double) AS sxy,
       |    cast(sum(cast(round(x * x, 4) as decimal(25,4))) as double) AS sxx
       |  FROM daily WHERE cast(x as bigint) % 2 = 0),
       |fit AS (
       |  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
       |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
       |  FROM tr),
       |cal AS (
       |  SELECT round(abs(d.y - (f.a + f.b * d.x)), 9) AS r
       |  FROM daily d CROSS JOIN fit f
       |  WHERE cast(d.x as bigint) % 2 = 1),
       |rk AS (
       |  SELECT r, row_number() OVER (ORDER BY r) AS i,
       |    count(*) OVER () AS n
       |  FROM cal),
       |qh AS (
       |  SELECT max(CASE WHEN cast(i as double) >= 0.9 * (n + 1)
       |      AND cast(i - 1 as double) < 0.9 * (n + 1) THEN r END) AS q_hat,
       |    max(n) AS n_cal
       |  FROM rk),
       |cov AS (
       |  SELECT cast(count(*) as bigint) AS n_all,
       |    cast(sum(CASE WHEN round(abs(d.y - (f.a + f.b * d.x)), 9)
       |      <= q.q_hat THEN 1 ELSE 0 END) as bigint) AS covered
       |  FROM daily d CROSS JOIN fit f CROSS JOIN qh q)
       |SELECT qh.n_cal, round(qh.q_hat, 6) + 0.0 AS q_hat,
       |  round(fit.b, 6) + 0.0 AS slope,
       |  cov.n_all, cov.covered,
       |  round(cast(cov.covered as double) / cov.n_all, 6) + 0.0 AS coverage
       |FROM qh CROSS JOIN fit CROSS JOIN cov""".stripMargin

  // q373 Population Stability Index between the even- and odd-orderkey
  // "periods": fixed-width price buckets, share ratio terms with an
  // explicit zero guard, decimal-folded total — the standard model-drift
  // monitor alongside q95's KL and q347's JS.
  private val psiSql =
    """WITH b AS (
      |  SELECT cast(floor(o_totalprice / 50000) as bigint) AS bucket,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS ga
      |  FROM orders),
      |c AS (
      |  SELECT bucket,
      |    cast(sum(ga) as bigint) AS ca,
      |    cast(sum(1 - ga) as bigint) AS cb
      |  FROM b GROUP BY bucket),
      |t AS (SELECT cast(sum(ca) as bigint) AS na, cast(sum(cb) as bigint) AS nb
      |  FROM c),
      |w AS (
      |  SELECT c.bucket, c.ca, c.cb,
      |    round(CASE WHEN c.ca > 0 AND c.cb > 0 THEN
      |      (cast(c.ca as double) / t.na - cast(c.cb as double) / t.nb)
      |        * ln((cast(c.ca as double) / t.na) / (cast(c.cb as double) / t.nb))
      |      ELSE cast(0 as double) END, 9) AS term
      |  FROM c CROSS JOIN t)
      |SELECT bucket, ca, cb, round(term, 6) + 0.0 AS psi_term,
      |  round(cast(sum(cast(term as decimal(20,9))) OVER () as double), 6) + 0.0
      |    AS psi_total
      |FROM w ORDER BY bucket""".stripMargin

  // q374 cumulative gains / lift by score decile (price as the score,
  // F-status as the positive): ntile over a TOTALLY ordered rank
  // (score desc, key) so decile assignment is deterministic; cumulative
  // integer window sums, lift as the final division.
  private val gainLiftSql =
    """WITH s AS (
      |  SELECT o_orderkey AS k, cast(o_totalprice as double) AS score,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      |  FROM orders),
      |d AS (
      |  SELECT pos, ntile(10) OVER (ORDER BY score DESC, k) AS decile
      |  FROM s),
      |g AS (
      |  SELECT decile, cast(count(*) as bigint) AS n,
      |    cast(sum(pos) as bigint) AS npos
      |  FROM d GROUP BY decile),
      |c AS (
      |  SELECT decile, n, npos,
      |    sum(n) OVER (ORDER BY decile) AS cn,
      |    sum(npos) OVER (ORDER BY decile) AS cpos,
      |    sum(n) OVER () AS tn, sum(npos) OVER () AS tpos
      |  FROM g)
      |SELECT cast(decile as int) AS decile, n, npos,
      |  round(cast(cpos as double) / tpos, 6) + 0.0 AS cum_gain,
      |  round((cast(cpos as double) / cn) / (cast(tpos as double) / tn), 6)
      |    + 0.0 AS lift
      |FROM c ORDER BY decile""".stripMargin

  // q375 cohort LTV: signup cohort = the user's first active week,
  // cumulative purchase revenue per cohort user by account age (weeks).
  // Revenue folds as round-6 decimals; the cumulative is a window over
  // the cohort's <= 5 age rows.
  private def cohortLtvSql(dayNum: String => String): String =
    s"""WITH ev AS (
       |  SELECT user_id, ${dayNum("ts")} AS d, event_type,
       |    cast(value as double) AS value
       |  FROM events),
       |fw AS (
       |  SELECT user_id, cast(floor(min(d) / 7.0) as bigint) AS w0
       |  FROM ev GROUP BY user_id),
       |cs AS (SELECT w0, cast(count(*) as bigint) AS users FROM fw GROUP BY w0),
       |rev AS (
       |  SELECT fw.w0, cast(floor(ev.d / 7.0) as bigint) - fw.w0 AS age,
       |    sum(cast(round(ev.value, 6) as decimal(25,6))) AS r
       |  FROM ev JOIN fw ON fw.user_id = ev.user_id
       |  WHERE ev.event_type = 'purchase' AND ev.value IS NOT NULL
       |  GROUP BY fw.w0, cast(floor(ev.d / 7.0) as bigint) - fw.w0)
       |SELECT cast(rev.w0 as bigint) AS cohort_week, cast(age as bigint) AS age_weeks,
       |  cs.users,
       |  round(cast(sum(rev.r) OVER (PARTITION BY rev.w0 ORDER BY age) as double)
       |    / cs.users, 6) + 0.0 AS cum_ltv_per_user
       |FROM rev JOIN cs ON cs.w0 = rev.w0
       |ORDER BY cohort_week, age_weeks""".stripMargin

  // q376 3-itemset association rules: ordered triples within an order's
  // distinct part set (fan-out C(basket,3), the Assoc.maxBasketSize cap
  // guidance applies at power-law scale), support floor, 3-way lift.
  private val tripleAssocSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 200 AS p
      |  FROM lineitem),
      |n AS (SELECT cast(count(DISTINCT o) as bigint) AS n FROM b),
      |f AS (SELECT p, cast(count(*) as bigint) AS c FROM b GROUP BY p),
      |tri AS (
      |  SELECT a.p AS pa, b2.p AS pb, c3.p AS pc,
      |    cast(count(*) as bigint) AS cnt
      |  FROM b a
      |  JOIN b b2 ON b2.o = a.o AND b2.p > a.p
      |  JOIN b c3 ON c3.o = a.o AND c3.p > b2.p
      |  GROUP BY a.p, b2.p, c3.p)
      |SELECT tri.pa, tri.pb, tri.pc, tri.cnt,
      |  round(cast(tri.cnt as double) * n.n * n.n
      |    / (cast(fa.c as double) * fb.c * fc.c), 6) + 0.0 AS lift3
      |FROM tri
      |JOIN f fa ON fa.p = tri.pa
      |JOIN f fb ON fb.p = tri.pb
      |JOIN f fc ON fc.p = tri.pc
      |CROSS JOIN n
      |WHERE tri.cnt >= 3
      |ORDER BY tri.cnt DESC, pa, pb, pc
      |LIMIT 25""".stripMargin

  // q377 next-event prediction accuracy of the Markov argmax policy:
  // pred(s) = argmax_j P(s, j) (count ties broken by target name), scored
  // against every observed transition — the standard sanity eval for the
  // q341/q353 chain. Transition counts are the only corpus-sized work.
  private val nextEventAccuracySql =
    """WITH seq AS (
      |  SELECT event_type AS s,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
      |  FROM events),
      |tr AS (
      |  SELECT s, s2, cast(count(*) as bigint) AS c
      |  FROM seq WHERE s2 IS NOT NULL GROUP BY s, s2),
      |pred AS (
      |  SELECT s, s2 AS p FROM (
      |    SELECT s, s2, row_number() OVER (PARTITION BY s
      |      ORDER BY c DESC, s2) AS rk
      |    FROM tr) z WHERE rk = 1),
      |sc AS (
      |  SELECT tr.s, pred.p,
      |    cast(sum(CASE WHEN tr.s2 = pred.p THEN tr.c ELSE 0 END) as bigint)
      |      AS correct,
      |    cast(sum(tr.c) as bigint) AS total
      |  FROM tr JOIN pred ON pred.s = tr.s
      |  GROUP BY tr.s, pred.p)
      |SELECT s AS state, p AS predicted, correct, total,
      |  round(cast(correct as double) / total, 6) + 0.0 AS accuracy,
      |  round(cast(sum(correct) OVER () as double)
      |    / sum(total) OVER (), 6) + 0.0 AS overall_accuracy
      |FROM sc ORDER BY state""".stripMargin

  // q378 ranking-quality eval (NDCG@10 + MRR): query docs retrieve
  // candidates by shared-distinct-token overlap (deterministic rank:
  // score desc, id), relevance = same source. log2 discounts pinned via
  // ln ratios; IDCG from the query's own relevant count. Completes the
  // retrieval-eval family next to q266/q303's AUC and q267's recall.
  private def ndcgSql(tokCte: String): String =
    s"""WITH tok AS ($tokCte),
       |dt AS (SELECT DISTINCT doc_id, word FROM tok WHERE length(word) >= 4),
       |src AS (SELECT doc_id, source FROM documents),
       |qs AS (SELECT doc_id AS q FROM documents WHERE doc_id < 5),
       |ov AS (
       |  SELECT a.doc_id AS q, b.doc_id AS cand, cast(count(*) as bigint) AS score
       |  FROM qs JOIN dt a ON a.doc_id = qs.q
       |  JOIN dt b ON b.word = a.word AND b.doc_id <> a.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |rk AS (
       |  SELECT ov.q, ov.cand, ov.score,
       |    CASE WHEN sc.source = sq.source THEN 1 ELSE 0 END AS rel,
       |    row_number() OVER (PARTITION BY ov.q
       |      ORDER BY ov.score DESC, ov.cand) AS r
       |  FROM ov
       |  JOIN src sq ON sq.doc_id = ov.q
       |  JOIN src sc ON sc.doc_id = ov.cand),
       |top AS (SELECT * FROM rk WHERE r <= 10),
       |dcg AS (
       |  SELECT q,
       |    cast(sum(cast(round(rel * ln(2.0) / ln(r + 1.0), 9)
       |      as decimal(20,9))) as double) AS dcg,
       |    cast(sum(rel) as bigint) AS nrel,
       |    min(CASE WHEN rel = 1 THEN r END) AS first_rel
       |  FROM top GROUP BY q),
       |ideal AS (
       |  SELECT q,
       |    cast(sum(CASE WHEN i.i <= least(d.nrel, 10)
       |      THEN cast(round(ln(2.0) / ln(i.i + 1.0), 9) as decimal(20,9))
       |      ELSE cast(0 as decimal(20,9)) END) as double) AS idcg
       |  FROM dcg d CROSS JOIN
       |    (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) AS t(i)) i
       |  GROUP BY q, d.nrel)
       |SELECT d.q, d.nrel,
       |  round(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg ELSE 0 END, 6) + 0.0
       |    AS ndcg10,
       |  round(CASE WHEN d.first_rel IS NOT NULL
       |    THEN cast(1.0 as double) / d.first_rel ELSE 0 END, 6) + 0.0 AS rr
       |FROM dcg d JOIN ideal i ON i.q = d.q
       |ORDER BY d.q""".stripMargin

  // q379 UMass topic coherence over the per-language top-5 df terms:
  // coherence(c) = sum over ordered top-word pairs of
  // ln((D(wi, wj) + 1) / D(wj)) — co-document counts bounded by the
  // |classes| x 5 chosen vocabulary, never the corpus pair space.
  private def coherenceSql(tokCte: String): String =
    s"""WITH tok AS ($tokCte),
       |dt AS (SELECT DISTINCT doc_id, lang, word FROM tok
       |  WHERE length(word) >= 4),
       |dfw AS (SELECT word, cast(count(DISTINCT doc_id) as bigint) AS df
       |  FROM dt GROUP BY word),
       |topw AS (
       |  SELECT lang, word, df, rk FROM (
       |    SELECT dt.lang, dt.word, dfw.df,
       |      row_number() OVER (PARTITION BY dt.lang
       |        ORDER BY count(DISTINCT dt.doc_id) DESC, dt.word) AS rk
       |    FROM dt JOIN dfw ON dfw.word = dt.word
       |    GROUP BY dt.lang, dt.word, dfw.df) z
       |  WHERE rk <= 5),
       |docs AS (SELECT DISTINCT doc_id, word FROM dt),
       |co AS (
       |  SELECT a.lang, a.word AS wi, b.word AS wj,
       |    cast(count(DISTINCT CASE WHEN db.doc_id IS NOT NULL
       |      THEN da.doc_id END) as bigint) AS dij
       |  FROM topw a
       |  JOIN topw b ON b.lang = a.lang AND b.rk < a.rk
       |  LEFT JOIN docs da ON da.word = a.word
       |  LEFT JOIN docs db ON db.word = b.word AND db.doc_id = da.doc_id
       |  GROUP BY a.lang, a.word, b.word)
       |SELECT co.lang,
       |  round(cast(sum(cast(round(
       |    ln((cast(co.dij as double) + 1) / dfw.df), 9) as decimal(20,9)))
       |    as double), 6) + 0.0 AS coherence
       |FROM co JOIN dfw ON dfw.word = co.wj
       |GROUP BY co.lang ORDER BY co.lang""".stripMargin

  // q380 personalized PageRank from node 0 (alpha = 0.85, 4 unrolled
  // rounds, out-degree-normalized, dangling mass to the seed): the
  // decimal-pinned recurrence both engines execute identically — the
  // seed-restart variant of q218's global PageRank.
  private def pprSql(iters: Int): String = {
    val dec = "decimal(28,9)"
    val rounds = (1 to iters).map { k =>
      s"""m$k AS (
         |  SELECT e.v AS node,
         |    sum(cast(round(cast(x${k - 1}.x as double) / dout.c, 12)
         |      as decimal(28,12))) AS mass
         |  FROM e JOIN x${k - 1} ON x${k - 1}.node = e.s
         |  JOIN dout ON dout.s = e.s
         |  GROUP BY e.v),
         |x$k AS (
         |  SELECT nodes.node,
         |    cast(round(cast(0.85 as double) * cast(coalesce(m$k.mass, 0) as double)
         |      + CASE WHEN nodes.node = 0 THEN cast(0.15 as double)
         |        ELSE cast(0 as double) END, 9) as $dec) AS x
         |  FROM nodes LEFT JOIN m$k USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT c_custkey % 60 AS s, (c_custkey * 7 + 3) % 60 AS v FROM customer
       |  UNION ALL
       |  SELECT (c_custkey * 3) % 60 AS s, (c_custkey * 11 + 5) % 60 AS v FROM customer),
       |e AS (SELECT DISTINCT s, v FROM eraw WHERE s <> v),
       |dout AS (SELECT s, cast(count(*) as bigint) AS c FROM e GROUP BY s),
       |nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT s AS node FROM e UNION ALL SELECT v AS node FROM e) z),
       |x0 AS (SELECT node,
       |  cast(CASE WHEN node = 0 THEN 1.0 ELSE 0.0 END as $dec) AS x FROM nodes),
       |$rounds
       |SELECT node, round(cast(x as double), 6) + 0.0 AS ppr
       |FROM x$iters WHERE cast(x as double) > 0 ORDER BY node""".stripMargin
  }

  // q381 seasonal-naive forecast backtest: y_hat(d) = y(d - 7), scored
  // with MAE / MAPE / sMAPE over every day with a 7-back observation —
  // the baseline every forecaster must beat, and the natural eval next
  // to q293's decomposition and q328's smoothing. Days-sized after the
  // daily reduction.
  private def snaiveEvalSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |j AS (
       |  SELECT a.d, a.y, b.y AS yhat
       |  FROM daily a JOIN daily b ON b.d = a.d - 7)
       |SELECT cast(count(*) as bigint) AS n,
       |  round(cast(sum(cast(round(abs(y - yhat), 6) as decimal(25,6)))
       |    as double) / count(*), 6) + 0.0 AS mae,
       |  round(cast(sum(cast(round(abs(y - yhat) / y, 9) as decimal(20,9)))
       |    as double) / count(*), 6) + 0.0 AS mape,
       |  round(cast(sum(cast(round(2 * abs(y - yhat) / (y + yhat), 9)
       |    as decimal(20,9))) as double) / count(*), 6) + 0.0 AS smape
       |FROM j""".stripMargin

  // q382 two-level binary segmentation of the daily series: the split
  // maximizing the between-segment sum-of-squares gain
  // G(k) = S_L^2/n_L + S_R^2/n_R (prefix-sum algebra, exact integer
  // sums), then the best split inside each half — the greedy first two
  // levels of the standard changepoint tree, complementing q284's CUSUM.
  private def binarySegSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1),
       |idx AS (
       |  SELECT y, row_number() OVER (ORDER BY d) AS i,
       |    count(*) OVER () AS n, d
       |  FROM daily),
       |pre AS (
       |  SELECT i, d, n, sum(y) OVER (ORDER BY i) AS cy,
       |    sum(y) OVER () AS ty
       |  FROM idx),
       |gain AS (
       |  SELECT i, d, n,
       |    round(cast(cy as double) * cy / i
       |      + cast(ty - cy as double) * (ty - cy) / (n - i)
       |      - cast(ty as double) * ty / n, 6) AS g
       |  FROM pre
       |  -- minimum segment length 3 per side: a boundary split would
       |  -- leave one half with no interior level-2 candidates (and
       |  -- argmax-at-the-edge is the classic binary-seg degeneracy)
       |  WHERE i BETWEEN 3 AND n - 3),
       |s1 AS (
       |  SELECT i AS k1, d AS day1, g AS g1 FROM gain
       |  ORDER BY g DESC, i LIMIT 1),
       |gainl AS (
       |  SELECT p.i, p.d,
       |    round(cast(p.cy as double) * p.cy / p.i
       |      + (cast(pk.cy - p.cy as double)) * (pk.cy - p.cy) / (s1.k1 - p.i)
       |      - cast(pk.cy as double) * pk.cy / s1.k1, 6) AS g
       |  FROM pre p CROSS JOIN s1
       |  JOIN pre pk ON pk.i = s1.k1
       |  WHERE p.i < s1.k1),
       |gainr AS (
       |  SELECT p.i, p.d,
       |    round((cast(p.cy - pk.cy as double)) * (p.cy - pk.cy) / (p.i - s1.k1)
       |      + (cast(pr.ty - p.cy as double)) * (pr.ty - p.cy) / (pr.n - p.i)
       |      - (cast(pr.ty - pk.cy as double)) * (pr.ty - pk.cy) / (pr.n - s1.k1),
       |      6) AS g
       |  FROM pre p CROSS JOIN s1
       |  JOIN pre pk ON pk.i = s1.k1
       |  JOIN (SELECT max(n) AS n, max(ty) AS ty FROM pre) pr ON 1 = 1
       |  WHERE p.i > s1.k1 AND p.i < pr.n),
       |s2l AS (SELECT d AS day2l, g AS g2l FROM gainl ORDER BY g DESC, i LIMIT 1),
       |s2r AS (SELECT d AS day2r, g AS g2r FROM gainr ORDER BY g DESC, i LIMIT 1)
       |SELECT cast(s1.day1 as bigint) AS split1_day, round(s1.g1, 4) + 0.0 AS gain1,
       |  cast(s2l.day2l as bigint) AS split2_left_day, round(s2l.g2l, 4) + 0.0 AS gain2_left,
       |  cast(s2r.day2r as bigint) AS split2_right_day, round(s2r.g2r, 4) + 0.0 AS gain2_right
       |FROM s1 CROSS JOIN s2l CROSS JOIN s2r""".stripMargin

  // q383 sequential probability ratio test (Wald SPRT): the LLR walk over
  // the event stream in (ts, event_id) order — the cumulative sum folds
  // as ordered decimals, the stopping step is the first |LLR| crossing of
  // ln((1-beta)/alpha). The design constants (p0=0.30 vs p1=0.35,
  // alpha=beta=0.05) are pinned doubles.
  private val sprtSql =
    """WITH s AS (
      |  SELECT event_id, ts,
      |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS succ
      |  FROM events WHERE value IS NOT NULL),
      |walk AS (
      |  SELECT event_id, succ,
      |    row_number() OVER (ORDER BY ts, event_id) AS step,
      |    sum(CASE WHEN succ = 1
      |      THEN cast(round(ln(cast(0.35 as double) / cast(0.30 as double)), 9)
      |        as decimal(20,9))
      |      ELSE cast(round(ln(cast(0.65 as double) / cast(0.70 as double)), 9)
      |        as decimal(20,9)) END)
      |      OVER (ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
      |  FROM s),
      |bound AS (SELECT round(ln(cast(19.0 as double)), 9) AS b),
      |crossing AS (
      |  SELECT min(step) AS stop_step
      |  FROM walk CROSS JOIN bound
      |  WHERE abs(cast(llr as double)) >= bound.b),
      |verdict AS (
      |  SELECT w.step, cast(w.llr as double) AS llr
      |  FROM walk w JOIN crossing c ON w.step = c.stop_step)
      |SELECT c.stop_step,
      |  round(v.llr, 6) + 0.0 AS llr_at_stop,
      |  CASE WHEN v.llr > 0 THEN 'accept_p1' ELSE 'accept_p0' END AS decision,
      |  round(b.b, 6) + 0.0 AS bound
      |FROM crossing c JOIN verdict v ON 1 = 1 CROSS JOIN bound b""".stripMargin

  // q384 TextRank keywords: weighted PageRank over the within-doc
  // co-occurrence graph of the deterministic top-50 vocabulary (q345's
  // cap bounds the graph at any corpus size), 4 decimal-pinned rounds,
  // top-10 words. `tokCte` yields (doc_id, word).
  private def textRankSql(tokCte: String, iters: Int): String = {
    val dec = "decimal(20,9)"
    val rounds = (1 to iters).map { k =>
      s"""m$k AS (
         |  SELECT e.wb AS word,
         |    sum(cast(round(cast(x${k - 1}.x as double) * e.w / ow.tw, 12)
         |      as decimal(25,12))) AS mass
         |  FROM e JOIN x${k - 1} ON x${k - 1}.word = e.wa
         |  JOIN ow ON ow.word = e.wa
         |  GROUP BY e.wb),
         |x$k AS (
         |  SELECT v.word,
         |    cast(round(cast(0.15 as double)
         |      + cast(0.85 as double) * cast(coalesce(m$k.mass, 0) as double), 9)
         |      as $dec) AS x
         |  FROM v LEFT JOIN m$k ON m$k.word = v.word)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS ($tokCte),
       |dt AS (SELECT DISTINCT doc_id, word FROM tok WHERE length(word) >= 4),
       |df AS (SELECT word, cast(count(*) as bigint) AS c FROM dt GROUP BY word),
       |v AS (SELECT word FROM df ORDER BY c DESC, word LIMIT 50),
       |fd AS (SELECT dt.doc_id, dt.word FROM dt JOIN v ON v.word = dt.word),
       |pairs AS (
       |  SELECT a.word AS wa, b.word AS wb, cast(count(*) as bigint) AS w
       |  FROM fd a JOIN fd b ON b.doc_id = a.doc_id AND b.word <> a.word
       |  GROUP BY a.word, b.word),
       |e AS (SELECT wa, wb, w FROM pairs WHERE w >= 2),
       |ow AS (SELECT wa AS word, cast(sum(w) as bigint) AS tw FROM e GROUP BY wa),
       |x0 AS (SELECT word, cast(1.0 as $dec) AS x FROM v),
       |$rounds
       |SELECT word, round(cast(x as double), 6) + 0.0 AS score
       |FROM x$iters ORDER BY round(cast(x as double), 6) DESC, word
       |LIMIT 10""".stripMargin
  }

  // q385 Neyman stratified-sampling allocation: per-stratum N_h and
  // sd_h from decimal-folded sums, n_h = round(500 * N_h sd_h / total),
  // against the proportional allocation — the survey-sampling design
  // table for the q83 stratified sampler.
  private val neymanSql =
    """WITH s AS (
      |  SELECT c_mktsegment AS h, cast(count(*) as bigint) AS nh,
      |    cast(sum(cast(round(cast(c_acctbal as double), 6)
      |      as decimal(30,6))) as double) AS s1,
      |    cast(sum(cast(round(cast(c_acctbal as double)
      |      * cast(c_acctbal as double), 6) as decimal(30,6))) as double) AS s2
      |  FROM customer GROUP BY c_mktsegment),
      |sd AS (
      |  SELECT h, nh,
      |    sqrt((s2 - s1 * s1 / nh) / (nh - 1.0)) AS sig
      |  FROM s),
      |t AS (
      |  SELECT cast(sum(nh) as bigint) AS n,
      |    cast(sum(cast(round(nh * sig, 6) as decimal(30,6))) as double) AS tot
      |  FROM sd)
      |SELECT sd.h, sd.nh, round(sd.sig, 6) + 0.0 AS sigma,
      |  cast(round(500 * sd.nh * sd.sig / t.tot, 0) as bigint) AS neyman_n,
      |  cast(round(500.0 * sd.nh / t.n, 0) as bigint) AS proportional_n
      |FROM sd CROSS JOIN t ORDER BY sd.h""".stripMargin

  // q386 Krippendorff's alpha (nominal, complete data): the q314 rater
  // panel, disagreement from per-item label counts o_uc, expectation
  // from the global label totals — exact integer counts, the alpha is
  // one scalar division. Completes the agreement family (Cohen, Fleiss).
  private val krippendorffSql =
    """WITH ann AS (
      |  SELECT o_orderkey AS item,
      |    substring(o_orderpriority, 1, 1) AS label FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, CASE WHEN o_orderkey % 5 = 0
      |    THEN cast(cast(substring(o_orderpriority, 1, 1) as int) % 5 + 1 as string)
      |    ELSE substring(o_orderpriority, 1, 1) END FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, CASE WHEN o_orderkey % 3 = 0
      |    THEN cast((cast(substring(o_orderpriority, 1, 1) as int) + 1) % 5 + 1 as string)
      |    ELSE substring(o_orderpriority, 1, 1) END FROM orders),
      |o AS (
      |  SELECT item, label, cast(count(*) as bigint) AS ouc
      |  FROM ann GROUP BY item, label),
      |du AS (
      |  SELECT item, cast(sum(ouc * (3 - ouc)) as bigint) AS dis
      |  FROM o GROUP BY item),
      |tot AS (
      |  SELECT cast(count(*) as bigint) AS n_items,
      |    cast(sum(dis) as bigint) AS sdis
      |  FROM du),
      |lc AS (SELECT label, cast(sum(ouc) as bigint) AS nc FROM o GROUP BY label),
      |de AS (
      |  SELECT cast(sum(nc * (t.n_items * 3 - nc)) as bigint) AS sde,
      |    max(t.n_items * 3) AS ntot
      |  FROM lc CROSS JOIN tot t)
      |SELECT tot.n_items,
      |  round(cast(tot.sdis as double) / (tot.n_items * 3 * 2), 6) + 0.0 AS d_obs,
      |  round(cast(de.sde as double) / (de.ntot * (de.ntot - 1)), 6) + 0.0 AS d_exp,
      |  round(1 - (cast(tot.sdis as double) / (tot.n_items * 3 * 2))
      |    / (cast(de.sde as double) / (de.ntot * (de.ntot - 1))), 6) + 0.0
      |    AS alpha
      |FROM tot CROSS JOIN de""".stripMargin

  // q387 Bradley-Terry strengths by 3 unrolled MM rounds over basket
  // quantity duels (higher l_quantity wins, ties dropped): the item set
  // is the 15-bucket part space, so every round is 15x15 algebra; the
  // corpus-sized work is the one duel-count aggregation.
  private def bradleyTerrySql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""raw$k AS (
         |  SELECT w.i, w.wins,
         |    cast(round(cast(w.wins as double)
         |      / cast(sum(cast(round(cast(nij.n as double)
         |        / (cast(pa.p as double) + pb.p), 12) as decimal(25,12)))
         |        as double), 9) as decimal(20,9)) AS raw
         |  FROM w
         |  JOIN nij ON nij.i = w.i
         |  JOIN p${k - 1} pa ON pa.i = w.i
         |  JOIN p${k - 1} pb ON pb.i = nij.j
         |  GROUP BY w.i, w.wins),
         |p$k AS (
         |  SELECT i, cast(round(cast(raw as double)
         |    / cast(sum(raw) OVER () as double), 9) as decimal(20,9)) AS p
         |  FROM raw$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT l_orderkey AS o, l_partkey % 15 AS i,
       |    cast(sum(l_quantity) as double) AS q
       |  FROM lineitem GROUP BY l_orderkey, l_partkey % 15),
       |duel AS (
       |  SELECT a.i AS wi, b.i AS li
       |  FROM li a JOIN li b ON b.o = a.o AND b.i <> a.i AND a.q > b.q),
       |w AS (SELECT wi AS i, cast(count(*) as bigint) AS wins FROM duel GROUP BY wi),
       |nij AS (
       |  SELECT i, j, cast(sum(n) as bigint) AS n FROM (
       |    SELECT wi AS i, li AS j, count(*) AS n FROM duel GROUP BY wi, li
       |    UNION ALL
       |    SELECT li AS i, wi AS j, count(*) AS n FROM duel GROUP BY li, wi) z
       |  GROUP BY i, j),
       |p0 AS (SELECT DISTINCT i, cast(round(1.0 / 15, 9) as decimal(20,9)) AS p
       |  FROM nij),
       |$rounds
       |SELECT cast(i as bigint) AS item,
       |  round(cast(p as double), 6) + 0.0 AS strength
       |FROM p$iters ORDER BY item""".stripMargin
  }

  // q388 hierarchical group imputation for a synthetically masked value
  // (event_id % 13 = 0 plays "missing"): coalesce down the
  // (user, type) -> type -> global mean ladder, every mean decimal-
  // folded from the UNMASKED rows only. The fill levels report which
  // rung each hole used — the standard data-repair audit.
  private val groupImputeSql =
    """WITH base AS (
      |  SELECT event_id, user_id, event_type,
      |    CASE WHEN event_id % 13 = 0 THEN NULL
      |      ELSE cast(value as double) END AS v
      |  FROM events WHERE value IS NOT NULL),
      |ug AS (
      |  SELECT user_id, event_type,
      |    cast(sum(cast(round(v, 6) as decimal(25,6))) as double)
      |      / count(v) AS m
      |  FROM base WHERE v IS NOT NULL GROUP BY user_id, event_type),
      |tg AS (
      |  SELECT event_type,
      |    cast(sum(cast(round(v, 6) as decimal(25,6))) as double)
      |      / count(v) AS m
      |  FROM base WHERE v IS NOT NULL GROUP BY event_type),
      |gg AS (
      |  SELECT cast(sum(cast(round(v, 6) as decimal(25,6))) as double)
      |    / count(v) AS m
      |  FROM base WHERE v IS NOT NULL),
      |fill AS (
      |  SELECT b.event_type,
      |    CASE WHEN ug.m IS NOT NULL THEN 'user_type'
      |      WHEN tg.m IS NOT NULL THEN 'type' ELSE 'global' END AS level,
      |    coalesce(ug.m, tg.m, gg.m) AS imputed
      |  FROM base b
      |  LEFT JOIN ug ON ug.user_id = b.user_id AND ug.event_type = b.event_type
      |  LEFT JOIN tg ON tg.event_type = b.event_type
      |  CROSS JOIN gg
      |  WHERE b.v IS NULL)
      |SELECT event_type, level, cast(count(*) as bigint) AS n_filled,
      |  round(cast(sum(cast(round(imputed, 6) as decimal(25,6))) as double), 4)
      |    + 0.0 AS imputed_sum
      |FROM fill GROUP BY event_type, level
      |ORDER BY event_type, level""".stripMargin

  // q389 two-sample power analysis from the observed click/view effect:
  // pooled variance, observed delta, n-per-arm for 80% power at
  // alpha=0.05 (z constants pinned as literals) — the planning
  // counterpart of q339's test.
  private val powerAnalysisSql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |s AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(v, 9) as decimal(30,9))) as double) AS s1,
      |    cast(sum(cast(round(v * v, 9) as decimal(30,9))) as double) AS s2
      |  FROM base GROUP BY g),
      |m AS (
      |  SELECT g, n, s1 / n AS mu, (s2 - s1 * s1 / n) / (n - 1.0) AS vr
      |  FROM s),
      |p AS (
      |  SELECT max(CASE WHEN g = 1 THEN n END) AS n1,
      |    max(CASE WHEN g = 0 THEN n END) AS n2,
      |    max(CASE WHEN g = 1 THEN mu END) AS mu1,
      |    max(CASE WHEN g = 0 THEN mu END) AS mu2,
      |    max(CASE WHEN g = 1 THEN vr END) AS v1,
      |    max(CASE WHEN g = 0 THEN vr END) AS v2
      |  FROM m)
      |SELECT
      |  round(abs(mu1 - mu2), 6) + 0.0 AS delta,
      |  round(sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2.0)), 6)
      |    + 0.0 AS sd_pooled,
      |  cast(ceil(2 * (cast(1.959964 as double) + cast(0.841621 as double))
      |      * (cast(1.959964 as double) + cast(0.841621 as double))
      |      * (((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2.0))
      |      / ((mu1 - mu2) * (mu1 - mu2))) as bigint) AS n_per_arm
      |FROM p""".stripMargin

  // q390 Lorenz curve deciles of customer spend (the curve behind
  // q331's Gini): ntile over the total (spend, key) order, cumulative
  // decimal-folded spend share per decile.
  private val lorenzSql =
    """WITH sp AS (
      |  SELECT o_custkey AS k,
      |    cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS x
      |  FROM orders GROUP BY o_custkey),
      |d AS (
      |  SELECT x, ntile(10) OVER (ORDER BY x, k) AS decile FROM sp),
      |g AS (
      |  SELECT decile, cast(count(*) as bigint) AS n,
      |    sum(cast(round(x, 2) as decimal(25,2))) AS s
      |  FROM d GROUP BY decile)
      |SELECT cast(decile as int) AS decile, n,
      |  round(cast(sum(n) OVER (ORDER BY decile) as double)
      |    / sum(n) OVER (), 6) + 0.0 AS cum_pop_share,
      |  round(cast(sum(s) OVER (ORDER BY decile) as double)
      |    / cast(sum(s) OVER () as double), 6) + 0.0 AS cum_spend_share
      |FROM g ORDER BY decile""".stripMargin

  // q391 sample-ratio-mismatch check: user-level assignment counts vs
  // the designed 50/50, one-df chi-squared against the 3.841 critical
  // value — the first gate of any experiment readout.
  private val srmSql =
    """WITH u AS (
      |  SELECT DISTINCT user_id FROM events),
      |c AS (
      |  SELECT cast(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) as bigint) AS na,
      |    cast(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) as bigint) AS nb
      |  FROM u)
      |SELECT na, nb,
      |  round((na - (na + nb) / cast(2.0 as double))
      |      * (na - (na + nb) / cast(2.0 as double))
      |      / ((na + nb) / cast(2.0 as double))
      |    + (nb - (na + nb) / cast(2.0 as double))
      |      * (nb - (na + nb) / cast(2.0 as double))
      |      / ((na + nb) / cast(2.0 as double)), 6) + 0.0 AS chi2,
      |  CASE WHEN (na - (na + nb) / cast(2.0 as double))
      |      * (na - (na + nb) / cast(2.0 as double))
      |      / ((na + nb) / cast(2.0 as double))
      |    + (nb - (na + nb) / cast(2.0 as double))
      |      * (nb - (na + nb) / cast(2.0 as double))
      |      / ((na + nb) / cast(2.0 as double)) > cast(3.841 as double)
      |    THEN 1 ELSE 0 END AS srm_flag
      |FROM c""".stripMargin

  // q392 CUPED variance reduction: per-user pre-period (days < 15) and
  // post-period value sums, theta = cov(pre, post)/var(pre), adjusted
  // variance = var(post) - theta^2 var(pre) (equivalently (1 - rho^2)) —
  // every moment decimal-folded.
  private def cupedSql(dayNum: String => String): String =
    s"""WITH ev AS (
       |  SELECT user_id, ${dayNum("ts")} AS d, cast(value as double) AS v
       |  FROM events WHERE value IS NOT NULL),
       |d0 AS (SELECT min(d) AS d0 FROM ev),
       |u AS (
       |  SELECT user_id,
       |    cast(sum(CASE WHEN d < d0.d0 + 15
       |      THEN cast(round(v, 6) as decimal(25,6))
       |      ELSE cast(0 as decimal(25,6)) END) as double) AS pre,
       |    cast(sum(CASE WHEN d >= d0.d0 + 15
       |      THEN cast(round(v, 6) as decimal(25,6))
       |      ELSE cast(0 as decimal(25,6)) END) as double) AS post
       |  FROM ev CROSS JOIN d0 GROUP BY user_id),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(pre, 4) as decimal(25,4))) as double) AS sx,
       |    cast(sum(cast(round(post, 4) as decimal(25,4))) as double) AS sy,
       |    cast(sum(cast(round(pre * post, 2) as decimal(28,2))) as double) AS sxy,
       |    cast(sum(cast(round(pre * pre, 2) as decimal(28,2))) as double) AS sxx,
       |    cast(sum(cast(round(post * post, 2) as decimal(28,2))) as double) AS syy
       |  FROM u)
       |SELECT n,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS theta,
       |  round((n * syy - sy * sy) / (cast(n as double) * n), 4) + 0.0 AS var_post,
       |  round(((n * syy - sy * sy)
       |    - (n * sxy - sx * sy) * (n * sxy - sx * sy) / (n * sxx - sx * sx))
       |    / (cast(n as double) * n), 4) + 0.0 AS var_adjusted,
       |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
       |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
       |    AS variance_reduction
       |FROM m""".stripMargin

  // q393 quantile treatment effects: exact type-1 rank quantiles per
  // group at p25/p50/p75 (smallest value with rank >= ceil(p*n), ties
  // by construction deterministic), group difference per quantile.
  private val qteSql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |rk AS (
      |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS r,
      |    count(*) OVER (PARTITION BY g) AS n
      |  FROM base),
      |ps AS (SELECT * FROM (VALUES (25), (50), (75)) AS t(p)),
      |qv AS (
      |  SELECT ps.p, rk.g, min(rk.v) AS q
      |  FROM ps JOIN rk
      |    ON rk.r >= ceil(ps.p * rk.n / cast(100.0 as double))
      |  GROUP BY ps.p, rk.g)
      |SELECT cast(a.p as int) AS p,
      |  round(a.q, 6) + 0.0 AS q_click,
      |  round(b.q, 6) + 0.0 AS q_view,
      |  round(a.q - b.q, 6) + 0.0 AS qte
      |FROM qv a JOIN qv b ON b.p = a.p AND b.g = 0
      |WHERE a.g = 1 ORDER BY p""".stripMargin

  // q394 reciprocity + global clustering coefficient of the lineitem
  // graph: reciprocity from one self-join on reversed keys; clustering
  // = 3*triangles/wedges on the undirected reduction (wedges from
  // degrees, triangles from the ordered two-hop join).
  private val reciprocityClusteringSql =
    """WITH e AS (
      |  SELECT DISTINCT l_orderkey % 300 AS s, l_partkey % 300 AS v
      |  FROM lineitem WHERE l_orderkey % 300 <> l_partkey % 300),
      |rec AS (
      |  SELECT cast(count(*) as bigint) AS m,
      |    cast(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) as bigint)
      |      AS recip
      |  FROM e LEFT JOIN e r ON r.s = e.v AND r.v = e.s),
      |und AS (
      |  SELECT DISTINCT least(s, v) AS a, greatest(s, v) AS b FROM e),
      |deg AS (
      |  SELECT node, cast(count(*) as bigint) AS d FROM (
      |    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) z
      |  GROUP BY node),
      |wed AS (SELECT cast(sum(d * (d - 1) / 2) as bigint) AS wedges FROM deg),
      |tri AS (
      |  SELECT cast(count(*) as bigint) AS triangles
      |  FROM und ab
      |  JOIN und bc ON bc.a = ab.b
      |  JOIN und ac ON ac.a = ab.a AND ac.b = bc.b)
      |SELECT rec.m, rec.recip,
      |  round(cast(rec.recip as double) / rec.m, 6) + 0.0 AS reciprocity,
      |  wed.wedges, tri.triangles,
      |  round(cast(3.0 as double) * tri.triangles / wed.wedges, 6) + 0.0
      |    AS clustering
      |FROM rec CROSS JOIN wed CROSS JOIN tri""".stripMargin

  // q395 power-law fit of the degree distribution: log-log OLS slope +
  // R^2 over (ln deg, ln count) for deg >= 2 — the quick-look tail
  // exponent (alpha ~ -slope) with the fit quality alongside.
  private val powerlawFitSql =
    """WITH e AS (
      |  SELECT DISTINCT l_orderkey % 300 AS s, l_partkey % 300 AS v
      |  FROM lineitem WHERE l_orderkey % 300 <> l_partkey % 300),
      |und AS (
      |  SELECT DISTINCT least(s, v) AS a, greatest(s, v) AS b FROM e),
      |deg AS (
      |  SELECT node, cast(count(*) as bigint) AS d FROM (
      |    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) z
      |  GROUP BY node),
      |dist AS (
      |  SELECT d, cast(count(*) as bigint) AS c FROM deg
      |  WHERE d >= 2 GROUP BY d),
      |pts AS (
      |  SELECT round(ln(cast(d as double)), 9) AS x,
      |    round(ln(cast(c as double)), 9) AS y
      |  FROM dist),
      |st AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 9) as decimal(20,9))) as double) AS sx,
      |    cast(sum(cast(round(y, 9) as decimal(20,9))) as double) AS sy,
      |    cast(sum(cast(round(x * y, 9) as decimal(20,9))) as double) AS sxy,
      |    cast(sum(cast(round(x * x, 9) as decimal(20,9))) as double) AS sxx,
      |    cast(sum(cast(round(y * y, 9) as decimal(20,9))) as double) AS syy
      |  FROM pts)
      |SELECT n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
      |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
      |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS r2
      |FROM st""".stripMargin

  // q397 Brier score + Murphy decomposition for a deterministic
  // logistic "model" (price z-score vs F-status): reliability /
  // resolution / uncertainty over 10 equal-width probability bins,
  // every mean decimal-folded. Completes the calibration family
  // (q273 reliability curve, q291 calibration fix).
  private val brierSql =
    """WITH g AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(cast(o_totalprice as double), 2)
      |      as decimal(25,2))) as double) AS s1,
      |    cast(sum(cast(round(cast(o_totalprice as double)
      |      * o_totalprice, 0) as decimal(30,0))) as double) AS s2
      |  FROM orders),
      |sc AS (
      |  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |    round(cast(1.0 as double)
      |      / (1 + exp(-(cast(o_totalprice as double) - g.s1 / g.n)
      |        / sqrt((g.s2 - g.s1 * g.s1 / g.n) / (g.n - 1.0)))), 9) AS p
      |  FROM orders CROSS JOIN g),
      |b AS (
      |  SELECT least(cast(floor(p * 10) as bigint), 9) AS bin, y, p FROM sc),
      |bins AS (
      |  SELECT bin, cast(count(*) as bigint) AS nk,
      |    cast(sum(cast(round(p, 9) as decimal(20,9))) as double) AS sp,
      |    cast(sum(y) as bigint) AS sy
      |  FROM b GROUP BY bin),
      |tot AS (
      |  SELECT cast(sum(nk) as bigint) AS n, cast(sum(sy) as bigint) AS ny
      |  FROM bins),
      |parts AS (
      |  SELECT
      |    cast(sum(cast(round(nk * (sp / nk - cast(sy as double) / nk)
      |      * (sp / nk - cast(sy as double) / nk), 9) as decimal(25,9)))
      |      as double) AS rel,
      |    cast(sum(cast(round(nk * (cast(sy as double) / nk
      |        - cast(t.ny as double) / t.n)
      |      * (cast(sy as double) / nk - cast(t.ny as double) / t.n), 9)
      |      as decimal(25,9))) as double) AS res,
      |    max(t.n) AS n, max(t.ny) AS ny
      |  FROM bins CROSS JOIN tot t),
      |brier AS (
      |  SELECT cast(sum(cast(round((p - y) * (p - y), 9) as decimal(20,9)))
      |    as double) AS sb
      |  FROM sc)
      |SELECT
      |  round(brier.sb / parts.n, 6) + 0.0 AS brier,
      |  round(parts.rel / parts.n, 6) + 0.0 AS reliability,
      |  round(parts.res / parts.n, 6) + 0.0 AS resolution,
      |  round((cast(parts.ny as double) / parts.n)
      |    * (1 - cast(parts.ny as double) / parts.n), 6) + 0.0 AS uncertainty
      |FROM parts CROSS JOIN brier""".stripMargin

  // q396 dedup-detector evaluation: precision/recall/F1 of the winnowing
  // shared-fingerprint pairs (predicted, shared >= 3) against a
  // prefix-duplication ground truth (same 40-char lowercased prefix —
  // the corpus has no full-text dups). The eval harness every dedup
  // pipeline needs before trusting its candidate generator.
  private def dedupEvalOracleSql: String =
    s"""WITH $winnowFpCtes,
       |bkt AS (
       |  SELECT fph FROM fp GROUP BY fph
       |  HAVING count(*) BETWEEN 2 AND 50),
       |pred AS (
       |  SELECT da, db FROM (
       |    SELECT a.doc_id AS da, b.doc_id AS db,
       |      cast(count(*) as bigint) AS shared
       |    FROM fp a JOIN bkt ON bkt.fph = a.fph
       |    JOIN fp b ON b.fph = a.fph AND b.doc_id > a.doc_id
       |    GROUP BY a.doc_id, b.doc_id) z
       |  WHERE shared >= 3),
       |pk AS (
       |  SELECT doc_id, substring(lower(text), 1, 40) AS k
       |  FROM documents WHERE text IS NOT NULL AND length(text) >= 40),
       |truth AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM pk a JOIN pk b ON b.k = a.k AND b.doc_id > a.doc_id),
       |tp AS (
       |  SELECT cast(count(*) as bigint) AS tp
       |  FROM pred JOIN truth ON truth.da = pred.da AND truth.db = pred.db),
       |c AS (
       |  SELECT (SELECT cast(count(*) as bigint) FROM pred) AS n_pred,
       |    (SELECT cast(count(*) as bigint) FROM truth) AS n_truth,
       |    tp.tp
       |  FROM tp)
       |SELECT n_pred, n_truth, tp,
       |  round(CASE WHEN n_pred > 0 THEN cast(tp as double) / n_pred
       |    ELSE 0 END, 6) + 0.0 AS precision,
       |  round(CASE WHEN n_truth > 0 THEN cast(tp as double) / n_truth
       |    ELSE 0 END, 6) + 0.0 AS recall,
       |  round(CASE WHEN tp > 0 THEN
       |    2 * (cast(tp as double) / n_pred) * (cast(tp as double) / n_truth)
       |      / (cast(tp as double) / n_pred + cast(tp as double) / n_truth)
       |    ELSE 0 END, 6) + 0.0 AS f1
       |FROM c""".stripMargin

  // q398 stratified ATE (standardization): treatment = user parity,
  // strata = activity quintiles (deterministic ntile), effect = the
  // stratum-size-weighted difference of within-stratum outcome means —
  // the simplest confounder-adjusted estimate, next to q392's CUPED.
  private val stratifiedAteSql =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS t,
      |    cast(count(*) as bigint) AS activity,
      |    cast(sum(cast(round(cast(value as double), 6) as decimal(25,6)))
      |      as double) / count(value) AS y
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |s AS (
      |  SELECT t, y, ntile(5) OVER (ORDER BY activity, user_id) AS h
      |  FROM u),
      |g AS (
      |  SELECT h, t, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(y, 6) as decimal(25,6))) as double) AS sy
      |  FROM s GROUP BY h, t),
      |hh AS (
      |  SELECT h,
      |    max(CASE WHEN t = 1 THEN sy / n END)
      |      - max(CASE WHEN t = 0 THEN sy / n END) AS diff,
      |    cast(sum(n) as bigint) AS nh
      |  FROM g GROUP BY h),
      |tot AS (SELECT cast(sum(nh) as bigint) AS n FROM hh)
      |SELECT cast(hh.h as int) AS stratum, hh.nh,
      |  round(hh.diff, 6) + 0.0 AS stratum_effect,
      |  round(cast(sum(cast(round(hh.diff * hh.nh, 6) as decimal(25,6)))
      |    OVER () as double) / tot.n, 6) + 0.0 AS ate
      |FROM hh CROSS JOIN tot ORDER BY stratum""".stripMargin

  // q399 McNemar's test comparing two deterministic F-status
  // "classifiers" (price rule vs priority rule) on paired predictions:
  // the discordant counts b/c and the (b-c)^2/(b+c) statistic — the
  // correct paired comparison where two independent accuracies mislead.
  private val mcnemarSql =
    """WITH p AS (
      |  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |    CASE WHEN o_totalprice < 150000 THEN 1 ELSE 0 END AS ma,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS mb
      |  FROM orders),
      |c AS (
      |  SELECT
      |    cast(sum(CASE WHEN ma = y AND mb <> y THEN 1 ELSE 0 END) as bigint) AS b,
      |    cast(sum(CASE WHEN ma <> y AND mb = y THEN 1 ELSE 0 END) as bigint) AS c,
      |    cast(sum(CASE WHEN ma = y THEN 1 ELSE 0 END) as bigint) AS a_right,
      |    cast(sum(CASE WHEN mb = y THEN 1 ELSE 0 END) as bigint) AS b_right,
      |    cast(count(*) as bigint) AS n
      |  FROM p)
      |SELECT n, a_right, b_right, b, c,
      |  round((cast(b as double) - c) * (cast(b as double) - c)
      |    / (b + c), 6) + 0.0 AS mcnemar_chi2
      |FROM c""".stripMargin

  // q400 partial correlation r_xy.z of (chars, words | 'a'-count —
  // the corpus's punctuation counts are constant, which would zero a
  // variance):
  // three Pearson coefficients from ONE decimal-folded scan, combined by
  // the closed form — the "is the association direct or mediated" check.
  private val partialCorrSql =
    """WITH f AS (
      |  SELECT cast(n_chars as double) AS x,
      |    cast(length(text) - length(replace(text, ' ', '')) as double) AS y,
      |    cast(length(text) - length(replace(text, 'a', '')) as double) AS z
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |st AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
      |    cast(sum(cast(round(y, 2) as decimal(25,2))) as double) AS sy,
      |    cast(sum(cast(round(z, 2) as decimal(25,2))) as double) AS sz,
      |    cast(sum(cast(round(x * y, 2) as decimal(28,2))) as double) AS sxy,
      |    cast(sum(cast(round(x * z, 2) as decimal(28,2))) as double) AS sxz,
      |    cast(sum(cast(round(y * z, 2) as decimal(28,2))) as double) AS syz,
      |    cast(sum(cast(round(x * x, 2) as decimal(28,2))) as double) AS sxx,
      |    cast(sum(cast(round(y * y, 2) as decimal(28,2))) as double) AS syy,
      |    cast(sum(cast(round(z * z, 2) as decimal(28,2))) as double) AS szz
      |  FROM f),
      |r AS (
      |  SELECT n,
      |    (n * sxy - sx * sy)
      |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
      |    (n * sxz - sx * sz)
      |      / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
      |    (n * syz - sy * sz)
      |      / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz
      |  FROM st)
      |SELECT n, round(rxy, 6) + 0.0 AS r_xy,
      |  round(rxz, 6) + 0.0 AS r_xz, round(ryz, 6) + 0.0 AS r_yz,
      |  round((rxy - rxz * ryz)
      |    / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6) + 0.0 AS r_xy_given_z
      |FROM r""".stripMargin

  // q401 Cook's distance for the daily-count OLS: closed-form leverage
  // h_i = 1/n + (x-xbar)^2/Sxx (simple regression), D_i =
  // e^2 h / (2 MSE (1-h)^2), top-5 influential days — the regression
  // diagnostic behind q361's robust refit.
  private def cooksDistanceSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT cast(${dayNum("ts")} as double) AS x, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |st AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(x, 4) as decimal(25,4))) as double) AS sx,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) as double) AS sy,
       |    cast(sum(cast(round(x * y, 4) as decimal(25,4))) as double) AS sxy,
       |    cast(sum(cast(round(x * x, 4) as decimal(25,4))) as double) AS sxx
       |  FROM daily),
       |f AS (
       |  SELECT n, sx / n AS xb,
       |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
       |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a,
       |    (n * sxx - sx * sx) / n AS ssx
       |  FROM st),
       |r AS (
       |  SELECT d.x, round(d.y - (f.a + f.b * d.x), 9) AS e,
       |    cast(1.0 as double) / f.n
       |      + (d.x - f.xb) * (d.x - f.xb) / f.ssx AS h,
       |    f.n
       |  FROM daily d CROSS JOIN f),
       |mse AS (
       |  SELECT cast(sum(cast(round(e * e, 6) as decimal(25,6))) as double)
       |    / (max(n) - 2.0) AS mse
       |  FROM r)
       |SELECT cast(r.x as bigint) AS day, round(r.e, 4) + 0.0 AS residual,
       |  round(r.h, 6) + 0.0 AS leverage,
       |  round(r.e * r.e * r.h / (2 * m.mse * (1 - r.h) * (1 - r.h)), 6)
       |    + 0.0 AS cooks_d
       |FROM r CROSS JOIN mse m
       |ORDER BY round(r.e * r.e * r.h / (2 * m.mse * (1 - r.h) * (1 - r.h)), 6)
       |  DESC, day
       |LIMIT 5""".stripMargin

  // q402 Herfindahl-Hirschman concentration: customer-spend shares
  // within each nation, HHI = sum(share^2) per nation + the
  // equivalent-competitor count 1/HHI — the market-structure audit.
  private val hhiSql =
    """WITH sp AS (
      |  SELECT c.c_nationkey AS nat, o.o_custkey AS k,
      |    cast(sum(cast(o.o_totalprice as decimal(20,2))) as double) AS x
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_nationkey, o.o_custkey),
      |t AS (
      |  SELECT nat, cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS tot,
      |    cast(count(*) as bigint) AS n_firms
      |  FROM sp GROUP BY nat),
      |h AS (
      |  SELECT sp.nat, t.n_firms,
      |    cast(sum(cast(round((sp.x / t.tot) * (sp.x / t.tot), 9)
      |      as decimal(20,9))) as double) AS hhi
      |  FROM sp JOIN t ON t.nat = sp.nat
      |  GROUP BY sp.nat, t.n_firms)
      |SELECT cast(nat as bigint) AS nat, n_firms,
      |  round(hhi, 6) + 0.0 AS hhi,
      |  round(cast(1.0 as double) / hhi, 2) + 0.0 AS effective_firms
      |FROM h ORDER BY nat""".stripMargin

  // q403 Wald-Wolfowitz runs test on the daily up/down move sequence:
  // runs counted by one lag() window, expectation/variance closed-form
  // from the plus/minus counts — the nonparametric randomness check on
  // the series q293/q328 model.
  private def runsTestSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1),
       |mv AS (
       |  SELECT d, y - lag(y) OVER (ORDER BY d) AS diff
       |  FROM daily),
       |sgn AS (
       |  SELECT d, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
       |  FROM mv WHERE diff IS NOT NULL AND diff <> 0),
       |runs AS (
       |  SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
       |      OR lag(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS new_run
       |  FROM sgn),
       |c AS (
       |  SELECT cast(sum(new_run) as bigint) AS r,
       |    cast(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) as bigint) AS n1,
       |    cast(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) as bigint) AS n2
       |  FROM runs)
       |SELECT r AS runs, n1, n2,
       |  round(1 + cast(2.0 as double) * n1 * n2 / (n1 + n2), 6) + 0.0
       |    AS expected_runs,
       |  round((r - (1 + cast(2.0 as double) * n1 * n2 / (n1 + n2)))
       |    / sqrt(cast(2.0 as double) * n1 * n2
       |        * (cast(2.0 as double) * n1 * n2 - n1 - n2)
       |      / (cast(n1 + n2 as double) * (n1 + n2) * (n1 + n2 - 1.0))), 6)
       |    + 0.0 AS z
       |FROM c""".stripMargin

  // q404 Gumbel extreme-value fit on weekly block maxima of the daily
  // count series: method-of-moments parameters (beta = s*sqrt(6)/pi,
  // mu = mean - gamma*beta, constants pinned), plus the 10-block return
  // level mu - beta*ln(-ln(1 - 1/10)) — the capacity-planning tail
  // estimate.
  private def gumbelSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |wk AS (
       |  SELECT cast(floor(d / 7.0) as bigint) AS w, max(y) AS mx
       |  FROM daily GROUP BY 1),
       |st AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(mx, 4) as decimal(25,4))) as double) AS s1,
       |    cast(sum(cast(round(mx * mx, 4) as decimal(25,4))) as double) AS s2
       |  FROM wk),
       |p AS (
       |  SELECT n, s1 / n AS m,
       |    sqrt((s2 - s1 * s1 / n) / (n - 1.0))
       |      * sqrt(cast(6.0 as double)) / cast(3.14159265358979 as double) AS beta
       |  FROM st)
       |SELECT n AS n_blocks,
       |  round(m - cast(0.5772156649 as double) * beta, 6) + 0.0 AS mu,
       |  round(beta, 6) + 0.0 AS beta,
       |  round(m - cast(0.5772156649 as double) * beta
       |    - beta * ln(-ln(1 - cast(1.0 as double) / 10)), 6) + 0.0
       |    AS return_level_10
       |FROM p""".stripMargin

  // q405 newsvendor service-level quantity: critical fractile
  // cu/(cu+co), order quantity = that exact rank quantile of daily
  // demand — the inventory-planning quantile read straight off the
  // demand distribution.
  private def newsvendorSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1),
       |rk AS (
       |  SELECT y, row_number() OVER (ORDER BY y, d) AS r,
       |    count(*) OVER () AS n
       |  FROM daily),
       |frac AS (
       |  SELECT cast(9.0 as double) / (cast(9.0 as double) + cast(3.0 as double))
       |    AS cf)
       |SELECT frac.cf AS critical_fractile,
       |  cast(min(CASE WHEN r >= ceil(frac.cf * n) THEN y END) as bigint)
       |    AS order_quantity,
       |  cast(max(n) as bigint) AS n_days
       |FROM rk CROSS JOIN frac
       |GROUP BY frac.cf""".stripMargin

  // q406 ABC (Pareto) classification of parts by revenue: cumulative
  // revenue share over the deterministic (revenue desc, key) order,
  // A < 0.8 <= B < 0.95 <= C, class rollup.
  private val abcSql =
    """WITH rev AS (
      |  SELECT l_partkey AS p,
      |    cast(sum(cast(l_extendedprice as decimal(20,2))) as double) AS r
      |  FROM lineitem GROUP BY l_partkey),
      |rk AS (
      |  SELECT p, r,
      |    cast(sum(cast(round(r, 2) as decimal(25,2)))
      |      OVER (ORDER BY r DESC, p) as double) AS cum,
      |    cast(sum(cast(round(r, 2) as decimal(25,2))) OVER () as double) AS tot
      |  FROM rev),
      |cls AS (
      |  SELECT p, r,
      |    CASE WHEN cum / tot < cast(0.8 as double) THEN 'A'
      |      WHEN cum / tot < cast(0.95 as double) THEN 'B'
      |      ELSE 'C' END AS abc
      |  FROM rk)
      |SELECT abc, cast(count(*) as bigint) AS n_parts,
      |  round(cast(sum(cast(round(r, 2) as decimal(25,2))) as double), 2) + 0.0
      |    AS revenue
      |FROM cls GROUP BY abc ORDER BY abc""".stripMargin

  // q407 1-D earth mover's distance between the click and view value
  // distributions: EMD = integral |CDF_a - CDF_b| = sum over sorted
  // support gaps of |cumulative-count difference| x gap / (na*nb-scaled)
  // — the mass-transport metric where q343's KS takes the max.
  private val emdSql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |n AS (
      |  SELECT cast(sum(g) as bigint) AS na,
      |    cast(sum(1 - g) as bigint) AS nb
      |  FROM base),
      |cum AS (
      |  SELECT v,
      |    sum(g) OVER (ORDER BY v) AS ca,
      |    sum(1 - g) OVER (ORDER BY v) AS cb,
      |    lead(v) OVER (ORDER BY v) AS nxt
      |  FROM (SELECT DISTINCT v, g FROM base) z),
      |gaps AS (
      |  SELECT v, nxt,
      |    abs(cast(ca as double) / n.na - cast(cb as double) / n.nb) AS gap_h
      |  FROM cum CROSS JOIN n WHERE nxt IS NOT NULL)
      |SELECT cast(count(*) as bigint) AS support_points,
      |  round(cast(sum(cast(round(gap_h * (nxt - v), 9) as decimal(25,9)))
      |    as double), 6) + 0.0 AS emd
      |FROM gaps""".stripMargin

  // q408 Kendall's tau-b between daily click and view counts: exact
  // concordant/discordant/tie counts from the C(days,2) pair join
  // (metadata-sized after the daily reduction), the tie-corrected
  // denominator — completing the rank-correlation family next to
  // q332's Spearman.
  private def kendallSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d,
       |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS x,
       |    cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS y
       |  FROM events GROUP BY 1),
       |pairs AS (
       |  SELECT
       |    cast(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END)
       |      as bigint) AS con,
       |    cast(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END)
       |      as bigint) AS dis,
       |    cast(sum(CASE WHEN b.x = a.x AND b.y <> a.y THEN 1 ELSE 0 END)
       |      as bigint) AS tx,
       |    cast(sum(CASE WHEN b.y = a.y AND b.x <> a.x THEN 1 ELSE 0 END)
       |      as bigint) AS ty,
       |    cast(count(*) as bigint) AS np
       |  FROM daily a JOIN daily b ON b.d > a.d)
       |SELECT con, dis, tx, ty,
       |  round((cast(con as double) - dis)
       |    / sqrt((cast(con + dis + tx as double)) * (con + dis + ty)), 6)
       |    + 0.0 AS tau_b
       |FROM pairs""".stripMargin

  // q409 log-log price elasticity across parts: per-part quantity-
  // weighted unit price and total quantity, elasticity = the OLS slope
  // of ln q on ln p (decimal-folded log moments), with R^2.
  private val elasticitySql =
    """WITH pp AS (
      |  SELECT l_partkey AS p,
      |    cast(sum(cast(round(cast(l_extendedprice as double), 2)
      |      as decimal(25,2))) as double)
      |      / cast(sum(cast(round(cast(l_quantity as double), 2)
      |        as decimal(25,2))) as double) AS price,
      |    cast(sum(cast(round(cast(l_quantity as double), 2)
      |      as decimal(25,2))) as double) AS qty
      |  FROM lineitem GROUP BY l_partkey),
      |lg AS (
      |  SELECT round(ln(price), 9) AS x, round(ln(qty), 9) AS y
      |  FROM pp WHERE price > 0 AND qty > 0),
      |st AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 9) as decimal(20,9))) as double) AS sx,
      |    cast(sum(cast(round(y, 9) as decimal(20,9))) as double) AS sy,
      |    cast(sum(cast(round(x * y, 9) as decimal(20,9))) as double) AS sxy,
      |    cast(sum(cast(round(x * x, 9) as decimal(20,9))) as double) AS sxx,
      |    cast(sum(cast(round(y * y, 9) as decimal(20,9))) as double) AS syy
      |  FROM lg)
      |SELECT n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS elasticity,
      |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
      |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS r2
      |FROM st""".stripMargin

  // q410 discrete-time churn hazard by relative order quarter: at-risk =
  // customers whose LAST order is at or after the quarter, churned =
  // last order IN the quarter (the final observed quarter is censored
  // and excluded) — the life-table companion to q287's Kaplan-Meier.
  // (The events stream is too dense for user-level churn — every user is
  // active in the final week; the multi-year orders table carries the
  // real lifetime signal.) `qNum` is the engine spelling of the integer
  // 90-day-quarter number of o_orderdate.
  private def churnHazardSql(qNum: String => String): String =
    s"""WITH lifeq AS (
       |  SELECT o_custkey, max(${qNum("o_orderdate")}) AS lq
       |  FROM orders GROUP BY o_custkey),
       |b AS (SELECT min(lq) AS q0, max(lq) AS qmax FROM lifeq),
       |lastq AS (
       |  SELECT o_custkey, lifeq.lq - b.q0 AS lw, b.qmax - b.q0 AS wlast
       |  FROM lifeq CROSS JOIN b),
       |wk AS (
       |  SELECT DISTINCT lw AS w FROM lastq WHERE lw < wlast),
       |haz AS (
       |  SELECT wk.w,
       |    (SELECT cast(count(*) as bigint) FROM lastq WHERE lastq.lw >= wk.w)
       |      AS at_risk,
       |    (SELECT cast(count(*) as bigint) FROM lastq WHERE lastq.lw = wk.w)
       |      AS churned
       |  FROM wk)
       |SELECT cast(w as bigint) AS quarter, at_risk, churned,
       |  round(cast(churned as double) / at_risk, 6) + 0.0 AS hazard
       |FROM haz ORDER BY quarter""".stripMargin

  // q411 empirical-Bayes (beta-binomial) shrinkage of per-user CTR:
  // method-of-moments alpha/beta from the raw-rate distribution (users
  // with >= 5 exposures), shrunken rate = (clicks + a)/(n + a + b); the
  // summary reports the prior and the shrinkage it buys.
  private val ebShrinkageSql =
    """WITH u AS (
      |  SELECT user_id,
      |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint)
      |      AS c,
      |    cast(sum(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
      |      as bigint) AS n
      |  FROM events GROUP BY user_id),
      |r AS (
      |  SELECT user_id, c, n, cast(c as double) / n AS rate
      |  FROM u WHERE n >= 5),
      |m AS (
      |  SELECT cast(count(*) as bigint) AS k,
      |    cast(sum(cast(round(rate, 9) as decimal(20,9))) as double) AS s1,
      |    cast(sum(cast(round(rate * rate, 9) as decimal(20,9))) as double) AS s2
      |  FROM r),
      |ab AS (
      |  SELECT k, s1 / k AS mu,
      |    (s1 / k) * ((s1 / k) * (1 - s1 / k)
      |      / ((s2 - s1 * s1 / k) / (k - 1.0)) - 1) AS alpha,
      |    (1 - s1 / k) * ((s1 / k) * (1 - s1 / k)
      |      / ((s2 - s1 * s1 / k) / (k - 1.0)) - 1) AS beta
      |  FROM m),
      |sh AS (
      |  SELECT r.user_id, r.rate,
      |    (r.c + ab.alpha) / (r.n + ab.alpha + ab.beta) AS shrunk
      |  FROM r CROSS JOIN ab)
      |SELECT ab.k AS n_users,
      |  round(ab.mu, 6) + 0.0 AS mean_rate,
      |  round(ab.alpha, 6) + 0.0 AS alpha,
      |  round(ab.beta, 6) + 0.0 AS beta,
      |  round(cast((SELECT sum(cast(round(abs(rate - shrunk), 9)
      |      as decimal(20,9))) FROM sh) as double) / ab.k, 6) + 0.0
      |    AS mean_abs_shrinkage
      |FROM ab""".stripMargin

  // q412 fairness audit of the price classifier across market segments:
  // per-group positive rate / TPR / FPR (exact integer ratios), plus the
  // demographic-parity ratio (min/max positive rate) and the largest
  // equalized-odds gap — the pre-deployment disparity report.
  private val fairnessAuditSql =
    """WITH j AS (
      |  SELECT c.c_mktsegment AS grp,
      |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |    CASE WHEN o.o_totalprice < 150000 THEN 1 ELSE 0 END AS pred
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |g AS (
      |  SELECT grp,
      |    cast(count(*) as bigint) AS n,
      |    cast(sum(pred) as bigint) AS npos,
      |    cast(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) as bigint) AS tp,
      |    cast(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) as bigint) AS np1,
      |    cast(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) as bigint) AS fp,
      |    cast(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) as bigint) AS np0
      |  FROM j GROUP BY grp),
      |rates AS (
      |  SELECT grp, n,
      |    cast(npos as double) / n AS pos_rate,
      |    cast(tp as double) / np1 AS tpr,
      |    cast(fp as double) / np0 AS fpr
      |  FROM g)
      |SELECT grp, n,
      |  round(pos_rate, 6) + 0.0 AS pos_rate,
      |  round(tpr, 6) + 0.0 AS tpr,
      |  round(fpr, 6) + 0.0 AS fpr,
      |  round(min(pos_rate) OVER () / max(pos_rate) OVER (), 6) + 0.0
      |    AS dp_ratio,
      |  round(greatest(max(tpr) OVER () - min(tpr) OVER (),
      |    max(fpr) OVER () - min(fpr) OVER ()), 6) + 0.0 AS eo_gap
      |FROM rates ORDER BY grp""".stripMargin

  // q413 Hill tail-index estimator over the top-k order totals:
  // hill = mean ln(x_(i)/x_(k+1)) over the k largest values (exact rank
  // pick, deterministic ties), with the implied Pareto alpha = 1/hill —
  // the heavy-tail diagnostic behind q395's power-law fit.
  private val hillTailSql =
    """WITH rk AS (
      |  SELECT cast(o_totalprice as double) AS x,
      |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS r
      |  FROM orders),
      |k AS (SELECT cast(200 as bigint) AS k),
      |thr AS (
      |  SELECT rk.x AS xk FROM rk CROSS JOIN k WHERE rk.r = k.k + 1),
      |top AS (
      |  SELECT round(ln(rk.x / thr.xk), 9) AS lr
      |  FROM rk CROSS JOIN k CROSS JOIN thr WHERE rk.r <= k.k)
      |SELECT max(k.k) AS k,
      |  round(cast(sum(cast(lr as decimal(20,9))) as double) / max(k.k), 6)
      |    + 0.0 AS hill,
      |  round(max(k.k) / cast(sum(cast(lr as decimal(20,9))) as double), 6)
      |    + 0.0 AS alpha
      |FROM top CROSS JOIN k""".stripMargin

  // q414 two-proportion z-test on per-user conversion (a high-value
  // purchase — every user makes SOME purchase in this dense stream, so
  // the plain definition degenerates to p=1) between assignment arms:
  // pooled-variance z, integer counts until the final scalar algebra.
  private val twoProportionSql =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS arm,
      |    max(CASE WHEN event_type = 'purchase' AND value > 150
      |      THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT arm, cast(count(*) as bigint) AS n,
      |    cast(sum(conv) as bigint) AS c
      |  FROM u GROUP BY arm),
      |p AS (
      |  SELECT
      |    max(CASE WHEN arm = 0 THEN n END) AS n0,
      |    max(CASE WHEN arm = 1 THEN n END) AS n1,
      |    max(CASE WHEN arm = 0 THEN c END) AS c0,
      |    max(CASE WHEN arm = 1 THEN c END) AS c1
      |  FROM g)
      |SELECT n0, n1, c0, c1,
      |  round(cast(c1 as double) / n1 - cast(c0 as double) / n0, 6) + 0.0
      |    AS rate_diff,
      |  round((cast(c1 as double) / n1 - cast(c0 as double) / n0)
      |    / sqrt((cast(c0 + c1 as double) / (n0 + n1))
      |      * (1 - cast(c0 + c1 as double) / (n0 + n1))
      |      * (cast(1.0 as double) / n0 + cast(1.0 as double) / n1)), 6) + 0.0
      |    AS z
      |FROM p""".stripMargin

  // q415 Jarque-Bera normality test on event values: skewness and
  // excess kurtosis from the first four decimal-folded central moments,
  // JB = n/6 (S^2 + K^2/4) — the moment-based normality gate.
  private val jarqueBeraSql =
    """WITH v AS (
      |  SELECT cast(value as double) AS x FROM events WHERE value IS NOT NULL),
      |m1 AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 6) as decimal(30,6))) as double) AS s1
      |  FROM v),
      |c AS (
      |  SELECT m1.n,
      |    cast(sum(cast(round((x - m1.s1 / m1.n) * (x - m1.s1 / m1.n), 6)
      |      as decimal(30,6))) as double) AS m2,
      |    cast(sum(cast(round((x - m1.s1 / m1.n) * (x - m1.s1 / m1.n)
      |      * (x - m1.s1 / m1.n), 3) as decimal(30,3))) as double) AS m3,
      |    cast(sum(cast(round((x - m1.s1 / m1.n) * (x - m1.s1 / m1.n)
      |      * (x - m1.s1 / m1.n) * (x - m1.s1 / m1.n), 0) as decimal(38,0)))
      |      as double) AS m4
      |  FROM v CROSS JOIN m1 GROUP BY m1.n),
      |sk AS (
      |  SELECT n,
      |    (m3 / n) / power(m2 / n, cast(1.5 as double)) AS s,
      |    (m4 / n) / ((m2 / n) * (m2 / n)) - 3 AS k
      |  FROM c)
      |SELECT n, round(s, 6) + 0.0 AS skewness,
      |  round(k, 6) + 0.0 AS excess_kurtosis,
      |  round(n / cast(6.0 as double) * (s * s + k * k / 4), 4) + 0.0 AS jb
      |FROM sk""".stripMargin

  // q416 Durbin-Watson autocorrelation test on the daily-count OLS
  // residuals: DW = sum (e_t - e_{t-1})^2 / sum e^2 via one lag window —
  // the serial-correlation check that decides whether q358's rolling
  // fits can be trusted pointwise.
  private def durbinWatsonSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT cast(${dayNum("ts")} as double) AS x, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |st AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(x, 4) as decimal(25,4))) as double) AS sx,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) as double) AS sy,
       |    cast(sum(cast(round(x * y, 4) as decimal(25,4))) as double) AS sxy,
       |    cast(sum(cast(round(x * x, 4) as decimal(25,4))) as double) AS sxx
       |  FROM daily),
       |f AS (
       |  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
       |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
       |  FROM st),
       |r AS (
       |  SELECT d.x, round(d.y - (f.a + f.b * d.x), 9) AS e
       |  FROM daily d CROSS JOIN f),
       |lagd AS (
       |  SELECT e, e - lag(e) OVER (ORDER BY x) AS de FROM r)
       |SELECT
       |  round(cast(sum(cast(round(de * de, 9) as decimal(25,9))) as double)
       |    / cast(sum(cast(round(e * e, 9) as decimal(25,9))) as double), 6)
       |    + 0.0 AS durbin_watson
       |FROM lagd""".stripMargin

  // q417 two-predictor OLS by the correlation closed form (y = chars,
  // x1 = words, x2 = 'a'-count): standardized betas from the three
  // Pearson r (one folded scan — the q400 moments), R^2 and the
  // predictor VIF = 1/(1 - r12^2).
  private val multiOls2Sql =
    """WITH f AS (
      |  SELECT cast(n_chars as double) AS y,
      |    cast(length(text) - length(replace(text, ' ', '')) as double) AS x1,
      |    cast(length(text) - length(replace(text, 'a', '')) as double) AS x2
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |st AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(y, 2) as decimal(25,2))) as double) AS sy,
      |    cast(sum(cast(round(x1, 2) as decimal(25,2))) as double) AS s1,
      |    cast(sum(cast(round(x2, 2) as decimal(25,2))) as double) AS s2,
      |    cast(sum(cast(round(y * x1, 2) as decimal(28,2))) as double) AS sy1,
      |    cast(sum(cast(round(y * x2, 2) as decimal(28,2))) as double) AS sy2,
      |    cast(sum(cast(round(x1 * x2, 2) as decimal(28,2))) as double) AS s12,
      |    cast(sum(cast(round(y * y, 2) as decimal(28,2))) as double) AS syy,
      |    cast(sum(cast(round(x1 * x1, 2) as decimal(28,2))) as double) AS s11,
      |    cast(sum(cast(round(x2 * x2, 2) as decimal(28,2))) as double) AS s22
      |  FROM f),
      |r AS (
      |  SELECT n,
      |    (n * sy1 - sy * s1)
      |      / sqrt((n * syy - sy * sy) * (n * s11 - s1 * s1)) AS ry1,
      |    (n * sy2 - sy * s2)
      |      / sqrt((n * syy - sy * sy) * (n * s22 - s2 * s2)) AS ry2,
      |    (n * s12 - s1 * s2)
      |      / sqrt((n * s11 - s1 * s1) * (n * s22 - s2 * s2)) AS r12
      |  FROM st)
      |SELECT n,
      |  round((ry1 - ry2 * r12) / (1 - r12 * r12), 6) + 0.0 AS beta1_std,
      |  round((ry2 - ry1 * r12) / (1 - r12 * r12), 6) + 0.0 AS beta2_std,
      |  round((ry1 * ry1 + ry2 * ry2 - 2 * ry1 * ry2 * r12)
      |    / (1 - r12 * r12), 6) + 0.0 AS r2,
      |  round(cast(1.0 as double) / (1 - r12 * r12), 6) + 0.0 AS vif
      |FROM r""".stripMargin

  // q418 recommender holdout evaluation: leave-LAST-order-out per
  // customer, score candidates by co-occurrence counts learned from
  // TRAIN orders only (no leakage), top-10 per customer (deterministic
  // rank), hit-rate against the held-out basket — the offline eval
  // behind the q349 item-item recommender.
  private val recHoldoutSql =
    """WITH b AS (
      |  SELECT DISTINCT o.o_orderkey AS ok, o.o_custkey AS c,
      |    l.l_partkey % 200 AS p, o.o_orderdate AS dt
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |lastord AS (
      |  SELECT ok, c FROM (
      |    SELECT ok, c, row_number() OVER (PARTITION BY c
      |      ORDER BY dt DESC, ok DESC) AS rk
      |    FROM (SELECT DISTINCT ok, c, dt FROM b) z) w
      |  WHERE rk = 1),
      |train AS (
      |  SELECT b.c, b.ok, b.p FROM b
      |  LEFT JOIN lastord lo ON lo.ok = b.ok
      |  WHERE lo.ok IS NULL),
      |test AS (
      |  SELECT b.c, b.p FROM b JOIN lastord lo ON lo.ok = b.ok),
      |pairs AS (
      |  SELECT a.p AS pa, b2.p AS pb, cast(count(*) as bigint) AS w
      |  FROM train a JOIN train b2 ON b2.ok = a.ok AND b2.p <> a.p
      |  GROUP BY a.p, b2.p),
      |ti AS (SELECT DISTINCT c, p FROM train),
      |score AS (
      |  SELECT ti.c, pr.pb AS cand, cast(sum(pr.w) as bigint) AS s
      |  FROM ti JOIN pairs pr ON pr.pa = ti.p
      |  LEFT JOIN ti own ON own.c = ti.c AND own.p = pr.pb
      |  WHERE own.p IS NULL
      |  GROUP BY ti.c, pr.pb),
      |top AS (
      |  SELECT c, cand FROM (
      |    SELECT c, cand, row_number() OVER (PARTITION BY c
      |      ORDER BY s DESC, cand) AS rk
      |    FROM score) z WHERE rk <= 10),
      |eval AS (
      |  SELECT t.c,
      |    max(CASE WHEN tp.cand IS NOT NULL THEN 1 ELSE 0 END) AS hit
      |  FROM test t
      |  LEFT JOIN top tp ON tp.c = t.c AND tp.cand = t.p
      |  WHERE t.c IN (SELECT DISTINCT c FROM train)
      |  GROUP BY t.c)
      |SELECT cast(count(*) as bigint) AS n_customers,
      |  cast(sum(hit) as bigint) AS hits,
      |  round(cast(sum(hit) as double) / count(*), 6) + 0.0 AS hit_rate_at_10
      |FROM eval""".stripMargin

  // q419 COPOD-flavored ECDF outlier score over three document
  // features: per-dimension two-sided tail probability from the
  // peer-inclusive empirical CDF (pure ranks — deterministic, no
  // distributional fit), score = -sum of log tails, top-10 outliers.
  private val copodSql =
    """WITH f AS (
      |  SELECT doc_id, cast(n_chars as double) AS x1,
      |    cast(length(text) - length(replace(text, ' ', '')) as double) AS x2,
      |    cast(length(text) - length(replace(text, 'a', '')) as double) AS x3
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |n AS (SELECT cast(count(*) as bigint) AS n FROM f),
      |cdf AS (
      |  SELECT doc_id,
      |    cast(count(*) OVER (ORDER BY x1) as double) / n.n AS f1,
      |    cast(count(*) OVER (ORDER BY x2) as double) / n.n AS f2,
      |    cast(count(*) OVER (ORDER BY x3) as double) / n.n AS f3,
      |    n.n
      |  FROM f CROSS JOIN n),
      |sc AS (
      |  SELECT doc_id,
      |    round(-(ln(greatest(least(f1, 1 - f1), cast(1.0 as double) / n))
      |      + ln(greatest(least(f2, 1 - f2), cast(1.0 as double) / n))
      |      + ln(greatest(least(f3, 1 - f3), cast(1.0 as double) / n))), 6)
      |      AS score
      |  FROM cdf)
      |SELECT doc_id, score + 0.0 AS copod_score
      |FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  // q420 Simpson's-paradox detector: pooled Pearson of (quantity, unit
  // price) vs the within-returnflag coefficients — a sign flip between
  // the pooled and every stratum is the aggregation trap worth an
  // automated alarm.
  private val simpsonFlipSql =
    """WITH f AS (
      |  SELECT l_returnflag AS g, cast(l_quantity as double) AS x,
      |    cast(l_extendedprice as double) / l_quantity AS y
      |  FROM lineitem WHERE l_quantity > 0),
      |st AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
      |    cast(sum(cast(round(y, 2) as decimal(25,2))) as double) AS sy,
      |    cast(sum(cast(round(x * y, 2) as decimal(28,2))) as double) AS sxy,
      |    cast(sum(cast(round(x * x, 2) as decimal(28,2))) as double) AS sxx,
      |    cast(sum(cast(round(y * y, 2) as decimal(28,2))) as double) AS syy
      |  FROM f GROUP BY g),
      |tot AS (
      |  SELECT cast(sum(n) as bigint) AS n,
      |    cast(sum(cast(round(sx, 2) as decimal(28,2))) as double) AS sx,
      |    cast(sum(cast(round(sy, 2) as decimal(28,2))) as double) AS sy,
      |    cast(sum(cast(round(sxy, 2) as decimal(28,2))) as double) AS sxy,
      |    cast(sum(cast(round(sxx, 2) as decimal(28,2))) as double) AS sxx,
      |    cast(sum(cast(round(syy, 2) as decimal(28,2))) as double) AS syy
      |  FROM st),
      |rg AS (
      |  SELECT g, n,
      |    (n * sxy - sx * sy)
      |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r
      |  FROM st),
      |rp AS (
      |  SELECT (n * sxy - sx * sy)
      |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r
      |  FROM tot)
      |SELECT rg.g, rg.n,
      |  round(rg.r, 6) + 0.0 AS group_r,
      |  round(rp.r, 6) + 0.0 AS pooled_r,
      |  CASE WHEN (rg.r > 0) <> (rp.r > 0) THEN 1 ELSE 0 END AS sign_flip
      |FROM rg CROSS JOIN rp ORDER BY rg.g""".stripMargin

  // q421 ROUGE-1 (multiset-clipped unigram precision/recall/F1) between
  // the prefix-duplication document pairs (the q396 ground truth): per-
  // doc token counts join on word, clipped overlap = sum least(c1, c2).
  // `tokCte` yields (doc_id, word).
  private def rougeSql(tokCte: String): String =
    s"""WITH tok AS ($tokCte),
       |tc AS (SELECT doc_id, word, cast(count(*) as bigint) AS c
       |  FROM tok GROUP BY doc_id, word),
       |tl AS (SELECT doc_id, cast(sum(c) as bigint) AS len FROM tc
       |  GROUP BY doc_id),
       |pk AS (
       |  SELECT doc_id, substring(lower(text), 1, 40) AS k
       |  FROM documents WHERE text IS NOT NULL AND length(text) >= 40),
       |pairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM pk a JOIN pk b ON b.k = a.k AND b.doc_id > a.doc_id),
       |ov AS (
       |  SELECT p.da, p.db, cast(sum(least(ca.c, cb.c)) as bigint) AS clip
       |  FROM pairs p
       |  JOIN tc ca ON ca.doc_id = p.da
       |  JOIN tc cb ON cb.doc_id = p.db AND cb.word = ca.word
       |  GROUP BY p.da, p.db)
       |SELECT ov.da, ov.db, ov.clip,
       |  round(cast(ov.clip as double) / lb.len, 6) + 0.0 AS rouge1_p,
       |  round(cast(ov.clip as double) / la.len, 6) + 0.0 AS rouge1_r,
       |  round(cast(2.0 as double) * ov.clip / (la.len + lb.len), 6) + 0.0
       |    AS rouge1_f
       |FROM ov
       |JOIN tl la ON la.doc_id = ov.da
       |JOIN tl lb ON lb.doc_id = ov.db
       |ORDER BY ov.da, ov.db""".stripMargin

  // q422 BLEU (1+2-gram, multiset-clipped, brevity penalty) between the
  // prefix-duplication pairs — the precision-side counterpart of q421's
  // ROUGE. Bigrams come from the positional tokenizer (pos, word) by an
  // adjacent self-join; clipped counts per n-gram order, geometric mean,
  // BP = exp(1 - ref/cand) when cand is shorter.
  private def bleuSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |uni AS (SELECT doc_id, word, cast(count(*) as bigint) AS c
       |  FROM tokp GROUP BY doc_id, word),
       |big AS (
       |  SELECT a.doc_id, a.word AS w1, b.word AS w2,
       |    cast(count(*) as bigint) AS c
       |  FROM tokp a JOIN tokp b
       |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY a.doc_id, a.word, b.word),
       |len1 AS (SELECT doc_id, cast(sum(c) as bigint) AS n FROM uni
       |  GROUP BY doc_id),
       |len2 AS (SELECT doc_id, cast(sum(c) as bigint) AS n FROM big
       |  GROUP BY doc_id),
       |pk AS (
       |  SELECT doc_id, substring(lower(text), 1, 40) AS k
       |  FROM documents WHERE text IS NOT NULL AND length(text) >= 40),
       |pairs AS (
       |  SELECT a.doc_id AS cand, b.doc_id AS ref
       |  FROM pk a JOIN pk b ON b.k = a.k AND b.doc_id > a.doc_id),
       |clip1 AS (
       |  SELECT p.cand, p.ref, cast(sum(least(ca.c, cb.c)) as bigint) AS clip
       |  FROM pairs p
       |  JOIN uni ca ON ca.doc_id = p.cand
       |  JOIN uni cb ON cb.doc_id = p.ref AND cb.word = ca.word
       |  GROUP BY p.cand, p.ref),
       |clip2 AS (
       |  SELECT p.cand, p.ref, cast(sum(least(ca.c, cb.c)) as bigint) AS clip
       |  FROM pairs p
       |  JOIN big ca ON ca.doc_id = p.cand
       |  JOIN big cb ON cb.doc_id = p.ref AND cb.w1 = ca.w1 AND cb.w2 = ca.w2
       |  GROUP BY p.cand, p.ref)
       |SELECT p.cand, p.ref,
       |  round(cast(c1.clip as double) / l1c.n, 6) + 0.0 AS p1,
       |  round(cast(coalesce(c2.clip, 0) as double) / l2c.n, 6) + 0.0 AS p2,
       |  round(CASE WHEN l1c.n >= l1r.n THEN cast(1.0 as double)
       |    ELSE exp(1 - cast(l1r.n as double) / l1c.n) END, 6) + 0.0 AS bp,
       |  round(CASE WHEN coalesce(c2.clip, 0) > 0 THEN
       |    (CASE WHEN l1c.n >= l1r.n THEN cast(1.0 as double)
       |      ELSE exp(1 - cast(l1r.n as double) / l1c.n) END)
       |    * sqrt((cast(c1.clip as double) / l1c.n)
       |         * (cast(c2.clip as double) / l2c.n))
       |    ELSE cast(0 as double) END, 6) + 0.0 AS bleu2
       |FROM pairs p
       |JOIN clip1 c1 ON c1.cand = p.cand AND c1.ref = p.ref
       |LEFT JOIN clip2 c2 ON c2.cand = p.cand AND c2.ref = p.ref
       |JOIN len1 l1c ON l1c.doc_id = p.cand
       |JOIN len1 l1r ON l1r.doc_id = p.ref
       |JOIN len2 l2c ON l2c.doc_id = p.cand
       |ORDER BY p.cand, p.ref""".stripMargin

  // q423 price-volume-mix decomposition of revenue change between the
  // 1995-1997 and 1998-2001 order periods, per part then totaled:
  // dR = sum (qB-qA) pA  (volume)  +  sum (pB-pA) qA  (price)
  //    + sum (pB-pA)(qB-qA)  (mix) — the Laspeyres bridge, exact
  // decimal folds end-to-end.
  private def priceVolumeSql(yearNum: String => String): String =
    s"""WITH li AS (
       |  SELECT l.l_partkey AS p,
       |    CASE WHEN ${yearNum("o.o_orderdate")} < 1998 THEN 'A' ELSE 'B' END
       |      AS period,
       |    cast(l.l_quantity as double) AS q,
       |    cast(l.l_extendedprice as double) AS r
       |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
       |pp AS (
       |  SELECT p, period,
       |    cast(sum(cast(round(q, 2) as decimal(25,2))) as double) AS q,
       |    cast(sum(cast(round(r, 2) as decimal(25,2))) as double) AS r
       |  FROM li GROUP BY p, period),
       |w AS (
       |  SELECT coalesce(a.p, b.p) AS p,
       |    coalesce(a.q, 0) AS qa, coalesce(b.q, 0) AS qb,
       |    CASE WHEN coalesce(a.q, 0) > 0 THEN a.r / a.q ELSE 0 END AS pa,
       |    CASE WHEN coalesce(b.q, 0) > 0 THEN b.r / b.q ELSE 0 END AS pb
       |  FROM (SELECT * FROM pp WHERE period = 'A') a
       |  FULL OUTER JOIN (SELECT * FROM pp WHERE period = 'B') b
       |    ON b.p = a.p),
       |parts AS (
       |  SELECT
       |    cast(sum(cast(round((qb - qa) * pa, 4) as decimal(28,4)))
       |      as double) AS volume_effect,
       |    cast(sum(cast(round((pb - pa) * qa, 4) as decimal(28,4)))
       |      as double) AS price_effect,
       |    cast(sum(cast(round((pb - pa) * (qb - qa), 4) as decimal(28,4)))
       |      as double) AS mix_effect
       |  FROM w WHERE qa > 0 AND qb > 0)
       |SELECT round(volume_effect, 2) + 0.0 AS volume_effect,
       |  round(price_effect, 2) + 0.0 AS price_effect,
       |  round(mix_effect, 2) + 0.0 AS mix_effect,
       |  round(volume_effect + price_effect + mix_effect, 2) + 0.0
       |    AS total_change_matched_parts
       |FROM parts""".stripMargin

  // q424 distinct-n generation-diversity metrics per source: distinct
  // unigram and bigram counts over total — the mode-collapse alarm for
  // generated corpora. Bigrams from the positional tokenizer.
  private def distinctNSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |src AS (SELECT doc_id, source FROM documents),
       |t AS (
       |  SELECT s.source, tp.doc_id, tp.pos, tp.word
       |  FROM tokp tp JOIN src s ON s.doc_id = tp.doc_id),
       |uni AS (
       |  SELECT source, cast(count(*) as bigint) AS total,
       |    cast(count(DISTINCT word) as bigint) AS uniq
       |  FROM t GROUP BY source),
       |big AS (
       |  SELECT a.source, cast(count(*) as bigint) AS total,
       |    cast(count(DISTINCT concat(a.word, ' ', b.word)) as bigint) AS uniq
       |  FROM t a JOIN t b
       |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.source = a.source
       |  GROUP BY a.source)
       |SELECT uni.source,
       |  round(cast(uni.uniq as double) / uni.total, 6) + 0.0 AS distinct_1,
       |  round(cast(big.uniq as double) / big.total, 6) + 0.0 AS distinct_2
       |FROM uni JOIN big ON big.source = uni.source
       |ORDER BY uni.source""".stripMargin

  // q425 self-overlap (self-BLEU-lite) per source: the fraction of each
  // document's bigram OCCURRENCES that also occur in OTHER documents of
  // the same source (multiset: other-count = source-count - own-count) —
  // high overlap flags template-generated near-clones. One bigram
  // reduction, one source rollup; never a doc x doc join.
  private def selfOverlapSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |src AS (SELECT doc_id, source FROM documents),
       |bg AS (
       |  SELECT s.source, a.doc_id, concat(a.word, ' ', b.word) AS g,
       |    cast(count(*) as bigint) AS c
       |  FROM tokp a JOIN tokp b
       |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  JOIN src s ON s.doc_id = a.doc_id
       |  GROUP BY s.source, a.doc_id, concat(a.word, ' ', b.word)),
       |sg AS (
       |  SELECT source, g, cast(sum(c) as bigint) AS tc FROM bg
       |  GROUP BY source, g),
       |ov AS (
       |  SELECT bg.source, bg.doc_id,
       |    cast(sum(CASE WHEN sg.tc > bg.c THEN bg.c ELSE 0 END) as bigint)
       |      AS shared,
       |    cast(sum(bg.c) as bigint) AS total
       |  FROM bg JOIN sg ON sg.source = bg.source AND sg.g = bg.g
       |  GROUP BY bg.source, bg.doc_id)
       |SELECT source,
       |  cast(count(*) as bigint) AS n_docs,
       |  round(cast(sum(shared) as double) / sum(total), 6) + 0.0
       |    AS self_overlap
       |FROM ov GROUP BY source ORDER BY source""".stripMargin

  // q426 permutation entropy (order 3) of the daily series: ordinal
  // pattern of (y_t, y_t+1, y_t+2) via two lead() windows (rank ties
  // broken by position, the standard convention), Shannon entropy of the
  // 6-pattern distribution normalized by ln 6 — the model-free
  // complexity measure for the q293/q328 series.
  private def permEntropySql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |w AS (
       |  SELECT y AS a,
       |    lead(y, 1) OVER (ORDER BY d) AS b,
       |    lead(y, 2) OVER (ORDER BY d) AS c
       |  FROM daily),
       |pat AS (
       |  -- ordinal pattern = the per-position ranks (stable ties: an
       |  -- earlier position outranks an equal later one)
       |  SELECT concat(
       |    cast((CASE WHEN b < a THEN 1 ELSE 0 END)
       |       + (CASE WHEN c < a THEN 1 ELSE 0 END) as string),
       |    cast((CASE WHEN a <= b THEN 1 ELSE 0 END)
       |       + (CASE WHEN c < b THEN 1 ELSE 0 END) as string),
       |    cast((CASE WHEN a <= c THEN 1 ELSE 0 END)
       |       + (CASE WHEN b <= c THEN 1 ELSE 0 END) as string)) AS p
       |  FROM w WHERE b IS NOT NULL AND c IS NOT NULL),
       |c AS (SELECT p, cast(count(*) as bigint) AS n FROM pat GROUP BY p),
       |t AS (SELECT cast(sum(n) as bigint) AS tot FROM c)
       |SELECT cast(count(*) as bigint) AS patterns_seen, max(t.tot) AS windows,
       |  round(cast(sum(cast(round(
       |    -(cast(c.n as double) / t.tot) * ln(cast(c.n as double) / t.tot), 9)
       |    as decimal(20,9))) as double) / ln(cast(6.0 as double)), 6) + 0.0
       |    AS perm_entropy
       |FROM c CROSS JOIN t""".stripMargin

  // q427 Hurst exponent by rescaled-range over block sizes {5, 10, 15}:
  // per block the range of cumulative mean-deviations over the block
  // std, averaged per size, H = the log-log OLS slope across the three
  // sizes — the long-memory diagnostic.
  private def hurstSql(dayNum: String => String): String = {
    def blocks(w: Int): String =
      s"""SELECT $w AS w, cast(floor(i / $w.0) as bigint) AS blk, i, y
         |  FROM idx WHERE i < cast(floor(n / $w.0) as bigint) * $w""".stripMargin
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |idx AS (
       |  SELECT y, row_number() OVER (ORDER BY d) - 1 AS i,
       |    count(*) OVER () AS n
       |  FROM daily),
       |bl AS (
       |  ${blocks(5)}
       |  UNION ALL
       |  ${blocks(10)}
       |  UNION ALL
       |  ${blocks(15)}),
       |bm AS (
       |  SELECT w, blk, cast(count(*) as bigint) AS m,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) as double) AS s1,
       |    cast(sum(cast(round(y * y, 4) as decimal(25,4))) as double) AS s2
       |  FROM bl GROUP BY w, blk),
       |dev AS (
       |  SELECT bl.w, bl.blk, bl.i,
       |    sum(cast(round(bl.y - bm.s1 / bm.m, 6) as decimal(25,6)))
       |      OVER (PARTITION BY bl.w, bl.blk ORDER BY bl.i) AS cum
       |  FROM bl JOIN bm ON bm.w = bl.w AND bm.blk = bl.blk),
       |rs AS (
       |  SELECT d.w, d.blk,
       |    (max(cast(d.cum as double)) - min(cast(d.cum as double)))
       |      / sqrt((bm.s2 - bm.s1 * bm.s1 / bm.m) / bm.m) AS rs
       |  FROM dev d JOIN bm ON bm.w = d.w AND bm.blk = d.blk
       |  WHERE (bm.s2 - bm.s1 * bm.s1 / bm.m) > 0
       |  GROUP BY d.w, d.blk, bm.s1, bm.s2, bm.m),
       |avg_rs AS (
       |  SELECT w, round(ln(cast(w as double)), 9) AS x,
       |    round(ln(cast(sum(cast(round(rs, 9) as decimal(20,9))) as double)
       |      / count(*)), 9) AS y
       |  FROM rs GROUP BY w),
       |st AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(x, 9) as decimal(20,9))) as double) AS sx,
       |    cast(sum(cast(round(y, 9) as decimal(20,9))) as double) AS sy,
       |    cast(sum(cast(round(x * y, 9) as decimal(20,9))) as double) AS sxy,
       |    cast(sum(cast(round(x * x, 9) as decimal(20,9))) as double) AS sxx
       |  FROM avg_rs)
       |SELECT n AS n_sizes,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS hurst
       |FROM st""".stripMargin
  }

  // q428 periodogram over candidate periods 2-10 days: spectral power
  // P(p) = C^2 + S^2 with C = sum y cos(2 pi d / p) (mean-removed,
  // round-6 pinned trig folds); the argmax should recover the weekly
  // cycle q293 decomposes.
  private def periodogramSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT cast(${dayNum("ts")} as double) AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |m AS (SELECT cast(sum(cast(round(y, 4) as decimal(25,4))) as double)
       |    / count(*) AS mu FROM daily),
       |ps AS (SELECT * FROM (VALUES (2), (3), (4), (5), (6), (7), (8), (9), (10))
       |  AS t(p)),
       |tr AS (
       |  SELECT ps.p,
       |    cast(sum(cast(round((d2.y - m.mu)
       |      * cos(2 * cast(3.14159265358979 as double) * d2.d / ps.p), 6)
       |      as decimal(25,6))) as double) AS c,
       |    cast(sum(cast(round((d2.y - m.mu)
       |      * sin(2 * cast(3.14159265358979 as double) * d2.d / ps.p), 6)
       |      as decimal(25,6))) as double) AS s
       |  FROM ps CROSS JOIN daily d2 CROSS JOIN m
       |  GROUP BY ps.p),
       |sel AS (
       |  SELECT p, round(c * c + s * s, 2) AS pw,
       |    row_number() OVER (ORDER BY round(c * c + s * s, 2) DESC, p) AS rk
       |  FROM tr),
       |dom AS (SELECT p AS dp FROM sel WHERE rk = 1)
       |SELECT cast(sel.p as int) AS period, sel.pw + 0.0 AS power,
       |  cast(dom.dp as int) AS dominant_period
       |FROM sel CROSS JOIN dom ORDER BY period""".stripMargin

  // q429 TOST equivalence test (margin delta = 5) on the click/view
  // means: both one-sided Welch t statistics must clear +-1.645 — the
  // "are they the SAME" complement of q339's difference test.
  private val tostSql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |s AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(v, 9) as decimal(30,9))) as double) AS s1,
      |    cast(sum(cast(round(v * v, 9) as decimal(30,9))) as double) AS s2
      |  FROM base GROUP BY g),
      |m AS (
      |  SELECT g, n, s1 / n AS mu, (s2 - s1 * s1 / n) / (n - 1.0) AS vr
      |  FROM s),
      |p AS (
      |  SELECT max(CASE WHEN g = 1 THEN n END) AS n1,
      |    max(CASE WHEN g = 0 THEN n END) AS n2,
      |    max(CASE WHEN g = 1 THEN mu END) AS mu1,
      |    max(CASE WHEN g = 0 THEN mu END) AS mu2,
      |    max(CASE WHEN g = 1 THEN vr END) AS v1,
      |    max(CASE WHEN g = 0 THEN vr END) AS v2
      |  FROM m),
      |t AS (
      |  SELECT n1, n2,
      |    (mu1 - mu2 + cast(5.0 as double)) / sqrt(v1 / n1 + v2 / n2) AS t_low,
      |    (mu1 - mu2 - cast(5.0 as double)) / sqrt(v1 / n1 + v2 / n2) AS t_high
      |  FROM p)
      |SELECT n1, n2,
      |  round(t_low, 6) + 0.0 AS t_lower,
      |  round(t_high, 6) + 0.0 AS t_upper,
      |  CASE WHEN t_low > cast(1.645 as double)
      |    AND t_high < cast(-1.645 as double) THEN 1 ELSE 0 END AS equivalent
      |FROM t""".stripMargin

  // q430 recommender aggregate diversity: catalog coverage of the q349
  // top-3 neighbor lists plus the Gini concentration of how often items
  // are recommended — popularity-bias audit for the item-item CF.
  private val recCoverageSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |cf AS (SELECT p, cast(count(*) as bigint) AS c FROM b GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b2.p AS pb, cast(count(*) as bigint) AS cab
      |  FROM b a JOIN b b2 ON b2.o = a.o AND b2.p <> a.p
      |  GROUP BY a.p, b2.p),
      |sim AS (
      |  SELECT pa, pb, cab,
      |    round(cast(cab as double) / sqrt(cast(ca.c as double) * cb.c), 6)
      |      + 0.0 AS cosine
      |  FROM pairs JOIN cf ca ON ca.p = pairs.pa JOIN cf cb ON cb.p = pairs.pb),
      |rk AS (
      |  SELECT pa, pb,
      |    row_number() OVER (PARTITION BY pa
      |                       ORDER BY cosine DESC, cab DESC, pb) AS rnk
      |  FROM sim),
      |recs AS (SELECT pb FROM rk WHERE rnk <= 3),
      |rc AS (SELECT pb, cast(count(*) as bigint) AS n FROM recs GROUP BY pb),
      |cat AS (SELECT cast(count(*) as bigint) AS n_items FROM cf),
      |gini AS (
      |  SELECT cast(count(*) as bigint) AS k,
      |    cast(sum(cast(round(cast(i as double) * n, 2) as decimal(25,2)))
      |      as double) AS six,
      |    cast(sum(n) as bigint) AS sn
      |  FROM (SELECT n, row_number() OVER (ORDER BY n, pb) AS i FROM rc) z)
      |SELECT cat.n_items,
      |  gini.k AS items_recommended,
      |  round(cast(gini.k as double) / cat.n_items, 6) + 0.0 AS coverage,
      |  round(cast(2.0 as double) * gini.six
      |      / (gini.k * cast(gini.sn as double))
      |    - (gini.k + cast(1.0 as double)) / gini.k, 6) + 0.0 AS rec_gini
      |FROM cat CROSS JOIN gini""".stripMargin

  // q431 Yule-Walker AR(2) fit on the daily count series: biased
  // autocovariances c0/c1/c2 (decimal-pinned folds), r_k = c_k/c0,
  // phi via the 2x2 Yule-Walker closed form, then the in-sample
  // one-step-ahead RMSE at the pinned coefficients.
  private def yuleWalkerSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(y as bigint)) as double) / count(*) AS mu
       |  FROM daily),
       |x AS (
       |  SELECT daily.d, daily.y, daily.y - m.mu AS x,
       |    lag(daily.y - m.mu, 1) OVER (ORDER BY daily.d) AS x1,
       |    lag(daily.y - m.mu, 2) OVER (ORDER BY daily.d) AS x2
       |  FROM daily CROSS JOIN m),
       |cv AS (
       |  SELECT
       |    cast(sum(cast(round(x * x, 6) as decimal(25,6))) as double) AS c0,
       |    cast(sum(cast(round(CASE WHEN x1 IS NOT NULL THEN x * x1 ELSE 0.0E0 END, 6)
       |      as decimal(25,6))) as double) AS c1,
       |    cast(sum(cast(round(CASE WHEN x2 IS NOT NULL THEN x * x2 ELSE 0.0E0 END, 6)
       |      as decimal(25,6))) as double) AS c2
       |  FROM x),
       |co AS (
       |  SELECT round(c1 / c0, 9) AS r1, round(c2 / c0, 9) AS r2,
       |    round((c1 / c0) * (1 - round(c2 / c0, 9))
       |      / (1 - round(c1 / c0, 9) * round(c1 / c0, 9)), 9) AS phi1,
       |    round((round(c2 / c0, 9) - round(c1 / c0, 9) * round(c1 / c0, 9))
       |      / (1 - round(c1 / c0, 9) * round(c1 / c0, 9)), 9) AS phi2
       |  FROM cv),
       |er AS (
       |  SELECT x.y, m.mu + co.phi1 * x.x1 + co.phi2 * x.x2 AS pred
       |  FROM x CROSS JOIN co CROSS JOIN m
       |  WHERE x.x1 IS NOT NULL AND x.x2 IS NOT NULL),
       |rm AS (
       |  SELECT cast(count(*) as bigint) AS m_pred,
       |    cast(sum(cast(round((y - pred) * (y - pred), 6) as decimal(25,6)))
       |      as double) AS sse
       |  FROM er)
       |SELECT m.n AS n_days, co.r1 + 0.0 AS r1, co.r2 + 0.0 AS r2,
       |  co.phi1 + 0.0 AS phi1, co.phi2 + 0.0 AS phi2,
       |  round(sqrt(rm.sse / rm.m_pred), 6) + 0.0 AS rmse
       |FROM co CROSS JOIN rm CROSS JOIN m""".stripMargin

  // q432 maximum drawdown of the cumulative daily purchase revenue:
  // decimal-exact running sum + running max, trough = argmax(runmax-cum)
  // (earliest on ties), peak = earliest day attaining that running max.
  private def drawdownSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d,
       |    sum(cast(round(value, 4) as decimal(25,4))) AS rev
       |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
       |  GROUP BY 1),
       |c AS (SELECT d, sum(rev) OVER (ORDER BY d) AS cum FROM daily),
       |dd AS (
       |  SELECT d, cum, max(cum) OVER (ORDER BY d) AS runmax
       |  FROM c),
       |t AS (
       |  SELECT d AS trough_day, runmax, runmax - cum AS maxdd,
       |    row_number() OVER (ORDER BY runmax - cum DESC, d) AS rk
       |  FROM dd),
       |tr AS (SELECT trough_day, runmax, maxdd FROM t WHERE rk = 1),
       |pk AS (
       |  SELECT min(dd.d) AS peak_day
       |  FROM dd CROSS JOIN tr
       |  WHERE dd.cum = tr.runmax AND dd.d <= tr.trough_day)
       |SELECT cast(pk.peak_day as bigint) AS peak_day,
       |  cast(tr.trough_day as bigint) AS trough_day,
       |  cast(tr.trough_day - pk.peak_day as bigint) AS dd_days,
       |  round(cast(tr.maxdd as double), 4) + 0.0 AS max_drawdown
       |FROM tr CROSS JOIN pk""".stripMargin

  // q433 Nelson-Aalen cumulative hazard over the q287 signup->purchase
  // durations (hour granularity, censoring at last activity): cum sum of
  // d/n_risk plus the d/n^2 variance estimator; na_survival = exp(-H).
  private def nelsonAalenSql(micros: String => String, idiv: String): String =
    s"""WITH s AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |p AS (
       |  SELECT e.user_id, min(e.ts) AS t1
       |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
       |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
       |mx AS (SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
       |dur AS (
       |  SELECT s.user_id,
       |    CASE WHEN p.t1 IS NOT NULL
       |      THEN (${micros("p.t1")} - ${micros("s.t0")}) $idiv 3600000000
       |      ELSE (${micros("mx.tmax")} - ${micros("s.t0")}) $idiv 3600000000 END AS hrs,
       |    (p.t1 IS NOT NULL) AS observed
       |  FROM s JOIN mx ON s.user_id = mx.user_id
       |  LEFT JOIN p ON s.user_id = p.user_id),
       |ev AS (
       |  SELECT hrs, cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
       |    cast(count(*) as bigint) AS leaving
       |  FROM dur GROUP BY hrs),
       |rk AS (
       |  SELECT hrs, d, sum(leaving) OVER (ORDER BY hrs DESC) AS n_risk
       |  FROM ev),
       |na AS (
       |  SELECT hrs, d, n_risk,
       |    sum(cast(round(cast(d as double) / n_risk, 9) as decimal(20,9)))
       |      OVER (ORDER BY hrs) AS ch,
       |    sum(cast(round(cast(d as double) / (cast(n_risk as double) * n_risk), 9)
       |      as decimal(20,9))) OVER (ORDER BY hrs) AS vr
       |  FROM rk)
       |SELECT cast(hrs as bigint) AS hrs, d, cast(n_risk as bigint) AS n_risk,
       |  round(cast(ch as double), 6) + 0.0 AS cum_hazard,
       |  round(exp(-cast(ch as double)), 6) + 0.0 AS na_survival,
       |  round(cast(vr as double), 9) + 0.0 AS var_hazard
       |FROM na WHERE d > 0 ORDER BY hrs""".stripMargin

  // q434 sequential max-|z| outlier peeling (the generalized-ESD shape
  // with a fixed z threshold instead of the t-quantile lambda): each
  // round recomputes mean/sd over the remaining days from exact integer
  // sums, removes the argmax-|z| day, and reports its R statistic.
  private def esdPeelSql(dayNum: String => String, rounds: Int = 3): String = {
    val head =
      s"WITH rem0 AS (\n  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y\n" +
        "  FROM events GROUP BY 1)"
    val steps = (1 to rounds).map { i =>
      val prev = s"rem${i - 1}"
      s""",
st$i AS (
  SELECT cast(count(*) as bigint) AS n,
    cast(sum(y) as double) AS s1, cast(sum(y * y) as double) AS s2
  FROM $prev),
z$i AS (
  SELECT r.d, r.y,
    abs(r.y - s.s1 / s.n) / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS r_stat
  FROM $prev r CROSS JOIN st$i s),
pick$i AS (
  SELECT $i AS peel_round, d, y, round(r_stat, 6) AS r_stat
  FROM z$i ORDER BY r_stat DESC, d LIMIT 1),
rem$i AS (
  SELECT r.d, r.y FROM $prev r
  WHERE r.d NOT IN (SELECT d FROM pick$i))"""
    }.mkString
    val union = (1 to rounds).map(i => s"SELECT * FROM pick$i").mkString(" UNION ALL ")
    head + steps +
      s"""
SELECT cast(peel_round as int) AS peel_round, cast(d as bigint) AS day_id,
  y AS daily_count, r_stat + 0.0 AS r_stat,
  CASE WHEN r_stat > 3.0 THEN 1 ELSE 0 END AS flagged
FROM ($union) ORDER BY peel_round"""
  }

  // q435 DTW (Spark side): per-event-type day-of-week activity-share
  // profiles compared to the 'click' reference via the native
  // dtw_distance kernel — the distributed shape (one codegen'd DP per
  // row) that scales to a per-entity profile comparison.
  private def dtwSparkSql(dayNum: String => String): String =
    s"""WITH c AS (
       |  SELECT event_type, cast((${dayNum("ts")}) % 7 as int) AS dow,
       |    cast(count(*) as bigint) AS c
       |  FROM events GROUP BY 1, 2),
       |t AS (
       |  SELECT event_type,
       |    map_from_entries(collect_list(struct(dow, c))) AS m,
       |    cast(sum(c) as double) AS tot
       |  FROM c GROUP BY event_type),
       |prof AS (
       |  SELECT event_type,
       |    transform(sequence(0, 6),
       |      i -> round(cast(coalesce(m[i], 0) as double) / tot, 6)) AS p
       |  FROM t),
       |r AS (SELECT p AS pr FROM prof WHERE event_type = 'click')
       |SELECT prof.event_type, round(dtw_distance(prof.p, r.pr), 6) + 0.0 AS dtw
       |FROM prof CROSS JOIN r ORDER BY event_type""".stripMargin

  // q435 DTW oracle: the 7x7 DP fully unrolled as lateral-alias columns
  // (row-major, same accumulation order as VectorKernels.dtw — doubles
  // stay bit-equal).
  private def dtwOracleSql(dayNum: String => String): String = {
    val pivCols = (0 until 7).map(j =>
      s"coalesce(max(CASE WHEN dow = $j THEN s END), 0.0) AS a$j").mkString(",\n    ")
    val r0cols = (0 until 7).map { j =>
      if (j == 0) "abs(a0 - b0) AS d0_0"
      else s"d0_${j - 1} + abs(a0 - b$j) AS d0_$j"
    }.mkString(",\n    ")
    val rows = (1 until 7).map { i =>
      val cols = (0 until 7).map { j =>
        if (j == 0) s"d${i - 1}_0 + abs(a$i - b0) AS d${i}_0"
        else s"abs(a$i - b$j) + least(d${i - 1}_$j, d${i - 1}_${j - 1}, d${i}_${j - 1}) AS d${i}_$j"
      }.mkString(",\n    ")
      s"r$i AS (SELECT *,\n    $cols\n  FROM r${i - 1})"
    }.mkString(",\n")
    s"""WITH c AS (
  SELECT event_type, cast((${dayNum("ts")}) % 7 as int) AS dow,
    cast(count(*) as bigint) AS c
  FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, cast(sum(c) as double) AS tot FROM c GROUP BY 1),
sh AS (
  SELECT c.event_type, c.dow, round(cast(c.c as double) / t.tot, 6) AS s
  FROM c JOIN tot t ON t.event_type = c.event_type),
piv AS (
  SELECT event_type,
    $pivCols
  FROM sh GROUP BY event_type),
ref AS (SELECT ${(0 until 7).map(j => s"a$j AS b$j").mkString(", ")}
  FROM piv WHERE event_type = 'click'),
base AS (SELECT p.*, ${(0 until 7).map(j => s"r.b$j").mkString(", ")}
  FROM piv p CROSS JOIN ref r),
r0 AS (SELECT *,
    $r0cols
  FROM base),
$rows
SELECT event_type, round(d6_6, 6) + 0.0 AS dtw FROM r6 ORDER BY event_type"""
  }

  // q436 frequent 3-itemsets. Baskets here are NARROW (median 4 items),
  // so triple support comes from direct per-basket 3-way enumeration —
  // Sigma C(width, 3) rows, linear in basket count — rather than
  // Apriori candidate probing (cand x basket join), which at sf0.1's
  // support levels made EVERY category triple a candidate and exploded
  // to category-fanout^3 (measured 136 s -> 3 s at sf0.1). Downward
  // closure makes the results identical; candidate probing is the right
  // shape only for WIDE baskets, where C(width, 3) dominates. The L2
  // table survives for the confidence denominator.
  private val aprioriTriplesSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 50 AS i FROM lineitem),
      |p2 AS (
      |  SELECT a.i AS i1, b2.i AS i2, cast(count(*) as bigint) AS s
      |  FROM b a JOIN b b2 ON b2.o = a.o AND b2.i > a.i
      |  GROUP BY a.i, b2.i HAVING count(*) >= 15),
      |t3 AS (
      |  SELECT a.i AS i1, b2.i AS i2, c.i AS i3, cast(count(*) as bigint) AS s
      |  FROM b a JOIN b b2 ON b2.o = a.o AND b2.i > a.i
      |  JOIN b c ON c.o = a.o AND c.i > b2.i
      |  GROUP BY a.i, b2.i, c.i HAVING count(*) >= 15)
      |SELECT t3.i1, t3.i2, t3.i3, t3.s AS support,
      |  round(cast(t3.s as double) / p.s, 6) + 0.0 AS conf_12_to_3
      |FROM t3 JOIN p2 p ON p.i1 = t3.i1 AND p.i2 = t3.i2
      |ORDER BY t3.i1, t3.i2, t3.i3""".stripMargin

  // q437 Shapley-value channel attribution over (user, day) journeys:
  // coalition value v(S) = purchase rate of journeys whose exact touch
  // set is S; exact 3-player Shapley via the closed-form subset weights
  // (1/3, 1/6, 1/6, 1/3). Missing coalitions contribute v = 0.
  private def shapleySql(dayNum: String => String): String = {
    val vCells = for (tv <- 0 to 1; tc <- 0 to 1; tg <- 0 to 1) yield
      s"coalesce(max(CASE WHEN tv=$tv AND tc=$tc AND tg=$tg THEN v END), 0.0) AS v$tv$tc$tg"
    s"""WITH u AS (
       |  SELECT user_id, ${dayNum("ts")} AS d,
       |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS tv,
       |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS tc,
       |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS tg,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id, ${dayNum("ts")}),
       |r AS (
       |  SELECT tv, tc, tg, round(cast(sum(conv) as double) / count(*), 9) AS v
       |  FROM u GROUP BY tv, tc, tg),
       |p AS (SELECT
       |  ${vCells.mkString(",\n       |  ")}
       |FROM r)
       |SELECT channel, shapley FROM (
       |  SELECT 'view' AS channel,
       |    round((v100 - v000) / 3.0 + (v110 - v010) / 6.0
       |        + (v101 - v001) / 6.0 + (v111 - v011) / 3.0, 6) + 0.0 AS shapley
       |  FROM p
       |  UNION ALL
       |  SELECT 'click' AS channel,
       |    round((v010 - v000) / 3.0 + (v110 - v100) / 6.0
       |        + (v011 - v001) / 6.0 + (v111 - v101) / 3.0, 6) + 0.0
       |  FROM p
       |  UNION ALL
       |  SELECT 'signup' AS channel,
       |    round((v001 - v000) / 3.0 + (v101 - v100) / 6.0
       |        + (v011 - v010) / 6.0 + (v111 - v110) / 3.0, 6) + 0.0
       |  FROM p)
       |ORDER BY channel""".stripMargin
  }

  // q438 difference-in-differences: synthetic assignment (even user_id =
  // treated), post = day >= d0+15, outcome = mean click value; DiD plus
  // a pre-period placebo split at d0+7 as the parallel-trends check.
  private def didSql(dayNum: String => String): String =
    s"""WITH base AS (
       |  SELECT user_id, ${dayNum("ts")} AS d, value AS v
       |  FROM events WHERE event_type = 'click' AND value IS NOT NULL),
       |rng AS (SELECT min(d) AS d0 FROM base),
       |cells AS (
       |  SELECT CASE WHEN b.user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
       |    CASE WHEN b.d >= r.d0 + 15 THEN 1 ELSE 0 END AS post,
       |    CASE WHEN b.d < r.d0 + 15 AND b.d >= r.d0 + 7 THEN 1 ELSE 0 END AS prelate,
       |    b.v
       |  FROM base b CROSS JOIN rng r),
       |agg AS (
       |  SELECT treated, post, cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(v, 9) as decimal(30,9))) as double) / count(*) AS mu
       |  FROM cells GROUP BY treated, post),
       |px AS (SELECT
       |    max(CASE WHEN treated = 1 AND post = 1 THEN mu END) AS t_post,
       |    max(CASE WHEN treated = 1 AND post = 0 THEN mu END) AS t_pre,
       |    max(CASE WHEN treated = 0 AND post = 1 THEN mu END) AS c_post,
       |    max(CASE WHEN treated = 0 AND post = 0 THEN mu END) AS c_pre,
       |    cast(sum(n) as bigint) AS n_obs
       |  FROM agg),
       |pagg AS (
       |  SELECT treated, prelate, cast(sum(cast(round(v, 9) as decimal(30,9))) as double)
       |      / count(*) AS mu
       |  FROM cells WHERE post = 0 GROUP BY treated, prelate),
       |pp AS (SELECT
       |    max(CASE WHEN treated = 1 AND prelate = 1 THEN mu END) AS pt_post,
       |    max(CASE WHEN treated = 1 AND prelate = 0 THEN mu END) AS pt_pre,
       |    max(CASE WHEN treated = 0 AND prelate = 1 THEN mu END) AS pc_post,
       |    max(CASE WHEN treated = 0 AND prelate = 0 THEN mu END) AS pc_pre
       |  FROM pagg)
       |SELECT px.n_obs,
       |  round(px.t_pre, 6) + 0.0 AS treated_pre,
       |  round(px.t_post, 6) + 0.0 AS treated_post,
       |  round(px.c_pre, 6) + 0.0 AS control_pre,
       |  round(px.c_post, 6) + 0.0 AS control_post,
       |  round((px.t_post - px.t_pre) - (px.c_post - px.c_pre), 6) + 0.0 AS did,
       |  round((pp.pt_post - pp.pt_pre) - (pp.pc_post - pp.pc_pre), 6) + 0.0
       |    AS placebo_did
       |FROM px CROSS JOIN pp""".stripMargin

  // q439 raking / iterative proportional fitting, `iters` row+column
  // half-step pairs unrolled: a biased subsample (custkey % 3 = 0) is
  // reweighted to the full customer table's margins over
  // (nationkey % 5, mktsegment). Each half-step re-pins weights at
  // round-6 and folds margin sums through decimals — order-independent.
  private def rakingSql(iters: Int = 3): String = {
    val steps = (1 to iters).map { k =>
      val prev = if (k == 1) "w0" else s"c${k - 1}"
      s""",
rs$k AS (
  SELECT a, cast(sum(cast(w as decimal(25,6))) as double) AS s
  FROM $prev GROUP BY a),
r$k AS (
  SELECT w.a, w.b, round(w.w * ta.t / rs$k.s, 6) AS w
  FROM $prev w JOIN ta ON ta.a = w.a JOIN rs$k ON rs$k.a = w.a),
cs$k AS (
  SELECT b, cast(sum(cast(w as decimal(25,6))) as double) AS s
  FROM r$k GROUP BY b),
c$k AS (
  SELECT w.a, w.b, round(w.w * tb.t / cs$k.s, 6) AS w
  FROM r$k w JOIN tb ON tb.b = w.b JOIN cs$k ON cs$k.b = w.b)"""
    }.mkString
    s"""WITH samp AS (
  SELECT c_nationkey % 5 AS a, c_mktsegment AS b
  FROM customer WHERE c_custkey % 3 = 0),
full_t AS (SELECT c_nationkey % 5 AS a, c_mktsegment AS b FROM customer),
ta AS (SELECT a, cast(count(*) as double) AS t FROM full_t GROUP BY a),
tb AS (SELECT b, cast(count(*) as double) AS t FROM full_t GROUP BY b),
w0 AS (
  SELECT a, b, cast(count(*) as double) AS w
  FROM samp GROUP BY a, b)$steps
SELECT w.a AS nation_grp, w.b AS segment,
  cast(w0.w as bigint) AS n_sample, w.w + 0.0 AS weight,
  round(w.w / w0.w, 6) + 0.0 AS expansion
FROM c$iters w JOIN w0 ON w0.a = w.a AND w0.b = w.b
ORDER BY nation_grp, segment"""
  }

  // q440 SCD2 interval reconstruction from the event change log:
  // consecutive same-status rows compressed (lag gap test), validity
  // [ts, next-change ts); snapshot membership at 2024-01-15 plus the
  // open-interval (current) census per status.
  private val scd2Sql =
    """WITH dedup AS (
      |  SELECT user_id, ts, event_type FROM (
      |    SELECT user_id, ts, event_type,
      |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS pv
      |    FROM events) z
      |  WHERE pv IS NULL OR pv <> event_type),
      |scd AS (
      |  SELECT user_id, event_type AS status, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS valid_to
      |  FROM dedup),
      |snap AS (
      |  SELECT status, cast(count(*) as bigint) AS n_at_snapshot
      |  FROM scd
      |  WHERE valid_from <= timestamp '2024-01-15 00:00:00'
      |    AND (valid_to IS NULL OR valid_to > timestamp '2024-01-15 00:00:00')
      |  GROUP BY status),
      |cur AS (
      |  SELECT status, cast(count(*) as bigint) AS n_current
      |  FROM scd WHERE valid_to IS NULL GROUP BY status),
      |vers AS (
      |  SELECT status, cast(count(*) as bigint) AS n_versions
      |  FROM scd GROUP BY status)
      |SELECT v.status, v.n_versions,
      |  coalesce(s.n_at_snapshot, 0) AS n_at_snapshot,
      |  coalesce(c.n_current, 0) AS n_current
      |FROM vers v
      |LEFT JOIN snap s ON s.status = v.status
      |LEFT JOIN cur c ON c.status = v.status
      |ORDER BY v.status""".stripMargin

  // q441 absorbing Markov chain: expected steps to 'purchase' from each
  // transient state, t_{k+1} = 1 + Q t_k unrolled `rounds` times over the
  // round-9-pinned transient transition matrix (fixed-iteration contract,
  // same discipline as q341's stationary power iteration). `mat` injects
  // DuckDB's MATERIALIZED hint on the shared CTEs for the oracle twin —
  // without it DuckDB re-inlines qq/tot into every unrolled round and the
  // optimizer blows up at depth 40 (the bpeTrainCtes lesson); Spark CTEs
  // take no hint (its optimizer handles the linear chain fine).
  private def absorbingSql(rounds: Int, mat: String): String = {
    val steps = (1 to rounds).map { k =>
      s""",
t$k AS$mat (
  SELECT tot.cur AS s,
    round(1.0 + cast(coalesce(sum(cast(round(qq.p * p2.t, 12) as decimal(24,12))),
      0) as double), 9) AS t
  FROM tot
  LEFT JOIN qq ON qq.cur = tot.cur
  LEFT JOIN t${k - 1} p2 ON p2.s = qq.nxt
  GROUP BY tot.cur)"""
    }.mkString
    s"""WITH seq AS (
  SELECT user_id, event_type AS cur,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events),
tr AS (SELECT cur, nxt FROM seq WHERE nxt IS NOT NULL AND cur <> 'purchase'),
tot AS$mat (SELECT cur, cast(count(*) as bigint) AS n FROM tr GROUP BY cur),
q AS (
  SELECT t.cur, t.nxt, round(cast(count(*) as double) / tot.n, 9) AS p
  FROM tr t JOIN tot ON tot.cur = t.cur GROUP BY t.cur, t.nxt, tot.n),
qq AS$mat (SELECT cur, nxt, p FROM q WHERE nxt <> 'purchase'),
t0 AS (SELECT cur AS s, cast(0.0 as double) AS t FROM tot)$steps
SELECT s AS state, round(t, 6) + 0.0 AS expected_steps
FROM t$rounds ORDER BY s"""
  }

  // q442 oracle: BPE train on the %7<>3 slice (bpeTrainCtes replay),
  // then the encode replace-chain applied to the held-out vocabulary —
  // fertility (tokens/word) + chars/token per source.
  private def bpeFertilitySql(rounds: Int): String = {
    val encSteps = (1 to rounds).map { r =>
      s""",
e$r AS MATERIALIZED (SELECT source, word, cnt,
  replace(sym, (SELECT ' ' || pair || ' ' FROM m$r),
    (SELECT ' ' || replace(pair, ' ', '') || ' ' FROM m$r)) AS sym
  FROM e${r - 1})"""
    }.mkString
    s"""WITH ${bpeTrainCtes(rounds, "(SELECT text FROM documents WHERE doc_id % 7 <> 3)")},
hw AS (
  SELECT source, word, cast(count(*) as bigint) AS cnt FROM (
    SELECT source, unnest(regexp_extract_all(trim(text), '\\S+')) AS word
    FROM documents WHERE doc_id % 7 = 3)
  GROUP BY source, word),
e0 AS (SELECT source, word, cnt,
  ' ' || array_to_string(list_transform(range(length(word)),
      i -> word[i + 1 : i + 1]), ' ') || ' ' AS sym
  FROM hw)$encSteps,
fin AS (
  SELECT source, cnt, length(word) AS wlen,
    len(string_split(trim(sym), ' ')) AS ntok
  FROM e$rounds)
SELECT source,
  cast(sum(cnt) as bigint) AS n_words,
  cast(sum(cnt * ntok) as bigint) AS n_tokens,
  round(cast(sum(cnt * ntok) as double) / sum(cnt), 6) + 0.0 AS fertility,
  round(cast(sum(cnt * wlen) as double) / sum(cnt * ntok), 6) + 0.0 AS chars_per_token
FROM fin GROUP BY source ORDER BY source"""
  }

  // q443 cross-source shared n-gram ladder: gram sizes 4/8/16 from ONE
  // window pass (15 lead() columns over doc position — one shuffle+sort
  // per doc, no self-joins; the earlier doubling-join chain was
  // re-inlined 7x by both optimizers and went 33x at 10x data). Levels
  // unpivot via a 3-row cross join (still the single pass), and the
  // dedup/join key is the md5-60bit of the gram — identical on both
  // engines, 8 bytes instead of a ~100-byte 16-gram string. Shared
  // counts per source pair come from the DISTINCT (n, source, h) sets
  // (fan-out bounded by source count, the q306 discipline).
  private def ngramLadderSql(tokPosCte: String, md5i: String => String): String = {
    val leads = (1 to 15).map(i => s"lead(word, $i) OVER w AS w$i").mkString(",\n       |    ")
    def gram(n: Int) = "concat_ws(' ', word, " + (1 until n).map(i => s"w$i").mkString(", ") + ")"
    s"""WITH tokp AS ($tokPosCte),
       |src AS (SELECT doc_id, source FROM documents WHERE source IS NOT NULL),
       |win AS (
       |  SELECT doc_id, word,
       |    $leads
       |  FROM tokp
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |gr AS (
       |  SELECT doc_id,
       |    CASE WHEN w3 IS NOT NULL THEN ${md5i(gram(4))} END AS h4,
       |    CASE WHEN w7 IS NOT NULL THEN ${md5i(gram(8))} END AS h8,
       |    CASE WHEN w15 IS NOT NULL THEN ${md5i(gram(16))} END AS h16
       |  FROM win),
       |lvl3 AS (SELECT 4 AS n UNION ALL SELECT 8 UNION ALL SELECT 16),
       |lv AS (
       |  -- BROADCAST(s): without it Spark broadcasts the 2.7M-row
       |  -- windowed gram table (size stats are unknown past Generate +
       |  -- Window), duplicated into both self-join sides — measured 170 s
       |  -- at 10x vs 3 s in an engine that hashes the small side. DuckDB
       |  -- parses the hint as a plain comment.
       |  SELECT /*+ BROADCAST(s) */ l.n, s.source,
       |    CASE l.n WHEN 4 THEN g.h4 WHEN 8 THEN g.h8 ELSE g.h16 END AS h
       |  FROM gr g JOIN src s ON s.doc_id = g.doc_id CROSS JOIN lvl3 l
       |  WHERE CASE l.n WHEN 4 THEN g.h4 WHEN 8 THEN g.h8 ELSE g.h16 END
       |    IS NOT NULL),
       |d AS (SELECT DISTINCT n, source, h FROM lv),
       |sh AS (
       |  SELECT /*+ MERGE(a, b) */ a.n, a.source AS src_a, b.source AS src_b,
       |    cast(count(*) as bigint) AS shared_grams
       |  FROM d a JOIN d b ON b.n = a.n AND b.h = a.h AND b.source > a.source
       |  GROUP BY a.n, a.source, b.source),
       |srcs AS (SELECT DISTINCT source FROM src),
       |pairs AS (
       |  -- pair the DISTINCT source list (20 rows), never the doc-level
       |  -- relation: the doc-level inequality self-join is a nested-loop
       |  -- over docs^2 (2.5e9 comparisons at 10x — the measured 56x blowup)
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM srcs a JOIN srcs b ON b.source > a.source),
       |lvl AS (SELECT 4 AS n UNION ALL SELECT 8 UNION ALL SELECT 16)
       |SELECT p.src_a, p.src_b, cast(l.n as int) AS gram_n,
       |  coalesce(sh.shared_grams, 0) AS shared_grams
       |FROM pairs p CROSS JOIN lvl l
       |LEFT JOIN sh ON sh.src_a = p.src_a AND sh.src_b = p.src_b AND sh.n = l.n
       |ORDER BY p.src_a, p.src_b, gram_n""".stripMargin
  }

  // q444 Cochran-Armitage trend test: ordered priority scores 1..5,
  // outcome = finished order; Z from exact integer score/event sums.
  private val cochranArmitageSql =
    """WITH g AS (
      |  SELECT cast(substring(o_orderpriority, 1, 1) as int) AS s,
      |    cast(count(*) as bigint) AS n,
      |    cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) AS r
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT cast(sum(n) as bigint) AS nn, cast(sum(r) as bigint) AS rr,
      |    cast(sum(s * n) as bigint) AS sn, cast(sum(s * s * n) as bigint) AS ssn,
      |    cast(sum(s * r) as bigint) AS sr
      |  FROM g)
      |SELECT nn AS n_total, rr AS n_events,
      |  round((cast(sr as double) - cast(sn as double) * rr / nn)
      |    / sqrt((cast(rr as double) / nn) * (1 - cast(rr as double) / nn)
      |         * (cast(ssn as double) - cast(sn as double) * sn / nn)), 6) + 0.0
      |    AS ca_z
      |FROM t""".stripMargin

  // q445 Kendall's W concordance of three nation rankings (customer
  // count, account-balance sum, order count) over the common item set;
  // deterministic rank ties on nation key, decimal-pinned square fold.
  private val kendallWSql =
    """WITH cc AS (SELECT c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM customer GROUP BY 1),
      |ab AS (SELECT c_nationkey AS nk,
      |    sum(cast(round(c_acctbal, 2) as decimal(20,2))) AS v
      |  FROM customer GROUP BY 1),
      |oc AS (SELECT c.c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1),
      |r1 AS (SELECT cc.nk, row_number() OVER (ORDER BY cc.v DESC, cc.nk) AS r
      |  FROM cc JOIN oc ON oc.nk = cc.nk),
      |r2 AS (SELECT ab.nk, row_number() OVER (ORDER BY ab.v DESC, ab.nk) AS r
      |  FROM ab JOIN oc ON oc.nk = ab.nk),
      |r3 AS (SELECT nk, row_number() OVER (ORDER BY v DESC, nk) AS r FROM oc),
      |s AS (
      |  SELECT r1.nk, r1.r + r2.r + r3.r AS rsum
      |  FROM r1 JOIN r2 ON r2.nk = r1.nk JOIN r3 ON r3.nk = r1.nk),
      |k AS (SELECT cast(count(*) as bigint) AS k FROM s)
      |SELECT k.k AS n_items, 3 AS n_rankers,
      |  round(12.0 * cast(sum(cast(round(
      |      (rsum - 3.0 * (k.k + 1) / 2) * (rsum - 3.0 * (k.k + 1) / 2), 4)
      |      as decimal(20,4))) as double)
      |    / (9.0 * (cast(k.k as double) * k.k * k.k - k.k)), 6) + 0.0 AS kendall_w
      |FROM s CROSS JOIN k GROUP BY k.k""".stripMargin

  // q446 Holt-Winters additive (alpha=.3, beta=.1, gamma=.2, m=7) over
  // the first 28 days, classic week-1/week-2 initialization, the 21
  // update steps fully unrolled as lateral-alias CTE columns with
  // round-9-pinned state (one metadata-sized row flows through the
  // chain; the day pivot is the only aggregation).
  private def holtWintersSql(dayNum: String => String): String = {
    val pivCols = (1 to 28).map(i => s"max(CASE WHEN rn = $i THEN y END) AS y$i").mkString(",\n    ")
    val sum17 = (1 to 7).map(i => s"y$i").mkString(" + ")
    val sum814 = (8 to 14).map(i => s"y$i").mkString(" + ")
    val initSeas = (1 to 7).map(j => s"round(y$j - l7, 9) AS s7_$j").mkString(",\n    ")
    val steps = (8 to 28).map { t =>
      val k = ((t - 1) % 7) + 1
      val p = t - 1
      val carryY = (t + 1 to 28).map(i => s"y$i")
      val carry = if (carryY.isEmpty) "" else carryY.mkString(", ") + ","
      val sNew = (1 to 7).map { j =>
        if (j == k) s"round(0.2E0 * (y$t - l$t) + 0.8E0 * s${p}_$j, 9) AS s${t}_$j"
        else s"s${p}_$j AS s${t}_$j"
      }.mkString(",\n    ")
      s""",
st$t AS (
  SELECT $carry
    round(0.3E0 * (y$t - s${p}_$k) + 0.7E0 * (l$p + b$p), 9) AS l$t,
    round(0.1E0 * (l$t - l$p) + 0.9E0 * b$p, 9) AS b$t,
    $sNew,
    round(sse$p + round((y$t - (l$p + b$p + s${p}_$k))
      * (y$t - (l$p + b$p + s${p}_$k)), 9), 9) AS sse$t
  FROM st$p)"""
    }.mkString
    s"""WITH daily AS (
  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
  FROM events GROUP BY 1),
idx AS (SELECT y, row_number() OVER (ORDER BY d) AS rn FROM daily),
piv AS (
  SELECT
    $pivCols
  FROM idx WHERE rn <= 28),
st7 AS (
  SELECT ${(8 to 28).map(i => s"y$i").mkString(", ")},
    round(($sum17) / 7.0E0, 9) AS l7,
    round((($sum814) - ($sum17)) / 49.0E0, 9) AS b7,
    $initSeas,
    cast(0.0 as double) AS sse7
  FROM piv)$steps
SELECT 28 AS n_days,
  round(l28, 6) + 0.0 AS level,
  round(b28, 6) + 0.0 AS trend,
  round(sqrt(sse28 / 21.0E0), 6) + 0.0 AS rmse,
  round(l28 + b28 + s28_1, 6) + 0.0 AS forecast_29
FROM st28"""
  }

  // q447 G-test (log-likelihood-ratio independence) over the
  // priority x status contingency table.
  private val gTestSql =
    """WITH ct AS (
      |  SELECT o_orderpriority AS a, o_orderstatus AS b,
      |    cast(count(*) as bigint) AS o
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT a, cast(sum(o) as bigint) AS ra FROM ct GROUP BY a),
      |cl AS (SELECT b, cast(sum(o) as bigint) AS cb FROM ct GROUP BY b),
      |n AS (SELECT cast(sum(o) as bigint) AS n FROM ct),
      |dims AS (SELECT (SELECT count(*) FROM rt) AS r, (SELECT count(*) FROM cl) AS c),
      |g AS (
      |  SELECT round(2.0 * cast(sum(cast(round(
      |      ct.o * ln(cast(ct.o as double) * n.n / (rt.ra * cast(cl.cb as double))),
      |      9) as decimal(25,9))) as double), 6) + 0.0 AS g_stat
      |  FROM ct JOIN rt ON rt.a = ct.a JOIN cl ON cl.b = ct.b CROSS JOIN n)
      |SELECT cast((dims.r - 1) * (dims.c - 1) as int) AS dof, g.g_stat
      |FROM g CROSS JOIN dims""".stripMargin

  // q448 forecast-accuracy scorecard for the seasonal-naive(7) forecast:
  // MAE vs the naive(1) scale (MASE) and Theil's U2, shared t>7 window.
  private def maseSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |lagged AS (
       |  SELECT y,
       |    lag(y, 1) OVER (ORDER BY d) AS y1,
       |    lag(y, 7) OVER (ORDER BY d) AS y7
       |  FROM daily),
       |w AS (SELECT y, y1, y7 FROM lagged WHERE y7 IS NOT NULL),
       |s AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(abs(y - y1) as decimal(25,4))) as double) AS sae1,
       |    cast(sum(cast(abs(y - y7) as decimal(25,4))) as double) AS sae7,
       |    cast(sum(cast(round((y7 - y) * (y7 - y) / (y1 * y1), 9)
       |      as decimal(25,9))) as double) AS num,
       |    cast(sum(cast(round((y - y1) * (y - y1) / (y1 * y1), 9)
       |      as decimal(25,9))) as double) AS den
       |  FROM w)
       |SELECT n AS n_obs,
       |  round(sae1 / n, 6) + 0.0 AS mae_naive1,
       |  round(sae7 / n, 6) + 0.0 AS mae_snaive7,
       |  round(sae7 / sae1, 6) + 0.0 AS mase,
       |  round(sqrt(num / den), 6) + 0.0 AS theil_u2
       |FROM s""".stripMargin

  // q449 Cliff's delta (ordinal dominance effect size) for click vs
  // view values via midranks — the rank-sum route, never an all-pairs
  // comparison.
  private val cliffsDeltaSql =
    """WITH base AS (
      |  SELECT cast(value as double) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |vals AS (
      |  SELECT v, cast(count(*) as bigint) AS c, cast(sum(g) as bigint) AS c1
      |  FROM base GROUP BY v),
      |rk AS (
      |  SELECT v, c, c1, sum(c) OVER (ORDER BY v) - c AS below
      |  FROM vals),
      |s AS (
      |  SELECT
      |    cast(sum(cast(round(c1 * (below + (c + 1) / 2.0E0), 4)
      |      as decimal(25,4))) as double) AS r1,
      |    cast(sum(c1) as bigint) AS n1,
      |    cast(sum(c - c1) as bigint) AS n2
      |  FROM rk)
      |SELECT n1, n2,
      |  round((2.0 * (r1 - n1 * (n1 + 1) / 2.0E0) - cast(n1 as double) * n2)
      |    / (cast(n1 as double) * n2), 6) + 0.0 AS cliffs_delta
      |FROM s""".stripMargin

  // q450 Atkinson inequality index (epsilon = 1/2) over order values.
  private val atkinsonSql =
    """WITH s AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(o_totalprice, 2) as decimal(25,2))) as double) AS s1,
      |    cast(sum(cast(round(sqrt(o_totalprice), 6) as decimal(25,6))) as double) AS sq
      |  FROM orders WHERE o_totalprice > 0)
      |SELECT n AS n_orders,
      |  round(s1 / n, 4) + 0.0 AS mean_value,
      |  round(1.0 - (sq / n) * (sq / n) / (s1 / n), 6) + 0.0 AS atkinson_05
      |FROM s""".stripMargin

  // q451 Wilson 95% score intervals for per-nation order-finish rates
  // (the binomial interval that behaves at small n / extreme p).
  private val wilsonSql =
    """WITH s AS (
      |  SELECT c.c_nationkey AS nk, cast(count(*) as bigint) AS n,
      |    cast(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) AS x
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1),
      |m AS (SELECT nk, n, x, cast(x as double) / n AS p FROM s)
      |SELECT cast(nk as int) AS nation, n, x, round(p, 6) + 0.0 AS p_hat,
      |  round((p + 3.8416E0 / (2 * n)
      |      - 1.96E0 * sqrt(p * (1 - p) / n + 3.8416E0 / (4.0 * n * n)))
      |    / (1 + 3.8416E0 / n), 6) + 0.0 AS wilson_lo,
      |  round((p + 3.8416E0 / (2 * n)
      |      + 1.96E0 * sqrt(p * (1 - p) / n + 3.8416E0 / (4.0 * n * n)))
      |    / (1 + 3.8416E0 / n), 6) + 0.0 AS wilson_hi
      |FROM m ORDER BY nation""".stripMargin

  // q452 oracle: blocked fuzzy matching (first-token block, levenshtein
  // <= 3) then min-label connected components via WITH RECURSIVE — the
  // q58 closure pattern over the match graph.
  private val entityResolutionOracleSql =
    """WITH RECURSIVE
      |p AS (SELECT p_partkey AS id, p_name,
      |        split_part(p_name, ' ', 1) AS blk
      |      FROM part WHERE p_partkey < 600),
      |m AS (SELECT a.id AS src, b.id AS dst
      |      FROM p a JOIN p b ON b.blk = a.blk AND b.id > a.id
      |      WHERE levenshtein(a.p_name, b.p_name) <= 3),
      |e AS (SELECT src, dst FROM m UNION ALL SELECT dst, src FROM m),
      |cc(id, lbl) AS (
      |  SELECT id, id FROM p
      |  UNION
      |  SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.id
      |)
      |SELECT cast(id as bigint) AS p_partkey, cast(min(lbl) as bigint) AS component
      |FROM cc GROUP BY id ORDER BY p_partkey""".stripMargin

  // q453 second-order Markov next-event backtest: (prev2, prev1) -> argmax
  // next trained on the first 20 days, top-1 accuracy on the rest, with
  // the first-order baseline in the same row (context-miss counts wrong).
  private def markov2Sql(dayNum: String => String): String =
    s"""WITH seq AS (
       |  SELECT user_id, ${dayNum("ts")} AS d, event_type AS e,
       |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
       |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
       |  FROM events),
       |rng AS (SELECT min(${dayNum("ts")}) AS d0 FROM events),
       |tr AS (
       |  SELECT s.p2, s.p1, s.e, s.d, r.d0 FROM seq s CROSS JOIN rng r
       |  WHERE s.p2 IS NOT NULL),
       |tn2 AS (
       |  SELECT p2, p1, e, cast(count(*) as bigint) AS n
       |  FROM tr WHERE d < d0 + 20 GROUP BY p2, p1, e),
       |pred2 AS (
       |  SELECT p2, p1, e AS pe FROM (
       |    SELECT p2, p1, e,
       |      row_number() OVER (PARTITION BY p2, p1 ORDER BY n DESC, e) AS rk
       |    FROM tn2) z WHERE rk = 1),
       |tn1 AS (
       |  SELECT p1, e, cast(count(*) as bigint) AS n
       |  FROM tr WHERE d < d0 + 20 GROUP BY p1, e),
       |pred1 AS (
       |  SELECT p1, e AS pe FROM (
       |    SELECT p1, e,
       |      row_number() OVER (PARTITION BY p1 ORDER BY n DESC, e) AS rk
       |    FROM tn1) z WHERE rk = 1),
       |test AS (SELECT p2, p1, e FROM tr WHERE d >= d0 + 20)
       |SELECT cast(count(*) as bigint) AS n_test,
       |  cast(sum(CASE WHEN pred2.pe = test.e THEN 1 ELSE 0 END) as bigint) AS hit2,
       |  round(cast(sum(CASE WHEN pred2.pe = test.e THEN 1 ELSE 0 END) as double)
       |    / count(*), 6) + 0.0 AS acc_order2,
       |  round(cast(sum(CASE WHEN pred1.pe = test.e THEN 1 ELSE 0 END) as double)
       |    / count(*), 6) + 0.0 AS acc_order1
       |FROM test
       |LEFT JOIN pred2 ON pred2.p2 = test.p2 AND pred2.p1 = test.p1
       |LEFT JOIN pred1 ON pred1.p1 = test.p1""".stripMargin

  // q454 overdispersion audit of the per-type daily counts: index of
  // dispersion (variance/mean, Poisson => 1) + the (n-1)·D chi-square.
  private def overdispersionSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT event_type, ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1, 2),
       |s AS (
       |  SELECT event_type, cast(count(*) as bigint) AS n,
       |    cast(sum(y) as bigint) AS s1, cast(sum(y * y) as bigint) AS s2
       |  FROM daily GROUP BY 1)
       |SELECT event_type, n AS n_days,
       |  round(cast(s1 as double) / n, 6) + 0.0 AS mean_count,
       |  round((cast(s2 as double) - cast(s1 as double) * s1 / n) / (n - 1), 6)
       |    + 0.0 AS var_count,
       |  round(((cast(s2 as double) - cast(s1 as double) * s1 / n) / (n - 1))
       |    / (cast(s1 as double) / n), 6) + 0.0 AS dispersion,
       |  round((n - 1) * ((cast(s2 as double) - cast(s1 as double) * s1 / n) / (n - 1))
       |    / (cast(s1 as double) / n), 6) + 0.0 AS chi2_stat
       |FROM s ORDER BY event_type""".stripMargin

  // q455 Qini curve by targeting-score decile: score = pre-period click
  // count, treatment = the q438 parity assignment, outcome = post-period
  // purchases; cumulative incremental purchases vs the random-targeting
  // diagonal (exact integer folds up to the final division).
  private def qiniSql(dayNum: String => String): String =
    s"""WITH rng AS (SELECT min(${dayNum("ts")}) AS d0 FROM events),
       |u AS (
       |  SELECT e.user_id,
       |    CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
       |    cast(sum(CASE WHEN e.event_type = 'click'
       |      AND ${dayNum("e.ts")} < r.d0 + 15 THEN 1 ELSE 0 END) as bigint) AS score,
       |    cast(sum(CASE WHEN e.event_type = 'purchase'
       |      AND ${dayNum("e.ts")} >= r.d0 + 15 THEN 1 ELSE 0 END) as bigint) AS y
       |  FROM events e CROSS JOIN rng r
       |  GROUP BY e.user_id),
       |rk AS (
       |  SELECT treated, y,
       |    ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
       |  FROM u),
       |d AS (
       |  SELECT decile,
       |    cast(sum(treated) as bigint) AS nt,
       |    cast(sum(1 - treated) as bigint) AS nc,
       |    cast(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) as bigint) AS yt,
       |    cast(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) as bigint) AS yc
       |  FROM rk GROUP BY decile),
       |c AS (
       |  SELECT decile,
       |    sum(nt) OVER (ORDER BY decile) AS cnt,
       |    sum(nc) OVER (ORDER BY decile) AS cnc,
       |    sum(yt) OVER (ORDER BY decile) AS cyt,
       |    sum(yc) OVER (ORDER BY decile) AS cyc
       |  FROM d),
       |tot AS (
       |  SELECT cast(max(cnt) as double) AS tnt, cast(max(cnc) as double) AS tnc,
       |    cast(max(cyt) as double) AS tyt, cast(max(cyc) as double) AS tyc
       |  FROM c)
       |SELECT cast(c.decile as int) AS decile,
       |  cast(c.cnt as bigint) AS n_treated, cast(c.cnc as bigint) AS n_control,
       |  round(c.cyt - c.cyc * cast(c.cnt as double) / c.cnc, 6) + 0.0 AS cum_qini,
       |  round((tot.tyt - tot.tyc * tot.tnt / tot.tnc) * c.decile / 10.0, 6) + 0.0
       |    AS random_line
       |FROM c CROSS JOIN tot ORDER BY decile""".stripMargin

  // q456 Hosmer-Lemeshow calibration test: per-priority finish rates
  // fit on even order keys, chi-square of observed vs expected on odd
  // keys across the 5 priority groups.
  private val hosmerLemeshowSql =
    """WITH tr AS (
      |  SELECT o_orderpriority AS g,
      |    round(cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as double)
      |      / count(*), 9) AS p
      |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
      |te AS (
      |  SELECT o_orderpriority AS g, cast(count(*) as bigint) AS n,
      |    cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) AS o
      |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
      |SELECT cast(count(*) as int) AS n_groups,
      |  cast(sum(te.n) as bigint) AS n_test,
      |  round(cast(sum(cast(round(
      |    (te.o - te.n * tr.p) * (te.o - te.n * tr.p) / (te.n * tr.p * (1 - tr.p)),
      |    9) as decimal(25,9))) as double), 6) + 0.0 AS hl_chi2
      |FROM te JOIN tr ON tr.g = te.g""".stripMargin

  // q457 CRPS of the trailing-7-day empirical ensemble forecast for the
  // daily count: CRPS_t = mean|x_i - y| - mean|x_i - x_j|/2, the pair
  // sum fully unrolled (21 pairs over exact integer counts).
  private def crpsSql(dayNum: String => String): String = {
    val t1 = (1 to 7).map(i => s"abs(m$i - y)").mkString(" + ")
    val pairs = (for (i <- 1 to 7; j <- i + 1 to 7) yield s"abs(m$i - m$j)").mkString(" + ")
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |lagged AS (
       |  SELECT y, ${(1 to 7).map(i => s"lag(y, $i) OVER (ORDER BY d) AS m$i").mkString(",\n       |    ")}
       |  FROM daily),
       |w AS (SELECT * FROM lagged WHERE m7 IS NOT NULL),
       |per AS (
       |  SELECT y,
       |    ($t1) / 7.0E0 AS term1,
       |    ($pairs) / 49.0E0 AS term2,
       |    (m1 + m2 + m3 + m4 + m5 + m6 + m7) / 7.0E0 AS ens_mean
       |  FROM w)
       |SELECT cast(count(*) as bigint) AS n_days,
       |  round(cast(sum(cast(round(term1 - term2 / 2.0E0, 9) as decimal(25,9)))
       |    as double) / count(*), 6) + 0.0 AS crps,
       |  round(cast(sum(cast(round(abs(ens_mean - y), 9) as decimal(25,9)))
       |    as double) / count(*), 6) + 0.0 AS mae_ens_mean
       |FROM per""".stripMargin
  }

  // q458 lexical-richness spectrum per source: Yule's K and Simpson's D
  // from exact integer frequency-spectrum sums.
  private def yuleKSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |src AS (SELECT doc_id, source FROM documents WHERE source IS NOT NULL),
       |wc AS (
       |  SELECT s.source, t.word, cast(count(*) as bigint) AS c
       |  FROM tokp t JOIN src s ON s.doc_id = t.doc_id
       |  GROUP BY s.source, t.word),
       |agg AS (
       |  SELECT source, cast(sum(c) as bigint) AS n,
       |    cast(count(*) as bigint) AS v,
       |    cast(sum(c * c) as bigint) AS s2,
       |    cast(sum(c * (c - 1)) as bigint) AS s11
       |  FROM wc GROUP BY source)
       |SELECT source, n AS n_tokens, v AS vocab,
       |  round(10000.0E0 * (cast(s2 as double) - n) / (cast(n as double) * n), 6)
       |    + 0.0 AS yule_k,
       |  round(cast(s11 as double) / (cast(n as double) * (n - 1)), 9) + 0.0
       |    AS simpson_d
       |FROM agg ORDER BY source""".stripMargin

  // q459 Burrows' Delta stylometry distance between sources: top-30
  // corpus words (count desc, word asc), per-source relative frequencies
  // z-scored across sources (sample sd), Delta = mean |z_a - z_b|.
  private def burrowsDeltaSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |src AS (SELECT doc_id, source FROM documents WHERE source IS NOT NULL),
       |tok AS (
       |  SELECT s.source, t.word FROM tokp t JOIN src s ON s.doc_id = t.doc_id),
       |top AS (
       |  SELECT word FROM (
       |    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS rk
       |    FROM tok GROUP BY word) z WHERE rk <= 30),
       |stot AS (SELECT source, cast(count(*) as bigint) AS n FROM tok GROUP BY source),
       |f AS (
       |  SELECT st.source, tp.word,
       |    round(cast(coalesce(c.c, 0) as double) / st.n, 9) AS fr
       |  FROM stot st CROSS JOIN top tp
       |  LEFT JOIN (
       |    SELECT source, word, cast(count(*) as bigint) AS c
       |    FROM tok GROUP BY source, word) c
       |    ON c.source = st.source AND c.word = tp.word),
       |mz AS (
       |  SELECT word, cast(count(*) as bigint) AS ns,
       |    cast(sum(cast(fr as decimal(20,9))) as double) AS s1,
       |    cast(sum(cast(round(fr * fr, 15) as decimal(25,15))) as double) AS s2
       |  FROM f GROUP BY word),
       |z AS (
       |  SELECT f.source, f.word,
       |    round((f.fr - mz.s1 / mz.ns)
       |      / sqrt((mz.s2 - mz.s1 * mz.s1 / mz.ns) / (mz.ns - 1)), 9) AS z
       |  FROM f JOIN mz ON mz.word = f.word
       |  WHERE (mz.s2 - mz.s1 * mz.s1 / mz.ns) > 0)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  cast(count(*) as bigint) AS n_words,
       |  round(cast(sum(cast(abs(a.z - b.z) as decimal(20,9))) as double)
       |    / count(*), 6) + 0.0 AS burrows_delta
       |FROM z a JOIN z b ON b.word = a.word AND b.source > a.source
       |GROUP BY a.source, b.source ORDER BY src_a, src_b""".stripMargin

  // q460 rich-club coefficient over the category co-purchase graph:
  // phi(k) = 2 E_k / (n_k (n_k - 1)) for k in {5, 10, 15}.
  private val richClubSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 50 AS i FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.i AS u, b2.i AS v
      |  FROM b a JOIN b b2 ON b2.o = a.o AND b2.i > a.i),
      |deg AS (
      |  SELECT n, cast(count(*) as bigint) AS d FROM (
      |    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) z
      |  GROUP BY n),
      |ks AS (SELECT 5 AS k UNION ALL SELECT 10 UNION ALL SELECT 15),
      |club AS (
      |  SELECT ks.k, deg.n FROM ks JOIN deg ON deg.d > ks.k),
      |nk AS (SELECT k, cast(count(*) as bigint) AS n_k FROM club GROUP BY k),
      |ek AS (
      |  SELECT cu.k, cast(count(*) as bigint) AS e_k
      |  FROM e JOIN club cu ON cu.n = e.u
      |  JOIN club cv ON cv.n = e.v AND cv.k = cu.k
      |  GROUP BY cu.k)
      |SELECT nk.k AS k, nk.n_k AS n_nodes, coalesce(ek.e_k, 0) AS n_edges,
      |  round(2.0 * coalesce(ek.e_k, 0)
      |    / (cast(nk.n_k as double) * (nk.n_k - 1)), 6) + 0.0 AS rich_club
      |FROM nk LEFT JOIN ek ON ek.k = nk.k
      |WHERE nk.n_k > 1 ORDER BY k""".stripMargin

  // q461 delete-one-group jackknife variance of the mean order value
  // over 10 md5-hash groups (the q61 portable bucketing; grpExpr is the
  // engine spelling of the 60-bit md5 prefix mod 10).
  private def jackknifeSql(grpExpr: String): String =
    s"""WITH g AS (
      |  SELECT $grpExpr AS grp,
      |    cast(round(o_totalprice, 2) as decimal(25,2)) AS v
      |  FROM orders),
      |pg AS (
      |  SELECT grp, cast(count(*) as bigint) AS n, sum(v) AS s
      |  FROM g GROUP BY grp),
      |tot AS (SELECT cast(sum(n) as bigint) AS nn, cast(sum(s) as decimal(30,2)) AS ss FROM pg),
      |loo AS (
      |  SELECT pg.grp,
      |    round(cast(tot.ss - pg.s as double) / (tot.nn - pg.n), 9) AS theta_i
      |  FROM pg CROSS JOIN tot),
      |jk AS (
      |  SELECT cast(count(*) as bigint) AS gcnt,
      |    cast(sum(cast(theta_i as decimal(20,9))) as double) AS s1,
      |    cast(sum(cast(round(theta_i * theta_i, 9) as decimal(25,9))) as double) AS s2
      |  FROM loo)
      |SELECT tot.nn AS n_orders, jk.gcnt AS n_groups,
      |  round(cast(tot.ss as double) / tot.nn, 6) + 0.0 AS mean_value,
      |  round(sqrt((jk.gcnt - 1.0) / jk.gcnt
      |    * (jk.s2 - jk.s1 * jk.s1 / jk.gcnt)), 6) + 0.0 AS jackknife_se
      |FROM jk CROSS JOIN tot""".stripMargin

  // q462 Mood's median test across event types: exact lower-median by
  // rank, 2xg contingency chi-square on above/at-or-below counts.
  private val moodsMedianSql =
    """WITH base AS (
      |  SELECT event_type AS g, cast(value as double) AS v
      |  FROM events WHERE value IS NOT NULL),
      |med AS (
      |  SELECT v AS m FROM (
      |    SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n
      |    FROM base) z
      |  WHERE rn = cast(floor((n + 1) / 2.0E0) as bigint)),
      |ct AS (
      |  SELECT b.g,
      |    cast(sum(CASE WHEN b.v > med.m THEN 1 ELSE 0 END) as bigint) AS a,
      |    cast(sum(CASE WHEN b.v <= med.m THEN 1 ELSE 0 END) as bigint) AS b
      |  FROM base b CROSS JOIN med GROUP BY b.g),
      |tot AS (
      |  SELECT cast(sum(a) as bigint) AS ta, cast(sum(b) as bigint) AS tb,
      |    cast(sum(a + b) as bigint) AS n, cast(count(*) as bigint) AS gcnt
      |  FROM ct)
      |SELECT tot.gcnt AS n_groups, cast(tot.gcnt - 1 as int) AS dof,
      |  round(cast(sum(cast(round(
      |      (ct.a - (ct.a + ct.b) * cast(tot.ta as double) / tot.n)
      |        * (ct.a - (ct.a + ct.b) * cast(tot.ta as double) / tot.n)
      |        / ((ct.a + ct.b) * cast(tot.ta as double) / tot.n)
      |    + (ct.b - (ct.a + ct.b) * cast(tot.tb as double) / tot.n)
      |        * (ct.b - (ct.a + ct.b) * cast(tot.tb as double) / tot.n)
      |        / ((ct.a + ct.b) * cast(tot.tb as double) / tot.n), 9)
      |    as decimal(25,9))) as double), 6) + 0.0 AS chi2
      |FROM ct CROSS JOIN tot GROUP BY tot.gcnt""".stripMargin

  // q463 Levene's test (mean-centered): one-way ANOVA F on |x - mean_g|,
  // group means from decimal-pinned folds.
  private val leveneSql =
    """WITH base AS (
      |  SELECT event_type AS g, cast(value as double) AS v
      |  FROM events WHERE value IS NOT NULL),
      |gm AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(v, 9) as decimal(30,9))) as double) / count(*) AS mu
      |  FROM base GROUP BY g),
      |z AS (
      |  SELECT b.g, abs(b.v - gm.mu) AS z
      |  FROM base b JOIN gm ON gm.g = b.g),
      |gz AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(z, 9) as decimal(30,9))) as double) AS s1,
      |    cast(sum(cast(round(z * z, 9) as decimal(30,9))) as double) AS s2
      |  FROM z GROUP BY g),
      |tot AS (
      |  SELECT cast(sum(n) as bigint) AS nn, cast(count(*) as bigint) AS k,
      |    cast(sum(cast(round(s1, 9) as decimal(30,9))) as double) AS ts1
      |  FROM gz),
      |parts AS (
      |  SELECT
      |    cast(sum(cast(round(gz.n * (gz.s1 / gz.n - tot.ts1 / tot.nn)
      |      * (gz.s1 / gz.n - tot.ts1 / tot.nn), 9) as decimal(30,9))) as double) AS ssb,
      |    cast(sum(cast(round(gz.s2 - gz.s1 * gz.s1 / gz.n, 9)
      |      as decimal(30,9))) as double) AS ssw,
      |    max(tot.nn) AS nn, max(tot.k) AS k
      |  FROM gz CROSS JOIN tot)
      |SELECT cast(k as int) AS n_groups, nn AS n_obs,
      |  round((ssb / (k - 1)) / (ssw / (nn - k)), 6) + 0.0 AS levene_f
      |FROM parts""".stripMargin

  // q464 PACF at lags 1-3 by the Durbin-Levinson closed form over the
  // q431-style biased autocovariances (round-9 pinned intermediates).
  private def pacfSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(y as bigint)) as double) / count(*) AS mu
       |  FROM daily),
       |x AS (
       |  SELECT daily.y - m.mu AS x,
       |    lag(daily.y - m.mu, 1) OVER (ORDER BY daily.d) AS x1,
       |    lag(daily.y - m.mu, 2) OVER (ORDER BY daily.d) AS x2,
       |    lag(daily.y - m.mu, 3) OVER (ORDER BY daily.d) AS x3
       |  FROM daily CROSS JOIN m),
       |cv AS (
       |  SELECT
       |    cast(sum(cast(round(x * x, 6) as decimal(25,6))) as double) AS c0,
       |    cast(sum(cast(round(CASE WHEN x1 IS NOT NULL THEN x * x1 ELSE 0.0E0 END, 6)
       |      as decimal(25,6))) as double) AS c1,
       |    cast(sum(cast(round(CASE WHEN x2 IS NOT NULL THEN x * x2 ELSE 0.0E0 END, 6)
       |      as decimal(25,6))) as double) AS c2,
       |    cast(sum(cast(round(CASE WHEN x3 IS NOT NULL THEN x * x3 ELSE 0.0E0 END, 6)
       |      as decimal(25,6))) as double) AS c3
       |  FROM x),
       |r AS (
       |  SELECT round(c1 / c0, 9) AS r1, round(c2 / c0, 9) AS r2,
       |    round(c3 / c0, 9) AS r3
       |  FROM cv),
       |p2 AS (
       |  SELECT r1, r2, r3,
       |    round((r2 - r1 * r1) / (1 - r1 * r1), 9) AS phi22
       |  FROM r),
       |p2b AS (
       |  SELECT r1, r2, r3, phi22,
       |    round(r1 * (1 - phi22), 9) AS phi21
       |  FROM p2)
       |SELECT r1 + 0.0 AS pacf1, phi22 + 0.0 AS pacf2,
       |  round((r3 - phi21 * r2 - phi22 * r1)
       |    / (1 - phi21 * r1 - phi22 * r2), 6) + 0.0 AS pacf3
       |FROM p2b""".stripMargin

  // q465 STL-lite decomposition strengths: 7-day centered-MA trend,
  // day-of-week seasonal means on the detrended interior, and the
  // Hyndman trend/seasonal strength statistics from pinned variances.
  private def stlStrengthSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |ma AS (
       |  SELECT d, y, cast(d % 7 as int) AS dow,
       |    avg(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tr,
       |    count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
       |  FROM daily),
       |dt AS (SELECT d, dow, y, tr, y - tr AS det FROM ma WHERE w = 7),
       |sea AS (
       |  SELECT dow,
       |    round(cast(sum(cast(round(det, 9) as decimal(25,9))) as double)
       |      / count(*), 9) AS s
       |  FROM dt GROUP BY dow),
       |r AS (
       |  SELECT dt.det, dt.det - sea.s AS rem, sea.s
       |  FROM dt JOIN sea ON sea.dow = dt.dow),
       |v AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(rem, 9) as decimal(25,9))) as double) AS sr,
       |    cast(sum(cast(round(rem * rem, 9) as decimal(25,9))) as double) AS srr,
       |    cast(sum(cast(round(det, 9) as decimal(25,9))) as double) AS sd,
       |    cast(sum(cast(round(det * det, 9) as decimal(25,9))) as double) AS sdd,
       |    cast(sum(cast(round(s + rem, 9) as decimal(25,9))) as double) AS ssr,
       |    cast(sum(cast(round((s + rem) * (s + rem), 9) as decimal(25,9))) as double) AS ssrr
       |  FROM r)
       |SELECT n AS n_interior,
       |  round(greatest(0.0E0, 1 - (srr / n - (sr / n) * (sr / n))
       |    / (sdd / n - (sd / n) * (sd / n))), 6) + 0.0 AS seasonal_strength,
       |  round(greatest(0.0E0, 1 - (srr / n - (sr / n) * (sr / n))
       |    / (ssrr / n - (ssr / n) * (ssr / n))), 6) + 0.0 AS trend_strength,
       |  round(srr / n - (sr / n) * (sr / n), 6) + 0.0 AS var_remainder
       |FROM v""".stripMargin

  // q466 Otsu's threshold over a 50-bin order-value histogram: maximize
  // between-class variance from exact cumulative sums (tie -> lower bin).
  private val otsuSql =
    """WITH rng AS (
      |  SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
      |h AS (
      |  SELECT cast(least(floor((o.o_totalprice - r.mn) / (r.mx - r.mn) * 50.0E0),
      |    49.0E0) as int) AS b,
      |    cast(count(*) as bigint) AS c,
      |    sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) AS s
      |  FROM orders o CROSS JOIN rng r GROUP BY 1),
      |cum AS (
      |  SELECT b,
      |    sum(c) OVER (ORDER BY b) AS w0,
      |    sum(s) OVER (ORDER BY b) AS s0
      |  FROM h),
      |tot AS (SELECT cast(sum(c) as bigint) AS n, sum(s) AS st FROM h),
      |bv AS (
      |  SELECT cum.b,
      |    round(cast(cum.w0 as double) * (tot.n - cum.w0)
      |      * (cast(cum.s0 as double) / cum.w0
      |         - cast(tot.st - cum.s0 as double) / (tot.n - cum.w0))
      |      * (cast(cum.s0 as double) / cum.w0
      |         - cast(tot.st - cum.s0 as double) / (tot.n - cum.w0))
      |      / (cast(tot.n as double) * tot.n), 4) AS v
      |  FROM cum CROSS JOIN tot WHERE cum.w0 > 0 AND cum.w0 < tot.n),
      |pick AS (
      |  SELECT b, v, row_number() OVER (ORDER BY v DESC, b) AS rk FROM bv)
      |SELECT pick.b AS threshold_bin,
      |  round(r.mn + (pick.b + 1) * (r.mx - r.mn) / 50.0E0, 4) + 0.0
      |    AS threshold_value,
      |  pick.v + 0.0 AS between_var
      |FROM pick CROSS JOIN rng r WHERE pick.rk = 1""".stripMargin

  // q467 Borda-count rank aggregation of the q445 nation rankings:
  // consensus = sum of (k - rank) points, ties on nation key.
  private val bordaSql =
    """WITH cc AS (SELECT c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM customer GROUP BY 1),
      |ab AS (SELECT c_nationkey AS nk,
      |    sum(cast(round(c_acctbal, 2) as decimal(20,2))) AS v
      |  FROM customer GROUP BY 1),
      |oc AS (SELECT c.c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1),
      |r1 AS (SELECT cc.nk, row_number() OVER (ORDER BY cc.v DESC, cc.nk) AS r
      |  FROM cc JOIN oc ON oc.nk = cc.nk),
      |r2 AS (SELECT ab.nk, row_number() OVER (ORDER BY ab.v DESC, ab.nk) AS r
      |  FROM ab JOIN oc ON oc.nk = ab.nk),
      |r3 AS (SELECT nk, row_number() OVER (ORDER BY v DESC, nk) AS r FROM oc),
      |k AS (SELECT cast(count(*) as bigint) AS k FROM r3),
      |s AS (
      |  SELECT r1.nk, 3 * k.k - r1.r - r2.r - r3.r AS borda
      |  FROM r1 JOIN r2 ON r2.nk = r1.nk JOIN r3 ON r3.nk = r1.nk CROSS JOIN k)
      |SELECT cast(nk as int) AS nation, cast(borda as bigint) AS borda_score,
      |  cast(row_number() OVER (ORDER BY borda DESC, nk) as int) AS consensus_rank
      |FROM s ORDER BY consensus_rank""".stripMargin

  // q468 3-truss peeling over the category co-purchase graph: edge
  // support = common-neighbor count; edges with support 0 peel off, two
  // bounded rounds unrolled (the full fixpoint is iteration of the same
  // step; counts per round expose the convergence trajectory).
  private def trussSql(rounds: Int = 2): String = {
    val steps = (1 to rounds).map { r =>
      val prev = s"e${r - 1}"
      s""",
s$r AS (SELECT u AS x, v AS y FROM $prev UNION ALL SELECT v AS x, u AS y FROM $prev),
sup$r AS (
  SELECT e.u, e.v, cast(count(b.y) as bigint) AS sup
  FROM $prev e
  LEFT JOIN s$r a ON a.x = e.u
  LEFT JOIN s$r b ON b.x = e.v AND b.y = a.y
  GROUP BY e.u, e.v),
e$r AS (SELECT u, v FROM sup$r WHERE sup >= 1)"""
    }.mkString
    val unions = (1 to rounds).map(r =>
      s"SELECT $r AS round, cast(count(*) as bigint) AS n_edges FROM e$r").mkString(" UNION ALL ")
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 50 AS i FROM lineitem),
e0 AS (
  SELECT DISTINCT a.i AS u, b2.i AS v
  FROM b a JOIN b b2 ON b2.o = a.o AND b2.i > a.i)$steps,
base AS (SELECT 0 AS round, cast(count(*) as bigint) AS n_edges FROM e0)
SELECT round, n_edges FROM (SELECT * FROM base UNION ALL $unions) z
ORDER BY round"""
  }

  // q469 renewal-process diagnostics of inter-purchase gaps: pooled
  // per-user gap mean/CV (CV = 1 under Poisson) + exact rank quantiles.
  private def renewalSql(micros: String => String, idiv: String): String =
    s"""WITH p AS (
       |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
       |g AS (
       |  SELECT (${micros("ts")} - ${micros("prev")}) $idiv 3600000000 AS hrs
       |  FROM (
       |    SELECT ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
       |    FROM p) z
       |  WHERE prev IS NOT NULL),
       |s AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(hrs) as bigint) AS s1,
       |    cast(sum(hrs * hrs) as bigint) AS s2
       |  FROM g),
       |q AS (
       |  SELECT
       |    max(CASE WHEN rn = cast(floor((n + 1) / 2.0E0) as bigint) THEN hrs END) AS p50,
       |    max(CASE WHEN rn = cast(floor((n * 9 + 9) / 10.0E0) as bigint) THEN hrs END) AS p90
       |  FROM (SELECT hrs, row_number() OVER (ORDER BY hrs) AS rn,
       |          count(*) OVER () AS n FROM g) z)
       |SELECT s.n AS n_gaps,
       |  round(cast(s.s1 as double) / s.n, 6) + 0.0 AS mean_hrs,
       |  round(sqrt((cast(s.s2 as double) - cast(s.s1 as double) * s.s1 / s.n)
       |    / (s.n - 1)) / (cast(s.s1 as double) / s.n), 6) + 0.0 AS cv,
       |  cast(q.p50 as bigint) AS p50_hrs, cast(q.p90 as bigint) AS p90_hrs
       |FROM s CROSS JOIN q""".stripMargin

  // q470 Weibull fit by median-rank regression over the observed
  // signup->purchase durations: OLS of ln(-ln(1-F_i)) on ln t_i with
  // Bernard's approximation F_i = (i-0.3)/(n+0.4); shape = slope,
  // scale = exp(-intercept/shape).
  private def weibullSql(micros: String => String, idiv: String): String =
    s"""WITH s AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |p AS (
       |  SELECT e.user_id, min(e.ts) AS t1
       |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
       |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
       |dur AS (
       |  SELECT (${micros("p.t1")} - ${micros("s.t0")}) $idiv 3600000000 AS hrs
       |  FROM p JOIN s ON s.user_id = p.user_id),
       |rk AS (
       |  SELECT cast(hrs as double) AS t,
       |    row_number() OVER (ORDER BY hrs) AS i, count(*) OVER () AS n
       |  FROM dur WHERE hrs > 0),
       |xy AS (
       |  SELECT round(ln(t), 9) AS x,
       |    round(ln(-ln(1 - (i - 0.3E0) / (n + 0.4E0))), 9) AS y
       |  FROM rk),
       |f AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(x as decimal(20,9))) as double) AS sx,
       |    cast(sum(cast(y as decimal(20,9))) as double) AS sy,
       |    cast(sum(cast(round(x * y, 9) as decimal(25,9))) as double) AS sxy,
       |    cast(sum(cast(round(x * x, 9) as decimal(25,9))) as double) AS sxx
       |  FROM xy),
       |co AS (
       |  SELECT n, round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS shape,
       |    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9) AS icpt
       |  FROM f)
       |SELECT n AS n_obs, shape + 0.0 AS weibull_shape,
       |  round(exp(-icpt / shape), 6) + 0.0 AS weibull_scale_hrs
       |FROM co""".stripMargin

  // q471 XmR (individuals + moving range) control chart over daily
  // counts: UCL/LCL = mean +- 2.66 * mean moving range, out-of-control
  // census from exact integer folds.
  private def xmrSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1),
       |mr AS (
       |  SELECT d, y, abs(y - lag(y) OVER (ORDER BY d)) AS r
       |  FROM daily),
       |s AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(y) as bigint) AS sy,
       |    cast(sum(r) as bigint) AS sr,
       |    cast(count(r) as bigint) AS nr
       |  FROM mr),
       |lim AS (
       |  SELECT n, cast(sy as double) / n AS ybar,
       |    cast(sr as double) / nr AS mrbar,
       |    cast(sy as double) / n + 2.66E0 * cast(sr as double) / nr AS ucl,
       |    cast(sy as double) / n - 2.66E0 * cast(sr as double) / nr AS lcl
       |  FROM s)
       |SELECT lim.n AS n_days,
       |  round(lim.ybar, 6) + 0.0 AS center,
       |  round(lim.mrbar, 6) + 0.0 AS mr_bar,
       |  round(lim.ucl, 6) + 0.0 AS ucl,
       |  round(lim.lcl, 6) + 0.0 AS lcl,
       |  cast(sum(CASE WHEN daily.y > lim.ucl OR daily.y < lim.lcl
       |    THEN 1 ELSE 0 END) as bigint) AS n_out_of_control
       |FROM daily CROSS JOIN lim
       |GROUP BY lim.n, lim.ybar, lim.mrbar, lim.ucl, lim.lcl""".stripMargin

  // q472 restricted mean survival time at tau = 336 h (14 d): the
  // step-function integral of the q287 Kaplan-Meier curve, segment
  // products decimal-pinned.
  private def rmstSql(micros: String => String, idiv: String): String =
    s"""WITH s AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |p AS (
       |  SELECT e.user_id, min(e.ts) AS t1
       |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
       |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
       |mx AS (SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
       |dur AS (
       |  SELECT s.user_id,
       |    CASE WHEN p.t1 IS NOT NULL
       |      THEN (${micros("p.t1")} - ${micros("s.t0")}) $idiv 3600000000
       |      ELSE (${micros("mx.tmax")} - ${micros("s.t0")}) $idiv 3600000000 END AS hrs,
       |    (p.t1 IS NOT NULL) AS observed
       |  FROM s JOIN mx ON s.user_id = mx.user_id
       |  LEFT JOIN p ON s.user_id = p.user_id),
       |ev AS (
       |  SELECT hrs,
       |    cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
       |    cast(count(*) as bigint) AS leaving
       |  FROM dur GROUP BY hrs),
       |rk AS (
       |  SELECT hrs, d, sum(leaving) OVER (ORDER BY hrs DESC) AS n_risk
       |  FROM ev),
       |km AS (
       |  SELECT hrs, d, n_risk,
       |    sum(CASE WHEN d > 0 AND d < n_risk
       |      THEN cast(round(ln(1.0 - cast(d as double) / n_risk), 9) as decimal(20,9))
       |      ELSE cast(0 as decimal(20,9)) END)
       |      OVER (ORDER BY hrs) AS logs,
       |    max(CASE WHEN d > 0 AND d = n_risk THEN 1 ELSE 0 END)
       |      OVER (ORDER BY hrs) AS extinct
       |  FROM rk),
       |curve AS (
       |  SELECT hrs,
       |    round(CASE WHEN extinct = 1 THEN 0.0
       |      ELSE exp(cast(logs as double)) END, 9) AS surv
       |  FROM km WHERE d > 0),
       |seg AS (
       |  SELECT hrs, surv,
       |    coalesce(lag(hrs) OVER (ORDER BY hrs), 0) AS ph,
       |    coalesce(lag(surv) OVER (ORDER BY hrs), 1.0E0) AS ps
       |  FROM curve),
       |body AS (
       |  SELECT cast(sum(cast(round(
       |      ps * (least(cast(hrs as double), 336.0E0) - least(cast(ph as double), 336.0E0)),
       |      9) as decimal(25,9))) as double) AS area
       |  FROM seg),
       |tail AS (
       |  SELECT round(surv * (336.0E0 - least(cast(hrs as double), 336.0E0)), 9) AS t
       |  FROM (SELECT hrs, surv,
       |          row_number() OVER (ORDER BY hrs DESC) AS rk FROM curve) z
       |  WHERE rk = 1)
       |SELECT 336 AS tau_hrs,
       |  round(body.area + tail.t, 6) + 0.0 AS rmst_hrs
       |FROM body CROSS JOIN tail""".stripMargin

  // q473 unseen-vocabulary estimators per source: Chao1 richness
  // (singleton/doubleton) and the Good-Turing unseen probability mass.
  private def chao1Sql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |src AS (SELECT doc_id, source FROM documents WHERE source IS NOT NULL),
       |wc AS (
       |  SELECT s.source, t.word, cast(count(*) as bigint) AS c
       |  FROM tokp t JOIN src s ON s.doc_id = t.doc_id
       |  GROUP BY s.source, t.word),
       |agg AS (
       |  SELECT source, cast(count(*) as bigint) AS v,
       |    cast(sum(c) as bigint) AS n,
       |    cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) as bigint) AS f1,
       |    cast(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) as bigint) AS f2
       |  FROM wc GROUP BY source)
       |SELECT source, v AS vocab, n AS n_tokens, f1, f2,
       |  round(CASE WHEN f2 > 0
       |    THEN v + cast(f1 as double) * f1 / (2.0E0 * f2)
       |    ELSE v + cast(f1 as double) * (f1 - 1) / 2.0E0 END, 4) + 0.0 AS chao1,
       |  round(cast(f1 as double) / n, 6) + 0.0 AS gt_unseen_mass
       |FROM agg ORDER BY source""".stripMargin

  // q474 Chapman capture-recapture estimate of total vocabulary from
  // two word samples (even vs odd doc ids) — the mark-recapture twin of
  // q473's Chao1.
  private def chapmanSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |a AS (SELECT DISTINCT word FROM tokp WHERE doc_id % 2 = 0),
       |b AS (SELECT DISTINCT word FROM tokp WHERE doc_id % 2 = 1),
       |m AS (SELECT cast(count(*) as bigint) AS m
       |      FROM a JOIN b ON b.word = a.word),
       |s AS (
       |  SELECT (SELECT cast(count(*) as bigint) FROM a) AS n1,
       |    (SELECT cast(count(*) as bigint) FROM b) AS n2,
       |    m.m FROM m)
       |SELECT n1, n2, m AS n_recaptured,
       |  round((n1 + 1.0E0) * (n2 + 1.0E0) / (m + 1.0E0) - 1, 4) + 0.0
       |    AS chapman_vocab,
       |  round(sqrt((n1 + 1.0E0) * (n2 + 1.0E0) * (n1 - m) * (n2 - m)
       |    / ((m + 1.0E0) * (m + 1.0E0) * (m + 2.0E0))), 4) + 0.0 AS chapman_se
       |FROM s""".stripMargin

  // q475 one-way random-effects ICC(1,1) of per-(user, day) activity:
  // MSB/MSW from exact integer folds, unbalanced k0 correction.
  private def iccSql(dayNum: String => String): String =
    s"""WITH m AS (
       |  SELECT user_id, ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1, 2),
       |g AS (
       |  SELECT user_id, cast(count(*) as bigint) AS n,
       |    cast(sum(y) as bigint) AS s1, cast(sum(y * y) as bigint) AS s2
       |  FROM m GROUP BY user_id),
       |tot AS (
       |  SELECT cast(sum(n) as bigint) AS nn, cast(count(*) as bigint) AS gc,
       |    cast(sum(s1) as bigint) AS ts1, cast(sum(s2) as bigint) AS ts2,
       |    cast(sum(n * n) as bigint) AS sn2
       |  FROM g),
       |ss AS (
       |  SELECT tot.nn, tot.gc,
       |    cast(sum(cast(round(cast(g.s1 as double) * g.s1 / g.n, 9)
       |      as decimal(30,9))) as double)
       |      - cast(tot.ts1 as double) * tot.ts1 / tot.nn AS ssb,
       |    cast(tot.ts2 as double)
       |      - cast(sum(cast(round(cast(g.s1 as double) * g.s1 / g.n, 9)
       |        as decimal(30,9))) as double) AS ssw,
       |    (tot.nn - cast(tot.sn2 as double) / tot.nn) / (tot.gc - 1) AS k0
       |  FROM g CROSS JOIN tot GROUP BY tot.nn, tot.gc, tot.ts1, tot.ts2, tot.sn2)
       |SELECT gc AS n_users, nn AS n_measurements,
       |  round(k0, 6) + 0.0 AS k0,
       |  round((ssb / (gc - 1) - ssw / (nn - gc))
       |    / (ssb / (gc - 1) + (k0 - 1) * (ssw / (nn - gc))), 6) + 0.0 AS icc_1_1
       |FROM ss""".stripMargin

  // q476 seasonal Mann-Kendall trend test over daily counts by
  // day-of-week season: exact pair sign sums, tie-corrected variance,
  // continuity-corrected Z.
  private def seasonalMkSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(${dayNum("ts")} % 7 as int) AS dow,
       |    cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.dow,
       |    cast(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)
       |      as bigint) AS s
       |  FROM daily a JOIN daily b ON b.dow = a.dow AND b.d > a.d
       |  GROUP BY a.dow),
       |ns AS (SELECT dow, cast(count(*) as bigint) AS n FROM daily GROUP BY dow),
       |ties AS (
       |  SELECT dow, cast(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) as bigint) AS tc
       |  FROM (SELECT dow, y, cast(count(*) as bigint) AS t
       |        FROM daily GROUP BY dow, y) z
       |  WHERE t > 1 GROUP BY dow),
       |agg AS (
       |  SELECT cast(sum(p.s) as bigint) AS s,
       |    cast(sum(ns.n * (ns.n - 1) * (2 * ns.n + 5) - coalesce(t.tc, 0)) as double)
       |      / 18.0E0 AS var_s
       |  FROM pairs p JOIN ns ON ns.dow = p.dow
       |  LEFT JOIN ties t ON t.dow = p.dow)
       |SELECT s AS mk_s, round(var_s, 6) + 0.0 AS var_s,
       |  round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
       |             WHEN s < 0 THEN (s + 1) / sqrt(var_s)
       |             ELSE 0.0E0 END, 6) + 0.0 AS mk_z
       |FROM agg""".stripMargin

  // q477 turning-point randomness test: strict local extrema census,
  // E = 2(n-2)/3, Var = (16n-29)/90.
  private def turningPointSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1),
       |w AS (
       |  SELECT y,
       |    lag(y) OVER (ORDER BY d) AS yp,
       |    lead(y) OVER (ORDER BY d) AS yn
       |  FROM daily),
       |s AS (
       |  SELECT cast(count(*) as bigint) + 2 AS n,
       |    cast(sum(CASE WHEN (y - yp) * (y - yn) > 0 THEN 1 ELSE 0 END)
       |      as bigint) AS tp
       |  FROM w WHERE yp IS NOT NULL AND yn IS NOT NULL)
       |SELECT n AS n_days, tp AS turning_points,
       |  round(2.0E0 * (n - 2) / 3.0E0, 6) + 0.0 AS expected_tp,
       |  round((tp - 2.0E0 * (n - 2) / 3.0E0)
       |    / sqrt((16.0E0 * n - 29) / 90.0E0), 6) + 0.0 AS tp_z
       |FROM s""".stripMargin

  // q478 Spiegelhalter's calibration Z on the q456 split: grouped exact
  // folds of (y - p)(1 - 2p) against the null variance.
  private val spiegelhalterSql =
    """WITH tr AS (
      |  SELECT o_orderpriority AS g,
      |    round(cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as double)
      |      / count(*), 9) AS p
      |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
      |te AS (
      |  SELECT o_orderpriority AS g, cast(count(*) as bigint) AS n,
      |    cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) AS o
      |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1),
      |f AS (
      |  SELECT
      |    cast(sum(cast(round((te.o - te.n * tr.p) * (1 - 2 * tr.p), 9)
      |      as decimal(25,9))) as double) AS num,
      |    cast(sum(cast(round(te.n * (1 - 2 * tr.p) * (1 - 2 * tr.p)
      |      * tr.p * (1 - tr.p), 9) as decimal(25,9))) as double) AS den,
      |    cast(sum(te.n) as bigint) AS n_test
      |  FROM te JOIN tr ON tr.g = te.g)
      |SELECT n_test, round(num / sqrt(den), 6) + 0.0 AS spiegelhalter_z
      |FROM f""".stripMargin

  // q479 distance correlation between day index and daily count: doubly
  // centered distance matrices over the full n^2 pair table (n = days —
  // metadata-sized; the pair table never touches raw events).
  private def dcorSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1),
       |pts AS (
       |  SELECT cast(row_number() OVER (ORDER BY d) as bigint) AS i, y FROM daily),
       |pr AS (
       |  SELECT a.i AS j, b.i AS k,
       |    cast(abs(a.i - b.i) as double) AS da,
       |    cast(abs(a.y - b.y) as double) AS db
       |  FROM pts a CROSS JOIN pts b),
       |rm AS (
       |  SELECT j, cast(sum(cast(da as decimal(20,4))) as double) / count(*) AS ra,
       |    cast(sum(cast(db as decimal(20,4))) as double) / count(*) AS rb
       |  FROM pr GROUP BY j),
       |gm AS (
       |  SELECT cast(sum(cast(da as decimal(25,4))) as double) / count(*) AS ga,
       |    cast(sum(cast(db as decimal(25,4))) as double) / count(*) AS gb
       |  FROM pr),
       |cen AS (
       |  SELECT round(pr.da - rj.ra - rk.ra + gm.ga, 9) AS ca,
       |    round(pr.db - rj.rb - rk.rb + gm.gb, 9) AS cb
       |  FROM pr JOIN rm rj ON rj.j = pr.j JOIN rm rk ON rk.j = pr.k
       |  CROSS JOIN gm),
       |mom AS (
       |  SELECT cast(count(*) as bigint) AS n2,
       |    cast(sum(cast(round(ca * cb, 9) as decimal(25,9))) as double) AS sxy,
       |    cast(sum(cast(round(ca * ca, 9) as decimal(25,9))) as double) AS sxx,
       |    cast(sum(cast(round(cb * cb, 9) as decimal(25,9))) as double) AS syy
       |  FROM cen)
       |SELECT n2 AS n_pairs,
       |  round(sqrt(greatest(sxy, 0.0E0) / sqrt(sxx * syy)), 6) + 0.0 AS dcor
       |FROM mom""".stripMargin

  // q480 log-rank test between even/odd user cohorts over the q287
  // durations: per pooled event time, hypergeometric O-E and variance
  // from at-risk counts (range join over the metadata-sized time list).
  private def logRankSql(micros: String => String, idiv: String): String =
    s"""WITH s AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |p AS (
       |  SELECT e.user_id, min(e.ts) AS t1
       |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
       |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
       |mx AS (SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
       |dur AS (
       |  SELECT s.user_id, cast(s.user_id % 2 as int) AS grp,
       |    CASE WHEN p.t1 IS NOT NULL
       |      THEN (${micros("p.t1")} - ${micros("s.t0")}) $idiv 3600000000
       |      ELSE (${micros("mx.tmax")} - ${micros("s.t0")}) $idiv 3600000000 END AS hrs,
       |    (p.t1 IS NOT NULL) AS observed
       |  FROM s JOIN mx ON s.user_id = mx.user_id
       |  LEFT JOIN p ON s.user_id = p.user_id),
       |ev AS (
       |  SELECT hrs, grp,
       |    cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
       |    cast(count(*) as bigint) AS leaving
       |  FROM dur GROUP BY hrs, grp),
       |times AS (
       |  SELECT hrs, cast(sum(d) as bigint) AS dt
       |  FROM ev GROUP BY hrs HAVING sum(d) > 0),
       |risk AS (
       |  SELECT t.hrs, t.dt,
       |    cast(sum(ev.leaving) as bigint) AS nt,
       |    cast(sum(CASE WHEN ev.grp = 1 THEN ev.leaving ELSE 0 END) as bigint) AS n1,
       |    cast(sum(CASE WHEN ev.grp = 1 AND ev.hrs = t.hrs THEN ev.d ELSE 0 END)
       |      as bigint) AS d1
       |  FROM times t JOIN ev ON ev.hrs >= t.hrs
       |  GROUP BY t.hrs, t.dt),
       |f AS (
       |  SELECT
       |    cast(sum(d1) as bigint) AS o1,
       |    cast(sum(cast(round(dt * cast(n1 as double) / nt, 9)
       |      as decimal(25,9))) as double) AS e1,
       |    cast(sum(cast(round(CASE WHEN nt > 1
       |      THEN dt * (cast(n1 as double) / nt) * (1 - cast(n1 as double) / nt)
       |        * (nt - dt) / (nt - 1.0E0) ELSE 0.0E0 END, 9)
       |      as decimal(25,9))) as double) AS v
       |  FROM risk)
       |SELECT o1 AS observed_g1, round(e1, 6) + 0.0 AS expected_g1,
       |  round((o1 - e1) * (o1 - e1) / v, 6) + 0.0 AS logrank_chi2
       |FROM f""".stripMargin

  // q481 seasonal-hybrid ESD: the q465 STL-lite residual (7-day MA trend
  // + dow seasonal means) peeled by two unrolled max-|z| rounds.
  private def shEsdSql(dayNum: String => String, rounds: Int = 2): String = {
    val steps = (1 to rounds).map { i =>
      val prev = s"rem${i - 1}"
      s""",
st$i AS (
  SELECT cast(count(*) as bigint) AS n,
    cast(sum(cast(round(rr, 9) as decimal(25,9))) as double) AS s1,
    cast(sum(cast(round(rr * rr, 9) as decimal(25,9))) as double) AS s2
  FROM $prev),
z$i AS (
  SELECT r.d, r.rr,
    abs(r.rr - s.s1 / s.n) / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS r_stat
  FROM $prev r CROSS JOIN st$i s),
pick$i AS (
  SELECT $i AS peel_round, d, round(rr, 6) AS residual, round(r_stat, 6) AS r_stat
  FROM z$i ORDER BY r_stat DESC, d LIMIT 1),
rem$i AS (
  SELECT r.d, r.rr FROM $prev r
  WHERE r.d NOT IN (SELECT d FROM pick$i))"""
    }.mkString
    val union = (1 to rounds).map(i => s"SELECT * FROM pick$i").mkString(" UNION ALL ")
    s"""WITH daily AS (
  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
  FROM events GROUP BY 1),
ma AS (
  SELECT d, y, cast(d % 7 as int) AS dow,
    avg(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tr,
    count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
  FROM daily),
dt AS (SELECT d, dow, y - tr AS det FROM ma WHERE w = 7),
sea AS (
  SELECT dow,
    round(cast(sum(cast(round(det, 9) as decimal(25,9))) as double)
      / count(*), 9) AS s
  FROM dt GROUP BY dow),
rem0 AS (
  SELECT dt.d, round(dt.det - sea.s, 9) AS rr
  FROM dt JOIN sea ON sea.dow = dt.dow)$steps
SELECT cast(peel_round as int) AS peel_round, cast(d as bigint) AS day_id,
  residual + 0.0 AS residual, r_stat + 0.0 AS r_stat
FROM ($union) z ORDER BY peel_round"""
  }

  // q482 synthetic-control-lite lift for nation 0: donor weights
  // inverse-distance on pre-period (1995-1997) yearly revenue, synthetic
  // post = weighted donor average, lift = actual - synthetic.
  private def synthControlSql(year: String => String): String =
    s"""WITH rev AS (
       |  SELECT c.c_nationkey AS nk, ${year("o.o_orderdate")} AS yr,
       |    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double) AS r
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  GROUP BY 1, 2),
       |pre AS (SELECT nk, yr, r FROM rev WHERE yr < 1998),
       |post AS (
       |  SELECT nk, cast(sum(cast(round(r, 2) as decimal(25,2))) as double) AS r
       |  FROM rev WHERE yr >= 1998 GROUP BY nk),
       |t_pre AS (SELECT yr, r FROM pre WHERE nk = 0),
       |dist AS (
       |  SELECT p.nk,
       |    cast(sum(cast(round((p.r - t.r) * (p.r - t.r), 2) as decimal(30,2)))
       |      as double) AS d2
       |  FROM pre p JOIN t_pre t ON t.yr = p.yr
       |  WHERE p.nk <> 0 GROUP BY p.nk),
       |w AS (
       |  SELECT nk, round(1.0E0 / (1.0E0 + sqrt(d2)), 12) AS w FROM dist),
       |wn AS (
       |  SELECT w.nk, round(w.w / t.sw, 12) AS w
       |  FROM w CROSS JOIN (
       |    SELECT cast(sum(cast(w as decimal(25,12))) as double) AS sw FROM w) t),
       |syn AS (
       |  SELECT cast(sum(cast(round(wn.w * post.r, 6) as decimal(30,6))) as double)
       |    AS synthetic
       |  FROM wn JOIN post ON post.nk = wn.nk),
       |act AS (SELECT r FROM post WHERE nk = 0),
       |topw AS (
       |  SELECT nk, w FROM (
       |    SELECT nk, w, row_number() OVER (ORDER BY w DESC, nk) AS rk FROM wn) z
       |  WHERE rk = 1)
       |SELECT round(act.r, 2) + 0.0 AS actual_post,
       |  round(syn.synthetic, 2) + 0.0 AS synthetic_post,
       |  round(act.r - syn.synthetic, 2) + 0.0 AS lift,
       |  cast(topw.nk as int) AS top_donor,
       |  round(topw.w, 6) + 0.0 AS top_donor_weight
       |FROM act CROSS JOIN syn CROSS JOIN topw""".stripMargin

  // q483 Fellegi-Sunter probabilistic linkage over the q452 blocked
  // candidates: 3 binary comparison fields (levenshtein<=1, equal
  // length, same second word), EM for (p, m_k, u_k) unrolled `iters`
  // rounds from literal starts, every update round-9 pinned. Output =
  // the 8 agreement patterns with final match probabilities.
  private def fellegiSunterSql(iters: Int = 2): String = {
    def mTerm(pp: String) =
      s"""(CASE WHEN g1 = 1 THEN $pp.m1 ELSE 1 - $pp.m1 END)
         | * (CASE WHEN g2 = 1 THEN $pp.m2 ELSE 1 - $pp.m2 END)
         | * (CASE WHEN g3 = 1 THEN $pp.m3 ELSE 1 - $pp.m3 END)""".stripMargin
    def uTerm(pp: String) =
      s"""(CASE WHEN g1 = 1 THEN $pp.u1 ELSE 1 - $pp.u1 END)
         | * (CASE WHEN g2 = 1 THEN $pp.u2 ELSE 1 - $pp.u2 END)
         | * (CASE WHEN g3 = 1 THEN $pp.u3 ELSE 1 - $pp.u3 END)""".stripMargin
    val steps = (1 to iters).map { k =>
      val pp = s"par${k - 1}"
      s""",
w$k AS (
  SELECT pat.g1, pat.g2, pat.g3, pat.n,
    round($pp.p * ${mTerm(pp)}
      / ($pp.p * ${mTerm(pp)}
         + (1 - $pp.p) * ${uTerm(pp)}), 9) AS w
  FROM pat CROSS JOIN $pp),
par$k AS (
  SELECT
    round(cast(sum(cast(round(n * w, 9) as decimal(30,9))) as double)
      / sum(n), 9) AS p,
    round(cast(sum(cast(round(n * w * g1, 9) as decimal(30,9))) as double)
      / cast(sum(cast(round(n * w, 9) as decimal(30,9))) as double), 9) AS m1,
    round(cast(sum(cast(round(n * w * g2, 9) as decimal(30,9))) as double)
      / cast(sum(cast(round(n * w, 9) as decimal(30,9))) as double), 9) AS m2,
    round(cast(sum(cast(round(n * w * g3, 9) as decimal(30,9))) as double)
      / cast(sum(cast(round(n * w, 9) as decimal(30,9))) as double), 9) AS m3,
    round(cast(sum(cast(round(n * (1 - w) * g1, 9) as decimal(30,9))) as double)
      / cast(sum(cast(round(n * (1 - w), 9) as decimal(30,9))) as double), 9) AS u1,
    round(cast(sum(cast(round(n * (1 - w) * g2, 9) as decimal(30,9))) as double)
      / cast(sum(cast(round(n * (1 - w), 9) as decimal(30,9))) as double), 9) AS u2,
    round(cast(sum(cast(round(n * (1 - w) * g3, 9) as decimal(30,9))) as double)
      / cast(sum(cast(round(n * (1 - w), 9) as decimal(30,9))) as double), 9) AS u3
  FROM w$k)"""
    }.mkString
    s"""WITH p0 AS (
  SELECT p_partkey AS id, p_name, split_part(p_name, ' ', 1) AS blk,
    split_part(p_name, ' ', 2) AS w2, length(p_name) AS ln
  FROM part WHERE p_partkey < 600),
cand AS (
  SELECT CASE WHEN levenshtein(a.p_name, b.p_name) <= 1 THEN 1 ELSE 0 END AS g1,
    CASE WHEN a.ln = b.ln THEN 1 ELSE 0 END AS g2,
    CASE WHEN a.w2 = b.w2 THEN 1 ELSE 0 END AS g3
  FROM p0 a JOIN p0 b ON b.blk = a.blk AND b.id > a.id),
pat AS (
  SELECT g1, g2, g3, cast(count(*) as bigint) AS n
  FROM cand GROUP BY g1, g2, g3),
par0 AS (SELECT 0.3E0 AS p, 0.8E0 AS m1, 0.8E0 AS m2, 0.8E0 AS m3,
  0.2E0 AS u1, 0.2E0 AS u2, 0.2E0 AS u3)$steps
SELECT w.g1, w.g2, w.g3, w.n, w.w + 0.0 AS match_prob,
  round(par$iters.p, 6) + 0.0 AS em_p,
  round(par$iters.m1, 6) + 0.0 AS em_m1,
  round(par$iters.u1, 6) + 0.0 AS em_u1
FROM w$iters w CROSS JOIN par$iters
ORDER BY w.g1, w.g2, w.g3"""
  }

  // q484 rank-biased overlap (p = 0.9, depth 10) between the
  // customer-count and order-count nation rankings, prefix-normalized.
  private val rboSql = {
    val ds = (1 to 10).map(d => s"SELECT $d AS d").mkString(" UNION ALL ")
    s"""WITH cc AS (SELECT c_nationkey AS nk, cast(count(*) as bigint) AS v
       |  FROM customer GROUP BY 1),
       |oc AS (SELECT c.c_nationkey AS nk, cast(count(*) as bigint) AS v
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1),
       |r1 AS (SELECT cc.nk, row_number() OVER (ORDER BY cc.v DESC, cc.nk) AS ra
       |  FROM cc JOIN oc ON oc.nk = cc.nk),
       |r2 AS (SELECT nk, row_number() OVER (ORDER BY v DESC, nk) AS rb FROM oc),
       |j AS (SELECT r1.nk, r1.ra, r2.rb FROM r1 JOIN r2 ON r2.nk = r1.nk),
       |ds AS ($ds),
       |ov AS (
       |  SELECT ds.d,
       |    round(cast(sum(CASE WHEN j.ra <= ds.d AND j.rb <= ds.d
       |      THEN 1 ELSE 0 END) as double) / ds.d, 9) AS a_d
       |  FROM ds CROSS JOIN j GROUP BY ds.d)
       |SELECT 10 AS depth,
       |  round(cast(sum(cast(round(0.1E0 * power(0.9E0, d - 1) * a_d, 12)
       |    as decimal(20,12))) as double) / (1 - power(0.9E0, 10)), 6) + 0.0
       |    AS rbo
       |FROM ov""".stripMargin
  }

  // q485 Kemeny (Kendall) distance from the q467 Borda consensus to each
  // input ranking: discordant-pair census over the common item set.
  private val kemenySql =
    """WITH cc AS (SELECT c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM customer GROUP BY 1),
      |ab AS (SELECT c_nationkey AS nk,
      |    sum(cast(round(c_acctbal, 2) as decimal(20,2))) AS v
      |  FROM customer GROUP BY 1),
      |oc AS (SELECT c.c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1),
      |r1 AS (SELECT cc.nk, row_number() OVER (ORDER BY cc.v DESC, cc.nk) AS r
      |  FROM cc JOIN oc ON oc.nk = cc.nk),
      |r2 AS (SELECT ab.nk, row_number() OVER (ORDER BY ab.v DESC, ab.nk) AS r
      |  FROM ab JOIN oc ON oc.nk = ab.nk),
      |r3 AS (SELECT nk, row_number() OVER (ORDER BY v DESC, nk) AS r FROM oc),
      |k AS (SELECT cast(count(*) as bigint) AS k FROM r3),
      |con AS (
      |  SELECT r1.nk,
      |    row_number() OVER (ORDER BY (3 * k.k - r1.r - r2.r - r3.r) DESC, r1.nk)
      |      AS r
      |  FROM r1 JOIN r2 ON r2.nk = r1.nk JOIN r3 ON r3.nk = r1.nk CROSS JOIN k),
      |all_r AS (
      |  SELECT 'cust_count' AS ranker, nk, r FROM r1
      |  UNION ALL SELECT 'acctbal', nk, r FROM r2
      |  UNION ALL SELECT 'order_count', nk, r FROM r3),
      |dist AS (
      |  SELECT x.ranker,
      |    cast(sum(CASE WHEN (ca.r < cb.r) <> (x.r < y.r) THEN 1 ELSE 0 END)
      |      as bigint) AS d,
      |    cast(count(*) as bigint) AS n_pairs
      |  FROM con ca JOIN con cb ON cb.nk > ca.nk
      |  JOIN all_r x ON x.nk = ca.nk
      |  JOIN all_r y ON y.nk = cb.nk AND y.ranker = x.ranker
      |  GROUP BY x.ranker)
      |SELECT ranker, d AS kendall_distance, n_pairs,
      |  round(cast(d as double) / n_pairs, 6) + 0.0 AS normalized
      |FROM dist ORDER BY ranker""".stripMargin

  // q486 LCS between the dominant-event-type sequences of days 1-12 and
  // 15-26 (Spark side: the native lcs_length kernel on per-day modal
  // types; one codegen'd DP per row — usable per-entity at scale).
  private def lcsSparkSql(dayNum: String => String): String =
    s"""WITH c AS (
       |  SELECT ${dayNum("ts")} AS d, event_type, cast(count(*) as bigint) AS c
       |  FROM events GROUP BY 1, 2),
       |dom AS (
       |  SELECT d, event_type AS et FROM (
       |    SELECT d, event_type,
       |      row_number() OVER (PARTITION BY d ORDER BY c DESC, event_type) AS rk
       |    FROM c) z WHERE rk = 1),
       |idx AS (SELECT et, row_number() OVER (ORDER BY d) AS rn FROM dom),
       |mp AS (SELECT map_from_entries(collect_list(struct(rn, et))) AS m FROM idx),
       |arrs AS (
       |  SELECT transform(sequence(1, 12), i -> m[i]) AS a,
       |    transform(sequence(15, 26), i -> m[i]) AS b
       |  FROM mp)
       |SELECT 12 AS seq_len, lcs_length(a, b) AS lcs FROM arrs""".stripMargin

  // q486 oracle: the 12x12 LCS DP unrolled as lateral-alias integer
  // columns (implicit zero border), replaying the kernel exactly.
  private def lcsOracleSql(dayNum: String => String): String = {
    val aCols = (1 to 12).map(i => s"max(CASE WHEN rn = $i THEN et END) AS a$i").mkString(",\n    ")
    val bCols = (1 to 12).map(i => s"max(CASE WHEN rn = ${i + 14} THEN et END) AS b$i").mkString(",\n    ")
    val rows = (1 to 12).map { i =>
      val cols = (1 to 12).map { j =>
        val diag = if (i == 1 || j == 1) "0" else s"l${i - 1}_${j - 1}"
        val up = if (i == 1) "0" else s"l${i - 1}_$j"
        val lf = if (j == 1) "0" else s"l${i}_${j - 1}"
        s"CASE WHEN a$i = b$j THEN $diag + 1 ELSE greatest($up, $lf) END AS l${i}_$j"
      }.mkString(",\n    ")
      s"r$i AS (SELECT *,\n    $cols\n  FROM r${i - 1})"
    }.mkString(",\n")
    s"""WITH c AS (
  SELECT ${dayNum("ts")} AS d, event_type, cast(count(*) as bigint) AS c
  FROM events GROUP BY 1, 2),
dom AS (
  SELECT d, event_type AS et FROM (
    SELECT d, event_type,
      row_number() OVER (PARTITION BY d ORDER BY c DESC, event_type) AS rk
    FROM c) z WHERE rk = 1),
idx AS (SELECT et, row_number() OVER (ORDER BY d) AS rn FROM dom),
r0 AS (
  SELECT
    $aCols,
    $bCols
  FROM idx),
$rows
SELECT 12 AS seq_len, cast(l12_12 as int) AS lcs FROM r12"""
  }

  // q487 Theil-T inequality with exact between/within decomposition over
  // nations (order values): the additively decomposable entropy index.
  private val theilSql =
    """WITH base AS (
      |  SELECT c.c_nationkey AS nk, cast(o.o_totalprice as double) AS y
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  WHERE o.o_totalprice > 0),
      |tot AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(y, 2) as decimal(30,2))) as double) AS s
      |  FROM base),
      |g AS (
      |  SELECT nk, cast(count(*) as bigint) AS ng,
      |    cast(sum(cast(round(y, 2) as decimal(30,2))) as double) AS sg
      |  FROM base GROUP BY nk),
      |tt AS (
      |  SELECT round(cast(sum(cast(round(
      |      (b.y / (t.s / t.n)) * ln(b.y / (t.s / t.n)), 9) as decimal(30,9)))
      |      as double) / max(t.n), 9) AS theil_total
      |  FROM base b CROSS JOIN tot t),
      |tb AS (
      |  SELECT round(cast(sum(cast(round(
      |      (cast(g.ng as double) / t.n) * ((g.sg / g.ng) / (t.s / t.n))
      |        * ln((g.sg / g.ng) / (t.s / t.n)), 9) as decimal(30,9)))
      |      as double), 9) AS theil_between
      |  FROM g CROSS JOIN tot t)
      |SELECT round(tt.theil_total, 6) + 0.0 AS theil_total,
      |  round(tb.theil_between, 6) + 0.0 AS theil_between,
      |  round(tt.theil_total - tb.theil_between, 6) + 0.0 AS theil_within
      |FROM tt CROSS JOIN tb""".stripMargin

  // q488 Oaxaca-Blinder two-fold decomposition of the BUILDING vs
  // MACHINERY mean order-value gap: per-segment one-regressor OLS on
  // customer account balance, endowment vs coefficient parts (reference
  // = MACHINERY).
  private val oaxacaSql =
    """WITH cust AS (
      |  SELECT c.c_custkey, c.c_mktsegment AS seg, cast(c.c_acctbal as double) AS x,
      |    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double)
      |      / count(*) AS y
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
      |  GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal),
      |s AS (
      |  SELECT seg, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
      |    cast(sum(cast(round(y, 6) as decimal(25,6))) as double) AS sy,
      |    cast(sum(cast(round(x * y, 4) as decimal(30,4))) as double) AS sxy,
      |    cast(sum(cast(round(x * x, 4) as decimal(30,4))) as double) AS sxx
      |  FROM cust GROUP BY seg),
      |co AS (
      |  SELECT seg, sx / n AS mx, sy / n AS my,
      |    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 12) AS b
      |  FROM s),
      |px AS (SELECT
      |    max(CASE WHEN seg = 'BUILDING' THEN mx END) AS mxa,
      |    max(CASE WHEN seg = 'BUILDING' THEN my END) AS mya,
      |    max(CASE WHEN seg = 'BUILDING' THEN b END) AS ba,
      |    max(CASE WHEN seg = 'MACHINERY' THEN mx END) AS mxb,
      |    max(CASE WHEN seg = 'MACHINERY' THEN my END) AS myb,
      |    max(CASE WHEN seg = 'MACHINERY' THEN b END) AS bb
      |  FROM co)
      |SELECT round(mya - myb, 6) + 0.0 AS gap,
      |  round(bb * (mxa - mxb), 6) + 0.0 AS endowment_part,
      |  round((mya - myb) - bb * (mxa - mxb), 6) + 0.0 AS coefficient_part,
      |  round(ba, 9) + 0.0 AS slope_building,
      |  round(bb, 9) + 0.0 AS slope_machinery
      |FROM px""".stripMargin

  // q489 Markov data-driven attribution: first-order chain with
  // purchase/drop absorbing states; per-channel REMOVAL EFFECT = 1 -
  // conv(without channel)/conv(full), absorption probabilities by
  // `rounds` pinned iterations per scenario (q441's discipline; the duck
  // twin needs MATERIALIZED on every shared/per-round CTE).
  private def markovAttributionSql(rounds: Int, mat: String): String = {
    val channels = Seq("view", "click", "signup", "error")
    val scenarios = "none" +: channels
    def scen(x: String): String = {
      val tag = if (x == "none") "n" else x.take(2)
      val filt = if (x == "none") "" else s" AND cur <> '$x' AND nxt <> '$x'"
      val stFilt = if (x == "none") "" else s" WHERE cur <> '$x'"
      val steps = (1 to rounds).map { k =>
        s""",
a${tag}$k AS$mat (
  SELECT st.cur AS s,
    round(coalesce(pa.p, 0) + cast(coalesce(sum(cast(round(qq.p * pv.t, 12)
      as decimal(24,12))), 0) as double), 9) AS t
  FROM st$tag st
  LEFT JOIN pabs pa ON pa.cur = st.cur
  LEFT JOIN qq$tag qq ON qq.cur = st.cur
  LEFT JOIN a${tag}${k - 1} pv ON pv.s = qq.nxt
  GROUP BY st.cur, pa.p)"""
      }.mkString
      s""",
st$tag AS$mat (SELECT cur FROM tot$stFilt),
qq$tag AS$mat (SELECT cur, nxt, p FROM q
  WHERE nxt NOT IN ('purchase', 'drop')$filt),
a${tag}0 AS (SELECT cur AS s, cast(0.0 as double) AS t FROM st$tag)$steps,
conv$tag AS$mat (
  SELECT cast(sum(cast(round(pi.share * CASE
      WHEN pi.s = 'purchase' THEN 1.0E0
      ${if (x == "none") "" else s"WHEN pi.s = '$x' THEN 0.0E0"}
      ELSE coalesce(a.t, 0.0E0) END, 12) as decimal(24,12))) as double) AS c
  FROM pi LEFT JOIN a${tag}$rounds a ON a.s = pi.s)"""
    }
    val res = channels.map { c =>
      val tag = c.take(2)
      s"""SELECT '$c' AS channel,
  round(1 - conv$tag.c / convn.c, 6) + 0.0 AS removal_effect
FROM conv$tag CROSS JOIN convn"""
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH seq AS (
  SELECT user_id, event_type AS cur,
    coalesce(lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      'drop') AS nxt
  FROM events),
tr AS (SELECT cur, nxt FROM seq WHERE cur <> 'purchase'),
tot AS$mat (SELECT cur, cast(count(*) as bigint) AS n FROM tr GROUP BY cur),
q AS$mat (
  SELECT t.cur, t.nxt, round(cast(count(*) as double) / tot.n, 9) AS p
  FROM tr t JOIN tot ON tot.cur = t.cur GROUP BY t.cur, t.nxt, tot.n),
pabs AS$mat (SELECT cur, p FROM q WHERE nxt = 'purchase'),
fe AS (
  SELECT user_id, event_type AS s,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events),
pi AS$mat (
  SELECT s, round(cast(count(*) as double)
    / (SELECT count(DISTINCT user_id) FROM events), 9) AS share
  FROM fe WHERE rk = 1 GROUP BY s)${scenarios.map(scen).mkString}
SELECT channel, removal_effect,
  round(removal_effect / (SELECT sum(removal_effect) FROM (
    $res) z), 6) + 0.0 AS attribution_share
FROM (
  $res) out
ORDER BY channel"""
  }

  // q490 Expected Reciprocal Rank @10 (cascade click model): nations
  // ranked by customer count, graded relevance = order-count quartile,
  // stop probabilities R = (2^g - 1)/8, survival product via a pinned
  // cumulative log window.
  private val errSql =
    """WITH cc AS (SELECT c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM customer GROUP BY 1),
      |oc AS (SELECT c.c_nationkey AS nk, cast(count(*) as bigint) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1),
      |grade AS (
      |  SELECT nk, cast(4 - ntile(4) OVER (ORDER BY v DESC, nk) as int) AS g
      |  FROM oc),
      |rk AS (
      |  SELECT cc.nk, row_number() OVER (ORDER BY cc.v DESC, cc.nk) AS r,
      |    grade.g
      |  FROM cc JOIN grade ON grade.nk = cc.nk),
      |rel AS (
      |  SELECT r, (power(2.0E0, g) - 1) / 8.0E0 AS rr
      |  FROM rk WHERE r <= 10),
      |surv AS (
      |  SELECT r, rr,
      |    exp(cast(coalesce(sum(cast(round(ln(1 - rr), 9) as decimal(20,9)))
      |      OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) as double)) AS pstop
      |  FROM rel)
      |SELECT 10 AS depth,
      |  round(cast(sum(cast(round(pstop * rr / r, 9) as decimal(20,9)))
      |    as double), 6) + 0.0 AS err_at_10
      |FROM surv""".stripMargin

  // q491 Kruskal-Wallis k-group rank test with tie correction, midranks
  // from the q449 grouped-value route (never a row-level sort).
  private val kruskalWallisSql =
    """WITH base AS (
      |  SELECT event_type AS g, cast(value as double) AS v
      |  FROM events WHERE value IS NOT NULL),
      |vals AS (
      |  SELECT v, cast(count(*) as bigint) AS c FROM base GROUP BY v),
      |rkv AS (
      |  SELECT v, c, sum(c) OVER (ORDER BY v) - c AS below FROM vals),
      |gr AS (
      |  SELECT b.g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(r.below + (r.c + 1) / 2.0E0, 4)
      |      as decimal(25,4))) as double) AS rsum
      |  FROM base b JOIN rkv r ON r.v = b.v GROUP BY b.g),
      |tot AS (
      |  SELECT cast(sum(n) as bigint) AS nn, cast(count(*) as bigint) AS k
      |  FROM gr),
      |ties AS (
      |  SELECT cast(coalesce(sum(c * c * c - c), 0) as double) AS tc
      |  FROM vals WHERE c > 1),
      |h AS (
      |  SELECT tot.nn, tot.k,
      |    12.0E0 / (cast(tot.nn as double) * (tot.nn + 1))
      |      * cast(sum(cast(round(gr.rsum * gr.rsum / gr.n, 6)
      |        as decimal(30,6))) as double)
      |      - 3.0E0 * (tot.nn + 1) AS h_raw,
      |    max(ties.tc) AS tc
      |  FROM gr CROSS JOIN tot CROSS JOIN ties
      |  GROUP BY tot.nn, tot.k)
      |SELECT cast(k as int) AS n_groups, nn AS n_obs,
      |  round(h_raw / (1 - tc / (cast(nn as double) * nn * nn - nn)), 6) + 0.0
      |    AS kw_h
      |FROM h""".stripMargin

  // q492 Friedman test: blocks = days, treatments = event types, ranks
  // of within-day counts (deterministic tie-break on type name is NOT
  // used — midranks via the grouped route keep the statistic exact).
  private def friedmanSql(dayNum: String => String): String =
    s"""WITH cell AS (
       |  SELECT ${dayNum("ts")} AS d, event_type AS t, cast(count(*) as bigint) AS y
       |  FROM events GROUP BY 1, 2),
       |rk AS (
       |  SELECT d, t,
       |    rank() OVER (PARTITION BY d ORDER BY y) AS lo,
       |    cast(count(*) OVER (PARTITION BY d, y) as bigint) AS c
       |  FROM cell),
       |mid AS (SELECT d, t, lo + (c - 1) / 2.0E0 AS r FROM rk),
       |rs AS (
       |  SELECT t, cast(sum(cast(round(r, 4) as decimal(20,4))) as double) AS rsum
       |  FROM mid GROUP BY t),
       |dims AS (
       |  SELECT cast(count(DISTINCT d) as bigint) AS n,
       |    cast(count(DISTINCT t) as bigint) AS k
       |  FROM cell)
       |SELECT dims.n AS n_blocks, cast(dims.k as int) AS n_treatments,
       |  round(12.0E0 / (cast(dims.n as double) * dims.k * (dims.k + 1))
       |    * cast(sum(cast(round(rs.rsum * rs.rsum, 4) as decimal(30,4))) as double)
       |    - 3.0E0 * dims.n * (dims.k + 1), 6) + 0.0 AS friedman_q
       |FROM rs CROSS JOIN dims GROUP BY dims.n, dims.k""".stripMargin

  // q493 competing-risks cumulative incidence (Aalen-Johansen): first
  // post-signup event of purchase vs error, CIF_k(t) = sum S(t-) d_k/n
  // with S the all-cause KM, censoring at last activity.
  private def cifSql(micros: String => String, idiv: String): String =
    s"""WITH s AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |fe AS (
       |  SELECT e.user_id, e.ts, e.event_type,
       |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rk
       |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
       |  WHERE e.event_type IN ('purchase', 'error')),
       |first_ev AS (SELECT user_id, ts, event_type FROM fe WHERE rk = 1),
       |mx AS (SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
       |dur AS (
       |  SELECT s.user_id,
       |    CASE WHEN f.ts IS NOT NULL
       |      THEN (${micros("f.ts")} - ${micros("s.t0")}) $idiv 3600000000
       |      ELSE (${micros("mx.tmax")} - ${micros("s.t0")}) $idiv 3600000000 END AS hrs,
       |    coalesce(f.event_type, 'censored') AS cause
       |  FROM s JOIN mx ON s.user_id = mx.user_id
       |  LEFT JOIN first_ev f ON f.user_id = s.user_id),
       |ev AS (
       |  SELECT hrs,
       |    cast(sum(CASE WHEN cause = 'purchase' THEN 1 ELSE 0 END) as bigint) AS dp,
       |    cast(sum(CASE WHEN cause = 'error' THEN 1 ELSE 0 END) as bigint) AS de,
       |    cast(count(*) as bigint) AS leaving
       |  FROM dur GROUP BY hrs),
       |rk2 AS (
       |  SELECT hrs, dp, de, sum(leaving) OVER (ORDER BY hrs DESC) AS n_risk
       |  FROM ev),
       |km AS (
       |  SELECT hrs, dp, de, n_risk,
       |    exp(cast(coalesce(sum(CASE WHEN dp + de > 0 AND dp + de < n_risk
       |      THEN cast(round(ln(1.0 - cast(dp + de as double) / n_risk), 9)
       |        as decimal(20,9))
       |      ELSE cast(0 as decimal(20,9)) END)
       |      OVER (ORDER BY hrs ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) as double)) AS s_minus
       |  FROM rk2),
       |cif AS (
       |  SELECT hrs,
       |    sum(cast(round(s_minus * dp / n_risk, 9) as decimal(20,9)))
       |      OVER (ORDER BY hrs) AS cp,
       |    sum(cast(round(s_minus * de / n_risk, 9) as decimal(20,9)))
       |      OVER (ORDER BY hrs) AS ce
       |  FROM km WHERE dp + de > 0)
       |SELECT cast(hrs as bigint) AS hrs,
       |  round(cast(cp as double), 6) + 0.0 AS cif_purchase,
       |  round(cast(ce as double), 6) + 0.0 AS cif_error
       |FROM cif
       |WHERE hrs $idiv 24 < 7 ORDER BY hrs""".stripMargin

  // q494 Church-Gale word burstiness for the top-30 corpus words:
  // P(word appears again in a doc | it appeared once) = docs with c>=2
  // over docs with c>=1, against the Poisson-expected repeat rate.
  private def burstinessSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |top AS (
       |  SELECT word FROM (
       |    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS rk
       |    FROM tokp GROUP BY word) z WHERE rk <= 30),
       |dc AS (
       |  SELECT t.word, t.doc_id, cast(count(*) as bigint) AS c
       |  FROM tokp t JOIN top ON top.word = t.word
       |  GROUP BY t.word, t.doc_id),
       |nd AS (SELECT cast(count(DISTINCT doc_id) as bigint) AS nd FROM tokp),
       |agg AS (
       |  SELECT word, cast(count(*) as bigint) AS df,
       |    cast(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) as bigint) AS df2,
       |    cast(sum(c) as bigint) AS cf
       |  FROM dc GROUP BY word)
       |SELECT a.word, a.df, a.cf,
       |  round(cast(a.df2 as double) / a.df, 6) + 0.0 AS repeat_rate,
       |  round(1 - (cast(a.cf as double) / nd.nd)
       |    * exp(-(cast(a.cf as double) / nd.nd))
       |    / (1 - exp(-(cast(a.cf as double) / nd.nd))), 6) + 0.0
       |    AS poisson_repeat_rate
       |FROM agg a CROSS JOIN nd ORDER BY a.word""".stripMargin

  // q495 Cochran's Q over users x {view, click, purchase} participation
  // in the last 5 days — the k-treatment binary repeated-measures test.
  private def cochranQSql(dayNum: String => String): String =
    s"""WITH rng AS (SELECT max(${dayNum("ts")}) AS dmax FROM events),
       |x AS (
       |  SELECT e.user_id,
       |    max(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END) AS x1,
       |    max(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS x2,
       |    max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS x3
       |  FROM events e CROSS JOIN rng r
       |  WHERE ${dayNum("e.ts")} > r.dmax - 5
       |  GROUP BY e.user_id),
       |s AS (
       |  SELECT cast(count(*) as bigint) AS b,
       |    cast(sum(x1) as bigint) AS c1, cast(sum(x2) as bigint) AS c2,
       |    cast(sum(x3) as bigint) AS c3,
       |    cast(sum(x1 + x2 + x3) as bigint) AS t,
       |    cast(sum((x1 + x2 + x3) * (x1 + x2 + x3)) as bigint) AS r2
       |  FROM x)
       |SELECT b AS n_users, t AS grand_total,
       |  round(2.0E0 * (3 * (cast(c1 as double) * c1 + cast(c2 as double) * c2
       |      + cast(c3 as double) * c3) - cast(t as double) * t)
       |    / (3.0E0 * t - r2), 6) + 0.0 AS cochran_q
       |FROM s""".stripMargin

  // q496 cluster-sampling design effect for click values clustered by
  // user: DEFF = 1 + (mbar - 1) * rho with the one-way ANOVA rho.
  private val deffSql =
    """WITH base AS (
      |  SELECT user_id, cast(value as double) AS v
      |  FROM events WHERE event_type = 'click' AND value IS NOT NULL),
      |g AS (
      |  SELECT user_id, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(v, 9) as decimal(30,9))) as double) AS s1,
      |    cast(sum(cast(round(v * v, 9) as decimal(30,9))) as double) AS s2
      |  FROM base GROUP BY user_id),
      |tot AS (
      |  SELECT cast(sum(n) as bigint) AS nn, cast(count(*) as bigint) AS gc,
      |    cast(sum(cast(round(s1, 9) as decimal(30,9))) as double) AS ts1,
      |    cast(sum(cast(round(s2, 9) as decimal(30,9))) as double) AS ts2,
      |    cast(sum(n * n) as bigint) AS sn2
      |  FROM g),
      |ss AS (
      |  SELECT tot.nn, tot.gc,
      |    cast(sum(cast(round(g.s1 * g.s1 / g.n, 9) as decimal(30,9))) as double)
      |      - tot.ts1 * tot.ts1 / tot.nn AS ssb,
      |    tot.ts2 - cast(sum(cast(round(g.s1 * g.s1 / g.n, 9)
      |      as decimal(30,9))) as double) AS ssw,
      |    (tot.nn - cast(tot.sn2 as double) / tot.nn) / (tot.gc - 1) AS k0
      |  FROM g CROSS JOIN tot GROUP BY tot.nn, tot.gc, tot.ts1, tot.ts2, tot.sn2),
      |rho AS (
      |  SELECT nn, gc, k0,
      |    round((ssb / (gc - 1) - ssw / (nn - gc))
      |      / (ssb / (gc - 1) + (k0 - 1) * (ssw / (nn - gc))), 9) AS rho
      |  FROM ss)
      |SELECT gc AS n_clusters, nn AS n_obs,
      |  round(cast(nn as double) / gc, 6) + 0.0 AS mean_cluster_size,
      |  rho + 0.0 AS rho,
      |  round(1 + (cast(nn as double) / gc - 1) * rho, 6) + 0.0 AS deff
      |FROM rho""".stripMargin

  // q497 Yuen's trimmed-mean t (10% trim) for click vs view values:
  // exact rank trimming + winsorized variance, never a row sort on the
  // driver — ranks via one window per group.
  private val yuenSql =
    """WITH base AS (
      |  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
      |    cast(value as double) AS v
      |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |rk AS (
      |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY g) AS n
      |  FROM base),
      |lim AS (
      |  SELECT g, max(n) AS n, cast(floor(max(n) * 0.1E0) as bigint) AS tr
      |  FROM rk GROUP BY g),
      |bnd AS (
      |  SELECT l.g, l.n, l.tr,
      |    max(CASE WHEN r.rn = l.tr + 1 THEN r.v END) AS lo,
      |    max(CASE WHEN r.rn = l.n - l.tr THEN r.v END) AS hi
      |  FROM lim l JOIN rk r ON r.g = l.g
      |  GROUP BY l.g, l.n, l.tr),
      |tm AS (
      |  SELECT b.g, b.n, b.tr,
      |    cast(sum(CASE WHEN r.rn > b.tr AND r.rn <= b.n - b.tr
      |      THEN cast(round(r.v, 9) as decimal(30,9))
      |      ELSE cast(0 as decimal(30,9)) END) as double)
      |      / (b.n - 2 * b.tr) AS tmean,
      |    cast(sum(cast(round(
      |      CASE WHEN r.rn <= b.tr THEN b.lo
      |           WHEN r.rn > b.n - b.tr THEN b.hi ELSE r.v END, 9)
      |      as decimal(30,9))) as double) AS ws1,
      |    cast(sum(cast(round(
      |      (CASE WHEN r.rn <= b.tr THEN b.lo
      |            WHEN r.rn > b.n - b.tr THEN b.hi ELSE r.v END)
      |      * (CASE WHEN r.rn <= b.tr THEN b.lo
      |              WHEN r.rn > b.n - b.tr THEN b.hi ELSE r.v END), 9)
      |      as decimal(30,9))) as double) AS ws2
      |  FROM bnd b JOIN rk r ON r.g = b.g
      |  GROUP BY b.g, b.n, b.tr),
      |f AS (
      |  SELECT g, n, tr, tmean,
      |    (ws2 - ws1 * ws1 / n) / ((n - 2 * tr) * (n - 2.0E0 * tr - 1)) AS dv
      |  FROM tm),
      |px AS (SELECT
      |    max(CASE WHEN g = 1 THEN tmean END) AS m1,
      |    max(CASE WHEN g = 0 THEN tmean END) AS m0,
      |    max(CASE WHEN g = 1 THEN dv END) AS d1,
      |    max(CASE WHEN g = 0 THEN dv END) AS d0,
      |    max(CASE WHEN g = 1 THEN n - 2 * tr END) AS h1,
      |    max(CASE WHEN g = 0 THEN n - 2 * tr END) AS h0
      |  FROM f)
      |SELECT h1 AS h_click, h0 AS h_view,
      |  round(m1 - m0, 6) + 0.0 AS trimmed_diff,
      |  round((m1 - m0) / sqrt(d1 + d0), 6) + 0.0 AS yuen_t
      |FROM px""".stripMargin

  // q498 O'Brien-Fleming group-sequential monitor: daily cumulative
  // Welch z of click-vs-view means against the z-boundary
  // 3.0 / sqrt(t / T); first-crossing census.
  private def obfSql(dayNum: String => String): String =
    s"""WITH base AS (
       |  SELECT ${dayNum("ts")} AS d,
       |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
       |    cast(value as double) AS v
       |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
       |days AS (SELECT DISTINCT d FROM base),
       |nd AS (SELECT cast(count(*) as bigint) AS t_max,
       |    min(d) AS d0 FROM days),
       |cum AS (
       |  SELECT dy.d, b.g, cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(b.v, 9) as decimal(30,9))) as double) AS s1,
       |    cast(sum(cast(round(b.v * b.v, 9) as decimal(30,9))) as double) AS s2
       |  FROM days dy JOIN base b ON b.d <= dy.d
       |  GROUP BY dy.d, b.g),
       |z AS (
       |  SELECT a.d,
       |    (a.s1 / a.n - c.s1 / c.n)
       |      / sqrt((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n
       |           + (c.s2 - c.s1 * c.s1 / c.n) / (c.n - 1) / c.n) AS z
       |  FROM cum a JOIN cum c ON c.d = a.d AND c.g = 0
       |  WHERE a.g = 1 AND a.n > 1 AND c.n > 1),
       |chk AS (
       |  SELECT z.d, z.z,
       |    3.0E0 / sqrt((z.d - nd.d0 + 1.0E0) / nd.t_max) AS bound,
       |    CASE WHEN abs(z.z) > 3.0E0 / sqrt((z.d - nd.d0 + 1.0E0) / nd.t_max)
       |      THEN 1 ELSE 0 END AS crossed
       |  FROM z CROSS JOIN nd)
       |SELECT cast(count(*) as bigint) AS n_looks,
       |  cast(sum(crossed) as bigint) AS n_crossings,
       |  cast(coalesce(min(CASE WHEN crossed = 1 THEN d END), -1) as bigint)
       |    AS first_crossing_day,
       |  round(max(CASE WHEN rk = 1 THEN z END), 6) + 0.0 AS final_z
       |FROM (SELECT chk.*, row_number() OVER (ORDER BY d DESC) AS rk FROM chk) q""".stripMargin

  // q499 Page's trend test for ordered alternatives: blocks = day-of-
  // week, ordered treatments = weeks 1-4, L = sum j * R_j with midranks.
  private def pageTrendSql(dayNum: String => String): String =
    s"""WITH rng AS (SELECT min(${dayNum("ts")}) AS d0 FROM events),
       |daily AS (
       |  SELECT e.d, cast((e.d - r.d0) % 7 as int) AS dow,
       |    cast(floor((e.d - r.d0) / 7.0E0) as int) + 1 AS wk, e.y
       |  FROM (SELECT ${dayNum("ts")} AS d, cast(count(*) as bigint) AS y
       |        FROM events GROUP BY 1) e
       |  CROSS JOIN rng r
       |  WHERE e.d - r.d0 < 28),
       |rk AS (
       |  SELECT dow, wk,
       |    rank() OVER (PARTITION BY dow ORDER BY y) AS lo,
       |    cast(count(*) OVER (PARTITION BY dow, y) as bigint) AS c
       |  FROM daily),
       |mid AS (SELECT dow, wk, lo + (c - 1) / 2.0E0 AS r FROM rk),
       |rs AS (
       |  SELECT wk, cast(sum(cast(round(r, 4) as decimal(20,4))) as double) AS rsum
       |  FROM mid GROUP BY wk),
       |l AS (
       |  SELECT cast(sum(cast(round(wk * rsum, 4) as decimal(20,4))) as double) AS l
       |  FROM rs)
       |SELECT round(l.l, 4) + 0.0 AS page_l,
       |  round(7 * 4 * 25.0E0 / 4, 4) + 0.0 AS expected_l,
       |  round((l.l - 7 * 4 * 25.0E0 / 4)
       |    / sqrt(7 * 16.0E0 * 5 * 15 / 144), 6) + 0.0 AS page_z
       |FROM l""".stripMargin

  // q500 Tukey HSD post-hoc after the q342 ANOVA: all pairwise
  // event-type mean differences against the studentized-range interval
  // (q* = 3.86 for k = 5 at alpha .05, large df — literal by design).
  private val tukeyHsdSql =
    """WITH base AS (
      |  SELECT event_type AS g, cast(value as double) AS v
      |  FROM events WHERE value IS NOT NULL),
      |gm AS (
      |  SELECT g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(v, 9) as decimal(30,9))) as double) AS s1,
      |    cast(sum(cast(round(v * v, 9) as decimal(30,9))) as double) AS s2
      |  FROM base GROUP BY g),
      |mse AS (
      |  SELECT cast(sum(cast(round(s2 - s1 * s1 / n, 9) as decimal(30,9)))
      |      as double) / (sum(n) - count(*)) AS mse
      |  FROM gm)
      |SELECT a.g AS group_a, b.g AS group_b,
      |  round(a.s1 / a.n - b.s1 / b.n, 6) + 0.0 AS mean_diff,
      |  round(3.86E0 * sqrt(mse.mse / 2 * (1.0E0 / a.n + 1.0E0 / b.n)), 6) + 0.0
      |    AS hsd_interval,
      |  CASE WHEN abs(a.s1 / a.n - b.s1 / b.n)
      |    > 3.86E0 * sqrt(mse.mse / 2 * (1.0E0 / a.n + 1.0E0 / b.n))
      |    THEN 1 ELSE 0 END AS significant
      |FROM gm a JOIN gm b ON b.g > a.g CROSS JOIN mse
      |ORDER BY group_a, group_b""".stripMargin

  // q501 Dunn's post-hoc after the q491 Kruskal-Wallis: pairwise mean-
  // rank z with the tie-corrected variance term.
  private val dunnSql =
    """WITH base AS (
      |  SELECT event_type AS g, cast(value as double) AS v
      |  FROM events WHERE value IS NOT NULL),
      |vals AS (SELECT v, cast(count(*) as bigint) AS c FROM base GROUP BY v),
      |rkv AS (SELECT v, c, sum(c) OVER (ORDER BY v) - c AS below FROM vals),
      |gr AS (
      |  SELECT b.g, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(r.below + (r.c + 1) / 2.0E0, 4)
      |      as decimal(25,4))) as double) / count(*) AS mrank
      |  FROM base b JOIN rkv r ON r.v = b.v GROUP BY b.g),
      |tot AS (
      |  SELECT cast(sum(n) as bigint) AS nn FROM gr),
      |ties AS (
      |  SELECT cast(coalesce(sum(c * c * c - c), 0) as double) AS tc
      |  FROM vals WHERE c > 1)
      |SELECT a.g AS group_a, b.g AS group_b,
      |  round(a.mrank - b.mrank, 6) + 0.0 AS rank_diff,
      |  round((a.mrank - b.mrank)
      |    / sqrt((cast(tot.nn as double) * (tot.nn + 1) / 12.0E0
      |        - ties.tc / (12.0E0 * (tot.nn - 1)))
      |      * (1.0E0 / a.n + 1.0E0 / b.n)), 6) + 0.0 AS dunn_z
      |FROM gr a JOIN gr b ON b.g > a.g CROSS JOIN tot CROSS JOIN ties
      |ORDER BY group_a, group_b""".stripMargin

  // q502 James-Stein shrinkage of per-nation mean order values toward
  // the grand mean (positive-part estimator, pooled within variance).
  private val jamesSteinSql =
    """WITH base AS (
      |  SELECT c.c_nationkey AS nk, cast(o.o_totalprice as double) AS y
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |g AS (
      |  SELECT nk, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(y, 2) as decimal(30,2))) as double) AS s1,
      |    cast(sum(cast(round(y * y, 2) as decimal(35,2))) as double) AS s2
      |  FROM base GROUP BY nk),
      |tot AS (
      |  SELECT cast(count(*) as bigint) AS k,
      |    cast(sum(n) as bigint) AS nn,
      |    cast(sum(cast(round(s1, 2) as decimal(35,2))) as double) AS ts1,
      |    cast(sum(cast(round(s2 - s1 * s1 / n, 2) as decimal(35,2))) as double)
      |      AS ssw
      |  FROM g),
      |s AS (
      |  SELECT g.nk, g.n, g.s1 / g.n AS mu, tot.ts1 / tot.nn AS gmu,
      |    tot.ssw / (tot.nn - tot.k) / g.n AS se2, tot.k
      |  FROM g CROSS JOIN tot),
      |dev AS (
      |  SELECT cast(sum(cast(round((mu - gmu) * (mu - gmu) / se2, 6)
      |      as decimal(30,6))) as double) AS ss, max(k) AS k
      |  FROM s)
      |SELECT cast(s.nk as int) AS nation, s.n,
      |  round(s.mu, 4) + 0.0 AS raw_mean,
      |  round(s.gmu + greatest(0.0E0, 1 - (dev.k - 3.0E0) / dev.ss)
      |    * (s.mu - s.gmu), 4) + 0.0 AS js_mean,
      |  round(greatest(0.0E0, 1 - (dev.k - 3.0E0) / dev.ss), 6) + 0.0
      |    AS shrink_keep
      |FROM s CROSS JOIN dev ORDER BY nation""".stripMargin

  // q503 Box-Cox lambda grid search over order values: profile
  // log-likelihood at lambda in {-1, -0.5, 0, 0.5, 1}, argmax flagged.
  private val boxCoxSql = {
    def yl(l: Double): String =
      if (l == 0.0) "ln(y)"
      else s"(power(y, ${l}E0) - 1) / ${l}E0"
    // two-pass per grid point: pinned mean, then pinned CENTERED squares —
    // the one-pass s2 - s1^2/n cancels catastrophically at lambda = -1
    // (transformed values cluster within 1e-3 of 1.0)
    val gridIdx = Seq(-1.0, -0.5, 0.0, 0.5, 1.0).zipWithIndex
    val passes = gridIdx.map { case (l, i) =>
      s""",
m$i AS (
  SELECT cast(count(*) as bigint) AS n,
    round(cast(sum(cast(round(${yl(l)}, 12) as decimal(32,12))) as double)
      / count(*), 12) AS mu,
    cast(sum(cast(round(ln(y), 9) as decimal(30,9))) as double) AS slny
  FROM base),
v$i AS (
  SELECT cast(sum(cast(round((${yl(l)} - m$i.mu) * (${yl(l)} - m$i.mu), 12)
    as decimal(38,12))) as double) AS ss
  FROM base CROSS JOIN m$i)"""
    }.mkString
    val grid = gridIdx.map { case (l, i) =>
      s"""SELECT ${l}E0 AS lambda, m$i.n,
  round(-(m$i.n / 2.0E0) * ln(v$i.ss / m$i.n)
    + (${l}E0 - 1) * m$i.slny, 4) AS loglik
FROM m$i CROSS JOIN v$i"""
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH base AS (
  SELECT cast(o_totalprice as double) AS y FROM orders WHERE o_totalprice > 0)$passes,
ll AS (
  SELECT lambda, n, loglik
  FROM (
  $grid) g),
best AS (
  SELECT lambda AS best_lambda FROM (
    SELECT lambda, row_number() OVER (ORDER BY loglik DESC, lambda) AS rk
    FROM ll) z WHERE rk = 1)
SELECT ll.lambda + 0.0 AS lambda, ll.loglik + 0.0 AS loglik,
  CASE WHEN ll.lambda = best.best_lambda THEN 1 ELSE 0 END AS is_best
FROM ll CROSS JOIN best ORDER BY ll.lambda"""
  }

  // q504 Anderson-Darling goodness-of-fit of inter-purchase gaps to the
  // exponential with the fitted mean — the tail-weighted complement of
  // the q343 KS.
  private def adExpSql(micros: String => String, idiv: String): String =
    s"""WITH p AS (
       |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
       |g AS (
       |  SELECT cast((${micros("ts")} - ${micros("prev")}) $idiv 60000000 as double)
       |    AS mins
       |  FROM (
       |    SELECT ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
       |    FROM p) z
       |  WHERE prev IS NOT NULL
       |    AND (${micros("ts")} - ${micros("prev")}) $idiv 60000000 > 0),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(mins as decimal(25,4))) as double) / count(*) AS mu
       |  FROM g),
       |rk AS (
       |  SELECT mins, row_number() OVER (ORDER BY mins) AS i FROM g),
       |terms AS (
       |  SELECT a.i,
       |    round((2 * a.i - 1)
       |      * (ln(1 - exp(-(a.mins / m.mu)))
       |         + (-(b.mins / m.mu))), 9) AS t
       |  FROM rk a CROSS JOIN m
       |  JOIN rk b ON b.i = m.n + 1 - a.i),
       |s AS (
       |  SELECT m.n,
       |    cast(sum(cast(t as decimal(25,9))) as double) AS st
       |  FROM terms CROSS JOIN m GROUP BY m.n)
       |SELECT n AS n_gaps,
       |  round(-cast(n as double) - st / n, 6) + 0.0 AS ad_stat
       |FROM s""".stripMargin

  // q505 two-component 1-D Gaussian mixture on ln(order value): EM
  // unrolled `iters` rounds (quartile/half-variance init, round-9-pinned
  // responsibilities and moments; the 2-pi factor cancels in the
  // responsibility ratio so phi drops it).
  private def gmm2Sql(iters: Int = 3): String = {
    def phi(mu: String, v: String) =
      s"exp(-(b.y - $mu) * (b.y - $mu) / (2 * $v)) / sqrt($v)"
    val steps = (1 to iters).map { k =>
      val pp = s"par${k - 1}"
      s""",
e$k AS (
  SELECT b.y,
    round($pp.w * ${phi(s"$pp.mu1", s"$pp.v1")}
      / ($pp.w * ${phi(s"$pp.mu1", s"$pp.v1")}
         + (1 - $pp.w) * ${phi(s"$pp.mu2", s"$pp.v2")}), 9) AS r
  FROM base b CROSS JOIN $pp),
s$k AS (
  SELECT cast(count(*) as bigint) AS n,
    cast(sum(cast(round(r, 9) as decimal(25,9))) as double) AS sr,
    cast(sum(cast(round(r * y, 6) as decimal(25,6))) as double) AS sry,
    cast(sum(cast(round(r * y * y, 6) as decimal(30,6))) as double) AS sry2,
    cast(sum(cast(round((1 - r) * y, 6) as decimal(25,6))) as double) AS suy,
    cast(sum(cast(round((1 - r) * y * y, 6) as decimal(30,6))) as double) AS suy2
  FROM e$k),
par$k AS (
  SELECT round(sr / n, 9) AS w,
    round(sry / sr, 9) AS mu1, round(suy / (n - sr), 9) AS mu2,
    round((sry2 - sry * sry / sr) / sr, 9) AS v1,
    round((suy2 - suy * suy / (n - sr)) / (n - sr), 9) AS v2
  FROM s$k)"""
    }.mkString
    s"""WITH base AS (
  SELECT ln(cast(o_totalprice as double)) AS y
  FROM orders WHERE o_totalprice > 0),
rk AS (
  SELECT y, row_number() OVER (ORDER BY y) AS i, count(*) OVER () AS n
  FROM base),
init AS (
  SELECT
    max(CASE WHEN i = cast(floor(n * 0.25E0) as bigint) THEN y END) AS q25,
    max(CASE WHEN i = cast(floor(n * 0.75E0) as bigint) THEN y END) AS q75
  FROM rk),
mom AS (
  SELECT cast(count(*) as bigint) AS n,
    cast(sum(cast(round(y, 9) as decimal(25,9))) as double) AS s1,
    cast(sum(cast(round(y * y, 9) as decimal(30,9))) as double) AS s2
  FROM base),
par0 AS (
  SELECT 0.5E0 AS w, init.q25 AS mu1, init.q75 AS mu2,
    round((mom.s2 - mom.s1 * mom.s1 / mom.n) / mom.n / 2, 9) AS v1,
    round((mom.s2 - mom.s1 * mom.s1 / mom.n) / mom.n / 2, 9) AS v2
  FROM init CROSS JOIN mom)$steps
SELECT round(w, 6) + 0.0 AS weight1,
  round(mu1, 6) + 0.0 AS mu1, round(mu2, 6) + 0.0 AS mu2,
  round(sqrt(v1), 6) + 0.0 AS sigma1, round(sqrt(v2), 6) + 0.0 AS sigma2
FROM par$iters"""
  }

  // q506 Monroe-Colaresi-Quinn informative-prior log-odds: src0 vs the
  // rest over the top-40 corpus words, z = delta / sqrt(1/(y+a) + 1/(y'+a)).
  private def monroeSql(tokPosCte: String): String =
    s"""WITH tokp AS ($tokPosCte),
       |src AS (SELECT doc_id, source FROM documents WHERE source IS NOT NULL),
       |tok AS (
       |  SELECT CASE WHEN s.source = 'src0' THEN 1 ELSE 0 END AS grp, t.word
       |  FROM tokp t JOIN src s ON s.doc_id = t.doc_id),
       |top AS (
       |  SELECT word FROM (
       |    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS rk
       |    FROM tok GROUP BY word) z WHERE rk <= 40),
       |wc AS (
       |  SELECT t.word, t.grp, cast(count(*) as bigint) AS y
       |  FROM tok t JOIN top ON top.word = t.word GROUP BY t.word, t.grp),
       |nt AS (SELECT grp, cast(sum(y) as bigint) AS n FROM wc GROUP BY grp),
       |px AS (
       |  SELECT top.word,
       |    coalesce(max(CASE WHEN wc.grp = 1 THEN wc.y END), 0) AS ya,
       |    coalesce(max(CASE WHEN wc.grp = 0 THEN wc.y END), 0) AS yb
       |  FROM top LEFT JOIN wc ON wc.word = top.word GROUP BY top.word),
       |f AS (
       |  SELECT px.word, px.ya, px.yb,
       |    round(ln((px.ya + 0.5E0) / (na.n + 20.0E0 - px.ya - 0.5E0))
       |      - ln((px.yb + 0.5E0) / (nb.n + 20.0E0 - px.yb - 0.5E0)), 9) AS delta,
       |    round(1.0E0 / (px.ya + 0.5E0) + 1.0E0 / (px.yb + 0.5E0), 9) AS v
       |  FROM px
       |  CROSS JOIN (SELECT n FROM nt WHERE grp = 1) na
       |  CROSS JOIN (SELECT n FROM nt WHERE grp = 0) nb)
       |SELECT word, ya AS count_src0, yb AS count_rest,
       |  round(delta / sqrt(v), 6) + 0.0 AS log_odds_z
       |FROM f ORDER BY word""".stripMargin

  // q507 Syntetos-Boylan intermittent-demand classification per part
  // category: ADI (mean inter-demand interval over order dates) and
  // CV^2 of demand sizes, quadrant cutoffs 1.32 / 0.49.
  private def syntetosBoylanSql(dayDiff: (String, String) => String): String =
    s"""WITH d AS (
      |  SELECT l.l_partkey % 50 AS cat, o.o_orderdate AS dt,
      |    cast(sum(cast(round(l.l_quantity, 2) as decimal(20,2))) as double) AS q
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1, 2),
      |iv AS (
      |  SELECT cat,
      |    cast(${dayDiff("dt", "lag(dt) OVER (PARTITION BY cat ORDER BY dt)")}
      |      as double) AS gap
      |  FROM d),
      |adi AS (
      |  SELECT cat,
      |    cast(sum(cast(round(gap, 0) as decimal(20,0))) as double)
      |      / count(gap) AS adi
      |  FROM iv WHERE gap IS NOT NULL GROUP BY cat),
      |cv AS (
      |  SELECT cat, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(q, 2) as decimal(25,2))) as double) AS s1,
      |    cast(sum(cast(round(q * q, 2) as decimal(30,2))) as double) AS s2
      |  FROM d GROUP BY cat)
      |SELECT cast(cv.cat as int) AS category, cv.n AS n_demands,
      |  round(adi.adi, 6) + 0.0 AS adi,
      |  round(((cv.s2 - cv.s1 * cv.s1 / cv.n) / (cv.n - 1))
      |    / ((cv.s1 / cv.n) * (cv.s1 / cv.n)), 6) + 0.0 AS cv2,
      |  CASE
      |    WHEN adi.adi < 1.32E0 AND ((cv.s2 - cv.s1 * cv.s1 / cv.n) / (cv.n - 1))
      |      / ((cv.s1 / cv.n) * (cv.s1 / cv.n)) < 0.49E0 THEN 'smooth'
      |    WHEN adi.adi >= 1.32E0 AND ((cv.s2 - cv.s1 * cv.s1 / cv.n) / (cv.n - 1))
      |      / ((cv.s1 / cv.n) * (cv.s1 / cv.n)) < 0.49E0 THEN 'intermittent'
      |    WHEN adi.adi < 1.32E0 THEN 'erratic'
      |    ELSE 'lumpy' END AS demand_class
      |FROM cv JOIN adi ON adi.cat = cv.cat
      |ORDER BY category""".stripMargin

  // q508 Poisson-Gamma empirical-Bayes shrinkage of per-category weekly
  // demand rates: method-of-moments Gamma prior across categories,
  // posterior mean (x + alpha) / (t + beta).
  private def poissonGammaSql(weekExpr: String): String =
    s"""WITH wk AS (
       |  SELECT l.l_partkey % 50 AS cat, $weekExpr AS w
       |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
       |nts AS (SELECT cast(count(DISTINCT w) as double) AS t FROM wk),
       |x AS (SELECT cat, cast(count(*) as bigint) AS x FROM wk GROUP BY cat),
       |r AS (
       |  SELECT x.cat, x.x, x.x / nts.t AS rate, nts.t
       |  FROM x CROSS JOIN nts),
       |mom AS (
       |  SELECT cast(count(*) as bigint) AS k, max(t) AS t,
       |    cast(sum(cast(round(rate, 9) as decimal(25,9))) as double) AS s1,
       |    cast(sum(cast(round(rate * rate, 9) as decimal(30,9))) as double) AS s2
       |  FROM r),
       |prior AS (
       |  -- alpha/beta pinned at 2 decimals: pv sits on a catastrophic
       |  -- cancellation (between-variance barely above m/t), so the raw
       |  -- quotient differs in the last double bit across engines
       |  SELECT t,
       |    round((s1 / k) * (s1 / k)
       |      / greatest((s2 - s1 * s1 / k) / (k - 1) - (s1 / k) / t, 1e-9), 2)
       |      AS alpha,
       |    round((s1 / k)
       |      / greatest((s2 - s1 * s1 / k) / (k - 1) - (s1 / k) / t, 1e-9), 2)
       |      AS beta
       |  FROM mom)
       |SELECT cast(r.cat as int) AS category, r.x AS n_demands,
       |  round(r.rate, 6) + 0.0 AS raw_rate,
       |  round((r.x + prior.alpha) / (r.t + prior.beta), 6) + 0.0 AS eb_rate,
       |  round(prior.alpha, 2) + 0.0 AS prior_alpha
       |FROM r CROSS JOIN prior ORDER BY category""".stripMargin

  // q509 propensity-score matching (nearest-neighbor, with replacement):
  // treated users matched to the nearest control PRE-PERIOD click score
  // (tie -> lower control score, then lower control id), ATT over
  // matched pairs. Nearest-neighbor by sorted-scores lag/lead — never a
  // treated x control cross join.
  private def psmSql(dayNum: String => String): String =
    s"""WITH rng AS (SELECT min(${dayNum("ts")}) AS d0 FROM events),
       |u AS (
       |  SELECT e.user_id,
       |    CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
       |    cast(sum(CASE WHEN e.event_type = 'click'
       |      AND ${dayNum("e.ts")} < r.d0 + 15 THEN 1 ELSE 0 END) as bigint) AS score,
       |    cast(sum(CASE WHEN e.event_type = 'purchase'
       |      AND ${dayNum("e.ts")} >= r.d0 + 15 THEN 1 ELSE 0 END) as bigint) AS y
       |  FROM events e CROSS JOIN rng r GROUP BY e.user_id),
       |crep AS (
       |  SELECT score, y FROM (
       |    SELECT score, y, row_number() OVER (PARTITION BY score
       |      ORDER BY user_id) AS rk
       |    FROM u WHERE treated = 0) z WHERE rk = 1),
       |sc AS (
       |  SELECT score AS s, 1 AS is_t FROM (SELECT DISTINCT score FROM u
       |    WHERE treated = 1) a
       |  UNION ALL
       |  SELECT score AS s, 0 AS is_t FROM crep),
       |near AS (
       |  SELECT s, is_t,
       |    max(CASE WHEN is_t = 0 THEN s END)
       |      OVER (ORDER BY s, is_t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS prev_c,
       |    min(CASE WHEN is_t = 0 THEN s END)
       |      OVER (ORDER BY s, is_t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |      AS next_c
       |  FROM sc),
       |mt AS (
       |  SELECT s AS tscore,
       |    CASE
       |      WHEN prev_c IS NULL THEN next_c
       |      WHEN next_c IS NULL THEN prev_c
       |      WHEN s - prev_c <= next_c - s THEN prev_c
       |      ELSE next_c END AS mscore
       |  FROM near WHERE is_t = 1),
       |att AS (
       |  SELECT u.user_id, u.y AS yt, c.y AS yc
       |  FROM u JOIN mt ON mt.tscore = u.score
       |  JOIN crep c ON c.score = mt.mscore
       |  WHERE u.treated = 1)
       |SELECT cast(count(*) as bigint) AS n_matched,
       |  round(cast(sum(yt - yc) as double) / count(*), 6) + 0.0 AS att,
       |  round(cast(sum(yt) as double) / count(*), 6) + 0.0 AS mean_treated,
       |  round(cast(sum(yc) as double) / count(*), 6) + 0.0 AS mean_matched_control
       |FROM att""".stripMargin

  // q510 sharp regression discontinuity at account balance 0: local
  // linear fits on both sides of the cutoff (bandwidth 2000), effect =
  // intercept gap at the cutoff.
  private val rddSql =
    """WITH cust AS (
      |  SELECT c.c_custkey, cast(c.c_acctbal as double) AS x,
      |    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double)
      |      / count(*) AS y
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  WHERE c.c_acctbal >= -2000 AND c.c_acctbal < 2000
      |  GROUP BY c.c_custkey, c.c_acctbal),
      |s AS (
      |  SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side,
      |    cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
      |    cast(sum(cast(round(y, 6) as decimal(25,6))) as double) AS sy,
      |    cast(sum(cast(round(x * y, 4) as decimal(30,4))) as double) AS sxy,
      |    cast(sum(cast(round(x * x, 4) as decimal(30,4))) as double) AS sxx
      |  FROM cust GROUP BY 1),
      |co AS (
      |  SELECT side, n,
      |    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 12) AS b,
      |    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9) AS a
      |  FROM s),
      |px AS (SELECT
      |    max(CASE WHEN side = 1 THEN a END) AS ar,
      |    max(CASE WHEN side = 0 THEN a END) AS al,
      |    max(CASE WHEN side = 1 THEN b END) AS br,
      |    max(CASE WHEN side = 0 THEN b END) AS bl,
      |    max(CASE WHEN side = 1 THEN n END) AS nr,
      |    max(CASE WHEN side = 0 THEN n END) AS nl
      |  FROM co)
      |SELECT nl AS n_left, nr AS n_right,
      |  round(ar - al, 6) + 0.0 AS rdd_effect,
      |  round(bl, 9) + 0.0 AS slope_left, round(br, 9) + 0.0 AS slope_right
      |FROM px""".stripMargin

  // q511 Wald instrumental-variable estimator: instrument = user parity,
  // exposure = click count, outcome = purchase count; the first-stage
  // difference is reported so a weak instrument is visible.
  private val waldIvSql =
    """WITH u AS (
      |  SELECT user_id, cast(user_id % 2 as int) AS z,
      |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS x,
      |    cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS y
      |  FROM events GROUP BY user_id),
      |s AS (
      |  SELECT z, cast(count(*) as bigint) AS n,
      |    cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy
      |  FROM u GROUP BY z),
      |px AS (SELECT
      |    max(CASE WHEN z = 1 THEN cast(sx as double) / n END) AS x1,
      |    max(CASE WHEN z = 0 THEN cast(sx as double) / n END) AS x0,
      |    max(CASE WHEN z = 1 THEN cast(sy as double) / n END) AS y1,
      |    max(CASE WHEN z = 0 THEN cast(sy as double) / n END) AS y0,
      |    cast(sum(n) as bigint) AS n
      |  FROM s)
      |SELECT n AS n_users,
      |  round(y1 - y0, 6) + 0.0 AS reduced_form,
      |  round(x1 - x0, 6) + 0.0 AS first_stage,
      |  round((y1 - y0) / (x1 - x0), 6) + 0.0 AS wald_iv
      |FROM px""".stripMargin

  // q512 event study around each user's first purchase: mean daily click
  // count by relative day in [-5, +5], plus the delta against the r=-1
  // anchor (the pre-trend row a reviewer reads first).
  private def eventStudySql(dayNum: String => String): String =
    s"""WITH fp AS (
       |  SELECT user_id, min(${dayNum("ts")}) AS d_adopt
       |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
       |clicks AS (
       |  SELECT e.user_id, ${dayNum("ts")} AS d, cast(count(*) as bigint) AS c
       |  FROM events e WHERE e.event_type = 'click'
       |  GROUP BY e.user_id, ${dayNum("ts")}),
       |rel AS (
       |  SELECT cast(c.d - f.d_adopt as bigint) AS r, c.c
       |  FROM clicks c JOIN fp f ON f.user_id = c.user_id
       |  WHERE c.d - f.d_adopt BETWEEN -5 AND 5),
       |per AS (
       |  SELECT r, cast(count(*) as bigint) AS n,
       |    round(cast(sum(c) as double) / count(*), 9) AS avg_clicks
       |  FROM rel GROUP BY r),
       |anchor AS (SELECT avg_clicks AS a FROM per WHERE r = -1)
       |SELECT cast(per.r as int) AS rel_day, per.n,
       |  round(per.avg_clicks, 6) + 0.0 AS avg_clicks,
       |  round(per.avg_clicks - anchor.a, 6) + 0.0 AS delta_vs_pre
       |FROM per CROSS JOIN anchor ORDER BY rel_day""".stripMargin

  // q513 Breusch-Pagan heteroskedasticity LM test on the acctbal ->
  // mean-order-value regression: n * R^2 of e^2 on x.
  private val breuschPaganSql =
    """WITH cust AS (
      |  SELECT cast(c.c_acctbal as double) AS x,
      |    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double)
      |      / count(*) AS y
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_custkey, c.c_acctbal),
      |s AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
      |    cast(sum(cast(round(y, 6) as decimal(25,6))) as double) AS sy,
      |    cast(sum(cast(round(x * y, 4) as decimal(30,4))) as double) AS sxy,
      |    cast(sum(cast(round(x * x, 4) as decimal(30,4))) as double) AS sxx
      |  FROM cust),
      |co AS (
      |  SELECT n, round((n * sxy - sx * sy) / (n * sxx - sx * sx), 12) AS b,
      |    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9) AS a
      |  FROM s),
      |e2 AS (
      |  SELECT cust.x,
      |    round((cust.y - co.a - co.b * cust.x) * (cust.y - co.a - co.b * cust.x), 6)
      |      AS e2
      |  FROM cust CROSS JOIN co),
      |aux AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
      |    cast(sum(cast(e2 as decimal(30,6))) as double) AS se,
      |    cast(sum(cast(round(x * e2, 2) as decimal(35,2))) as double) AS sxe,
      |    cast(sum(cast(round(x * x, 4) as decimal(30,4))) as double) AS sxx,
      |    cast(sum(cast(round(e2 * e2, 2) as decimal(38,2))) as double) AS see
      |  FROM e2)
      |SELECT n AS n_obs,
      |  round(cast(n as double)
      |    * ((n * sxe - sx * se) * (n * sxe - sx * se))
      |    / ((n * sxx - sx * sx) * (n * see - se * se)), 6) + 0.0 AS bp_lm
      |FROM aux""".stripMargin

  // q514 heteroskedasticity-robust (HC0) standard error for the same
  // slope, reported against the classical OLS SE.
  private val hc0Sql =
    """WITH cust AS (
      |  SELECT cast(c.c_acctbal as double) AS x,
      |    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double)
      |      / count(*) AS y
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_custkey, c.c_acctbal),
      |s AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
      |    cast(sum(cast(round(y, 6) as decimal(25,6))) as double) AS sy,
      |    cast(sum(cast(round(x * y, 4) as decimal(30,4))) as double) AS sxy,
      |    cast(sum(cast(round(x * x, 4) as decimal(30,4))) as double) AS sxx
      |  FROM cust),
      |co AS (
      |  SELECT n, sx / n AS mx,
      |    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 12) AS b,
      |    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9) AS a
      |  FROM s),
      |terms AS (
      |  SELECT (cust.x - co.mx) * (cust.x - co.mx) AS xt2,
      |    round((cust.x - co.mx) * (cust.x - co.mx)
      |      * (cust.y - co.a - co.b * cust.x) * (cust.y - co.a - co.b * cust.x), 2)
      |      AS xt2e2,
      |    round((cust.y - co.a - co.b * cust.x)
      |      * (cust.y - co.a - co.b * cust.x), 6) AS e2
      |  FROM cust CROSS JOIN co),
      |agg AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(xt2, 2) as decimal(30,2))) as double) AS sxx,
      |    cast(sum(cast(xt2e2 as decimal(38,2))) as double) AS sxxee,
      |    cast(sum(cast(e2 as decimal(30,6))) as double) AS sse
      |  FROM terms)
      |SELECT n AS n_obs,
      |  round((SELECT b FROM co), 9) + 0.0 AS slope,
      |  round(sqrt(sse / (n - 2) / sxx), 9) + 0.0 AS se_classic,
      |  round(sqrt(sxxee / (sxx * sxx)), 9) + 0.0 AS se_hc0,
      |  round(sqrt(sxxee / (sxx * sxx)) / sqrt(sse / (n - 2) / sxx), 6) + 0.0
      |    AS robust_ratio
      |FROM agg""".stripMargin

  // q515 panel fixed-effects (within) estimator over the (user, day)
  // panel: clicks -> purchases with user effects demeaned away; within
  // R^2 and the FE-consistent slope.
  private def fixedEffectsSql(dayNum: String => String): String =
    s"""WITH panel AS (
       |  SELECT user_id, ${dayNum("ts")} AS d,
       |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS x,
       |    cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS y
       |  FROM events GROUP BY user_id, ${dayNum("ts")}),
       |um AS (
       |  SELECT user_id, cast(count(*) as bigint) AS t,
       |    round(cast(sum(x) as double) / count(*), 9) AS mx,
       |    round(cast(sum(y) as double) / count(*), 9) AS my
       |  FROM panel GROUP BY user_id),
       |w AS (
       |  SELECT p.x - um.mx AS xt, p.y - um.my AS yt
       |  FROM panel p JOIN um ON um.user_id = p.user_id),
       |agg AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(round(xt * yt, 6) as decimal(30,6))) as double) AS sxy,
       |    cast(sum(cast(round(xt * xt, 6) as decimal(30,6))) as double) AS sxx,
       |    cast(sum(cast(round(yt * yt, 6) as decimal(30,6))) as double) AS syy
       |  FROM w),
       |g AS (SELECT cast(count(*) as bigint) AS g FROM um)
       |SELECT agg.n AS n_obs, g.g AS n_users,
       |  round(sxy / sxx, 9) + 0.0 AS fe_slope,
       |  round((sxy / sxx) * (sxy / sxx) * sxx / syy, 6) + 0.0 AS r2_within
       |FROM agg CROSS JOIN g""".stripMargin

  // q516 cluster-robust (by user) standard error for the q515 within
  // slope: sqrt(sum_g (sum_i xt*e)^2) / sum xt^2 (no small-sample
  // factor — documented).
  private def clusteredSeSql(dayNum: String => String): String =
    s"""WITH panel AS (
       |  SELECT user_id, ${dayNum("ts")} AS d,
       |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS x,
       |    cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS y
       |  FROM events GROUP BY user_id, ${dayNum("ts")}),
       |um AS (
       |  SELECT user_id, round(cast(sum(x) as double) / count(*), 9) AS mx,
       |    round(cast(sum(y) as double) / count(*), 9) AS my
       |  FROM panel GROUP BY user_id),
       |w AS (
       |  SELECT p.user_id, p.x - um.mx AS xt, p.y - um.my AS yt
       |  FROM panel p JOIN um ON um.user_id = p.user_id),
       |bb AS (
       |  SELECT round(
       |    cast(sum(cast(round(xt * yt, 6) as decimal(30,6))) as double)
       |    / cast(sum(cast(round(xt * xt, 6) as decimal(30,6))) as double), 12) AS b,
       |    cast(sum(cast(round(xt * xt, 6) as decimal(30,6))) as double) AS sxx
       |  FROM w),
       |cl AS (
       |  SELECT w.user_id,
       |    cast(sum(cast(round(w.xt * (w.yt - bb.b * w.xt), 6) as decimal(30,6)))
       |      as double) AS score
       |  FROM w CROSS JOIN bb GROUP BY w.user_id),
       |meat AS (
       |  SELECT cast(sum(cast(round(score * score, 6) as decimal(35,6)))
       |    as double) AS m, cast(count(*) as bigint) AS g
       |  FROM cl)
       |SELECT meat.g AS n_clusters,
       |  round(bb.b, 9) + 0.0 AS fe_slope,
       |  round(sqrt(meat.m) / bb.sxx, 9) + 0.0 AS se_clustered
       |FROM meat CROSS JOIN bb""".stripMargin

  // q517 Gaussian kernel density of ln(order value) at a fixed 9-point
  // grid (h = 0.75): one scan, per-point pinned folds.
  private val kdeSql = {
    val pts = (0 until 9).map(i => 7.0 + 0.75 * i)
    val grid = pts.map(p => s"SELECT ${p}E0 AS g").mkString(" UNION ALL ")
    s"""WITH base AS (
  SELECT ln(cast(o_totalprice as double)) AS y
  FROM orders WHERE o_totalprice > 0),
grid AS ($grid),
n AS (SELECT cast(count(*) as bigint) AS n FROM base)
SELECT grid.g + 0.0 AS grid_point,
  round(cast(sum(cast(round(
      exp(-(base.y - grid.g) * (base.y - grid.g) / (2 * 0.75E0 * 0.75E0)), 12)
    as decimal(25,12))) as double)
    / (max(n.n) * 0.75E0 * sqrt(2 * 3.14159265358979E0)), 9) + 0.0 AS density
FROM grid CROSS JOIN base CROSS JOIN n
GROUP BY grid.g ORDER BY grid_point"""
  }

  // q518 Nadaraya-Watson kernel regression of mean order value on
  // account balance at a fixed grid (Gaussian h = 1000).
  private val nadarayaWatsonSql = {
    val grid = (0 to 8).map(i => s"SELECT ${i * 1000}.0E0 AS g").mkString(" UNION ALL ")
    s"""WITH cust AS (
  SELECT cast(c.c_acctbal as double) AS x,
    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double)
      / count(*) AS y
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal),
grid AS ($grid)
SELECT grid.g + 0.0 AS grid_point,
  round(cast(sum(cast(round(
      exp(-(cust.x - grid.g) * (cust.x - grid.g) / (2 * 1000.0E0 * 1000.0E0))
      * cust.y, 6) as decimal(30,6))) as double)
    / cast(sum(cast(round(
      exp(-(cust.x - grid.g) * (cust.x - grid.g) / (2 * 1000.0E0 * 1000.0E0)),
      12) as decimal(25,12))) as double), 6) + 0.0 AS nw_fit
FROM grid CROSS JOIN cust
GROUP BY grid.g ORDER BY grid_point"""
  }

  // q519 LOESS-lite: local LINEAR fit with tricube weights (h = 2000)
  // at the same grid — the smoother that tracks slopes where NW flattens.
  private val loessSql = {
    val grid = (0 to 8).map(i => s"SELECT ${i * 1000}.0E0 AS g").mkString(" UNION ALL ")
    s"""WITH cust AS (
  SELECT cast(c.c_acctbal as double) AS x,
    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double)
      / count(*) AS y
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal),
grid AS ($grid),
wts AS (
  SELECT grid.g, cust.x, cust.y,
    round(power(1 - power(abs(cust.x - grid.g) / 2000.0E0, 3), 3), 12) AS w
  FROM grid CROSS JOIN cust
  WHERE abs(cust.x - grid.g) < 2000.0E0),
agg AS (
  SELECT g, cast(count(*) as bigint) AS n_local,
    cast(sum(cast(round(w, 12) as decimal(25,12))) as double) AS sw,
    cast(sum(cast(round(w * x, 6) as decimal(30,6))) as double) AS swx,
    cast(sum(cast(round(w * y, 6) as decimal(30,6))) as double) AS swy,
    cast(sum(cast(round(w * x * x, 2) as decimal(35,2))) as double) AS swxx,
    cast(sum(cast(round(w * x * y, 2) as decimal(35,2))) as double) AS swxy
  FROM wts GROUP BY g)
SELECT g + 0.0 AS grid_point, n_local,
  round((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx) * swx) / sw
    + (sw * swxy - swx * swy) / (sw * swxx - swx * swx) * g, 6) + 0.0
    AS loess_fit
FROM agg ORDER BY grid_point"""
  }

  // q520 median (LAD) regression by 3 unrolled IRLS rounds: weights
  // 1/max(|e|, 0.001), weighted-OLS closed form re-pinned each round.
  private def ladSql(rounds: Int = 3): String = {
    val steps = (1 to rounds).map { k =>
      val pp = s"par${k - 1}"
      s""",
w$k AS (
  SELECT c.x, c.y,
    round(1.0E0 / greatest(abs(c.y - $pp.a - $pp.b * c.x), 0.001E0), 9) AS w
  FROM cust c CROSS JOIN $pp),
s$k AS (
  SELECT
    cast(sum(cast(round(w, 9) as decimal(30,9))) as double) AS sw,
    cast(sum(cast(round(w * x, 4) as decimal(35,4))) as double) AS swx,
    cast(sum(cast(round(w * y, 4) as decimal(35,4))) as double) AS swy,
    cast(sum(cast(round(w * x * x, 2) as decimal(38,2))) as double) AS swxx,
    cast(sum(cast(round(w * x * y, 2) as decimal(38,2))) as double) AS swxy
  FROM w$k),
par$k AS (
  SELECT round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 12) AS b,
    round((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx) * swx)
      / sw, 9) AS a
  FROM s$k)"""
    }.mkString
    s"""WITH cust AS (
  SELECT cast(c.c_acctbal as double) AS x,
    cast(sum(cast(round(o.o_totalprice, 2) as decimal(25,2))) as double)
      / count(*) AS y
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal),
s0 AS (
  SELECT cast(count(*) as bigint) AS n,
    cast(sum(cast(round(x, 2) as decimal(25,2))) as double) AS sx,
    cast(sum(cast(round(y, 6) as decimal(25,6))) as double) AS sy,
    cast(sum(cast(round(x * y, 4) as decimal(30,4))) as double) AS sxy,
    cast(sum(cast(round(x * x, 4) as decimal(30,4))) as double) AS sxx
  FROM cust),
par0 AS (
  SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 12) AS b,
    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9) AS a
  FROM s0)$steps,
mae AS (
  SELECT cast(sum(cast(round(abs(c.y - p.a - p.b * c.x), 4) as decimal(30,4)))
    as double) / count(*) AS mae
  FROM cust c CROSS JOIN par$rounds p)
SELECT round(par$rounds.a, 6) + 0.0 AS lad_intercept,
  round(par$rounds.b, 9) + 0.0 AS lad_slope,
  round(mae.mae, 6) + 0.0 AS mean_abs_error
FROM par$rounds CROSS JOIN mae"""
  }

  // q521 Poisson GLM (log link, intercept + clicks) on the (user, day)
  // panel: 3 unrolled Newton rounds, closed-form 2x2 solve, pinned state.
  private def poissonGlmSql(dayNum: String => String, rounds: Int = 3): String = {
    val steps = (1 to rounds).map { k =>
      val pp = s"par${k - 1}"
      s""",
m$k AS (
  SELECT p.x, p.y, exp($pp.a + $pp.b * p.x) AS mu
  FROM panel p CROSS JOIN $pp),
g$k AS (
  SELECT
    cast(sum(cast(round(y - mu, 9) as decimal(30,9))) as double) AS g1,
    cast(sum(cast(round(x * (y - mu), 9) as decimal(30,9))) as double) AS g2,
    cast(sum(cast(round(mu, 9) as decimal(30,9))) as double) AS h11,
    cast(sum(cast(round(x * mu, 9) as decimal(30,9))) as double) AS h12,
    cast(sum(cast(round(x * x * mu, 6) as decimal(35,6))) as double) AS h22
  FROM m$k),
par$k AS (
  SELECT round($pp.a + (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12), 9) AS a,
    round($pp.b + (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12), 9) AS b
  FROM g$k CROSS JOIN $pp)"""
    }.mkString
    s"""WITH panel AS (
  SELECT user_id, ${dayNum("ts")} AS d,
    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as double) AS x,
    cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as double) AS y
  FROM events GROUP BY user_id, ${dayNum("ts")}),
init AS (
  SELECT round(ln(cast(sum(cast(y as decimal(20,1))) as double) / count(*)), 9)
    AS a0
  FROM panel),
par0 AS (SELECT a0 AS a, cast(0.0 as double) AS b FROM init)$steps
SELECT round(par$rounds.a, 6) + 0.0 AS glm_intercept,
  round(par$rounds.b, 6) + 0.0 AS glm_click_coef,
  round(exp(par$rounds.b), 6) + 0.0 AS rate_ratio_per_click
FROM par$rounds"""
  }

  // q522 Cox proportional hazards (one binary covariate = user parity,
  // Breslow ties): the per-event-time risk sums reduce to closed forms
  // in (n1, n, d1, d) for a binary covariate; 3 unrolled Newton rounds
  // over the metadata-sized risk table.
  private def coxPhSql(micros: String => String, idiv: String, rounds: Int = 3): String = {
    val steps = (1 to rounds).map { k =>
      val pp = s"b${k - 1}"
      s""",
u$k AS (
  SELECT
    cast(sum(cast(round(
      r.d1 - r.d * (r.n1 * exp($pp.b)) / (r.n0 + r.n1 * exp($pp.b)), 9)
      as decimal(25,9))) as double) AS u,
    cast(sum(cast(round(
      r.d * ((r.n1 * exp($pp.b)) / (r.n0 + r.n1 * exp($pp.b)))
        * (1 - (r.n1 * exp($pp.b)) / (r.n0 + r.n1 * exp($pp.b))), 9)
      as decimal(25,9))) as double) AS i
  FROM risk r CROSS JOIN $pp),
b$k AS (SELECT round($pp.b + u$k.u / u$k.i, 9) AS b FROM u$k CROSS JOIN $pp)"""
    }.mkString
    s"""WITH s AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
mx AS (SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
dur AS (
  SELECT s.user_id, cast(s.user_id % 2 as int) AS grp,
    CASE WHEN p.t1 IS NOT NULL
      THEN (${micros("p.t1")} - ${micros("s.t0")}) $idiv 3600000000
      ELSE (${micros("mx.tmax")} - ${micros("s.t0")}) $idiv 3600000000 END AS hrs,
    (p.t1 IS NOT NULL) AS observed
  FROM s JOIN mx ON s.user_id = mx.user_id
  LEFT JOIN p ON s.user_id = p.user_id),
ev AS (
  SELECT hrs, grp,
    cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
    cast(count(*) as bigint) AS leaving
  FROM dur GROUP BY hrs, grp),
times AS (
  SELECT hrs, cast(sum(d) as bigint) AS dt FROM ev GROUP BY hrs
  HAVING sum(d) > 0),
risk AS (
  SELECT t.hrs, t.dt AS d,
    cast(sum(CASE WHEN ev.grp = 1 AND ev.hrs = t.hrs THEN ev.d ELSE 0 END)
      as bigint) AS d1,
    cast(sum(CASE WHEN ev.grp = 1 THEN ev.leaving ELSE 0 END) as double) AS n1,
    cast(sum(CASE WHEN ev.grp = 0 THEN ev.leaving ELSE 0 END) as double) AS n0
  FROM times t JOIN ev ON ev.hrs >= t.hrs
  GROUP BY t.hrs, t.dt),
b0 AS (SELECT cast(0.0 as double) AS b)$steps
SELECT round(b$rounds.b, 6) + 0.0 AS cox_log_hr,
  round(exp(b$rounds.b), 6) + 0.0 AS hazard_ratio
FROM b$rounds"""
  }

  // q523 information-criteria table: mean-only vs AR(1) vs AR(2) on the
  // common t >= 3 sample, conditional-LS RSS via correlation closed
  // forms, Gaussian loglik -> AIC/BIC.
  private def aicTableSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |lagd AS (
       |  SELECT y,
       |    lag(y, 1) OVER (ORDER BY d) AS y1,
       |    lag(y, 2) OVER (ORDER BY d) AS y2
       |  FROM daily),
       |w AS (SELECT y, y1, y2 FROM lagd WHERE y2 IS NOT NULL),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(y as decimal(20,1))) as double) AS sy,
       |    cast(sum(cast(y1 as decimal(20,1))) as double) AS sy1,
       |    cast(sum(cast(y2 as decimal(20,1))) as double) AS sy2,
       |    cast(sum(cast(round(y * y, 2) as decimal(25,2))) as double) AS syy,
       |    cast(sum(cast(round(y1 * y1, 2) as decimal(25,2))) as double) AS s11,
       |    cast(sum(cast(round(y2 * y2, 2) as decimal(25,2))) as double) AS s22,
       |    cast(sum(cast(round(y * y1, 2) as decimal(25,2))) as double) AS sy_1,
       |    cast(sum(cast(round(y * y2, 2) as decimal(25,2))) as double) AS sy_2,
       |    cast(sum(cast(round(y1 * y2, 2) as decimal(25,2))) as double) AS s12
       |  FROM w),
       |r AS (
       |  SELECT n,
       |    syy - sy * sy / n AS vy,
       |    round((sy_1 - sy * sy1 / n)
       |      / sqrt((syy - sy * sy / n) * (s11 - sy1 * sy1 / n)), 9) AS r1,
       |    round((sy_2 - sy * sy2 / n)
       |      / sqrt((syy - sy * sy / n) * (s22 - sy2 * sy2 / n)), 9) AS r2,
       |    round((s12 - sy1 * sy2 / n)
       |      / sqrt((s11 - sy1 * sy1 / n) * (s22 - sy2 * sy2 / n)), 9) AS r12
       |  FROM m),
       |mod AS (
       |  SELECT 'M0_mean' AS model, 1 AS k, n, round(vy, 6) AS rss FROM r
       |  UNION ALL
       |  SELECT 'M1_ar1', 2, n, round(vy * (1 - r1 * r1), 6) FROM r
       |  UNION ALL
       |  SELECT 'M2_ar2', 3, n,
       |    round(vy * (1 - (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12)
       |      / (1 - r12 * r12)), 6)
       |  FROM r),
       |ll AS (
       |  SELECT model, k, n,
       |    round(-(n / 2.0E0) * (ln(2 * 3.14159265358979E0 * rss / n) + 1), 6)
       |      AS loglik
       |  FROM mod)
       |SELECT model, cast(k as int) AS n_params,
       |  loglik + 0.0 AS loglik,
       |  round(2.0E0 * k - 2 * loglik, 6) + 0.0 AS aic,
       |  round(k * ln(cast(n as double)) - 2 * loglik, 6) + 0.0 AS bic
       |FROM ll ORDER BY model""".stripMargin

  // q524 Granger causality (lag 1): does yesterday's click count improve
  // the purchase-count forecast beyond its own lag? F-test of the
  // two-predictor vs one-predictor conditional-LS fits.
  private def grangerSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d,
       |    cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      as double) AS y,
       |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      as double) AS x
       |  FROM events GROUP BY 1),
       |lagd AS (
       |  SELECT y,
       |    lag(y, 1) OVER (ORDER BY d) AS y1,
       |    lag(x, 1) OVER (ORDER BY d) AS x1
       |  FROM daily),
       |w AS (SELECT y, y1, x1 FROM lagd WHERE y1 IS NOT NULL),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(y as decimal(20,1))) as double) AS sy,
       |    cast(sum(cast(y1 as decimal(20,1))) as double) AS sy1,
       |    cast(sum(cast(x1 as decimal(20,1))) as double) AS sx1,
       |    cast(sum(cast(round(y * y, 2) as decimal(25,2))) as double) AS syy,
       |    cast(sum(cast(round(y1 * y1, 2) as decimal(25,2))) as double) AS s11,
       |    cast(sum(cast(round(x1 * x1, 2) as decimal(25,2))) as double) AS sxx,
       |    cast(sum(cast(round(y * y1, 2) as decimal(25,2))) as double) AS sy_1,
       |    cast(sum(cast(round(y * x1, 2) as decimal(25,2))) as double) AS sy_x,
       |    cast(sum(cast(round(y1 * x1, 2) as decimal(25,2))) as double) AS s1x
       |  FROM w),
       |r AS (
       |  SELECT n,
       |    round((sy_1 - sy * sy1 / n)
       |      / sqrt((syy - sy * sy / n) * (s11 - sy1 * sy1 / n)), 9) AS r1,
       |    round((sy_x - sy * sx1 / n)
       |      / sqrt((syy - sy * sy / n) * (sxx - sx1 * sx1 / n)), 9) AS rx,
       |    round((s1x - sy1 * sx1 / n)
       |      / sqrt((s11 - sy1 * sy1 / n) * (sxx - sx1 * sx1 / n)), 9) AS r1x
       |  FROM m),
       |f AS (
       |  SELECT n, r1 * r1 AS r2r,
       |    (r1 * r1 + rx * rx - 2 * r1 * rx * r1x) / (1 - r1x * r1x) AS r2u
       |  FROM r)
       |SELECT n AS n_obs,
       |  round(r2r, 6) + 0.0 AS r2_restricted,
       |  round(r2u, 6) + 0.0 AS r2_unrestricted,
       |  round((r2u - r2r) / (1 - r2u) * (n - 3), 6) + 0.0 AS granger_f
       |FROM f""".stripMargin

  // q525 Engle ARCH(1) LM test: AR(1) conditional-LS residuals, then
  // n*R^2 of e^2 on lagged e^2.
  private def archSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |lagd AS (
       |  SELECT d, y, lag(y, 1) OVER (ORDER BY d) AS y1 FROM daily),
       |w AS (SELECT d, y, y1 FROM lagd WHERE y1 IS NOT NULL),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(y as decimal(20,1))) as double) AS sy,
       |    cast(sum(cast(y1 as decimal(20,1))) as double) AS sy1,
       |    cast(sum(cast(round(y * y1, 2) as decimal(25,2))) as double) AS syy1,
       |    cast(sum(cast(round(y1 * y1, 2) as decimal(25,2))) as double) AS s11
       |  FROM w),
       |co AS (
       |  SELECT round((n * syy1 - sy * sy1) / (n * s11 - sy1 * sy1), 12) AS b,
       |    round((sy - (n * syy1 - sy * sy1) / (n * s11 - sy1 * sy1) * sy1)
       |      / n, 9) AS a
       |  FROM m),
       |e2 AS (
       |  SELECT w.d,
       |    round((w.y - co.a - co.b * w.y1) * (w.y - co.a - co.b * w.y1), 6) AS e2
       |  FROM w CROSS JOIN co),
       |le AS (
       |  SELECT e2, lag(e2) OVER (ORDER BY d) AS e2l FROM e2),
       |w2 AS (SELECT e2, e2l FROM le WHERE e2l IS NOT NULL),
       |aux AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(e2 as decimal(30,6))) as double) AS s1,
       |    cast(sum(cast(e2l as decimal(30,6))) as double) AS sl,
       |    cast(sum(cast(round(e2 * e2l, 2) as decimal(38,2))) as double) AS slx,
       |    cast(sum(cast(round(e2 * e2, 2) as decimal(38,2))) as double) AS s2,
       |    cast(sum(cast(round(e2l * e2l, 2) as decimal(38,2))) as double) AS sl2
       |  FROM w2)
       |SELECT n AS n_obs,
       |  round(cast(n as double) * ((n * slx - s1 * sl) * (n * slx - s1 * sl))
       |    / ((n * sl2 - sl * sl) * (n * s2 - s1 * s1)), 6) + 0.0 AS arch_lm
       |FROM aux""".stripMargin

  // q526 Ljung-Box portmanteau (lags 1-5) on the AR(1) residuals:
  // Q = n(n+2) sum r_k^2 / (n-k), pinned residual autocovariances.
  private def ljungBoxSql(dayNum: String => String): String = {
    val lagCols = (1 to 5).map(k => s"lag(e, $k) OVER (ORDER BY d) AS e$k").mkString(",\n       |    ")
    val covs = (1 to 5).map(k =>
      s"""cast(sum(cast(round(CASE WHEN e$k IS NOT NULL THEN e * e$k ELSE 0.0E0 END, 6)
         |      as decimal(30,6))) as double) AS c$k""".stripMargin).mkString(",\n       |    ")
    val terms = (1 to 5).map(k =>
      s"round((c$k / c0) * (c$k / c0), 9) / (n - $k)").mkString("\n       |    + ")
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |lagd AS (
       |  SELECT d, y, lag(y, 1) OVER (ORDER BY d) AS y1 FROM daily),
       |w AS (SELECT d, y, y1 FROM lagd WHERE y1 IS NOT NULL),
       |m AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(y as decimal(20,1))) as double) AS sy,
       |    cast(sum(cast(y1 as decimal(20,1))) as double) AS sy1,
       |    cast(sum(cast(round(y * y1, 2) as decimal(25,2))) as double) AS syy1,
       |    cast(sum(cast(round(y1 * y1, 2) as decimal(25,2))) as double) AS s11
       |  FROM w),
       |co AS (
       |  SELECT round((n * syy1 - sy * sy1) / (n * s11 - sy1 * sy1), 12) AS b,
       |    round((sy - (n * syy1 - sy * sy1) / (n * s11 - sy1 * sy1) * sy1)
       |      / n, 9) AS a
       |  FROM m),
       |res AS (
       |  SELECT w.d, round(w.y - co.a - co.b * w.y1, 6) AS e
       |  FROM w CROSS JOIN co),
       |dm AS (
       |  SELECT cast(count(*) as bigint) AS n,
       |    cast(sum(cast(e as decimal(25,6))) as double) / count(*) AS mu
       |  FROM res),
       |ctr AS (
       |  SELECT res.d, res.e - dm.mu AS e FROM res CROSS JOIN dm),
       |lags AS (
       |  SELECT d, e,
       |    $lagCols
       |  FROM ctr),
       |cv AS (
       |  SELECT
       |    cast(sum(cast(round(e * e, 6) as decimal(30,6))) as double) AS c0,
       |    $covs
       |  FROM lags),
       |f AS (SELECT dm.n, cv.* FROM cv CROSS JOIN dm)
       |SELECT n AS n_obs,
       |  round(n * (n + 2.0E0) * (
       |    $terms), 6) + 0.0 AS ljung_box_q
       |FROM f""".stripMargin
  }

  // q527 local clustering coefficients + global transitivity of the
  // category co-purchase graph (common-neighbor counting over the
  // symmetric adjacency, never an enumeration of triangles per row).
  private val clusteringCoefSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 50 AS i FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.i AS u, b2.i AS v
      |  FROM b a JOIN b b2 ON b2.o = a.o AND b2.i > a.i),
      |sym AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
      |deg AS (SELECT x AS n, cast(count(*) as bigint) AS d FROM sym GROUP BY x),
      |tri AS (
      |  SELECT e.u, e.v, cast(count(*) as bigint) AS cn
      |  FROM e
      |  JOIN sym a ON a.x = e.u
      |  JOIN sym bb ON bb.x = e.v AND bb.y = a.y
      |  GROUP BY e.u, e.v),
      |nodetri AS (
      |  SELECT n, cast(sum(cn) as bigint) AS t FROM (
      |    SELECT u AS n, cn FROM tri UNION ALL SELECT v AS n, cn FROM tri) z
      |  GROUP BY n),
      |loc AS (
      |  SELECT deg.n, deg.d, coalesce(nodetri.t, 0) AS t2,
      |    CASE WHEN deg.d >= 2
      |      THEN round(cast(coalesce(nodetri.t, 0) as double)
      |        / (cast(deg.d as double) * (deg.d - 1)), 9)
      |      ELSE 0.0E0 END AS c
      |  FROM deg LEFT JOIN nodetri ON nodetri.n = deg.n)
      |SELECT cast(count(*) as bigint) AS n_nodes,
      |  round(cast(sum(cast(round(c, 9) as decimal(20,9))) as double)
      |    / count(*), 6) + 0.0 AS avg_clustering,
      |  round(cast(sum(t2) as double)
      |    / sum(cast(d as double) * (d - 1)), 6) + 0.0 AS transitivity
      |FROM loc""".stripMargin

  // q528 Little's law audit: lambda (signup arrivals/hr) and W (mean
  // episode duration) measured directly; L measured INDEPENDENTLY as
  // time-averaged concurrency over an hour spine (interval range join) —
  // the ratio L/(lambda W) exposes edge effects, it is not circular.
  private def littlesLawSql(micros: String => String, idiv: String,
      seq1000: String): String =
    s"""WITH s AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |p AS (
       |  SELECT e.user_id, min(e.ts) AS t1
       |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
       |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
       |mx AS (SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
       |ep AS (
       |  SELECT ${micros("s.t0")} $idiv 3600000000 AS h0,
       |    CASE WHEN p.t1 IS NOT NULL
       |      THEN ${micros("p.t1")} $idiv 3600000000
       |      ELSE ${micros("mx.tmax")} $idiv 3600000000 END AS h1
       |  FROM s JOIN mx ON mx.user_id = s.user_id
       |  LEFT JOIN p ON p.user_id = s.user_id),
       |rng AS (SELECT min(h0) AS hmin, max(h1) AS hmax FROM ep),
       |lam AS (
       |  SELECT cast(count(*) as bigint) AS arrivals,
       |    cast(max(r.hmax) - min(r.hmin) + 1 as double) AS period
       |  FROM ep CROSS JOIN rng r),
       |wbar AS (
       |  SELECT cast(sum(h1 - h0) as double) / count(*) AS w FROM ep),
       |spine AS (
       |  SELECT r.hmin + sp.i AS h
       |  FROM rng r CROSS JOIN ($seq1000) sp
       |  WHERE r.hmin + sp.i <= r.hmax),
       |conc AS (
       |  SELECT spine.h, cast(count(ep.h0) as bigint) AS l
       |  FROM spine LEFT JOIN ep ON spine.h >= ep.h0 AND spine.h < ep.h1
       |  GROUP BY spine.h)
       |SELECT lam.arrivals,
       |  round(lam.arrivals / lam.period, 6) + 0.0 AS lambda_per_hr,
       |  round(wbar.w, 6) + 0.0 AS w_mean_hrs,
       |  round(cast(sum(conc.l) as double) / count(*), 6) + 0.0 AS l_measured,
       |  round((cast(sum(conc.l) as double) / count(*))
       |    / (lam.arrivals / lam.period * wbar.w), 6) + 0.0 AS littles_ratio
       |FROM conc CROSS JOIN lam CROSS JOIN wbar
       |GROUP BY lam.arrivals, lam.period, wbar.w""".stripMargin

  // q529 Matthews correlation + balanced accuracy / F1 for the q456
  // priority-rate classifier at threshold 0.5 on the odd-key half.
  private val mccSql =
    """WITH tr AS (
      |  SELECT o_orderpriority AS g,
      |    round(cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as double)
      |      / count(*), 9) AS p
      |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
      |thr AS (
      |  -- threshold at the train prevalence: a 0.5 cut puts every
      |  -- priority (rates ~0.33) in one class and MCC degenerates
      |  SELECT round(cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |    as double) / count(*), 9) AS t
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |te AS (
      |  SELECT o.o_orderpriority AS g,
      |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders o WHERE o.o_orderkey % 2 = 1),
      |cm AS (
      |  SELECT
      |    cast(sum(CASE WHEN tr.p > thr.t AND te.y = 1 THEN 1 ELSE 0 END) as double) AS tp,
      |    cast(sum(CASE WHEN tr.p > thr.t AND te.y = 0 THEN 1 ELSE 0 END) as double) AS fp,
      |    cast(sum(CASE WHEN tr.p <= thr.t AND te.y = 1 THEN 1 ELSE 0 END) as double) AS fn,
      |    cast(sum(CASE WHEN tr.p <= thr.t AND te.y = 0 THEN 1 ELSE 0 END) as double) AS tn
      |  FROM te JOIN tr ON tr.g = te.g CROSS JOIN thr)
      |SELECT cast(tp as bigint) AS tp, cast(fp as bigint) AS fp,
      |  cast(fn as bigint) AS fn, cast(tn as bigint) AS tn,
      |  round((tp * tn - fp * fn)
      |    / sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)), 6) + 0.0 AS mcc,
      |  round((tp / (tp + fn) + tn / (tn + fp)) / 2, 6) + 0.0 AS balanced_acc,
      |  round(2 * tp / (2 * tp + fp + fn), 6) + 0.0 AS f1
      |FROM cm""".stripMargin

  // q530 Clayton copula dependence between daily clicks and purchases:
  // exact pair-sign Kendall tau over the day pairs, theta = 2 tau / (1 - tau).
  private def claytonSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d,
       |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS x,
       |    cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS y
       |  FROM events GROUP BY 1),
       |pr AS (
       |  SELECT
       |    cast(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END)
       |      as bigint) AS conc,
       |    cast(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END)
       |      as bigint) AS disc,
       |    cast(count(*) as bigint) AS np
       |  FROM daily a JOIN daily b ON b.d > a.d)
       |SELECT np AS n_pairs,
       |  round(cast(conc - disc as double) / np, 6) + 0.0 AS kendall_tau_a,
       |  round(2.0E0 * (cast(conc - disc as double) / np)
       |    / (1 - cast(conc - disc as double) / np), 6) + 0.0 AS clayton_theta
       |FROM pr""".stripMargin

  // q531 peaks-over-threshold GPD fit (method of moments) for order
  // values above the exact-rank p90: xi = (1 - m^2/s^2)/2,
  // sigma = m (1 + m^2/s^2)/2 — the tail model between Hill (q413) and
  // Gumbel block maxima (q404).
  private val gpdPotSql =
    """WITH rk AS (
      |  SELECT cast(o_totalprice as double) AS v,
      |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS i,
      |    count(*) OVER () AS n
      |  FROM orders),
      |thr AS (SELECT v AS u FROM rk WHERE i = cast(floor(n * 0.9E0) as bigint)),
      |exc AS (
      |  SELECT rk.v - thr.u AS e FROM rk CROSS JOIN thr WHERE rk.v > thr.u),
      |m AS (
      |  SELECT cast(count(*) as bigint) AS k,
      |    cast(sum(cast(round(e, 2) as decimal(30,2))) as double) AS s1,
      |    cast(sum(cast(round(e * e, 2) as decimal(38,2))) as double) AS s2
      |  FROM exc),
      |f AS (
      |  SELECT k, s1 / k AS mean_exc,
      |    (s2 - s1 * s1 / k) / (k - 1) AS var_exc
      |  FROM m)
      |SELECT k AS n_exceedances,
      |  round(mean_exc, 4) + 0.0 AS mean_excess,
      |  round((1 - mean_exc * mean_exc / var_exc) / 2, 6) + 0.0 AS gpd_xi,
      |  round(mean_exc * (1 + mean_exc * mean_exc / var_exc) / 2, 4) + 0.0
      |    AS gpd_sigma
      |FROM f""".stripMargin

  // q532 recommendation novelty: mean self-information -log2(popularity)
  // of the q349-style top-3 recommended items, against the catalog mean.
  private val recNoveltySql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |nb AS (SELECT cast(count(DISTINCT o) as bigint) AS nb FROM b),
      |cf AS (SELECT p, cast(count(*) as bigint) AS c FROM b GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b2.p AS pb, cast(count(*) as bigint) AS cab
      |  FROM b a JOIN b b2 ON b2.o = a.o AND b2.p <> a.p
      |  GROUP BY a.p, b2.p),
      |sim AS (
      |  SELECT pa, pb, cab,
      |    round(cast(cab as double) / sqrt(cast(ca.c as double) * cb.c), 6)
      |      + 0.0 AS cosine
      |  FROM pairs JOIN cf ca ON ca.p = pairs.pa JOIN cf cb ON cb.p = pairs.pb),
      |recs AS (
      |  SELECT pb FROM (
      |    SELECT pa, pb,
      |      row_number() OVER (PARTITION BY pa
      |                         ORDER BY cosine DESC, cab DESC, pb) AS rnk
      |    FROM sim) z WHERE rnk <= 3),
      |rnov AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(-ln(cast(cf.c as double) / nb.nb) / ln(2.0E0), 9)
      |      as decimal(25,9))) as double) AS s
      |  FROM recs JOIN cf ON cf.p = recs.pb CROSS JOIN nb),
      |cnov AS (
      |  SELECT cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(-ln(cast(cf.c as double) / nb.nb) / ln(2.0E0), 9)
      |      as decimal(25,9))) as double) AS s
      |  FROM cf CROSS JOIN nb)
      |SELECT rnov.n AS n_recommendations,
      |  round(rnov.s / rnov.n, 6) + 0.0 AS mean_novelty_bits,
      |  round(cnov.s / cnov.n, 6) + 0.0 AS catalog_novelty_bits,
      |  round(rnov.s / rnov.n - cnov.s / cnov.n, 6) + 0.0 AS novelty_gap
      |FROM rnov CROSS JOIN cnov""".stripMargin

  // q533 top conversion paths: the 3-event-type window immediately
  // preceding each purchase, ranked by frequency (top 10, deterministic
  // ties on the path string).
  private val conversionPathsSql =
    """WITH seq AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
      |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2,
      |    lag(event_type, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p3
      |  FROM events),
      |paths AS (
      |  SELECT concat(p3, ' > ', p2, ' > ', p1) AS path
      |  FROM seq
      |  WHERE event_type = 'purchase' AND p3 IS NOT NULL),
      |agg AS (
      |  SELECT path, cast(count(*) as bigint) AS n FROM paths GROUP BY path),
      |tot AS (SELECT cast(sum(n) as bigint) AS t FROM agg)
      |SELECT z.path, z.n,
      |  round(cast(z.n as double) / tot.t, 6) + 0.0 AS share
      |FROM (
      |  SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk
      |  FROM agg) z CROSS JOIN tot
      |WHERE z.rk <= 10 ORDER BY z.n DESC, z.path""".stripMargin

  // q534 law-of-one-price dispersion: per-part price CV across line
  // items, distribution summary + the 5 most dispersed parts.
  private val priceDispersionSql =
    """WITH pp AS (
      |  SELECT l_partkey AS p, cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(l_extendedprice / l_quantity, 4)
      |      as decimal(25,4))) as double) AS s1,
      |    cast(sum(cast(round((l_extendedprice / l_quantity)
      |      * (l_extendedprice / l_quantity), 2) as decimal(35,2))) as double) AS s2
      |  FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey
      |  HAVING count(*) >= 5),
      |cv AS (
      |  SELECT p, n,
      |    round(sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0E0))
      |      / (s1 / n), 9) AS cv
      |  FROM pp)
      |SELECT cast(z.p as bigint) AS partkey, z.n AS n_sales,
      |  round(z.cv, 6) + 0.0 AS price_cv,
      |  round(m.avg_cv, 6) + 0.0 AS catalog_avg_cv
      |FROM (
      |  SELECT p, n, cv, row_number() OVER (ORDER BY cv DESC, p) AS rk
      |  FROM cv) z
      |CROSS JOIN (
      |  SELECT cast(sum(cast(round(cv, 9) as decimal(20,9))) as double)
      |    / count(*) AS avg_cv FROM cv) m
      |WHERE z.rk <= 5 ORDER BY z.rk""".stripMargin

  // q535 duplicate-payment audit: same customer, identical order total,
  // order dates within 3 days — the classic AP double-pay heuristic
  // (equi-join on (customer, amount) first; the date window only
  // filters inside those tiny groups).
  private def dupPaymentSql(dayDiff: (String, String) => String): String =
    s"""WITH o AS (
       |  SELECT o_orderkey AS k, o_custkey AS c,
       |    cast(round(o_totalprice, 2) as decimal(20,2)) AS amt,
       |    o_orderdate AS dt
       |  FROM orders),
       |dup AS (
       |  SELECT a.c, a.amt, a.k AS k1, b.k AS k2,
       |    ${dayDiff("b.dt", "a.dt")} AS gap
       |  FROM o a JOIN o b ON b.c = a.c AND b.amt = a.amt AND b.k > a.k
       |  WHERE ${dayDiff("b.dt", "a.dt")} BETWEEN -3 AND 3)
       |SELECT cast(count(*) as bigint) AS n_suspect_pairs,
       |  cast(count(DISTINCT c) as bigint) AS n_customers,
       |  round(cast(sum(amt) as double), 2) + 0.0 AS suspect_value
       |FROM dup""".stripMargin

  // q536 Wasserstein-1 distance between the URGENT and LOW order-value
  // distributions, computed exactly as the CDF-difference integral over
  // the merged distinct value grid: W1 = sum |Fa(v) - Fb(v)| * (v' - v).
  // The grid is built by ONE groupBy (value histogram first — the same
  // reduce-then-algebra shape every stats query here uses), so at 100 TB
  // the windowed pass runs over distinct prices, not rows.
  private val wassersteinSql =
    """WITH pts AS (
      |  SELECT cast(round(o_totalprice, 2) as decimal(20,2)) AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |tot AS (SELECT cast(sum(ga) as double) AS na,
      |    cast(sum(1 - ga) as double) AS nb FROM pts),
      |grid AS (SELECT v, sum(ga) AS ca, sum(1 - ga) AS cb FROM pts GROUP BY v),
      |cdf AS (
      |  SELECT v,
      |    sum(ca) OVER (ORDER BY v) AS cuma,
      |    sum(cb) OVER (ORDER BY v) AS cumb,
      |    lead(v) OVER (ORDER BY v) AS nv
      |  FROM grid)
      |SELECT
      |  round(cast(sum(cast(round(abs(cuma / tot.na - cumb / tot.nb)
      |      * cast(nv - v as double), 9) as decimal(28,9))) as double), 6) + 0.0
      |    AS w1_distance,
      |  cast(count(*) as bigint) AS n_grid_segments,
      |  cast(max(tot.na) as bigint) AS n_urgent,
      |  cast(max(tot.nb) as bigint) AS n_low
      |FROM cdf CROSS JOIN tot WHERE nv IS NOT NULL""".stripMargin

  // q537 EWMA control chart on daily event counts. lambda = 0.5 is chosen
  // so every smoothing weight is an exact power of two: pow(0.5, k) is
  // bit-identical in any IEEE engine, count * 2^-k is exact, and the
  // decimal fold makes the sum order-independent. Closed form of the
  // recursion e_t = 0.5 x_t + 0.5 e_{t-1}, e_0 = mu: a (t, s<=t) day-pair
  // join — days^2 rows, metadata-sized at any corpus scale. Control
  // width: 3 sigma sqrt(lambda/(2-lambda) (1 - (1-lambda)^(2t))).
  private def ewmaChartSql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT ${dayNum("ts")} AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |d2 AS (SELECT row_number() OVER (ORDER BY d) AS t, y FROM daily),
       |m AS (
       |  SELECT cast(count(*) as double) AS n,
       |    cast(sum(cast(round(y, 4) as decimal(25,4))) as double) AS s1,
       |    cast(sum(cast(round(y * y, 2) as decimal(25,2))) as double) AS s2
       |  FROM daily),
       |mv AS (SELECT s1 / n AS mu,
       |    sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma FROM m),
       |ew AS (
       |  SELECT a.t,
       |    cast(sum(cast(round(b.y
       |        * pow(cast(0.5 as double), a.t - b.t + 1), 9)
       |      as decimal(28,9))) as double)
       |      + pow(cast(0.5 as double), a.t) * mv.mu AS e
       |  FROM d2 a JOIN d2 b ON b.t <= a.t CROSS JOIN mv
       |  GROUP BY a.t, mv.mu),
       |z AS (
       |  SELECT t, e,
       |    3 * mv.sigma * sqrt((1 - pow(cast(0.25 as double), t))
       |      / cast(3 as double)) AS lim,
       |    mv.mu AS mu
       |  FROM ew CROSS JOIN mv)
       |SELECT cast(t as bigint) AS day_index,
       |  round(e, 6) + 0.0 AS ewma,
       |  round(mu, 6) + 0.0 AS center,
       |  round(lim, 6) + 0.0 AS limit_width,
       |  CASE WHEN abs(e - mu) > lim THEN 1 ELSE 0 END AS flagged
       |FROM (
       |  SELECT t, e, lim, mu,
       |    row_number() OVER (ORDER BY round(abs(e - mu) / lim, 6) DESC, t) AS rk
       |  FROM z) q
       |WHERE rk <= 5 ORDER BY day_index""".stripMargin

  // q538 Croston intermittent-demand forecast. Demand = high-quantity
  // spike days (l_quantity >= 48 — regular shipments are dense at every
  // SF, spikes are genuinely intermittent). Per part with 4-10 demand
  // days: SES(alpha=0.5, init = first obs) over demand sizes and over
  // inter-demand intervals, closed-form via exact power-of-two weights;
  // forecast rate = size_hat / interval_hat. The corpus-sized input
  // reduces to (part, day) demand rows first.
  private def crostonSql(dayNum: String => String): String =
    s"""WITH dd AS (
       |  SELECT l_partkey AS p, ${dayNum("l_shipdate")} AS d,
       |    cast(sum(cast(round(l_quantity, 2) as decimal(20,2))) as double) AS z
       |  FROM lineitem WHERE l_quantity >= 48 GROUP BY 1, 2),
       |k AS (SELECT p, count(*) AS k FROM dd GROUP BY p
       |  HAVING count(*) BETWEEN 4 AND 10),
       |seq AS (
       |  SELECT dd.p, k.k, z,
       |    row_number() OVER (PARTITION BY dd.p ORDER BY d) AS i,
       |    cast(d - lag(d) OVER (PARTITION BY dd.p ORDER BY d) as double) AS gap
       |  FROM dd JOIN k USING (p)),
       |zh AS (
       |  SELECT p, k,
       |    cast(sum(cast(round(z * pow(cast(0.5 as double),
       |        CASE WHEN i = 1 THEN k - 1 ELSE k - i + 1 END), 9)
       |      as decimal(28,9))) as double) AS zhat
       |  FROM seq GROUP BY p, k),
       |ph AS (
       |  SELECT p,
       |    cast(sum(cast(round(gap * pow(cast(0.5 as double),
       |        CASE WHEN i = 2 THEN k - 2 ELSE k - i + 1 END), 9)
       |      as decimal(28,9))) as double) AS phat
       |  FROM seq WHERE i >= 2 GROUP BY p)
       |SELECT cast(z.p as bigint) AS partkey, cast(z.k as bigint) AS n_demand_days,
       |  round(z.zhat, 6) + 0.0 AS demand_size_hat,
       |  round(ph.phat, 6) + 0.0 AS interval_hat,
       |  round(z.zhat / ph.phat, 6) + 0.0 AS croston_rate
       |FROM zh z JOIN ph ON z.p = ph.p
       |ORDER BY round(z.zhat / ph.phat, 6) DESC, partkey LIMIT 5""".stripMargin

  // q539 spectral entropy + flatness of the daily count series: the
  // q428 periodogram powers over periods 2-10, normalized to a
  // distribution; H = -sum p ln p / ln(9), flatness = geomean/mean.
  private def spectralEntropySql(dayNum: String => String): String =
    s"""WITH daily AS (
       |  SELECT cast(${dayNum("ts")} as double) AS d, cast(count(*) as double) AS y
       |  FROM events GROUP BY 1),
       |m AS (SELECT cast(sum(cast(round(y, 4) as decimal(25,4))) as double)
       |    / count(*) AS mu FROM daily),
       |ps AS (SELECT * FROM (VALUES (2), (3), (4), (5), (6), (7), (8), (9), (10))
       |  AS t(p)),
       |tr AS (
       |  SELECT ps.p,
       |    cast(sum(cast(round((d2.y - m.mu)
       |      * cos(2 * cast(3.14159265358979 as double) * d2.d / ps.p), 6)
       |      as decimal(25,6))) as double) AS c,
       |    cast(sum(cast(round((d2.y - m.mu)
       |      * sin(2 * cast(3.14159265358979 as double) * d2.d / ps.p), 6)
       |      as decimal(25,6))) as double) AS s
       |  FROM ps CROSS JOIN daily d2 CROSS JOIN m
       |  GROUP BY ps.p),
       |pw AS (SELECT p, round(c * c + s * s, 2) AS pw FROM tr WHERE
       |  round(c * c + s * s, 2) > 0),
       |tot AS (SELECT cast(sum(cast(pw as decimal(25,2))) as double) AS tp,
       |    cast(count(*) as double) AS mcnt FROM pw),
       |ent AS (
       |  SELECT
       |    cast(sum(cast(round(-(pw / tot.tp) * ln(pw / tot.tp), 9)
       |      as decimal(28,9))) as double) AS h,
       |    cast(sum(cast(round(ln(pw), 9) as decimal(28,9))) as double) AS sl
       |  FROM pw CROSS JOIN tot),
       |dom AS (SELECT p FROM (
       |  SELECT p, row_number() OVER (ORDER BY pw DESC, p) AS rk FROM pw)
       |  WHERE rk = 1)
       |SELECT
       |  round(ent.h / ln(tot.mcnt), 6) + 0.0 AS spectral_entropy,
       |  round(exp(ent.sl / tot.mcnt) / (tot.tp / tot.mcnt), 6) + 0.0
       |    AS spectral_flatness,
       |  cast(dom.p as int) AS dominant_period
       |FROM ent CROSS JOIN tot CROSS JOIN dom""".stripMargin

  // q540 Herfindahl-Hirschman concentration of supplier revenue within
  // each region: HHI = sum share^2, effective supplier count = 1/HHI.
  // One aggregation to (region, supplier) revenue; dims broadcast.
  private val herfindahlSql =
    """WITH rev AS (
      |  SELECT s.s_nationkey AS nk, l_suppkey AS sk,
      |    sum(cast(round(l_extendedprice * (1 - l_discount), 4)
      |      as decimal(25,4))) AS r
      |  FROM lineitem JOIN supplier s ON s.s_suppkey = l_suppkey
      |  GROUP BY 1, 2),
      |reg AS (SELECT n_nationkey AS nk, r_name
      |  FROM nation JOIN region ON r_regionkey = n_regionkey),
      |byreg AS (
      |  SELECT r_name, sk, cast(sum(r) as double) AS r
      |  FROM rev JOIN reg ON rev.nk = reg.nk GROUP BY 1, 2),
      |tot AS (
      |  SELECT r_name,
      |    cast(sum(cast(round(r, 4) as decimal(25,4))) as double) AS t,
      |    cast(count(*) as bigint) AS ns,
      |    max(round(r, 4)) AS topr
      |  FROM byreg GROUP BY 1),
      |hhi AS (
      |  SELECT b.r_name,
      |    cast(sum(cast(round((b.r / t.t) * (b.r / t.t), 12)
      |      as decimal(28,12))) as double) AS hhi
      |  FROM byreg b JOIN tot t ON b.r_name = t.r_name
      |  GROUP BY b.r_name)
      |SELECT h.r_name AS region, t.ns AS n_suppliers,
      |  round(h.hhi, 6) + 0.0 AS hhi,
      |  round(1.0 / h.hhi, 4) + 0.0 AS effective_suppliers,
      |  round(cast(t.topr as double) / t.t, 6) + 0.0 AS top_share
      |FROM hhi h JOIN tot t ON h.r_name = t.r_name ORDER BY region""".stripMargin

  // q541 energy distance between the URGENT and LOW order-value samples.
  // 1-D closed forms — never an all-pairs join: within-sample
  // sum|x_i - x_j| = 2 sum_r (2r - 1 - n) x_(r) off a per-group rank;
  // cross-sample sum|x - y| off merged cumulative counts/sums of the
  // other sample. V-statistics; D = sqrt(2 E|X-Y| - E|X-X'| - E|Y-Y'|).
  private val energyDistanceSql =
    """WITH pts AS (
      |  SELECT cast(round(o_totalprice, 2) as decimal(20,2)) AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |tot AS (
      |  SELECT cast(sum(ga) as double) AS na, cast(sum(1 - ga) as double) AS nb,
      |    cast(sum(CASE WHEN ga = 0 THEN v END) as double) AS sby
      |  FROM pts),
      |w AS (
      |  SELECT ga, cast(v as double) AS vd,
      |    row_number() OVER (PARTITION BY ga ORDER BY v) AS rg,
      |    cast(sum(CASE WHEN ga = 0 THEN 1 ELSE 0 END)
      |      OVER (ORDER BY v) as double) AS cb,
      |    cast(sum(CASE WHEN ga = 0 THEN v END)
      |      OVER (ORDER BY v) as double) AS sb
      |  FROM pts),
      |sxy AS (
      |  SELECT cast(sum(cast(round(
      |      vd * cb - coalesce(sb, cast(0 as double))
      |      + (tot.sby - coalesce(sb, cast(0 as double)))
      |      - vd * (tot.nb - cb), 4)
      |    as decimal(30,4))) as double) AS s
      |  FROM w CROSS JOIN tot WHERE ga = 1),
      |sww AS (
      |  SELECT ga,
      |    cast(sum(cast(round((2 * rg - 1 - cnt) * vd, 4)
      |      as decimal(30,4))) as double) AS s
      |  FROM (SELECT ga, vd, rg,
      |      count(*) OVER (PARTITION BY ga) AS cnt FROM w) z
      |  GROUP BY ga),
      |e AS (
      |  SELECT sxy.s / (tot.na * tot.nb) AS exy,
      |    2 * max(CASE WHEN sww.ga = 1 THEN sww.s END)
      |      / (tot.na * tot.na) AS exx,
      |    2 * max(CASE WHEN sww.ga = 0 THEN sww.s END)
      |      / (tot.nb * tot.nb) AS eyy,
      |    cast(max(tot.na) as bigint) AS n_urgent,
      |    cast(max(tot.nb) as bigint) AS n_low
      |  FROM sww CROSS JOIN sxy CROSS JOIN tot
      |  GROUP BY sxy.s, tot.na, tot.nb)
      |SELECT round(exy, 6) + 0.0 AS e_cross,
      |  round(exx, 6) + 0.0 AS e_within_urgent,
      |  round(eyy, 6) + 0.0 AS e_within_low,
      |  round(sqrt(greatest(2 * exy - exx - eyy, cast(0 as double))), 6) + 0.0
      |    AS energy_distance,
      |  n_urgent, n_low
      |FROM e""".stripMargin

  // q354 Katz centrality oracle: unrolled rounds sharing Graph.katz's
  // arithmetic (x_{k+1} = round(alpha * A^T x_k + 1, 9), decimal state).
  private def katzOracleSql(iters: Int): String = {
    val dec = "decimal(28,9)"
    val rounds = (1 to iters).map { k =>
      s"""m$k AS (SELECT e.v AS node, sum(x) AS m
         |  FROM e JOIN x${k - 1} ON e.s = x${k - 1}.node GROUP BY e.v),
         |x$k AS (SELECT nodes.node,
         |  cast(round(cast(0.1 as double) * cast(coalesce(m$k.m, 0) as double)
         |    + cast(1.0 as double), 9) as $dec) AS x
         |  FROM nodes LEFT JOIN m$k USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT c_custkey % 60 AS s, (c_custkey * 7 + 3) % 60 AS v FROM customer
       |  UNION ALL
       |  SELECT (c_custkey * 3) % 60 AS s, (c_custkey * 11 + 5) % 60 AS v FROM customer),
       |e AS (SELECT DISTINCT s, v FROM eraw WHERE s <> v),
       |nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT s AS node FROM e UNION ALL SELECT v AS node FROM e) z),
       |x0 AS (SELECT node, cast(1.0 as $dec) AS x FROM nodes),
       |$rounds
       |SELECT node, round(cast(x as double), 6) + 0.0 AS katz
       |FROM x$iters ORDER BY node""".stripMargin
  }

  // q329 HITS oracle: unrolled rounds sharing Graph.hits' arithmetic
  private def hitsOracleSql(iters: Int): String = {
    val dec = "decimal(28,9)"
    val rounds = (1 to iters).map { k =>
      s"""ar$k AS (SELECT e.v AS node, sum(h) AS am
         |  FROM e JOIN h${k - 1} ON e.s = h${k - 1}.node GROUP BY e.v),
         |an$k AS (SELECT nodes.node, cast(coalesce(ar$k.am, 0) as $dec) AS a
         |  FROM nodes LEFT JOIN ar$k USING (node)),
         |a$k AS MATERIALIZED (SELECT node,
         |  cast(round(cast(a as double)
         |    / cast((SELECT sum(a) FROM an$k) as double), 9) as $dec) AS a
         |  FROM an$k),
         |hr$k AS (SELECT e.s AS node, sum(a) AS hm
         |  FROM e JOIN a$k ON e.v = a$k.node GROUP BY e.s),
         |hn$k AS (SELECT nodes.node, cast(coalesce(hr$k.hm, 0) as $dec) AS h
         |  FROM nodes LEFT JOIN hr$k USING (node)),
         |h$k AS MATERIALIZED (SELECT node,
         |  cast(round(cast(h as double)
         |    / cast((SELECT sum(h) FROM hn$k) as double), 9) as $dec) AS h
         |  FROM hn$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT c_custkey % 60 AS s, (c_custkey + 13) % 60 AS v FROM customer
       |  UNION ALL
       |  SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer),
       |e AS (SELECT DISTINCT s, v FROM eraw WHERE s <> v),
       |nodes AS (SELECT DISTINCT s AS node FROM e
       |          UNION SELECT DISTINCT v AS node FROM e),
       |h0 AS (SELECT node, cast(1.0 as $dec) AS h FROM nodes),
       |$rounds
       |SELECT cast(n2.node as bigint) AS node,
       |  round(cast(h.h as double), 6) + 0.0 AS hub,
       |  round(cast(a.a as double), 6) + 0.0 AS authority
       |FROM nodes n2
       |JOIN h$iters h ON h.node = n2.node
       |JOIN a$iters a ON a.node = n2.node
       |ORDER BY node""".stripMargin
  }

  // q318 sparse doc-term matrix: portable SQL (identical text runs on
  // Spark and DuckDB — concat coerces ints, the decimal sum is exact).
  private val nmfVSql =
    """SELECT concat('d', l_orderkey % 60) AS doc,
      |  concat('t', l_partkey % 25) AS term,
      |  cast(sum(cast(l_quantity as decimal(20,2))) as double) AS val
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== relational surface (inherited ops: scan/filter/agg/join/window/sort/setop)

    "q1_agg" -> sqlQuery(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity as decimal(20,2))) as double) AS sum_qty,
        |  cast(sum(cast(l_extendedprice as decimal(20,2))) as double) AS sum_price,
        |  cast(count(*) as bigint) AS cnt
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    "q2_join_agg" -> sqlQuery(Seq("orders", "customer", "nation"),
      """SELECT n.n_name AS nation,
        |  cast(sum(cast(o.o_totalprice as decimal(20,2))) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin),

    "q3_window" -> sqlQuery(Seq("orders"),
      """SELECT o_custkey, o_orderkey, cast(o_orderdate as date) AS od
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin),

    "q4_sort_limit" -> sqlQuery(Seq("lineitem"),
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin),

    "q5_setop" -> sqlQuery(Seq("orders", "customer"),
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin),

    "q6_filter_prune" -> sqlQuery(Seq("lineitem"),
      """SELECT
        |  cast(sum(cast(l_extendedprice as decimal(20,2))) as double) AS revenue,
        |  cast(count(*) as bigint) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin),

    "q7_events_agg" -> sqlQuery(Seq("events"),
      """SELECT event_type, cast(ts as date) AS day,
        |  cast(count(*) as bigint) AS n_events,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total_value,
        |  cast(count(DISTINCT user_id) as bigint) AS users
        |FROM events
        |GROUP BY event_type, cast(ts as date)
        |ORDER BY event_type, day""".stripMargin),

    "q8_topk_per_group" -> sqlQuery(Seq("supplier", "nation"),
      """SELECT n_name, s_suppkey, s_acctbal, rnk FROM (
        |  SELECT n.n_name, s.s_suppkey, s.s_acctbal,
        |    row_number() OVER (PARTITION BY n.n_name
        |                       ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rnk
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |WHERE rnk <= 3
        |ORDER BY n_name, rnk""".stripMargin),

    "q9_semi_anti" -> sqlQuery(Seq("customer", "orders"),
      """SELECT
        |  (SELECT cast(count(*) as bigint) FROM customer c
        |   WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
        |  (SELECT cast(count(*) as bigint) FROM customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""".stripMargin),

    // tumbling time windows in batch (same window() used by streaming §2.10)
    "q46_time_window" -> sqlQuery(Seq("events"),
      """SELECT window.start AS ws, event_type,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total
        |FROM events
        |GROUP BY window(ts, '6 hours'), event_type
        |ORDER BY ws, event_type""".stripMargin),

    "q47_part_region_join" -> sqlQuery(Seq("lineitem", "part", "orders", "customer", "nation", "region"),
      """SELECT r.r_name AS region, p.p_brand AS brand,
        |  cast(sum(cast(l.l_extendedprice as decimal(20,2))) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_items
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE p.p_size <= 10
        |GROUP BY r.r_name, p.p_brand
        |ORDER BY region, brand""".stripMargin),

    // ===== st_* scalar surface over synthesized geometry (SURVEY §2.2-2.3)

    "q10_geo_accessors" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_x($custPt) AS px, st_y($custPt) AS py,
         |  st_geomtypeid($custPt) AS tid,
         |  st_numpoints($custPt) AS npts,
         |  st_isempty($custPt) AS empty
         |FROM customer ORDER BY c_custkey""".stripMargin),

    "q11_geo_translate" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_x(st_translate($custPt, 1.5, 2.5)) AS tx,
         |  st_y(st_translate($custPt, 1.5, 2.5)) AS ty,
         |  st_x(st_affine($custPt, 2.0, 0.0, 0.0, 2.0, 10.0, 0.0)) AS ax
         |FROM customer ORDER BY c_custkey""".stripMargin),

    "q12_geo_area_length" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_area(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) AS area,
         |  st_length(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) AS perimeter
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // GeoArrow nested-native twin of q11/q12/q13: encode once (struct<x,y>
    // point, st_ringdump rings), then run the whole translate/affine/
    // distance/area/perimeter chain as pure functions._ HOFs — one
    // WholeStageCodegen span, zero per-op WKB decode. Hash-identical to the
    // WKB kernels (same multiply-add order).
    "q245_geoarrow_struct" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      import graft.functions.GeoArrow
      val df = s.sql(
        s"""SELECT c_custkey, $custPt AS g,
           |  st_ringdump(st_makeenvelope($custX, $custY,
           |    $custX + $custSide, $custY + $custSide)) AS rings
           |FROM customer""".stripMargin)
      val p = GeoArrow.toPointStruct(col("g"))
      df.select(col("c_custkey"),
          GeoArrow.translate(p, lit(1.5), lit(2.5)).getField("x").as("tx"),
          GeoArrow.translate(p, lit(1.5), lit(2.5)).getField("y").as("ty"),
          GeoArrow.affine(p, lit(2.0), lit(0.0), lit(0.0), lit(2.0),
            lit(10.0), lit(0.0)).getField("x").as("ax"),
          GeoArrow.distance(p, GeoArrow.xy(lit(0.0), lit(0.0))).as("dist_origin"),
          GeoArrow.polygonArea(col("rings")).as("area"),
          GeoArrow.polygonPerimeter(col("rings")).as("perimeter"))
        .orderBy("c_custkey")
    }),

    // GeoArrow MULTIPOLYGON twin (q245's discipline at the fourth list
    // level, reference geoseries.py:109-138): a deterministic 2-part
    // multipolygon per customer — part 1 = the standard envelope with a
    // quarter-side square hole, part 2 = a disjoint half-side square —
    // measured BOTH ways: st_area/st_length on the WKB geometry AND the
    // st_partsdump List<List<List<Struct{x,y}>>> encoding through the
    // codegen part kernels. All four columns hash-match the closed form
    // (coordinates sit on a 0.25 grid, so every shoelace product is
    // exact), proving the nested encoding keeps part boundaries straight
    // (a flattened ringdump would subtract part-2's exterior as a hole).
    "q309_geoarrow_multipolygon" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      import graft.functions.GeoArrow
      val x0 = custX; val y0 = custY; val sd = custSide
      // ring helper: axis-aligned square (x, y, size) as a WKT ring
      def ring(x: String, y: String, size: String) =
        s"concat('(', $x, ' ', $y, ', ', $x + ($size), ' ', $y, ', ', " +
          s"$x + ($size), ' ', $y + ($size), ', ', $x, ' ', $y + ($size), ', ', $x, ' ', $y, ')')"
      val wkt =
        s"""concat('MULTIPOLYGON ((',
           |  ${ring(x0, y0, sd)}, ', ',
           |  ${ring(s"$x0 + $sd * 0.25", s"$y0 + $sd * 0.25", s"$sd * 0.25")}, '), (',
           |  ${ring(s"$x0 + 2.0 * $sd", y0, s"$sd * 0.5")}, '))')""".stripMargin
      val df = s.sql(
        s"""SELECT c_custkey, st_geomfromtext($wkt) AS g FROM customer""")
      df.select(col("c_custkey"),
          expr("st_area(g)").as("area_wkb"),
          // st_perimeter, not st_length: the length surface counts
          // exterior rings only (the reference's areal-length semantic),
          // while perimeter = all rings = the struct kernel's contract
          expr("st_perimeter(g)").as("perim_wkb"),
          GeoArrow.multiPolygonArea(expr("st_partsdump(g)")).as("area_struct"),
          GeoArrow.multiPolygonPerimeter(expr("st_partsdump(g)")).as("perim_struct"))
        .orderBy("c_custkey")
    }),

    "q13_geo_distance" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_distance($custPt, st_point(0.0, 0.0)) AS dist_origin
         |FROM customer ORDER BY c_custkey""".stripMargin),

    "q14_geo_centroid" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_x(st_centroid(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS cx,
         |  st_y(st_centroid(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS cy
         |FROM customer ORDER BY c_custkey""".stripMargin),

    "q15_geo_envelope" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_xmin(e) AS exmin, st_ymin(e) AS eymin, st_xmax(e) AS exmax, st_ymax(e) AS eymax,
         |  st_numpoints(st_convexhull(e)) AS hull_pts,
         |  st_area(st_convexhull(e)) AS hull_area
         |FROM (SELECT c_custkey,
         |        st_envelope(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) AS e
         |      FROM customer)
         |ORDER BY c_custkey""".stripMargin),

    "q16_geo_contains" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_contains(st_makeenvelope(-90.0, -45.0, 90.0, 45.0), $custPt) AS in_box,
         |  st_within($custPt, st_makeenvelope(-90.0, -45.0, 90.0, 45.0)) AS within_box,
         |  st_intersects($custPt, $custPt) AS self_isect
         |FROM customer ORDER BY c_custkey""".stripMargin),

    "q17_geo_geodesic" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_geodesiclength(st_geomfromtext(
         |    concat('LINESTRING (0 0, ', $custX / 2.0, ' ', $custY / 2.0, ')')), 'haversine'), 2) AS hav_m
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // `+ 0.0` canonicalizes IEEE -0.0 (round() of a tiny negative) to +0.0
    // on both engines — the driver's hash compare is representation-sensitive
    "q18_geo_transform" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_x(st_transform($custPt, 'EPSG:4326', 'EPSG:3857')), 2) + 0.0 AS mercator_x,
         |  round(st_y(st_transform($custPt, 'EPSG:4326', 'EPSG:3857')), 2) + 0.0 AS mercator_y
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // conic CRS family (Lambert conformal conic 2SP + Albers equal-area,
    // Snyder §15/§14 ellipsoidal forms): Lambert-93 (EPSG:2154) over a
    // France-domain point and CONUS Albers (EPSG:5070) over a US-domain
    // point, plus the inverse roundtrip back to degrees. Meters rounded to
    // 0.1 m (the trig/pow chain is libm-dependent at the 1e-8 level);
    // roundtrip degrees to 1e-6 (inverse converges to ~1e-12).
    "q243_conic_crs" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_x(st_transform(pf, 'EPSG:4326', 'EPSG:2154')), 1) + 0.0 AS lcc_x,
        |  round(st_y(st_transform(pf, 'EPSG:4326', 'EPSG:2154')), 1) + 0.0 AS lcc_y,
        |  round(st_x(st_transform(pu, 'EPSG:4326', 'EPSG:5070')), 1) + 0.0 AS aea_x,
        |  round(st_y(st_transform(pu, 'EPSG:4326', 'EPSG:5070')), 1) + 0.0 AS aea_y,
        |  round(st_x(st_transform(st_transform(pf, 'EPSG:4326', 'EPSG:2154'),
        |    'EPSG:2154', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
        |  round(st_y(st_transform(st_transform(pu, 'EPSG:4326', 'EPSG:5070'),
        |    'EPSG:5070', 'EPSG:4326')), 6) + 0.0 AS rt_lat
        |FROM (SELECT c_custkey,
        |    st_point(cast(c_custkey % 140 as double) / 10.0 - 5.0,
        |             41.0 + cast(c_custkey % 100 as double) / 10.0) AS pf,
        |    st_point(-116.0 + cast(c_custkey % 400 as double) / 10.0,
        |             25.0 + cast(c_custkey % 240 as double) / 10.0) AS pu
        |  FROM customer WHERE c_custkey <= 400)
        |ORDER BY c_custkey""".stripMargin),

    // Helmert datum-shift family (EPSG 9606 position-vector, the +towgs84
    // path the reference gets from PROJ): WGS84 -> OSGB36 geographic over a
    // UK-domain point (degrees rounded 1e-6 ~ 0.1 m, inside the chain's
    // cross-engine libm agreement), plus the full EPSG:27700 British
    // National Grid roundtrip back to 4326 (pins projection + datum legs
    // composing and inverting consistently; linearized-Helmert reverse
    // roundtrips to ~5 mm, far inside the 1e-6 deg rounding).
    "q247_datum_shift" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_x(st_transform(p, 'EPSG:4326', 'OSGB36')), 6) + 0.0 AS osgb_lon,
        |  round(st_y(st_transform(p, 'EPSG:4326', 'OSGB36')), 6) + 0.0 AS osgb_lat,
        |  round(st_x(st_transform(st_transform(p, 'EPSG:4326', 'EPSG:27700'),
        |    'EPSG:27700', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
        |  round(st_y(st_transform(st_transform(p, 'EPSG:4326', 'EPSG:27700'),
        |    'EPSG:27700', 'EPSG:4326')), 6) + 0.0 AS rt_lat
        |FROM (SELECT c_custkey,
        |    st_point(-5.5 + cast(c_custkey % 60 as double) / 10.0,
        |             50.0 + cast(c_custkey % 80 as double) / 10.0) AS p
        |  FROM customer WHERE c_custkey <= 400)
        |ORDER BY c_custkey""".stripMargin),

    // Polar Stereographic family (Snyder §21 / EPSG 9829): Antarctic
    // EPSG:3031 (south aspect) and NSIDC EPSG:3413 (north, lon_0=-45)
    // forward legs plus the full projection round-trip back to 4326.
    // Meters rounded 1e-4 (0.1 mm, far above cross-engine libm noise at
    // ~4e-9 m relative); the oracle replays the Snyder forward
    // term-for-term and the rt_* columns echo the inputs.
    "q252_polar_stereo" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_x(st_transform(ps, 'EPSG:4326', 'EPSG:3031')), 4) + 0.0 AS ant_x,
        |  round(st_y(st_transform(ps, 'EPSG:4326', 'EPSG:3031')), 4) + 0.0 AS ant_y,
        |  round(st_x(st_transform(pn, 'EPSG:4326', 'EPSG:3413')), 4) + 0.0 AS arc_x,
        |  round(st_y(st_transform(pn, 'EPSG:4326', 'EPSG:3413')), 4) + 0.0 AS arc_y,
        |  round(st_x(st_transform(st_transform(ps, 'EPSG:4326', 'EPSG:3031'),
        |    'EPSG:3031', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
        |  round(st_y(st_transform(st_transform(ps, 'EPSG:4326', 'EPSG:3031'),
        |    'EPSG:3031', 'EPSG:4326')), 6) + 0.0 AS rt_lat
        |FROM (SELECT c_custkey,
        |    st_point(cast(c_custkey % 360 - 180 as double),
        |             -60.0 - cast(c_custkey % 30 as double)) AS ps,
        |    st_point(cast(c_custkey % 360 - 180 as double),
        |             60.0 + cast(c_custkey % 30 as double)) AS pn
        |  FROM customer WHERE c_custkey <= 400)
        |ORDER BY c_custkey""".stripMargin),

    // Oblique (double) stereographic — RD New (EPSG:28992, EPSG method
    // 9809). The projection-only leg (no datum) maps the defining origin
    // to the published false origin EXACTLY (155000, 463000 — a registry
    // constant the oracle can state literally), and the full EPSG:28992
    // path (projection + Amersfoort Helmert both ways) round-trips to the
    // echo of the input. Correctness of the absolute projected values is
    // pinned by ObliqueStereoSpec against the EPSG GN 7-2 worked example.
    "q253_rd_new" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      graft.geom.CRS.registerProj4("RD:PROJONLY",
        "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 " +
          "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
      s.sql(
        """SELECT c_custkey,
          |  round(st_x(st_transform(st_point(5.38763888888889, 52.15616055555555),
          |    'EPSG:4326', 'RD:PROJONLY')), 6) + 0.0 AS origin_e,
          |  round(st_y(st_transform(st_point(5.38763888888889, 52.15616055555555),
          |    'EPSG:4326', 'RD:PROJONLY')), 6) + 0.0 AS origin_n,
          |  round(st_x(st_transform(st_transform(p, 'EPSG:4326', 'EPSG:28992'),
          |    'EPSG:28992', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
          |  round(st_y(st_transform(st_transform(p, 'EPSG:4326', 'EPSG:28992'),
          |    'EPSG:28992', 'EPSG:4326')), 6) + 0.0 AS rt_lat
          |FROM (SELECT c_custkey,
          |    st_point(3.5 + cast(c_custkey % 35 as double) / 10.0,
          |             50.8 + cast(c_custkey % 25 as double) / 10.0) AS p
          |  FROM customer WHERE c_custkey <= 400)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Geodesic buffer (PostGIS ST_Buffer(geography)): spherical AEQD
    // about the point, planar buffer, inverse — the projection preserves
    // distance from its center, so every ring vertex sits at EXACTLY the
    // requested geodesic radius; the oracle pins dmin=dmax=r closed-form
    // (haversine on the same sphere radius round-trips to < 1e-6 m) and
    // the vertex count from the planar n-gon contract.
    "q270_geodesic_buffer" -> sqlQuery(Seq("customer"),
      """WITH pts AS (
        |  SELECT c_custkey,
        |    st_point(cast(c_custkey % 340 - 170 as double),
        |             cast((c_custkey * 7) % 120 - 60 as double)) AS p
        |  FROM customer WHERE c_custkey <= 800),
        |buf AS (SELECT c_custkey, p, st_geodesicbuffer(p, 100000.0) AS b FROM pts)
        |SELECT c_custkey,
        |  st_npoints(b) AS nv,
        |  round(array_min(transform(st_coorddump(st_exteriorring(b)),
        |    c -> st_distancesphere(p, st_point(c.x, c.y)))), 3) + 0.0 AS dmin,
        |  round(array_max(transform(st_coorddump(st_exteriorring(b)),
        |    c -> st_distancesphere(p, st_point(c.x, c.y)))), 3) + 0.0 AS dmax,
        |  st_contains(b, p) AS ctr_inside
        |FROM buf ORDER BY c_custkey""".stripMargin),

    // k-CORE membership (Matula-Beck peeling as fixed parallel rounds):
    // per round ONE degree aggregation + two semi-joins dropping sub-k
    // vertices; the converged flag (no edge dropped in the last round)
    // proves the fixed-round replay reached the true core. Completes the
    // graph family (CC, triangles, PageRank, BFS, Bellman-Ford, LPA)
    // with the density-periphery decomposition used for community
    // kernels and spam filtering.
    "q313_kcore" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT c_custkey % 60 AS src, (c_custkey + 13) % 60 AS dst FROM customer
          |UNION ALL
          |SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer
          |UNION ALL
          |SELECT c_custkey % 40, (c_custkey * 3 + 1) % 40 FROM customer""".stripMargin)
      graft.relational.Graph.kCore(edges, "src", "dst", k = 4, rounds = 6)
        .select(col("node").cast("long").as("node"),
          col("core_deg"), col("converged"))
        .orderBy("node")
    }),

    // Inter-annotator agreement — the labeled-data acceptance gate:
    // pairwise Cohen's kappa (per-pair marginals over jointly rated
    // items) + panel Fleiss' kappa, every sum an exact BIGINT with ONE
    // double division per statistic (cross-engine bit-identical). Three
    // synthetic raters over orders with controlled disagreement
    // (base priority digit; rater b flips on multiples of 5, rater c
    // shifts on multiples of 3).
    "q314_annotator_agreement" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "orders")
      val ann = s.sql(
        """SELECT o_orderkey AS item, 'a' AS rater,
          |  substring(o_orderpriority, 1, 1) AS label FROM orders
          |UNION ALL
          |SELECT o_orderkey, 'b', CASE WHEN o_orderkey % 5 = 0
          |  THEN cast(cast(substring(o_orderpriority, 1, 1) as int) % 5 + 1 as string)
          |  ELSE substring(o_orderpriority, 1, 1) END FROM orders
          |UNION ALL
          |SELECT o_orderkey, 'c', CASE WHEN o_orderkey % 3 = 0
          |  THEN cast((cast(substring(o_orderpriority, 1, 1) as int) + 1) % 5 + 1 as string)
          |  ELSE substring(o_orderpriority, 1, 1) END FROM orders""".stripMargin)
      val cohen = graft.pipeline.Agreement.cohenKappa(ann, "item", "rater", "label")
        .select(col("r1"), col("r2"), col("n_items"),
          (round(col("po"), 6) + 0.0).as("po"),
          (round(col("pe"), 6) + 0.0).as("pe"),
          (round(col("kappa"), 6) + 0.0).as("kappa"))
      val fleiss = graft.pipeline.Agreement.fleissKappa(ann, "item", "label")
        .select(lit("panel").as("r1"), lit("fleiss").as("r2"), col("n_items"),
          (round(col("p_bar"), 6) + 0.0).as("po"),
          (round(col("p_e"), 6) + 0.0).as("pe"),
          (round(col("kappa"), 6) + 0.0).as("kappa"))
      cohen.unionAll(fleiss).orderBy("r1", "r2")
    }),

    // Distance-based centralities (reach, eccentricity, classic
    // closeness, harmonic) from ONE multi-source level-synchronous BFS
    // over the q315 fixture graph — exact INT distances, round-9
    // decimal harmonic fold, loud depth budget.
    "q317_closeness" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT c_custkey % 48 AS src, (c_custkey * 5 + 7) % 48 AS dst FROM customer
          |UNION ALL
          |SELECT c_custkey % 48, (c_custkey * 11 + 3) % 48 FROM customer""".stripMargin)
      graft.relational.Graph.closenessStats(edges, "src", "dst", maxDepth = 7)
        .select(col("node").cast("long").as("node"), col("reach"), col("ecc"),
          (round(col("closeness"), 6) + 0.0).as("closeness"),
          (round(col("harmonic"), 6) + 0.0).as("harmonic"), col("complete"))
        .orderBy("node")
    }),

    // WordPiece tokenizer training (likelihood-scored merges,
    // count(ab)/(count(a)*count(b)) — the BERT vocabulary learner) on
    // the same two-tier machinery as q307's BPE: cap-probed
    // driver-incremental path at O(1) Spark jobs, distributed
    // sequential fallback. The score is one IEEE division over exact
    // BIGINT counts, so pick order replays bit-identically in the
    // oracle's unrolled rounds.
    "q316_wordpiece" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val docs = s.sql("SELECT concat(c_name, ' ', c_mktsegment) AS text FROM customer")
      graft.pipeline.Bpe.wordPieceMerges(docs, "text", rounds = 64)
        .select(col("round"), col("lhs"), col("rhs"), col("freq"),
          (round(col("score"), 9) + 0.0).as("score"))
        .orderBy("round")
    }),

    // Betweenness centrality (Brandes as level-synchronous rounds, all
    // BFS sources concurrent through the same joins): forward sigma is
    // exact BIGINT; backward deltas use the pageRank decimal discipline
    // (per-term round-9 double, decimal(28,9) order-independent sum).
    // The complete flag proves the depth budget exhausted every BFS.
    "q315_betweenness" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT c_custkey % 48 AS src, (c_custkey * 5 + 7) % 48 AS dst FROM customer
          |UNION ALL
          |SELECT c_custkey % 48, (c_custkey * 11 + 3) % 48 FROM customer""".stripMargin)
      graft.relational.Graph.betweenness(edges, "src", "dst", maxDepth = 7)
        .select(col("node").cast("long").as("node"),
          (round(col("bc"), 6) + 0.0).as("bc"), col("complete"))
        .orderBy("node")
    }),

    // HLL CUBE — distinct l_orderkey per (returnflag, linestatus) plus
    // both rollup levels, derived by MERGING the leaf sketch state
    // (max rank per bucket), never re-scanning: the 100 TB pattern for
    // multi-granularity distinct counts is ONE scan building leaf
    // sketches + metadata-sized merges upward, where per-level
    // count(DISTINCT) would be one expand-shuffle scan per level. The
    // estimates are hash-exact cross-engine (portable md5 layout), and
    // rollup(x) == merge(leaves(x)) exactly because the state fold is
    // max — the mergeability property itself is what this query pins.
    "q310_hll_cube" -> ((s: SparkSession, dir: String) => {
      init(s)
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      import graft.pipeline.Sketch
      // leaf state: <= groups x 256 rows; checkpointed so the three
      // levels read the materialized state, not three corpus scans
      val leaf = Sketch.hllBuckets(li, "l_orderkey",
        Seq("l_returnflag", "l_linestatus")).localCheckpoint()
      val l0 = Sketch.hllFromBuckets(leaf, Seq("l_returnflag", "l_linestatus"))
        .select(col("l_returnflag").as("grp_flag"), col("l_linestatus").as("grp_status"),
          col("hll_estimate"), col("n_buckets_used"))
      val m1 = leaf.groupBy(col("l_returnflag"), col("__b"))
        .agg(max(col("__rmax")).as("__rmax"))
      val l1 = Sketch.hllFromBuckets(m1, Seq("l_returnflag"))
        .select(col("l_returnflag").as("grp_flag"), lit("ALL").as("grp_status"),
          col("hll_estimate"), col("n_buckets_used"))
      val m2 = leaf.groupBy(col("__b")).agg(max(col("__rmax")).as("__rmax"))
        .withColumn("__g", lit("ALL"))
      val l2 = Sketch.hllFromBuckets(m2, Seq("__g"))
        .select(col("__g").as("grp_flag"), lit("ALL").as("grp_status"),
          col("hll_estimate"), col("n_buckets_used"))
      l0.unionByName(l1).unionByName(l2).orderBy("grp_flag", "grp_status")
    }),

    // Multilingual TEMPERATURE-RESAMPLING mixture (the mC4/XLM-R recipe,
    // alpha = 0.3): per-language char mass p_l, resampling weight
    // q_l = p_l^alpha / sum(p^alpha), upsample factor q/p, and the
    // expected document budget at 100k sampled docs. One aggregation +
    // a broadcast of the (tiny) per-language table; the arithmetic is
    // the published closed form, so both engines replay it exactly.
    "q311_temperature_mixture" -> sqlQuery(Seq("documents"),
      """WITH bylang AS (
        |  SELECT lang, cast(count(*) as bigint) AS n_docs,
        |    cast(sum(n_chars) as bigint) AS chars
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT cast(sum(chars) as double) AS tc,
        |               cast(sum(pow(chars, 0.3)) as double) AS tq FROM bylang)
        |SELECT b.lang, b.n_docs, b.chars,
        |  round(b.chars / t.tc, 6) + 0.0 AS p,
        |  round(pow(b.chars, 0.3) / t.tq, 6) + 0.0 AS q,
        |  round((pow(b.chars, 0.3) / t.tq) / (b.chars / t.tc), 6) + 0.0 AS upsample,
        |  cast(round(pow(b.chars, 0.3) / t.tq * 100000, 0) as bigint) AS budget_docs
        |FROM bylang b CROSS JOIN tot t
        |ORDER BY b.lang""".stripMargin),

    // Vocabulary COVERAGE curve — what share of all token occurrences the
    // top-N words cover (the tokenizer-sizing diagnostic): rank words by
    // frequency (count desc, word asc), cumulative share at N in {10,
    // 100, 1000}. The rank window is the exact small-scale path; at
    // 100 TB the same curve comes off a frequency histogram.
    "q312_vocab_coverage" -> sqlQuery(Seq("documents"),
      """WITH w AS (
        |  SELECT word, cast(count(*) as bigint) AS f FROM (
        |    SELECT explode(filter(split(trim(text), '\\s+'), x -> x != '')) AS word
        |    FROM documents) GROUP BY word),
        |r AS (SELECT word, f,
        |    row_number() OVER (ORDER BY f DESC, word) AS rk,
        |    sum(f) OVER (ORDER BY f DESC, word
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(f) OVER () AS tot
        |  FROM w)
        |SELECT cast(n.n as int) AS top_n,
        |  cast(coalesce(max(CASE WHEN rk <= n.n THEN rk END), 0) as bigint) AS words_present,
        |  round(coalesce(max(CASE WHEN rk <= n.n THEN cum END), 0) / max(cast(tot as double)), 6) + 0.0 AS coverage
        |FROM r CROSS JOIN (SELECT explode(array(10, 100, 1000)) AS n) n
        |GROUP BY n.n ORDER BY top_n""".stripMargin),

    // TOPIC FACTORIZATION by NMF (Lee & Seung multiplicative updates)
    // over a sparse doc-term matrix synthesized from lineitem (doc =
    // orderkey bucket, term = partkey bucket, val = decimal-exact
    // quantity mass). Every matrix is exploded to scalar rows, so each
    // update is joins + aggregations: the k x k Grams are tiny
    // aggregation outputs joined back (never driver state) and the
    // corpus-sized work per iteration is two V-sized joins — the
    // textbook distributed-NMF shape. The oracle replays init + both
    // iterations as one unrolled MATERIALIZED-CTE chain built from the
    // SAME step builders (TopicModel.chainSql), term for term.
    "q318_nmf_topics" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "lineitem")
      val v = s.sql(nmfVSql)
      graft.pipeline.TopicModel.nmf(v, "doc", "term", "val", k = 2, iters = 2)
        .selectExpr("matrix", "id", "j", "round(value, 6) + 0.0 AS value")
        .orderBy("matrix", "id", "j")
    }),

    // CLOSED-FORM OLS — the continuous-response model beside the
    // logistic classifier: ONE map-side-combined aggregation builds the
    // decimal-folded normal-equation sums; the 3x3 Cramer solve and R^2
    // are metadata-sized scalar algebra. The SQL is portable — the
    // identical text runs on DuckDB, so betas match term for term.
    "q319_ols_regression" -> sqlQuery(Seq("lineitem"),
      graft.pipeline.Regression.olsSql("lineitem",
        "cast(l_quantity as double)", "cast(l_discount as double)",
        "cast(l_extendedprice as double) / 1000.0")),

    // GRADIENT-BOOSTED STUMPS (squared loss, depth-1): each round is ONE
    // map-side-combined per-(feature, bin) residual aggregation + tiny
    // cumulative windows picking the best variance-reduction split; the
    // chosen stump is a 1-row relation cross-joined into the next
    // round's residual expression, so predictions are never materialized
    // per row. The oracle replays all rounds as unrolled MATERIALIZED
    // CTEs from the same Boost step builders.
    "q320_boosted_stumps" -> ((s: SparkSession, dir: String) => {
      init(s)
      graft.pipeline.Boost.trainStumps(
        s.read.parquet(s"$dir/lineitem.parquet"),
        Seq("cast(l_quantity as double)", "cast(l_discount as double)"),
        "cast(l_extendedprice as double) / 1000.0", rounds = 3, lr = 0.5)
    }),

    // MULTINOMIAL NAIVE BAYES language classifier (add-1 smoothing),
    // trained and resubstitution-scored in one SQL chain: the model is
    // two aggregations of the token stream; scoring fans tokens over
    // |classes| (a small constant) and equi-joins counts on
    // (class, word). Log-likelihoods fold round-9 decimal terms. Only
    // the tokenizer is engine-specific (TextClassify.sparkTok/duckTok);
    // the whole scoring core is one shared text.
    "q321_naive_bayes" -> sqlQuery(Seq("documents"),
      graft.pipeline.TextClassify.naiveBayesSql(graft.pipeline.TextClassify.sparkTok)),

    // CHI-SQUARED term-class selection over document presence: exact
    // bigint contingency counts, one deterministic double statistic,
    // top-5 per class by (rounded chi2 DESC, word).
    "q322_chi2_terms" -> sqlQuery(Seq("documents"),
      graft.pipeline.TextClassify.chi2Sql(graft.pipeline.TextClassify.sparkTok, k = 5)),

    // READABILITY scoring (Flesch reading ease + Flesch-Kincaid grade):
    // one codegen scan — vowel-group syllable approximation, [.!?]+
    // sentence runs, whitespace words; the quality-signal family's
    // classic composite. Engine-specific count spellings, shared formula.
    "q323_readability" -> sqlQuery(Seq("documents"),
      s"""WITH base AS (
         |  SELECT doc_id,
         |    cast(size(filter(split(trim(text), '\\\\s+'), x -> x != '')) as bigint) AS w,
         |    cast(regexp_count(text, '[.!?]+') as bigint) AS s,
         |    cast(regexp_count(lower(text), '[aeiouy]+') as bigint) AS y
         |  FROM documents WHERE text IS NOT NULL)
         |$readabilityCore""".stripMargin),

    // ADAMIC-ADAR link prediction over the q313 fixture graph: wedge
    // enumeration at common neighbors (sum(deg^2) fan-out — the
    // standard bound), 1/ln(deg) folds as round-9 decimals, existing
    // edges anti-joined away, top-20 by (score DESC, u, v).
    "q324_adamic_adar" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT c_custkey % 60 AS src, (c_custkey + 13) % 60 AS dst FROM customer
          |UNION ALL
          |SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer
          |UNION ALL
          |SELECT c_custkey % 40, (c_custkey * 3 + 1) % 40 FROM customer""".stripMargin)
      graft.relational.Graph.adamicAdar(edges, "src", "dst", topK = 20)
        .selectExpr("cast(u as bigint) AS u", "cast(v as bigint) AS v", "aa_score")
    }),

    // DIFFERENTIALLY-PRIVATE count release (Laplace, eps = 1): noise by
    // inverse-CDF over the md5-60bit uniform — deterministic, so the
    // oracle replays it; one aggregation, noise is per-group scalar math.
    "q325_dp_release" -> sqlQuery(Seq("lineitem"),
      dpCountsSql(graft.pipeline.TopicModel.sparkDialect)),

    // INVERSE-DISTANCE-WEIGHTED interpolation at 25 target sites from
    // customer points within a +/-20 box: the 25-row build side plans as
    // a broadcast nested-loop (the intentional tiny-build pattern); at
    // production target counts this becomes the grid join
    // (SpatialJoin.gridJoin) with the same weighted-fold core.
    "q326_idw_interpolation" -> sqlQuery(Seq("nation", "customer"), idwSql),

    // MULTI-TOUCH ATTRIBUTION (first/last/linear) of purchases to
    // clicks in a 7-day lookback: per-user equi-join bounded by user
    // activity; credits fold exactly (bigint / round-9 decimal).
    "q327_attribution" -> sqlQuery(Seq("events"),
      attributionSql(e => s"unix_micros($e)")),

    // EXPONENTIAL SMOOTHING (closed form, alpha = 0.3): raw events
    // reduce to daily counts first; the triangular day-pair join is
    // metadata-sized at any scale. Last-5-day levels; S_t is also the
    // one-step forecast for t+1.
    "q328_exp_smoothing" -> sqlQuery(Seq("events"),
      expSmoothSql(e => s"unix_micros($e) div 86400000000")),

    // HITS hubs/authorities (4 rounds) over the q218 directed fixture:
    // per round two frontier joins + two L1 normalizations (totals are
    // 1-row aggregates joined back); round-9 decimal folds replay as
    // unrolled CTEs.
    "q329_hits" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT c_custkey % 60 AS s, (c_custkey + 13) % 60 AS v FROM customer
          |UNION ALL
          |SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer""".stripMargin)
      graft.relational.Graph.hits(edges, "s", "v", iters = 4)
        .selectExpr("cast(node as bigint) AS node", "hub", "authority")
        .orderBy("node")
    }),

    // RAKE keyword extraction: stopword-split candidate phrases (one
    // running-count window), word deg/freq stats, phrase scores as
    // round-9 decimal folds. Engine-specific positional tokenizer and
    // ordered phrase-agg; one shared scoring core.
    "q330_rake_keywords" -> sqlQuery(Seq("documents"),
      graft.pipeline.TextClassify.rakeSql(
        graft.pipeline.TextClassify.sparkTokPos,
        graft.pipeline.TextClassify.sparkPhraseAgg)),

    // GINI concentration of customer spend: one aggregation to
    // per-customer totals, one ordered window for the rank form
    // G = 2*sum(i*x)/(n*sum(x)) - (n+1)/n. The global sort is the exact
    // small-scale path; at 100 TB the same statistic comes off a value
    // histogram (q312-style cumulative shares).
    "q331_gini" -> sqlQuery(Seq("orders"), giniSql),

    // SPEARMAN rank correlation (tie-corrected average ranks) between
    // doc length and word count: ranks via min-rank + group size
    // windows; Pearson on ranks via decimal-folded sums.
    "q332_spearman" -> sqlQuery(Seq("documents"), spearmanSql),

    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis-Spirakis A-Res):
    // key = u^(1/w) with the md5-60bit uniform — deterministic, exactly
    // replayable; top-k by key is one TakeOrdered pass, no global sort.
    "q333_ares_sample" -> sqlQuery(Seq("customer"),
      aresSql(graft.pipeline.TopicModel.sparkDialect)),

    // FEATURE HASHING (hashing-trick vectorizer): md5-hashed dim + sign
    // per distinct word, then corpus totals per dimension — the
    // fixed-width featurizer for the classifier family.
    "q334_feature_hash" -> sqlQuery(Seq("documents"),
      featureHashSql(graft.pipeline.TextClassify.sparkTok,
        graft.pipeline.TopicModel.sparkDialect)),

    // LEAVE-FOLD-OUT TARGET ENCODING with prior smoothing: per
    // (category, fold) the encoding uses every OTHER fold's decimal-
    // exact sums — the leakage-safe categorical feature.
    "q335_target_encoding" -> sqlQuery(Seq("orders"),
      targetEncodingSql(graft.pipeline.TopicModel.sparkDialect)),

    // PERMUTATION TEST (20 deterministic md5 shuffles) on the
    // click-vs-view mean difference.
    "q336_permutation_test" -> sqlQuery(Seq("events", "nation"),
      permTestSql(graft.pipeline.TopicModel.sparkDialect)),

    // MANN-WHITNEY U (tie-corrected z) between click and view values.
    "q337_mann_whitney" -> sqlQuery(Seq("events"), mannWhitneySql),

    // BENFORD first-digit audit of order totals (digit via the exact
    // decimal-string prefix — no libm in the digit path).
    "q338_benford" -> sqlQuery(Seq("orders"), benfordSql),

    // WELCH's t-test (unequal-variance two-sample) between click and view
    // values: one map-side-combined aggregation, then scalar algebra.
    "q339_welch_ttest" -> sqlQuery(Seq("events"), welchSql),

    // AUTOCORRELATION of the daily event-count series at lags 1-7: the
    // stream reduces to a days-sized table before the lag join.
    "q340_acf" -> sqlQuery(Seq("events"),
      acfSql(e => s"unix_micros($e) div 86400000000")),

    // MARKOV transition matrix + stationary distribution (4 unrolled
    // power-iteration rounds over the 25-cell matrix).
    "q341_markov_stationary" -> sqlQuery(Seq("events"), markovSql(4)),

    // One-way ANOVA F across the five event types.
    "q342_anova" -> sqlQuery(Seq("events"), anovaSql),

    // Two-sample KOLMOGOROV-SMIRNOV D via exact integer ECDF gaps.
    "q343_ks_test" -> sqlQuery(Seq("events"), ksSql),

    // BENJAMINI-HOCHBERG FDR step-up over per-nation deviation p-values.
    "q344_bh_fdr" -> sqlQuery(Seq("customer", "nation"), bhFdrSql),

    // PMI token co-occurrence under a deterministic top-50 vocabulary cap.
    "q345_pmi" -> sqlQuery(Seq("documents"),
      pmiSql(graft.pipeline.TextClassify.sparkTok)),

    // WEIGHT-OF-EVIDENCE / INFORMATION-VALUE bucket encoding.
    "q346_woe_iv" -> sqlQuery(Seq("orders"), woeSql),

    // JENSEN-SHANNON divergence between two sources' token distributions.
    "q347_js_divergence" -> sqlQuery(Seq("documents"), jsDivergenceSql(
      """SELECT source, explode(filter(split(lower(trim(text)), '\\s+'), x -> x != '')) AS word
        |FROM documents WHERE text IS NOT NULL AND source IS NOT NULL""".stripMargin)),

    // ITEM-ITEM collaborative filtering: co-ordered-parts cosine, top-3
    // neighbors per item (rounded-score ranking, deterministic ties).
    "q349_item_cooccurrence" -> sqlQuery(Seq("lineitem"), itemCooccurSql),

    // SEQUENTIAL patterns: per-user "a before b" support over the
    // (user, type) min/max-ts reduction.
    "q350_seq_patterns" -> sqlQuery(Seq("events"), seqPatternsSql),

    // MUTUAL INFORMATION between order priority and status.
    "q351_mutual_info" -> sqlQuery(Seq("orders"), mutualInfoSql),

    // CRAMER'S V association strength over the full contingency table.
    "q352_cramers_v" -> sqlQuery(Seq("orders"), cramersVSql),

    // MARKOV next-event entropy per state + stationary entropy rate
    // (shares q341's transition CTEs).
    "q353_markov_entropy" -> sqlQuery(Seq("events"), markovEntropySql(4)),

    // KATZ centrality, 4 decimal-pinned rounds (Graph.katz; oracle
    // unrolls the identical recurrence).
    "q354_katz_centrality" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT c_custkey % 60 AS s, (c_custkey * 7 + 3) % 60 AS v FROM customer
          |UNION ALL
          |SELECT (c_custkey * 3) % 60 AS s, (c_custkey * 11 + 5) % 60 AS v FROM customer""".stripMargin)
      graft.relational.Graph.katz(edges, "s", "v", alpha = 0.1, iters = 4)
        .selectExpr("cast(node as bigint) AS node", "katz")
        .orderBy("node")
    }),

    // LOCAL OUTLIER FACTOR (k=5), exact all-pairs twin (at-scale sibling:
    // same algebra over IVF-candidate neighborhoods). Spark side is the
    // pipeline operator — the SQL spelling re-runs the 4M-pair kNN
    // pipeline once per CTE consumer (see Outliers' scaladoc).
    "q355_lof" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Outliers.lof(emb, "vec_id", "embedding", k = 5)
        .orderBy(desc("lof"), col("id")).limit(20)
    }),

    // ISOTONIC calibration fit via the minimax (binned-PAV) closed form.
    "q356_isotonic" -> sqlQuery(Seq("orders"), isotonicSql),

    // THEIL-SEN robust slope + intercept over daily counts.
    "q357_theil_sen" -> sqlQuery(Seq("events"),
      theilSenSql(e => s"unix_micros($e) div 86400000000")),

    // ROLLING 7-day OLS slope (one window pass, decimal-folded sums).
    "q358_rolling_ols" -> sqlQuery(Seq("events"),
      rollingOlsSql(e => s"unix_micros($e) div 86400000000")),

    // DEGREE ASSORTATIVITY (directed out-in Pearson over edges).
    "q359_assortativity" -> sqlQuery(Seq("lineitem"), assortativitySql),

    // MODULARITY of the node%5 partition (per-community terms + total).
    "q360_modularity" -> sqlQuery(Seq("customer"), modularitySql),

    // HUBER robust regression (2 IRLS rounds, mean-absolute scale).
    "q361_huber" -> sqlQuery(Seq("events"),
      huberSql(e => s"unix_micros($e) div 86400000000")),

    // RANSAC line fit (20 md5-seeded trials, inlier refit).
    "q362_ransac" -> sqlQuery(Seq("events"),
      ransacSql(graft.pipeline.TopicModel.sparkDialect,
        e => s"unix_micros($e) div 86400000000")),

    // PER-USER BURSTINESS (Fano factor + Goh-Barabasi B).
    "q363_burstiness" -> sqlQuery(Seq("events"),
      burstinessSql(e => s"unix_micros($e) div 86400000000")),

    // DAY-OF-WEEK uniformity chi-squared.
    "q364_dow_chi2" -> sqlQuery(Seq("events"),
      dowChi2Sql(e => s"unix_micros($e) div 86400000000")),

    // MOVING-AVERAGE TYPE-TOKEN RATIO (lexical diversity, window 20).
    "q365_mattr" -> sqlQuery(Seq("documents"), mattrSql(spark = true)),

    // KEYWORD BURST detection over token-by-day counts.
    "q366_keyword_burst" -> sqlQuery(Seq("documents"),
      keywordBurstSql(graft.pipeline.TextClassify.sparkTok)),

    // HILBERT-curve layout shards (order-8 xy2d, unrolled CASE algebra).
    "q367_hilbert_layout" -> sqlQuery(Seq("customer"), hilbertLayoutSql),

    // CONTRASTIVE negative sampling (md5-ranked, bucket-bounded pool).
    "q368_negative_sampling" -> sqlQuery(Seq("documents"),
      negativeSamplingSql(graft.pipeline.TopicModel.sparkDialect)),

    // HARD-NEGATIVE mining (top-3 cosine among different-label vectors).
    "q369_hard_negatives" -> sqlQuery(Seq("embeddings"),
      hardNegativesSql((a, b) => s"vec_dot($a, $b)", "embedding")),

    // TwoNN INTRINSIC DIMENSION of the embedding corpus.
    "q370_intrinsic_dim" -> sqlQuery(Seq("embeddings"),
      twoNNSql((a, b) => s"vec_dot($a, $b)", "embedding", spark = true)),

    // T-CLOSENESS privacy audit (TV distance per equivalence class).
    "q371_t_closeness" -> sqlQuery(Seq("customer", "orders"), tClosenessSql),

    // SPLIT-CONFORMAL prediction interval (even/odd-day split, exact
    // rank quantile, coverage check).
    "q372_conformal" -> sqlQuery(Seq("events"),
      conformalSql(e => s"unix_micros($e) div 86400000000")),

    // POPULATION STABILITY INDEX between even/odd-key periods.
    "q373_psi" -> sqlQuery(Seq("orders"), psiSql),

    // CUMULATIVE GAINS / LIFT chart by score decile.
    "q374_gain_lift" -> sqlQuery(Seq("orders"), gainLiftSql),

    // COHORT LTV (first-active-week cohorts, cumulative purchase
    // revenue per user by age).
    "q375_cohort_ltv" -> sqlQuery(Seq("events"),
      cohortLtvSql(e => s"unix_micros($e) div 86400000000")),

    // 3-ITEMSET association rules (support floor + 3-way lift).
    "q376_triple_assoc" -> sqlQuery(Seq("lineitem"), tripleAssocSql),

    // NEXT-EVENT prediction accuracy of the Markov argmax policy.
    "q377_next_event_accuracy" -> sqlQuery(Seq("events"), nextEventAccuracySql),

    // NDCG@10 + MRR retrieval eval (token-overlap ranker, same-source
    // relevance).
    "q378_ndcg" -> sqlQuery(Seq("documents"),
      ndcgSql(graft.pipeline.TextClassify.sparkTok)),

    // UMASS topic coherence over per-language top terms.
    "q379_coherence" -> sqlQuery(Seq("documents"),
      coherenceSql(graft.pipeline.TextClassify.sparkTok)),

    // PERSONALIZED PAGERANK from node 0 (4 decimal-pinned rounds).
    "q380_ppr" -> sqlQuery(Seq("customer"), pprSql(4)),

    // SEASONAL-NAIVE forecast backtest (MAE/MAPE/sMAPE at lag 7).
    "q381_snaive_eval" -> sqlQuery(Seq("events"),
      snaiveEvalSql(e => s"unix_micros($e) div 86400000000")),

    // Two-level BINARY SEGMENTATION changepoints (prefix-sum SSE gain).
    "q382_binary_seg" -> sqlQuery(Seq("events"),
      binarySegSql(e => s"unix_micros($e) div 86400000000")),

    // WALD SPRT sequential test over the ordered event stream.
    "q383_sprt" -> sqlQuery(Seq("events"), sprtSql),

    // TEXTRANK keywords (weighted PageRank on the co-occurrence graph).
    "q384_textrank" -> sqlQuery(Seq("documents"),
      textRankSql(graft.pipeline.TextClassify.sparkTok, iters = 4)),

    // NEYMAN stratified-sampling allocation vs proportional.
    "q385_neyman" -> sqlQuery(Seq("customer"), neymanSql),

    // KRIPPENDORFF'S ALPHA (nominal) over the q314 rater panel.
    "q386_krippendorff" -> sqlQuery(Seq("orders"), krippendorffSql),

    // BRADLEY-TERRY strengths (3 MM rounds over quantity duels).
    "q387_bradley_terry" -> sqlQuery(Seq("lineitem"), bradleyTerrySql(3)),

    // HIERARCHICAL GROUP IMPUTATION with fill-level audit.
    "q388_group_imputation" -> sqlQuery(Seq("events"), groupImputeSql),

    // POWER ANALYSIS (n per arm, 80% power) from the observed effect.
    "q389_power_analysis" -> sqlQuery(Seq("events"), powerAnalysisSql),

    // LORENZ curve deciles (the curve behind q331's Gini).
    "q390_lorenz" -> sqlQuery(Seq("orders"), lorenzSql),

    // SAMPLE-RATIO-MISMATCH gate (1-df chi2 on user assignment).
    "q391_srm" -> sqlQuery(Seq("events"), srmSql),

    // CUPED variance reduction (pre-period covariate adjustment).
    "q392_cuped" -> sqlQuery(Seq("events"),
      cupedSql(e => s"unix_micros($e) div 86400000000")),

    // QUANTILE treatment effects at p25/p50/p75 (exact rank quantiles).
    "q393_qte" -> sqlQuery(Seq("events"), qteSql),

    // RECIPROCITY + global clustering coefficient.
    "q394_reciprocity_clustering" -> sqlQuery(Seq("lineitem"),
      reciprocityClusteringSql),

    // POWER-LAW degree-distribution fit (log-log OLS + R^2).
    "q395_powerlaw_fit" -> sqlQuery(Seq("lineitem"), powerlawFitSql),

    // DEDUP-DETECTOR EVAL: winnowing pairs vs prefix-dup ground truth.
    "q396_dedup_eval" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val fp = graft.pipeline.Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 4)
      val pred = graft.pipeline.Winnow.sharedPairs(fp, "doc_id", minBucket = 2, maxBucket = 50)
        .filter(col("shared") >= 3).select("da", "db").localCheckpoint()
      val pk = docs.filter(col("text").isNotNull && length(col("text")) >= 40)
        .select(col("doc_id"), substring(lower(col("text")), 1, 40).as("k"))
      val truth = pk.as("a").join(pk.as("b"),
          col("b.k") === col("a.k") && col("b.doc_id") > col("a.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .localCheckpoint()
      pred.createOrReplaceTempView("__dedup_pred")
      truth.createOrReplaceTempView("__dedup_truth")
      // same final arithmetic as the oracle text (see dedupEvalOracleSql)
      s.sql(
        """WITH tp AS (
          |  SELECT cast(count(*) as bigint) AS tp
          |  FROM __dedup_pred p JOIN __dedup_truth t
          |    ON t.da = p.da AND t.db = p.db),
          |c AS (
          |  SELECT (SELECT cast(count(*) as bigint) FROM __dedup_pred) AS n_pred,
          |    (SELECT cast(count(*) as bigint) FROM __dedup_truth) AS n_truth,
          |    tp.tp
          |  FROM tp)
          |SELECT n_pred, n_truth, tp,
          |  round(CASE WHEN n_pred > 0 THEN cast(tp as double) / n_pred
          |    ELSE 0 END, 6) + 0.0 AS precision,
          |  round(CASE WHEN n_truth > 0 THEN cast(tp as double) / n_truth
          |    ELSE 0 END, 6) + 0.0 AS recall,
          |  round(CASE WHEN tp > 0 THEN
          |    2 * (cast(tp as double) / n_pred) * (cast(tp as double) / n_truth)
          |      / (cast(tp as double) / n_pred + cast(tp as double) / n_truth)
          |    ELSE 0 END, 6) + 0.0 AS f1
          |FROM c""".stripMargin)
    }),

    // BRIER score + Murphy decomposition for the logistic price model.
    "q397_brier" -> sqlQuery(Seq("orders"), brierSql),

    // STRATIFIED ATE (activity-quintile standardization).
    "q398_stratified_ate" -> sqlQuery(Seq("events"), stratifiedAteSql),

    // MCNEMAR paired classifier comparison.
    "q399_mcnemar" -> sqlQuery(Seq("orders"), mcnemarSql),

    // PARTIAL CORRELATION r_xy.z from one folded scan.
    "q400_partial_corr" -> sqlQuery(Seq("documents"), partialCorrSql),

    // COOK'S DISTANCE regression diagnostics (top-5 influential days).
    "q401_cooks_distance" -> sqlQuery(Seq("events"),
      cooksDistanceSql(e => s"unix_micros($e) div 86400000000")),

    // HERFINDAHL-HIRSCHMAN concentration per nation.
    "q402_hhi" -> sqlQuery(Seq("orders", "customer"), hhiSql),

    // WALD-WOLFOWITZ runs test on daily moves.
    "q403_runs_test" -> sqlQuery(Seq("events"),
      runsTestSql(e => s"unix_micros($e) div 86400000000")),

    // GUMBEL block-maxima fit + 10-block return level.
    "q404_gumbel" -> sqlQuery(Seq("events"),
      gumbelSql(e => s"unix_micros($e) div 86400000000")),

    // NEWSVENDOR service-level order quantity (critical fractile).
    "q405_newsvendor" -> sqlQuery(Seq("events"),
      newsvendorSql(e => s"unix_micros($e) div 86400000000")),

    // ABC / Pareto classification of parts by revenue.
    "q406_abc" -> sqlQuery(Seq("lineitem"), abcSql),

    // 1-D EARTH MOVER'S DISTANCE between click and view values.
    "q407_emd" -> sqlQuery(Seq("events"), emdSql),

    // KENDALL'S TAU-B between daily click and view counts.
    "q408_kendall" -> sqlQuery(Seq("events"),
      kendallSql(e => s"unix_micros($e) div 86400000000")),

    // LOG-LOG PRICE ELASTICITY across parts.
    "q409_elasticity" -> sqlQuery(Seq("lineitem"), elasticitySql),

    // DISCRETE-TIME CHURN HAZARD by relative order quarter.
    "q410_churn_hazard" -> sqlQuery(Seq("orders"),
      churnHazardSql(e =>
        s"unix_micros(cast($e as timestamp)) div 7776000000000")),

    // EMPIRICAL-BAYES beta-binomial CTR shrinkage.
    "q411_eb_shrinkage" -> sqlQuery(Seq("events"), ebShrinkageSql),

    // FAIRNESS AUDIT (demographic parity + equalized odds).
    "q412_fairness_audit" -> sqlQuery(Seq("orders", "customer"),
      fairnessAuditSql),

    // HILL tail-index estimator (top-200 order totals).
    "q413_hill_tail" -> sqlQuery(Seq("orders"), hillTailSql),

    // TWO-PROPORTION z-test on per-user conversion by arm.
    "q414_two_proportion_z" -> sqlQuery(Seq("events"), twoProportionSql),

    // JARQUE-BERA normality test (moment-based).
    "q415_jarque_bera" -> sqlQuery(Seq("events"), jarqueBeraSql),

    // DURBIN-WATSON serial-correlation test on OLS residuals.
    "q416_durbin_watson" -> sqlQuery(Seq("events"),
      durbinWatsonSql(e => s"unix_micros($e) div 86400000000")),

    // TWO-PREDICTOR OLS (standardized betas, R^2, VIF).
    "q417_multi_ols2" -> sqlQuery(Seq("documents"), multiOls2Sql),

    // RECOMMENDER HOLDOUT EVAL (leave-last-order-out hit-rate@10).
    "q418_rec_holdout" -> sqlQuery(Seq("lineitem", "orders"), recHoldoutSql),

    // COPOD-flavored ECDF outlier score (top-10 documents).
    "q419_copod" -> sqlQuery(Seq("documents"), copodSql),

    // SIMPSON'S-PARADOX sign-flip detector.
    "q420_simpson_flip" -> sqlQuery(Seq("lineitem"), simpsonFlipSql),

    // ROUGE-1 between prefix-duplication pairs.
    "q421_rouge" -> sqlQuery(Seq("documents"),
      rougeSql(graft.pipeline.TextClassify.sparkTok)),

    // BLEU-2 with brevity penalty between prefix-duplication pairs.
    "q422_bleu" -> sqlQuery(Seq("documents"),
      bleuSql(graft.pipeline.TextClassify.sparkTokPos)),

    // PRICE-VOLUME-MIX decomposition between order periods.
    "q423_price_volume" -> sqlQuery(Seq("lineitem", "orders"),
      priceVolumeSql(e => s"year(cast($e as timestamp))")),

    // DISTINCT-N generation-diversity metrics per source.
    "q424_distinct_n" -> sqlQuery(Seq("documents"),
      distinctNSql(graft.pipeline.TextClassify.sparkTokPos)),

    // SELF-OVERLAP (self-BLEU-lite) per source.
    "q425_self_overlap" -> sqlQuery(Seq("documents"),
      selfOverlapSql(graft.pipeline.TextClassify.sparkTokPos)),

    // PERMUTATION ENTROPY (order 3) of the daily series.
    "q426_perm_entropy" -> sqlQuery(Seq("events"),
      permEntropySql(e => s"unix_micros($e) div 86400000000")),

    // HURST exponent by rescaled range over block sizes 5/10/15.
    "q427_hurst" -> sqlQuery(Seq("events"),
      hurstSql(e => s"unix_micros($e) div 86400000000")),

    // PERIODOGRAM over periods 2-10 (should recover the weekly cycle).
    "q428_periodogram" -> sqlQuery(Seq("events"),
      periodogramSql(e => s"unix_micros($e) div 86400000000")),

    // TOST equivalence test (margin 5) on click vs view means.
    "q429_tost" -> sqlQuery(Seq("events"), tostSql),

    // RECOMMENDER aggregate diversity (coverage + rec-count Gini).
    "q430_rec_coverage" -> sqlQuery(Seq("lineitem"), recCoverageSql),

    // YULE-WALKER AR(2) fit + in-sample one-step RMSE.
    "q431_yule_walker" -> sqlQuery(Seq("events"),
      yuleWalkerSql(e => s"unix_micros($e) div 86400000000")),

    // MAXIMUM DRAWDOWN of cumulative daily purchase revenue.
    "q432_max_drawdown" -> sqlQuery(Seq("events"),
      drawdownSql(e => s"unix_micros($e) div 86400000000")),

    // NELSON-AALEN cumulative hazard (q287 Kaplan-Meier companion).
    "q433_nelson_aalen" -> sqlQuery(Seq("events"),
      nelsonAalenSql(e => s"unix_micros($e)", "div")),

    // SEQUENTIAL max-|z| (ESD-style) outlier peeling, 3 rounds.
    "q434_esd_peel" -> sqlQuery(Seq("events"),
      esdPeelSql(e => s"unix_micros($e) div 86400000000")),

    // DTW distance between day-of-week profiles (native codegen kernel).
    "q435_dtw_profiles" -> sqlQuery(Seq("events"),
      dtwSparkSql(e => s"unix_micros($e) div 86400000000")),

    // APRIORI frequent triples with prefix-join candidate generation.
    "q436_apriori_triples" -> sqlQuery(Seq("lineitem"), aprioriTriplesSql),

    // SHAPLEY-value channel attribution over (user, day) journeys.
    "q437_shapley_attribution" -> sqlQuery(Seq("events"),
      shapleySql(e => s"unix_micros($e) div 86400000000")),

    // DIFFERENCE-IN-DIFFERENCES with pre-period placebo.
    "q438_diff_in_diff" -> sqlQuery(Seq("events"),
      didSql(e => s"unix_micros($e) div 86400000000")),

    // RAKING (iterative proportional fitting), 3 unrolled iterations.
    "q439_raking" -> sqlQuery(Seq("customer"), rakingSql(3)),

    // SCD2 validity-interval reconstruction + snapshot census.
    "q440_scd2_snapshot" -> sqlQuery(Seq("events"), scd2Sql),

    // ABSORBING-CHAIN expected steps to purchase (40 pinned rounds).
    "q441_absorbing_steps" -> sqlQuery(Seq("events"), absorbingSql(40, "")),

    // BPE FERTILITY: train 48 merges on the %7<>3 slice, encode the
    // held-out slice, tokens/word + chars/token per source. The train
    // is the driver-incremental exact path (2 jobs); the encode is a
    // pure per-row replace chain (no shuffle).
    "q442_bpe_fertility" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val merges = graft.pipeline.Bpe
        .bpeMerges(docs.filter(col("doc_id") % 7 =!= 3), "text", rounds = 48)
        .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val held = docs.filter(col("doc_id") % 7 === 3)
      val perWord = graft.pipeline.Bpe.bpeEncode(held, "doc_id", "text", merges)
        .groupBy(col("doc_id"), col("word_pos"), col("word"))
        .agg(count(lit(1)).as("ntok"))
      perWord.join(held.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
          count(lit(1)).cast("bigint").as("n_words"),
          sum("ntok").cast("bigint").as("n_tokens"),
          (round(sum("ntok").cast("double") / count(lit(1)), 6) + lit(0.0)).as("fertility"),
          (round(sum(length(col("word"))).cast("double") / sum("ntok"), 6) + lit(0.0))
            .as("chars_per_token"))
        .orderBy("source")
    }),

    // SHARED n-GRAM LADDER (4/8/16 by doubling joins) per source pair.
    "q443_ngram_ladder" -> sqlQuery(Seq("documents"),
      ngramLadderSql(graft.pipeline.TextClassify.sparkTokPos,
        g => s"cast(conv(substring(md5($g), 1, 15), 16, 10) as bigint)")),

    // COCHRAN-ARMITAGE trend test over priority-ordered finish rates.
    "q444_cochran_armitage" -> sqlQuery(Seq("orders"), cochranArmitageSql),

    // KENDALL'S W concordance across three nation rankings.
    "q445_kendall_w" -> sqlQuery(Seq("customer", "orders"), kendallWSql),

    // HOLT-WINTERS additive fit (28-day unroll, pinned state).
    "q446_holt_winters" -> sqlQuery(Seq("events"),
      holtWintersSql(e => s"unix_micros($e) div 86400000000")),

    // G-TEST log-likelihood-ratio independence.
    "q447_g_test" -> sqlQuery(Seq("orders"), gTestSql),

    // MASE + THEIL'S U2 for the seasonal-naive forecast.
    "q448_mase_theil" -> sqlQuery(Seq("events"),
      maseSql(e => s"unix_micros($e) div 86400000000")),

    // CLIFF'S DELTA effect size via midranks.
    "q449_cliffs_delta" -> sqlQuery(Seq("events"), cliffsDeltaSql),

    // ATKINSON inequality index (epsilon = 0.5).
    "q450_atkinson" -> sqlQuery(Seq("orders"), atkinsonSql),

    // WILSON 95% score intervals per nation.
    "q451_wilson_interval" -> sqlQuery(Seq("orders", "customer"), wilsonSql),

    // ENTITY RESOLUTION: first-token blocking + levenshtein<=3 matching
    // + distributed connected components (blocked pairs only — the
    // block join bounds candidate fan-out; never a corpus self-join).
    "q452_entity_resolution" -> ((s: SparkSession, dir: String) => {
      init(s)
      val parts = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_partkey") < 600)
        .select(col("p_partkey").as("id"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("blk"))
      val pairs = parts.as("a").join(parts.as("b"),
          col("b.blk") === col("a.blk") && col("b.id") > col("a.id"))
        .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      graft.pipeline.Dedup.assignComponents(
          parts.select(col("id").as("p_partkey")), "p_partkey", pairs)
        .orderBy("p_partkey")
    }),

    // SECOND-ORDER Markov next-event backtest vs first-order baseline.
    "q453_markov2_backtest" -> sqlQuery(Seq("events"),
      markov2Sql(e => s"unix_micros($e) div 86400000000")),

    // OVERDISPERSION (variance/mean) audit per event type.
    "q454_overdispersion" -> sqlQuery(Seq("events"),
      overdispersionSql(e => s"unix_micros($e) div 86400000000")),

    // QINI uplift curve by targeting decile.
    "q455_qini" -> sqlQuery(Seq("events"),
      qiniSql(e => s"unix_micros($e) div 86400000000")),

    // HOSMER-LEMESHOW calibration chi-square (train/test key split).
    "q456_hosmer_lemeshow" -> sqlQuery(Seq("orders"), hosmerLemeshowSql),

    // CRPS of the trailing-7-day empirical ensemble forecast.
    "q457_crps" -> sqlQuery(Seq("events"),
      crpsSql(e => s"unix_micros($e) div 86400000000")),

    // YULE'S K + Simpson's D lexical richness per source.
    "q458_yule_k" -> sqlQuery(Seq("documents"),
      yuleKSql(graft.pipeline.TextClassify.sparkTokPos)),

    // BURROWS' DELTA stylometry distance between sources.
    "q459_burrows_delta" -> sqlQuery(Seq("documents"),
      burrowsDeltaSql(graft.pipeline.TextClassify.sparkTokPos)),

    // RICH-CLUB coefficient of the category co-purchase graph.
    "q460_rich_club" -> sqlQuery(Seq("lineitem"), richClubSql),

    // JACKKNIFE (delete-one-group) SE of the mean order value.
    "q461_jackknife" -> sqlQuery(Seq("orders"), jackknifeSql(
      "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 15), 16, 10) as bigint) % 10")),

    // MOOD'S MEDIAN test across event types.
    "q462_moods_median" -> sqlQuery(Seq("events"), moodsMedianSql),

    // LEVENE'S variance-homogeneity F.
    "q463_levene" -> sqlQuery(Seq("events"), leveneSql),

    // PACF lags 1-3 by Durbin-Levinson.
    "q464_pacf" -> sqlQuery(Seq("events"),
      pacfSql(e => s"unix_micros($e) div 86400000000")),

    // STL-LITE trend/seasonal strength diagnostics.
    "q465_stl_strength" -> sqlQuery(Seq("events"),
      stlStrengthSql(e => s"unix_micros($e) div 86400000000")),

    // OTSU threshold over the order-value histogram.
    "q466_otsu" -> sqlQuery(Seq("orders"), otsuSql),

    // BORDA-COUNT consensus ranking.
    "q467_borda" -> sqlQuery(Seq("customer", "orders"), bordaSql),

    // 3-TRUSS support peeling (2 bounded rounds).
    "q468_truss_peel" -> sqlQuery(Seq("lineitem"), trussSql(2)),

    // RENEWAL diagnostics of inter-purchase gaps (CV = 1 under Poisson).
    "q469_renewal" -> sqlQuery(Seq("events"),
      renewalSql(e => s"unix_micros($e)", "div")),

    // WEIBULL median-rank regression fit of conversion durations.
    "q470_weibull" -> sqlQuery(Seq("events"),
      weibullSql(e => s"unix_micros($e)", "div")),

    // XmR (individuals/moving-range) control chart summary.
    "q471_xmr_chart" -> sqlQuery(Seq("events"),
      xmrSql(e => s"unix_micros($e) div 86400000000")),

    // RESTRICTED MEAN SURVIVAL TIME at 14 days over the KM curve.
    "q472_rmst" -> sqlQuery(Seq("events"),
      rmstSql(e => s"unix_micros($e)", "div")),

    // CHAO1 + Good-Turing unseen-vocabulary estimators per source.
    "q473_chao1" -> sqlQuery(Seq("documents"),
      chao1Sql(graft.pipeline.TextClassify.sparkTokPos)),

    // CHAPMAN capture-recapture vocabulary estimate.
    "q474_chapman" -> sqlQuery(Seq("documents"),
      chapmanSql(graft.pipeline.TextClassify.sparkTokPos)),

    // ICC(1,1) of per-(user, day) activity.
    "q475_icc" -> sqlQuery(Seq("events"),
      iccSql(e => s"unix_micros($e) div 86400000000")),

    // SEASONAL Mann-Kendall trend test (tie-corrected).
    "q476_seasonal_mk" -> sqlQuery(Seq("events"),
      seasonalMkSql(e => s"unix_micros($e) div 86400000000")),

    // TURNING-POINT randomness test.
    "q477_turning_point" -> sqlQuery(Seq("events"),
      turningPointSql(e => s"unix_micros($e) div 86400000000")),

    // SPIEGELHALTER calibration Z.
    "q478_spiegelhalter" -> sqlQuery(Seq("orders"), spiegelhalterSql),

    // DISTANCE CORRELATION (day index vs daily count).
    "q479_distance_corr" -> sqlQuery(Seq("events"),
      dcorSql(e => s"unix_micros($e) div 86400000000")),

    // LOG-RANK test between even/odd user cohorts.
    "q480_logrank" -> sqlQuery(Seq("events"),
      logRankSql(e => s"unix_micros($e)", "div")),

    // SEASONAL-HYBRID ESD anomaly peeling on STL-lite residuals.
    "q481_sh_esd" -> sqlQuery(Seq("events"),
      shEsdSql(e => s"unix_micros($e) div 86400000000")),

    // SYNTHETIC-CONTROL-LITE lift for nation 0.
    "q482_synth_control" -> sqlQuery(Seq("orders", "customer"),
      synthControlSql(e => s"year($e)")),

    // FELLEGI-SUNTER EM linkage weights (2 unrolled iterations).
    "q483_fellegi_sunter" -> sqlQuery(Seq("part"), fellegiSunterSql(2)),

    // RANK-BIASED OVERLAP between two nation rankings.
    "q484_rbo" -> sqlQuery(Seq("customer", "orders"), rboSql),

    // KEMENY distance from the Borda consensus to each input ranking.
    "q485_kemeny" -> sqlQuery(Seq("customer", "orders"), kemenySql),

    // LCS between dominant-type day sequences (native kernel).
    "q486_lcs_sequences" -> sqlQuery(Seq("events"),
      lcsSparkSql(e => s"unix_micros($e) div 86400000000")),

    // THEIL-T inequality with between/within decomposition.
    "q487_theil" -> sqlQuery(Seq("orders", "customer"), theilSql),

    // OAXACA-BLINDER two-fold gap decomposition.
    "q488_oaxaca" -> sqlQuery(Seq("orders", "customer"), oaxacaSql),

    // MARKOV removal-effect attribution (24 pinned rounds/scenario).
    "q489_markov_attribution" -> sqlQuery(Seq("events"),
      markovAttributionSql(24, "")),

    // EXPECTED RECIPROCAL RANK @10 (cascade model).
    "q490_err" -> sqlQuery(Seq("customer", "orders"), errSql),

    // KRUSKAL-WALLIS k-group rank test (tie-corrected).
    "q491_kruskal_wallis" -> sqlQuery(Seq("events"), kruskalWallisSql),

    // FRIEDMAN test over day blocks x event types.
    "q492_friedman" -> sqlQuery(Seq("events"),
      friedmanSql(e => s"unix_micros($e) div 86400000000")),

    // COMPETING-RISKS cumulative incidence (Aalen-Johansen).
    "q493_competing_risks" -> sqlQuery(Seq("events"),
      cifSql(e => s"unix_micros($e)", "div")),

    // CHURCH-GALE word burstiness vs the Poisson repeat rate.
    "q494_burstiness_cg" -> sqlQuery(Seq("documents"),
      burstinessSql(graft.pipeline.TextClassify.sparkTokPos)),

    // COCHRAN'S Q over last-5-day participation.
    "q495_cochran_q" -> sqlQuery(Seq("events"),
      cochranQSql(e => s"unix_micros($e) div 86400000000")),

    // CLUSTER-SAMPLING design effect (DEFF).
    "q496_design_effect" -> sqlQuery(Seq("events"), deffSql),

    // YUEN'S trimmed-mean t (10% trim).
    "q497_yuen_t" -> sqlQuery(Seq("events"), yuenSql),

    // O'BRIEN-FLEMING sequential boundary monitor.
    "q498_obf_monitor" -> sqlQuery(Seq("events"),
      obfSql(e => s"unix_micros($e) div 86400000000")),

    // PAGE'S trend test (weeks ordered within day-of-week blocks).
    "q499_page_trend" -> sqlQuery(Seq("events"),
      pageTrendSql(e => s"unix_micros($e) div 86400000000")),

    // TUKEY HSD post-hoc pairwise comparisons.
    "q500_tukey_hsd" -> sqlQuery(Seq("events"), tukeyHsdSql),

    // DUNN'S post-hoc pairwise rank z.
    "q501_dunn" -> sqlQuery(Seq("events"), dunnSql),

    // JAMES-STEIN shrinkage of per-nation means.
    "q502_james_stein" -> sqlQuery(Seq("orders", "customer"), jamesSteinSql),

    // BOX-COX lambda grid search.
    "q503_box_cox" -> sqlQuery(Seq("orders"), boxCoxSql),

    // ANDERSON-DARLING exponential fit of purchase gaps.
    "q504_anderson_darling" -> sqlQuery(Seq("events"),
      adExpSql(e => s"unix_micros($e)", "div")),

    // TWO-COMPONENT Gaussian mixture via 3 unrolled EM rounds.
    "q505_gmm2_em" -> sqlQuery(Seq("orders"), gmm2Sql(3)),

    // MONROE log-odds with informative prior (src0 vs rest).
    "q506_monroe_log_odds" -> sqlQuery(Seq("documents"),
      monroeSql(graft.pipeline.TextClassify.sparkTokPos)),

    // SYNTETOS-BOYLAN intermittent-demand quadrants.
    "q507_syntetos_boylan" -> sqlQuery(Seq("lineitem", "orders"),
      syntetosBoylanSql((a, b) => s"datediff($a, $b)")),

    // POISSON-GAMMA EB shrinkage of weekly demand rates.
    "q508_poisson_gamma" -> sqlQuery(Seq("lineitem", "orders"),
      poissonGammaSql("unix_micros(cast(o.o_orderdate as timestamp)) div 604800000000")),

    // PROPENSITY-SCORE nearest-neighbor matching ATT.
    "q509_psm" -> sqlQuery(Seq("events"),
      psmSql(e => s"unix_micros($e) div 86400000000")),

    // REGRESSION DISCONTINUITY at acctbal = 0.
    "q510_rdd" -> sqlQuery(Seq("orders", "customer"), rddSql),

    // WALD instrumental-variable estimator.
    "q511_wald_iv" -> sqlQuery(Seq("events"), waldIvSql),

    // EVENT STUDY around first purchase.
    "q512_event_study" -> sqlQuery(Seq("events"),
      eventStudySql(e => s"unix_micros($e) div 86400000000")),

    // BREUSCH-PAGAN heteroskedasticity LM.
    "q513_breusch_pagan" -> sqlQuery(Seq("orders", "customer"), breuschPaganSql),

    // HC0 robust standard error vs classical.
    "q514_hc0" -> sqlQuery(Seq("orders", "customer"), hc0Sql),

    // PANEL fixed-effects within estimator.
    "q515_fixed_effects" -> sqlQuery(Seq("events"),
      fixedEffectsSql(e => s"unix_micros($e) div 86400000000")),

    // CLUSTER-ROBUST SE for the within slope.
    "q516_clustered_se" -> sqlQuery(Seq("events"),
      clusteredSeSql(e => s"unix_micros($e) div 86400000000")),

    // GAUSSIAN KDE at a fixed grid.
    "q517_kde" -> sqlQuery(Seq("orders"), kdeSql),

    // NADARAYA-WATSON kernel regression at a fixed grid.
    "q518_nadaraya_watson" -> sqlQuery(Seq("orders", "customer"),
      nadarayaWatsonSql),

    // LOESS-LITE local linear with tricube weights.
    "q519_loess" -> sqlQuery(Seq("orders", "customer"), loessSql),

    // MEDIAN (LAD) regression via 3 IRLS rounds.
    "q520_lad_regression" -> sqlQuery(Seq("orders", "customer"), ladSql(3)),

    // POISSON GLM (log link) via 3 Newton rounds.
    "q521_poisson_glm" -> sqlQuery(Seq("events"),
      poissonGlmSql(e => s"unix_micros($e) div 86400000000")),

    // COX proportional hazards (binary covariate, Breslow ties).
    "q522_cox_ph" -> sqlQuery(Seq("events"),
      coxPhSql(e => s"unix_micros($e)", "div")),

    // AIC/BIC table: mean vs AR(1) vs AR(2).
    "q523_aic_table" -> sqlQuery(Seq("events"),
      aicTableSql(e => s"unix_micros($e) div 86400000000")),

    // GRANGER causality (lag 1, clicks -> purchases).
    "q524_granger" -> sqlQuery(Seq("events"),
      grangerSql(e => s"unix_micros($e) div 86400000000")),

    // ENGLE ARCH(1) LM test.
    "q525_arch_lm" -> sqlQuery(Seq("events"),
      archSql(e => s"unix_micros($e) div 86400000000")),

    // LJUNG-BOX portmanteau (lags 1-5) on AR(1) residuals.
    "q526_ljung_box" -> sqlQuery(Seq("events"),
      ljungBoxSql(e => s"unix_micros($e) div 86400000000")),

    // LOCAL clustering coefficient + transitivity.
    "q527_clustering_coef" -> sqlQuery(Seq("lineitem"), clusteringCoefSql),

    // LITTLE'S LAW audit (L vs lambda W, independent L).
    "q528_littles_law" -> sqlQuery(Seq("events"),
      littlesLawSql(e => s"unix_micros($e)", "div",
        "SELECT explode(sequence(0, 1000)) AS i")),

    // MCC / balanced accuracy / F1 for the priority model.
    "q529_mcc" -> sqlQuery(Seq("orders"), mccSql),

    // CLAYTON copula theta from exact Kendall tau.
    "q530_clayton_copula" -> sqlQuery(Seq("events"),
      claytonSql(e => s"unix_micros($e) div 86400000000")),

    // GPD peaks-over-threshold MoM fit.
    "q531_gpd_pot" -> sqlQuery(Seq("orders"), gpdPotSql),

    // RECOMMENDATION novelty (self-information of rec'd items).
    "q532_rec_novelty" -> sqlQuery(Seq("lineitem"), recNoveltySql),

    // TOP conversion paths (3-step pre-purchase windows).
    "q533_conversion_paths" -> sqlQuery(Seq("events"), conversionPathsSql),

    // PRICE dispersion (law-of-one-price CV).
    "q534_price_dispersion" -> sqlQuery(Seq("lineitem"), priceDispersionSql),

    // DUPLICATE-payment audit (same cust+amount within 3 days).
    "q535_dup_payments" -> sqlQuery(Seq("orders"),
      dupPaymentSql((a, b) => s"datediff($a, $b)")),

    // WASSERSTEIN-1 distance between priority-class value distributions.
    "q536_wasserstein" -> sqlQuery(Seq("orders"), wassersteinSql),

    // EWMA control chart on daily event counts (exact 2^-k weights).
    "q537_ewma_chart" -> sqlQuery(Seq("events"),
      ewmaChartSql(e => s"unix_micros($e) div 86400000000")),

    // CROSTON intermittent-demand forecast for slow-moving parts.
    // l_shipdate is TIMESTAMP_NTZ: day-number via date diff (TZ-free).
    "q538_croston" -> sqlQuery(Seq("lineitem"),
      crostonSql(e => s"datediff(cast($e as date), DATE '1970-01-01')")),

    // SPECTRAL entropy + flatness of the daily count periodogram.
    "q539_spectral_entropy" -> sqlQuery(Seq("events"),
      spectralEntropySql(e => s"unix_micros($e) div 86400000000")),

    // HERFINDAHL supplier-revenue concentration per region.
    "q540_herfindahl" -> sqlQuery(
      Seq("lineitem", "supplier", "nation", "region"), herfindahlSql),

    // ENERGY distance between priority-class value samples (rank closed forms).
    "q541_energy_distance" -> sqlQuery(Seq("orders"), energyDistanceSql),

    // WINNOWING fingerprints + shared-fingerprint near-dup pairs. The
    // Spark side is the pipeline operator (localCheckpoint-materialized
    // fingerprints — see Winnow's planner note on why the pure-SQL form
    // degenerates); the oracle replays the identical selection in DuckDB
    // array algebra.
    "q348_winnowing" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val fp = graft.pipeline.Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 4)
      graft.pipeline.Winnow.sharedPairs(fp, "doc_id", minBucket = 2, maxBucket = 50)
        .orderBy(desc("shared"), col("da"), col("db"))
        .limit(30)
    }),

    // DEEP BPE training — 256 exact sequential merges over the customer
    // name vocabulary (1500 distinct words, heavy count ties exercising
    // the lexicographic tie-break). Runs on the driver-incremental exact
    // path (cap-probed vocabulary collect, incremental pair-count deltas
    // + inverted pair->word index — the classic tokenizer-trainer
    // algorithm): O(1) Spark jobs for all 256 merges instead of one full
    // recount per merge, bit-equal to the distributed sequential loop
    // (PipelineSpec pins parity). The oracle replays all 256 rounds as
    // unrolled MATERIALIZED CTEs.
    "q307_bpe_deep" -> ((s: SparkSession, dir: String) => {
      init(s)
      val txt = s.read.parquet(s"$dir/customer.parquet")
        .select(concat_ws(" ", col("c_name"), col("c_mktsegment")).as("text"))
      Bpe.bpeMerges(txt, "text", rounds = 256).orderBy("round")
    }),

    // Cross-source n-gram LEAKAGE matrix — which sources share phrasing
    // (the between-source view of contamination, q108's within-corpus
    // shape): distinct (source, 8-gram) sets, pair overlap by one
    // equi-join on the gram (per-gram source lists bounded by #sources —
    // never a corpus self-join), Jaccard-normalized. Top-20 pairs.
    "q306_cross_source_leakage" -> sqlQuery(Seq("documents"),
      """WITH ws AS (
        |  SELECT source, split(trim(text), '\\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT DISTINCT source, gram FROM (
        |    SELECT source, explode(transform(sequence(1, size(w) - 7),
        |      i -> concat_ws(' ', slice(w, i, 8)))) AS gram
        |    FROM ws WHERE size(w) >= 8) x),
        |tot AS (SELECT source, cast(count(*) as bigint) AS n FROM g GROUP BY source),
        |pair AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    cast(count(*) as bigint) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT p.source_a, p.source_b, p.shared,
        |  round(cast(p.shared as double) / (ta.n + tb.n - p.shared), 6) + 0.0 AS jaccard
        |FROM pair p
        |JOIN tot ta ON ta.source = p.source_a
        |JOIN tot tb ON tb.source = p.source_b
        |ORDER BY p.shared DESC, p.source_a, p.source_b LIMIT 20""".stripMargin),

    // Equal Earth (ESRI:54035) — the modern equal-area world map
    // projection (Savric-Patterson-Jenny polynomial) in PROJ's
    // ELLIPSOIDAL form: beta is the authalic latitude, the scale radius
    // is Rq = a*sqrt(qP/2), so positions match PROJ/ESRI on +ellps
    // input. Edge constants pinned closed-form (x(180,0) =
    // pi*Rq/(M*A1), pole y from the polynomial at theta =
    // asin(sqrt(3)/2), both scaled by the authalic radius), round-trips
    // at 6 decimals through the authalic inverse (Newton on q), and the
    // equal-area ratio is 1.000 against the ELLIPSOID patch area
    // a^2*dLam*(q(lat2)-q(lat1))/2 — the authalic mapping preserves
    // ellipsoid surface area exactly (the q257/q294 discipline).
    "q305_equal_earth" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val a = 6378137.0
      val f = 1.0 / 298.257223563
      val e2 = f * (2 - f)
      val e = math.sqrt(e2)
      // Snyder 3-12 q(phi) as a SQL fragment over a latitude expression
      def qSql(latExpr: String): String =
        s"((1 - $e2) * (sin(radians($latExpr)) / (1 - $e2 * pow(sin(radians($latExpr)), 2)) " +
          s"- (1 / (2 * $e)) * ln((1 - $e * sin(radians($latExpr))) / (1 + $e * sin(radians($latExpr))))))"
      s.sql(
        s"""WITH pts AS (
           |  SELECT c_custkey,
           |    cast(c_custkey % 340 - 170 as double) AS lon,
           |    cast((c_custkey * 7) % 160 - 80 as double) AS lat
           |  FROM customer WHERE c_custkey <= 1000)
           |SELECT c_custkey,
           |  round(st_x(st_transform(st_point(180.0, 0.0), 'EPSG:4326', 'ESRI:54035')), 1) + 0.0 AS world_x,
           |  round(st_y(st_transform(st_point(0.0, 90.0), 'EPSG:4326', 'ESRI:54035')), 1) + 0.0 AS pole_y,
           |  round(st_x(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'ESRI:54035'),
           |    'ESRI:54035', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
           |  round(st_y(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'ESRI:54035'),
           |    'ESRI:54035', 'EPSG:4326')), 6) + 0.0 AS rt_lat,
           |  round(st_area(st_transform(st_makeenvelope(lon, lat, lon + 0.02, lat + 0.02),
           |    'EPSG:4326', 'ESRI:54035')) /
           |    ($a * $a * radians(0.02) * (${qSql("lat + 0.02")} - ${qSql("lat")}) / 2), 3) + 0.0 AS area_ratio
           |FROM pts ORDER BY c_custkey""".stripMargin)
    }),

    // nProbe CALIBRATION for the IVF family (the guardrail q267 showed is
    // needed: recall ~0.5 at the tight nProbe=2 default is silent): ONE
    // corpus scan scores every (sample query, row) pair, the exact top-k
    // per query (self excluded) joins each hit's cell to its rank in the
    // query's centroid preference order, and every candidate budget's
    // recall reads off that table — no per-budget re-search. `chosen`
    // marks the smallest budget reaching the 0.9 target.
    "q308_nprobe_calibration" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      Similarity.calibrateNProbe(emb, "vec_id", "embedding", cents,
          k = 10, targetRecall = 0.9, nQueries = 8)
        .orderBy("n_probe")
    }),

    // Mutual-best matching AT SCALE: q302's reciprocal-NN assignment
    // through ONE shared IVF cell space (centroids trained on the union)
    // — both directions bound candidates to nProbe probed cells, so the
    // pair table grows with cell occupancy, never with the product of
    // the sides. The probe budget is no longer a guessed constant: the
    // q308 calibration picks the smallest nProbe reaching 0.9 sample
    // recall@10, and the output carries (n_probe, cal_recall) so the
    // approximation is LOUD. q302 remains the exact verifier.
    "q304_mutual_best_ivf" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      val sel = Similarity.calibrateNProbe(emb, "vec_id", "embedding", cents,
          k = 10, targetRecall = 0.9, nQueries = 8)
        .filter(col("chosen")).select("n_probe", "recall").collect()(0)
      val nSel = sel.getInt(0); val calRecall = sel.getDouble(1)
      val a = emb.where(col("label") === 0)
        .select(col("vec_id").as("aid"), col("embedding").as("av"))
      val b = emb.where(col("label") === 1)
        .select(col("vec_id").as("bid"), col("embedding").as("bv"))
      val ab = Similarity.ivfKnnJoin(a, "aid", "av", b, "bid", "bv",
          kCells = 8, nProbe = nSel, k = 1, centroids = Some(cents))
        .select(col("lid").as("aid"), col("rid").as("ab_bid"), col("cos").as("ab_cos"))
      val ba = Similarity.ivfKnnJoin(b, "bid", "bv", a, "aid", "av",
          kCells = 8, nProbe = nSel, k = 1, centroids = Some(cents))
        .select(col("lid").as("bid"), col("rid").as("ba_aid"))
      ab.join(ba, ab("ab_bid") === ba("bid") && ab("aid") === ba("ba_aid"))
        .select(col("aid").cast("long").as("aid"), col("bid").cast("long").as("bid"),
          (round(col("ab_cos"), 6) + 0.0).as("cosine"))
        .withColumn("n_probe", lit(nSel))
        .withColumn("cal_recall", lit(calRecall))
        .orderBy("aid")
    }),

    // Bootstrap CI for AUC — the uncertainty companion of the point
    // estimates (q266): 20 DETERMINISTIC Poisson(1) resamples (integer
    // weights from md5(doc, b) thresholds — reproducible on any engine,
    // no RNG state), weighted tie-aware rank AUC per resample via an
    // integer-exact 2x numerator, then mean and the 5/95 percentile
    // band. Resampling costs ONE 20x weighted aggregation — the corpus
    // is never re-materialized.
    "q303_auc_bootstrap" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val base = s.table("documents").where(qcWhere)
      val feats = qcFeatureSqls.map(expr)
      val w = graft.pipeline.Classifier.trainLogistic(
        base, feats, expr(qcLabelSql), lr = 0.5, iters = 3)
      val sc = graft.pipeline.Classifier.score(w, feats)
      base.select(col("doc_id"), round(sc, 6).as("score"), expr(qcLabelSql).as("y"))
        .createOrReplaceTempView("scored_id")
      val uExpr = "cast(conv(substring(md5(concat(cast(s.doc_id as string), '|', " +
        "cast(t.b as string))), 1, 15), 16, 10) as bigint) % 1000000"
      s.sql("WITH " + bootstrapAucTail(uExpr,
        (c, p) => s"percentile($c, cast($p as double))"))
    }),

    // Mutual-best (reciprocal nearest-neighbor) matching between two
    // embedding populations — the deterministic entity-resolution
    // assignment: each side's argmax partner (cosine, id tie-break), kept
    // only when reciprocal. Two broadcast k=1 kNN joins + one equi-join.
    // EXACT-verification twin by design (the scored-pair table grows with
    // the PRODUCT of the sides — 13.1x at 10x/10x, BASELINE): the at-scale
    // path is ivfKnnJoin(k=1) in both directions + the same reciprocal
    // filter, which bounds candidates to shared cells exactly like q278.
    "q302_mutual_best_match" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val a = emb.where(col("label") === 0)
        .select(col("vec_id").as("aid"), col("embedding").as("av"))
      val b = emb.where(col("label") === 1)
        .select(col("vec_id").as("bid"), col("embedding").as("bv"))
      val ab = graft.pipeline.Similarity.knnJoin(
          b, a, "bid", "bv", "aid", "av", k = 1)
        .select(col("aid"), col("bid").as("ab_bid"), col("cosine").as("ab_cos"))
      val ba = graft.pipeline.Similarity.knnJoin(
          a, b, "aid", "av", "bid", "bv", k = 1)
        .select(col("bid"), col("aid").as("ba_aid"))
      ab.join(ba, ab("ab_bid") === ba("bid") && ab("aid") === ba("ba_aid"))
        .select(col("aid").cast("long").as("aid"), col("bid").cast("long").as("bid"),
          (round(col("ab_cos"), 6) + 0.0).as("cosine"))
        .orderBy("aid")
    }),

    // Winsorized + trimmed means per group (the robust-statistics pair
    // beside q285's median/MAD): p05/p95 cuts via the q152-proven
    // exact-percentile pair; winsorize = clamp to the cuts, trim = drop
    // outside them. Cuts broadcast back; sums decimal-folded.
    "q301_winsorized_stats" -> sqlQuery(Seq("events"),
      """WITH cuts AS (
        |  SELECT event_type,
        |    percentile(value, cast(0.05 as double)) AS p05,
        |    percentile(value, cast(0.95 as double)) AS p95
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_type,
        |  cast(count(*) as bigint) AS n,
        |  round(cast(sum(cast(round(e.value, 6) as decimal(20,6))) as double)
        |    / count(*), 6) + 0.0 AS raw_mean,
        |  round(cast(sum(cast(round(greatest(c.p05, least(c.p95, e.value)), 6)
        |    as decimal(20,6))) as double) / count(*), 6) + 0.0 AS winsorized_mean,
        |  round(cast(sum(CASE WHEN e.value >= c.p05 AND e.value <= c.p95
        |      THEN cast(round(e.value, 6) as decimal(20,6))
        |      ELSE cast(0 as decimal(20,6)) END) as double)
        |    / sum(CASE WHEN e.value >= c.p05 AND e.value <= c.p95 THEN 1 ELSE 0 END),
        |    6) + 0.0 AS trimmed_mean,
        |  cast(sum(CASE WHEN e.value < c.p05 OR e.value > c.p95 THEN 1 ELSE 0 END)
        |    as bigint) AS n_clamped
        |FROM events e JOIN cuts c ON e.event_type = c.event_type
        |WHERE e.value IS NOT NULL
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),

    // The corpus DATASHEET (q300): one declarative plan composing the
    // intake audit a training-data pipeline runs on every drop — volume,
    // exact-dup rate, token distribution, short/low-alpha shares,
    // vocabulary, and md5-shard balance. Every metric is a
    // map-side-combinable aggregate over ONE scan (plus the distinct
    // passes); the whole datasheet costs two shuffles at any corpus size.
    "q300_corpus_datasheet" -> sqlQuery(Seq("documents"),
      """WITH d AS (
        |  SELECT doc_id, text,
        |    cast(length(text) as bigint) AS n_chars,
        |    cast(size(split(trim(text), '\\s+')) as bigint) AS n_tok,
        |    cast(length(regexp_replace(text, '[^a-zA-Z]', '')) as bigint) AS n_alpha,
        |    md5(text) AS digest,
        |    cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 16 AS shard
        |  FROM documents WHERE text IS NOT NULL),
        |vocab AS (
        |  SELECT cast(count(distinct word) as bigint) AS v FROM (
        |    SELECT explode(split(lower(text), '[^a-z]+')) AS word
        |    FROM documents WHERE text IS NOT NULL) w WHERE length(word) >= 1),
        |shards AS (
        |  SELECT max(c) AS cmax, min(c) AS cmin FROM (
        |    SELECT shard, cast(count(*) as bigint) AS c FROM d GROUP BY shard) s),
        |agg AS (
        |  SELECT cast(count(*) as bigint) AS n_docs,
        |    cast(sum(n_chars) as bigint) AS n_chars,
        |    cast(sum(n_tok) as bigint) AS n_tokens,
        |    cast(count(distinct digest) as bigint) AS n_distinct,
        |    round(cast(sum(n_tok) as double) / count(*), 6) + 0.0 AS mean_tokens,
        |    round(cast(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) as double)
        |      / count(*), 6) + 0.0 AS pct_short,
        |    round(cast(sum(CASE WHEN n_alpha * 10 < n_chars * 6 THEN 1 ELSE 0 END) as double)
        |      / count(*), 6) + 0.0 AS pct_low_alpha
        |  FROM d)
        |SELECT a.n_docs, a.n_chars, a.n_tokens,
        |  round(1.0 - cast(a.n_distinct as double) / a.n_docs, 6) + 0.0 AS exact_dup_pct,
        |  a.mean_tokens, a.pct_short, a.pct_low_alpha,
        |  v.v AS vocab_size,
        |  s.cmax AS shard_max, s.cmin AS shard_min,
        |  round(cast(s.cmax as double) / s.cmin, 6) + 0.0 AS shard_skew
        |FROM agg a CROSS JOIN vocab v CROSS JOIN shards s""".stripMargin),

    // Heaps'-law vocabulary growth V(n) ~ K * n^beta: ONE pass gives each
    // word its first document (min doc_id); cumulative vocabulary is then
    // a running count over doc order — no per-prefix re-scans. OLS of
    // ln V on ln n over the per-doc growth curve (q298's decimal-folded
    // moment shape).
    "q299_heaps_law" -> sqlQuery(Seq("documents"),
      """WITH tok AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, explode(split(lower(text), '[^a-z]+')) AS word
        |    FROM documents WHERE text IS NOT NULL) w
        |  WHERE length(word) >= 1),
        |per_doc AS (
        |  SELECT doc_id, cast(count(*) as bigint) AS n_tok FROM tok GROUP BY doc_id),
        |firsts AS (
        |  SELECT first_doc, cast(count(*) as bigint) AS n_new
        |  FROM (SELECT word, min(doc_id) AS first_doc FROM tok GROUP BY word) f
        |  GROUP BY 1),
        |curve AS (
        |  SELECT d.doc_id,
        |    sum(d.n_tok) OVER (ORDER BY d.doc_id) AS cum_tok,
        |    sum(coalesce(f.n_new, 0)) OVER (ORDER BY d.doc_id) AS cum_vocab
        |  FROM per_doc d LEFT JOIN firsts f ON f.first_doc = d.doc_id),
        |pts AS (
        |  SELECT cast(round(ln(cast(cum_tok as double)), 9) as decimal(20,9)) AS x,
        |    cast(round(ln(cast(cum_vocab as double)), 9) as decimal(20,9)) AS y
        |  FROM curve WHERE cum_vocab > 0),
        |m AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(x) as double) AS sx, cast(sum(y) as double) AS sy,
        |    cast(sum(cast(x * y as decimal(30,18))) as double) AS sxy,
        |    cast(sum(cast(x * x as decimal(30,18))) as double) AS sxx,
        |    cast(sum(cast(y * y as decimal(30,18))) as double) AS syy
        |  FROM pts)
        |SELECT n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS beta,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0
        |    AS ln_k,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS r2
        |FROM m""".stripMargin),

    // Zipf's-law fit over the corpus vocabulary: OLS of ln(freq) on
    // ln(rank) for the top-1000 terms (slope ~ -1 on natural text), with
    // r-squared — the corpus-statistics audit beside the quality/LM
    // family. Word counts map-side combine; the regression runs on 1000
    // rows of decimal-folded moments (rounded-9 logs so the folds are
    // order-independent and engine-exact).
    "q298_zipf_law" -> sqlQuery(Seq("documents"),
      """WITH wc AS (
        |  SELECT word, cast(count(*) as bigint) AS freq FROM (
        |    SELECT explode(split(lower(text), '[^a-z]+')) AS word
        |    FROM documents WHERE text IS NOT NULL) w
        |  WHERE length(word) >= 1 GROUP BY word),
        |rk AS (
        |  SELECT freq, row_number() OVER (ORDER BY freq DESC, word) AS rank
        |  FROM wc),
        |pts AS (
        |  SELECT cast(round(ln(cast(rank as double)), 9) as decimal(20,9)) AS x,
        |    cast(round(ln(cast(freq as double)), 9) as decimal(20,9)) AS y
        |  FROM rk WHERE rank <= 1000),
        |m AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(x) as double) AS sx, cast(sum(y) as double) AS sy,
        |    cast(sum(cast(x * y as decimal(30,18))) as double) AS sxy,
        |    cast(sum(cast(x * x as decimal(30,18))) as double) AS sxx,
        |    cast(sum(cast(y * y as decimal(30,18))) as double) AS syy
        |  FROM pts)
        |SELECT n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0
        |    AS intercept,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS r2
        |FROM m""".stripMargin),

    // Geodesic proximity join (geography ST_DWithin): pairs within 150 km
    // of spherical distance via lat/lon cell binning — cells sized so the
    // 3x3 neighborhood covers the radius up to |lat| 60 (lon cells 2x
    // wider for meridian convergence), lon cells wrapping mod 120 so
    // antimeridian-straddling pairs stay adjacent, ONE equi-join on the
    // cell key with 9x one-sided replication, haversine refinement after. The geography
    // twin of the planar grid join; never a BNLJ. Haversine written as
    // identical SQL text in both engines.
    "q297_geodesic_dwithin" -> sqlQuery(Seq("customer"),
      """WITH pts AS (
        |  SELECT c_custkey AS id,
        |    cast(cast(conv(substring(md5(cast(c_custkey as string)), 1, 15), 16, 10) as bigint) % 3600 as double) / 10.0 - 180.0 AS lon,
        |    cast(cast(conv(substring(md5(cast(c_custkey as string)), 16, 15), 16, 10) as bigint) % 1200 as double) / 10.0 - 60.0 AS lat
        |  FROM customer WHERE c_custkey <= 1200),
        |cells AS (
        |  SELECT id, lon, lat,
        |    ((cast(floor(lon / 3.0) as bigint) % 120) + 120) % 120 AS cx,
        |    cast(floor(lat / 1.5) as bigint) AS cy
        |  FROM pts),
        |offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
        |  (1,-1),(1,0),(1,1)) AS t(dx, dy)),
        |cand AS (
        |  SELECT a.id AS ida, b.id AS idb, a.lon AS ax, a.lat AS ay,
        |    b.lon AS bx, b.lat AS by
        |  FROM cells a
        |  JOIN offs o ON true
        |  JOIN cells b ON b.cx = (a.cx + o.dx + 120) % 120 AND b.cy = a.cy + o.dy
        |  WHERE a.id < b.id),
        |withd AS (
        |  SELECT ida, idb,
        |    2.0 * 6371008.8 * asin(least(cast(1.0 as double),
        |      sqrt(pow(sin((radians(by) - radians(ay)) / 2), 2)
        |        + cos(radians(ay)) * cos(radians(by))
        |        * pow(sin((radians(bx) - radians(ax)) / 2), 2)))) AS d
        |  FROM cand)
        |SELECT ida, idb, round(d / 1000.0, 2) + 0.0 AS dist_km
        |FROM withd WHERE d <= 150000.0
        |ORDER BY ida, idb""".stripMargin),

    // Incremental aggregate maintenance (the materialized-view update
    // pattern): a persisted base aggregate + the delta's partial
    // aggregate merge by full-outer join — counts/decimal-sums add,
    // min/max take least/greatest — WITHOUT rescanning the base. The
    // oracle recomputes from the full table: merged == recomputed is the
    // correctness statement of incremental view maintenance.
    "q296_incremental_agg" -> sqlQuery(Seq("orders"),
      """WITH base AS (
        |  SELECT o_orderpriority AS pri,
        |    cast(count(*) as bigint) AS n,
        |    sum(cast(o_totalprice as decimal(18,2))) AS total,
        |    min(o_orderdate) AS first_d, max(o_orderdate) AS last_d
        |  FROM orders WHERE o_orderkey % 10 < 8 GROUP BY o_orderpriority),
        |delta AS (
        |  SELECT o_orderpriority AS pri,
        |    cast(count(*) as bigint) AS n,
        |    sum(cast(o_totalprice as decimal(18,2))) AS total,
        |    min(o_orderdate) AS first_d, max(o_orderdate) AS last_d
        |  FROM orders WHERE o_orderkey % 10 >= 8 GROUP BY o_orderpriority),
        |merged AS (
        |  SELECT coalesce(b.pri, d.pri) AS pri,
        |    coalesce(b.n, 0) + coalesce(d.n, 0) AS n,
        |    coalesce(b.total, 0) + coalesce(d.total, 0) AS total,
        |    least(coalesce(b.first_d, d.first_d), coalesce(d.first_d, b.first_d)) AS first_d,
        |    greatest(coalesce(b.last_d, d.last_d), coalesce(d.last_d, b.last_d)) AS last_d
        |  FROM base b FULL OUTER JOIN delta d ON b.pri = d.pri)
        |SELECT pri, cast(n as bigint) AS n,
        |  cast(total as decimal(18,2)) AS total, first_d, last_d
        |FROM merged ORDER BY pri""".stripMargin),

    // k-anonymity / l-diversity privacy audit (the data-governance gate
    // before a table leaves the platform): equivalence classes over the
    // quasi-identifiers (segment, nation, balance bucket), risk = rows in
    // classes smaller than k=5; l-diversity = distinct sensitive values
    // (order priority) per class. Two map-side-combined aggregations.
    "q295_k_anonymity" -> sqlQuery(Seq("customer", "orders"),
      """WITH q AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg, c.c_nationkey AS nat,
        |    cast(floor(c.c_acctbal / 1000.0) as bigint) AS bal_bucket,
        |    o.o_orderpriority AS sensitive
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
        |cls AS (
        |  SELECT seg, nat, bal_bucket,
        |    cast(count(*) as bigint) AS k,
        |    cast(count(distinct sensitive) as bigint) AS l
        |  FROM q GROUP BY seg, nat, bal_bucket)
        |SELECT
        |  cast(sum(k) as bigint) AS n_rows,
        |  cast(count(*) as bigint) AS n_classes,
        |  min(k) AS k_min,
        |  min(l) AS l_min,
        |  cast(sum(CASE WHEN k < 5 THEN k ELSE 0 END) as bigint) AS rows_at_risk,
        |  round(cast(sum(CASE WHEN k < 5 THEN k ELSE 0 END) as double)
        |    / sum(k), 6) + 0.0 AS pct_at_risk,
        |  cast(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) as bigint) AS homogeneous_classes
        |FROM cls""".stripMargin),

    // Mollweide (ESRI:54009) — THE classic equal-area world projection,
    // completing the cartographic family beside sinusoidal/LAEA: edge
    // coordinates pinned closed-form (x(180,0) = 2*sqrt(2)*a, y(0,90) =
    // sqrt(2)*a), forward-inverse round-trips at 6 decimals, and the
    // equal-area property checked against the spherical patch area (the
    // q257 discipline).
    "q294_mollweide" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val a = 6378137.0
      s.sql(
        s"""WITH pts AS (
           |  SELECT c_custkey,
           |    cast(c_custkey % 340 - 170 as double) AS lon,
           |    cast((c_custkey * 7) % 160 - 80 as double) AS lat
           |  FROM customer WHERE c_custkey <= 1000)
           |SELECT c_custkey,
           |  round(st_x(st_transform(st_point(180.0, 0.0), 'EPSG:4326', 'ESRI:54009')), 1) + 0.0 AS world_x,
           |  round(st_y(st_transform(st_point(0.0, 90.0), 'EPSG:4326', 'ESRI:54009')), 1) + 0.0 AS pole_y,
           |  round(st_x(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'ESRI:54009'),
           |    'ESRI:54009', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
           |  round(st_y(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'ESRI:54009'),
           |    'ESRI:54009', 'EPSG:4326')), 6) + 0.0 AS rt_lat,
           |  round(st_area(st_transform(st_makeenvelope(lon, lat, lon + 0.02, lat + 0.02),
           |    'EPSG:4326', 'ESRI:54009')) /
           |    ($a * $a * radians(0.02) * (sin(radians(lat + 0.02)) - sin(radians(lat)))), 3) + 0.0 AS area_ratio
           |FROM pts ORDER BY c_custkey""".stripMargin)
    }),

    // Classical seasonal decomposition of the daily event series
    // (STL-lite): trend = centered 7-day moving average (full windows
    // only), seasonal = day-of-week mean of the detrended series
    // (decimal-folded), residual z-flags at 2 sigma. Everything runs on
    // the <= #days daily aggregate — metadata-sized windows, one raw
    // scan. The time-series monitoring shape (decompose -> flag).
    "q293_seasonal_decompose" -> sqlQuery(Seq("events"),
      """WITH d0 AS (
        |  SELECT unix_micros(ts) div 86400000000 AS day,
        |    cast(count(*) as bigint) AS n
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT explode(sequence((SELECT min(day) FROM d0),
        |    (SELECT max(day) FROM d0))) AS day),
        |d AS (
        |  SELECT s.day, coalesce(d0.n, cast(0 as bigint)) AS n
        |  FROM spine s LEFT JOIN d0 ON d0.day = s.day),
        |tr AS (
        |  SELECT day, n,
        |    CASE WHEN count(*) OVER w = 7
        |      THEN cast(sum(n) OVER w as double) / 7.0 END AS trend
        |  FROM d
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT day, n, trend, day % 7 AS dow,
        |    cast(round(n - trend, 6) as decimal(20,6)) AS detr
        |  FROM tr WHERE trend IS NOT NULL),
        |seas AS (
        |  SELECT dow, cast(sum(detr) as double) / count(*) AS sidx
        |  FROM det GROUP BY dow),
        |res AS (
        |  SELECT d.day, d.n, d.trend, s.sidx,
        |    cast(d.detr as double) - s.sidx AS resid
        |  FROM det d JOIN seas s ON d.dow = s.dow),
        |sd AS (
        |  SELECT sqrt(cast(sum(cast(round(resid * resid, 6) as decimal(27,6))) as double)
        |    / count(*)) AS sigma
        |  FROM res)
        |SELECT r.day, r.n,
        |  round(r.trend, 6) + 0.0 AS trend,
        |  round(r.sidx, 6) + 0.0 AS seasonal,
        |  round(r.resid, 6) + 0.0 AS resid,
        |  (abs(r.resid) > 2.0 * sd.sigma) AS anomaly
        |FROM res r CROSS JOIN sd
        |ORDER BY r.day""".stripMargin),

    // Rolling 7-day distinct users via MERGED HLL states — the sketch
    // mergeability payoff: daily 256-bucket states (one map-side-combined
    // aggregation over the raw events), every window estimate then merges
    // 7 tiny states by bucket-max — the raw data is scanned ONCE total,
    // not once per window. Exact rolling distinct joined back as the
    // calibration column (rel_err ~ the p=8 SE).
    "q292_rolling_hll" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      val ev = s.sql(
        """SELECT user_id, unix_micros(ts) div 86400000000 AS day
          |FROM events WHERE user_id IS NOT NULL""".stripMargin)
      val daily = graft.pipeline.Sketch.hllBuckets(ev, "user_id", Seq("day"))
      val days = ev.select(col("day")).distinct().select(col("day").as("d"))
      // window membership as a 7x EXPLODE of the tiny per-day state + one
      // equi-join (no range BNLJ): day contributes to windows day..day+6;
      // the join with observed days drops phantom windows past the tail
      val merged = daily
        .withColumn("d", explode(expr("sequence(day, day + 6)")))
        .join(days, "d")
        .groupBy(col("d"), col("__b")).agg(max(col("__rmax")).as("__rmax"))
      val est = graft.pipeline.Sketch.hllFromBuckets(merged, Seq("d"))
      val exact = ev.select(col("day"), col("user_id")).distinct()
        .withColumn("d", explode(expr("sequence(day, day + 6)")))
        .join(days, "d")
        .groupBy("d").agg(countDistinct("user_id").cast("long").as("exact_users"))
      est.join(exact, "d")
        .select(col("d"), col("hll_estimate"), col("n_buckets_used"),
          col("exact_users"),
          (round(abs(col("hll_estimate") - col("exact_users")) / col("exact_users"), 6)
            + 0.0).as("rel_err"))
        .orderBy("d")
    }),

    // Histogram-binning calibration fix — the remedy for the
    // miscalibration q273 measures: decile-bin -> positive-rate map
    // learned on fold 0, applied to held-out fold 1; before/after ECE and
    // Brier on the held-out fold (ECE collapses, Brier improves). Same
    // md5 folds as q290; map is <= 10 rows (broadcast).
    "q291_calibration_fix" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val foldCol = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 2")
      val base = s.table("documents").where(qcWhere).withColumn("fold", foldCol)
        .localCheckpoint()
      val feats = qcFeatureSqls.map(expr)
      val w = graft.pipeline.Classifier.trainLogistic(
        base.where(col("fold") === 0), feats, expr(qcLabelSql), lr = 0.5, iters = 3)
      val sc = graft.pipeline.Classifier.score(w, feats)
      base.select(col("fold").cast("long").as("fold"), round(sc, 6).as("score"),
          expr(qcLabelSql).as("y"))
        .createOrReplaceTempView("cal_scored")
      s.sql("WITH " + graft.pipeline.Classifier.calibrationFixSelectSql("percentile"))
    }),

    // k-fold cross-validated classifier evaluation — the "did we overfit"
    // answer the eval suite (q266/q273) was missing: md5-deterministic
    // folds, one train per fold on the OTHER folds (each = the same
    // bounded-state distributed trainer), metrics on the held-out fold
    // through the fold-partitioned eval block shared verbatim with the
    // oracle's per-fold unrolled training chains.
    "q290_cv_classifier" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val foldCol = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 3")
      val base = s.table("documents").where(qcWhere).withColumn("fold", foldCol)
        .localCheckpoint()
      val feats = qcFeatureSqls.map(expr)
      val perFold = (0 until 3).map { f =>
        val w = graft.pipeline.Classifier.trainLogistic(
          base.where(col("fold") =!= f), feats, expr(qcLabelSql), lr = 0.5, iters = 3)
        val sc = graft.pipeline.Classifier.score(w, feats)
        base.where(col("fold") === f)
          .select(lit(f).cast("long").as("fold"), round(sc, 6).as("score"),
            expr(qcLabelSql).as("y"))
      }
      perFold.reduce(_ unionAll _).createOrReplaceTempView("scored_all")
      s.sql("WITH " + graft.pipeline.Classifier.cvEvalSelectSql)
        .selectExpr("cast(fold as bigint) AS fold", "auc", "tp", "fp", "tn", "fn",
          "accuracy", "brier")
    }),

    // Getis-Ord Gi* hotspot statistic over a cell grid (the spatial-stats
    // hotspot analysis): per-cell value sums, 3x3 queen neighborhood via
    // a 9-row offsets join (the eps-cell replica discipline — neighbor
    // structure from arithmetic, never a distance cross join), global
    // moments as broadcast scalars, z-scores closed-form. Products and
    // sums on identical doubles; z rounded 6.
    "q288_getis_ord_hotspots" -> sqlQuery(Seq("customer"),
      """WITH pts AS (
        |  SELECT ((cast(floor(c_acctbal) as bigint) % 20) + 20) % 20 AS cx,
        |    ((cast(floor(c_acctbal * 7) as bigint) % 15) + 15) % 15 AS cy,
        |    cast(c_acctbal as double) AS v
        |  FROM customer),
        |cells AS (
        |  SELECT cx, cy, sum(cast(round(v, 2) as decimal(18,2))) AS vsum
        |  FROM pts GROUP BY cx, cy),
        |stats AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(vsum) as double) / count(*) AS xbar,
        |    sqrt(cast(sum(cast(vsum * vsum as decimal(30,4))) as double)
        |      / count(*)
        |      - (cast(sum(vsum) as double) / count(*))
        |      * (cast(sum(vsum) as double) / count(*))) AS s
        |  FROM cells),
        |offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
        |  (1,-1),(1,0),(1,1)) AS t(dx, dy)),
        |nb AS (
        |  SELECT a.cx, a.cy,
        |    cast(count(*) as bigint) AS wi,
        |    sum(b.vsum) AS nsum
        |  FROM cells a
        |  JOIN offs o ON true
        |  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        |  GROUP BY a.cx, a.cy)
        |SELECT nb.cx, nb.cy, nb.wi,
        |  round(cast(nb.nsum as double), 2) + 0.0 AS neighborhood_sum,
        |  round((cast(nb.nsum as double) - st.xbar * nb.wi) /
        |    (st.s * sqrt((cast(st.n as double) * nb.wi - cast(nb.wi as double) * nb.wi)
        |      / (st.n - 1))), 6) + 0.0 AS gi_z
        |FROM nb CROSS JOIN stats st
        |ORDER BY nb.cx, nb.cy""".stripMargin),

    // Moran's I global spatial autocorrelation on the same grid (queen
    // weights, self excluded): pairwise deviation products decimal-folded
    // at 6 decimals so the double sum is order-independent.
    "q289_morans_i" -> sqlQuery(Seq("customer"),
      """WITH pts AS (
        |  SELECT ((cast(floor(c_acctbal) as bigint) % 20) + 20) % 20 AS cx,
        |    ((cast(floor(c_acctbal * 7) as bigint) % 15) + 15) % 15 AS cy,
        |    cast(c_acctbal as double) AS v
        |  FROM customer),
        |cells AS (
        |  SELECT cx, cy, sum(cast(round(v, 2) as decimal(18,2))) AS vsumd
        |  FROM pts GROUP BY cx, cy),
        |stats AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(vsumd) as double) / count(*) AS xbar
        |  FROM cells),
        |offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
        |  (1,-1),(1,0),(1,1)) AS t(dx, dy)),
        |cross_t AS (
        |  SELECT sum(cast(round((cast(a.vsumd as double) - st.xbar) *
        |      (cast(b.vsumd as double) - st.xbar), 6) as decimal(27,6))) AS num,
        |    cast(count(*) as bigint) AS w
        |  FROM cells a
        |  JOIN offs o ON true
        |  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        |  CROSS JOIN stats st),
        |denom AS (
        |  SELECT sum(cast(round((cast(c.vsumd as double) - st.xbar) *
        |      (cast(c.vsumd as double) - st.xbar), 6) as decimal(27,6))) AS den
        |  FROM cells c CROSS JOIN stats st)
        |SELECT st.n, ct.w,
        |  round((cast(st.n as double) / ct.w) *
        |    (cast(ct.num as double) / cast(d.den as double)), 6) + 0.0 AS moran_i
        |FROM stats st CROSS JOIN cross_t ct CROSS JOIN denom d""".stripMargin),

    // Strict ORDERED funnel (view -> click-after-view ->
    // purchase-after-click): each stage is the min event time AFTER the
    // previous stage's instant — sequence semantics, not mere presence
    // (q176's cohort funnel is presence-within-window). Three grouped
    // mins + user-keyed joins, all map-side combinable.
    "q286_ordered_funnel" -> sqlQuery(Seq("events"),
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT
        |  (SELECT cast(count(*) as bigint) FROM v) AS n_view,
        |  (SELECT cast(count(*) as bigint) FROM c) AS n_click,
        |  (SELECT cast(count(*) as bigint) FROM p) AS n_purchase,
        |  round(cast((SELECT count(*) FROM c) as double) /
        |    (SELECT count(*) FROM v), 6) + 0.0 AS view_to_click,
        |  round(cast((SELECT count(*) FROM p) as double) /
        |    (SELECT count(*) FROM c), 6) + 0.0 AS click_to_purchase""".stripMargin),

    // Kaplan-Meier survival over signup -> first-purchase durations
    // (right-censored at each user's last event): the S-curve estimator
    // S(t) = prod(1 - d_i/n_i) computed as exp of the decimal-folded
    // cumulative sum of rounded log terms — order-independent and
    // cross-engine exact at 6 decimals. Risk-set counts via one ordered
    // window over <= #distinct-durations rows.
    "q287_kaplan_meier" -> sqlQuery(Seq("events"),
      """WITH s AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t1
        |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |mx AS (
        |  SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
        |dur AS (
        |  SELECT s.user_id,
        |    CASE WHEN p.t1 IS NOT NULL
        |      THEN (unix_micros(p.t1) - unix_micros(s.t0)) div 3600000000
        |      ELSE (unix_micros(mx.tmax) - unix_micros(s.t0)) div 3600000000 END AS hrs,
        |    (p.t1 IS NOT NULL) AS observed
        |  FROM s JOIN mx ON s.user_id = mx.user_id
        |  LEFT JOIN p ON s.user_id = p.user_id),
        |ev AS (
        |  SELECT hrs,
        |    cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
        |    cast(count(*) as bigint) AS leaving
        |  FROM dur GROUP BY hrs),
        |rk AS (
        |  SELECT hrs, d,
        |    sum(leaving) OVER (ORDER BY hrs DESC) AS n_risk
        |  FROM ev),
        |km AS (
        |  SELECT hrs, d, n_risk,
        |    sum(CASE WHEN d > 0 AND d < n_risk
        |      THEN cast(round(ln(1.0 - cast(d as double) / n_risk), 9) as decimal(20,9))
        |      ELSE cast(0 as decimal(20,9)) END)
        |      OVER (ORDER BY hrs) AS logs,
        |    max(CASE WHEN d > 0 AND d = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY hrs) AS extinct
        |  FROM rk)
        |SELECT hrs, d, cast(n_risk as bigint) AS n_risk,
        |  round(CASE WHEN extinct = 1 THEN 0.0
        |    ELSE exp(cast(logs as double)) END, 6) + 0.0 AS survival
        |FROM km WHERE d > 0 ORDER BY hrs""".stripMargin),

    // CUSUM change-point detection over the daily event series: running
    // sum of demeaned daily counts, change point = day of max |CUSUM|
    // (Page's statistic). Day ids by integer epoch_us division; the
    // running window is over <= #days rows (metadata-sized), counts
    // map-side combine — one scan at any event volume.
    "q284_cusum_changepoint" -> sqlQuery(Seq("events"),
      """WITH d0 AS (
        |  SELECT unix_micros(ts) div 86400000000 AS day,
        |    cast(count(*) as bigint) AS n
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT explode(sequence((SELECT min(day) FROM d0),
        |    (SELECT max(day) FROM d0))) AS day),
        |d AS (
        |  SELECT s.day, coalesce(d0.n, cast(0 as bigint)) AS n
        |  FROM spine s LEFT JOIN d0 ON d0.day = s.day),
        |m AS (SELECT cast(sum(n) as double) / count(*) AS mean FROM d),
        |c AS (
        |  SELECT day, n,
        |    sum(n - m.mean) OVER (ORDER BY day) AS cusum
        |  FROM d CROSS JOIN m)
        |SELECT day, n, round(cusum, 6) + 0.0 AS cusum,
        |  (abs(cusum) = max(abs(cusum)) OVER ()) AS is_changepoint
        |FROM c ORDER BY day""".stripMargin),

    // Robust outlier profile (median/MAD, the data-quality staple that
    // survives the outliers it hunts): per event type the median, the
    // median absolute deviation, and the count beyond 3 scaled MADs.
    // Two grouped exact-percentile passes (q152's cross-engine pair) +
    // one counting join — group-bounded state everywhere.
    "q285_mad_outliers" -> sqlQuery(Seq("events"),
      """WITH med AS (
        |  SELECT event_type, percentile(value, cast(0.5 as double)) AS med
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, m.med,
        |    percentile(abs(e.value - m.med), cast(0.5 as double)) AS mad
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  WHERE e.value IS NOT NULL GROUP BY e.event_type, m.med)
        |SELECT a.event_type,
        |  cast(count(*) as bigint) AS n,
        |  round(a.med, 6) + 0.0 AS med,
        |  round(a.mad, 6) + 0.0 AS mad,
        |  cast(sum(CASE WHEN abs(e.value - a.med) >
        |    3.0 * cast(1.4826 as double) * a.mad THEN 1 ELSE 0 END) as bigint)
        |    AS n_outliers
        |FROM events e JOIN mad a ON e.event_type = a.event_type
        |WHERE e.value IS NOT NULL
        |GROUP BY a.event_type, a.med, a.mad
        |ORDER BY a.event_type""".stripMargin),

    // IVF with PARTITIONED storage — the at-scale layout the ANN family's
    // scaladocs promise: embeddings written partitionBy(cell), so the
    // probe filter prunes directories (PartitionFilters — unprobed cells'
    // files are never listed, scanning nProbe/k of the corpus). Same
    // result as q52's expression-filtered IVF at the same probe set.
    "q283_ivf_partition_prune" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q283_ivf").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "emb_by_cell").getAbsolutePath
      emb.withColumn("cell", graft.internal.exprColumn(graft.pipeline.NearestCentroid(
          graft.internal.columnExpr(col("embedding")), cents)))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
      Similarity.ivfTopKPartitioned(s.read.parquet(path), "vec_id", "embedding",
          "cell", cents, queryVec, k = 10, nProbe = 2)
        .select(col("vec_id").cast("long").as("vec_id"),
          (round(col("cosine"), 6) + 0.0).as("cosine"))
    }),

    // Event-type transition matrix (first-order Markov over user
    // timelines): lag window with the (ts, event_id) deterministic order,
    // transition counts map-side combined, row-normalized probabilities
    // via a per-prev window over <= |event types| rows.
    "q282_event_transitions" -> sqlQuery(Seq("events"),
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |tc AS (
        |  SELECT prev, event_type AS cur, cast(count(*) as bigint) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type)
        |SELECT prev, cur, n,
        |  round(cast(n as double) / sum(n) OVER (PARTITION BY prev), 6) + 0.0 AS p
        |FROM tc ORDER BY prev, cur""".stripMargin),

    // Retention cohort matrix (the product-analytics triangle): users
    // cohorted by first-active week, per (cohort, week-offset) active
    // share. Week ids from integer epoch-microsecond division (exact and
    // engine-portable, the epoch_us discipline); two map-side-combined
    // aggregations + one broadcast-able cohort-size join.
    "q281_retention_cohorts" -> sqlQuery(Seq("events"),
      """WITH act AS (
        |  SELECT DISTINCT user_id, unix_micros(ts) div 604800000000 AS wk
        |  FROM events WHERE user_id IS NOT NULL),
        |coh AS (SELECT user_id, min(wk) AS cohort FROM act GROUP BY user_id),
        |sz AS (SELECT cohort, cast(count(*) as bigint) AS n_cohort FROM coh GROUP BY cohort)
        |SELECT c.cohort, cast(a.wk - c.cohort as int) AS off_wk,
        |  cast(count(*) as bigint) AS n_active,
        |  s.n_cohort,
        |  round(cast(count(*) as double) / s.n_cohort, 6) + 0.0 AS retention
        |FROM act a JOIN coh c ON a.user_id = c.user_id
        |JOIN sz s ON s.cohort = c.cohort
        |GROUP BY c.cohort, a.wk, s.n_cohort
        |ORDER BY cohort, off_wk""".stripMargin),

    // Forward (direct) geodesic st_geodesicproject — twin of the inverse
    // distance functions: due-north projection adds exactly
    // degrees(d/R) of latitude, due-east from the equator adds it in
    // longitude, and st_distancesphere round-trips the distance at ANY
    // bearing (sphere direct/inverse are exact inverses). Booleans
    // computed Spark-side with tolerances; oracle pins constants. The
    // delta constant casts to double FIRST — Spark parses bare
    // decimal-point literals as DECIMAL, whose division loses ~1e-9.
    "q280_geodesic_project" -> sqlQuery(Seq("customer"),
      """WITH pts AS (
        |  SELECT c_custkey,
        |    cast(c_custkey % 340 - 170 as double) AS lon,
        |    cast((c_custkey * 7) % 100 - 50 as double) AS lat,
        |    cast((c_custkey * 37) % 360 as double) AS az
        |  FROM customer WHERE c_custkey <= 900),
        |pr AS (
        |  SELECT c_custkey, lon, lat, az,
        |    cast(100000.0 as double) / cast(6371008.8 as double) * 180.0 / pi() AS delta,
        |    st_point(lon, lat) AS p,
        |    st_geodesicproject(st_point(lon, lat), 0.0, 100000.0) AS north,
        |    st_geodesicproject(st_point(lon, lat), 180.0, 100000.0) AS south,
        |    st_geodesicproject(st_point(lon, 0.0), 90.0, 100000.0) AS east_eq,
        |    st_geodesicproject(st_point(lon, lat), az, 250000.0) AS anyaz
        |  FROM pts)
        |SELECT c_custkey,
        |  (abs(st_y(north) - (lat + delta)) < 1e-9 AND abs(st_x(north) - lon) < 1e-9)
        |    AS north_ok,
        |  (abs(st_y(south) - (lat - delta)) < 1e-9) AS south_ok,
        |  (abs(st_x(east_eq) - (CASE WHEN lon + delta > 180.0 THEN lon + delta - 360.0
        |     ELSE lon + delta END)) < 1e-9 AND abs(st_y(east_eq)) < 1e-9) AS east_ok,
        |  (abs(st_distancesphere(p, anyaz) - 250000.0) < 0.001) AS roundtrip_ok
        |FROM pr ORDER BY c_custkey""".stripMargin),

    // Areal interpolation (the GIS overlay-reapportionment op: transfer an
    // attribute from source polygons to target zones by intersection-area
    // share) — exercises the real planar-overlay st_intersection through
    // the spatial-join planner, while integer-rectangle geometry keeps
    // every overlap area closed-form for the oracle. Zone side is
    // dimension-sized (broadcast); weights decimal-fold per zone.
    "q279_areal_interpolation" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      s.sql(
        """WITH src AS (
          |  SELECT c_custkey AS sid, cast(c_custkey % 97 as double) AS pop,
          |    st_geomfromtext(concat('POLYGON ((', x0, ' ', y0, ', ', x0 + 4, ' ', y0,
          |      ', ', x0 + 4, ' ', y0 + 3, ', ', x0, ' ', y0 + 3, ', ', x0, ' ', y0, '))')) AS g
          |  FROM (SELECT c_custkey, c_custkey % 50 AS x0, (c_custkey * 3) % 40 AS y0
          |        FROM customer WHERE c_custkey <= 300)),
          |zones AS (
          |  SELECT id AS zid,
          |    st_geomfromtext(concat('POLYGON ((', zx, ' ', zy, ', ', zx + 10, ' ', zy,
          |      ', ', zx + 10, ' ', zy + 10, ', ', zx, ' ', zy + 10, ', ', zx, ' ', zy, '))')) AS zg
          |  FROM (SELECT id, (id % 6) * 10 AS zx, (id DIV 6) * 10 AS zy FROM RANGE(30))),
          |pairs AS (
          |  SELECT z.zid, s.pop,
          |    st_area(st_intersection(s.g, z.zg)) / st_area(s.g) AS w
          |  FROM src s JOIN zones z ON st_intersects(s.g, z.zg)
          |  WHERE st_area(st_intersection(s.g, z.zg)) > 0)
          |SELECT cast(zid as bigint) AS zid,
          |  cast(count(*) as bigint) AS n_src,
          |  round(cast(sum(cast(round(pop * w, 6) as decimal(20,6))) as double), 4) + 0.0
          |    AS est_pop
          |FROM pairs GROUP BY zid ORDER BY zid""".stripMargin)
    }),

    // Large-large approximate k-NN JOIN on shared IVF cells — the vector
    // analog of the grid spatial join: one shuffle per side on the cell
    // key, nProbe-bounded probe replication, codegen cosine scoring,
    // per-probe window over the probed cells only. Both sides here come
    // from embeddings (every 25th vector queries the full set).
    "q278_ivf_knn_join" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.where(col("vec_id") % 25 === 0)
      graft.pipeline.Similarity.ivfKnnJoin(
          queries, "vec_id", "embedding", emb, "vec_id", "embedding",
          kCells = 8, nProbe = 2, k = 5, iters = 2)
        .select(col("lid").cast("long").as("lid"), col("rid").cast("long").as("rid"),
          (round(col("cos"), 6) + 0.0).as("cosine"), col("rank").cast("int").as("rank"))
        .orderBy("lid", "rank")
    }),

    // Unigram-LM tokenizer trainer (SentencePiece unigram, hard-EM
    // Viterbi variant) — the tokenizer-family companion of q227's BPE.
    // The Viterbi argmax is RELATIONAL: bounded words make every
    // segmentation one of 223 literal compositions, so the E-step is a
    // join + decimal-folded score + <=223-row argmax window per word.
    // The only corpus-sized stage is the word-count aggregation; EM
    // rounds run on Zipf-bounded vocabulary data (Bpe's property).
    "q276_unigram_tokenizer" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.Unigram.train(s.table("documents"), "text",
        rounds = 2, seedSize = 150, topK = 30)
    }),

    // Unigram tokenizer ENCODE (q228's inference twin for the unigram
    // model): per-doc word/piece counts under the trained vocabulary's
    // Viterbi segmentation; adds one word-join + one doc aggregation to
    // the training chain.
    "q277_unigram_encode" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.Unigram.encode(
        s.table("documents").where("doc_id < 200"), "doc_id", "text",
        rounds = 2, seedSize = 150)
    }),

    // ORC round-trip (inherited IO breadth beside parquet/csv/json):
    // write a lineitem slice to ORC, read it back, and aggregate — the
    // read pushes the l_quantity filter into the ORC scan (ORC carries
    // the same predicate-pushdown/column-pruning machinery as parquet, so
    // both formats are first-class at scale). The oracle aggregates the
    // same slice straight from parquet: a lossless round-trip is exactly
    // "the two match".
    "q275_orc_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q275_orc").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "li_orc").getAbsolutePath
      // l_shipdate is cast to DATE before the ORC write: ORC TIMESTAMP uses
      // wall-clock (JVM default TZ) semantics that spark.sql.session.timeZone
      // does NOT govern, so a timestamp round-trip shifts on a non-UTC host.
      // ORC DATE is a plain day count — timezone-independent on every host.
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_shipdate").cast("date").as("l_shipdate"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .where(col("l_quantity") < 30.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"),
          max(col("l_shipdate")).as("max_ship"))
        .orderBy("l_returnflag")
    }),

    // Greedy k-center diverse-subset selection (Gonzalez): the coreset/
    // curation primitive — k rounds, each ONE codegen VecDot scan updating
    // the running min-distance + TakeOrdered(1); k*dim doubles to the
    // driver (codebook discipline). Rounded-6 distances + id tie-breaks
    // make the farthest-point ordering replay as unrolled CTEs.
    "q274_kcenter_select" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Similarity.kCenterSelect(emb, "vec_id", "embedding", k = 6)
        .selectExpr("cast(rank as int) AS rank", "cast(id as bigint) AS vec_id",
          "sel_dist")
        .orderBy("rank")
    }),

    // Reliability curve + ECE — the calibration member of the eval suite
    // (q266 ranks, this bins): same training replay as q266, then DECILE
    // (equal-frequency) score bins with count, decimal-folded mean
    // predicted score, empirical positive rate, |gap|, and the
    // count-weighted ECE. Cuts via the exact-percentile aggregate
    // (Quantiles' at-scale path above its probe threshold), assignment a
    // broadcast 9-constant comparison, and the bin aggregation ONE
    // map-side-combined groupBy over <= 10 groups.
    "q273_reliability_curve" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val base = s.table("documents").where(qcWhere)
      val feats = qcFeatureSqls.map(expr)
      val w = graft.pipeline.Classifier.trainLogistic(
        base, feats, expr(qcLabelSql), lr = 0.5, iters = 3)
      val sc = graft.pipeline.Classifier.score(w, feats)
      base.select(round(sc, 6).as("score"), expr(qcLabelSql).as("y"))
        .createOrReplaceTempView("scored")
      s.sql("WITH " + graft.pipeline.Classifier.reliabilitySelectSql(
        graft.pipeline.Classifier.sparkCutsSelect))
    }),

    // Geodesic densify (PostGIS ST_Segmentize(geography)): great-circle
    // slerp with uniform angular spacing. Meridian segments have closed-form
    // geodesics (the meridian itself), so vertex count, per-segment length
    // (R*2.5deg exactly), uniformity, and total-length preservation are all
    // checkable against constants; the long east-west chord proves the path
    // arcs poleward of its parallel (vertex latitude 59.2 > 40), which the
    // planar segmentize can never do. Booleans computed Spark-side with
    // tolerances; the oracle pins constants only — no cross-engine trig.
    "q272_geodesic_segmentize" -> sqlQuery(Seq("customer"),
      """WITH src AS (
        |  SELECT c_custkey,
        |    cast(c_custkey % 340 - 170 as double) AS lon,
        |    cast((c_custkey * 3) % 50 - 30 as double) AS lat
        |  FROM customer WHERE c_custkey <= 600),
        |geo AS (
        |  SELECT c_custkey,
        |    st_geodesicsegmentize(st_geomfromtext(
        |      concat('LINESTRING (', lon, ' ', lat, ', ', lon, ' ', lat + 10, ')')),
        |      6371008.8 * 3.0 * pi() / 180) AS m,
        |    st_geodesicsegmentize(st_geomfromtext('LINESTRING (-60 40, 60 40)'),
        |      500000.0) AS diag
        |  FROM src),
        |dm AS (
        |  SELECT c_custkey, m, diag, st_coorddump(m) AS cs FROM geo),
        |dd AS (
        |  SELECT c_custkey, m, diag,
        |    zip_with(slice(cs, 1, size(cs) - 1), slice(cs, 2, size(cs) - 1),
        |      (p, q) -> st_distancesphere(st_point(p.x, p.y), st_point(q.x, q.y))) AS dists,
        |    element_at(cs, 1) AS h, element_at(cs, -1) AS t
        |  FROM dm)
        |SELECT c_custkey,
        |  st_npoints(m) AS nv_m,
        |  st_npoints(diag) AS nv_diag,
        |  (abs(array_max(dists) - array_min(dists)) < 1e-6) AS uniform,
        |  (abs(array_max(dists) - 6371008.8 * 2.5 * pi() / 180) < 0.001) AS seg_exact,
        |  (abs(aggregate(dists, cast(0.0 as double), (a, x) -> a + x)
        |     - st_distancesphere(st_point(h.x, h.y), st_point(t.x, t.y))) < 0.001) AS len_kept,
        |  (array_max(transform(st_coorddump(diag), p -> p.y)) > 50.0) AS arcs_poleward
        |FROM dd ORDER BY c_custkey""".stripMargin),

    // Deterministic synchronous label propagation (community detection):
    // two planted 29-node communities; every node adopts the most frequent
    // neighbor label, smallest label on ties — no RNG, no update-order
    // dependence, so the oracle replays the rounds as unrolled CTEs
    // (q218's PageRank idiom). Per round: one map-side-combined
    // (node, label) count + a degree-bounded argmax window.
    "q271_label_propagation" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT (c_custkey % 2) * 100 + (c_custkey % 29) AS src,
          |       (c_custkey % 2) * 100 + ((c_custkey * 5 + 3) % 29) AS dst
          |FROM customer""".stripMargin)
      graft.relational.Graph.labelPropagation(edges, "src", "dst", rounds = 4)
        .selectExpr("cast(node as bigint) AS node", "cast(label as bigint) AS label")
        .orderBy("node")
    }),

    // HLL calibration — the sketch-family member of the eval suite
    // (q266 classifier, q267 ANN recall, q268 MinHash): per-source
    // distinct-token estimate vs exact distinct, relative error
    // reported as data. p=8 HLL has ~6.5% theoretical SE; the measured
    // per-source errors are hash-checked against the oracle's replayed
    // estimate AND its exact distinct.
    "q269_hll_calibration" -> sqlQuery(Seq("documents"),
      """WITH toks AS (
        |  SELECT source, tok FROM (
        |    SELECT source, explode(filter(split(trim(text), '\\s+'), x -> x != '')) AS tok
        |    FROM documents WHERE text IS NOT NULL)),
        |agg AS (
        |  SELECT source, hll_distinct(tok) AS est,
        |    cast(count(DISTINCT tok) as bigint) AS exact
        |  FROM toks GROUP BY source)
        |SELECT source, est, exact,
        |  round(abs(est - exact) / exact, 6) + 0.0 AS rel_err
        |FROM agg ORDER BY source""".stripMargin),

    // MinHash ESTIMATOR accuracy — the dedup-family eval twin of q267:
    // a 64-hash md5-derived signature (portable: the same per-(slot,
    // shingle) hash computes in both engines) estimates Jaccard as
    // matching-slot fraction; compared against exact shingle Jaccard on
    // a bounded all-pairs set. mean |err| ~ 1/sqrt(64) confirms the
    // sketch is calibrated — measured and hash-checked, not assumed.
    // (The production LSH path q35 uses the faster xxhash signature;
    // this md5 twin exists exactly so accuracy is cross-checkable.)
    "q268_minhash_accuracy" -> sqlQuery(Seq("documents"),
      """WITH t AS (SELECT doc_id, filter(split(trim(text), '\\s+'), x -> x != '') AS toks
        |           FROM documents WHERE doc_id <= 120),
        |s AS (SELECT doc_id,
        |    CASE WHEN size(toks) < 3 THEN array_distinct(array(array_join(toks, ' ')))
        |         ELSE array_distinct(transform(sequence(1, size(toks) - 2),
        |                i -> array_join(slice(toks, i, 3), ' ')))
        |    END AS sh
        |  FROM t WHERE size(toks) > 0),
        |g AS (SELECT doc_id, sh,
        |    transform(sequence(0, 63), j -> array_min(transform(sh, sg ->
        |      cast(conv(substring(md5(concat(cast(j as string), ':', sg)), 1, 15), 16, 10) as bigint)))) AS sig
        |  FROM s),
        |pairs AS (
        |  SELECT
        |    cast(size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v)) as double) / 64.0 AS est,
        |    cast(size(array_intersect(a.sh, b.sh)) as double) /
        |      (size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh))) AS exact
        |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |SELECT cast(count(*) as bigint) AS n_pairs,
        |  round(cast(sum(cast(round(abs(est - exact), 6) as decimal(18,6))) as double)
        |        / count(*), 6) + 0.0 AS mean_abs_err,
        |  round(max(abs(est - exact)), 6) + 0.0 AS max_abs_err
        |FROM pairs""".stripMargin),

    // ANN RECALL@k evaluation — the metric every approximate index must
    // report before it replaces exact search: IVF top-10 under a
    // deliberately tight probe budget (nProbe=2 of 8 cells) against the
    // brute-force top-10, overlap counted on ids. Deterministic end to
    // end (trainer folds + id tie-breaks), so recall itself is
    // hash-checkable cross-engine — not just a spec assertion.
    "q267_ann_recall" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding", cents, queryVec,
        k = 10, nProbe = 2).select("vec_id")
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryVec, 10)
        .select("vec_id")
      val overlap = approx.join(exact, "vec_id").agg(count(lit(1)).as("o"))
      overlap.select(
        lit(10L).as("k"),
        col("o").as("n_overlap"),
        (round(col("o").cast("double") / 10.0, 6) + lit(0.0)).as("recall"))
    }),

    // Classifier EVALUATION (the missing half of q254): tie-aware
    // Mann-Whitney AUC (average ranks are exact dyadic halves -> the
    // double sum is order-independent), confusion counts, accuracy, and
    // the decimal-folded Brier score — the publish-gate metrics of a
    // quality-classifier pipeline. The global rank window is the exact
    // verification twin; at 100 TB the standard binned-AUC approximation
    // (histogram of scores, trapezoid over bins) replaces the sort.
    "q266_classifier_eval" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val base = s.table("documents").where(qcWhere)
      val feats = qcFeatureSqls.map(expr)
      val w = graft.pipeline.Classifier.trainLogistic(
        base, feats, expr(qcLabelSql), lr = 0.5, iters = 3)
      val sc = graft.pipeline.Classifier.score(w, feats)
      base.select(round(sc, 6).as("score"), expr(qcLabelSql).as("y"))
        .createOrReplaceTempView("scored")
      s.sql(graft.pipeline.Classifier.evalSelectSql)
    }),

    // Mapbox Vector Tile build (sources/MVT): assign features to slippy
    // tiles, ONE shuffle on the tile key, per-tile protobuf encode in
    // mapGroups — the standard web-map tile sink. The oracle replays the
    // tile assignment and counts closed-form; the protobuf payload is
    // verified IN the query by decoding every tile back (rt_ok) with the
    // independent decoder — byte-level conformance is spec-pinned in
    // MvtSpec against the vector-tile-spec worked example.
    "q265_mvt_tiles" -> ((s: SparkSession, dir: String) => {
      init(s)
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .where(col("c_custkey") <= 4000)
        .selectExpr("c_custkey", s"$custPt AS geometry")
      val tiles = graft.sources.MVT.tileLayer(cust, "c_custkey", "geometry",
        zoom = 3, layerName = "cust")
      import s.implicits._
      tiles.as[(Int, Long, Long, Long, Array[Byte])].map { case (z, x, y, n, mvt) =>
        val l = graft.sources.MVT.decode(mvt).head
        val ok = l.features.length == n && l.version == 2 && l.name == "cust" &&
          l.features.forall(f =>
            graft.sources.MVT.commandsToGeom(f.geomType, f.commands) != null)
        (z, x, y, n, ok)
      }.toDF("z", "x", "y", "n_features", "rt_ok").orderBy("x", "y")
    }),

    // Bing quadkey tile addressing: one base-4 string per point whose
    // PREFIX property (a tile's key prefixes all descendants') turns
    // tile-hierarchy pruning into string prefix filters — the standard
    // join/partition key for web-map corpora alongside q258's x/y/z.
    "q264_quadkey" -> sqlQuery(Seq("customer"),
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    st_point(cast(c_custkey % 340 - 170 as double),
         |             cast((c_custkey * 7) % 160 - 80 as double)) AS p
         |  FROM customer WHERE c_custkey <= 1500)
         |SELECT c_custkey,
         |  st_quadkey(p, 6) AS qk6,
         |  st_quadkey(p, 12) AS qk12,
         |  cast(startswith(st_quadkey(p, 12), st_quadkey(p, 6)) as boolean) AS prefix_ok
         |FROM pts ORDER BY c_custkey""".stripMargin),

    // TWKB compact codec (PostGIS ST_AsTWKB/ST_GeomFromTWKB): zigzag-
    // varint delta encoding at 10^precision — the wire format where
    // geometry BYTES dominate. Coordinates synthesized on 1/16 fractions
    // so precision-4 quantization is exact (x*1e4 is an integer) and the
    // round-trip is closed-form replayable.
    "q263_twkb" -> sqlQuery(Seq("customer"),
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    cast(c_custkey % 360 - 180 as double) + cast(c_custkey % 16 as double) / 16.0 AS x,
         |    cast((c_custkey * 7) % 160 - 80 as double) + cast(c_custkey % 8 as double) / 16.0 AS y,
         |    cast(c_custkey % 10 + 1 as double) AS s
         |  FROM customer WHERE c_custkey <= 2000)
         |SELECT c_custkey,
         |  round(st_x(st_geomfromtwkb(st_astwkb(st_point(x, y), 4))), 4) + 0.0 AS rt_x,
         |  round(st_y(st_geomfromtwkb(st_astwkb(st_point(x, y), 4))), 4) + 0.0 AS rt_y,
         |  round(st_area(st_geomfromtwkb(st_astwkb(st_makeenvelope(x, y, x + s, y + s), 4))), 6) + 0.0 AS rt_area,
         |  cast(length(st_astwkb(st_makeenvelope(x, y, x + s, y + s), 4)) <
         |       length(st_astwkb(st_makeenvelope(x, y, x + s, y + s), 7)) as boolean) AS coarser_is_smaller
         |FROM pts ORDER BY c_custkey""".stripMargin),

    // KMV / theta-family distinct sketches with SET OPERATIONS (the
    // DataSketches theta analogue HLL cannot give): bottom-256 distinct
    // md5-hashes per set via the bounded-state kmv_sketch aggregate
    // (TypedImperativeAggregate, 8k-byte state, map-side combined), then
    // union (k smallest of the concat) and theta intersection (retention
    // below min theta) as plain array expressions. Every step is
    // deterministic and order-independent -> the oracle rebuilds the
    // sketches and replays the estimators exactly.
    "q262_kmv_theta" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "orders")
      s.sql(
        """WITH sk AS (
          |  SELECT
          |    kmv_sketch(CASE WHEN o_orderstatus = 'O' THEN cast(o_custkey as string) END, 256) AS a,
          |    kmv_sketch(CASE WHEN o_orderstatus = 'F' THEN cast(o_custkey as string) END, 256) AS b
          |  FROM orders),
          |ops AS (
          |  SELECT a, b,
          |    slice(array_sort(array_distinct(concat(a, b))), 1, 256) AS u,
          |    array_sort(array_intersect(a, b)) AS i,
          |    CASE WHEN size(a) < 256 THEN 1152921504606846976L ELSE element_at(a, 256) END AS tha,
          |    CASE WHEN size(b) < 256 THEN 1152921504606846976L ELSE element_at(b, 256) END AS thb
          |  FROM sk),
          |est AS (
          |  SELECT
          |    cast(size(a) as bigint) AS na, cast(size(b) as bigint) AS nb,
          |    CASE WHEN size(a) < 256 THEN cast(size(a) as double)
          |         ELSE round(255.0 * pow(2.0, 60) / element_at(a, 256), 2) + 0.0 END AS est_a,
          |    CASE WHEN size(b) < 256 THEN cast(size(b) as double)
          |         ELSE round(255.0 * pow(2.0, 60) / element_at(b, 256), 2) + 0.0 END AS est_b,
          |    CASE WHEN size(u) < 256 THEN cast(size(u) as double)
          |         ELSE round(255.0 * pow(2.0, 60) / element_at(u, 256), 2) + 0.0 END AS est_union,
          |    round(cast(size(filter(i, v -> v < least(tha, thb))) as double)
          |          * pow(2.0, 60) / least(tha, thb), 2) + 0.0 AS est_intersect
          |  FROM ops),
          |ex AS (
          |  SELECT
          |    cast(count(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_custkey END) as bigint) AS exact_a,
          |    cast(count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) as bigint) AS exact_b
          |  FROM orders)
          |SELECT na, nb, est_a, est_b, est_union, est_intersect, exact_a, exact_b
          |FROM est CROSS JOIN ex""".stripMargin)
    }),

    // Interpolated Kneser-Ney bigram LM scoring (KenLM's default
    // smoothing): absolute discount + continuation-unigram backoff —
    // distinct-context counts instead of raw frequency, the classic fix
    // for high-count fixed-context words. Same explode/count-table/
    // decimal-fold shape as q235 (Jelinek-Mercer twin).
    "q261_kneser_ney_lm" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.TextAnalysis.kneserNeyLogProb(s.table("documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Spatial semi/anti join (Spark leftsemi/leftanti extension over the
    // broadcast R-tree): EXISTS / NOT EXISTS against an indexed polygon
    // side without materializing matches — the probe short-circuits at
    // the first refined hit. Left columns only, no suffixes.
    "q260_spatial_semi_anti" -> ((s: SparkSession, dir: String) => {
      init(s)
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", s"$custPt AS geometry")
      val boxes = s.range(2).selectExpr(
        "cast(id as int) AS box_id",
        "st_makeenvelope(cast(id * 144 - 180 as double), -80.0, cast(id * 144 - 108 as double), 80.0) AS geometry")
      val semi = SpatialJoin.join(cust, boxes, SpatialJoin.Predicate.Intersects, "semi")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"))
        .select(lit("semi").as("side"), col("n"), col("key_sum"))
      val anti = SpatialJoin.join(cust, boxes, SpatialJoin.Predicate.Intersects, "anti")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"))
        .select(lit("anti").as("side"), col("n"), col("key_sum"))
      semi.unionAll(anti).orderBy("side")
    }),

    // Z-order clustered layout (the lakehouse OPTIMIZE ZORDER BY):
    // equi-width bucketize both clustering columns over their observed
    // ranges, Morton-interleave the bucket bits (codegen Column bit
    // arithmetic, relational/Layout), assign the deterministic
    // equi-z-width file and report per-file stats — the min/max spans
    // the parquet footers would expose for multi-dimension data skipping.
    // One tiny min/max agg + one shuffle at any scale; the oracle replays
    // bucketize + interleave + file assignment term for term.
    "q259_zorder_layout" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "lineitem")
      import graft.relational.Layout
      val li = s.table("lineitem")
      val cols = Seq("l_extendedprice", "l_quantity")
      val withZ = Layout.withZValue(li, cols, bits = 8)
      withZ
        .withColumn("file", Layout.deterministicFile(col("__z"), 8, 2, 16))
        .groupBy("file")
        .agg(count(lit(1)).as("n"),
          min("l_extendedprice").as("ep_min"), max("l_extendedprice").as("ep_max"),
          min("l_quantity").as("q_min"), max("l_quantity").as("q_max"))
        .orderBy("file")
    }),

    // Lambert Azimuthal Equal Area (EPSG method 9820): ETRS89-LAEA Europe
    // (EPSG:3035, the EU INSPIRE grid) + North-Pole LAEA (EPSG:3574).
    // Columns pin (a) the EPSG Guidance Note 7-2 worked example
    // (5E,50N -> 3962799.45, 2999718.85 — our forward agrees to <1 cm),
    // (b) 4326 round-trips through both aspects, (c) the DEFINING
    // equal-area property: planar area of a projected 0.02-deg quad over
    // the closed-form authalic quad area rounds to exactly 1.000.
    "q256_laea" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val ell = graft.geom.CRS.GRS80
      val (aa, ee, ee2) = (ell.a * ell.a, ell.e, ell.e2)
      def qs(lat: String): String =
        s"((1.0 - $ee2) * (sin(radians($lat)) / (1.0 - $ee2 * sin(radians($lat)) * sin(radians($lat)))" +
          s" - (1.0 / (2.0 * $ee)) * ln((1.0 - $ee * sin(radians($lat))) / (1.0 + $ee * sin(radians($lat))))))"
      s.sql(
        s"""WITH pts AS (
           |  SELECT c_custkey,
           |    -10.0 + cast(c_custkey % 400 as double) / 10.0 AS lon,
           |    35.0 + cast((c_custkey * 7) % 350 as double) / 10.0 AS lat
           |  FROM customer WHERE c_custkey <= 1000)
           |SELECT c_custkey,
           |  round(st_x(st_transform(st_point(5.0, 50.0), 'EPSG:4326', 'EPSG:3035')), 2) + 0.0 AS gn_e,
           |  round(st_y(st_transform(st_point(5.0, 50.0), 'EPSG:4326', 'EPSG:3035')), 2) + 0.0 AS gn_n,
           |  round(st_x(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'EPSG:3035'),
           |    'EPSG:3035', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
           |  round(st_y(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'EPSG:3035'),
           |    'EPSG:3035', 'EPSG:4326')), 6) + 0.0 AS rt_lat,
           |  round(st_x(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'EPSG:3574'),
           |    'EPSG:3574', 'EPSG:4326')), 6) + 0.0 AS polar_rt_lon,
           |  round(st_y(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'EPSG:3574'),
           |    'EPSG:3574', 'EPSG:4326')), 6) + 0.0 AS polar_rt_lat,
           |  round(st_area(st_transform(st_makeenvelope(lon, lat, lon + 0.02, lat + 0.02),
           |    'EPSG:4326', 'EPSG:3035')) /
           |    ($aa * radians(0.02) * (${qs("lat + 0.02")} - ${qs("lat")}) / 2.0), 3) + 0.0 AS area_ratio
           |FROM pts ORDER BY c_custkey""".stripMargin)
    }),

    // XYZ/slippy tile sharding (PostGIS ST_TileEnvelope + tile indices):
    // the standard web-scale spatial partitioning scheme. Tile ids at two
    // zooms plus the containing z=6 tile's EPSG:3857 bounds; the oracle
    // replays the slippy formulas (exact-rational x path, mercator-ln y
    // path) and the tile-size arithmetic closed-form.
    "q258_tile_shard" -> sqlQuery(Seq("customer"),
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    st_point(cast(c_custkey % 340 - 170 as double),
         |             cast((c_custkey * 7) % 160 - 80 as double)) AS p
         |  FROM customer WHERE c_custkey <= 1000)
         |SELECT c_custkey,
         |  st_tilex(p, 6) AS tx6, st_tiley(p, 6) AS ty6,
         |  st_tilex(p, 12) AS tx12, st_tiley(p, 12) AS ty12,
         |  round(st_xmin(st_tileenvelope(6, st_tilex(p, 6), st_tiley(p, 6))), 4) + 0.0 AS exmin,
         |  round(st_ymax(st_tileenvelope(6, st_tilex(p, 6), st_tiley(p, 6))), 4) + 0.0 AS eymax
         |FROM pts ORDER BY c_custkey""".stripMargin),

    // Sinusoidal (MODIS land grid / ESRI:54008): world-bound constant
    // (R*pi, replayed closed-form by the oracle), the WGS84 quarter
    // meridian through the ellipsoidal form, world-wide round-trips, and
    // the equal-area ratio against the spherical closed form.
    "q257_sinusoidal" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val r = graft.geom.CRS.ModisSphereR
      s.sql(
        s"""WITH pts AS (
           |  SELECT c_custkey,
           |    cast(c_custkey % 340 - 170 as double) AS lon,
           |    cast((c_custkey * 7) % 160 - 80 as double) AS lat
           |  FROM customer WHERE c_custkey <= 1000)
           |SELECT c_custkey,
           |  round(st_x(st_transform(st_point(180.0, 0.0), 'EPSG:4326', 'MODIS')), 3) + 0.0 AS world_x,
           |  round(st_y(st_transform(st_point(0.0, 90.0), 'EPSG:4326', 'ESRI:54008')), 1) + 0.0 AS quarter_meridian,
           |  round(st_x(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'MODIS'),
           |    'MODIS', 'EPSG:4326')), 6) + 0.0 AS rt_lon,
           |  round(st_y(st_transform(st_transform(st_point(lon, lat), 'EPSG:4326', 'MODIS'),
           |    'MODIS', 'EPSG:4326')), 6) + 0.0 AS rt_lat,
           |  round(st_area(st_transform(st_makeenvelope(lon, lat, lon + 0.02, lat + 0.02),
           |    'EPSG:4326', 'MODIS')) /
           |    ($r * $r * radians(0.02) * (sin(radians(lat + 0.02)) - sin(radians(lat)))), 3) + 0.0 AS area_ratio
           |FROM pts ORDER BY c_custkey""".stripMargin)
    }),

    // Spherical (Chamberlain-Duquette) polygon area — the geodesic
    // companion of st_area. Exterior square + a hole polygon; the oracle
    // replays the edge-term sum closed-form (axis-aligned ring => only the
    // two horizontal edges contribute).
    "q255_geodesic_area" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_geodesicarea(st_makeenvelope($custX, $custY,
         |    $custX + $custSide, $custY + $custSide)) / 1e6, 3) AS ext_km2,
         |  round(st_geodesicarea(st_geomfromtext(concat(
         |    'POLYGON ((', $custX, ' ', $custY, ', ',
         |    $custX + $custSide, ' ', $custY, ', ',
         |    $custX + $custSide, ' ', $custY + $custSide, ', ',
         |    $custX, ' ', $custY + $custSide, ', ',
         |    $custX, ' ', $custY, '), (',
         |    $custX + $custSide / 4.0, ' ', $custY + $custSide / 4.0, ', ',
         |    $custX + $custSide / 4.0 + $custSide / 2.0, ' ', $custY + $custSide / 4.0, ', ',
         |    $custX + $custSide / 4.0 + $custSide / 2.0, ' ', $custY + $custSide / 4.0 + $custSide / 2.0, ', ',
         |    $custX + $custSide / 4.0, ' ', $custY + $custSide / 4.0 + $custSide / 2.0, ', ',
         |    $custX + $custSide / 4.0, ' ', $custY + $custSide / 4.0, '))'))) / 1e6, 3) AS holed_km2,
         |  st_geodesicarea(st_point($custX, $custY)) AS pt_zero
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // Model-based quality filtering (fastText/CCNet-style): distributed
    // logistic-regression trainer (fast-sigmoid link, truncated-scaled-long
    // gradient fold — bit-identical across partitionings and engines), then
    // score every document. The oracle replays the ENTIRE training as an
    // unrolled CTE (the q52/q221 codebook pattern) — weights, scores, and
    // predicted labels all hash-exact.
    "q254_quality_classifier" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val base = s.table("documents").where(qcWhere)
      val feats = qcFeatureSqls.map(expr)
      val w = graft.pipeline.Classifier.trainLogistic(
        base, feats, expr(qcLabelSql), lr = 0.5, iters = 3)
      val sc = graft.pipeline.Classifier.score(w, feats)
      base.select(col("doc_id"),
          round(sc, 6).as("score"),
          when(sc > lit(0.5), 1).otherwise(0).as("pred"))
        .orderBy("doc_id")
    }),

    // c90x/s2cx pin the TransformOrigin 'center'/'centroid' paths: a square
    // rotated 90° about its bbox center keeps its envelope; doubling about
    // the centroid moves xmin to x - s/2
    "q19_geo_rotate_scale" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_x(st_rotate($custPt, 90.0, '0,0')), 6) + 0.0 AS rx,
         |  round(st_y(st_rotate($custPt, 90.0, '0,0')), 6) + 0.0 AS ry,
         |  st_x(st_scale($custPt, 3.0, 2.0, '0,0')) + 0.0 AS sx,
         |  round(st_x(st_skew($custPt, 45.0, 0.0, '0,0')), 6) + 0.0 AS kx,
         |  round(st_xmin(st_rotate(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide), 90.0, 'center')), 6) + 0.0 AS c90x,
         |  round(st_xmin(st_scale(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide), 2.0, 2.0, 'centroid')), 6) + 0.0 AS s2cx
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // ===== spatial join operator (SURVEY §2.4)

    "q20_spatial_join" -> ((s: SparkSession, dir: String) => {
      init(s)
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", s"$custPt AS geometry")
      val boxes = s.range(5).selectExpr(
        "cast(id as int) AS box_id",
        "st_makeenvelope(cast(id * 72 - 180 as double), -80.0, cast(id * 72 - 108 as double), 80.0) AS geometry")
      SpatialJoin.join(cust, boxes, SpatialJoin.Predicate.Intersects, "inner")
        .groupBy(col("box_id_right").as("box_id"))
        .agg(count(lit(1)).as("n_points"), sum(col("c_custkey_left")).as("key_sum"))
        .orderBy("box_id")
    }),

    "q21_spatial_join_left" -> ((s: SparkSession, dir: String) => {
      init(s)
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", s"$custPt AS geometry")
      val box = s.range(1).selectExpr(
        "st_makeenvelope(-90.0, -45.0, 90.0, 45.0) AS geometry", "'inner_box' AS tag")
      SpatialJoin.join(cust, box, SpatialJoin.Predicate.Intersects, "left")
        .selectExpr("c_custkey_left AS c_custkey",
          "CASE WHEN tag_right IS NULL THEN 0 ELSE 1 END AS matched")
        .orderBy("c_custkey")
    }),

    // Large-large grid-partitioned join path (no broadcast, shuffle on grid
    // cells) — same semantics/oracle as q20, different physical plan.
    "q44_grid_spatial_join" -> ((s: SparkSession, dir: String) => {
      init(s)
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", s"$custPt AS geometry")
      val boxes = s.range(5).selectExpr(
        "cast(id as int) AS box_id",
        "st_makeenvelope(cast(id * 72 - 180 as double), -80.0, cast(id * 72 - 108 as double), 80.0) AS geometry")
      SpatialJoin.gridJoin(cust, boxes, cellSize = 45.0, SpatialJoin.Predicate.Intersects, "inner",
        leftIdCol = Some("c_custkey"), rightIdCol = Some("box_id"))
        .groupBy(col("box_id_right").as("box_id"))
        .agg(count(lit(1)).as("n_points"), sum(col("c_custkey_left")).as("key_sum"))
        .orderBy("box_id")
    }),

    // SQL `JOIN ON st_contains(...)` planned by SpatialJoinStrategy as a
    // broadcast R-tree index join (SURVEY §4) — same semantics as q20 but
    // through Catalyst's planner rather than the Dataset-level operator.
    "q27_sql_spatial_join" -> ((s: SparkSession, dir: String) => {
      init(s); view(s, dir, "customer")
      s.range(5).selectExpr(
        "cast(id as int) AS box_id",
        "st_makeenvelope(cast(id * 72 - 180 as double), -80.0, cast(id * 72 - 108 as double), 80.0) AS bgeom")
        .createOrReplaceTempView("boxes")
      s.sql(
        s"""SELECT box_id,
           |  cast(count(*) as bigint) AS n_points,
           |  cast(sum(c_custkey) as bigint) AS key_sum
           |FROM customer JOIN boxes ON st_contains(bgeom, $custPt)
           |GROUP BY box_id ORDER BY box_id""".stripMargin)
    }),

    // Same join as q27, planned through GridJoinRule's large-large rewrite:
    // broadcast disabled while the plan materializes, so the logical join
    // becomes the grid-cell SortMergeJoin (no BNLJ, no broadcast R-tree)
    "q56_sql_grid_join" -> ((s: SparkSession, dir: String) => {
      init(s); view(s, dir, "customer")
      s.range(5).selectExpr(
        "cast(id as int) AS box_id",
        "st_makeenvelope(cast(id * 72 - 180 as double), -80.0, cast(id * 72 - 108 as double), 80.0) AS bgeom")
        .createOrReplaceTempView("boxes56")
      val oldThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val oldCell = s.conf.getOption("spark.graft.grid.cellSize")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.graft.grid.cellSize", "45.0")
      try {
        val df = s.sql(
          s"""SELECT box_id,
             |  cast(count(*) as bigint) AS n_points,
             |  cast(sum(c_custkey) as bigint) AS key_sum
             |FROM customer JOIN boxes56 ON st_contains(bgeom, $custPt)
             |GROUP BY box_id ORDER BY box_id""".stripMargin)
        // Downstream .write re-plans with a fresh QueryExecution AFTER the
        // confs are restored, which would silently fall back to the
        // broadcast path; persist + count executes the grid plan NOW, and
        // the re-planned write then reads the cached result of this plan.
        df.persist()
        df.count()
        df
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
        oldCell match {
          case Some(v) => s.conf.set("spark.graft.grid.cellSize", v)
          case None    => s.conf.unset("spark.graft.grid.cellSize")
        }
      }
    }),

    // equatorial geodesics have the closed form a * radians(dLon), making
    // Vincenty and Karney oracle-checkable exactly
    "q45_geodesic_methods" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_geodesiclength(st_geomfromtext(
         |    concat('LINESTRING (0 0, ', $custX / 4.0, ' 0)')), 'vincenty'), 2) AS vin_m,
         |  round(st_geodesiclength(st_geomfromtext(
         |    concat('LINESTRING (0 0, ', $custX / 4.0, ' 0)')), 'geodesic'), 2) AS geo_m
         |FROM customer ORDER BY c_custkey""".stripMargin),

    "q29_dwithin" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_dwithin($custPt, st_point(0.0, 0.0), 90.0) AS near_origin
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // GeoJSON codec round-trip (SURVEY §2.1 read_file GeoJSON slice)
    "q28_geojson" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_x(st_geomfromgeojson(concat('{"type":"Point","coordinates":[', $custX, ',', $custY, ']}'))) AS gx,
         |  st_y(st_geomfromgeojson(st_asgeojson($custPt))) AS gy
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // type/ring accessors (exteriorring/isring/geometrytype) end-to-end
    "q38_geo_type_ring" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_numpoints(st_exteriorring(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS ring_pts,
         |  st_isring(st_exteriorring(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS ring_closed,
         |  st_geometrytype(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) AS gtype,
         |  st_geometrytype($custPt) AS ptype
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // WKT writer/reader round-trip; integral coords print without decimals
    "q39_geo_wkt" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_astext($custPt) AS wkt,
         |  st_x(st_geomfromtext(st_astext($custPt))) AS rx
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // ===== explode / st_dump (SURVEY §2.4 explode)

    "q22_geo_dump_explode" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey, st_x(part) AS part_x, st_y(part) AS part_y
         |FROM (
         |  SELECT c_custkey, explode(st_dump(st_geomfromtext(
         |    concat('MULTIPOINT ((', $custX, ' ', $custY, '), (', $custX + 10.0, ' ', $custY, '))')))) AS part
         |  FROM customer)
         |ORDER BY c_custkey, part_x""".stripMargin),

    "q23_geo_simplify" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_numpoints(st_simplify(st_geomfromtext(concat(
         |    'LINESTRING (', $custX, ' 0, ', $custX + 1.0, ' 0.01, ', $custX + 2.0, ' 0)')), 0.5)) AS pts_loose,
         |  st_numpoints(st_simplify(st_geomfromtext(concat(
         |    'LINESTRING (', $custX, ' 0, ', $custX + 1.0, ' 0.01, ', $custX + 2.0, ' 0)')), 0.001)) AS pts_tight
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // scalar two-geometry union: overlapping squares, analytic dissolved area
    "q49_union_scalar" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_area(st_union(
         |    st_makeenvelope($custX, $custY, $custX + 2.0, $custY + 2.0),
         |    st_makeenvelope($custX + 1.0, $custY + 1.0, $custX + 3.0, $custY + 3.0))) AS union_area,
         |  st_area(st_union(
         |    st_makeenvelope($custX, $custY, $custX + 1.0, $custY + 1.0),
         |    st_makeenvelope($custX + 5.0, $custY, $custX + 6.0, $custY + 1.0))) AS disjoint_area
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // boolean overlay ops: ∩ and − areas have analytic values for the
    // offset-square construction (1x1 overlap => inter 1, diff side²-1)
    "q50_overlay_ops" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_area(st_intersection(
         |    st_makeenvelope($custX, $custY, $custX + 2.0, $custY + 2.0),
         |    st_makeenvelope($custX + 1.0, $custY + 1.0, $custX + 3.0, $custY + 3.0))) AS inter_area,
         |  st_area(st_difference(
         |    st_makeenvelope($custX, $custY, $custX + 2.0, $custY + 2.0),
         |    st_makeenvelope($custX + 1.0, $custY + 1.0, $custX + 3.0, $custY + 3.0))) AS diff_area
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // ===== geometry aggregates (SURVEY §2.5)

    "q24_envelope_agg" -> sqlQuery(Seq("customer"),
      s"""SELECT c_nationkey,
         |  st_xmin(e) AS bx0, st_ymin(e) AS by0, st_xmax(e) AS bx1, st_ymax(e) AS by1
         |FROM (SELECT c_nationkey, st_envelope_agg($custPt) AS e
         |      FROM customer GROUP BY c_nationkey)
         |ORDER BY c_nationkey""".stripMargin),

    "q25_collect_agg" -> sqlQuery(Seq("customer"),
      s"""SELECT c_nationkey,
         |  st_numpoints(st_collect($custPt)) AS n_pts,
         |  st_geomtypeid(st_collect($custPt)) AS tid
         |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    // overlapping unit-height boxes chained along x at 0.5 steps: the
    // dissolved area is analytically (max step - min step) * 0.5 + 1 per group
    "q26_union_agg" -> sqlQuery(Seq("customer"),
      """SELECT g, round(st_area(u), 6) AS union_area FROM (
        |  SELECT c_custkey % 20 AS g,
        |    st_union_agg(st_makeenvelope(
        |      cast((c_custkey div 20) * 0.5 as double), 0.0,
        |      cast((c_custkey div 20) * 0.5 + 1.0 as double), 1.0)) AS u
        |  FROM customer GROUP BY c_custkey % 20)
        |ORDER BY g""".stripMargin),

    // GLOBAL dissolve via the two-stage grid plan (Dissolve.unionAll): the
    // whole-table unary_union never funnels raw geometry into one reducer —
    // per-cell dissolves run in parallel, the final merge sees <= cells^2
    // rows. Two parity strips (y 0-1 / 3-4) of chained 0.5-step boxes
    // dissolve to exactly 2 rectangles with analytic areas.
    "q242_global_dissolve" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val boxes = s.sql(
        """SELECT st_makeenvelope(
          |  cast((c_custkey div 20) * 0.5 as double),
          |  cast(c_custkey % 2 as double) * 3.0,
          |  cast((c_custkey div 20) * 0.5 + 1.0 as double),
          |  cast(c_custkey % 2 as double) * 3.0 + 1.0) AS geom
          |FROM customer""".stripMargin)
      graft.spatial.Dissolve.unionAll(boxes, "geom", cells = 8)
        .select(
          (round(expr("st_area(union_geom)"), 6) + lit(0.0)).as("union_area"),
          expr("st_numgeometries(union_geom)").as("n_parts"))
    }),

    // ===== text-analysis pipeline ops

    // text_stats computes all counts in one scan; semantics pinned to the
    // oracle's regexes (\S+ runs / [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])
    "q30_doc_tokens" -> sqlQuery(Seq("documents"),
      """SELECT doc_id, ts.n_tokens AS n_tokens, ts.n_subwords AS n_subwords,
        |  length(text) AS n_chars
        |FROM (SELECT doc_id, text, text_stats(text) AS ts FROM documents)
        |ORDER BY doc_id""".stripMargin),

    "q31_doc_quality" -> ((s: SparkSession, dir: String) => {
      init(s); view(s, dir, "documents")
      s.table("documents")
        .select(col("doc_id"), round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
        .orderBy("doc_id")
    }),

    "q32_dedup_prefix_groups" -> sqlQuery(Seq("documents"),
      """SELECT substring(text, 1, 30) AS prefix,
        |  cast(count(*) as bigint) AS dup_count,
        |  min(doc_id) AS representative
        |FROM documents
        |GROUP BY substring(text, 1, 30)
        |HAVING count(*) > 1
        |ORDER BY prefix""".stripMargin),

    "q33_dedup_exact_count" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .selectExpr("doc_id", "substring(text, 1, 30) AS content")
      Dedup.exact(docs, "doc_id", "content")
        .agg(count(lit(1)).as("distinct_docs"))
    }),

    "q34_token_jaccard" -> sqlQuery(Seq("documents"),
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(cast(size(array_intersect(a.toks, b.toks)) as double) /
        |        cast(size(a.toks) + size(b.toks) - size(array_intersect(a.toks, b.toks)) as double), 6) AS jaccard
        |FROM
        |  (SELECT doc_id, array_distinct(split(trim(text), '\\s+')) AS toks FROM documents WHERE doc_id < 60) a
        |  JOIN
        |  (SELECT doc_id, array_distinct(split(trim(text), '\\s+')) AS toks FROM documents WHERE doc_id < 60) b
        |  ON a.doc_id < b.doc_id
        |WHERE cast(size(array_intersect(a.toks, b.toks)) as double) /
        |      cast(size(a.toks) + size(b.toks) - size(array_intersect(a.toks, b.toks)) as double) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin),

    // 32 bands x 4 rows: recall at the 0.5 threshold's S-curve knee is
    // 1-(1-s^4)^32 — ~1-5e-8 at s=0.8 (the lowest true-pair similarity in
    // the corpus), so the emitted set equals the exact-jaccard oracle set;
    // candidates are still verified with exact n-gram jaccard.
    "q35_minhash_lsh" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleSize = 3, bands = 32, rowsPerBand = 4, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // md5-based 60-bit simhash: the token hash is reproducible in DuckDB
    // ('0x'||substr(md5(tok),1,15)), and maxHamming=3 with four 15-bit chunk
    // buckets makes candidate recall EXACT by pigeonhole — so the emitted
    // pair set provably equals the all-pairs oracle.
    "q36_simhash" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Dedup.simhashPairsMd5(docs, "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // language-ID is a closed-form stopword-ratio argmax => SQL-expressible
    // oracle; the custom-hash fingerprint lives in q53 (rows-only)
    "q37_fingerprint_langid" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      TextAnalysis.analyze(docs, "doc_id", "text")
        .select("doc_id", "n_tokens", "lang_pred")
        .orderBy("doc_id")
    }),

    // composed corpus-prep pipeline: quality floor + language allowlist +
    // exact dedup — every stage is SQL-expressible, so the whole composite
    // is oracle-checked end-to-end
    "q57_corpus_clean" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.pipeline.Corpus.clean(docs, "doc_id", "text", minQuality = 0.9, langs = Seq("en"))
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }),

    // winnowing document fingerprint, oracle-verified: min md5_hash60 over
    // lowercased char 8-shingles (fingerprint_md5 kernel expression — one
    // pass, no per-window substring list). The native FNV/murmur variant
    // (doc_fingerprint, TextAnalysis.analyze) is spec-covered; this md5
    // twin recomputes exactly in DuckDB list arithmetic.
    "q53_doc_fingerprint" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      docs.select(col("doc_id"),
          expr("fingerprint_md5(text, 8)").as("fingerprint"))
        .orderBy("doc_id")
    }),

    // multimodal plumbing over binary payloads, fully oracle-verified: the
    // md5-layout codec (q224's FakeCodec twin) decodes width/height/luma,
    // extractFeatures carries the embedding batch shape (feat_dim checks the
    // array contract), and sampleFrames exercises the row-multiplying frame
    // sampler — every output recomputes in DuckDB md5/ceil arithmetic.
    "q48_multimodal" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val payloads = s.sql(
        """SELECT doc_id,
          |  cast(concat('IMG:', cast(doc_id as string), ':', text) as binary) AS payload
          |FROM documents""".stripMargin)
      val decoded = graft.pipeline.Multimodal.decodeImagesMd5(payloads, "payload")
      val feats = graft.pipeline.Multimodal.extractFeatures(decoded, "payload", dim = 8)
        .withColumn("duration_ms", col("decoded_width").cast("long") * 25)
      val frames = graft.pipeline.Multimodal.sampleFrames(feats, "duration_ms", 1000L)
      frames.groupBy("doc_id", "decoded_width", "decoded_height", "mean_luma")
        .agg(first(size(col("features"))).as("feat_dim"),
          count(col("frame_ms")).as("n_frames"),
          max(col("frame_ms")).as("last_frame_ms"))
        .orderBy("doc_id")
    }),

    // ===== embedding similarity ops

    "q40_emb_cosine" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 100)
      emb.select(col("vec_id"),
          round(Similarity.cosineCol("embedding", queryVec), 6).as("cosine"))
        .orderBy("vec_id")
    }),

    "q41_emb_topk" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryVec, 10)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),

    "q42_emb_neardup" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", dim = 64,
        planes = 6, threshold = 0.25, md5Planes = true)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    "q43_emb_knn" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 3)
        .selectExpr("vec_id AS q_id", "embedding AS q_vec")
      Similarity.knnJoin(emb, queries, "vec_id", "embedding", "q_id", "q_vec", 5)
        .select(col("q_id"), col("vec_id"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // IVF ANN: deterministic Lloyd-trained coarse cells, probe the nProbe
    // nearest (approximate by design: recall ~0.9 on this isotropic corpus
    // at 6/8 probes => rows-only check, exact counterpart is q41). At scale
    // the cell id becomes the storage partition key so probes prune files.
    "q52_emb_ivf" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      Similarity.ivfTopK(emb, "vec_id", "embedding", cents, queryVec, k = 10, nProbe = 6)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // GeoParquet write -> read round-trip with a spatial filter: exercises
    // the bbox covering column + spatial sort on write and the
    // BboxPruningRule rewrite (st_intersects over the covering stats) on
    // read — the §2.1 IO path end-to-end, not just in specs. Box edges sit
    // at x=0.5 so integer point coords never touch the boundary.
    "q54_geoparquet_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q54_geoparquet").getAbsolutePath
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", s"$custPt AS geometry")
      graft.sources.GeoParquet.write(cust, tmp, "geometry")
      graft.api.GeoIO.readParquet(s, tmp).df
        .filter(expr("st_intersects(geometry, st_makeenvelope(0.5, -90.0, 180.0, 90.0))"))
        .selectExpr("cast(count(*) as bigint) AS n_east",
          "cast(sum(c_custkey) as bigint) AS key_sum")
    }),

    // GeoJSON NDJSON write -> readGeoJson round-trip: one Feature per line,
    // parsed line-per-row in parallel (wholetext only for FeatureCollection
    // docs), properties schema inferred, geometry decoded to WKB
    "q55_geojson_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q55_geojson").getAbsolutePath
      s.read.parquet(s"$dir/customer.parquet")
        .selectExpr(
          s"""concat('{"type":"Feature","geometry":', st_asgeojson($custPt),
             |',"properties":{"c_custkey":', c_custkey, '}}') AS line""".stripMargin)
        .write.mode("overwrite").text(tmp)
      graft.api.GeoIO.readGeoJson(s, tmp).df
        .selectExpr("cast(c_custkey as bigint) AS c_custkey",
          "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("c_custkey")
    }),

    // exact all-pairs near-dup (oracle-checkable verification path; q42 is
    // the LSH-bucketed scale path over the same semantics)
    "q51_emb_neardup_exact" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Dedup.embeddingNearDupExact(emb, "vec_id", "embedding", threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // connected-components canonical assignment over the exact token-jaccard
    // pair set (q34's edges): alternating large-star/small-star, O(log n)
    // rounds of two shuffles each — the clustering step that turns near-dup
    // PAIRS into one representative per duplicate cluster. maxDf(100) > the
    // 60-doc corpus means inverted-index candidate recall is exact, so the
    // component structure is fully oracled via a recursive CTE in DuckDB.
    "q58_dedup_components" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 60)
      val pairs = Dedup.tokenJaccardPairs(docs, "doc_id", "text",
        threshold = 0.8, maxDf = 100)
      Dedup.assignComponents(docs, "doc_id", pairs)
        .orderBy("doc_id")
    }),

    // Arrow IPC write -> read round-trip — the reference's NATIVE format
    // (cities.arrow bench input, bundled datasets, from_arrow). Carries a
    // list<float> embedding column plus int64/int32 attributes through the
    // IPC encode/decode (one file per partition, one read task per file)
    // and back into the codegen cosine kernel.
    "q59_arrow_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q59_arrow").getAbsolutePath
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 200)
      graft.sources.ArrowIPC.write(emb, tmp)
      graft.sources.ArrowIPC.read(s, tmp)
        .select(col("vec_id"), col("label"),
          round(Similarity.cosineCol("embedding", queryVec), 6).as("cosine"))
        .orderBy("vec_id")
    }),

    // GeoPackage write -> read round-trip: customer points ride through the
    // pure-Scala SQLite b-tree writer (GP geometry blobs, interior pages at
    // this row count) and come back via the per-file reader; attributes and
    // WKB must survive bit-exact. fid = write-order rowid, checked via sum.
    "q60_geopackage_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmpDir = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q60_gpkg")
      tmpDir.mkdirs()
      val file = new java.io.File(tmpDir, "cust.gpkg").getAbsolutePath
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", "c_name", "c_acctbal", s"$custPt AS geometry")
        .orderBy("c_custkey")
      graft.sources.GeoPackage.write(cust, file, "geometry", tableName = "customers")
      graft.api.GeoIO.readGeoPackage(s, tmpDir.getAbsolutePath).df
        .selectExpr("cast(c_custkey as bigint) AS c_custkey", "c_name",
          "c_acctbal", "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("c_custkey")
    }),

    // deterministic source-weighted mixture sampling: an md5-bucket filter
    // (no shuffle, no RNG state — the same rows are kept on every rerun and
    // in every engine), weights per source. The curation step that
    // assembles a training mixture from a mixed corpus in one scan.
    "q61_corpus_mixture" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Corpus.mixture(docs, "doc_id", "source",
        Map("src0" -> 0.8, "src1" -> 0.25, "src2" -> 0.5))
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // corpus composition report: per-source doc/token/char totals + mean
    // quality in one partial-aggregating codegen scan
    "q62_corpus_stats" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Corpus.stats(docs, "source", "text")
        .select(col("source"), col("n_docs"),
          col("n_tokens").cast("long").as("n_tokens"), col("n_chars"),
          round(col("avg_quality"), 6).as("avg_quality"))
        .orderBy("source")
    }),

    // as-of join (union + ordered-window rewrite, ONE shuffle on the key):
    // each event aligns to the latest order of the same customer at or
    // before the event time — the feature/label temporal-alignment
    // primitive. Spark has no native as-of join; the naive inequality-join
    // formulation is O(events x orders) per key.
    "q63_asof_join" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      val events = s.table("events")
      val orders = s.read.parquet(s"$dir/orders.parquet")
      graft.relational.AsOfJoin.join(events, orders,
          leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
          leftTime = "ts", rightTime = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = Some("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("asof_orderkey"),
          col("o_totalprice").as("asof_price"))
        .orderBy("event_id")
    }),

    // time-proximity self join via 1-D bin rewrite (RangeJoin): pairs of
    // events within 1 s of each other. A timestamp self-join has no equi
    // key, so Spark would plan a BroadcastNestedLoopJoin — the bin key
    // turns it into a plain shuffle equi-join with a x3 replication on one
    // side only.
    "q64_range_join" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      val e = s.table("events").select(col("event_id"), col("event_type"), col("ts"))
      graft.relational.RangeJoin
        .selfProximity(e, "event_id", unix_micros(col("ts")), 1000000L)
        .select(col("event_id_a"), col("event_id_b"),
          col("event_type_a"), col("event_type_b"),
          abs(unix_micros(col("ts_a")) - unix_micros(col("ts_b"))).as("dt_us"))
        .orderBy("event_id_a", "event_id_b")
    }),

    // repeated word-5-gram statistics per document (Lee et al. 2021 style
    // duplicated-text measure): explode grams once, count distinct docs
    // per gram, join back, re-aggregate per doc. Fully oracled — the gram
    // construction is deterministic on both engines.
    "q65_ngram_dedup" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Dedup.ngramDupStats(docs, "doc_id", "text", n = 5)
        .orderBy("doc_id")
    }),

    // geohash cell ids (st_geohash codegen expression): the shuffle-free
    // spatial bucketing primitive — a prefix IS a grid cell, so groupBy /
    // partitionBy on prefixes clusters 100 TB spatially with no index.
    // cell4_count demonstrates prefix aggregation (window over the 4-char
    // cell).
    "q66_geohash" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      s.sql(
        s"""SELECT c_custkey, gh8, substring(gh8, 1, 4) AS gh4,
           |  cast(count(*) OVER (PARTITION BY substring(gh8, 1, 4)) as bigint) AS cell4_count
           |FROM (SELECT c_custkey, st_geohash($custPt, 8) AS gh8 FROM customer)
           |ORDER BY c_custkey""".stripMargin)
    }),

    // per-source top-5 tokens (heavy hitters): explode once, two-phase
    // count aggregation (map-side partials on (source, token)), then a
    // per-source window top-k — the vocabulary-analysis pattern that scales
    // by keeping the explode and count fully distributed and only the
    // k survivors per group past the window.
    "q67_top_tokens" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      s.sql(
        """SELECT source, token, cnt, rank FROM (
          |  SELECT source, token, cnt,
          |    cast(row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token) as int) AS rank
          |  FROM (
          |    SELECT source, token, cast(count(*) as bigint) AS cnt
          |    FROM (SELECT source, explode(split(trim(text), '\\s+')) AS token
          |          FROM documents)
          |    WHERE token != ''
          |    GROUP BY source, token))
          |WHERE rank <= 5
          |ORDER BY source, rank""".stripMargin)
    }),

    // gap sessionization via native session_window (6 h gap): ONE shuffle
    // on (user, merged-window); the same call sessionizes a watermarked
    // stream. Oracle reproduces the boundaries with the portable
    // lag + cumulative-sum formulation (new session when the gap EXCEEDS
    // 6 h — session_window merges inclusively at the boundary).
    "q68_sessionize" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      Sessionize.sessionAggregate(s.table("events"), Seq("user_id"), "ts", "6 hours")
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("first_event"), col("last_event"))
        .orderBy("user_id", "session_start")
    }),

    // exact distribution report: per-source document-length percentiles
    // (linear-interpolated, the same definition DuckDB's quantile_cont
    // uses) — single two-phase aggregation, no driver collect
    "q69_percentiles" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      s.sql(
        """SELECT source,
          |  round(percentile(length(text), 0.5), 6) + 0.0 AS p50,
          |  round(percentile(length(text), 0.9), 6) + 0.0 AS p90,
          |  round(percentile(length(text), 0.99), 6) + 0.0 AS p99,
          |  cast(count(*) as bigint) AS n_docs
          |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    }),

    // geohash decode round-trip: the precision-8 cell polygon of each
    // customer point contains the point, and its bounds equal the
    // closed-form cell arithmetic (oracled exactly — successive halving
    // is dyadic, so both engines produce identical doubles)
    "q70_geohash_decode" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      s.sql(
        s"""SELECT c_custkey,
           |  st_xmin(cell) AS cx0, st_ymin(cell) AS cy0,
           |  st_xmax(cell) AS cx1, st_ymax(cell) AS cy1,
           |  st_intersects(cell, $custPt) AS holds
           |FROM (SELECT c_custkey, st_geomfromgeohash(st_geohash($custPt, 8)) AS cell
           |      FROM customer)
           |ORDER BY c_custkey""".stripMargin)
    }),

    // per-document top-3 TF-IDF terms: explode once, (doc, term) counts
    // with map-side partials, df and doc-length via windows (no join
    // against a df table), rank on the ROUNDED score so ordering is
    // engine-reproducible
    "q71_tfidf" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    }),

    // skew-salted equi-join: orders fan across (custkey, salt-of-orderkey)
    // reducers, customers replicate x8 — result provably identical to the
    // plain join (the oracle IS the plain join)
    "q72_salted_join" -> ((s: SparkSession, dir: String) => {
      init(s)
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      graft.relational.SkewJoin
        .saltedJoin(orders, cust, Seq("o_custkey"), Seq("c_custkey"), "o_orderkey", 8)
        .groupBy("c_mktsegment")
        .agg(sum(col("o_totalprice").cast("decimal(20,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // geohash-cell Hive-partitioned spatial layout: write one directory
    // per precision-1 cell, read back with a cell predicate that prunes
    // DIRECTORIES (PartitionFilters — files of other cells are never
    // listed), stacking with bbox row-group pruning inside each file
    "q73_cell_partition" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q73_cells").getAbsolutePath
      val pts = s.sql(s"SELECT c_custkey, $custPt AS geometry FROM customer")
      graft.sources.GeoParquet.writeCellPartitioned(pts, tmp, "geometry", precision = 1)
      graft.sources.GeoParquet.read(s, tmp)
        .filter(col("geometry_cell") < "8")
        .selectExpr("c_custkey", "cast(geometry_cell as string) AS cell")
        .orderBy("c_custkey")
    }),

    // spatial k-nearest-neighbor join (PostGIS `<->`): 3 nearest of the 5
    // q20 boxes per customer point via broadcast STR-tree best-first
    // descent — no shuffle of the probe side, O(log n) per row, ties
    // resolved toward the smaller box id on both engines
    "q74_spatial_knn" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val cust = s.sql(s"SELECT c_custkey, $custPt AS geometry FROM customer")
      val boxes = s.range(5).selectExpr(
        "cast(id as int) AS box_id",
        "st_makeenvelope(cast(id * 72 - 180 as double), -80.0, cast(id * 72 - 108 as double), 80.0) AS geometry")
      SpatialJoin.knnJoin(cust, boxes, 3, "box_id")
        .selectExpr("c_custkey_left AS c_custkey", "box_id_right AS box_id",
          "round(knn_dist, 6) AS dist", "knn_rank AS rank")
        .orderBy("c_custkey", "rank")
    }),

    // the broadcast-lookup physical path for the SAME as-of semantics as
    // q63 (shared oracle shape): binary-search enrichment against a
    // broadcast index — the stream-static/feature-store regime
    "q75_asof_lookup" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      val events = s.table("events")
      val orders = s.read.parquet(s"$dir/orders.parquet")
      graft.relational.AsOfJoin.broadcastLookup(events, orders,
          leftKey = col("user_id"), rightKey = col("o_custkey"),
          leftTime = unix_micros(col("ts")),
          // orders parquet reads as TIMESTAMP_NTZ; session TZ is UTC so the
          // cast is the identity instant
          rightTime = unix_micros(col("o_orderdate").cast("timestamp")),
          payloadCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = Some("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("asof_orderkey"),
          col("o_totalprice").as("asof_price"))
        .orderBy("event_id")
    }),

    // per-ROW session ids (the shape session_window cannot give): lag +
    // running sum, one shuffle; ids are 0-based per user in (ts, event)
    // order
    "q76_session_ids" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      Sessionize.assignIds(s.table("events"), Seq("user_id"), "ts",
          gapMicros = 21600000000L, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("session_idx"))
        .orderBy("event_id")
    }),

    // GeoArrow typed-column encoding (reference §1.2 ragged arrays /
    // shapely.to_ragged_array): point -> struct<x,y> and back in pure
    // codegen SQL; st_coorddump gives the ragged vertex view of the
    // envelope ring (5 closed-ring coords, third vertex = far corner)
    "q77_geoarrow" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey, ga.x AS gx, ga.y AS gy,
         |  st_x(st_point(ga.x, ga.y)) AS rx,
         |  size(st_coorddump(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS n_coords,
         |  st_coorddump(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))[2].x AS cx,
         |  st_coorddump(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))[2].y AS cy
         |FROM (SELECT c_custkey,
         |        struct(st_x($custPt) AS x, st_y($custPt) AS y) AS ga
         |      FROM customer)
         |ORDER BY c_custkey""".stripMargin),

    // multimodal frame sampling with an EXACT oracle (unlike q48's
    // hash-stubbed codec): synthetic per-order video durations explode to
    // one row per 250 ms frame; the closed-form count/last-offset
    // arithmetic pins the row-multiplying plumbing on both engines.
    // Zero/negative durations must produce NO rows.
    "q78_frame_sample" -> ((s: SparkSession, dir: String) => {
      init(s)
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .withColumn("duration_ms", (col("o_orderkey") % 10000).cast("long"))
      graft.pipeline.Multimodal.sampleFrames(orders, "duration_ms", 250L)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_frames"), max(col("frame_ms")).as("last_frame"))
        .orderBy("o_orderkey")
    }),

    // HyperLogLog distinct-user sketch per event type with a
    // deterministic md5 hash layout — the estimate itself is
    // bit-reproducible cross-engine (hash-exact oracle for an
    // APPROXIMATE sketch), shown next to the exact distinct count
    "q79_hll_sketch" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      val events = s.table("events")
      val hll = graft.pipeline.Sketch.hllDistinct(events, "user_id", Seq("event_type"))
      val exact = events.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      hll.join(exact, Seq("event_type"))
        .select(col("event_type"), col("hll_estimate"), col("n_buckets_used"),
          col("exact_distinct"))
        .orderBy("event_type")
    }),

    // Count-Min frequency sketch over event user_ids (4x256 counters,
    // one map-side-combinable aggregation — NO per-key shuffle at build
    // time), probed for the 20 smallest user ids next to their exact
    // counts. md5 hash layout => the estimate is bit-reproducible
    // cross-engine; CMS error is one-sided (estimate >= exact).
    "q80_cms_freq" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      val events = s.table("events")
      val cms = graft.pipeline.Sketch.cmsTable(events, "user_id")
      val cands = events.select(col("user_id")).filter(col("user_id") < 20).distinct()
      val est = graft.pipeline.Sketch.cmsEstimate(cands, cms, "user_id")
      val exact = events.filter(col("user_id") < 20)
        .groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("user_id"))
        .select(col("user_id"), col("cms_estimate"), col("exact_cnt"))
        .orderBy("user_id")
    }),

    // Equi-width-histogram quantile sketch: p50/p95 of extendedprice per
    // returnflag from 128 bin counters (two scans, fixed state) instead
    // of the full per-group sort an exact percentile needs (q69).
    // Closed-form interpolation => hash-exact oracle for an APPROXIMATE
    // estimator; exact percentile alongside shows the error stays inside
    // one bin width.
    "q81_hist_quantiles" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "lineitem")
      val li = s.table("lineitem")
      val est = graft.pipeline.Sketch.histQuantiles(
        li, "l_extendedprice", Seq("l_returnflag"), Seq(0.5, 0.95))
      // exact median via the scale-safe sort-rank operator (bit-identical
      // to the built-in `percentile`, see QuantilesSpec) — the built-in's
      // distinct-value ObjectHashAggregate state is the data itself on a
      // near-distinct measure
      val exact = graft.relational.Quantiles
        .exactPercentile(li, Seq("l_returnflag"), "l_extendedprice", 0.5, "__q")
        .select(col("l_returnflag"), (round(col("__q"), 4) + lit(0.0)).as("exact_q50"))
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("est_q50"), col("est_q95"), col("exact_q50"))
        .orderBy("l_returnflag")
    }),

    // PII scrub before training: emails/IPv4s/phone-shaped numbers ->
    // typed placeholders, plus per-kind audit counts on the original
    // text. A deterministic contact block synthesized from doc_id makes
    // every document exercise all three patterns; the whole op is a
    // codegen regexp chain (no UDF, no shuffle — one scan at any scale).
    "q82_pii_redact" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents").withColumn("__t",
        concat(
          substring(col("text"), 1, 64), lit(" contact u"), col("doc_id"),
          lit("@mail"), col("doc_id") % 7, lit(".org at 10."),
          col("doc_id") % 256, lit(".0."), col("doc_id") % 100,
          lit(" or +1 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      val (ne, ni, np) = graft.pipeline.Corpus.piiCounts(col("__t"))
      docs.select(
        col("doc_id"), ne.as("n_emails"), ni.as("n_ips"), np.as("n_phones"),
        graft.pipeline.Corpus.redactPii(col("__t")).as("redacted"))
        .orderBy("doc_id")
    }),

    // exact-n deterministic stratified sample (40 docs per source by
    // smallest md5(doc_id)): reproducible across runs, partitionings,
    // and engines; the md5-bucket prefix prune keeps the per-stratum
    // window sort at ~slack*n rows instead of the whole stratum
    "q83_stratified_sample" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.Corpus.stratifiedSampleN(
          s.table("documents"), "source", "doc_id", 40)
        .select(col("source"), col("sample_rank"), col("doc_id"))
        .orderBy("source", "sample_rank")
    }),

    // product-quantization ANN: 64-dim float vectors -> 8 one-byte codes
    // (32x compression); top-10 by asymmetric distance computed from the
    // codes ALONE (m lookup-table reads per row — the vector column is
    // never scanned at query time). Exact cosine joined back for the
    // survivors only. Approximate => rows-only driver check; PqSpec pins
    // ADC == cosine-of-reconstruction and recall against brute force.
    "q84_pq_ann" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
      val coded = emb.select(col("vec_id"),
        Similarity.pqEncodeCol(col("embedding"), books).as("pq_code"))
      val top = Similarity.pqAdcTopK(coded, "vec_id", "pq_code", books, queryVec, 10)
      top.join(emb, Seq("vec_id"))
        .select(col("vec_id"), round(col("adc_cosine"), 6).as("adc_cosine"),
          round(Similarity.cosineCol("embedding", queryVec), 6).as("exact_cosine"))
        .orderBy(desc("adc_cosine"), col("vec_id"))
    }),

    // Bloom-filter semi-join pruning: 16384-bit deterministic md5 bloom
    // of the high-value order keys, probed as a pure codegen bit test on
    // the lineitem side — the 100 TB pattern for filtering a huge fact
    // scan against a key set without shuffling it. Exact semi-join
    // alongside counts the false positives the later exact join removes;
    // the md5 layout makes even the FP set bit-reproducible cross-engine.
    "q85_bloom_prune" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "orders", "lineitem")
      val keys = s.table("orders")
        .filter(col("o_totalprice") > 400000.0).select(col("o_orderkey"))
      val words = graft.pipeline.Sketch.bloomBits(keys, "o_orderkey")
      val probe = s.table("lineitem").select(col("l_orderkey")).distinct()
      probe
        .withColumn("bloom_pass",
          graft.pipeline.Sketch.bloomContains(col("l_orderkey"), words))
        .join(keys.withColumn("in_set", lit(1)),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(
          count(lit(1)).as("n_probe_keys"),
          sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
          sum(when(col("in_set").isNotNull, 1L).otherwise(0L)).as("n_members"),
          sum(when(col("bloom_pass") && col("in_set").isNull, 1L).otherwise(0L))
            .as("n_false_pos"))
    }),

    // boilerplate-line removal (CCNet-style): synthesize multi-line docs
    // with template footers injected into 1/3 and 1/2 of them, then drop
    // every line whose document frequency exceeds 20% and reassemble in
    // original order. Content lines survive, injected chrome disappears,
    // all-boilerplate docs come back empty rather than dropped.
    "q86_boilerplate" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents").select(col("doc_id"),
        concat_ws("\n",
          substring(col("text"), 1, 80),
          when(col("doc_id") % 3 === 0, lit("copyright footer example corp")),
          substring(col("text"), 81, 80),
          when(col("doc_id") % 2 === 0, lit("subscribe to our newsletter")))
          .as("t"))
      graft.pipeline.Corpus.stripBoilerplate(docs, "doc_id", "t", 0.2)
        .withColumn("n_clean_chars", length(col("clean_text")).cast("bigint"))
        .orderBy("doc_id")
    }),

    // unigram LM quality scoring (the perplexity-filter shape): corpus
    // unigram counts -> per-doc mean token log-probability. Per-term
    // contributions round to 6 decimals and sum as decimal(20,6), so the
    // fold is order-independent — an ln()-based score that still
    // hash-matches the oracle on any partitioning.
    "q87_unigram_lp" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      TextAnalysis.unigramLogProb(s.table("documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // context-window chunking: 48-token chunks, 8-token overlap — the
    // sharding step before tokenization. Pure per-row explode, no
    // shuffle; chunk boundaries are closed-form so the oracle is exact.
    "q88_chunk_tokens" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.Corpus.chunkTokens(s.table("documents"), "text", 48, 8)
        .select(col("doc_id"), col("chunk_id"),
          col("n_chunk_tokens"), md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }),

    // contiguous token-offset sharding into 4096-token target shards
    // (concatenate-then-split assignment: a straddling doc belongs to
    // the shard it starts in), packed independently per source (the
    // window partitions by source — never a global sort)
    "q89_pack_sequences" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.Corpus.packSequences(
          s.table("documents"), "source", "doc_id", "text", 4096)
        .groupBy(col("source"), col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("source", "shard_id")
    }),

    // repeated-span scrubbing (substring dedup, Lee et al. 2022 shape):
    // every 6-token window appearing in >= 3 distinct docs is masked
    // everywhere (a template phrase is injected into 1/4 of the docs to
    // guarantee the path fires), survivors reassemble in order
    "q90_span_scrub" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents").select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" join our mailing list for weekly updates today")))
          .otherwise(col("text")).as("t"))
      graft.pipeline.Dedup.scrubRepeatedSpans(docs, "doc_id", "t", 6, 3)
        .select(col("doc_id"), col("n_kept_tokens"),
          md5(col("scrubbed_text")).as("scrubbed_md5"))
        .orderBy("doc_id")
    }),

    // out-of-vocabulary rate vs the corpus' own top-200 tokens
    // (deterministic tie-break): the tokenizer-fit signal; the
    // vocabulary is top-k-bounded so the membership join broadcasts
    "q91_oov_rate" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      TextAnalysis.oovRate(s.table("documents"), "doc_id", "text", 200)
        .orderBy("doc_id")
    }),

    // MMR diversified top-10: distributed exact top-50 prune, then the
    // greedy maximal-marginal-relevance re-rank over the k-bounded
    // candidate set (inherently sequential => driver-side by design).
    // Deterministic (ties by id); oracle-checked end-to-end against the
    // 10-pick unrolled-CTE greedy in DuckDB.
    "q92_mmr_rerank" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.mmrTopK(emb, "vec_id", "embedding", queryVec, 10)
        .orderBy("rank")
    }),

    // IVF-PQ composed ANN (the FAISS standard, non-residual): coarse
    // cells prune the scan to nProbe=4 of 16, PQ codes score via ADC —
    // at scale cell id + code are persisted and the raw vector column is
    // never read at query time. Approximate => rows-only check.
    "q93_ivfpq_ann" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val coarse = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k = 16)
      val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
      val coded = emb.select(col("vec_id"),
        graft.internal.exprColumn(graft.pipeline.NearestCentroid(
          graft.internal.columnExpr(col("embedding")), coarse)).as("cell"),
        Similarity.pqEncodeCol(col("embedding"), books).as("pq_code"))
      Similarity.ivfPqTopK(coded, "vec_id", "cell", "pq_code",
          coarse, books, queryVec, 10, nProbe = 4)
        .withColumn("adc_cosine", round(col("adc_cosine"), 6) + lit(0.0))
        .orderBy(desc("adc_cosine"), col("vec_id"))
    }),

    // corpus snapshot diff by content hash: yesterday's crawl vs today's
    // (drops, edits, and additions synthesized deterministically from
    // doc_id), labeled added/removed/changed/unchanged in one
    // full-outer join on the id — incremental-ingestion bookkeeping
    "q94_snapshot_diff" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents")
      val old = docs.select(col("doc_id"), col("text"))
      val newer = docs
        .filter(col("doc_id") % 17 =!= 0) // 1/17 removed
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" [edited]")))
            .otherwise(col("text")).as("text"))
        .unionAll(docs.select((col("doc_id") + 1000000).as("doc_id"), col("text"))
          .filter(col("doc_id") % 5 === 0)) // additions under new ids
      graft.pipeline.Corpus.snapshotDiff(old, newer, "doc_id", "text")
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("status")
    }),

    // token-distribution drift per source between snapshots: KL(new||old)
    // with add-one smoothing over the joint vocabulary; per-term
    // contributions fold as decimal(24,8) so the ln()-based divergence
    // hash-matches cross-engine. The monitoring alarm for "this crawl
    // source changed character since yesterday".
    "q95_token_drift" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents")
      val old = docs.select(col("source"), col("text"))
      val newer = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("source"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" breaking update coverage tonight")))
            .otherwise(col("text")).as("text"))
      TextAnalysis.tokenDrift(old, newer, "source", "text")
        .orderBy("source")
    }),

    // the HLL sketch as a SQL AGGREGATE (TypedImperativeAggregate,
    // 256-byte buffer, map-side combined): same md5 layout as q79's
    // DataFrame op, so even through the UDAF path the APPROXIMATE
    // estimate hash-matches the DuckDB oracle. GROUP BY lang x source
    // exercises many small groups through the fixed-size buffers.
    "q96_hll_sql_agg" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      s.sql(
        """SELECT lang, source, hll_distinct(doc_id) AS hll_estimate,
          |  cast(count(DISTINCT doc_id) as bigint) AS exact_distinct
          |FROM documents GROUP BY lang, source
          |ORDER BY lang, source""".stripMargin)
    }),

    // incremental ingest dedup: an incoming batch (2/3 re-crawls of
    // yesterday's content under new ids, 1/3 genuinely new + within-batch
    // repeats) deduped against history — bloom prune feeds the exact
    // digest anti-join, so false positives cost a join probe, never a
    // wrong answer. Result = exactly the new distinct content.
    "q97_incremental_dedup" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents")
      val history = docs.select(col("doc_id"), col("text"))
      val incoming = docs
        .select((col("doc_id") + 2000000).as("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit("fresh take "), col("text"))) // genuinely new content
            .otherwise(col("text")).as("text")) // exact re-crawl
        .unionAll(docs.filter(col("doc_id") % 10 === 0) // within-batch repeats
          .select((col("doc_id") + 3000000).as("doc_id"),
            concat(lit("fresh take "), col("text")).as("text")))
      graft.pipeline.Dedup
        .dedupAgainstHistory(incoming, history, "doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // deterministic shard assignment (the training-run "global shuffle"):
    // shard = md5(doc_id) mod 64, a pure codegen projection — no sort,
    // no shuffle, reproducible cross-engine; shard sizes come out
    // uniform and ingest-order-free. Report = per-shard composition.
    "q98_shard_assign" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.Corpus.assignShards(s.table("documents"), "doc_id", 64)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          min(col("doc_id")).as("min_id"))
        .orderBy("shard")
    }),

    // Shapefile write -> read round-trip (writer counterpart of the
    // pure-Scala reader): customer points + N/C attributes through
    // .shp/.shx/.dbf bytes and back; coordinates and attributes must
    // survive bit-exact (closed-form oracle, like q60's GeoPackage trip)
    "q99_shapefile_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      // per-run temp dir: a fixed shared path would let concurrent runs
      // interleave half-written .shp/.dbf files; deleteOnExit bounds the
      // leak (the read below is lazy, so we cannot delete eagerly here)
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q99_shp").toFile
      tmpDir.deleteOnExit()
      val base = new java.io.File(tmpDir, "cust").getAbsolutePath
      Seq(".shp", ".shx", ".dbf").foreach(ext =>
        new java.io.File(base + ext).deleteOnExit())
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", "c_name", s"$custPt AS geometry")
        .orderBy("c_custkey")
      graft.sources.Shapefile.write(cust, base, "geometry")
      graft.api.GeoIO.readShapefile(s, tmpDir.getAbsolutePath).df
        .selectExpr("cast(c_custkey as bigint) AS c_custkey", "c_name",
          "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("c_custkey")
    }),

    // FlatGeobuf write -> indexed read round-trip: customer points +
    // attributes through the flatbuffer codec, packed Hilbert R-tree
    // built on write, and the bbox query READS THROUGH THE INDEX — only
    // intersecting leaves are decoded (the cloud-native pushdown path);
    // closed-form oracle filters the synthesized coords directly
    "q244_flatgeobuf_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q240_fgb").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "cust.fgb").getAbsolutePath
      new java.io.File(path).deleteOnExit()
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", "c_name", s"$custPt AS geometry")
        .orderBy("c_custkey")
      graft.sources.FlatGeobuf.write(cust, path, "geometry")
      graft.sources.FlatGeobuf.read(s, tmpDir.getAbsolutePath,
          bbox = Some((-50.0, -40.0, 50.0, 40.0)))
        .selectExpr("c_custkey", "c_name",
          "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("c_custkey")
    }),

    // read_file option facade end to end: write an indexed .fgb, read it
    // back through GeoIO.readFile with bbox (R-tree pushdown) + where
    // (plan filter) + columns (pruning) stacked — the order-independent
    // slice of the reference's read_file option surface in one
    // driver-checked query (skip/max/fids ride stored file order and are
    // spec-tested in ReadFileSpec instead)
    "q246_readfile_options" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q246_fgb").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "cust.fgb").getAbsolutePath
      new java.io.File(path).deleteOnExit()
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", "c_nationkey", "c_name", s"$custPt AS geometry")
        .orderBy("c_custkey")
      graft.sources.FlatGeobuf.write(cust, path, "geometry")
      graft.api.GeoIO.readFile(s, path, graft.api.GeoIO.ReadOptions(
          columns = Seq("c_custkey", "c_nationkey"),
          where = Some("c_nationkey % 5 = 1"),
          bbox = Some((-60.0, -50.0, 60.0, 50.0)))).df
        .selectExpr("c_custkey", "c_nationkey",
          "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("c_custkey")
    }),

    // round-4 read_file option additions end to end: read_geometry=false
    // (bbox/where still filter on the REAL geometry, the returned column
    // is NULL — OGR behavior), sql over the registered layer, sql_dialect
    // pinned to 'spark' (anything else fails loud). encoding and force_2d
    // need byte-crafted fixtures and live in ReadFileSpec.
    "q248_readfile_options2" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q248_fgb").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "cust.fgb").getAbsolutePath
      new java.io.File(path).deleteOnExit()
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", "c_nationkey", "c_name", s"$custPt AS geometry")
        .orderBy("c_custkey")
      graft.sources.FlatGeobuf.write(cust, path, "geometry")
      graft.api.GeoIO.readFile(s, path, graft.api.GeoIO.ReadOptions(
          where = Some("c_nationkey % 5 = 1"),
          bbox = Some((-60.0, -50.0, 60.0, 50.0)),
          readGeometry = false,
          sqlDialect = Some("spark"),
          sql = Some("SELECT c_custkey, c_nationkey, geometry FROM layer"))).df
        .selectExpr("c_custkey", "c_nationkey",
          "geometry IS NULL AS geom_dropped")
        .orderBy("c_custkey")
    }),

    // KML write -> read round-trip (the OGR long-tail formats the
    // reference reaches through GDAL; here pure-JDK StAX, one task per
    // file). name/description map to KML fields, other columns ride
    // ExtendedData as strings; doubles serialize via Double.toString so
    // the round-trip is bit-exact and the oracle can recompute the
    // values straight from customer.
    "q249_kml_roundtrip" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q249_kml").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "cust.kml").getAbsolutePath
      new java.io.File(path).deleteOnExit()
      val cust = s.sql(
        s"""SELECT concat('c_', c_custkey) AS name, c_custkey AS ck,
           |  cast(c_custkey % 97 as double) / 8.0 AS score, $custPt AS geometry
           |FROM customer WHERE c_custkey <= 600 ORDER BY c_custkey""".stripMargin)
      graft.sources.OgcXml.writeKml(cust, path)
      graft.api.GeoIO.readFile(s, path).df
        .selectExpr("cast(extended['ck'] as bigint) AS c_custkey", "name",
          "cast(extended['score'] as double) AS score",
          "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("c_custkey")
    }),

    // GPX waypoint layer round-trip: points + ele/time through the
    // Topografix 1.1 schema (lat/lon attributes, child ele/time/name).
    "q250_gpx_waypoints" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q250_gpx").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "cust.gpx").getAbsolutePath
      new java.io.File(path).deleteOnExit()
      val cust = s.sql(
        s"""SELECT concat('w_', c_custkey) AS name,
           |  cast(c_custkey % 500 as double) / 4.0 AS ele,
           |  concat('2024-01-01T00:', lpad(cast(c_custkey % 60 as string), 2, '0'), ':00Z') AS time,
           |  $custPt AS geometry
           |FROM customer WHERE c_custkey <= 600 ORDER BY c_custkey""".stripMargin)
      graft.sources.OgcXml.writeGpx(cust, path)
      graft.sources.OgcXml.readGpx(s, path, "waypoints")
        .selectExpr("name", "ele", "time",
          "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("name")
    }),

    // GML Simple Features read: a driver-authored GML3 document (bounded
    // fixture generation, <=300 features) with mixed Point/Polygon
    // geometries and text properties; the reader recovers fid, the
    // properties map, and WKB geometry. Oracle recomputes every value
    // from customer in closed form.
    "q251_gml_read" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      import s.implicits._
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q251_gml").toFile
      tmpDir.deleteOnExit()
      val path = new java.io.File(tmpDir, "cust.gml").getAbsolutePath
      new java.io.File(path).deleteOnExit()
      val keys = s.table("customer").select("c_custkey")
        .where("c_custkey <= 300").orderBy("c_custkey").as[Long].collect()
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      sb.append("<wfs:FeatureCollection xmlns:wfs=\"http://www.opengis.net/wfs\" ")
      sb.append("xmlns:gml=\"http://www.opengis.net/gml\" xmlns:app=\"http://example.com/app\">\n")
      keys.foreach { k =>
        val x = (k % 360 - 180).toDouble
        val y = ((k * 7) % 160 - 80).toDouble
        val side = (k % 10 + 1).toDouble
        sb.append(s"""<gml:featureMember><app:f gml:id="f_$k"><app:v>${k * 3}</app:v><app:geom>""")
        if (k % 5 == 0)
          sb.append(s"<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>" +
            s"$x $y ${x + side} $y ${x + side} ${y + side} $x ${y + side} $x $y" +
            "</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon>")
        else
          sb.append(s"<gml:Point><gml:pos>$x $y</gml:pos></gml:Point>")
        sb.append("</app:geom></app:f></gml:featureMember>\n")
      }
      sb.append("</wfs:FeatureCollection>\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      graft.sources.OgcXml.readGml(s, path)
        .selectExpr("fid", "cast(properties['v'] as bigint) AS v",
          "st_geometrytype(geometry) AS gtype",
          "st_xmin(geometry) AS gx", "st_ymin(geometry) AS gy",
          "st_area(geometry) AS area")
        .orderBy("v")
    }),

    // capstone composition: the curation pipeline end to end — PII
    // redaction -> token-count floor -> exact dedup (smallest id per
    // distinct cleaned text) -> deterministic shard assignment ->
    // per-shard composition report, one declarative plan under one
    // exact oracle. Scan + two shuffles (dedup key, shard agg) at any
    // corpus size.
    "q100_curation_pipeline" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val cleaned = s.table("documents")
        .select(col("doc_id"),
          graft.pipeline.Corpus.redactPii(col("text")).as("t"))
        .filter(TextAnalysis.tokenCount(col("t")) >= 20)
      val deduped = graft.pipeline.Dedup.exact(cleaned, "doc_id", "t")
      graft.pipeline.Corpus.assignShards(deduped, "doc_id", 16)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("t")).cast("long")).as("n_tokens"),
          min(col("doc_id")).as("min_id"))
        .orderBy("shard")
    }),

    // st_buffer (point slice): 32-gon buffers; checked by closed-form
    // invariants robust to last-ulp trig differences — vertex count,
    // area/r^2 ratio (one rounded constant), and buffer-contains vs
    // dwithin equivalence for strictly-inside / strictly-outside probes
    // st_boundary (OGC mod-2 semantics): polygon -> closed ring line,
    // closed line -> empty (null), open line -> endpoint multipoint,
    // point -> empty. WKT strings are closed-form from integer coords.
    "q103_boundary" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_astext(st_boundary(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS env_boundary,
         |  st_boundary(st_exteriorring(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) IS NULL AS ring_closed,
         |  st_astext(st_boundary(st_geomfromtext(
         |    concat('LINESTRING (0 0, ', $custX, ' ', $custY, ')')))) AS line_boundary,
         |  st_boundary($custPt) IS NULL AS point_empty
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // representative_point: centroid for convex shapes (closed form on
    // envelopes), always inside; validity: envelope true + literal
    // bowtie/zero-area false; clip_by_rect: right-half clip area is
    // side^2/2 closed-form, disjoint rect clips to nothing (null)
    "q104_rep_valid_clip" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_x(st_representativepoint(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS rx,
         |  st_y(st_representativepoint(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS ry,
         |  st_contains(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide),
         |    st_representativepoint(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide))) AS rep_inside,
         |  st_isvalid(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) AS env_valid,
         |  st_isvalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))')) AS bowtie_valid,
         |  st_isvalid(st_geomfromtext('POLYGON ((0 0, 1 1, 2 2, 0 0))')) AS flat_valid,
         |  round(st_area(st_clipbyrect(
         |    st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide),
         |    $custX + $custSide / 2, $custY, $custX + $custSide * 1.5, $custY + $custSide)), 6) + 0.0 AS half_area,
         |  coalesce(st_isempty(st_clipbyrect(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide),
         |    $custX + $custSide * 3, $custY, $custX + $custSide * 4, $custY + $custSide)), true) AS clip_empty
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // per-source corpus health dashboard: volume, mean quality, majority
    // language, exact-dup fraction — every signal an already-oracled
    // kernel, composed into one hash-exact report
    "q102_health_report" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      TextAnalysis.healthReport(s.table("documents"), "source", "text")
        .orderBy("source")
    }),

    "q101_buffer" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_numpoints(st_buffer($custPt, $custSide)) AS n_vertices,
         |  round(st_area(st_buffer($custPt, $custSide)) / ($custSide * $custSide), 4) + 0.0
         |    AS area_ratio,
         |  st_contains(st_buffer($custPt, $custSide),
         |    st_point($custX + $custSide * 0.5, $custY)) AS contains_inner,
         |  st_contains(st_buffer($custPt, $custSide),
         |    st_point($custX + $custSide * 2.0, $custY)) AS contains_outer,
         |  st_dwithin($custPt, st_point($custX + $custSide * 0.5, $custY), $custSide)
         |    AS dwithin_inner
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // st_azimuth (north-based clockwise bearing) + st_closestpoint /
    // st_shortestline (argmin witness of st_distance). The envelope sits
    // 2 east / off north of the probe point, so the closest point is the
    // exact corner (clamp with integer coords — bit-exact on both engines)
    // and the shortest-line length is sqrt(4 + off^2) closed-form.
    "q105_azimuth_closest" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_azimuth($custPt, st_point($custX + $custSide, $custY + 2)), 6) + 0.0 AS az_east,
         |  round(st_azimuth($custPt, st_point($custX - $custSide, $custY + 2)), 6) + 0.0 AS az_west,
         |  st_azimuth($custPt, $custPt) IS NULL AS az_self_null,
         |  st_x(st_closestpoint(
         |    st_makeenvelope($custX + 2, $custY + cast(c_custkey % 3 + 3 as double),
         |                    $custX + 2 + $custSide, $custY + cast(c_custkey % 3 + 3 as double) + $custSide),
         |    $custPt)) AS cx,
         |  st_y(st_closestpoint(
         |    st_makeenvelope($custX + 2, $custY + cast(c_custkey % 3 + 3 as double),
         |                    $custX + 2 + $custSide, $custY + cast(c_custkey % 3 + 3 as double) + $custSide),
         |    $custPt)) AS cy,
         |  round(st_length(st_shortestline($custPt,
         |    st_makeenvelope($custX + 2, $custY + cast(c_custkey % 3 + 3 as double),
         |                    $custX + 2 + $custSide, $custY + cast(c_custkey % 3 + 3 as double) + $custSide))), 6) + 0.0
         |    AS short_len,
         |  st_x(st_closestpoint($custPt, st_makeenvelope($custX + 2, $custY + 3,
         |    $custX + 3, $custY + 4))) AS self_x
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // line accessors: st_startpoint / st_endpoint / st_pointn (1-based,
    // negative from end) / st_reverse, over a 3-vertex line whose WKT both
    // engines synthesize from the same integer strings
    "q106_line_accessors" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_astext(st_startpoint(line)) AS sp,
        |  st_astext(st_endpoint(line)) AS ep,
        |  st_astext(st_pointn(line, 2)) AS p2,
        |  st_astext(st_pointn(line, -1)) AS plast,
        |  st_pointn(line, 4) IS NULL AS oob_null,
        |  st_astext(st_reverse(line)) AS rev,
        |  st_startpoint(st_point(1.0, 2.0)) IS NULL AS point_sp_null
        |FROM (
        |  SELECT c_custkey, st_geomfromtext(concat('LINESTRING (0 0, ', x0, ' ', y0, ', ', x1, ' ', y1, ')')) AS line
        |  FROM (
        |    SELECT c_custkey,
        |      cast(c_custkey % 360 - 180 as bigint) AS x0,
        |      cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
        |      cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x1,
        |      cast((c_custkey * 7) % 160 - 80 + c_custkey % 10 + 1 as bigint) AS y1
        |    FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // st_snaptogrid (round-half-up grid), st_flipcoordinates (xy swap),
    // st_perimeter (all rings incl. holes) — every value closed-form exact
    "q107_snap_flip_perimeter" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  cast(st_perimeter(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) as double) AS per_env,
         |  st_perimeter(st_geomfromtext(
         |    'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))')) AS per_hole,
         |  st_perimeter(st_geomfromtext('LINESTRING (0 0, 3 4)')) AS per_line,
         |  st_x(st_snaptogrid(st_translate($custPt, 0.25, -0.25), 1.0)) AS snap_x,
         |  st_y(st_snaptogrid(st_translate($custPt, 0.25, -0.25), 1.0)) AS snap_y,
         |  st_x(st_snaptogrid(st_translate($custPt, 0.25, 0.25), 0.5)) AS snap_half_x,
         |  st_x(st_flipcoordinates($custPt)) AS flip_x,
         |  st_astext(st_flipcoordinates(st_flipcoordinates($custPt))) AS flip_roundtrip
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // benchmark decontamination: training docs sharing any exact 4-token
    // n-gram with the held-out eval slice (doc_id % 37 == 0); eval gram set
    // broadcasts, corpus side never shuffles on the gram
    "q108_decontaminate" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents")
      Dedup.decontaminate(
          docs.filter(col("doc_id") % 37 =!= 0),
          docs.filter(col("doc_id") % 37 === 0),
          "doc_id", "text", n = 4)
        .select(col("doc_id"), col("n_shared").cast("long").as("n_shared"), col("sample_gram"))
        .orderBy("doc_id")
    }),

    // lexical diversity: token entropy (order-independent decimal fold),
    // vocabulary, TTR, hapax count per document
    "q109_token_entropy" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      TextAnalysis.tokenEntropy(s.table("documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("vocab").cast("long").as("vocab"), col("hapax").cast("long").as("hapax"),
          col("ttr"), col("entropy"))
        .orderBy("doc_id")
    }),

    // per-source score normalization: percent_rank (exact rational) and
    // min-max position of the quality score within each source
    "q110_quality_norm" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      import org.apache.spark.sql.expressions.Window
      val scored = s.table("documents")
        .select(col("doc_id"), col("source"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
      val w = Window.partitionBy(col("source")).orderBy(col("quality"), col("doc_id"))
      val bySource = Window.partitionBy(col("source"))
      scored
        .withColumn("pr", round(percent_rank().over(w), 6) + lit(0.0))
        .withColumn("qmin", min(col("quality")).over(bySource))
        .withColumn("qmax", max(col("quality")).over(bySource))
        .select(col("doc_id"), col("source"), col("quality"), col("pr"),
          (round(when(col("qmax") === col("qmin"), 0.5)
            .otherwise((col("quality") - col("qmin")) / (col("qmax") - col("qmin"))), 6) + lit(0.0))
            .as("minmax"))
        .orderBy("doc_id")
    }),

    // linear referencing on the (0,0)->(x,y) chord: interpolate at 1/4,
    // locate a perpendicularly-offset probe (projection kills the offset =>
    // exactly 0.5), substring endpoints, and the distance+azimuth round-trip
    // through st_project recovering the far endpoint
    "q111_line_reference" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_x(st_lineinterpolatepoint(line, 0.25)), 6) + 0.0 AS ip_x,
         |  round(st_y(st_lineinterpolatepoint(line, 0.25)), 6) + 0.0 AS ip_y,
         |  round(st_linelocatepoint(line, st_point(x / 2 - y / 100, y / 2 + x / 100)), 6) + 0.0 AS loc_mid,
         |  round(st_linelocatepoint(line, st_point(x * 2, y * 2)), 6) + 0.0 AS loc_past,
         |  round(st_x(st_startpoint(st_linesubstring(line, 0.25, 0.75))), 6) + 0.0 AS sub_x0,
         |  round(st_x(st_endpoint(st_linesubstring(line, 0.25, 0.75))), 6) + 0.0 AS sub_x1,
         |  st_linesubstring(line, 0.75, 0.25) IS NULL AS sub_bad_null,
         |  round(st_x(st_project(st_point(0.0, 0.0),
         |    st_length(line), st_azimuth(st_point(0.0, 0.0), st_point(x, y)))), 6) + 0.0 AS proj_x,
         |  round(st_y(st_project(st_point(0.0, 0.0),
         |    st_length(line), st_azimuth(st_point(0.0, 0.0), st_point(x, y)))), 6) + 0.0 AS proj_y
         |FROM (
         |  SELECT c_custkey, $custX AS x, $custY AS y,
         |    st_geomfromtext(concat('LINESTRING (0 0, ',
         |      cast(c_custkey % 360 - 180 as bigint), ' ',
         |      cast((c_custkey * 7) % 160 - 80 as bigint), ')')) AS line
         |  FROM customer)
         |ORDER BY c_custkey""".stripMargin),

    // interior-ring accessors + geometry builders: makeline from points,
    // makepolygon from a closed ring, holes counted and extracted
    "q112_rings_makers" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_numinteriorrings(st_geomfromtext(
         |    'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))')) AS n_holes,
         |  st_numinteriorrings(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) AS env_holes,
         |  st_numinteriorrings($custPt) IS NULL AS pt_holes_null,
         |  st_astext(st_interiorringn(st_geomfromtext(
         |    'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'), 1)) AS hole1,
         |  st_interiorringn(st_geomfromtext(
         |    'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'), 2) IS NULL AS hole2_null,
         |  st_astext(st_makeline($custPt, st_point($custX + $custSide, $custY))) AS ml,
         |  cast(st_area(st_makepolygon(st_exteriorring(
         |    st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)))) as double) AS mp_area,
         |  st_makepolygon(st_geomfromtext('LINESTRING (0 0, 1 1)')) IS NULL AS open_null
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // deterministic weighted sampling without replacement (A-ES keys from
    // md5 uniforms, weight = document length): the top-20 keys are the
    // sample, identical across engines and partitionings
    "q113_weighted_sample" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      Corpus.weightedSampleN(s.table("documents"), "doc_id", "n_chars", 20)
        // order on the RAW key (matching the oracle); round only the output
        .orderBy(col("sample_key").desc, col("doc_id"))
        .select(col("doc_id"), col("n_chars"),
          (round(col("sample_key"), 6) + lit(0.0)).as("skey"))
    }),

    // near-dup cluster collapse: jaccard pair graph -> connected components
    // -> keep the highest-quality doc per cluster (the canonical post-pair
    // dedup step); exact oracle via DuckDB recursive CC + the same window
    "q114_dedup_keep_best" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
      val pairs = Dedup.tokenJaccardPairs(docs, "doc_id", "text",
        threshold = 0.8, maxDf = 100)
      Dedup.keepBestPerCluster(docs, "doc_id", pairs, "quality")
        .select(col("doc_id"), col("component").cast("long").as("component"),
          col("cluster_size").cast("long").as("cluster_size"), col("quality"))
        .orderBy("doc_id")
    }),

    // multi-level aggregation in one pass: ROLLUP over (returnflag,
    // linestatus) with grouping ids — subtotals and grand total from a
    // single shuffle (Spark expands grouping sets map-side)
    "q115_rollup" -> sqlQuery(Seq("lineitem"),
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as int) AS gid,
        |  cast(sum(cast(l_quantity as decimal(20,2))) as double) AS sum_qty,
        |  cast(count(*) as bigint) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls, gid""".stripMargin),

    // DBSCAN density clustering over md5-scattered integer points: grid
    // neighbor join (no O(n^2)), core/border/noise per classic semantics,
    // deterministic min-label border assignment; integer coords make every
    // distance comparison exact on both engines
    "q116_dbscan" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val pts = s.sql(
        """SELECT c_custkey AS id,
          |  cast(cast(conv(substring(md5(cast(c_custkey as string)), 1, 15), 16, 10) as bigint) % 80 as double) AS x,
          |  cast(cast(conv(substring(md5(cast(c_custkey as string)), 16, 15), 16, 10) as bigint) % 80 as double) AS y
          |FROM customer WHERE c_custkey <= 1200""".stripMargin)
      graft.spatial.Dbscan.cluster(pts, "id", "x", "y", eps = 2.0, minPts = 3)
        .select(col("id"), col("x"), col("y"), col("is_core"),
          col("cluster").cast("long").as("cluster"))
        .orderBy("id")
    }),

    // sliding (hopping) windows: 12h length, 6h slide — every event lands in
    // exactly two windows; one expand + one shuffle (Spark's window()
    // generator), the streaming-ready §2.10 shape evaluated in batch
    "q117_sliding_window" -> sqlQuery(Seq("events"),
      """SELECT window.start AS ws, event_type,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total
        |FROM events
        |GROUP BY window(ts, '12 hours', '6 hours'), event_type
        |ORDER BY ws, event_type""".stripMargin),

    // text-delimited interchange: write WKT + attributes as CSV, read back
    // with schema inference off (explicit schema), parse with
    // st_geomfromtext — the OGR CSV/WKT driver path of §2.1 read_file
    "q118_csv_wkt" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmp = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q118_csvwkt").getAbsolutePath
      s.read.parquet(s"$dir/customer.parquet")
        .selectExpr("c_custkey", s"st_astext($custPt) AS wkt", "c_acctbal")
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read
        .schema("c_custkey LONG, wkt STRING, c_acctbal DOUBLE")
        .option("header", "true").csv(tmp)
        .selectExpr("c_custkey",
          "st_x(st_geomfromtext(wkt)) AS gx",
          "st_y(st_geomfromtext(wkt)) AS gy",
          "c_acctbal")
        .orderBy("c_custkey")
    }),

    // curation text normalization: control-char strip + whitespace collapse
    // + Unicode NFC, exercised on deterministically-dirtied text (control
    // prefix, ragged spacing, decomposed e + U+0301 suffix); char counts
    // audit the cleanup on both engines
    "q119_normalize_text" -> sqlQuery(Seq("documents"),
      "SELECT doc_id, normalize_text(noisy) AS norm, " +
        "cast(length(noisy) as bigint) AS n_before, " +
        "cast(length(normalize_text(noisy)) as bigint) AS n_after " +
        "FROM (SELECT doc_id, concat('  ', text, '  café  ') AS noisy " +
        "FROM documents) ORDER BY doc_id"),

    // farthest-point pair (vertex-exact maxdistance/longestline), 3-point
    // clockwise angle, and segmentize densification with length preserved
    "q120_far_angle_segmentize" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_maxdistance($custPt,
         |    st_makeenvelope($custX + 2, $custY + 3, $custX + 2 + $custSide, $custY + 3 + $custSide)), 6) + 0.0 AS md,
         |  st_astext(st_longestline($custPt,
         |    st_makeenvelope($custX + 2, $custY + 3, $custX + 2 + $custSide, $custY + 3 + $custSide))) AS ll,
         |  round(st_angle(st_point($custX + $custSide, $custY), $custPt,
         |    st_point($custX + $custSide, $custY + 2)), 6) + 0.0 AS ang,
         |  st_angle($custPt, $custPt, st_point($custX + 1, $custY)) IS NULL AS ang_self_null,
         |  st_numpoints(st_segmentize(st_exteriorring(
         |    st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)), 1.0)) AS seg_n,
         |  round(st_length(st_segmentize(st_exteriorring(
         |    st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)), 1.0)), 6) + 0.0 AS seg_len,
         |  st_x(st_pointn(st_segmentize(st_geomfromtext('LINESTRING (0 0, 8 0)'), 2.0), 2)) AS seg_pt
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // native session_window operator (the streaming-capable session
    // aggregation; q68 is the window-lag batch formulation): sessions close
    // at last_event + gap, so an event exactly gap later starts a new one
    "q121_session_window" -> sqlQuery(Seq("events"),
      """SELECT user_id, session_window.start AS ss, session_window.end AS se,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total
        |FROM events
        |GROUP BY session_window(ts, '6 hours'), user_id
        |ORDER BY user_id, ss""".stripMargin),

    // SQ8 scalar quantization ANN: exact per-dimension min/max train scan,
    // int8 codes, decoded-cosine top-k (raw vectors never read at query
    // time) — the cheapest-train member of the quantization family
    // (PQ q84, IVF q52, IVF-PQ q93); decode arithmetic is bit-identical
    // on both engines so the oracle is exact
    "q122_sq8_ann" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val (mins, maxs) = Similarity.trainSqRange(emb, "embedding", 64)
      val coded = emb.select(col("vec_id"),
        Similarity.sqEncodeCol(col("embedding"), mins, maxs).as("sq_code"))
      Similarity.sqTopK(coded, "vec_id", "sq_code", mins, maxs, queryVec, 10)
        .select(col("vec_id"), (round(col("sq_cosine"), 6) + lit(0.0)).as("cosine"))
    }),

    // collection accessors: part counts, 1-based part extraction, typed
    // collection filtering over per-row synthesized multi-geometries
    "q123_collection_ops" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_numgeometries(mp) AS ng_mp,
        |  st_numgeometries(st_point(1.0, 2.0)) AS ng_point,
        |  st_astext(st_geometryn(mp, 2)) AS g2,
        |  st_geometryn(mp, 4) IS NULL AS g_oob_null,
        |  st_astext(st_collectionextract(gc, 1)) AS ce_points,
        |  st_astext(st_collectionextract(gc, 2)) AS ce_lines,
        |  st_collectionextract(gc, 3) IS NULL AS ce_poly_null
        |FROM (
        |  SELECT c_custkey,
        |    st_geomfromtext(concat('MULTIPOINT ((', x0, ' ', y0, '), (0 0), (7 7))')) AS mp,
        |    st_geomfromtext(concat('GEOMETRYCOLLECTION (POINT (', x0, ' ', y0,
        |      '), LINESTRING (0 0, 1 1), POINT (5 5))')) AS gc
        |  FROM (
        |    SELECT c_custkey,
        |      cast(c_custkey % 360 - 180 as bigint) AS x0,
        |      cast((c_custkey * 7) % 160 - 80 as bigint) AS y0
        |    FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // trajectory construction: st_makeline_agg orders each user's event
    // points by the sort key inside a standard two-phase aggregation —
    // partial buffers ship (key, coords) pairs, the sort happens once at
    // final eval, so the line is deterministic under any partitioning
    "q124_trajectory" -> sqlQuery(Seq("events"),
      """SELECT user_id,
        |  st_astext(st_makeline_agg(
        |    st_point(cast(event_id % 100 as double), cast((event_id * 3) % 100 as double)),
        |    event_id)) AS traj,
        |  cast(count(*) as bigint) AS n,
        |  round(st_length(st_makeline_agg(
        |    st_point(cast(event_id % 100 as double), cast((event_id * 3) % 100 as double)),
        |    event_id)), 6) + 0.0 AS traj_len
        |FROM events
        |WHERE event_id % 50 = 0
        |GROUP BY user_id
        |HAVING count(*) >= 2
        |ORDER BY user_id""".stripMargin),

    // composed geo-analytics: broadcast spatial join (planner strategy, not
    // BNLJ) x tumbling time windows x aggregation — "events near POIs per
    // day", the canonical geospatial dashboard query. Strict-interior
    // st_contains semantics: events on a strip boundary belong to no strip
    "q125_events_in_regions" -> sqlQuery(Seq("events", "region"),
      """SELECT r.r_regionkey AS box, window.start AS ws,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(e.value as decimal(20,2))) as double) AS total
        |FROM (SELECT ts, value,
        |        st_point(cast(event_id % 220 - 110 as double),
        |                 cast((event_id * 7) % 160 - 80 as double)) AS pt
        |      FROM events) e
        |JOIN (SELECT r_regionkey,
        |        st_makeenvelope(cast(r_regionkey * 40 - 100 as double), -50.0,
        |                        cast(r_regionkey * 40 - 60 as double), 50.0) AS box
        |      FROM region) r
        |  ON st_contains(r.box, e.pt)
        |GROUP BY r.r_regionkey, window(e.ts, '24 hours')
        |ORDER BY box, ws""".stripMargin),

    // window-function breadth beyond row_number (q3): ntile buckets,
    // lag/lead neighbors, first/last frame values — one shuffle on the
    // partition key, deterministic via the (acctbal, custkey) tie-break
    "q126_window_breadth" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  cast(ntile(4) OVER w as int) AS quartile,
        |  lag(c_acctbal) OVER w AS prev_bal,
        |  lead(c_acctbal) OVER w AS next_bal,
        |  first_value(c_acctbal) OVER w AS min_bal,
        |  last_value(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS max_bal,
        |  cast(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY c_nationkey) as bigint) AS n_pos
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // FILTER-clause conditional aggregation (one scan, no self-joins):
    // per-nation mix of balance bands and segment-restricted sums
    "q127_filter_agg" -> sqlQuery(Seq("customer"),
      """SELECT c_nationkey,
        |  cast(count(*) as bigint) AS n,
        |  cast(count(*) FILTER (WHERE c_acctbal > 0) as bigint) AS n_pos,
        |  cast(count(*) FILTER (WHERE c_acctbal <= 0) as bigint) AS n_nonpos,
        |  cast(sum(cast(c_acctbal as decimal(20,2))) FILTER (WHERE c_mktsegment = 'BUILDING')
        |    as double) AS bal_building,
        |  cast(count(DISTINCT c_mktsegment) as bigint) AS n_segments
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin),

    // square-grid tessellation generator + explode: every origin-aligned
    // unit cell overlapping the envelope, counted and measured — the cell
    // layer under the grid joins (q44/q56) exposed as its own operator
    "q128_squaregrid" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  cast(count(*) as bigint) AS n_cells,
         |  cast(sum(st_area(cell)) as double) AS area_total,
         |  min(st_xmin(cell)) AS mnx,
         |  max(st_xmax(cell)) AS mxx,
         |  min(st_ymin(cell)) AS mny,
         |  max(st_ymax(cell)) AS mxy
         |FROM (
         |  SELECT c_custkey, explode(st_squaregrid($custX, $custY,
         |    $custX + $custSide, $custY + $custSide, 1.0)) AS cell
         |  FROM customer)
         |GROUP BY c_custkey
         |ORDER BY c_custkey""".stripMargin),

    // §2.7 JSON scalar functions (inherited surface, demonstrated): extract
    // the numeric payload from the event props JSON and aggregate it
    "q129_json_props" -> sqlQuery(Seq("events"),
      """SELECT event_type,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(get_json_object(props, '$.k') as bigint)) as bigint) AS k_sum,
        |  cast(min(cast(get_json_object(props, '$.k') as bigint)) as bigint) AS k_min,
        |  cast(max(cast(get_json_object(props, '$.k') as bigint)) as bigint) AS k_max,
        |  cast(count(DISTINCT cast(get_json_object(props, '$.k') as bigint)) as bigint) AS k_distinct
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin),

    // §2.7 array higher-order functions (inherited surface, demonstrated):
    // sort/distinct/slice/transform/aggregate/reverse over token arrays
    "q130_array_breadth" -> sqlQuery(Seq("documents"),
      """SELECT doc_id,
        |  array_join(slice(sort_array(array_distinct(toks)), 1, 3), '|') AS first_sorted,
        |  cast(size(array_distinct(toks)) as int) AS n_distinct,
        |  cast(aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x) as bigint)
        |    AS total_len,
        |  array_contains(toks, 'the') AS has_the,
        |  CASE WHEN size(toks) >= 2 THEN concat(element_at(toks, 1), '>', element_at(toks, 2))
        |       ELSE NULL END AS first_bigram,
        |  array_join(reverse(slice(toks, 1, 3)), '|') AS rev3
        |FROM (SELECT doc_id, filter(split(trim(text), '\\s+'), t -> t != '') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin),

    // §2.7 date/time scalar breadth over order dates: trunc, extract,
    // arithmetic, diffs — the temporal slice of the inherited surface
    "q131_datetime_breadth" -> sqlQuery(Seq("orders"),
      """SELECT o_orderkey,
        |  cast(date_trunc('month', o_orderdate) as date) AS month_start,
        |  cast(year(o_orderdate) as int) AS yr,
        |  cast(quarter(o_orderdate) as int) AS qtr,
        |  cast(dayofweek(o_orderdate) as int) AS dow,
        |  cast(add_months(cast(o_orderdate as date), 3) as date) AS plus3m,
        |  cast(datediff(cast(o_orderdate as date), DATE '1995-01-01') as int) AS days_since,
        |  cast(last_day(o_orderdate) as date) AS month_end
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin),

    // §2.7 string scalar breadth: edit distance (the fuzzy-match primitive
    // deduplication pipelines threshold on), padding, translate, repeat
    "q132_string_breadth" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  cast(levenshtein(c_name, 'Customer#000000001') as int) AS lev,
        |  lpad(cast(c_custkey as string), 12, '0') AS padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
        |  substring(repeat(c_mktsegment, 2), 1, 12) AS seg2,
        |  upper(substring(c_name, 1, 8)) AS name_up,
        |  cast(length(replace(c_name, '0', '')) as int) AS len_no_zero
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    // discrete Hausdorff distance: congruent-translation envelopes have
    // H = |shift| closed-form; point-vs-box degenerates to maxdistance
    "q133_hausdorff" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_hausdorffdistance(
         |    st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide),
         |    st_translate(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide), 2.0, 3.0)), 6) + 0.0
         |    AS hd_shift,
         |  round(st_hausdorffdistance($custPt,
         |    st_makeenvelope($custX + 2, $custY + 3, $custX + 2 + $custSide, $custY + 3 + $custSide)), 6) + 0.0
         |    AS hd_pt,
         |  st_hausdorffdistance($custPt, $custPt) AS hd_self
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // normalization-aware dedup: whitespace-mangled re-posts collapse onto
    // their originals once normalize_text canonicalizes them — the
    // composition that makes q119's kernel a dedup primitive
    "q134_normalized_dedup" -> sqlQuery(Seq("documents"),
      """SELECT md5(norm) AS h,
        |  cast(count(*) as bigint) AS dup_count,
        |  min(doc_id) AS representative
        |FROM (
        |  SELECT doc_id, normalize_text(text) AS norm FROM (
        |    SELECT doc_id, text FROM documents
        |    UNION ALL
        |    SELECT doc_id + 1000000, concat('  ', replace(text, ' ', '   '), ' ')
        |    FROM documents))
        |GROUP BY md5(norm)
        |HAVING count(*) > 1
        |ORDER BY h""".stripMargin),

    // closure containment vs interior containment: corners and edges are
    // covered but not contained; coveredby is the converse
    "q135_covers" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_covers(env, $custPt) AS corner_covered,
         |  st_contains(env, $custPt) AS corner_contained,
         |  st_covers(env, st_point($custX + $custSide / 2, $custY)) AS edge_covered,
         |  st_contains(env, st_point($custX + $custSide / 2, $custY)) AS edge_contained,
         |  st_covers(env, st_point($custX + $custSide / 2, $custY + $custSide / 2)) AS mid_covered,
         |  st_covers(env, st_point($custX - 1, $custY)) AS outside_covered,
         |  st_coveredby($custPt, env) AS corner_coveredby,
         |  st_covers(st_geomfromtext(concat('LINESTRING (0 0, ',
         |    cast(c_custkey % 360 - 180 as bigint), ' ',
         |    cast((c_custkey * 7) % 160 - 80 as bigint), ')')), $custPt) AS line_covers_end
         |FROM (
         |  SELECT c_custkey,
         |    st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide) AS env
         |  FROM customer)
         |ORDER BY c_custkey""".stripMargin),

    // statistical aggregate breadth: correlation, covariance, stddev,
    // variance per group (both engines use numerically-stable one-pass
    // forms; round(6) absorbs the last-ulp reorder noise)
    "q136_stats_agg" -> sqlQuery(Seq("lineitem"),
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qp,
        |  round(covar_samp(l_quantity, l_discount), 6) + 0.0 AS cov_qd,
        |  round(stddev_samp(l_quantity), 6) + 0.0 AS sd_q,
        |  round(var_samp(l_discount), 6) + 0.0 AS var_d,
        |  round(avg(l_tax), 6) + 0.0 AS avg_tax
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // unpivot (stack): wide balance columns to long (metric, value) rows —
    // the relational reshape op, one generate, no shuffle before the sort
    "q137_unpivot" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey, metric, val
        |FROM (
        |  SELECT c_custkey,
        |    stack(3,
        |      'acctbal', c_acctbal,
        |      'acct2x', c_acctbal * 2,
        |      'acct_abs', abs(c_acctbal)) AS (metric, val)
        |  FROM customer)
        |ORDER BY c_custkey, metric""".stripMargin),

    // deterministic mixture UPSAMPLING (multi-epoch): weight 2.5 => every
    // doc twice plus the md5-selected half a third time — same replicas on
    // every engine; the epochs-per-source knob of corpus assembly
    "q138_upsample" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      Corpus.upsample(s.table("documents"), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 1.0))
        .select(col("doc_id"), col("source"), col("copy").cast("int").as("copy"))
        .orderBy("doc_id", "copy")
    }),

    // vocabulary construction + numericalization: deterministic top-100
    // token vocab (count desc, token asc), docs encoded to id sequences
    // with OOV = -1 — the tokenizer front half of a training pipeline
    "q139_encode_ids" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val docs = s.table("documents")
      val vocab = TextAnalysis.buildVocab(docs, "text", 100)
      TextAnalysis.encodeIds(docs, "doc_id", "text", vocab)
        .select(col("doc_id"), array_join(col("ids"), ",").as("ids_str"),
          size(col("ids")).cast("int").as("n_ids"))
        .orderBy("doc_id")
    }),

    // ordered pagination — the reference read_file's skip_features /
    // max_features slice (§2.1) as LIMIT/OFFSET over a deterministic sort
    "q140_pagination" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |ORDER BY c_custkey
        |LIMIT 50 OFFSET 100""".stripMargin),

    // st_expand: bbox grow/shrink — the search-window builder for window
    // queries (expand + intersects = dwithin on boxes); closed-form areas
    "q141_expand" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  cast(st_area(st_expand(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide), 2.0)) as double) AS grown,
         |  cast(st_area(st_expand($custPt, 1.0)) as double) AS pt_box,
         |  st_contains(st_expand(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide), 2.0),
         |    st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide)) AS contains_orig,
         |  st_expand(st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide), -6.0) IS NULL
         |    AS shrink_null
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // rolling window analytics: RANGE frame over event-time seconds (the
    // moving-aggregate shape) with an exact decimal fold, plus cume_dist
    "q142_rolling" -> sqlQuery(Seq("events"),
      """SELECT event_id, user_id,
        |  cast(sum(cast(value as decimal(20,2))) OVER (
        |    PARTITION BY user_id ORDER BY unix_timestamp(ts)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as double) AS rolling_1h,
        |  cast(count(*) OVER (
        |    PARTITION BY user_id ORDER BY unix_timestamp(ts)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as bigint) AS n_1h,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) + 0.0
        |    AS cd
        |FROM events
        |WHERE user_id < 50
        |ORDER BY user_id, event_id""".stripMargin),

    // great-circle point distance (sphere): equator/meridian arcs have
    // closed-form haversine values shared with the q17 oracle formula
    "q143_sphere_distance" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_distancesphere(st_point(0.0, 0.0), $custPt), 2) + 0.0 AS d_origin,
         |  round(st_distancesphere($custPt, st_point($custX, $custY + 1)), 2) + 0.0 AS d_north1,
         |  st_distancesphere($custPt, $custPt) AS d_self,
         |  st_distancesphere($custPt, st_makeenvelope(0.0, 0.0, 1.0, 1.0)) IS NULL AS non_point_null
         |FROM customer ORDER BY c_custkey""".stripMargin),

    // dashboard composition: per-day top-3 event types by count (window
    // agg -> rank -> filter), the windowed heavy-hitter report
    "q144_window_topk" -> sqlQuery(Seq("events"),
      """SELECT ws, event_type, n, rk FROM (
        |  SELECT ws, event_type, n,
        |    cast(row_number() OVER (PARTITION BY ws ORDER BY n DESC, event_type) as int) AS rk
        |  FROM (
        |    SELECT window.start AS ws, event_type, cast(count(*) as bigint) AS n
        |    FROM events GROUP BY window(ts, '24 hours'), event_type))
        |WHERE rk <= 3
        |ORDER BY ws, rk""".stripMargin),

    // set-op multiplicity semantics: INTERSECT ALL / EXCEPT ALL keep
    // duplicate cardinalities (q5 covers the DISTINCT forms)
    "q145_setop_all" -> sqlQuery(Seq("lineitem"),
      """SELECT l_suppkey, cast(count(*) as bigint) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 10.0)
        |GROUP BY l_suppkey
        |UNION ALL
        |SELECT -1 AS l_suppkey, cast(count(*) as bigint) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 10.0)
        |ORDER BY l_suppkey, n""".stripMargin),

    // null semantics: null-safe equality, NULLS FIRST/LAST ordering,
    // coalesce/nullif/nvl2 over a column with injected nulls. The global
    // LAG/row_number windows are the POINT of this semantics demo; a
    // production global ordering would TakeOrdered+limit or range-partition
    "q146_null_semantics" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  b <=> LAG(b) OVER (ORDER BY c_custkey) AS same_as_prev,
        |  coalesce(b, -999.0) AS b_filled,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  CASE WHEN b IS NULL THEN 'missing' ELSE 'present' END AS presence,
        |  cast(row_number() OVER (ORDER BY b ASC NULLS FIRST, c_custkey) as int) AS rn_nf
        |FROM (
        |  SELECT c_custkey, c_mktsegment,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS b
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin),

    // one-scan column profiling: per-column non-null/distinct/min/max plus
    // the row count, from a single wide aggregate unpivoted with stack()
    // sketch-default profiling: n_distinct is the deterministic HLL
    // estimate (one map-side-combinable pass; no per-column expand-distinct
    // shuffle — the shape that survives 100 TB). o_totalprice profiles
    // through a decimal cast so the md5-hashed key strings are identical
    // byte-for-byte in both engines.
    "q147_profile" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "orders")
      graft.relational.Profile.profile(
          s.table("orders")
            .withColumn("o_totalprice", col("o_totalprice").cast("decimal(12,2)")),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("col_name")
    }),

    // CDC merge: fold an upsert/delete change stream into a snapshot with
    // one union + one key-window shuffle (latest seq wins, delete beats
    // upsert at equal seq) — the lakehouse ingest MERGE
    "q148_cdc_merge" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val base = s.sql("SELECT doc_id, n_chars FROM documents")
      val changes = s.sql(
        """SELECT doc_id, n_chars + 1000 AS n_chars, 'U' AS op, 1L AS seq
          |FROM documents WHERE doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id, cast(NULL as bigint), 'D', 2L
          |FROM documents WHERE doc_id % 7 = 0
          |UNION ALL
          |SELECT doc_id + 500000, cast(doc_id as bigint), 'U', 1L
          |FROM documents WHERE doc_id % 11 = 0""".stripMargin)
      graft.relational.Cdc.applyChanges(base, changes, "doc_id", "seq", "op")
        .orderBy("doc_id")
    }),

    // format-interop capstone: one dataset carried through Shapefile ->
    // GeoPackage -> Arrow IPC, geometry and attributes surviving every hop
    // bit-for-bit (the per-format roundtrips are q99/q60/q59)
    "q149_format_chain" -> ((s: SparkSession, dir: String) => {
      init(s)
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_q149_chain").toFile
      tmpDir.deleteOnExit()
      val shpBase = new java.io.File(tmpDir, "shp/cust").getAbsolutePath
      new java.io.File(tmpDir, "shp").mkdirs()
      val gpkg = new java.io.File(tmpDir, "cust.gpkg").getAbsolutePath
      val arrowDir = new java.io.File(tmpDir, "arrow").getAbsolutePath
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") <= 500)
        .selectExpr("c_custkey", "c_name", s"$custPt AS geometry")
        .orderBy("c_custkey")
      graft.sources.Shapefile.write(cust, shpBase, "geometry")
      val fromShp = graft.api.GeoIO.readShapefile(s, new java.io.File(tmpDir, "shp").getAbsolutePath).df
        .selectExpr("cast(c_custkey as bigint) AS c_custkey", "c_name", "geometry")
      graft.sources.GeoPackage.write(fromShp, gpkg, "geometry", tableName = "chain")
      val fromGpkg = graft.api.GeoIO.readGeoPackage(s, tmpDir.getAbsolutePath).df
        .selectExpr("c_custkey", "c_name", "geometry")
      graft.sources.ArrowIPC.write(fromGpkg, arrowDir)
      graft.sources.ArrowIPC.read(s, arrowDir)
        .selectExpr("cast(c_custkey as bigint) AS c_custkey", "c_name",
          "st_x(geometry) AS gx", "st_y(geometry) AS gy")
        .orderBy("c_custkey")
    }),

    // geo-analytics capstone: session_window sessions x per-session event
    // trajectories (st_makeline_agg ordered by event sequence) x planar
    // length — movement analytics in one grouped aggregation
    "q150_session_trajectories" -> sqlQuery(Seq("events"),
      """SELECT user_id, session_window.start AS ss,
        |  cast(count(*) as bigint) AS n,
        |  st_astext(st_makeline_agg(st_point(px, py), event_id)) AS traj,
        |  coalesce(round(st_length(st_makeline_agg(st_point(px, py), event_id)), 6) + 0.0, -1.0)
        |    AS traj_len
        |FROM (
        |  SELECT user_id, ts, event_id,
        |    cast(event_id % 220 - 110 as double) AS px,
        |    cast((event_id * 7) % 160 - 80 as double) AS py
        |  FROM events WHERE user_id < 40)
        |GROUP BY session_window(ts, '6 hours'), user_id
        |ORDER BY user_id, ss""".stripMargin),

    // DE-9IM predicate family over constructed configurations whose truth is
    // decidable from c_custkey % 4 (d = m*5 shifts a box/line/point from
    // equal -> overlapping -> edge-touching -> disjoint relative to box a)
    "q151_de9im_predicates" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_equals(a, b) AS eq_ab,
         |  st_overlaps(a, b) AS ov_ab,
         |  st_touches(a, b) AS tch_ab,
         |  st_disjoint(a, b) AS dj_ab,
         |  st_touches(lv, a) AS tch_lva,
         |  st_crosses(lv, a) AS cr_lva,
         |  st_crosses(lv, lh) AS cr_lvlh,
         |  st_overlaps(lh, lh3) AS ov_lh3,
         |  st_equals(lh, st_reverse(lh)) AS eq_rev,
         |  st_touches(p, a) AS tch_pa,
         |  st_crosses(mp, a) AS cr_mpa
         |FROM (
         |  SELECT c_custkey,
         |    st_makeenvelope(x, y, x + 10.0, y + 10.0) AS a,
         |    st_makeenvelope(x + d, y, x + d + 10.0, y + 10.0) AS b,
         |    st_geomfromtext(concat('LINESTRING (', x + d, ' ', y - 1.0, ', ', x + d, ' ', y + 11.0, ')')) AS lv,
         |    st_geomfromtext(concat('LINESTRING (', x - 1.0, ' ', y + 5.0, ', ', x + 11.0, ' ', y + 5.0, ')')) AS lh,
         |    st_geomfromtext(concat('LINESTRING (', x + d, ' ', y + 5.0, ', ', x + 20.0, ' ', y + 5.0, ')')) AS lh3,
         |    st_point(x + d, y + 5.0) AS p,
         |    st_geomfromtext(concat('MULTIPOINT ((', x + d, ' ', y + 5.0, '), (', x + 20.0, ' ', y + 20.0, '))')) AS mp
         |  FROM (SELECT c_custkey, $custX AS x, $custY AS y,
         |        cast(c_custkey % 4 as double) * 5.0 AS d FROM customer))
         |ORDER BY c_custkey""".stripMargin),

    // exact interpolated quantiles (Spark percentile = DuckDB quantile_cont,
    // both (n-1)*p linear interpolation) — the distributed sort-based path
    // exact grouped percentiles via relational/Quantiles (range-sort +
    // offset ranks, bit-identical to the built-in `percentile` — see
    // QuantilesSpec differential tests). The built-in's per-group
    // distinct-value map state is the 100 TB OOM shape this replaces.
    "q152_percentiles" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "lineitem")
      val li = s.table("lineitem")
      // one range sort for both measures: allPs = [0.25, 0.5, 0.75, 0.9]
      val (allPs, stacked) = graft.relational.Quantiles.exactPercentilesStacked(
        li, Seq("l_returnflag"),
        Seq("l_extendedprice" -> Seq(0.25, 0.5, 0.75), "l_quantity" -> Seq(0.9)))
      def pick(measure: String, p: Double): org.apache.spark.sql.Column =
        max(when(col("__col") === measure, col(s"p${allPs.indexOf(p)}")))
      stacked.groupBy("l_returnflag")
        .agg((round(pick("l_extendedprice", 0.25), 6) + lit(0.0)).as("p25"),
          (round(pick("l_extendedprice", 0.5), 6) + lit(0.0)).as("p50"),
          (round(pick("l_extendedprice", 0.75), 6) + lit(0.0)).as("p75"),
          (round(pick("l_extendedprice", 0.5), 6) + lit(0.0)).as("med"),
          (round(pick("l_quantity", 0.9), 6) + lit(0.0)).as("q90"))
        .orderBy("l_returnflag")
    }),

    // PII scrub pass for a training corpus: detect + redact emails, phone
    // numbers, IPv4s (deterministically injected so the regexes are
    // exercised on every row); md5 certifies byte-identical redaction
    "q153_pii_scrub" -> sqlQuery(Seq("documents"),
      """SELECT doc_id,
        |  size(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS n_email,
        |  size(regexp_extract_all(aug, '\\b555-[0-9]{4}\\b', 0)) AS n_phone,
        |  size(regexp_extract_all(aug, '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b', 0)) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
        |        '\\b555-[0-9]{4}\\b', '<PHONE>'),
        |        '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b', '<IP>')) AS scrub_md5
        |FROM (
        |  SELECT doc_id, concat(substr(text, 1, 40), ' contact user', doc_id,
        |    '@example.com or admin@test.org tel 555-01', doc_id % 90 + 10,
        |    ' ip 10.1.', doc_id % 256, '.7 end') AS aug
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin),

    // CUBE grouping sets + GROUPING() markers (completes ROLLUP q115)
    "q154_cube_grouping" -> sqlQuery(Seq("lineitem"),
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
        |  cast(count(*) as bigint) AS n,
        |  round(sum(l_quantity), 6) + 0.0 AS sq
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin),

    // TF-IDF top-3 terms per document: tokenize -> tf -> df (broadcastable
    // term table) -> score = tf * (ln((N+1)/(df+1)) + 1), window top-k;
    // integers (tf, df, rank) carry the exactness, score rounded to 4
    "q155_tfidf_topterms" -> sqlQuery(Seq("documents"),
      """WITH tok AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, explode(filter(split(lower(text), '[^a-z]+'),
        |                                  x -> length(x) >= 3)) AS term
        |    FROM documents WHERE doc_id < 2000)),
        |tf AS (SELECT doc_id, term, cast(count(*) as bigint) AS tf
        |       FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, cast(count(*) as bigint) AS df
        |       FROM tf GROUP BY term),
        |n AS (SELECT cast(count(*) as double) AS n
        |      FROM documents WHERE doc_id < 2000),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * (log((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, rnk, round(score, 4) + 0.0 AS score
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, term) AS rnk FROM scored)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin),

    // Delaunay triangulation invariants with a closed-form oracle: n points
    // on a parabola (strictly convex => all on hull, no cocircular quads)
    // plus optionally one interior point. Any triangulation has
    // 2N - 2 - hull_points triangles tiling the hull, whose area is
    // n(n-1)(n-2)/6 scaled by the x stretch.
    "q156_delaunay" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_numgeometries(d) AS n_tri,
        |  round(st_area(d), 6) + 0.0 AS tri_area
        |FROM (
        |  SELECT c_custkey, st_delaunaytriangles(st_geomfromtext(mp)) AS d
        |  FROM (
        |    SELECT c_custkey,
        |      concat('MULTIPOINT (',
        |        array_join(transform(sequence(0, n - 1),
        |          i -> concat('(', cast(i as double) * sx, ' ', cast(i * i as double), ')')), ', '),
        |        CASE WHEN f = 1
        |             THEN concat(', (', 1.25 * sx, ' ', cast(n - 2 as double), ')')
        |             ELSE '' END,
        |        ')') AS mp
        |    FROM (SELECT c_custkey,
        |            4 + c_custkey % 5 AS n,
        |            cast(c_custkey % 2 as int) AS f,
        |            cast(c_custkey % 3 + 1 as double) AS sx
        |          FROM customer WHERE c_custkey <= 600)))
        |ORDER BY c_custkey""".stripMargin),

    // Voronoi tiling invariants: k distinct in-rect sites => k cells whose
    // areas sum to the clip rectangle exactly
    "q157_voronoi" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_numgeometries(v) AS n_cells,
        |  round(st_area(v), 6) + 0.0 AS cell_area
        |FROM (
        |  SELECT c_custkey,
        |    st_voronoipolygons(st_geomfromtext(concat('MULTIPOINT (',
        |      array_join(transform(sequence(0, k - 1),
        |        i -> concat('(', cast(1 + (7 * i) % 9 as double), ' ',
        |                    cast(1 + (5 * i) % 9 as double), ')')), ', '),
        |      ')')), 0.0, 0.0, 10.0, 10.0) AS v
        |  FROM (SELECT c_custkey, 3 + c_custkey % 4 AS k
        |        FROM customer WHERE c_custkey <= 600))
        |ORDER BY c_custkey""".stripMargin),

    // web-corpus URL hygiene: canonicalization (lowercase host, strip
    // fragment + utm_* params, drop www.) and per-domain dedup stats
    "q158_url_canon" -> sqlQuery(Seq("orders"),
      """WITH u AS (
        |  SELECT concat('https://',
        |    CASE cast(o_orderkey % 4 as int) WHEN 0 THEN 'WWW.Example.COM'
        |         WHEN 1 THEN 'docs.example.com'
        |         WHEN 2 THEN 'Blog.Test.ORG' ELSE 'cdn.test.org' END,
        |    '/p/', o_orderkey % 50,
        |    CASE cast(o_orderkey % 3 as int)
        |         WHEN 0 THEN concat('?utm_source=x&id=', o_orderkey % 7)
        |         WHEN 1 THEN concat('?id=', o_orderkey % 7) ELSE '' END,
        |    CASE WHEN o_orderkey % 2 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM orders WHERE o_orderkey <= 20000),
        |c AS (
        |  SELECT url, lower(regexp_extract(url, 'https?://([^/]+)', 1)) AS host,
        |    concat(lower(regexp_extract(url, 'https?://([^/]+)', 1)),
        |           regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1),
        |           CASE WHEN url rlike '[?&]id=' THEN
        |             concat('?id=', regexp_extract(url, 'id=([0-9]+)', 1)) ELSE '' END) AS canon
        |  FROM u)
        |SELECT regexp_replace(host, '^www\\.', '') AS domain,
        |  regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS reg_domain,
        |  cast(count(*) as bigint) AS n_urls,
        |  cast(count(distinct canon) as bigint) AS n_canon
        |FROM c GROUP BY domain, reg_domain ORDER BY domain""".stripMargin),

    // BM25 (k1=1.2, b=0.75) retrieval over the documents table for a fixed
    // query; per-term contributions summed in a fixed column order so the
    // float result is engine-stable; ranking tie-broken by doc_id
    "q159_bm25" -> sqlQuery(Seq("documents"),
      """WITH tok AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, explode(split(lower(text), '[^a-z]+')) AS term
        |    FROM documents WHERE doc_id < 2000) WHERE term != ''),
        |pd AS (SELECT doc_id, cast(count(*) as double) AS dl,
        |         cast(sum(CASE WHEN term = 'query'  THEN 1 ELSE 0 END) as double) AS tfq,
        |         cast(sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) as double) AS tfv,
        |         cast(sum(CASE WHEN term = 'merge'  THEN 1 ELSE 0 END) as double) AS tfm
        |       FROM tok GROUP BY doc_id),
        |st AS (SELECT cast(count(*) as double) AS n, avg(dl) AS avgdl FROM pd),
        |df AS (SELECT cast(sum(CASE WHEN tfq > 0 THEN 1 ELSE 0 END) as double) AS dfq,
        |         cast(sum(CASE WHEN tfv > 0 THEN 1 ELSE 0 END) as double) AS dfv,
        |         cast(sum(CASE WHEN tfm > 0 THEN 1 ELSE 0 END) as double) AS dfm
        |       FROM pd),
        |sc AS (
        |  SELECT pd.doc_id,
        |    log((st.n - df.dfq + 0.5) / (df.dfq + 0.5) + 1.0) * pd.tfq * 2.2
        |      / (pd.tfq + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
        |    log((st.n - df.dfv + 0.5) / (df.dfv + 0.5) + 1.0) * pd.tfv * 2.2
        |      / (pd.tfv + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
        |    log((st.n - df.dfm + 0.5) / (df.dfm + 0.5) + 1.0) * pd.tfm * 2.2
        |      / (pd.tfm + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) AS score,
        |    cast(pd.tfq as bigint) AS tfq, cast(pd.tfv as bigint) AS tfv,
        |    cast(pd.tfm as bigint) AS tfm, cast(pd.dl as bigint) AS dl
        |  FROM pd CROSS JOIN st CROSS JOIN df
        |  WHERE pd.tfq + pd.tfv + pd.tfm > 0)
        |-- global top-20 via ORDER BY + LIMIT (TakeOrderedAndProject:
        |-- per-partition heaps), rank assigned on the 20-row set
        |SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
        |  doc_id, tfq, tfv, tfm, dl, round(score, 4) + 0.0 AS score
        |FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 20)
        |ORDER BY rnk""".stripMargin),

    // geometry hygiene: linemerge chain reassembly (canonical orientation),
    // fork preservation, repeated-point removal, precision reduction
    "q160_geo_hygiene" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_astext(st_linemerge(st_geomfromtext(concat(
        |    'MULTILINESTRING ((', d, ' 0, 0 0), (', d, ' ', d, ', ', d, ' 0), (',
        |    d, ' ', d, ', ', 2 * d, ' ', d, '))')))) AS merged,
        |  st_numgeometries(st_linemerge(st_geomfromtext(concat(
        |    'MULTILINESTRING ((0 0, ', d, ' ', d, '), (', 2 * d, ' 0, ', d, ' ', d,
        |    '), (', d, ' ', d, ', ', d, ' ', 3 * d, '))')))) AS y_parts,
        |  st_astext(st_removerepeatedpoints(st_geomfromtext(concat(
        |    'LINESTRING (0 0, 0 0, ', d, ' 0, ', d, ' 0, ', d, ' ', d, ')')))) AS dedup,
        |  st_astext(st_reduceprecision(st_geomfromtext(concat(
        |    'LINESTRING (0.25 0.75, ', d, '.25 0.75, ', d, '.25 0.75001, ',
        |    2 * d, '.4 ', d, '.6)')), 1.0)) AS redu
        |FROM (SELECT c_custkey, c_custkey % 5 + 1 AS d
        |      FROM customer WHERE c_custkey <= 800)
        |ORDER BY c_custkey""".stripMargin),

    // Gopher-style repetition quality signals: duplicate-token fraction and
    // top-bigram mass per document (deterministic lexicographic tie-break)
    "q161_repetition_signals" -> sqlQuery(Seq("documents"),
      """WITH base AS (
        |  SELECT doc_id, filter(split(lower(text), '[^a-z]+'), x -> x != '') AS toks
        |  FROM documents WHERE doc_id < 3000),
        |uni AS (
        |  SELECT doc_id, cast(size(toks) as bigint) AS n_tok,
        |         cast(size(array_distinct(toks)) as bigint) AS n_uniq
        |  FROM base),
        |big AS (
        |  SELECT doc_id, bg, cast(count(*) as bigint) AS c
        |  FROM (SELECT doc_id, explode(transform(sequence(0, size(toks) - 2),
        |          i -> concat(toks[i], ' ', toks[i + 1]))) AS bg
        |        FROM base WHERE size(toks) >= 2)
        |  GROUP BY doc_id, bg),
        |top AS (
        |  SELECT doc_id, bg AS top_bigram, c,
        |    sum(c) OVER (PARTITION BY doc_id) AS total,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg) AS rn
        |  FROM big)
        |SELECT u.doc_id, u.n_tok, u.n_uniq,
        |  round(1.0 - cast(u.n_uniq as double) / u.n_tok, 6) + 0.0 AS dup_frac,
        |  t.top_bigram, cast(t.c as bigint) AS top_cnt,
        |  round(cast(t.c as double) / t.total, 6) + 0.0 AS top_frac
        |FROM uni u JOIN top t ON u.doc_id = t.doc_id AND t.rn = 1
        |ORDER BY u.doc_id""".stripMargin),

    // rank-family completion: rank / dense_rank / percent_rank (ntile, lag,
    // lead, cume_dist covered by q126/q142)
    "q162_rank_family" -> sqlQuery(Seq("orders"),
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) + 0.0 AS prnk
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin),

    // line/polygon buffer (capsule union): symmetric n-gon caps are halved
    // exactly by the rectangle ends, so the area is closed-form
    "q163_line_buffer" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_area(st_buffer(st_geomfromtext(
        |    concat('LINESTRING (0 0, ', len, ' 0)')), r)), 4) + 0.0 AS cap_area,
        |  round(st_area(st_buffer(st_makeenvelope(0.0, 0.0, cast(len as double),
        |    cast(len as double)), r)), 4) + 0.0 AS poly_area,
        |  st_covers(st_buffer(st_geomfromtext(
        |    concat('LINESTRING (0 0, ', len, ' 0)')), r),
        |    st_geomfromtext(concat('LINESTRING (0 0, ', len, ' 0)'))) AS covers_line
        |FROM (SELECT c_custkey, c_custkey % 7 + 1 AS len,
        |        cast(c_custkey % 3 + 1 as double) * 0.5 AS r
        |      FROM customer WHERE c_custkey <= 900)
        |ORDER BY c_custkey""".stripMargin),

    // min-area oriented envelope + min enclosing circle on rotated-rectangle
    // corner sets: the envelope recovers w*h at any angle, the circle radius
    // is the half diagonal (all four corners concyclic)
    "q164_oriented_bounds" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_area(st_orientedenvelope(mp)), 4) + 0.0 AS obb_area,
        |  round(st_minimumboundingradius(mp), 6) + 0.0 AS mbr
        |FROM (
        |  SELECT c_custkey, st_geomfromtext(concat('MULTIPOINT ((0 0), (',
        |    w * cos(th), ' ', w * sin(th), '), (',
        |    w * cos(th) - h * sin(th), ' ', w * sin(th) + h * cos(th), '), (',
        |    -h * sin(th), ' ', h * cos(th), '))')) AS mp
        |  FROM (SELECT c_custkey, cast(c_custkey % 5 + 2 as double) AS w,
        |          cast(c_custkey % 3 + 1 as double) AS h,
        |          cast(c_custkey % 6 as double) * pi() / 12.0 AS th
        |        FROM customer WHERE c_custkey <= 700))
        |ORDER BY c_custkey""".stripMargin),

    // alpha-shape concave hull over unit-grid L-shapes: threshold sqrt(2)
    // keeps the grid cells (+ the notch-corner half cell); a huge threshold
    // reduces to the convex hull, whose area is rect minus half the notch
    "q165_concave_hull" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_area(st_concavehull(mp, 1.5)), 6) + 0.0 AS conc_area,
        |  round(st_area(st_concavehull(mp, 1000000.0)), 6) + 0.0 AS conv_area
        |FROM (
        |  SELECT c_custkey, st_geomfromtext(concat('MULTIPOINT (',
        |    array_join(transform(filter(flatten(transform(sequence(0, w), x ->
        |      transform(sequence(0, h), y -> struct(x AS x, y AS y)))),
        |      p -> NOT (p.x > w - nw AND p.y > h - nh)),
        |      p -> concat('(', p.x, ' ', p.y, ')')), ', '), ')')) AS mp,
        |    w, h, nw, nh
        |  FROM (SELECT c_custkey,
        |          c_custkey % 3 + 4 AS w, c_custkey % 2 + 3 AS h,
        |          c_custkey % 2 + 1 AS nw, c_custkey % 2 + 1 AS nh
        |        FROM customer WHERE c_custkey <= 250))
        |ORDER BY c_custkey""".stripMargin),

    // flat-top hexagonal tessellation (H3-style binning): cell count follows
    // the lattice arithmetic, total area = count * (3*sqrt(3)/2) * r^2
    "q166_hexgrid" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  size(grid) AS n_hex,
        |  round(aggregate(grid, cast(0.0 as double), (acc, g) -> acc + st_area(g)), 4) + 0.0 AS hex_area
        |FROM (SELECT c_custkey,
        |        st_hexgrid(0.0, 0.0, cast(w as double), cast(h as double), r) AS grid
        |      FROM (SELECT c_custkey, c_custkey % 5 + 5 AS w, c_custkey % 4 + 4 AS h,
        |              cast(c_custkey % 3 + 1 as double) * 0.5 AS r
        |            FROM customer WHERE c_custkey <= 500))
        |ORDER BY c_custkey""".stripMargin),

    // MapType end-to-end: build a map per group from a sorted entry array
    // (deterministic), inspect with size/element_at, explode back to rows
    "q167_map_functions" -> sqlQuery(Seq("orders"),
      """WITH m AS (
        |  SELECT o_custkey,
        |    map_from_entries(array_sort(collect_list(struct(o_orderstatus AS k, cnt AS v)))) AS mp
        |  FROM (SELECT o_custkey, o_orderstatus, cast(count(*) as bigint) AS cnt
        |        FROM orders WHERE o_custkey < 100 GROUP BY o_custkey, o_orderstatus)
        |  GROUP BY o_custkey)
        |SELECT o_custkey, e.key AS status, e.value AS cnt,
        |  cast(size(mp) as int) AS nkeys,
        |  element_at(mp, 'O') AS o_cnt
        |FROM (SELECT o_custkey, mp, explode(map_entries(mp)) AS e FROM m)
        |ORDER BY o_custkey, status""".stripMargin),

    // JSON construction + typed parse-back round-trip (to_json/from_json;
    // extraction-only path covered by q129)
    "q168_json_roundtrip" -> sqlQuery(Seq("orders"),
      """SELECT o_orderkey,
        |  to_json(struct(o_orderkey AS k, o_orderstatus AS s)) AS j,
        |  from_json(to_json(struct(o_orderkey AS k, o_orderstatus AS s)),
        |            'k BIGINT, s STRING').k AS k_back,
        |  from_json(to_json(struct(o_orderkey AS k, o_orderstatus AS s)),
        |            'k BIGINT, s STRING').s AS s_back
        |FROM orders WHERE o_orderkey <= 5000
        |ORDER BY o_orderkey""".stripMargin),

    // anti-entropy table checksums: order-independent per-bucket row-hash
    // fold (md5-prefix -> mod-p sum), the cross-cluster data-validation
    // primitive for 100TB replication — one scan, one tiny shuffle
    "q169_table_checksum" -> sqlQuery(Seq("lineitem"),
      """SELECT bucket,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(h % 1000000007) as bigint) AS checksum,
        |  cast(max(h % 1000000007) as bigint) AS max_h
        |FROM (
        |  SELECT pmod(l_orderkey, 32) AS bucket,
        |    cast(conv(substr(md5(concat(cast(l_orderkey as string), '|',
        |      cast(l_linenumber as string), '|',
        |      cast(cast(l_quantity as int) as string))), 1, 15), 16, 10) as bigint) AS h
        |  FROM lineitem)
        |GROUP BY bucket ORDER BY bucket""".stripMargin),

    // planarize (st_node) a grid arrangement: nh horizontals x nv verticals
    // => nh*(nv+1) + nv*(nh+1) minimal edges, total length preserved
    "q170_node_lines" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_numgeometries(nd) AS n_edges,
        |  round(st_length(nd), 6) + 0.0 AS total_len
        |FROM (
        |  SELECT c_custkey, st_node(st_geomfromtext(concat('MULTILINESTRING (',
        |    array_join(transform(sequence(1, nh),
        |      i -> concat('(0 ', 2 * i, ', 10 ', 2 * i, ')')), ', '), ', ',
        |    array_join(transform(sequence(1, nv),
        |      j -> concat('(', 2 * j, ' 0, ', 2 * j, ' 10)')), ', '),
        |    ')'))) AS nd
        |  FROM (SELECT c_custkey, c_custkey % 3 + 1 AS nh, c_custkey % 3 + 2 AS nv
        |        FROM customer WHERE c_custkey <= 800))
        |ORDER BY c_custkey""".stripMargin),

    // topology completion: polygonize the noded grid into its bounded faces
    // ((nh-1)*(nv-1) cells of area spacing^2)
    "q171_polygonize" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_numgeometries(p) AS n_faces,
        |  round(st_area(p), 6) + 0.0 AS face_area
        |FROM (
        |  SELECT c_custkey, st_polygonize(st_geomfromtext(concat('MULTILINESTRING (',
        |    array_join(transform(sequence(0, nh - 1),
        |      i -> concat('(0 ', 2 * i, ', 10 ', 2 * i, ')')), ', '), ', ',
        |    array_join(transform(sequence(0, nv - 1),
        |      j -> concat('(', 2 * j, ' 0, ', 2 * j, ' 10)')), ', '),
        |    ')'))) AS p
        |  FROM (SELECT c_custkey, c_custkey % 3 + 2 AS nh, c_custkey % 2 + 2 AS nv
        |        FROM customer WHERE c_custkey <= 800))
        |ORDER BY c_custkey""".stripMargin),

    // st_split: k vertical blades cut the horizontal line into k+1 ordered
    // pieces, length preserved
    "q172_split_line" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_numgeometries(sp) AS n_pieces,
        |  round(st_length(sp), 6) + 0.0 AS total_len,
        |  st_astext(st_geometryn(sp, 1)) AS first_piece,
        |  st_astext(st_geometryn(sp, st_numgeometries(sp))) AS last_piece
        |FROM (
        |  SELECT c_custkey, st_split(
        |    st_geomfromtext('LINESTRING (0 0, 10 0)'),
        |    st_geomfromtext(concat('MULTILINESTRING (',
        |      array_join(transform(sequence(1, k),
        |        i -> concat('(', 2 * i, ' -1, ', 2 * i, ' 1)')), ', '), ')'))) AS sp
        |  FROM (SELECT c_custkey, c_custkey % 3 + 1 AS k
        |        FROM customer WHERE c_custkey <= 800))
        |ORDER BY c_custkey""".stripMargin),

    // st_makevalid: scaled bowties repair into two triangles of area 25*s^2
    "q173_makevalid" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_isvalid(bow) AS valid_before,
        |  st_isvalid(st_makevalid(bow)) AS valid_after,
        |  st_numgeometries(st_makevalid(bow)) AS n_parts,
        |  round(st_area(st_makevalid(bow)), 6) + 0.0 AS fixed_area
        |FROM (
        |  SELECT c_custkey, st_geomfromtext(concat('POLYGON ((0 0, ',
        |    10 * s, ' ', 10 * s, ', ', 10 * s, ' 0, 0 ', 10 * s, ', 0 0))')) AS bow
        |  FROM (SELECT c_custkey, c_custkey % 4 + 1 AS s
        |        FROM customer WHERE c_custkey <= 800))
        |ORDER BY c_custkey""".stripMargin),

    // join-key skew diagnostics: per-key frequency profile with median/max,
    // skew ratio, and the salt factor a skew-mitigating rewrite would pick
    "q174_skew_profile" -> sqlQuery(Seq("lineitem"),
      """WITH f AS (
        |  SELECT l_suppkey AS key, cast(count(*) as bigint) AS cnt
        |  FROM lineitem GROUP BY l_suppkey),
        |s AS (
        |  SELECT cast(count(*) as bigint) AS n_keys,
        |    cast(max(cnt) as bigint) AS max_cnt,
        |    round(percentile(cnt, 0.5), 6) + 0.0 AS p50,
        |    round(percentile(cnt, 0.99), 6) + 0.0 AS p99
        |  FROM f),
        |top AS (
        |  -- top-10 hot keys via ORDER BY + LIMIT (TakeOrderedAndProject),
        |  -- rank on the 10-row set — no global window over the key space
        |  SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key) AS rn
        |  FROM (SELECT key, cnt FROM f ORDER BY cnt DESC, key LIMIT 10))
        |SELECT t.rn, t.key, t.cnt, s.n_keys, s.max_cnt, s.p50, s.p99,
        |  round(s.max_cnt / s.p50, 6) + 0.0 AS skew_ratio,
        |  cast(ceil(s.max_cnt / s.p50) as bigint) AS salt_factor
        |FROM top t CROSS JOIN s
        |ORDER BY t.rn""".stripMargin),

    // great-circle polygon area: polar triangle (0,0)-(lam,0)-(0,90) has
    // closed-form spherical area lam_radians * R^2
    "q175_spherical_area" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_areasphere(st_geomfromtext(concat(
        |    'POLYGON ((0 0, ', lam, ' 0, 0 90, 0 0))'))) / 1e9, 3) + 0.0 AS area_gm2
        |FROM (SELECT c_custkey, c_custkey % 60 + 10 AS lam
        |      FROM customer WHERE c_custkey <= 1000)
        |ORDER BY c_custkey""".stripMargin),

    // signup -> purchase conversion funnel by signup-day cohort: first
    // purchase strictly after signup, 7-day conversion window, median
    // hours-to-convert among converters
    "q176_funnel" -> sqlQuery(Seq("events"),
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT s.user_id, min(e.ts) AS first_purchase
        |  FROM s JOIN events e ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
        |  GROUP BY s.user_id),
        |base AS (
        |  SELECT s.user_id, cast(date_trunc('day', s.signup_ts) as date) AS cohort,
        |    CASE WHEN c.first_purchase IS NOT NULL AND
        |              cast(c.first_purchase as double) - cast(s.signup_ts as double)
        |                <= 7 * 86400.0 THEN 1 ELSE 0 END AS converted,
        |    CASE WHEN c.first_purchase IS NOT NULL AND
        |              cast(c.first_purchase as double) - cast(s.signup_ts as double)
        |                <= 7 * 86400.0
        |         THEN (cast(c.first_purchase as double) - cast(s.signup_ts as double)) / 3600.0
        |         END AS hours_to_convert
        |  FROM s LEFT JOIN conv c ON s.user_id = c.user_id)
        |SELECT cohort,
        |  cast(count(*) as bigint) AS n_signups,
        |  cast(sum(converted) as bigint) AS n_converted,
        |  round(avg(cast(converted as double)), 6) + 0.0 AS conv_rate,
        |  round(percentile(hours_to_convert, 0.5), 4) + 0.0 AS median_hours
        |FROM base GROUP BY cohort ORDER BY cohort""".stripMargin),

    // weekly retention matrix: fraction of each signup-week cohort active
    // (any event) in week w after signup, w = 0..3
    "q177_retention" -> sqlQuery(Seq("events"),
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT s.user_id,
        |    cast(floor((cast(e.ts as double) - cast(s.signup_ts as double)) / 604800.0) as int) AS w
        |  FROM s JOIN events e ON e.user_id = s.user_id
        |  WHERE e.ts >= s.signup_ts),
        |coh AS (
        |  SELECT user_id, cast(date_trunc('week', signup_ts) as date) AS cohort FROM s),
        |sizes AS (
        |  SELECT cohort, cast(count(*) as bigint) AS n_users FROM coh GROUP BY cohort)
        |SELECT c.cohort, a.w,
        |  cast(count(*) as bigint) AS n_active, z.n_users,
        |  round(cast(count(*) as double) / z.n_users, 6) + 0.0 AS retention
        |FROM coh c JOIN act a ON c.user_id = a.user_id
        |JOIN sizes z ON c.cohort = z.cohort
        |WHERE a.w BETWEEN 0 AND 3
        |GROUP BY c.cohort, a.w, z.n_users
        |ORDER BY c.cohort, a.w""".stripMargin),

    // iterative BFS over a binary-tree edge set (Pregel-style join loop);
    // the shortest-hop level of node n from the root is floor(log2(n))
    "q178_bfs_levels" -> ((s: SparkSession, dir: String) => {
      init(s); view(s, dir, "customer")
      import org.apache.spark.sql.functions._
      val n = 4095
      val edges = s.range(1, (n + 1) / 2)
        .selectExpr("id AS src", "id * 2 AS dst")
        .union(s.range(1, (n + 1) / 2).selectExpr("id AS src", "id * 2 + 1 AS dst"))
        .where(col("dst") <= n)
      // acyclic graph: every node is reached exactly once, so no
      // visited-set anti-join or per-round materialization is needed —
      // the 12 rounds stay one lazy plan of tiny broadcast joins. (Cyclic
      // graphs need the dedup + periodic localCheckpoint variant, as in
      // the DBSCAN connected-components rounds.)
      // broadcast the (static, small-per-round) edge side: every round is
      // a BroadcastHashJoin, so several rounds chain inside ONE job.
      // Checkpoint every 4th round, not every round: an eager checkpoint
      // is a full job submission (~0.25 s of driver latency each — 12 of
      // them dominated this query's 3.1 s), while a lineage depth of 4
      // broadcast joins re-derives at most 4 tiny frontiers per levels
      // branch. At large-frontier scale the per-round materialization
      // (depth 1) remains the right setting — the knob trades driver
      // round-trips against recomputation breadth.
      val bEdges = broadcast(edges)
      // ONE partition for the seed: broadcast joins preserve the probe
      // side's partitioning, so every levels branch stays a single task
      // instead of defaultParallelism near-empty tasks per branch (~400
      // tiny tasks of pure scheduling overhead at local[32]). A REAL
      // large frontier repartitions itself through the per-round
      // materialization; the seed of a BFS is always one row.
      var frontier = s.range(1, 2, 1, 1).toDF("node").withColumn("level", lit(0))
      var levels = frontier
      var i = 0
      while (i < 12) {
        frontier = frontier.join(bEdges, frontier("node") === bEdges("src"))
          .select(col("dst").as("node"), (col("level") + 1).as("level"))
        if (i % 4 == 3) frontier = frontier.localCheckpoint(true)
        levels = levels.union(frontier)
        i += 1
      }
      levels.groupBy("level").agg(
        count(lit(1)).cast("long").as("n_nodes"),
        min("node").as("min_node"), max("node").as("max_node"))
        .orderBy("level")
    }),

    // first-order Markov transition matrix over per-user event sequences
    "q179_event_transitions" -> sqlQuery(Seq("events"),
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (SELECT event_type, next_type, cast(count(*) as bigint) AS n
        |      FROM seq WHERE next_type IS NOT NULL GROUP BY event_type, next_type)
        |SELECT event_type, next_type, n,
        |  round(cast(n as double) / sum(n) OVER (PARTITION BY event_type), 6) + 0.0 AS p
        |FROM t ORDER BY event_type, next_type""".stripMargin),

    // small-file compaction planning: sequential bin-packing of file sizes
    // into 128 MB target groups via a running prior-bytes sum, computed
    // TWO-LEVEL so no stage ever windows the full file list on one
    // reducer: files pre-bin by directory (here file_id div 1000), the
    // per-file prefix windows PARTITION BY bin (parallel across the
    // cluster), and only the tiny per-bin totals ride the one global
    // window (1e8 files -> 1e5 bin rows). bin_prior + in_bin_prior equals
    // the global prefix sum exactly, so the driver's oracle — the
    // straightforward single-window spec — doubles as a cross-check of
    // the decomposition
    "q180_compaction_plan" -> sqlQuery(Seq("part"),
      """WITH f AS (
        |  SELECT p_partkey AS file_id, cast(p_retailprice * 1000 as bigint) AS bytes,
        |    cast(floor(p_partkey / 1000) as bigint) AS bin
        |  FROM part),
        |w AS (SELECT file_id, bytes, bin,
        |        sum(bytes) OVER (PARTITION BY bin ORDER BY file_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS in_bin_prior
        |      FROM f),
        |b AS (SELECT bin, sum(bytes) AS bin_bytes FROM f GROUP BY bin),
        |bp AS (SELECT bin,
        |        sum(bin_bytes) OVER (ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bin_prior
        |      FROM b),
        |g AS (SELECT file_id, bytes,
        |        cast(floor((coalesce(bin_prior, 0) + coalesce(in_bin_prior, 0))
        |          / 134217728.0) as bigint) AS grp
        |      FROM w JOIN bp USING (bin))
        |SELECT grp, cast(count(*) as bigint) AS n_files,
        |  cast(sum(bytes) as bigint) AS grp_bytes,
        |  min(file_id) AS first_file, max(file_id) AS last_file
        |FROM g GROUP BY grp ORDER BY grp""".stripMargin),

    // discrete Fréchet distance: congruent translation gives |shift|
    // exactly; a reversed segment keeps Hausdorff 0 but Fréchet = length
    // (the order sensitivity that distinguishes the two)
    "q181_frechet" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_frechetdistance(lshape, st_translate(lshape, 2.0, 3.0)), 6) + 0.0 AS f_shift,
         |  round(st_frechetdistance(seg, st_reverse(seg)), 6) + 0.0 AS f_rev,
         |  round(st_hausdorffdistance(seg, st_reverse(seg)), 6) + 0.0 AS h_rev
         |FROM (
         |  SELECT c_custkey,
         |    st_geomfromtext(concat('LINESTRING (0 0, ', s, ' 0, ', s, ' ', s, ')')) AS lshape,
         |    st_geomfromtext(concat('LINESTRING (0 0, ', s, ' 0)')) AS seg
         |  FROM (SELECT c_custkey, cast(c_custkey % 10 + 1 as bigint) AS s FROM customer))
         |ORDER BY c_custkey""".stripMargin),

    // Visvalingam-Whyatt: a 7-point unit zigzag of amplitude h has every
    // interior effective area = h, so a threshold above the bbox-area bound
    // (max possible effective area = 15) collapses it to the 2-point
    // baseline, while h-0.5 < h keeps all vertices untouched
    "q182_simplifyvw" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  cast(st_npoints(st_simplifyvw(zig, 100.0)) as int) AS np_above,
        |  round(st_length(st_simplifyvw(zig, 100.0)), 6) AS len_above,
        |  cast(st_npoints(st_simplifyvw(zig, h - 0.5)) as int) AS np_below,
        |  round(st_length(st_simplifyvw(zig, h - 0.5)), 6) AS len_below
        |FROM (
        |  SELECT c_custkey, cast(c_custkey % 5 + 1 as double) AS h,
        |    st_geomfromtext(concat('LINESTRING (0 0, 1 ', c_custkey % 5 + 1,
        |      ', 2 0, 3 ', c_custkey % 5 + 1, ', 4 0, 5 ', c_custkey % 5 + 1,
        |      ', 6 0)')) AS zig
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin),

    // ear-clipping triangulation of a convex integer "house" pentagon:
    // n-2 triangles whose areas tile the polygon exactly
    "q183_triangulate" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  cast(st_numgeometries(tris) as int) AS n_tris,
        |  round(st_area(tris), 6) AS tri_area,
        |  round(st_area(house), 6) AS poly_area
        |FROM (
        |  SELECT c_custkey, house, st_triangulatepolygon(house) AS tris
        |  FROM (
        |    SELECT c_custkey, st_geomfromtext(concat('POLYGON ((0 0, ', w, ' 0, ',
        |      w, ' ', h, ', ', w / 2.0, ' ', h + r, ', 0 ', h, ', 0 0))')) AS house
        |    FROM (SELECT c_custkey,
        |            cast(c_custkey % 5 + 2 as double) AS w,
        |            cast((c_custkey * 3) % 5 + 2 as double) AS h,
        |            cast((c_custkey * 7) % 4 + 1 as double) AS r
        |          FROM customer)))
        |ORDER BY c_custkey""".stripMargin),

    // minimum bounding circle of a 2-point set: the diameter circle —
    // 32-gon with first vertex due east at (cx + r, cy)
    "q184_minboundingcircle" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  cast(st_npoints(circ) as int) AS np,
        |  round(st_xmax(circ) - a / 2.0, 6) AS r_east,
        |  round(st_ymax(circ) - b / 2.0, 6) AS r_north
        |FROM (
        |  SELECT c_custkey, a, b,
        |    st_minimumboundingcircle(st_geomfromtext(
        |      concat('MULTIPOINT (0 0, ', a, ' ', b, ')'))) AS circ
        |  FROM (SELECT c_custkey,
        |          cast(c_custkey % 7 + 1 as double) AS a,
        |          cast((c_custkey * 3) % 6 + 2 as double) AS b
        |        FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // XYZ slippy-map tile envelopes in EPSG:3857 (y counts from north)
    "q185_tileenvelope" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey, z, tx, ty,
        |  round(st_xmin(t), 3) + 0.0 AS xmin, round(st_ymin(t), 3) + 0.0 AS ymin,
        |  round(st_xmax(t), 3) + 0.0 AS xmax, round(st_ymax(t), 3) + 0.0 AS ymax
        |FROM (
        |  SELECT c_custkey, z, tx, ty,
        |    st_tileenvelope(cast(z as double), cast(tx as double), cast(ty as double)) AS t
        |  FROM (SELECT c_custkey, cast(c_custkey % 8 + 1 as int) AS z,
        |          cast(c_custkey % cast(pow(2, c_custkey % 8 + 1) as bigint) as bigint) AS tx,
        |          cast((c_custkey * 3) % cast(pow(2, c_custkey % 8 + 1) as bigint) as bigint) AS ty
        |        FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // Chaikin corner cutting on a right-angle elbow: 1 iteration keeps the
    // endpoints, cuts the corner — 6 points, closed-form length
    "q186_chaikin" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  cast(st_npoints(st_chaikinsmoothing(elbow, 1.0)) as int) AS np1,
        |  round(st_length(st_chaikinsmoothing(elbow, 1.0)), 6) AS len1,
        |  cast(st_npoints(st_chaikinsmoothing(elbow, 2.0)) as int) AS np2
        |FROM (
        |  SELECT c_custkey, st_geomfromtext(concat('LINESTRING (0 0, ', a,
        |    ' 0, ', a, ' ', b, ')')) AS elbow
        |  FROM (SELECT c_custkey,
        |          cast(c_custkey % 9 + 1 as bigint) AS a,
        |          cast((c_custkey * 5) % 8 + 1 as bigint) AS b
        |        FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // collinear-overlap extraction: an elbow against a 2-piece blade that
    // runs along both legs — overlap lengths are closed-form interval math
    "q187_sharedpaths" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(st_length(sp), 6) AS shared_len,
        |  cast(st_numgeometries(sp) as int) AS n_pieces
        |FROM (
        |  SELECT c_custkey, st_sharedpaths(
        |    st_geomfromtext('LINESTRING (0 0, 10 0, 10 5)'),
        |    st_geomfromtext(concat('MULTILINESTRING ((', c, ' 0, ', c + d,
        |      ' 0), (10 1, 10 9))'))) AS sp
        |  FROM (SELECT c_custkey,
        |          cast(c_custkey % 6 as bigint) AS c,
        |          cast(c_custkey % 4 + 2 as bigint) AS d
        |        FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // envelope-halving subdivision of a densified L-shape: parts tile the
    // polygon exactly (dyadic split coordinates), every part under the
    // vertex cap, bbox preserved
    "q188_subdivide" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  round(sum(st_area(part)), 6) AS area_sum,
        |  cast(max(st_npoints(part)) <= 12 as boolean) AS parts_small,
        |  round(min(st_xmin(part)), 6) AS minx,
        |  round(max(st_ymax(part)), 6) AS maxy
        |FROM (
        |  SELECT c_custkey, explode(st_subdivide(st_segmentize(lshape, 1.0), 12.0)) AS part
        |  FROM (
        |    SELECT c_custkey, st_geomfromtext(concat('POLYGON ((0 0, ', 2 * w, ' 0, ',
        |      2 * w, ' ', h, ', ', w, ' ', h, ', ', w, ' ', 2 * h, ', 0 ', 2 * h,
        |      ', 0 0))')) AS lshape
        |    FROM (SELECT c_custkey,
        |            cast(c_custkey % 4 + 2 as bigint) AS w,
        |            cast((c_custkey * 3) % 4 + 2 as bigint) AS h
        |          FROM customer WHERE c_custkey <= 300)))
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin),

    // PIVOT: long-to-wide reshape (the inverse of q137's stack/unpivot)
    "q189_pivot" -> sqlQuery(Seq("orders"),
      """SELECT * FROM (
        |  SELECT o_orderpriority AS prio, o_orderstatus AS st,
        |         cast(o_totalprice as decimal(20,2)) AS tp
        |  FROM orders)
        |PIVOT (cast(sum(tp) as double) FOR st IN ('F' AS f, 'O' AS o, 'P' AS p))
        |ORDER BY prio""".stripMargin),

    // explicit GROUPING SETS with grouping() markers — the general form of
    // ROLLUP (q115) and CUBE (q154)
    "q190_groupingsets" -> sqlQuery(Seq("orders"),
      """SELECT coalesce(o_orderstatus, '@') AS st,
        |  coalesce(o_orderpriority, '@') AS prio,
        |  cast(grouping(o_orderstatus) as int) AS g_st,
        |  cast(grouping(o_orderpriority) as int) AS g_prio,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS rev
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_st, g_prio, st, prio""".stripMargin),

    // interval-overlap join via the reference-bin rewrite (RangeJoin
    // .intervalOverlap): order activity windows x lineitem ship windows,
    // no BNLJ, no dedup shuffle
    "q191_interval_overlap" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "orders", "lineitem")
      val day = 86400000000L
      // o_orderdate/l_shipdate are TIMESTAMP_NTZ; in the UTC session the
      // cast to TIMESTAMP is an exact relabel
      val us = (c: String) => unix_micros(col(c).cast("timestamp"))
      val ord = s.table("orders")
        .filter(col("o_custkey") % 100 === 0)
        .select(col("o_orderkey"),
          us("o_orderdate").as("o_start"),
          (us("o_orderdate") + (col("o_orderkey") % 30 + 1) * day).as("o_end"))
      val li = s.table("lineitem")
        .filter(col("l_suppkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          us("l_shipdate").as("l_start"),
          (us("l_shipdate") + (col("l_partkey") % 20 + 1) * day).as("l_end"))
      graft.relational.RangeJoin.intervalOverlap(
          ord, col("o_start"), col("o_end"), li, col("l_start"), col("l_end"),
          binSize = 30L * day)
        .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"),
          ((least(col("o_end"), col("l_end")) - greatest(col("o_start"), col("l_start"))) / day)
            .cast("bigint").as("overlap_days"))
        .orderBy("o_orderkey", "l_orderkey", "l_linenumber")
    }),

    // SCD type-2 dimension build from a change log (Cdc.scd2): versioned
    // rows with [valid_from, valid_to) + is_current, one window, one shuffle
    "q192_scd2" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      graft.relational.Cdc.scd2(
          s.table("events").select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
          keyCol = "user_id", tsCol = "ts", orderCols = Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("version"), col("is_current"))
        .orderBy("user_id", "version")
    }),

    // exact triangle counting via degree-ordered orientation (Graph
    // .triangleCount) — wedge fan-out capped at O(sqrt(E)) per node, so
    // power-law hubs cannot square the shuffle
    "q193_triangles" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "orders")
      val edges = s.table("orders").select(
        (col("o_custkey") % 60).as("src"),
        ((col("o_custkey") * 7 + col("o_orderkey")) % 60).as("dst"))
      graft.relational.Graph.triangleCount(edges, "src", "dst")
    }),

    // ANSI percentile_disc + deterministic mode (count desc, value asc
    // tie-break) — the discrete companions of q152's percentile_cont.
    // percentile_disc works over per-VALUE counts (a ~50-row window per
    // group) instead of a per-row cume_dist window, which would funnel
    // each group's 200k rows into one unsplittable window task; the
    // cume_dist >= p test becomes exact integer arithmetic (10*cum >= 9*tot)
    "q194_disc_mode" -> sqlQuery(Seq("lineitem"),
      """WITH r AS (SELECT l_returnflag AS flag, cast(l_quantity as double) AS q
        |           FROM lineitem),
        |m AS (SELECT flag, q, cast(count(*) as bigint) AS n FROM r GROUP BY flag, q),
        |o AS (SELECT flag, q, n,
        |        sum(n) OVER (PARTITION BY flag ORDER BY q) AS cum,
        |        sum(n) OVER (PARTITION BY flag) AS tot
        |      FROM m),
        |mm AS (SELECT flag, q AS mode_q, n,
        |         row_number() OVER (PARTITION BY flag ORDER BY n DESC, q) AS rn
        |       FROM m)
        |SELECT o.flag,
        |  min(CASE WHEN 2 * cum >= tot THEN q END) AS p50_disc,
        |  min(CASE WHEN 10 * cum >= 9 * tot THEN q END) AS p90_disc,
        |  max(mm.mode_q) AS mode_val,
        |  max(mm.n) AS mode_n
        |FROM o JOIN (SELECT flag, mode_q, n FROM mm WHERE rn = 1) mm
        |  ON o.flag = mm.flag
        |GROUP BY o.flag
        |ORDER BY o.flag""".stripMargin),

    // gap filling: forward/backward fill + nth_value with IGNORE NULLS —
    // the sensor-data repair primitive
    "q195_fill" -> sqlQuery(Seq("events"),
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN value < 50.0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id, (v IS NULL) AS was_null,
        |  last_value(v) IGNORE NULLS OVER w AS ffill,
        |  first_value(v) IGNORE NULLS OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill,
        |  nth_value(v, 2) IGNORE NULLS OVER w AS second_seen
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin),

    // C4-style line filtering (Corpus.c4CleanText): terminal punctuation +
    // min words + chrome markers, on deterministically synthesized
    // multi-line docs; the oracle knows which two lines survive
    "q196_c4_clean" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val raw = s.sql(
        """SELECT doc_id, concat_ws('\n',
          |  concat(array_join(slice(split(concat(text, ' ', text), ' '), 1, 8), ' '), '.'),
          |  'short line',
          |  concat('function() { return ', cast(doc_id as string), '; }'),
          |  concat(array_join(slice(split(concat(text, ' ', text), ' '), 9, 6), ' '), '?'),
          |  'Enable javascript to view comments.',
          |  'Lorem ipsum dolor sit amet.') AS raw_text
          |FROM documents""".stripMargin)
      raw.select(col("doc_id"),
          graft.pipeline.Corpus.c4CleanText(col("raw_text")).as("clean"))
        .selectExpr("doc_id",
          "cast(size(split(clean, '\n')) as int) AS n_lines_kept",
          "md5(clean) AS clean_md5")
        .orderBy("doc_id")
    }),

    // Gopher quality-filter signal set (TextAnalysis.gopherFlags): one
    // codegen scan computing every Rae-et-al. heuristic + the pass flag
    "q197_gopher" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val t2 = s.sql(
        """SELECT doc_id,
          |  CASE WHEN doc_id % 4 = 0
          |         THEN concat(text, '\n- bullet a\n- bullet b\n- bullet c')
          |       WHEN doc_id % 7 = 0 THEN concat(text, '\nto be continued...')
          |       ELSE text END AS t2
          |FROM documents""".stripMargin)
      t2.select(col("doc_id"), graft.pipeline.TextAnalysis.gopherFlags(col("t2")).as("g"))
        .select(col("doc_id"), col("g.n_words").as("n_words"),
          col("g.mean_word_len").as("mean_word_len"),
          col("g.symbol_ratio").as("symbol_ratio"),
          col("g.bullet_frac").as("bullet_frac"),
          col("g.ellipsis_frac").as("ellipsis_frac"),
          col("g.stopword_hits").as("stopword_hits"),
          col("g.alpha_frac").as("alpha_frac"),
          col("g.pass").as("pass"))
        .orderBy("doc_id")
    }),

    // DSIR importance weights (TextAnalysis.dsirWeights): hashed-unigram
    // log-likelihood ratio of target (src0-3) vs the raw pool, md5-bucketed
    // so the weights hash-match cross-engine
    "q198_dsir" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.TextAnalysis.dsirWeights(
          s.table("documents"), "doc_id", "text",
          col("source").isin("src0", "src1", "src2", "src3"))
        .orderBy("doc_id")
    }),

    // binary-quantization ANN (Similarity.hammingTopK): sign-bit codes in
    // two bigints, XOR+popcount scoring — completes the quantization
    // family (PQ q84, IVF-PQ q93, SQ8 q122) at 1 bit/dim
    "q199_binary_quant" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "embeddings")
      import org.apache.spark.sql.expressions.Window
      graft.pipeline.Similarity.hammingTopK(
          s.table("embeddings"), "vec_id", "embedding", queryVec, 10)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("hamming"), col("vec_id"))))
        .orderBy("rank")
    }),

    // cross-document paragraph dedup, keep-first (Corpus.paragraphDedup):
    // re-posts with permuted paragraphs collapse onto their originals;
    // the shared footer survives only at its globally first occurrence
    "q200_paragraph_dedup" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val corpus = s.sql(
        """WITH w AS (
          |  SELECT doc_id, split(concat(text, ' ', text), ' ') AS ws FROM documents),
          |p AS (
          |  SELECT doc_id,
          |    concat('p1-', cast(doc_id as string), ' ',
          |           array_join(slice(ws, 1, 10), ' ')) AS p1,
          |    concat('p2-', cast(doc_id as string), ' ',
          |           array_join(slice(ws, 11, 10), ' ')) AS p2
          |  FROM w)
          |SELECT doc_id, concat_ws('\n\n', p1, p2, 'standard footer paragraph') AS body
          |FROM p
          |UNION ALL
          |SELECT doc_id + 100000, concat_ws('\n\n', p2, p1, 'standard footer paragraph')
          |FROM p""".stripMargin)
      graft.pipeline.Corpus.paragraphDedup(corpus, "doc_id", "body")
        .selectExpr("doc_id", "cast(n_kept as bigint) AS n_kept", "md5(dedup_text) AS body_md5")
        .orderBy("doc_id")
    }),

    // unary union: dissolve a multipolygon's own parts — two corner-
    // overlapping squares merge (area 1.75 s^2), a remote square survives
    "q201_unaryunion" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  round(st_area(u), 6) AS u_area,
         |  cast(st_numgeometries(u) as int) AS n_parts,
         |  st_isvalid(u) AS valid
         |FROM (
         |  SELECT c_custkey, st_unaryunion(st_geomfromtext(concat(
         |    'MULTIPOLYGON (((0 0, ', s, ' 0, ', s, ' ', s, ', 0 ', s, ', 0 0)), ((',
         |    s / 2, ' ', s / 2, ', ', 3 * s / 2, ' ', s / 2, ', ',
         |    3 * s / 2, ' ', 3 * s / 2, ', ', s / 2, ' ', 3 * s / 2, ', ',
         |    s / 2, ' ', s / 2, ')), ((',
         |    10 * s, ' 0, ', 11 * s, ' 0, ', 11 * s, ' ', s, ', ', 10 * s,
         |    ' ', s, ', ', 10 * s, ' 0)))'))) AS u
         |  FROM (SELECT c_custkey, cast($custSide as double) AS s FROM customer))
         |ORDER BY c_custkey""".stripMargin),

    // canonical form: rotated/reversed rings and permuted multi-parts
    // normalize to byte-identical text; a different square does not
    "q202_normalize" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  st_astext(st_normalize(a)) = st_astext(st_normalize(b)) AS ring_canon_eq,
         |  st_astext(st_normalize(a)) = st_astext(st_normalize(c)) AS other_canon_eq,
         |  st_astext(st_normalize(mpa)) = st_astext(st_normalize(mpb)) AS mp_canon_eq,
         |  st_equals(a, b) AS equals_pred
         |FROM (
         |  SELECT c_custkey,
         |    st_geomfromtext(concat('POLYGON ((', x, ' ', y, ', ', x + s, ' ', y, ', ',
         |      x + s, ' ', y + s, ', ', x, ' ', y + s, ', ', x, ' ', y, '))')) AS a,
         |    st_geomfromtext(concat('POLYGON ((', x + s, ' ', y + s, ', ', x + s, ' ', y,
         |      ', ', x, ' ', y, ', ', x, ' ', y + s, ', ', x + s, ' ', y + s, '))')) AS b,
         |    st_geomfromtext(concat('POLYGON ((', x + 1, ' ', y, ', ', x + s + 1, ' ', y, ', ',
         |      x + s + 1, ' ', y + s, ', ', x + 1, ' ', y + s, ', ', x + 1, ' ', y, '))')) AS c,
         |    st_geomfromtext(concat('MULTIPOLYGON (((', x, ' ', y, ', ', x + s, ' ', y, ', ',
         |      x + s, ' ', y + s, ', ', x, ' ', y, ')), ((', x + 20, ' ', y, ', ',
         |      x + 20 + s, ' ', y, ', ', x + 20, ' ', y + s, ', ', x + 20, ' ', y, ')))')) AS mpa,
         |    st_geomfromtext(concat('MULTIPOLYGON (((', x + 20, ' ', y, ', ',
         |      x + 20 + s, ' ', y, ', ', x + 20, ' ', y + s, ', ', x + 20, ' ', y, ')), ((',
         |      x, ' ', y, ', ', x + s, ' ', y, ', ', x + s, ' ', y + s, ', ', x, ' ', y, ')))')) AS mpb
         |  FROM (SELECT c_custkey, cast($custX as bigint) AS x, cast($custY as bigint) AS y,
         |          cast(c_custkey % 10 + 1 as bigint) AS s FROM customer))
         |ORDER BY c_custkey""".stripMargin),

    // seeded deterministic point generation inside areal geometry
    "q203_generatepoints" -> sqlQuery(Seq("customer"),
      s"""SELECT c_custkey,
         |  cast(st_numgeometries(pts) as int) AS n_pts,
         |  st_covers(env, pts) AS covered
         |FROM (
         |  SELECT c_custkey, env,
         |    st_generatepoints(env, cast(c_custkey % 20 + 5 as double),
         |                      cast(c_custkey as double)) AS pts
         |  FROM (SELECT c_custkey,
         |          st_makeenvelope($custX, $custY, $custX + $custSide, $custY + $custSide) AS env
         |        FROM customer))
         |ORDER BY c_custkey""".stripMargin),

    // LATERAL VIEW posexplode — the UDTF lateral-join surface (§2.8)
    "q204_posexplode" -> sqlQuery(Seq("documents"),
      """SELECT doc_id, pos, tok
        |FROM documents
        |LATERAL VIEW posexplode(slice(split(text, ' '), 1, 5)) t AS pos, tok
        |ORDER BY doc_id, pos""".stripMargin),

    // EXACT set-similarity join via ppjoin prefix filtering
    // (Dedup.jaccardSetJoin): word-5-shingle sets (5-grams are near-unique
    // on this vocabulary, so prefix candidates ~ true pairs; 3-grams would
    // collide and square the verify stage), mangled re-posts land at
    // Jaccard >= 0.5 — complete, no stop-token loss, no all-pairs scan
    "q205_jaccard_join" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      // word_shingles builds each 5-gram set in ONE tokenizer pass (a
      // split+transform SQL formulation re-evaluates the split per
      // element_at — 8x slower at sf0.1); mangling rewrites the first
      // TOKEN, which perturbs exactly the first shingle
      val sets = s.sql(
        """SELECT doc_id, word_shingles(text, 5) AS sh FROM documents
          |UNION ALL
          |SELECT doc_id + 100000,
          |  word_shingles(regexp_replace(trim(text), '^\\S+', 'XX'), 5) AS sh
          |FROM documents""".stripMargin)
      graft.pipeline.Dedup.jaccardSetJoin(sets, "doc_id", "sh", 0.5)
        .selectExpr("id_a", "id_b", "round(jaccard, 6) + 0.0 AS jaccard")
        .orderBy("id_a", "id_b")
    }),

    // TPC-H Q7-shape volume shipping: two fact-dimension join chains meet
    // on lineitem; revenue in exact decimals so the sum is order-free
    "q206_volume_shipping" -> sqlQuery(
      Seq("lineitem", "orders", "customer", "supplier", "nation"),
      """SELECT supp_nation, cust_nation, yr,
        |  cast(sum(volume) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l.l_shipdate) AS yr,
        |    cast(l.l_extendedprice as decimal(20,2)) *
        |      cast(1.0 - l.l_discount as decimal(4,2)) AS volume
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, yr
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin),

    // TPC-H Q8-shape market share: one supplier nation's share of revenue
    // to a region's customers, by order year
    "q207_market_share" -> sqlQuery(
      Seq("lineitem", "orders", "customer", "supplier", "nation", "region"),
      """SELECT yr,
        |  round(cast(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
        |                      ELSE cast(0 as decimal(22,4)) END) as double) /
        |        cast(sum(volume) as double), 6) + 0.0 AS share,
        |  cast(count(*) as bigint) AS n_items
        |FROM (
        |  SELECT year(o.o_orderdate) AS yr, n1.n_name AS supp_nation,
        |    cast(l.l_extendedprice as decimal(20,2)) *
        |      cast(1.0 - l.l_discount as decimal(4,2)) AS volume
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |  JOIN region r ON nc.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  WHERE r.r_name = 'ASIA')
        |GROUP BY yr
        |ORDER BY yr""".stripMargin),

    // TPC-H Q9-shape product profit: revenue minus a retail-price-based
    // cost proxy (no partsupp table in this schema), by supplier nation
    // and year, parts filtered by name
    "q208_product_profit" -> sqlQuery(
      Seq("lineitem", "orders", "supplier", "nation", "part"),
      """SELECT nation, yr,
        |  cast(sum(amount) as double) AS profit,
        |  cast(count(*) as bigint) AS n_items
        |FROM (
        |  SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
        |    cast(l.l_extendedprice as decimal(20,2)) *
        |      cast(1.0 - l.l_discount as decimal(4,2)) -
        |    cast(p.p_retailprice as decimal(20,2)) *
        |      cast(l.l_quantity as decimal(10,2)) * cast(0.1 as decimal(3,1)) AS amount
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE '%red%')
        |GROUP BY nation, yr
        |ORDER BY nation, yr""".stripMargin),

    // correlated scalar subqueries (Catalyst decorrelates both into
    // aggregated left joins — no per-row re-execution)
    "q209_correlated" -> sqlQuery(Seq("customer", "orders"),
      """SELECT c.c_custkey,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price,
        |  (SELECT cast(count(*) as bigint) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O') AS n_open
        |FROM customer c
        |ORDER BY c.c_custkey""".stripMargin),

    // regexp scalar breadth: group extraction, extract-all counting,
    // backreference rewrite
    "q210_regexp" -> sqlQuery(Seq("documents"),
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  cast(size(regexp_extract_all(text, 'ta[a-z]+', 0)) as int) AS n_ta,
        |  (text rlike 'key.*value') AS has_kv,
        |  md5(regexp_replace(text, '^(\\S+) (\\S+)', '$2 $1')) AS swapped_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin),

    // Matryoshka-style truncated retrieval: rank on the first 16 dims
    // (renormalized), report the full-width cosine alongside — the
    // dimension-adaptive search pattern; ordering on ROUNDED scores so the
    // rank is engine-stable
    "q211_matryoshka" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "embeddings")
      import org.apache.spark.sql.expressions.Window
      val q16 = queryVec.take(16)
      val scored = s.table("embeddings").select(col("vec_id"),
        (round(graft.pipeline.Similarity.cosineCols(
          slice(col("embedding"), 1, 16), typedLit(q16)), 6) + lit(0.0)).as("cos16"),
        (round(graft.pipeline.Similarity.cosineCols(
          col("embedding"), typedLit(queryVec)), 6) + lit(0.0)).as("cos_full"))
      scored
        .withColumn("rank", row_number().over(Window.orderBy(desc("cos16"), col("vec_id"))))
        .filter(col("rank") <= 10)
        .orderBy("rank")
    }),

    // per-label embedding statistics: centroid head + mean norm with the
    // order-independent decimal fold (float sums are order-sensitive in
    // doubles; rounding each element first makes the sum exact)
    "q212_embedding_stats" -> sqlQuery(Seq("embeddings"),
      """SELECT label,
        |  cast(count(*) as bigint) AS n,
        |  round(cast(sum(cast(round(cast(embedding[0] as double), 7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS c0,
        |  round(cast(sum(cast(round(cast(embedding[1] as double), 7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS c1,
        |  round(cast(sum(cast(round(cast(embedding[2] as double), 7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS c2,
        |  round(cast(sum(cast(round(
        |    sqrt(aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))),
        |    7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS mean_norm
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin),

    // line vertex editing + multi-wrap (PostGIS ST_AddPoint/RemovePoint/
    // SetPoint/Multi) — closed-form WKT oracles
    "q213_line_edit" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  st_astext(st_addpoint(line, st_point(9.0, 9.0))) AS add_end,
        |  st_astext(st_addpoint(line, st_point(5.0, 5.0), 1.0)) AS add_mid,
        |  st_astext(st_removepoint(line, 1.0)) AS rm_mid,
        |  st_astext(st_setpoint(line, -1.0, st_point(7.0, 7.0))) AS set_last,
        |  st_removepoint(st_geomfromtext('LINESTRING (0 0, 1 1)'), 0.0) IS NULL AS rm_guard,
        |  st_astext(st_multi(st_point(cast(x0 as double), cast(y0 as double)))) AS multi_pt
        |FROM (
        |  SELECT c_custkey, x0, y0,
        |    st_geomfromtext(concat('LINESTRING (0 0, ', x0, ' ', y0, ', ',
        |      x1, ' ', y1, ')')) AS line
        |  FROM (
        |    SELECT c_custkey,
        |      cast(c_custkey % 360 - 180 as bigint) AS x0,
        |      cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
        |      cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x1,
        |      cast((c_custkey * 7) % 160 - 80 + c_custkey % 10 + 1 as bigint) AS y1
        |    FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // gaps-and-islands: maximal runs of consecutive active days per user
    // (the day-number minus row-number grouping trick — one window, one
    // aggregation, no self-join)
    "q214_islands" -> sqlQuery(Seq("events"),
      """WITH d AS (SELECT DISTINCT user_id, cast(ts as date) AS day FROM events),
        |r AS (SELECT user_id, day,
        |        datediff(day, DATE '1970-01-01') AS dn,
        |        datediff(day, DATE '1970-01-01') -
        |          row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d)
        |SELECT user_id, min(day) AS island_start, max(day) AS island_end,
        |  cast(count(*) as bigint) AS n_days
        |FROM r GROUP BY user_id, grp
        |ORDER BY user_id, island_start""".stripMargin),

    // HLL sketch algebra: per-group sketch states merge (bucket-wise max)
    // into EXACTLY the sketch of the union — the property that makes the
    // estimate incrementally maintainable across partitions/batches
    "q215_hll_merge" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "events")
      val events = s.table("events")
      val perType = graft.pipeline.Sketch.hllBuckets(events, "user_id", Seq("event_type"))
      val merged = graft.pipeline.Sketch.hllFromBuckets(
        perType.groupBy(col("__b")).agg(max(col("__rmax")).as("__rmax")), Seq())
        .select(col("hll_estimate").as("merged_estimate"))
      val direct = graft.pipeline.Sketch.hllDistinct(events, "user_id", Seq())
        .select(col("hll_estimate").as("direct_estimate"))
      val exact = events.agg(countDistinct(col("user_id")).as("exact_distinct"))
      merged.crossJoin(direct).crossJoin(exact)
        .withColumn("merge_lossless", col("merged_estimate") === col("direct_estimate"))
    }),

    // parallel offset with miter joins: a right-angle elbow offsets to
    // closed-form coordinates on both sides
    "q216_offsetcurve" -> sqlQuery(Seq("customer"),
      """SELECT c_custkey,
        |  cast(st_npoints(lo) as int) AS np,
        |  round(st_x(st_pointn(lo, 2)), 6) + 0.0 AS left_mx,
        |  round(st_y(st_pointn(lo, 2)), 6) + 0.0 AS left_my,
        |  round(st_length(lo), 6) + 0.0 AS left_len,
        |  round(st_x(st_pointn(ro, 2)), 6) + 0.0 AS right_mx,
        |  round(st_y(st_pointn(ro, 2)), 6) + 0.0 AS right_my,
        |  round(st_length(ro), 6) + 0.0 AS right_len
        |FROM (
        |  SELECT c_custkey,
        |    st_offsetcurve(elbow, cast(dd as double)) AS lo,
        |    st_offsetcurve(elbow, cast(-dd as double)) AS ro
        |  FROM (
        |    SELECT c_custkey, cast(c_custkey % 3 + 1 as bigint) AS dd,
        |      st_geomfromtext(concat('LINESTRING (0 0, ', c_custkey % 9 + 4,
        |        ' 0, ', c_custkey % 9 + 4, ' ', (c_custkey * 5) % 8 + 4, ')')) AS elbow
        |    FROM customer))
        |ORDER BY c_custkey""".stripMargin),

    // time-weighted average value per user (TWAP): interval weights from
    // the next event, contributions decimal-folded so the sum is
    // order-independent
    "q217_twap" -> sqlQuery(Seq("events"),
      """WITH e AS (
        |  SELECT user_id, value, unix_micros(ts) AS us,
        |    lead(unix_micros(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us
        |  FROM events)
        |SELECT user_id,
        |  cast(count(*) as bigint) AS n_intervals,
        |  cast(sum(next_us - us) as bigint) AS total_us,
        |  round(cast(sum(cast(round(value * (next_us - us), 4) as decimal(30,4))) as double)
        |        / sum(next_us - us), 6) + 0.0 AS twap
        |FROM e WHERE next_us IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin),

    // PageRank power iteration (Graph.pageRank): decimal-folded per-edge
    // contributions make 6 iterations bit-identical cross-engine — the
    // iterative-compute companion of BFS q178
    "q218_pagerank" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val edges = s.sql(
        """SELECT c_custkey % 60 AS src, (c_custkey + 13) % 60 AS dst FROM customer
          |UNION ALL
          |SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer""".stripMargin)
      graft.relational.Graph.pageRank(edges, "src", "dst", iters = 6)
        .orderBy("node")
    }),

    // chat-transcript flattening: conversation JSON -> typed turns via
    // from_json + posexplode — the instruction-data preparation shape
    // (schema'd parse, per-turn filtering, per-role token accounting)
    "q219_chat_turns" -> sqlQuery(Seq("documents"),
      """WITH c AS (
        |  SELECT doc_id,
        |    concat('[{"role":"user","content":"', array_join(slice(ws, 1, 5), ' '),
        |      '"},{"role":"assistant","content":"', array_join(slice(ws, 6, 5), ' '),
        |      '"}]') AS convo
        |  FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents)),
        |t AS (
        |  SELECT doc_id, pos, turn.role AS role, turn.content AS content
        |  FROM c
        |  LATERAL VIEW posexplode(from_json(convo,
        |    'array<struct<role:string,content:string>>')) x AS pos, turn)
        |SELECT doc_id, cast(pos as int) AS pos, role, md5(content) AS content_md5,
        |  cast(size(split(content, ' ')) as int) AS n_tokens
        |FROM t
        |ORDER BY doc_id, pos""".stripMargin),

    // argmin/argmax + conditional aggregate breadth: max_by/min_by with a
    // uniqueness-keyed ordering (ties would be engine-lottery otherwise),
    // count_if, bool_and/bool_or
    "q220_argminmax" -> sqlQuery(Seq("customer"),
      """SELECT c_nationkey,
        |  max_by(c_name, c_acctbal * 100000 + c_custkey) AS richest,
        |  min_by(c_name, c_acctbal * 100000 + c_custkey) AS poorest,
        |  cast(count_if(c_acctbal > 5000.0) as bigint) AS n_rich,
        |  bool_and(c_acctbal >= 0.0 OR c_mktsegment IS NOT NULL) AS all_ok,
        |  bool_or(c_acctbal < 0.0) AS any_negative,
        |  round(cast(max(c_acctbal) as double), 2) AS max_bal
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin),

    // planar k-means clustering (KMeans.cluster): deterministic seeding,
    // decimal-pinned centroid updates — 4 Lloyd iterations reproduce
    // bit-identically in the chained-CTE oracle
    "q221_kmeans" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val pts = s.sql(
        s"""SELECT c_custkey, $custX AS px, $custY AS py
           |FROM customer WHERE c_custkey <= 600""".stripMargin)
      graft.spatial.KMeans.cluster(pts, "c_custkey", "px", "py", k = 4, iters = 4)
        .orderBy("c_custkey")
    }),

    // RFM segmentation: recency/frequency/monetary quartiles with
    // unique-key tie-breaks so every ntile boundary is deterministic.
    // Exact ntile needs a total order (one sort per dimension over the
    // per-customer aggregate — far smaller than the fact table); the
    // at-scale alternative is histogram-sketch thresholds (Sketch.
    // histQuantiles) + bucket-by-comparison at the cost of exactness
    "q222_rfm" -> sqlQuery(Seq("orders"),
      """WITH m AS (
        |  SELECT o_custkey AS cust,
        |    max(o_orderdate) AS last_order,
        |    cast(count(*) as bigint) AS freq,
        |    cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |b AS (
        |  SELECT cust,
        |    ntile(4) OVER (ORDER BY last_order, cust) AS r_bucket,
        |    ntile(4) OVER (ORDER BY freq, cust) AS f_bucket,
        |    ntile(4) OVER (ORDER BY monetary, cust) AS m_bucket
        |  FROM m)
        |SELECT concat(r_bucket, f_bucket, m_bucket) AS segment,
        |  cast(count(*) as bigint) AS n_customers,
        |  min(cust) AS first_cust
        |FROM b GROUP BY r_bucket, f_bucket, m_bucket
        |ORDER BY segment""".stripMargin),

    // proximity clustering (ST_ClusterWithin-shape): pairs within D via
    // 2-D cell replication (each pair meets on exactly one key — the
    // unreplicated side's cell), then connected components; squared
    // distances compare in exact integer arithmetic
    "q223_clusterwithin" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "customer")
      val dd = 8.0
      val pts = s.sql(
        s"""SELECT c_custkey AS id, $custX AS x, $custY AS y
           |FROM customer WHERE c_custkey <= 300""".stripMargin)
        .localCheckpoint()
      val cellX = floor(col("x") / dd).cast("long")
      val cellY = floor(col("y") / dd).cast("long")
      val left = pts.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        cellX.as("cx"), cellY.as("cy"))
      val right = pts
        .withColumn("cx", explode(array(cellX - 1, cellX, cellX + 1)))
        .withColumn("cy", explode(array(cellY - 1, cellY, cellY + 1)))
        .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
          col("cx"), col("cy"))
      val pairs = left.join(right, Seq("cx", "cy"))
        .filter(col("id_a") < col("id_b"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
                (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(dd * dd))
        .select("id_a", "id_b")
      graft.pipeline.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .join(pts.select(col("id")), Seq("id"), "right")
        .select(col("id").as("c_custkey"),
          coalesce(col("component"), col("id")).as("cluster"))
        .orderBy("c_custkey")
    }),

    // multimodal decode, oracle-verified: binary payload column through the
    // partition-wise mapPartitions batch (the mapInPandas shape), with the
    // md5-layout FakeCodec so DuckDB recomputes width/height/luma exactly
    "q224_image_decode" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      val payloads = s.sql(
        """SELECT doc_id, source,
          |  cast(concat('IMG:', cast(doc_id as string), ':', text) as binary) AS payload
          |FROM documents""".stripMargin)
      graft.pipeline.Multimodal.decodeImagesMd5(payloads, "payload")
        .selectExpr("doc_id", "decoded_width", "decoded_height", "mean_luma")
        .orderBy("doc_id")
    }),

    // image near-dup fingerprinting: tiled average-hash (image_ahash) —
    // an 8-char overlay perturbs only the tiles it covers, so the mangled
    // twin sits at small Hamming distance while unrelated images do not;
    // every hash bit recomputes in SQL (md5 tile arithmetic)
    "q225_image_ahash" -> sqlQuery(Seq("documents"),
      """WITH s AS (SELECT doc_id, concat('IMG:', text) AS s FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    image_ahash(cast(s as binary)) AS ah,
        |    image_ahash(cast(concat(
        |      substring(s, 1, cast(floor(length(s) / 2) as int)), 'XXXXXXXX',
        |      substring(s, cast(floor(length(s) / 2) as int) + 9)) as binary)) AS ah_twin
        |  FROM s)
        |SELECT a.doc_id,
        |  cast(bit_count(a.ah ^ a.ah_twin) as int) AS h_twin,
        |  cast(bit_count(a.ah ^ b.ah) as int) AS h_next
        |FROM h a JOIN h b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin),

    // SemDeDup (Abbas et al. 2023): k-means cells over the embedding
    // space, drop rows with an earlier cell-mate above the cosine
    // threshold. Deterministic Lloyd cells => the kept set is exact and
    // cross-engine reproducible.
    "q226_semdedup" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      Dedup.semanticDedup(emb, "vec_id", "embedding", cents, threshold = 0.3)
        .orderBy("id")
    }),

    // BPE tokenizer training (Sennrich et al. 2016): 5 merge rounds over
    // the corpus vocabulary; integer pair counts + lexicographic
    // tie-break => a total order both engines reproduce exactly.
    "q227_bpe_train" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Bpe.bpeMerges(docs, "text", rounds = 5).orderBy("round")
    }),

    // Encode with the learned merges: train on the full corpus, apply the
    // merge chain as per-row literal replaces (no shuffle on the encode
    // side), one row per (word position, subword symbol).
    "q228_bpe_encode" -> ((s: SparkSession, dir: String) => {
      init(s)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val merges = Bpe.bpeMerges(docs, "text", rounds = 5)
        .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.bpeEncode(docs.filter(col("doc_id") < 20), "doc_id", "text", merges)
        .orderBy("doc_id", "word_pos", "sym_pos")
    }),

    // Hybrid retrieval: BM25 arm (the q159 scoring) + dense cosine arm,
    // fused by reciprocal-rank fusion (Cormack et al. 2009, k=60).
    // Ranks are integers and the fusion is two exact double divisions,
    // so the fused ordering is engine-independent.
    "q230_rrf_fusion" -> sqlQuery(Seq("documents", "embeddings"),
      s"""WITH tok AS (
         |  SELECT doc_id, term FROM (
         |    SELECT doc_id, explode(split(lower(text), '[^a-z]+')) AS term
         |    FROM documents WHERE doc_id < 2000) WHERE term != ''),
         |pd AS (SELECT doc_id, cast(count(*) as double) AS dl,
         |         cast(sum(CASE WHEN term = 'query'  THEN 1 ELSE 0 END) as double) AS tfq,
         |         cast(sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) as double) AS tfv,
         |         cast(sum(CASE WHEN term = 'merge'  THEN 1 ELSE 0 END) as double) AS tfm
         |       FROM tok GROUP BY doc_id),
         |st AS (SELECT cast(count(*) as double) AS n, avg(dl) AS avgdl FROM pd),
         |df AS (SELECT cast(sum(CASE WHEN tfq > 0 THEN 1 ELSE 0 END) as double) AS dfq,
         |         cast(sum(CASE WHEN tfv > 0 THEN 1 ELSE 0 END) as double) AS dfv,
         |         cast(sum(CASE WHEN tfm > 0 THEN 1 ELSE 0 END) as double) AS dfm
         |       FROM pd),
         |sc AS (
         |  SELECT pd.doc_id,
         |    log((st.n - df.dfq + 0.5) / (df.dfq + 0.5) + 1.0) * pd.tfq * 2.2
         |      / (pd.tfq + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
         |    log((st.n - df.dfv + 0.5) / (df.dfv + 0.5) + 1.0) * pd.tfv * 2.2
         |      / (pd.tfv + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
         |    log((st.n - df.dfm + 0.5) / (df.dfm + 0.5) + 1.0) * pd.tfm * 2.2
         |      / (pd.tfm + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) AS score
         |  FROM pd CROSS JOIN st CROSS JOIN df
         |  WHERE pd.tfq + pd.tfv + pd.tfm > 0),
         |-- each arm's global top-50 is ORDER BY + LIMIT (planned as
         |-- TakeOrderedAndProject: per-partition heaps, no global window
         |-- funnel); the rank window then runs on 50 rows only
         |sparse AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rs
         |  FROM (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 50)),
         |dense AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS rd
         |  FROM (
         |    SELECT vec_id AS doc_id,
         |      cosine_sim(embedding, array(${queryVec.map(v => s"${v}D").mkString(", ")})) AS c
         |    FROM embeddings ORDER BY c DESC, doc_id LIMIT 50)),
         |fused AS (
         |  SELECT coalesce(s.doc_id, d.doc_id) AS doc_id, s.rs, d.rd,
         |    coalesce(1.0D / (60 + s.rs), 0.0D) + coalesce(1.0D / (60 + d.rd), 0.0D) AS rrf
         |  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id)
         |SELECT rnk, doc_id, rs, rd, round(rrf, 6) AS rrf
         |FROM (SELECT *, cast(row_number() OVER (ORDER BY rrf DESC, doc_id) as int) AS rnk
         |      FROM fused)
         |WHERE rnk <= 10 ORDER BY rnk""".stripMargin),

    // PCA leading component by 3 power-iteration rounds over the
    // decimal-fold covariance (one distributed moment pass, driver-side
    // deterministic iteration — the codebook pattern); output = centered
    // projections onto PC1.
    "q229_pca_power" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val (mu, v, _) = Pca.topComponent(emb, "embedding", dim = 64, iters = 3)
      emb.filter(col("vec_id") < 100)
        .select(col("vec_id"),
          (round(Pca.projectCol(col("embedding"), mu, v), 6) + lit(0.0)).as("pc1"))
        .orderBy("vec_id")
    }),

    // String-similarity family for record linkage / fuzzy dedup: Spark's
    // native levenshtein next to the graft kernels — unrestricted
    // Damerau-Levenshtein, equal-length Hamming, distinct-byte-set
    // Jaccard (an exact int/int double), Jaro-Winkler (0.7 boost
    // threshold). Inputs are sentinel-prefixed printable-ASCII slices so
    // byte and codepoint semantics coincide across engines.
    "q231_string_sim" -> sqlQuery(Seq("documents"),
      """WITH p AS (SELECT doc_id,
        |  concat('#', regexp_replace(substring(text, 1, 32), '[^ -~]', '')) AS s
        |  FROM documents)
        |SELECT a.doc_id,
        |  levenshtein(a.s, b.s) AS lev,
        |  damerau_levenshtein(a.s, b.s) AS dlev,
        |  hamming_dist(rpad(a.s, 16, '.'), rpad(b.s, 16, '.')) AS ham,
        |  char_jaccard(a.s, b.s) AS cj,
        |  round(jaro_winkler(a.s, b.s), 4) + 0.0 AS jw
        |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin),

    // Bounded Bellman-Ford SSSP over a lineitem-derived weighted graph:
    // 4 relaxation rounds = min-cost path using <= 4 hops; decimal-pinned
    // distances make every round bit-exact cross-engine (oracle unrolls
    // the same rounds as chained CTEs).
    "q232_bellman_ford" -> ((s: SparkSession, dir: String) => {
      init(s)
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val edges = li.select(
        (col("l_orderkey") % 1000).as("src"),
        (col("l_partkey") % 1000).as("dst"),
        col("l_quantity").as("w"))
      graft.relational.Graph.bellmanFord(edges, "src", "dst", "w", source = 0L, rounds = 4)
        .select(col("node").cast("int").as("node"),
          col("dist").cast("double").as("dist"))
        .orderBy("node")
    }),

    // Constraint-suite audit (the Deequ/Great-Expectations publish gate):
    // row rules in ONE scan of orders, plus uniqueness and two
    // referential-integrity checks — all emitting one long-format report.
    "q233_quality_audit" -> ((s: SparkSession, dir: String) => {
      init(s)
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
      val customer = s.read.parquet(s"$dir/customer.parquet")
      import graft.relational.Profile
      // row rules + pk uniqueness share ONE orders scan (audit's merged
      // agg); each FK check is one single-scan join-agg — 3 scans of
      // orders+lineitem total instead of the former 7
      Profile.audit(orders, Seq(
          "orders_custkey_null" -> col("o_custkey").isNull,
          "orders_nonpositive_total" -> (col("o_totalprice") <= 0),
          "orders_bad_status" -> !col("o_orderstatus").isin("O", "F")),
          uniqueKeys = Seq("orders_pk_unique" -> Seq("o_orderkey")))
        .unionByName(Profile.referentialCheck(
          lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_orderkey_fk"))
        .unionByName(Profile.referentialCheck(
          orders, "o_custkey", customer, "c_custkey", "orders_custkey_fk"))
        .orderBy("check_name")
    }),

    // Blocklist-word density (the C4 badwords step): broadcast word-list
    // join over exploded tokens — no regexp alternation, no shuffle on
    // the token.
    "q234_blocklist" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      graft.pipeline.Corpus.blocklistStats(s.table("documents"), "doc_id", "text",
          words = Seq("slow", "crash", "spam", "leak", "noise"), maxRatio = 0.005)
        .orderBy("doc_id")
    }),

    // Interpolated bigram LM scoring (Jelinek-Mercer, lambda=0.7): the
    // word-order quality signal the unigram model (q87) cannot see.
    // Bigrams come from zipping adjacent slices of the per-row token
    // array — no position window; ln() pinned by the round+decimal fold.
    "q235_bigram_lm" -> ((s: SparkSession, dir: String) => {
      init(s)
      view(s, dir, "documents")
      TextAnalysis.bigramLogProb(s.table("documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Record linkage: block on (nation, stable name prefix), score
    // candidates with the weighted string-similarity family, keep the
    // top match per dirty row (rounded-score ranking, key tie-break).
    // The dirty side swaps the last two name characters, so most rows
    // re-link to themselves but digit-palindrome collisions ('...12' ->
    // '...21') legitimately match the OTHER real customer — the classic
    // linkage failure mode, reproduced deterministically.
    "q236_record_linkage" -> sqlQuery(Seq("customer"),
      """WITH dirty AS (
        |  SELECT c_custkey AS d_key, c_nationkey AS d_nation,
        |    concat(substring(c_name, 1, length(c_name) - 2),
        |           substring(c_name, length(c_name), 1),
        |           substring(c_name, length(c_name) - 1, 1)) AS d_name,
        |    c_mktsegment AS d_seg
        |  FROM customer),
        |cand AS (
        |  SELECT d.d_key, c.c_custkey,
        |    round(0.5 * jaro_winkler(d.d_name, c.c_name) +
        |          0.3 * (1.0 - cast(levenshtein(d.d_name, c.c_name) as double) /
        |                 greatest(length(d.d_name), length(c.c_name))) +
        |          0.2 * char_jaccard(d.d_seg, c.c_mktsegment), 6) AS score
        |  FROM dirty d JOIN customer c
        |    ON d.d_nation = c.c_nationkey
        |   AND substring(d.d_name, 1, 16) = substring(c.c_name, 1, 16))
        |SELECT d_key, c_custkey AS matched_key, score + 0.0 AS score,
        |  d_key = c_custkey AS correct
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY d_key ORDER BY score DESC, c_custkey) AS rn
        |      FROM cand)
        |WHERE rn = 1 ORDER BY d_key""".stripMargin),

    // 2-D skyline (Pareto frontier) of customers on (order count, total
    // spend): grid-prune + one distinct-pair window — never the O(n^2)
    // NOT EXISTS self-join the oracle states.
    "q237_skyline" -> ((s: SparkSession, dir: String) => {
      init(s)
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val per = orders.groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(20,2)")).as("__spend"))
        .select(col("o_custkey"), col("n_orders"),
          col("__spend").cast("double").as("spend"))
      graft.relational.Skyline.skyline2(per, "n_orders", "spend")
        .orderBy("o_custkey")
    }),

    // Johnson-Lindenstrauss random-projection retrieval: md5-derived
    // uniform planes (the q42 cross-engine derivation) project 64 dims to
    // 16; shortlist by projected cosine, exact full-dim re-rank. The
    // narrow-index-column ANN pattern completing the quantization family
    // (PQ/SQ8/BQ/matryoshka).
    "q238_jl_projection" -> ((s: SparkSession, dir: String) => {
      init(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.jlTopK(emb, "vec_id", "embedding", dim = 64, query = queryVec,
          proj = 16, shortlist = 50, k = 10)
        .select(col("rnk"), col("vec_id"),
          (round(col("cosine"), 6) + lit(0.0)).as("cosine"))
        .orderBy("rnk")
    }),

    // Polygon ring-orientation family (PostGIS ST_ForcePolygonCW/CCW +
    // ST_IsPolygonCW/CCW): winding flips preserve ring starts, area is
    // orientation-invariant, non-areal input -> null predicate.
    "q239_ring_orientation" -> sqlQuery(Seq("customer"),
      s"""WITH g AS (
         |  SELECT c_custkey,
         |    cast(c_custkey % 360 - 180 as bigint) AS x0,
         |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
         |    cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x1,
         |    cast((c_custkey * 7) % 160 - 80 + c_custkey % 10 + 1 as bigint) AS y1
         |  FROM customer),
         |p AS (SELECT c_custkey, x0, y0,
         |        st_makeenvelope(cast(x0 as double), cast(y0 as double),
         |                        cast(x1 as double), cast(y1 as double)) AS poly
         |      FROM g)
         |SELECT c_custkey,
         |  st_ispolygonccw(poly) AS orig_ccw,
         |  st_ispolygoncw(poly) AS orig_cw,
         |  st_astext(st_forcepolygoncw(poly)) AS wkt_cw,
         |  st_ispolygoncw(st_forcepolygoncw(poly)) AS cw_after,
         |  st_ispolygonccw(st_forcepolygonccw(st_forcepolygoncw(poly))) AS ccw_roundtrip,
         |  round(st_area(st_forcepolygoncw(poly)), 6) + 0.0 AS area_kept,
         |  st_ispolygoncw(st_point(cast(x0 as double), cast(y0 as double))) AS point_null
         |FROM p ORDER BY c_custkey""".stripMargin),

    // Pairwise association rules (the 2-itemset Apriori slice) over
    // order baskets: support / confidence / lift from one basket-key
    // self-join with map-side-combined pair counts.
    "q240_assoc_rules" -> ((s: SparkSession, dir: String) => {
      init(s)
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("basket"), (col("l_partkey") % 50).as("item"))
      graft.relational.Assoc.pairRules(li, "basket", "item", minSupport = 50L)
        .orderBy("ante", "cons")
    })
  )

  // ------------------------------------------------------------- oracles

  /** Haversine formula matching graft.geom.Geodesy.haversine (R=6371008.8). */
  private def havSql(x: String, y: String): String =
    s"""round(2.0 * 6371008.8 * asin(least(1.0, sqrt(
       |  sin(radians($y) / 2) * sin(radians($y) / 2) +
       |  cos(0.0) * cos(radians($y)) * sin(radians($x) / 2) * sin(radians($x) / 2)
       |))), 2)""".stripMargin

  private val oCustX = "cast(c_custkey % 360 - 180 as double)"
  private val oCustY = "cast((c_custkey * 7) % 160 - 80 as double)"
  private val oSide = "cast(c_custkey % 10 + 1 as double)"

  // ---- shared CTE builders for the ANN oracles (q52/q84/q93): the exact
  // SQL replay of trainIvfCentroids / trainPqCodebooks / pqAdcTopK.
  // Requires a CTE `v(vec_id, v)` of 64-dim double lists (and `q(v)` for
  // the ADC luts). Every double is bit-identical to the Scala kernels:
  // sequential list_dot_product accumulation, exact decimal(28,10) mean
  // fold, strict-argmax ties to the lowest centroid index.

  /** Full-dim argmax-cosine assignment of `v` rows to centroid CTE
    * `cents(c, v)` (NearestCentroid replay). */
  /** Bootstrap-AUC tail over a `scored_id(doc_id, score, y)` relation:
    * 20 deterministic Poisson(1) resamples (integer weights from the
    * md5-uniform `uExpr` against cumulative-probability thresholds),
    * weighted tie-aware rank AUC per resample through an integer-exact
    * doubled numerator, then the mean and 5/95 percentile band. `uExpr`
    * and `pctl` carry the only engine-specific spellings. */
  private def bootstrapAucTail(uExpr: String, pctl: (String, String) => String): String = {
    val bVals = (0 until 20).map(b => s"($b)").mkString(", ")
    s"""boots AS (SELECT * FROM (VALUES $bVals) AS t(b)),
       |wts AS (
       |  SELECT doc_id, score, y, b,
       |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3 ELSE 4 END AS w
       |  FROM (SELECT s.doc_id AS doc_id, s.score AS score, s.y AS y, t.b AS b,
       |          $uExpr AS u
       |        FROM scored_id s CROSS JOIN boots t) x),
       |per_score AS (
       |  SELECT b, score,
       |    cast(sum(CASE WHEN y = 1.0 THEN w ELSE 0 END) as bigint) AS wp,
       |    cast(sum(CASE WHEN y = 0.0 THEN w ELSE 0 END) as bigint) AS wn
       |  FROM wts GROUP BY b, score),
       |cum AS (
       |  SELECT b, score, wp, wn,
       |    sum(wn) OVER (PARTITION BY b ORDER BY score) - wn AS wn_below
       |  FROM per_score),
       |tot AS (
       |  SELECT b, cast(sum(wp) as bigint) AS wp_t, cast(sum(wn) as bigint) AS wn_t
       |  FROM per_score GROUP BY b),
       |aucs AS (
       |  SELECT b, cast(sum(cast(wp * (2 * wn_below + wn) as decimal(38,0))) as double)
       |    AS num2
       |  FROM cum GROUP BY b),
       |res AS (
       |  SELECT a.b, a.num2 / (2.0 * t.wp_t * t.wn_t) AS auc
       |  FROM aucs a JOIN tot t ON a.b = t.b)
       |SELECT cast(count(*) as bigint) AS n_boot,
       |  round(cast(sum(cast(round(auc, 9) as decimal(20,9))) as double)
       |    / count(*), 6) + 0.0 AS mean_auc,
       |  round(${pctl("auc", "0.05")}, 6) + 0.0 AS p05,
       |  round(${pctl("auc", "0.95")}, 6) + 0.0 AS p95
       |FROM res""".stripMargin
  }

  private def annAssign(out: String, cents: String): String =
    s"""$out AS (SELECT vec_id, v, c FROM (
       |  SELECT v.vec_id, v.v, cc.c, row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |    list_dot_product(v.v, cc.v) /
       |    (sqrt(list_dot_product(v.v, v.v)) * sqrt(list_dot_product(cc.v, cc.v))) DESC,
       |    cc.c) AS rn
       |  FROM v CROSS JOIN $cents cc) WHERE rn = 1)""".stripMargin

  /** c0 init: the k smallest-id vectors, centroid index = rank. */
  private def annInit(k: Int): String =
    s"""c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
       |       FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT $k))""".stripMargin

  /** One Lloyd round c{k-1} -> c{k}: assign, decimal-fold per-dim means,
    * keep the old coordinate where a cluster got no rows. */
  private def annLloyd(k: Int): String =
    s"""${annAssign(s"a$k", s"c${k - 1}")},
       |m$k AS (SELECT a.c, d.d,
       |    cast(sum(cast(a.v[d.d + 1] as decimal(28,10))) as double) / count(*) AS m
       |  FROM a$k a CROSS JOIN range(64) d(d) GROUP BY a.c, d.d),
       |c$k AS (SELECT c.c, list(coalesce(m.m, c.v[d.d + 1]) ORDER BY d.d) AS v
       |  FROM c${k - 1} c CROSS JOIN range(64) d(d)
       |  LEFT JOIN m$k m ON m.c = c.c AND m.d = d.d
       |  GROUP BY c.c)""".stripMargin

  /** nProbe-calibration replay (Similarity.calibrateNProbe): sample = the
    * `nQueries` smallest ids; `crank` = each query's centroid preference
    * order; exact top-`k` per query EXCLUDING the query row itself; then
    * every candidate budget's recall off the same table. Emits CTEs up to
    * `calrec(n_probe, hits, recall)` and `calsel(nsel, recall)` (the
    * smallest budget reaching `target`, else kCells). Expects `v` and a
    * trained `c2` in scope (annInit/annLloyd). */
  private def annCalCtes(kCells: Int, k: Int, target: Double, nQueries: Int): String =
    s"""calq AS (SELECT vec_id AS qid, v AS qv FROM v ORDER BY vec_id LIMIT $nQueries),
       |calcr AS (SELECT qid, cell, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, cell) AS crank FROM (
       |  SELECT q.qid, cc.c AS cell,
       |    list_dot_product(q.qv, cc.v) /
       |    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cc.v, cc.v))) AS cos
       |  FROM calq q CROSS JOIN c2 cc) x),
       |caltop AS (SELECT qid, vec_id, c FROM (
       |  SELECT q.qid, a.vec_id, a.c, row_number() OVER (PARTITION BY q.qid ORDER BY
       |    list_dot_product(a.v, q.qv) /
       |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
       |    a.vec_id) AS rn
       |  FROM af a CROSS JOIN calq q WHERE a.vec_id != q.qid) x WHERE rn <= $k),
       |calbr AS (SELECT cr.crank, count(*) AS c FROM caltop t
       |  JOIN calcr cr ON cr.qid = t.qid AND cr.cell = t.c GROUP BY cr.crank),
       |calrec AS (SELECT n.n AS n_probe, cast(coalesce(sum(b.c), 0) as bigint) AS hits,
       |    round(cast(coalesce(sum(b.c), 0) as double) / ${nQueries * k}.0, 6) + 0.0 AS recall
       |  FROM range(1, ${kCells + 1}) n(n) LEFT JOIN calbr b ON b.crank <= n.n
       |  GROUP BY n.n),
       |calsel AS (SELECT coalesce((SELECT min(n_probe) FROM calrec WHERE recall >= $target),
       |    $kCells) AS nsel,
       |  (SELECT recall FROM calrec WHERE n_probe = coalesce(
       |    (SELECT min(n_probe) FROM calrec WHERE recall >= $target), $kCells)) AS recall)""".stripMargin

  /** PQ codebook training (m=8 subspaces x k=16 x 8 dims, 2 Lloyd rounds)
    * + per-subspace code assignment `enc` + ADC partial sums `adc(vec_id,
    * dotsum, normsum)` — dl/nl folded in explicit j order so the sums add
    * exactly like the Scala left-fold reduce. */
  private def pqOracleCtes: String = {
    def basg(out: String, books: String) =
      s"""$out AS (SELECT vec_id, j, c FROM (
         |  SELECT v.vec_id, b.j, b.c, row_number() OVER (PARTITION BY v.vec_id, b.j ORDER BY
         |    list_dot_product(v.v[b.j * 8 + 1 : b.j * 8 + 8], b.v) /
         |    (sqrt(list_dot_product(v.v[b.j * 8 + 1 : b.j * 8 + 8],
         |                           v.v[b.j * 8 + 1 : b.j * 8 + 8])) *
         |     sqrt(list_dot_product(b.v, b.v))) DESC, b.c) AS rn
         |  FROM v CROSS JOIN $books b) WHERE rn = 1)""".stripMargin
    def round(k: Int) =
      s"""${basg(s"basg$k", s"books${k - 1}")},
         |bm$k AS (SELECT d.d, a.c AS cl,
         |    cast(sum(cast(v.v[d.d + 1] as decimal(28,10))) as double) / count(*) AS m
         |  FROM v CROSS JOIN range(64) d(d)
         |  JOIN basg$k a ON a.vec_id = v.vec_id AND a.j = d.d // 8
         |  GROUP BY d.d, a.c),
         |books$k AS (SELECT b.j, b.c, list(coalesce(m.m, b.v[i.i + 1]) ORDER BY i.i) AS v
         |  FROM books${k - 1} b CROSS JOIN range(8) i(i)
         |  LEFT JOIN bm$k m ON m.d = b.j * 8 + i.i AND m.cl = b.c
         |  GROUP BY b.j, b.c)""".stripMargin
    s"""books0 AS (SELECT j.j AS j, s.c AS c, s.v[j.j * 8 + 1 : j.j * 8 + 8] AS v
       |  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
       |        FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 16)) s
       |  CROSS JOIN range(8) j(j)),
       |${round(1)},
       |${round(2)},
       |${basg("enc", "books2")},
       |luts AS (SELECT b.j, b.c,
       |    list_dot_product(b.v, q.v[b.j * 8 + 1 : b.j * 8 + 8]) AS dotv,
       |    list_dot_product(b.v, b.v) AS normv
       |  FROM books2 b CROSS JOIN q),
       |adcarr AS (SELECT e.vec_id, list(l.dotv ORDER BY e.j) AS dl,
       |    list(l.normv ORDER BY e.j) AS nl
       |  FROM enc e JOIN luts l ON l.j = e.j AND l.c = e.c GROUP BY e.vec_id),
       |adc AS (SELECT vec_id,
       |    dl[1]+dl[2]+dl[3]+dl[4]+dl[5]+dl[6]+dl[7]+dl[8] AS dotsum,
       |    nl[1]+nl[2]+nl[3]+nl[4]+nl[5]+nl[6]+nl[7]+nl[8] AS normsum
       |  FROM adcarr)""".stripMargin
  }

  /** BPE training replay for the q227/q228/q307 oracles: vocabulary
    * reduction + `rounds` unrolled merge rounds. Each m$r is the argmax
    * pair (weighted count desc, pair asc); each w$r applies the literal
    * space-bounded replace exactly like [[graft.pipeline.Bpe.bpeMerges]].
    * MATERIALIZED is load-bearing at deep round counts: without it DuckDB
    * re-inlines each w$r chain per reference (multiplicative plan blowup,
    * and one parquet open per inlined scan — 256 rounds exhausted the fd
    * limit before it exhausted the optimizer). */
  private def bpeTrainCtes(rounds: Int, from: String = "documents",
      textExpr: String = "text"): String = {
    val round = (1 to rounds).map { r =>
      s"""p$r AS (SELECT pair, cast(sum(cnt) as bigint) AS f FROM (
         |  SELECT cnt, unnest(CASE WHEN len(s) >= 2
         |      THEN list_transform(range(1, len(s)), i -> s[i] || ' ' || s[i + 1])
         |      ELSE [] END) AS pair
         |  FROM (SELECT cnt, string_split(trim(sym), ' ') AS s FROM w${r - 1}))
         |  GROUP BY pair),
         |m$r AS MATERIALIZED (SELECT pair, f FROM p$r ORDER BY f DESC, pair LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, cnt, replace(sym, (SELECT ' ' || pair || ' ' FROM m$r),
         |    (SELECT ' ' || replace(pair, ' ', '') || ' ' FROM m$r)) AS sym
         |  FROM w${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""wc AS MATERIALIZED (SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_extract_all(trim($textExpr), '\\S+')) AS word FROM $from)
       |  GROUP BY word),
       |w0 AS MATERIALIZED (SELECT word, cnt,
       |    ' ' || array_to_string(list_transform(range(length(word)),
       |        i -> word[i + 1 : i + 1]), ' ') || ' ' AS sym
       |  FROM wc),
       |$round""".stripMargin
  }

  /** WordPiece train rounds as unrolled CTEs: the q307 BPE chain plus a
    * per-round symbol-count table; the pick maximizes
    * f/(sf(lhs)*sf(rhs)), ties on the pair string. */
  private def wordPieceTrainCtes(rounds: Int, from: String,
      textExpr: String): String = {
    val round = (1 to rounds).map { r =>
      s"""p$r AS (SELECT pair, cast(sum(cnt) as bigint) AS f FROM (
         |  SELECT cnt, unnest(CASE WHEN len(s) >= 2
         |      THEN list_transform(range(1, len(s)), i -> s[i] || ' ' || s[i + 1])
         |      ELSE [] END) AS pair
         |  FROM (SELECT cnt, string_split(trim(sym), ' ') AS s FROM w${r - 1}))
         |  GROUP BY pair),
         |u$r AS (SELECT s AS sym, cast(sum(cnt) as bigint) AS sf FROM (
         |  SELECT cnt, unnest(string_split(trim(sym), ' ')) AS s FROM w${r - 1})
         |  GROUP BY s),
         |m$r AS MATERIALIZED (SELECT pair, f, score FROM (
         |  SELECT p.pair, p.f,
         |    cast(p.f as double) / (cast(ua.sf as double) * cast(ub.sf as double)) AS score
         |  FROM p$r p
         |  JOIN u$r ua ON ua.sym = split_part(p.pair, ' ', 1)
         |  JOIN u$r ub ON ub.sym = split_part(p.pair, ' ', 2))
         |  ORDER BY score DESC, pair LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, cnt, replace(sym, (SELECT ' ' || pair || ' ' FROM m$r),
         |    (SELECT ' ' || replace(pair, ' ', '') || ' ' FROM m$r)) AS sym
         |  FROM w${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""wc AS MATERIALIZED (SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_extract_all(trim($textExpr), '\\S+')) AS word FROM $from)
       |  GROUP BY word),
       |w0 AS MATERIALIZED (SELECT word, cnt,
       |    ' ' || array_to_string(list_transform(range(length(word)),
       |        i -> word[i + 1 : i + 1]), ' ') || ' ' AS sym
       |  FROM wc),
       |$round""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity as decimal(20,2))) as double) AS sum_qty,
        |  cast(sum(cast(l_extendedprice as decimal(20,2))) as double) AS sum_price,
        |  cast(count(*) as bigint) AS cnt
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join_agg" ->
      """SELECT n.n_name AS nation,
        |  cast(sum(cast(o.o_totalprice as decimal(20,2))) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,

    "q3_window" ->
      """SELECT o_custkey, o_orderkey, cast(o_orderdate as date) AS od
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q4_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q5_setop" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin,

    "q6_filter_prune" ->
      """SELECT
        |  cast(sum(cast(l_extendedprice as decimal(20,2))) as double) AS revenue,
        |  cast(count(*) as bigint) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q7_events_agg" ->
      """SELECT event_type, cast(ts as date) AS day,
        |  cast(count(*) as bigint) AS n_events,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total_value,
        |  cast(count(DISTINCT user_id) as bigint) AS users
        |FROM events
        |GROUP BY event_type, cast(ts as date)
        |ORDER BY event_type, day""".stripMargin,

    "q8_topk_per_group" ->
      """SELECT n_name, s_suppkey, s_acctbal, rnk FROM (
        |  SELECT n.n_name, s.s_suppkey, s.s_acctbal,
        |    row_number() OVER (PARTITION BY n.n_name
        |                       ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rnk
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |WHERE rnk <= 3
        |ORDER BY n_name, rnk""".stripMargin,

    "q9_semi_anti" ->
      """SELECT
        |  (SELECT cast(count(*) as bigint) FROM customer c
        |   WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
        |  (SELECT cast(count(*) as bigint) FROM customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""".stripMargin,

    "q46_time_window" ->
      """SELECT time_bucket(INTERVAL '6 hours', ts) AS ws, event_type,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total
        |FROM events
        |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "q47_part_region_join" ->
      """SELECT r.r_name AS region, p.p_brand AS brand,
        |  cast(sum(cast(l.l_extendedprice as decimal(20,2))) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_items
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE p.p_size <= 10
        |GROUP BY r.r_name, p.p_brand
        |ORDER BY region, brand""".stripMargin,

    "q45_geodesic_methods" ->
      s"""SELECT c_custkey,
         |  round(6378137.0 * radians(abs($oCustX / 4.0)), 2) AS vin_m,
         |  round(6378137.0 * radians(abs($oCustX / 4.0)), 2) AS geo_m
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q29_dwithin" ->
      s"""SELECT c_custkey,
         |  (sqrt($oCustX * $oCustX + $oCustY * $oCustY) <= 90.0) AS near_origin
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q10_geo_accessors" ->
      s"""SELECT c_custkey,
         |  $oCustX AS px, $oCustY AS py,
         |  0 AS tid, 1 AS npts, false AS empty
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q11_geo_translate" ->
      s"""SELECT c_custkey,
         |  $oCustX + 1.5 AS tx,
         |  $oCustY + 2.5 AS ty,
         |  2.0 * $oCustX + 10.0 AS ax
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q12_geo_area_length" ->
      s"""SELECT c_custkey,
         |  $oSide * $oSide AS area,
         |  4.0 * $oSide AS perimeter
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q13_geo_distance" ->
      s"""SELECT c_custkey,
         |  sqrt($oCustX * $oCustX + $oCustY * $oCustY) AS dist_origin
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q245_geoarrow_struct" ->
      s"""SELECT c_custkey,
         |  $oCustX + 1.5 AS tx, $oCustY + 2.5 AS ty,
         |  2.0 * $oCustX + 10.0 AS ax,
         |  sqrt($oCustX * $oCustX + $oCustY * $oCustY) AS dist_origin,
         |  $oSide * $oSide AS area, 4.0 * $oSide AS perimeter
         |FROM customer ORDER BY c_custkey""".stripMargin,

    // closed form on the 0.25 grid: exterior - hole + part2 areas;
    // perimeters 4s + s + 2s; WKB and struct paths emit the same values
    "q309_geoarrow_multipolygon" ->
      s"""SELECT c_custkey,
         |  $oSide * $oSide - ($oSide * 0.25) * ($oSide * 0.25)
         |    + ($oSide * 0.5) * ($oSide * 0.5) AS area_wkb,
         |  4.0 * $oSide + 4.0 * ($oSide * 0.25) + 4.0 * ($oSide * 0.5) AS perim_wkb,
         |  $oSide * $oSide - ($oSide * 0.25) * ($oSide * 0.25)
         |    + ($oSide * 0.5) * ($oSide * 0.5) AS area_struct,
         |  4.0 * $oSide + 4.0 * ($oSide * 0.25) + 4.0 * ($oSide * 0.5) AS perim_struct
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q14_geo_centroid" ->
      s"""SELECT c_custkey,
         |  $oCustX + $oSide / 2.0 AS cx,
         |  $oCustY + $oSide / 2.0 AS cy
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q15_geo_envelope" ->
      s"""SELECT c_custkey,
         |  $oCustX AS exmin, $oCustY AS eymin,
         |  $oCustX + $oSide AS exmax, $oCustY + $oSide AS eymax,
         |  5 AS hull_pts,
         |  $oSide * $oSide AS hull_area
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q16_geo_contains" ->
      s"""SELECT c_custkey,
         |  ($oCustX > -90 AND $oCustX < 90 AND $oCustY > -45 AND $oCustY < 45) AS in_box,
         |  ($oCustX > -90 AND $oCustX < 90 AND $oCustY > -45 AND $oCustY < 45) AS within_box,
         |  true AS self_isect
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q17_geo_geodesic" ->
      s"""SELECT c_custkey,
         |  ${havSql(s"$oCustX / 2.0", s"$oCustY / 2.0")} AS hav_m
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q18_geo_transform" ->
      s"""SELECT c_custkey,
         |  round(6378137.0 * radians($oCustX), 2) + 0.0 AS mercator_x,
         |  round(6378137.0 * ln(tan(pi() / 4 + radians($oCustY) / 2)), 2) + 0.0 AS mercator_y
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q19_geo_rotate_scale" ->
      s"""SELECT c_custkey,
         |  round(cos(radians(90)) * $oCustX - sin(radians(90)) * $oCustY, 6) + 0.0 AS rx,
         |  round(sin(radians(90)) * $oCustX + cos(radians(90)) * $oCustY, 6) + 0.0 AS ry,
         |  3.0 * $oCustX + 0.0 AS sx,
         |  round($oCustX + tan(radians(45)) * $oCustY, 6) + 0.0 AS kx,
         |  round($oCustX, 6) + 0.0 AS c90x,
         |  round($oCustX - $oSide / 2.0, 6) + 0.0 AS s2cx
         |FROM customer ORDER BY c_custkey""".stripMargin,

    // Snyder §15 (LCC 2SP) / §14 (Albers 2SP) ellipsoidal forwards on GRS80,
    // recomputed in closed form; DuckDB lateral alias reuse keeps the
    // constant chain readable
    "q243_conic_crs" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    cast(c_custkey % 140 as double) / 10.0 - 5.0 AS flon,
        |    41.0 + cast(c_custkey % 100 as double) / 10.0 AS flat,
        |    -116.0 + cast(c_custkey % 400 as double) / 10.0 AS ulon,
        |    25.0 + cast(c_custkey % 240 as double) / 10.0 AS ulat
        |  FROM customer WHERE c_custkey <= 400),
        |k AS (
        |  SELECT 6378137.0 AS a, 1.0/298.257222101 AS f, f*(2-f) AS es2, sqrt(f*(2-f)) AS es,
        |    cos(radians(44.0))/sqrt(1-es2*sin(radians(44.0))*sin(radians(44.0))) AS lm1,
        |    cos(radians(49.0))/sqrt(1-es2*sin(radians(49.0))*sin(radians(49.0))) AS lm2,
        |    tan(pi()/4 - radians(44.0)/2)/power((1-es*sin(radians(44.0)))/(1+es*sin(radians(44.0))), es/2) AS lt1,
        |    tan(pi()/4 - radians(49.0)/2)/power((1-es*sin(radians(49.0)))/(1+es*sin(radians(49.0))), es/2) AS lt2,
        |    tan(pi()/4 - radians(46.5)/2)/power((1-es*sin(radians(46.5)))/(1+es*sin(radians(46.5))), es/2) AS lt0,
        |    ln(lm1/lm2)/ln(lt1/lt2) AS ln_, lm1/(ln_*power(lt1, ln_)) AS lf,
        |    a*lf*power(lt0, ln_) AS lrho0,
        |    cos(radians(29.5))/sqrt(1-es2*sin(radians(29.5))*sin(radians(29.5))) AS am1,
        |    cos(radians(45.5))/sqrt(1-es2*sin(radians(45.5))*sin(radians(45.5))) AS am2,
        |    (1-es2)*(sin(radians(29.5))/(1-es2*sin(radians(29.5))*sin(radians(29.5)))
        |      - 1/(2*es)*ln((1-es*sin(radians(29.5)))/(1+es*sin(radians(29.5))))) AS aq1,
        |    (1-es2)*(sin(radians(45.5))/(1-es2*sin(radians(45.5))*sin(radians(45.5)))
        |      - 1/(2*es)*ln((1-es*sin(radians(45.5)))/(1+es*sin(radians(45.5))))) AS aq2,
        |    (1-es2)*(sin(radians(23.0))/(1-es2*sin(radians(23.0))*sin(radians(23.0)))
        |      - 1/(2*es)*ln((1-es*sin(radians(23.0)))/(1+es*sin(radians(23.0))))) AS aq0,
        |    (am1*am1 - am2*am2)/(aq2 - aq1) AS an, am1*am1 + an*aq1 AS ac,
        |    a*sqrt(ac - an*aq0)/an AS arho0),
        |prj AS (
        |  SELECT c_custkey, flon, ulat,
        |    a*lf*power(tan(pi()/4 - radians(flat)/2)
        |      /power((1-es*sin(radians(flat)))/(1+es*sin(radians(flat))), es/2), ln_) AS lrho,
        |    ln_*(radians(flon) - radians(3.0)) AS lth,
        |    700000.0 + lrho*sin(lth) AS lx, 6600000.0 + lrho0 - lrho*cos(lth) AS ly,
        |    (1-es2)*(sin(radians(ulat))/(1-es2*sin(radians(ulat))*sin(radians(ulat)))
        |      - 1/(2*es)*ln((1-es*sin(radians(ulat)))/(1+es*sin(radians(ulat))))) AS aqq,
        |    a*sqrt(ac - an*aqq)/an AS arho,
        |    an*(radians(ulon) - radians(-96.0)) AS ath,
        |    arho*sin(ath) AS ax, arho0 - arho*cos(ath) AS ay
        |  FROM pts CROSS JOIN k)
        |SELECT c_custkey,
        |  round(lx, 1) + 0.0 AS lcc_x, round(ly, 1) + 0.0 AS lcc_y,
        |  round(ax, 1) + 0.0 AS aea_x, round(ay, 1) + 0.0 AS aea_y,
        |  round(flon, 6) + 0.0 AS rt_lon, round(ulat, 6) + 0.0 AS rt_lat
        |FROM prj ORDER BY c_custkey""".stripMargin,

    // replays the exact Helmert chain (geodetic->geocentric on WGS84,
    // negated-parameter position-vector reverse, Bowring one-shot back to
    // geodetic on Airy 1830) term-for-term; rt_* echo the inputs (the
    // projection+datum roundtrip converges ~9 orders inside the rounding)
    "q247_datum_shift" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    -5.5 + cast(c_custkey % 60 as double) / 10.0 AS lon,
        |    50.0 + cast(c_custkey % 80 as double) / 10.0 AS lat
        |  FROM customer WHERE c_custkey <= 400),
        |k AS (
        |  SELECT 6378137.0e0 AS aw, 1.0/298.257223563 AS fw, fw*(2-fw) AS e2w,
        |    6377563.396e0 AS aa, 1.0/299.3249646 AS fa, fa*(2-fa) AS e2a,
        |    446.448e0 AS dx, -125.157e0 AS dy, 542.06e0 AS dz,
        |    radians(0.15/3600.0) AS rx, radians(0.247/3600.0) AS ry,
        |    radians(0.842/3600.0) AS rz,
        |    1.0 - (-20.489)*1e-6 AS m2),
        |xyz AS (
        |  SELECT c_custkey, lon, lat,
        |    aw/sqrt(1 - e2w*sin(radians(lat))*sin(radians(lat))) AS nu,
        |    nu*cos(radians(lat))*cos(radians(lon)) AS gx,
        |    nu*cos(radians(lat))*sin(radians(lon)) AS gy,
        |    nu*(1 - e2w)*sin(radians(lat)) AS gz
        |  FROM pts CROSS JOIN k),
        |sh AS (
        |  SELECT c_custkey, lon, lat,
        |    -dx + m2*(gx + rz*gy - ry*gz) AS x2,
        |    -dy + m2*(-rz*gx + gy + rx*gz) AS y2,
        |    -dz + m2*(ry*gx - rx*gy + gz) AS z2
        |  FROM xyz CROSS JOIN k),
        |bow AS (
        |  SELECT c_custkey, lon, lat,
        |    sqrt(x2*x2 + y2*y2) AS p,
        |    aa*(1 - fa) AS bb,
        |    (aa*aa - bb*bb)/(bb*bb) AS ep2,
        |    atan2(z2*aa, p*bb) AS th,
        |    atan2(z2 + ep2*bb*sin(th)*sin(th)*sin(th),
        |          p - e2a*aa*cos(th)*cos(th)*cos(th)) AS phi2,
        |    atan2(y2, x2) AS lam2
        |  FROM sh CROSS JOIN k)
        |SELECT c_custkey,
        |  round(degrees(lam2), 6) + 0.0 AS osgb_lon,
        |  round(degrees(phi2), 6) + 0.0 AS osgb_lat,
        |  round(lon, 6) + 0.0 AS rt_lon,
        |  round(lat, 6) + 0.0 AS rt_lat
        |FROM bow ORDER BY c_custkey""".stripMargin,

    "q20_spatial_join" ->
      s"""SELECT cast(floor(($oCustX + 180) / 72) as int) AS box_id,
         |  cast(count(*) as bigint) AS n_points,
         |  cast(sum(c_custkey) as bigint) AS key_sum
         |FROM customer
         |WHERE (($oCustX + 180) % 72) <> 0 AND $oCustY > -80
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q44_grid_spatial_join" ->
      s"""SELECT cast(floor(($oCustX + 180) / 72) as int) AS box_id,
         |  cast(count(*) as bigint) AS n_points,
         |  cast(sum(c_custkey) as bigint) AS key_sum
         |FROM customer
         |WHERE (($oCustX + 180) % 72) <> 0 AND $oCustY > -80
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_spatial_join_left" ->
      s"""SELECT c_custkey,
         |  CASE WHEN $oCustX > -90 AND $oCustX < 90 AND $oCustY > -45 AND $oCustY < 45
         |       THEN 1 ELSE 0 END AS matched
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q27_sql_spatial_join" ->
      s"""SELECT cast(floor(($oCustX + 180) / 72) as int) AS box_id,
         |  cast(count(*) as bigint) AS n_points,
         |  cast(sum(c_custkey) as bigint) AS key_sum
         |FROM customer
         |WHERE (($oCustX + 180) % 72) <> 0 AND $oCustY > -80
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q56_sql_grid_join" ->
      s"""SELECT cast(floor(($oCustX + 180) / 72) as int) AS box_id,
         |  cast(count(*) as bigint) AS n_points,
         |  cast(sum(c_custkey) as bigint) AS key_sum
         |FROM customer
         |WHERE (($oCustX + 180) % 72) <> 0 AND $oCustY > -80
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q28_geojson" ->
      s"""SELECT c_custkey, $oCustX AS gx, $oCustY AS gy
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q22_geo_dump_explode" ->
      s"""SELECT c_custkey, $oCustX + d.off AS part_x, $oCustY AS part_y
         |FROM customer, (SELECT unnest([0.0, 10.0]) AS off) d
         |ORDER BY c_custkey, part_x""".stripMargin,

    "q38_geo_type_ring" ->
      """SELECT c_custkey, 5 AS ring_pts, true AS ring_closed,
        |  'Polygon' AS gtype, 'Point' AS ptype
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q39_geo_wkt" ->
      """SELECT c_custkey,
        |  'POINT (' || cast(c_custkey % 360 - 180 as varchar) || ' ' ||
        |    cast((c_custkey * 7) % 160 - 80 as varchar) || ')' AS wkt,
        |  cast(c_custkey % 360 - 180 as double) AS rx
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q23_geo_simplify" ->
      """SELECT c_custkey, 2 AS pts_loose, 3 AS pts_tight
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q49_union_scalar" ->
      """SELECT c_custkey, 7.0 AS union_area, 2.0 AS disjoint_area
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q50_overlay_ops" ->
      """SELECT c_custkey, 1.0 AS inter_area, 3.0 AS diff_area
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q24_envelope_agg" ->
      s"""SELECT c_nationkey,
         |  min($oCustX) AS bx0, min($oCustY) AS by0,
         |  max($oCustX) AS bx1, max($oCustY) AS by1
         |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q25_collect_agg" ->
      """SELECT c_nationkey,
        |  cast(count(*) as int) AS n_pts, 4 AS tid
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q26_union_agg" ->
      """SELECT c_custkey % 20 AS g,
        |  round((max(c_custkey // 20) - min(c_custkey // 20)) * 0.5 + 1.0, 6) AS union_area
        |FROM customer GROUP BY c_custkey % 20 ORDER BY g""".stripMargin,

    // per parity strip: chained boxes dissolve to one rectangle of area
    // (max step - min step) * 0.5 + 1; strips are disjoint => parts add
    "q242_global_dissolve" ->
      """SELECT round(sum(a), 6) + 0.0 AS union_area, cast(count(*) as int) AS n_parts
        |FROM (
        |  SELECT c_custkey % 2 AS par,
        |    (max(c_custkey // 20) - min(c_custkey // 20)) * 0.5 + 1.0 AS a
        |  FROM customer GROUP BY c_custkey % 2)""".stripMargin,

    "q30_doc_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords,
        |  length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q31_doc_quality" ->
      """SELECT doc_id, round(cast(
        |  (CASE WHEN words >= 50 AND words <= 100000 THEN 1.0
        |        WHEN words >= 10 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |  (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |  (CASE WHEN pr <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |  (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.2 as double), 6) AS quality
        |FROM (
        |  SELECT doc_id,
        |    cast(len(regexp_extract_all(text, '\S+')) as double) AS words,
        |    CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
        |         THEN cast(length(text) as double) / len(regexp_extract_all(text, '\S+'))
        |         ELSE 0.0 END AS mwl,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[.,;:!?]')) as double) / length(text)
        |         ELSE 0.0 END AS pr,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[A-Z]')) as double) / length(text)
        |         ELSE 0.0 END AS ur
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q32_dedup_prefix_groups" ->
      """SELECT substring(text, 1, 30) AS prefix,
        |  cast(count(*) as bigint) AS dup_count,
        |  min(doc_id) AS representative
        |FROM documents
        |GROUP BY substring(text, 1, 30)
        |HAVING count(*) > 1
        |ORDER BY prefix""".stripMargin,

    "q33_dedup_exact_count" ->
      """SELECT cast(count(DISTINCT substring(text, 1, 30)) as bigint) AS distinct_docs
        |FROM documents""".stripMargin,

    "q34_token_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(regexp_extract_all(trim(text), '\S+')) AS toks
        |  FROM documents WHERE doc_id < 60)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(cast(len(list_intersect(a.toks, b.toks)) as double) /
        |        cast(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) as double), 6) AS jaccard
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE cast(len(list_intersect(a.toks, b.toks)) as double) /
        |      cast(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) as double) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q40_emb_cosine" ->
      s"""SELECT vec_id,
         |  round(list_dot_product(cast(embedding as double[]), $queryVecSql) /
         |        (sqrt(list_dot_product(cast(embedding as double[]), cast(embedding as double[]))) *
         |         sqrt(list_dot_product($queryVecSql, $queryVecSql))), 6) AS cosine
         |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin,

    // Exact-jaccard ground truth for the minhash-LSH pair set: every emitted
    // candidate is verified with exact trigram jaccard, and 32x4 banding puts
    // recall at ~1-5e-8 for the corpus's lowest true-pair similarity (0.8),
    // so the LSH output equals the all-pairs answer. CosineSim accumulates
    // dot/norms exactly like list_dot_product => bit-identical doubles.
    // winnowing min-md5 fingerprint recomputed per char window; window =
    // min(8, len); empty text -> 0 (matches TextKernels.fingerprintMd5)
    "q53_doc_fingerprint" ->
      """WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
        |w AS (SELECT doc_id, t,
        |        CASE WHEN length(t) < 8 THEN length(t) ELSE 8 END AS w
        |      FROM t)
        |SELECT doc_id,
        |  cast(CASE WHEN length(t) = 0 THEN 0
        |       ELSE list_min(list_transform(range(length(t) - w + 1),
        |            i -> ('0x' || substr(md5(substr(t, i + 1, w)), 1, 15))::BIGINT))
        |       END as bigint) AS fingerprint
        |FROM w ORDER BY doc_id""".stripMargin,

    "q35_minhash_lsh" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |        CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')])
        |             ELSE list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)])
        |        END AS sh
        |      FROM t WHERE len(toks) > 0)
        |SELECT cast(a.doc_id as bigint) AS id_a, cast(b.doc_id as bigint) AS id_b,
        |  cast(len(list_intersect(a.sh, b.sh)) as double) /
        |  (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE cast(len(list_intersect(a.sh, b.sh)) as double) /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // all-pairs 60-bit md5-simhash at hamming <= 3 (see q36 query comment:
    // candidate recall is exact by pigeonhole, so sets match)
    "q36_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
        |              FROM documents),
        |th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
        |         FROM th, (SELECT unnest(range(60)) AS b) bs GROUP BY doc_id, b),
        |sh AS (SELECT doc_id, cast(sum(CASE WHEN acc > 0 THEN (1::BIGINT << b) ELSE 0 END) as bigint) AS sim
        |       FROM bits GROUP BY doc_id)
        |SELECT cast(a.doc_id as bigint) AS id_a, cast(b.doc_id as bigint) AS id_b,
        |  cast(bit_count(xor(a.sim, b.sim)) as int) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // stopword-ratio argmax with the kernel's exact tie order (en,es,fr,de,
    // pt,it), 0.02 floor, and BMP-Han fast path
    "q37_fingerprint_langid" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, text, len(toks) AS n_tokens,
        |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','it','for','was','with'], x))) as double) / len(toks) END AS s_en,
        |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un','los','del','se','las','por'], x))) as double) / len(toks) END AS s_es,
        |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['le','la','de','et','les','des','en','un','du','une','que','est'], x))) as double) / len(toks) END AS s_fr,
        |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['der','die','und','das','von','zu','den','mit','ist','des','im','ein'], x))) as double) / len(toks) END AS s_de,
        |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['o','a','de','que','e','do','da','em','um','para','com','os'], x))) as double) / len(toks) END AS s_pt,
        |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['il','di','che','la','e','un','per','in','una','del','con','non'], x))) as double) / len(toks) END AS s_it
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}\x{f900}-\x{faff}]') THEN 'zh'
        |       WHEN n_tokens = 0 THEN 'und'
        |       WHEN greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) < 0.02 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'fr'
        |       WHEN s_de = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'de'
        |       WHEN s_pt = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'pt'
        |       ELSE 'it' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    // composes the q31 quality formula, the q37 language argmax, and
    // min-id-per-text dedup — the full Corpus.clean semantics in SQL
    "q57_corpus_clean" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    cast(len(regexp_extract_all(text, '\S+')) as double) AS words,
        |    CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
        |         THEN cast(length(text) as double) / len(regexp_extract_all(text, '\S+')) ELSE 0.0 END AS mwl,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[.,;:!?]')) as double) / length(text) ELSE 0.0 END AS pr,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[A-Z]')) as double) / length(text) ELSE 0.0 END AS ur,
        |    regexp_extract_all(lower(text), '\S+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, toks,
        |    (CASE WHEN words >= 50 AND words <= 100000 THEN 1.0 WHEN words >= 10 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |    (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN pr <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.2 AS quality,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','it','for','was','with'], x))) as double) / len(toks) END AS s_en,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un','los','del','se','las','por'], x))) as double) / len(toks) END AS s_es,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['le','la','de','et','les','des','en','un','du','une','que','est'], x))) as double) / len(toks) END AS s_fr,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['der','die','und','das','von','zu','den','mit','ist','des','im','ein'], x))) as double) / len(toks) END AS s_de,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['o','a','de','que','e','do','da','em','um','para','com','os'], x))) as double) / len(toks) END AS s_pt,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['il','di','che','la','e','un','per','in','una','del','con','non'], x))) as double) / len(toks) END AS s_it
        |  FROM m),
        |l AS (
        |  SELECT doc_id, text, quality,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}\x{f900}-\x{faff}]') THEN 'zh'
        |         WHEN len(toks) = 0 THEN 'und'
        |         WHEN greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) < 0.02 THEN 'und'
        |         WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'en'
        |         WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'fr'
        |         WHEN s_de = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'de'
        |         WHEN s_pt = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'pt'
        |         ELSE 'it' END AS lang
        |  FROM s),
        |f AS (SELECT doc_id, text FROM l WHERE quality >= 0.9 AND lang IN ('en')),
        |d AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text)
        |SELECT d.doc_id, len(regexp_extract_all(doc.text, '\S+')) AS n_tokens
        |FROM d JOIN documents doc ON d.doc_id = doc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q41_emb_topk" ->
      s"""SELECT vec_id, round(c, 6) AS cosine FROM (
         |  SELECT e.vec_id,
         |    list_dot_product(cast(e.embedding as double[]), $queryVecSql) /
         |    (sqrt(list_dot_product(cast(e.embedding as double[]), cast(e.embedding as double[]))) *
         |     sqrt(list_dot_product($queryVecSql, $queryVecSql))) AS c
         |  FROM embeddings e)
         |ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    // random-hyperplane LSH reproduced bit-exactly: plane[p][d] =
    // (md5Hash60(p||':'||d) - 2^59) / 2^59 (the cross-engine md5 hash,
    // q53's parse), dot products accumulate like list_dot_product =>
    // identical signs => identical buckets => identical candidate pair
    // set; cosine verified at full precision before the display round.
    "q42_emb_neardup" ->
      """WITH planes AS (
        |  SELECT p, list_transform(range(64), d ->
        |    (('0x' || substr(md5(p || ':' || d), 1, 15))::BIGINT
        |      - 576460752303423488)::DOUBLE / 576460752303423488) AS pl
        |  FROM range(6) t(p)),
        |v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        |sig AS (
        |  SELECT v.vec_id AS id,
        |    sum(CASE WHEN list_dot_product(v.v, pl.pl) >= 0
        |             THEN 1 << pl.p ELSE 0 END)::BIGINT AS bucket
        |  FROM v CROSS JOIN planes pl GROUP BY v.vec_id)
        |SELECT cast(a.id as bigint) AS id_a, cast(b.id as bigint) AS id_b,
        |  round(list_dot_product(va.v, vb.v) /
        |        (sqrt(list_dot_product(va.v, va.v)) *
        |         sqrt(list_dot_product(vb.v, vb.v))), 6) AS cosine
        |FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.id < b.id
        |JOIN v va ON va.vec_id = a.id
        |JOIN v vb ON vb.vec_id = b.id
        |WHERE list_dot_product(va.v, vb.v) /
        |      (sqrt(list_dot_product(va.v, va.v)) *
        |       sqrt(list_dot_product(vb.v, vb.v))) >= 0.25
        |ORDER BY id_a, id_b""".stripMargin,

    // IVF ANN replayed exactly: training is deterministic (init = first 8
    // vectors by id, 2 Lloyd rounds whose per-dim means go through the
    // decimal(28,10) fold), so the oracle unrolls both rounds as chained
    // CTEs (the q221 k-means pattern), re-derives the 6 probe cells, and
    // re-runs the probe-filtered exact top-10. Every cosine/mean double is
    // bit-identical (sequential list_dot_product accumulation, exact
    // decimal sums), so bucket assignment — and therefore the approximate
    // result set itself — reproduces exactly.
    "q52_emb_ivf" ->
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |${annInit(8)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |probes AS (SELECT c FROM (
         |  SELECT cc.c, row_number() OVER (ORDER BY
         |    list_dot_product($queryVecSql, cc.v) /
         |    (sqrt(list_dot_product($queryVecSql, $queryVecSql)) *
         |     sqrt(list_dot_product(cc.v, cc.v))) DESC, cc.c) AS rn
         |  FROM c2 cc) WHERE rn <= 6),
         |${annAssign("af", "c2")}
         |SELECT vec_id, round(cos, 6) AS cosine FROM (
         |  SELECT a.vec_id,
         |    list_dot_product(a.v, $queryVecSql) /
         |    (sqrt(list_dot_product(a.v, a.v)) *
         |     sqrt(list_dot_product($queryVecSql, $queryVecSql))) AS cos
         |  FROM af a JOIN probes USING (c))
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    // SemDeDup replay: same unrolled Lloyd cells as q52, dup set = rows
    // with an earlier (lower-id) cell-mate at cosine >= 0.3.
    "q226_semdedup" ->
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |${annInit(8)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |${annAssign("cellasg", "c2")},
         |dup AS (SELECT DISTINCT b.vec_id FROM cellasg a JOIN cellasg b
         |  ON a.c = b.c AND a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.v, b.v) /
         |        (sqrt(list_dot_product(a.v, a.v)) *
         |         sqrt(list_dot_product(b.v, b.v))) >= 0.3)
         |SELECT cast(ca.vec_id as bigint) AS id, cast(ca.c as int) AS cell,
         |  (d.vec_id IS NULL) AS kept
         |FROM cellasg ca LEFT JOIN dup d ON d.vec_id = ca.vec_id
         |ORDER BY id""".stripMargin,

    // RRF fusion: q159's ln-based BM25 arm, the q40-style dense cosine
    // arm, integer ranks, exact 1/(60+r) fusion.
    "q230_rrf_fusion" ->
      s"""WITH tok AS (
         |  SELECT doc_id, term FROM (
         |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
         |    FROM documents WHERE doc_id < 2000) WHERE term != ''),
         |pd AS (SELECT doc_id, cast(count(*) as double) AS dl,
         |         cast(sum(CASE WHEN term = 'query'  THEN 1 ELSE 0 END) as double) AS tfq,
         |         cast(sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) as double) AS tfv,
         |         cast(sum(CASE WHEN term = 'merge'  THEN 1 ELSE 0 END) as double) AS tfm
         |       FROM tok GROUP BY doc_id),
         |st AS (SELECT cast(count(*) as double) AS n, avg(dl) AS avgdl FROM pd),
         |df AS (SELECT cast(sum(CASE WHEN tfq > 0 THEN 1 ELSE 0 END) as double) AS dfq,
         |         cast(sum(CASE WHEN tfv > 0 THEN 1 ELSE 0 END) as double) AS dfv,
         |         cast(sum(CASE WHEN tfm > 0 THEN 1 ELSE 0 END) as double) AS dfm
         |       FROM pd),
         |sc AS (
         |  SELECT pd.doc_id,
         |    ln((st.n - df.dfq + 0.5) / (df.dfq + 0.5) + 1.0) * pd.tfq * 2.2
         |      / (pd.tfq + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
         |    ln((st.n - df.dfv + 0.5) / (df.dfv + 0.5) + 1.0) * pd.tfv * 2.2
         |      / (pd.tfv + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
         |    ln((st.n - df.dfm + 0.5) / (df.dfm + 0.5) + 1.0) * pd.tfm * 2.2
         |      / (pd.tfm + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) AS score
         |  FROM pd CROSS JOIN st CROSS JOIN df
         |  WHERE pd.tfq + pd.tfv + pd.tfm > 0),
         |sparse AS (SELECT doc_id, rs FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rs FROM sc)
         |  WHERE rs <= 50),
         |v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |dense AS (SELECT doc_id, rd FROM (
         |  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY
         |    list_dot_product(v, $queryVecSql) /
         |    (sqrt(list_dot_product(v, v)) *
         |     sqrt(list_dot_product($queryVecSql, $queryVecSql))) DESC, vec_id) AS rd
         |  FROM v) WHERE rd <= 50),
         |fused AS (
         |  SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
         |    cast(s.rs as int) AS rs, cast(d.rd as int) AS rd,
         |    coalesce(cast(1.0 as double) / (60 + s.rs), cast(0.0 as double)) +
         |    coalesce(cast(1.0 as double) / (60 + d.rd), cast(0.0 as double)) AS rrf
         |  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id)
         |SELECT rnk, doc_id, rs, rd, round(rrf, 6) AS rrf
         |FROM (SELECT *, cast(row_number() OVER (ORDER BY rrf DESC, doc_id) as int) AS rnk
         |      FROM fused)
         |WHERE rnk <= 10 ORDER BY rnk""".stripMargin,

    // PCA power iteration replayed: truncated scaled-long moment folds
    // (identical doubles truncate identically — no rounding-boundary
    // sensitivity), covariance rows as j-ordered lists, three unrolled
    // w->normalize rounds from the exact 0.125 uniform start, then the
    // same sequential centered-dot projection. round(+0.0) canonicalizes
    // negative zero.
    "q229_pca_power" -> {
      def iter(k: Int) =
        s"""w$k AS (SELECT c.i, list_dot_product(c.row, (SELECT vv FROM v${k - 1})) AS w
           |  FROM cov c),
           |wl$k AS (SELECT list(w ORDER BY i) AS wl FROM w$k),
           |v$k AS (SELECT list_transform(wl, x -> x / sqrt(list_dot_product(wl, wl))) AS vv
           |  FROM wl$k)""".stripMargin
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |mu AS (SELECT d.d AS i,
         |    cast(sum(cast(trunc(v.v[d.d + 1] * 1e10) as bigint)) as double)
         |      / 1e10 / count(*) AS mu
         |  FROM v CROSS JOIN range(64) d(d) GROUP BY d.d),
         |mul AS (SELECT list(mu ORDER BY i) AS m FROM mu),
         |sxy AS (SELECT i.i, j.j,
         |    cast(sum(cast(trunc((v.v[i.i + 1] * v.v[j.j + 1]) * 1e10) as bigint)) as double)
         |      / 1e10 / count(*) AS e
         |  FROM v CROSS JOIN range(64) i(i) CROSS JOIN range(64) j(j) GROUP BY i.i, j.j),
         |cov AS (SELECT s.i, list(s.e - mi.mu * mj.mu ORDER BY s.j) AS row
         |  FROM sxy s JOIN mu mi ON mi.i = s.i JOIN mu mj ON mj.i = s.j GROUP BY s.i),
         |v0 AS (SELECT list_transform(range(64), x -> cast(0.125 as double)) AS vv),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT vec_id, round(list_dot_product(
         |    list_transform(range(64), k -> v.v[k + 1] - mul.m[k + 1]), v3.vv), 6)
         |  + 0.0 AS pc1
         |FROM v CROSS JOIN mul CROSS JOIN v3
         |WHERE vec_id < 100 ORDER BY vec_id""".stripMargin
    },

    // DuckDB's string metrics are byte-based; the sentinel-prefixed
    // printable-ASCII slice makes them coincide with Spark's
    // codepoint-based levenshtein. hamming() needs equal lengths (rpad).
    "q231_string_sim" ->
      """WITH p AS (SELECT doc_id,
        |  concat('#', regexp_replace(substring(text, 1, 32), '[^ -~]', '', 'g')) AS s
        |  FROM documents)
        |SELECT a.doc_id,
        |  cast(levenshtein(a.s, b.s) as int) AS lev,
        |  cast(damerau_levenshtein(a.s, b.s) as int) AS dlev,
        |  cast(hamming(rpad(a.s, 16, '.'), rpad(b.s, 16, '.')) as int) AS ham,
        |  jaccard(a.s, b.s) AS cj,
        |  round(jaro_winkler_similarity(a.s, b.s), 4) + 0.0 AS jw
        |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,

    // the same 4 relaxation rounds, unrolled as chained CTEs; decimal
    // distances make every min() and + exact
    "q232_bellman_ford" -> {
      def round(k: Int) =
        s"""d$k AS (SELECT node, min(dist) AS dist FROM (
           |  SELECT node, dist FROM d${k - 1}
           |  UNION ALL
           |  SELECT e.dst AS node, cast(d.dist + e.w as decimal(20,2)) AS dist
           |  FROM d${k - 1} d JOIN e ON e.src = d.node) GROUP BY node)""".stripMargin
      s"""WITH e AS (
         |  SELECT src, dst, min(w) AS w FROM (
         |    SELECT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst,
         |           cast(l_quantity as decimal(12,2)) AS w
         |    FROM lineitem) WHERE src <> dst GROUP BY src, dst),
         |d0 AS (SELECT cast(0 as bigint) AS node, cast(0 as decimal(20,2)) AS dist),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)}
         |SELECT cast(node as int) AS node, cast(dist as double) AS dist
         |FROM d4 ORDER BY node""".stripMargin
    },

    "q233_quality_audit" ->
      """WITH t AS (SELECT cast(count(*) as bigint) AS total FROM orders),
        |r AS (
        |  SELECT 'orders_custkey_null' AS check_name,
        |    cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) as bigint) AS violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_nonpositive_total',
        |    cast(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) as bigint)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_bad_status',
        |    cast(sum(CASE WHEN o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END) as bigint)
        |  FROM orders)
        |SELECT r.check_name, r.violations, t.total, r.violations = 0 AS pass
        |FROM r CROSS JOIN t
        |UNION ALL
        |SELECT 'orders_pk_unique',
        |  cast(count(*) - count(DISTINCT o_orderkey) as bigint),
        |  cast(count(*) as bigint),
        |  count(*) = count(DISTINCT o_orderkey)
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem_orderkey_fk',
        |  cast((SELECT count(*) FROM lineitem l
        |        WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)) as bigint),
        |  cast((SELECT count(*) FROM lineitem) as bigint),
        |  (SELECT count(*) FROM lineitem l
        |   WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0
        |UNION ALL
        |SELECT 'orders_custkey_fk',
        |  cast((SELECT count(*) FROM orders o
        |        WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)) as bigint),
        |  cast((SELECT count(*) FROM orders) as bigint),
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
        |ORDER BY check_name""".stripMargin,

    "q234_blocklist" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS tok
        |  FROM documents)
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_tokens,
        |  cast(sum(CASE WHEN tok IN ('slow','crash','spam','leak','noise')
        |           THEN 1 ELSE 0 END) as bigint) AS n_flagged,
        |  round(cast(sum(CASE WHEN tok IN ('slow','crash','spam','leak','noise')
        |        THEN 1 ELSE 0 END) as double) / count(*), 6) + 0.0 AS flag_ratio,
        |  round(cast(sum(CASE WHEN tok IN ('slow','crash','spam','leak','noise')
        |        THEN 1 ELSE 0 END) as double) / count(*), 6) + 0.0 <= 0.005 AS keep
        |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // bigram adjacency via array positions (LATERAL generate_series);
    // interpolation divisions are int/int exactly-rounded IEEE ops with
    // pinned association, ln() pinned by the round+decimal fold
    "q235_bigram_lm" ->
      """WITH d AS (
        |  SELECT doc_id, arr FROM (
        |    SELECT doc_id, list_filter(
        |      regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS arr
        |    FROM documents) WHERE len(arr) >= 2),
        |bg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
        |  FROM d, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i) u),
        |uni AS (SELECT tok, count(*) AS cu FROM (
        |  SELECT unnest(arr) AS tok FROM d) GROUP BY tok),
        |nn AS (SELECT sum(cu) AS n FROM uni),
        |big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        |sc AS (SELECT bg.doc_id,
        |    cast(round(ln(0.7 * (cast(big.cb as double) / u1.cu) +
        |                  0.3 * (cast(u2.cu as double) / nn.n)), 6)
        |      as decimal(20,6)) AS lp
        |  FROM bg
        |  JOIN big ON big.w1 = bg.w1 AND big.w2 = bg.w2
        |  JOIN uni u1 ON u1.tok = bg.w1
        |  JOIN uni u2 ON u2.tok = bg.w2
        |  CROSS JOIN nn)
        |SELECT doc_id, cast(count(*) as bigint) AS n_bigrams,
        |  round(cast(sum(lp) as double) / count(*), 4) + 0.0 AS lp2_mean
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q236_record_linkage" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_key, c_nationkey AS d_nation,
        |    concat(substring(c_name, 1, length(c_name) - 2),
        |           substring(c_name, length(c_name), 1),
        |           substring(c_name, length(c_name) - 1, 1)) AS d_name,
        |    c_mktsegment AS d_seg
        |  FROM customer),
        |cand AS (
        |  SELECT d.d_key, c.c_custkey,
        |    round(0.5 * jaro_winkler_similarity(d.d_name, c.c_name) +
        |          0.3 * (1.0 - cast(levenshtein(d.d_name, c.c_name) as double) /
        |                 greatest(length(d.d_name), length(c.c_name))) +
        |          0.2 * jaccard(d.d_seg, c.c_mktsegment), 6) AS score
        |  FROM dirty d JOIN customer c
        |    ON d.d_nation = c.c_nationkey
        |   AND substring(d.d_name, 1, 16) = substring(c.c_name, 1, 16))
        |SELECT d_key, c_custkey AS matched_key, score + 0.0 AS score,
        |  d_key = c_custkey AS correct
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY d_key ORDER BY score DESC, c_custkey) AS rn
        |      FROM cand)
        |WHERE rn = 1 ORDER BY d_key""".stripMargin,

    // JL projection replayed: the q42 md5 plane derivation at 16 planes,
    // p-ordered projection lists, projected-cosine shortlist, full-dim
    // re-rank — identical IEEE folds make the shortlist and ranking exact
    "q238_jl_projection" ->
      s"""WITH planes AS (
         |  SELECT p, list_transform(range(64), d ->
         |    (('0x' || substr(md5(p || ':' || d), 1, 15))::BIGINT
         |      - 576460752303423488)::DOUBLE / 576460752303423488) AS pl
         |  FROM range(16) t(p)),
         |v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |q AS (SELECT ${queryVecSql}::DOUBLE[] AS qv),
         |pq AS (SELECT list(list_dot_product(pl.pl, q.qv) ORDER BY pl.p) AS pqv
         |       FROM planes pl CROSS JOIN q GROUP BY 'x'),
         |pv AS (SELECT v.vec_id, list(list_dot_product(v.v, pl.pl) ORDER BY pl.p) AS pv
         |       FROM v CROSS JOIN planes pl GROUP BY v.vec_id),
         |pc AS (SELECT pv.vec_id,
         |    list_dot_product(pv.pv, pq.pqv) /
         |      (sqrt(list_dot_product(pv.pv, pv.pv)) *
         |       sqrt(list_dot_product(pq.pqv, pq.pqv))) AS pcos
         |  FROM pv CROSS JOIN pq),
         |short AS (SELECT vec_id FROM (
         |  SELECT vec_id, row_number() OVER (ORDER BY pcos DESC, vec_id) AS rs
         |  FROM pc) WHERE rs <= 50),
         |fc AS (SELECT v.vec_id,
         |    list_dot_product(v.v, q.qv) /
         |      (sqrt(list_dot_product(v.v, v.v)) *
         |       sqrt(list_dot_product(q.qv, q.qv))) AS c
         |  FROM v JOIN short USING (vec_id) CROSS JOIN q)
         |SELECT cast(rnk as int) AS rnk, vec_id, round(c, 6) + 0.0 AS cosine
         |FROM (SELECT vec_id, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rnk
         |      FROM fc)
         |WHERE rnk <= 10 ORDER BY rnk""".stripMargin,

    // closed-form: envelopes are built CCW (minx miny -> maxx miny ...);
    // forcing CW reverses in place keeping the start vertex
    "q239_ring_orientation" ->
      """SELECT c_custkey,
        |  true AS orig_ccw,
        |  false AS orig_cw,
        |  'POLYGON ((' || x0 || ' ' || y0 || ', ' || x0 || ' ' || y1 || ', ' ||
        |    x1 || ' ' || y1 || ', ' || x1 || ' ' || y0 || ', ' ||
        |    x0 || ' ' || y0 || '))' AS wkt_cw,
        |  true AS cw_after,
        |  true AS ccw_roundtrip,
        |  round(side * side, 6) + 0.0 AS area_kept,
        |  cast(NULL as boolean) AS point_null
        |FROM (
        |  SELECT c_custkey,
        |    cast(c_custkey % 360 - 180 as bigint) AS x0,
        |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
        |    cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x1,
        |    cast((c_custkey * 7) % 160 - 80 + c_custkey % 10 + 1 as bigint) AS y1,
        |    cast(c_custkey % 10 + 1 as double) AS side
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q240_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i FROM lineitem),
        |nb AS (SELECT cast(count(DISTINCT b) as bigint) AS nb FROM it),
        |ic AS (SELECT i, cast(count(*) as bigint) AS ci FROM it GROUP BY i),
        |pr AS (SELECT a.i AS x, c.i AS y, cast(count(*) as bigint) AS cxy
        |       FROM it a JOIN it c ON a.b = c.b AND a.i < c.i GROUP BY a.i, c.i
        |       HAVING count(*) >= 50),
        |dir AS (SELECT x AS ante, y AS cons, cxy FROM pr
        |        UNION ALL SELECT y, x, cxy FROM pr)
        |SELECT d.ante, d.cons, d.cxy AS support,
        |  round(cast(d.cxy as double) / ca.ci, 6) + 0.0 AS confidence,
        |  round((cast(d.cxy as double) / ca.ci) /
        |        (cast(cc.ci as double) / nb.nb), 6) + 0.0 AS lift
        |FROM dir d
        |JOIN ic ca ON ca.i = d.ante
        |JOIN ic cc ON cc.i = d.cons
        |CROSS JOIN nb
        |ORDER BY ante, cons""".stripMargin,

    // the definitional O(n^2) NOT EXISTS dominance test the engine-side
    // operator avoids
    "q237_skyline" ->
      """WITH per AS (
        |  SELECT o_custkey, cast(count(*) as bigint) AS n_orders,
        |    cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, n_orders, spend FROM per a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM per b
        |  WHERE b.n_orders >= a.n_orders AND b.spend >= a.spend
        |    AND (b.n_orders > a.n_orders OR b.spend > a.spend))
        |ORDER BY o_custkey""".stripMargin,

    "q227_bpe_train" ->
      s"""WITH ${bpeTrainCtes(5)}
         |SELECT round, split_part(pair, ' ', 1) AS lhs,
         |  split_part(pair, ' ', 2) AS rhs, f AS freq
         |FROM (${(1 to 5).map(r => s"SELECT $r AS round, pair, f FROM m$r")
        .mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin,

    "q228_bpe_encode" ->
      s"""WITH ${bpeTrainCtes(5)},
         |e0 AS (SELECT doc_id, cast(u[2] as int) AS word_pos, u[1] AS word
         |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS ws
         |        FROM documents WHERE doc_id < 20),
         |  unnest(list_zip(ws, range(len(ws)))) t(u)),
         |e1 AS (SELECT doc_id, word_pos, word, string_split(trim(
         |    ${(1 to 5).foldLeft(
              "' ' || array_to_string(list_transform(range(length(word)), " +
              "i -> word[i + 1 : i + 1]), ' ') || ' '") { (acc, r) =>
              s"replace($acc,\n    (SELECT ' ' || pair || ' ' FROM m$r), " +
              s"(SELECT ' ' || replace(pair, ' ', '') || ' ' FROM m$r))" }}), ' ') AS ss
         |  FROM e0)
         |SELECT doc_id, word_pos, word, cast(u[2] as int) AS sym_pos, u[1] AS symbol
         |FROM e1, unnest(list_zip(ss, range(len(ss)))) t(u)
         |ORDER BY doc_id, word_pos, sym_pos""".stripMargin,

    // PQ ADC replayed exactly: codebooks from the same deterministic
    // per-subspace Lloyd (so books0..books2 unroll like q52's c0..c2 but
    // per 8-dim slice), codes re-derived, and the ADC score rebuilt from
    // the per-subspace dot/norm luts folded in j order — the approximate
    // top-10 set and both cosine columns reproduce bit-exactly.
    "q84_pq_ann" ->
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |q AS (SELECT $queryVecSql AS v),
         |$pqOracleCtes,
         |top AS (SELECT s.vec_id,
         |    CASE WHEN s.normsum > 0 AND sqrt(list_dot_product(q.v, q.v)) > 0
         |         THEN s.dotsum / (sqrt(list_dot_product(q.v, q.v)) * sqrt(s.normsum))
         |         ELSE 0.0 END AS a
         |  FROM adc s CROSS JOIN q ORDER BY a DESC, s.vec_id LIMIT 10)
         |SELECT t.vec_id, round(t.a, 6) AS adc_cosine,
         |  round(list_dot_product(v.v, q.v) /
         |        (sqrt(list_dot_product(v.v, v.v)) *
         |         sqrt(list_dot_product(q.v, q.v))), 6) AS exact_cosine
         |FROM top t JOIN v ON v.vec_id = t.vec_id CROSS JOIN q
         |ORDER BY adc_cosine DESC, t.vec_id""".stripMargin,

    // IVF-PQ: coarse cells from the full-dim Lloyd (k=16), top-4 probe
    // cells by query cosine, then the q84 ADC scoring restricted to the
    // probed cells. round(+0.0) canonicalizes negative zero as the Scala
    // side does.
    "q93_ivfpq_ann" ->
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |q AS (SELECT $queryVecSql AS v),
         |${annInit(16)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |${annAssign("cellasg", "c2")},
         |probes AS (SELECT c FROM (
         |  SELECT cc.c, row_number() OVER (ORDER BY
         |    list_dot_product($queryVecSql, cc.v) /
         |    (sqrt(list_dot_product($queryVecSql, $queryVecSql)) *
         |     sqrt(list_dot_product(cc.v, cc.v))) DESC, cc.c) AS rn
         |  FROM c2 cc) WHERE rn <= 4),
         |$pqOracleCtes
         |SELECT vec_id, round(a, 6) + 0.0 AS adc_cosine FROM (
         |  SELECT s.vec_id,
         |    CASE WHEN s.normsum > 0 AND sqrt(list_dot_product(q.v, q.v)) > 0
         |         THEN s.dotsum / (sqrt(list_dot_product(q.v, q.v)) * sqrt(s.normsum))
         |         ELSE 0.0 END AS a
         |  FROM adc s
         |  JOIN cellasg ca ON ca.vec_id = s.vec_id
         |  JOIN probes p ON p.c = ca.c
         |  CROSS JOIN q ORDER BY a DESC, s.vec_id LIMIT 10)
         |ORDER BY adc_cosine DESC, vec_id""".stripMargin,

    "q43_emb_knn" ->
      """SELECT q_id, vec_id, rank FROM (
        |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_dot_product(cast(e.embedding as double[]), cast(q.embedding as double[])) /
        |      (sqrt(list_dot_product(cast(e.embedding as double[]), cast(e.embedding as double[]))) *
        |       sqrt(list_dot_product(cast(q.embedding as double[]), cast(q.embedding as double[])))) DESC,
        |      e.vec_id) AS rank
        |  FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 3) q)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // greedy MMR unrolled into 10 chained CTE picks (the q221 pattern for
    // iterative algorithms): pick_t = argmax over the un-picked candidates
    // of 0.7*rel - (1-0.7)*max cos to the picked set, ties by id. All
    // lambda arithmetic in ::DOUBLE so (1.0-0.7) reproduces the Scala
    // double 0.30000000000000004 exactly; cos accumulates like
    // list_dot_product => the selection doubles are bit-identical.
    "q92_mmr_rerank" -> {
      def cos(a: String, b: String) =
        s"""(CASE WHEN list_dot_product($a, $a) = 0 OR list_dot_product($b, $b) = 0 THEN 0.0
           |  ELSE list_dot_product($a, $b) /
           |    (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END)""".stripMargin
      val steps = (2 to 10).map { t =>
        s"""sc$t AS (
           |  SELECT c.id, c.rel, c.v,
           |    0.7::DOUBLE * c.rel - (1.0::DOUBLE - 0.7::DOUBLE) *
           |      max(${cos("c.v", "s.v")}) AS score
           |  FROM cand c CROSS JOIN sel${t - 1} s
           |  WHERE c.id NOT IN (SELECT id FROM sel${t - 1})
           |  GROUP BY c.id, c.rel, c.v),
           |pick$t AS (SELECT $t AS rank, id, rel, v, score FROM sc$t
           |           ORDER BY score DESC, id LIMIT 1),
           |sel$t AS MATERIALIZED (
           |  SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pick$t)"""
          .stripMargin
      }.mkString(",\n")
      // MATERIALIZED: each sel_t is referenced three times per later step —
      // DuckDB's default CTE inlining re-expands the whole chain (and
      // re-opens the parquet scan) exponentially, exhausting file handles
      s"""WITH cand AS MATERIALIZED (
         |  SELECT id, ${cos("v", queryVecSql)} AS rel, v FROM (
         |    SELECT vec_id AS id, cast(embedding as double[]) AS v
         |    FROM embeddings)
         |  ORDER BY rel DESC, id LIMIT 50),
         |sel1 AS MATERIALIZED (
         |  SELECT 1 AS rank, id, rel, v, 0.7::DOUBLE * rel AS score
         |  FROM cand ORDER BY score DESC, id LIMIT 1),
         |$steps
         |SELECT cast(rank as int) AS rank, cast(id as bigint) AS vec_id,
         |  round(score, 6) + 0.0 AS mmr_score, round(rel, 6) + 0.0 AS cosine
         |FROM sel10 ORDER BY rank""".stripMargin
    },

    "q54_geoparquet_roundtrip" ->
      s"""SELECT cast(count(*) as bigint) AS n_east, cast(sum(c_custkey) as bigint) AS key_sum
         |FROM customer WHERE $oCustX >= 1""".stripMargin,

    "q55_geojson_roundtrip" ->
      s"""SELECT cast(c_custkey as bigint) AS c_custkey, $oCustX AS gx, $oCustY AS gy
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q51_emb_neardup_exact" ->
      """SELECT cast(a.vec_id as bigint) AS id_a, cast(b.vec_id as bigint) AS id_b,
        |  round(list_dot_product(cast(a.embedding as double[]), cast(b.embedding as double[])) /
        |        (sqrt(list_dot_product(cast(a.embedding as double[]), cast(a.embedding as double[]))) *
        |         sqrt(list_dot_product(cast(b.embedding as double[]), cast(b.embedding as double[])))), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(cast(a.embedding as double[]), cast(b.embedding as double[])) /
        |      (sqrt(list_dot_product(cast(a.embedding as double[]), cast(a.embedding as double[]))) *
        |       sqrt(list_dot_product(cast(b.embedding as double[]), cast(b.embedding as double[])))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // min-label reachability via recursive CTE == min id per connected
    // component; seeds every node with itself so isolated docs self-label,
    // matching assignComponents' left-join-coalesce
    "q58_dedup_components" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, list_distinct(regexp_extract_all(trim(text), '\S+')) AS toks
        |      FROM documents WHERE doc_id < 60),
        |p AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM t a JOIN t b ON a.doc_id < b.doc_id
        |      WHERE cast(len(list_intersect(a.toks, b.toks)) as double) /
        |            cast(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) as double) >= 0.8),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |cc(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.id
        |)
        |SELECT cast(id as bigint) AS doc_id, cast(min(lbl) as bigint) AS component
        |FROM cc GROUP BY id ORDER BY doc_id""".stripMargin,

    "q59_arrow_roundtrip" ->
      s"""SELECT vec_id, label,
         |  round(list_dot_product(cast(embedding as double[]), $queryVecSql) /
         |        (sqrt(list_dot_product(cast(embedding as double[]), cast(embedding as double[]))) *
         |         sqrt(list_dot_product($queryVecSql, $queryVecSql))), 6) AS cosine
         |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin,

    "q60_geopackage_roundtrip" ->
      s"""SELECT cast(c_custkey as bigint) AS c_custkey, c_name, c_acctbal,
         |  $oCustX AS gx, $oCustY AS gy
         |FROM customer ORDER BY c_custkey""".stripMargin,

    // same md5 bucket (first 15 hex chars as 60-bit int, mod 1000) on both
    // engines makes the sample set exactly reproducible
    "q61_corpus_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT % 1000 <
        |  CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 250
        |              WHEN 'src2' THEN 500 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,

    "q62_corpus_stats" ->
      """SELECT source, cast(count(*) as bigint) AS n_docs,
        |  cast(sum(len(regexp_extract_all(text, '\S+'))) as bigint) AS n_tokens,
        |  cast(sum(length(text)) as bigint) AS n_chars,
        |  round(avg(
        |    (CASE WHEN words >= 50 AND words <= 100000 THEN 1.0
        |          WHEN words >= 10 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |    (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN pr <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.2), 6) AS avg_quality
        |FROM (
        |  SELECT source, text,
        |    cast(len(regexp_extract_all(text, '\S+')) as double) AS words,
        |    CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
        |         THEN cast(length(text) as double) / len(regexp_extract_all(text, '\S+'))
        |         ELSE 0.0 END AS mwl,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[.,;:!?]')) as double) / length(text)
        |         ELSE 0.0 END AS pr,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[A-Z]')) as double) / length(text)
        |         ELSE 0.0 END AS ur
        |  FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,

    // as-of semantics in portable SQL: per event, the latest order at or
    // before ts, ties broken by max orderkey (same tie-break as the Spark
    // window ordering)
    "q63_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_price
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin,

    "q64_range_join" ->
      """SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
        |  a.event_type AS event_type_a, b.event_type AS event_type_b,
        |  abs(epoch_us(a.ts) - epoch_us(b.ts)) AS dt_us
        |FROM events a JOIN events b
        |  ON a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1000000
        |ORDER BY event_id_a, event_id_b""".stripMargin,

    "q65_ngram_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
        |        FROM toks WHERE len(w) >= 5)),
        |gd AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gram)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  cast(sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) as bigint) AS n_dup,
        |  round(cast(sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) as double)
        |        / count(*), 6) + 0.0 AS dup_frac
        |FROM grams g JOIN gd USING (gram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    // closed-form geohash in portable SQL: scale lon/lat to 20-bit cell
    // indices, bit-interleave (lon first), emit 8 base32 chars — provably
    // identical to the canonical interval-halving algorithm
    "q66_geohash" ->
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    least(cast(floor(($oCustX + 180.0) / 360.0 * 1048576) as bigint), 1048575) AS lonIdx,
         |    least(cast(floor(($oCustY + 90.0) / 180.0 * 1048576) as bigint), 1048575) AS latIdx
         |  FROM customer),
         |b AS (
         |  SELECT c_custkey,
         |    cast(list_sum(list_transform(range(0, 20), i ->
         |      ((lonIdx >> (19 - i)) & 1) * (1::BIGINT << (39 - 2*i)) +
         |      ((latIdx >> (19 - i)) & 1) * (1::BIGINT << (38 - 2*i)))) as bigint) AS bits
         |  FROM pts),
         |g AS (
         |  SELECT c_custkey,
         |    array_to_string(list_transform(range(0, 8), j ->
         |      substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |             cast(((bits >> (35 - 5*j)) & 31) as int) + 1, 1)), '') AS gh8
         |  FROM b)
         |SELECT c_custkey, gh8, substr(gh8, 1, 4) AS gh4,
         |  cast(count(*) OVER (PARTITION BY substr(gh8, 1, 4)) as bigint) AS cell4_count
         |FROM g ORDER BY c_custkey""".stripMargin,

    "q67_top_tokens" ->
      """SELECT source, token, cnt, rank FROM (
        |  SELECT source, token, cnt,
        |    cast(row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token) as int) AS rank
        |  FROM (
        |    SELECT source, token, cast(count(*) as bigint) AS cnt
        |    FROM (SELECT source, unnest(regexp_extract_all(trim(text), '\S+')) AS token
        |          FROM documents)
        |    GROUP BY source, token))
        |WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,

    // session boundaries: new session when the inter-event gap is
    // strictly greater than 6 h (session_window merges inclusively at
    // exactly-gap); session_end = last event + gap
    "q68_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 21600000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 6 HOUR AS session_end,
        |  cast(count(*) as bigint) AS n_events,
        |  min(ts) AS first_event, max(ts) AS last_event
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q69_percentiles" ->
      """SELECT source,
        |  round(quantile_cont(length(text), 0.5), 6) + 0.0 AS p50,
        |  round(quantile_cont(length(text), 0.9), 6) + 0.0 AS p90,
        |  round(quantile_cont(length(text), 0.99), 6) + 0.0 AS p99,
        |  cast(count(*) as bigint) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // cell bounds via closed-form index arithmetic (dyadic => exactly the
    // doubles the halving decoder produces); a point always intersects
    // its own cell (boundary-inclusive predicate)
    "q70_geohash_decode" ->
      s"""SELECT c_custkey,
         |  lonIdx * 360.0 / 1048576 - 180.0 AS cx0,
         |  latIdx * 180.0 / 1048576 - 90.0 AS cy0,
         |  (lonIdx + 1) * 360.0 / 1048576 - 180.0 AS cx1,
         |  (latIdx + 1) * 180.0 / 1048576 - 90.0 AS cy1,
         |  true AS holds
         |FROM (
         |  SELECT c_custkey,
         |    least(cast(floor(($oCustX + 180.0) / 360.0 * 1048576) as bigint), 1048575) AS lonIdx,
         |    least(cast(floor(($oCustY + 90.0) / 180.0 * 1048576) as bigint), 1048575) AS latIdx
         |  FROM customer)
         |ORDER BY c_custkey""".stripMargin,

    "q71_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_extract_all(trim(text), '\S+')) AS term
        |  FROM documents),
        |tc AS (SELECT doc_id, term, count(*) AS occ FROM terms GROUP BY doc_id, term),
        |st AS (SELECT doc_id, term, occ,
        |         count(*) OVER (PARTITION BY term) AS df,
        |         sum(occ) OVER (PARTITION BY doc_id) AS doc_len FROM tc),
        |sc AS (SELECT doc_id, term,
        |         round((occ::DOUBLE / doc_len) *
        |               ln((SELECT count(*) FROM documents)::DOUBLE / df), 6) + 0.0 AS tfidf
        |       FROM st)
        |SELECT doc_id, term, tfidf,
        |  cast(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) as int) AS rank
        |FROM sc QUALIFY rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q72_salted_join" ->
      """SELECT c_mktsegment,
        |  cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // precision-1 geohash: 3 lon bits + 2 lat bits, one base32 char
    "q73_cell_partition" ->
      s"""SELECT c_custkey, cell FROM (
         |  SELECT c_custkey,
         |    substr('0123456789bcdefghjkmnpqrstuvwxyz',
         |      cast(((lonIdx // 4) % 2) * 16 + ((latIdx // 2) % 2) * 8 +
         |           ((lonIdx // 2) % 2) * 4 + (latIdx % 2) * 2 + (lonIdx % 2) as int) + 1,
         |      1) AS cell
         |  FROM (
         |    SELECT c_custkey,
         |      least(cast(floor(($oCustX + 180.0) / 360.0 * 8) as bigint), 7) AS lonIdx,
         |      least(cast(floor(($oCustY + 90.0) / 180.0 * 4) as bigint), 3) AS latIdx
         |    FROM customer))
         |WHERE cell < '8' ORDER BY c_custkey""".stripMargin,

    // point-to-box distance: customer y always falls inside the boxes'
    // y-span, so distance reduces to the exact x-axis clamp (pure integer
    // subtraction — identical doubles in both engines); ties by box_id
    "q74_spatial_knn" ->
      s"""SELECT c_custkey, cast(box_id as int) AS box_id,
         |  round(dist, 6) AS dist,
         |  cast(row_number() OVER (PARTITION BY c_custkey ORDER BY dist, box_id) as int) AS rank
         |FROM (
         |  SELECT c_custkey, box_id,
         |    greatest(0.0, (box_id * 72 - 180) - px, px - (box_id * 72 - 108)) AS dist
         |  FROM (SELECT c_custkey, $oCustX AS px FROM customer),
         |       (SELECT unnest(range(5)) AS box_id))
         |QUALIFY rank <= 3 ORDER BY c_custkey, rank""".stripMargin,

    // identical semantics to q63 — different physical path on the Spark side
    "q75_asof_lookup" ->
      """SELECT e.event_id, e.user_id,
        |  o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_price
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin,

    "q76_session_ids" ->
      """WITH marked AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 21600000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events)
        |SELECT event_id, user_id,
        |  cast(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) - 1 as bigint) AS session_idx
        |FROM marked ORDER BY event_id""".stripMargin,

    "q77_geoarrow" ->
      s"""SELECT c_custkey, $oCustX AS gx, $oCustY AS gy, $oCustX AS rx,
         |  5 AS n_coords,
         |  $oCustX + $oSide AS cx, $oCustY + $oSide AS cy
         |FROM customer ORDER BY c_custkey""".stripMargin,

    // frames = {0, 250, ..., last < d}: count = floor((d-1)/250)+1,
    // last = 250*floor((d-1)/250); d <= 0 contributes no row
    "q78_frame_sample" ->
      """SELECT o_orderkey,
        |  cast((d - 1) // 250 + 1 as bigint) AS n_frames,
        |  cast(250 * ((d - 1) // 250) as bigint) AS last_frame
        |FROM (SELECT o_orderkey, o_orderkey % 10000 AS d FROM orders)
        |WHERE d > 0 ORDER BY o_orderkey""".stripMargin,

    "q79_hll_sketch" -> {
      val hll = graft.pipeline.Sketch.hllSql("events", "user_id", "event_type")
      s"""SELECT h.event_type, h.hll_estimate, h.n_buckets_used, e.exact_distinct
         |FROM ($hll) h
         |JOIN (SELECT event_type, cast(count(DISTINCT user_id) as bigint) AS exact_distinct
         |      FROM events GROUP BY event_type) e USING (event_type)
         |ORDER BY h.event_type""".stripMargin
    },

    "q80_cms_freq" -> {
      val cms = graft.pipeline.Sketch.cmsSql(
        "events", "user_id",
        "SELECT DISTINCT user_id FROM events WHERE user_id < 20")
      s"""SELECT c.user_id, c.cms_estimate, e.exact_cnt
         |FROM ($cms) c
         |JOIN (SELECT user_id, cast(count(*) as bigint) AS exact_cnt
         |      FROM events WHERE user_id < 20 GROUP BY user_id) e USING (user_id)
         |ORDER BY c.user_id""".stripMargin
    },

    "q81_hist_quantiles" -> {
      val est = graft.pipeline.Sketch.histQuantilesSql(
        "lineitem", "l_extendedprice", "l_returnflag", Seq(0.5, 0.95))
      s"""SELECT h.l_returnflag, h.est_q50, h.est_q95, e.exact_q50
         |FROM ($est) h
         |JOIN (SELECT l_returnflag,
         |        round(quantile_cont(l_extendedprice, 0.5), 4) + 0.0 AS exact_q50
         |      FROM lineitem GROUP BY l_returnflag) e USING (l_returnflag)
         |ORDER BY h.l_returnflag""".stripMargin
    },

    "q82_pii_redact" -> {
      import graft.pipeline.Corpus.{EmailRe, Ipv4Re, PhoneRe}
      s"""SELECT doc_id,
         |  cast(len(regexp_extract_all(t, '$EmailRe')) as bigint) AS n_emails,
         |  cast(len(regexp_extract_all(t, '$Ipv4Re')) as bigint) AS n_ips,
         |  cast(len(regexp_extract_all(t, '$PhoneRe')) as bigint) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS redacted
         |FROM (
         |  SELECT doc_id,
         |    substr(text, 1, 64) || ' contact u' || doc_id || '@mail' ||
         |    (doc_id % 7) || '.org at 10.' || (doc_id % 256) || '.0.' ||
         |    (doc_id % 100) || ' or +1 555-' ||
         |    lpad(cast(doc_id % 10000 as varchar), 4, '0') AS t
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q85_bloom_prune" -> {
      val member = graft.pipeline.Sketch.bloomSql(
        "SELECT DISTINCT l_orderkey FROM lineitem", "l_orderkey",
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0", "o_orderkey")
      s"""SELECT cast(count(*) as bigint) AS n_probe_keys,
         |  cast(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) as bigint) AS n_bloom_pass,
         |  cast(sum(CASE WHEN in_set THEN 1 ELSE 0 END) as bigint) AS n_members,
         |  cast(sum(CASE WHEN bloom_pass AND NOT in_set THEN 1 ELSE 0 END) as bigint) AS n_false_pos
         |FROM (
         |  SELECT m.l_orderkey, m.bloom_pass,
         |    EXISTS (SELECT 1 FROM orders o
         |            WHERE o.o_orderkey = m.l_orderkey
         |              AND o.o_totalprice > 400000.0) AS in_set
         |  FROM ($member) m)""".stripMargin
    },

    "q87_unigram_lp" -> {
      val lp = graft.pipeline.TextAnalysis.unigramLogProbSql(
        "documents", "doc_id", "text")
      s"SELECT doc_id, n_tokens, lp_mean FROM ($lp) ORDER BY doc_id"
    },

    "q96_hll_sql_agg" -> {
      val hll = graft.pipeline.Sketch.hllSql("documents", "doc_id", "lang, source")
      s"""SELECT h.lang, h.source, h.hll_estimate, e.exact_distinct
         |FROM ($hll) h
         |JOIN (SELECT lang, source,
         |        cast(count(DISTINCT doc_id) as bigint) AS exact_distinct
         |      FROM documents GROUP BY lang, source) e USING (lang, source)
         |ORDER BY h.lang, h.source""".stripMargin
    },

    "q99_shapefile_roundtrip" ->
      s"""SELECT cast(c_custkey as bigint) AS c_custkey, c_name,
         |  $oCustX AS gx, $oCustY AS gy
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q244_flatgeobuf_roundtrip" ->
      s"""SELECT c_custkey, c_name, $oCustX AS gx, $oCustY AS gy
         |FROM customer
         |WHERE $oCustX BETWEEN -50 AND 50 AND $oCustY BETWEEN -40 AND 40
         |ORDER BY c_custkey""".stripMargin,

    "q246_readfile_options" ->
      s"""SELECT c_custkey, c_nationkey, $oCustX AS gx, $oCustY AS gy
         |FROM customer
         |WHERE c_nationkey % 5 = 1
         |  AND $oCustX BETWEEN -60 AND 60 AND $oCustY BETWEEN -50 AND 50
         |ORDER BY c_custkey""".stripMargin,

    "q248_readfile_options2" ->
      s"""SELECT c_custkey, c_nationkey, true AS geom_dropped
         |FROM customer
         |WHERE c_nationkey % 5 = 1
         |  AND $oCustX BETWEEN -60 AND 60 AND $oCustY BETWEEN -50 AND 50
         |ORDER BY c_custkey""".stripMargin,

    // the KML round-trip is value-preserving (Double.toString), so the
    // oracle simply recomputes the written values from customer
    "q249_kml_roundtrip" ->
      s"""SELECT c_custkey, concat('c_', c_custkey) AS name,
         |  cast(c_custkey % 97 as double) / 8.0 AS score,
         |  $oCustX AS gx, $oCustY AS gy
         |FROM customer WHERE c_custkey <= 600 ORDER BY c_custkey""".stripMargin,

    "q250_gpx_waypoints" ->
      s"""SELECT concat('w_', c_custkey) AS name,
         |  cast(c_custkey % 500 as double) / 4.0 AS ele,
         |  concat('2024-01-01T00:', lpad(cast(c_custkey % 60 as varchar), 2, '0'), ':00Z') AS time,
         |  $oCustX AS gx, $oCustY AS gy
         |FROM customer WHERE c_custkey <= 600 ORDER BY name""".stripMargin,

    // replays the Snyder §21 ellipsoidal polar-stereographic forward
    // term-for-term (variant B: rho = a*mF*t/tF on the standard
    // parallel); south aspect runs on the mirrored latitude with
    // y = +rho*cos(theta), north on the true latitude with
    // y = -rho*cos(theta); rt_* echo the inputs (the fixed-point
    // inverse converges ~9 orders inside the 1e-6 deg rounding)
    "q252_polar_stereo" ->
      """WITH k AS (
        |  SELECT 6378137.0e0 AS a, 1.0/298.257223563 AS f,
        |    (1.0/298.257223563)*(2-1.0/298.257223563) AS e2,
        |    sqrt((1.0/298.257223563)*(2-1.0/298.257223563)) AS e),
        |kk AS (
        |  SELECT a, e2, e,
        |    cos(radians(71.0))/sqrt(1-e2*sin(radians(71.0))*sin(radians(71.0))) AS mf71,
        |    tan(pi()/4 - radians(71.0)/2)
        |      / pow((1-e*sin(radians(71.0)))/(1+e*sin(radians(71.0))), e/2) AS tf71,
        |    cos(radians(70.0))/sqrt(1-e2*sin(radians(70.0))*sin(radians(70.0))) AS mf70,
        |    tan(pi()/4 - radians(70.0)/2)
        |      / pow((1-e*sin(radians(70.0)))/(1+e*sin(radians(70.0))), e/2) AS tf70
        |  FROM k),
        |pts AS (
        |  SELECT c_custkey,
        |    cast(c_custkey % 360 - 180 as double) AS lon,
        |    -60.0 - cast(c_custkey % 30 as double) AS lats,
        |    60.0 + cast(c_custkey % 30 as double) AS latn
        |  FROM customer WHERE c_custkey <= 400),
        |proj AS (
        |  SELECT c_custkey, lon, lats, latn,
        |    a*mf71/tf71 * (tan(pi()/4 - radians(-lats)/2)
        |      / pow((1-e*sin(radians(-lats)))/(1+e*sin(radians(-lats))), e/2)) AS rho_s,
        |    a*mf70/tf70 * (tan(pi()/4 - radians(latn)/2)
        |      / pow((1-e*sin(radians(latn)))/(1+e*sin(radians(latn))), e/2)) AS rho_n,
        |    radians(lon) AS th_s,
        |    radians(lon) - radians(-45.0) AS th_n
        |  FROM pts CROSS JOIN kk)
        |SELECT c_custkey,
        |  round(rho_s * sin(th_s), 4) + 0.0 AS ant_x,
        |  round(rho_s * cos(th_s), 4) + 0.0 AS ant_y,
        |  round(rho_n * sin(th_n), 4) + 0.0 AS arc_x,
        |  round(-rho_n * cos(th_n), 4) + 0.0 AS arc_y,
        |  round(lon, 6) + 0.0 AS rt_lon,
        |  round(lats, 6) + 0.0 AS rt_lat
        |FROM proj ORDER BY c_custkey""".stripMargin,

    // every vertex at exactly r by the AEQD distance-preservation
    // property; 33 = 4*quadSegs + closing vertex; center strictly inside
    "q270_geodesic_buffer" ->
      """SELECT c_custkey, 33 AS nv,
        |  100000.0 AS dmin, 100000.0 AS dmax, true AS ctr_inside
        |FROM customer WHERE c_custkey <= 800 ORDER BY c_custkey""".stripMargin,

    // identical unrolled peel rounds; converged = |e5| == |e6|
    "q313_kcore" -> {
      val k = 4; val rounds = 6
      val peel = (1 to rounds).map { r =>
        s"""d$r AS (SELECT n, cast(count(*) as bigint) AS d FROM (
           |  SELECT u AS n FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1}) x GROUP BY n),
           |k$r AS (SELECT n FROM d$r WHERE d >= $k),
           |e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
           |  JOIN k$r a ON a.n = e.u JOIN k$r b ON b.n = e.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT c_custkey % 60 AS src, (c_custkey + 13) % 60 AS dst FROM customer
         |  UNION ALL
         |  SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer
         |  UNION ALL
         |  SELECT c_custkey % 40, (c_custkey * 3 + 1) % 40 FROM customer),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM raw WHERE src != dst),
         |$peel
         |SELECT cast(node as bigint) AS node, cast(count(*) as bigint) AS core_deg,
         |  (SELECT count(*) FROM e${rounds - 1}) = (SELECT count(*) FROM e$rounds) AS converged
         |FROM (SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds) x
         |GROUP BY node ORDER BY node""".stripMargin
    },

    // same integer sums, one double division per statistic; kappa from
    // the UNROUNDED po/pe in both engines
    "q314_annotator_agreement" ->
      """WITH ann AS MATERIALIZED (
        |  SELECT o_orderkey AS item, 'a' AS rater,
        |    substring(o_orderpriority, 1, 1) AS label FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'b', CASE WHEN o_orderkey % 5 = 0
        |    THEN cast(cast(substring(o_orderpriority, 1, 1) as int) % 5 + 1 as varchar)
        |    ELSE substring(o_orderpriority, 1, 1) END FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'c', CASE WHEN o_orderkey % 3 = 0
        |    THEN cast((cast(substring(o_orderpriority, 1, 1) as int) + 1) % 5 + 1 as varchar)
        |    ELSE substring(o_orderpriority, 1, 1) END FROM orders),
        |pairs AS MATERIALIZED (
        |  SELECT a.rater AS r1, b.rater AS r2, a.label AS l1, b.label AS l2
        |  FROM ann a JOIN ann b ON a.item = b.item AND a.rater < b.rater),
        |joint AS (SELECT r1, r2, cast(count(*) as bigint) AS n_items,
        |  cast(sum(CASE WHEN l1 = l2 THEN 1 ELSE 0 END) as bigint) AS agree
        |  FROM pairs GROUP BY r1, r2),
        |m1 AS (SELECT r1, r2, l1 AS l, cast(count(*) as bigint) AS c1
        |  FROM pairs GROUP BY r1, r2, l1),
        |m2 AS (SELECT r1, r2, l2 AS l, cast(count(*) as bigint) AS c2
        |  FROM pairs GROUP BY r1, r2, l2),
        |pen AS (SELECT m1.r1, m1.r2, sum(c1 * c2) AS pe_num
        |  FROM m1 JOIN m2 ON m1.r1 = m2.r1 AND m1.r2 = m2.r2 AND m1.l = m2.l
        |  GROUP BY m1.r1, m1.r2),
        |craw AS (SELECT j.r1, j.r2, j.n_items,
        |  cast(agree as double) / n_items AS po_raw,
        |  cast(pe_num as double) / (n_items * n_items) AS pe_raw
        |  FROM joint j JOIN pen p ON j.r1 = p.r1 AND j.r2 = p.r2),
        |cell AS (SELECT item, label, cast(count(*) as bigint) AS nij
        |  FROM ann GROUP BY item, label),
        |tot AS (SELECT cast(sum(nij * nij) as bigint) AS ss,
        |  cast((SELECT count(DISTINCT item) FROM ann) as bigint) AS big_n FROM cell),
        |lab AS (SELECT cast(sum(cj * cj) as bigint) AS cs FROM (
        |  SELECT sum(nij) AS cj FROM cell GROUP BY label) x),
        |fraw AS (SELECT big_n AS n_items,
        |  cast(ss - big_n * 3 as double) / cast(big_n * 3 * 2 as double) AS po_raw,
        |  cast(cs as double) / (cast(big_n * 3 as double) * cast(big_n * 3 as double)) AS pe_raw
        |  FROM tot, lab)
        |SELECT r1, r2, n_items, round(po_raw, 6) + 0.0 AS po,
        |  round(pe_raw, 6) + 0.0 AS pe,
        |  round((po_raw - pe_raw) / (1.0 - pe_raw), 6) + 0.0 AS kappa
        |FROM (
        |  SELECT r1, r2, n_items, po_raw, pe_raw FROM craw
        |  UNION ALL
        |  SELECT 'panel', 'fleiss', n_items, po_raw, pe_raw FROM fraw) u
        |ORDER BY r1, r2""".stripMargin,

    // forward-only unroll of the q315 levels; per-level dist literals,
    // round-9 decimal harmonic fold
    "q317_closeness" -> {
      val maxD = 7
      val fwd = (1 to maxD).map { d =>
        s"""f$d AS MATERIALIZED (SELECT DISTINCT f.src, a.v AS node
           |  FROM f${d - 1} f JOIN adj a ON a.u = f.node
           |  WHERE NOT EXISTS (SELECT 1 FROM s${d - 1} s
           |    WHERE s.src = f.src AND s.node = a.v)),
           |s$d AS MATERIALIZED (SELECT src, node FROM s${d - 1}
           |  UNION ALL SELECT src, node FROM f$d)""".stripMargin
      }.mkString(",\n")
      val distUnion = (1 to maxD)
        .map(d => s"SELECT src, node, $d AS dist FROM f$d").mkString(" UNION ALL ")
      s"""WITH raw AS (
         |  SELECT c_custkey % 48 AS src, (c_custkey * 5 + 7) % 48 AS dst FROM customer
         |  UNION ALL
         |  SELECT c_custkey % 48, (c_custkey * 11 + 3) % 48 FROM customer),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,
         |  greatest(src, dst) AS v FROM raw WHERE src != dst),
         |adj AS MATERIALIZED (SELECT u, v FROM e0
         |  UNION ALL SELECT v AS u, u AS v FROM e0),
         |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM adj),
         |f0 AS MATERIALIZED (SELECT node AS src, node FROM nodes),
         |s0 AS MATERIALIZED (SELECT src, node FROM f0),
         |$fwd,
         |st AS (SELECT node, cast(count(*) as bigint) AS reach,
         |  cast(max(dist) as int) AS ecc,
         |  cast(sum(cast(dist as bigint)) as bigint) AS td,
         |  cast(sum(cast(round(1.0 / cast(dist as double), 9) as decimal(28,9)))
         |    as decimal(28,9)) AS hm
         |  FROM ($distUnion) b GROUP BY node)
         |SELECT cast(n.node as bigint) AS node,
         |  coalesce(st.reach, 0) AS reach, coalesce(st.ecc, 0) AS ecc,
         |  round(CASE WHEN st.td IS NOT NULL
         |    THEN cast(st.reach as double) / cast(st.td as double)
         |    ELSE 0.0 END, 6) + 0.0 AS closeness,
         |  round(cast(coalesce(st.hm, cast(0 as decimal(28,9))) as double), 6)
         |    + 0.0 AS harmonic,
         |  ((SELECT count(*) FROM f$maxD) = 0) AS complete
         |FROM nodes n LEFT JOIN st ON st.node = n.node
         |ORDER BY node""".stripMargin
    },

    // unrolled likelihood-scored rounds; score replayed term-for-term
    "q316_wordpiece" ->
      s"""WITH ${wordPieceTrainCtes(64,
            "(SELECT c_name || ' ' || c_mktsegment AS text FROM customer)", "text")}
         |SELECT round, split_part(pair, ' ', 1) AS lhs,
         |  split_part(pair, ' ', 2) AS rhs, f AS freq,
         |  round(score, 9) + 0.0 AS score
         |FROM (${(1 to 64).map(r => s"SELECT $r AS round, pair, f, score FROM m$r")
        .mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin,

    // identical unrolled forward levels (BIGINT sigma) + backward delta
    // levels (round-9 terms summed as decimal(28,9)); complete = the
    // depth-7 frontier is empty
    "q315_betweenness" -> {
      val maxD = 7
      val fwd = (1 to maxD).map { d =>
        s"""f$d AS MATERIALIZED (SELECT f.src, a.v AS node,
           |  cast(sum(f.sigma) as bigint) AS sigma
           |  FROM f${d - 1} f JOIN adj a ON a.u = f.node
           |  WHERE NOT EXISTS (SELECT 1 FROM s${d - 1} s
           |    WHERE s.src = f.src AND s.node = a.v)
           |  GROUP BY f.src, a.v),
           |s$d AS MATERIALIZED (SELECT src, node FROM s${d - 1}
           |  UNION ALL SELECT src, node FROM f$d)""".stripMargin
      }.mkString(",\n")
      val bwd = (maxD - 1 to 1 by -1).map { d =>
        val dw = if (d == maxD - 1) s"cast(cast(0 as decimal(28,9)) as double)"
          else s"cast(coalesce(dd.delta, cast(0 as decimal(28,9))) as double)"
        val ddJoin = if (d == maxD - 1) ""
          else s"LEFT JOIN g${d + 1} dd ON dd.src = fv.src AND dd.vn = a.v"
        s"""g$d AS MATERIALIZED (SELECT fv.src, fv.node AS vn,
           |  cast(sum(cast(round(cast(fv.sigma as double) / cast(fw.sigma as double)
           |    * (1.0 + $dw), 9) as decimal(28,9))) as decimal(28,9)) AS delta
           |  FROM f$d fv JOIN adj a ON a.u = fv.node
           |  JOIN f${d + 1} fw ON fw.src = fv.src AND fw.node = a.v
           |  $ddJoin
           |  GROUP BY fv.src, fv.node)""".stripMargin
      }.mkString(",\n")
      val gUnion = (1 to maxD - 1)
        .map(d => s"SELECT src, vn, delta FROM g$d").mkString(" UNION ALL ")
      s"""WITH raw AS (
         |  SELECT c_custkey % 48 AS src, (c_custkey * 5 + 7) % 48 AS dst FROM customer
         |  UNION ALL
         |  SELECT c_custkey % 48, (c_custkey * 11 + 3) % 48 FROM customer),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,
         |  greatest(src, dst) AS v FROM raw WHERE src != dst),
         |adj AS MATERIALIZED (SELECT u, v FROM e0
         |  UNION ALL SELECT v AS u, u AS v FROM e0),
         |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM adj),
         |f0 AS MATERIALIZED (SELECT node AS src, node,
         |  cast(1 as bigint) AS sigma FROM nodes),
         |s0 AS MATERIALIZED (SELECT src, node FROM f0),
         |$fwd,
         |$bwd,
         |bc AS (SELECT vn AS node, sum(delta) AS sd
         |  FROM ($gUnion) g WHERE vn != src GROUP BY vn)
         |SELECT cast(n.node as bigint) AS node,
         |  round(cast(coalesce(bc.sd, cast(0 as decimal(28,9))) as double) / 2.0, 6)
         |    + 0.0 AS bc,
         |  ((SELECT count(*) FROM f$maxD) = 0) AS complete
         |FROM nodes n LEFT JOIN bc ON bc.node = n.node
         |ORDER BY node""".stripMargin
    },

    // leaf state once (hllBucketStateSql), rollup levels by max-merge
    // over the state — the same merge the Spark side does
    "q310_hll_cube" -> {
      import graft.pipeline.Sketch
      s"""WITH leaf AS (${Sketch.hllBucketStateSql("lineitem", "l_orderkey",
            "l_returnflag, l_linestatus")}),
         |leafg AS (SELECT l_returnflag || '|' || l_linestatus AS g,
         |    l_returnflag, l_linestatus, bucket, rmax FROM leaf),
         |l0 AS (SELECT split_part(g, '|', 1) AS grp_flag,
         |    split_part(g, '|', 2) AS grp_status, hll_estimate, n_buckets_used
         |  FROM (${Sketch.hllEstimateSql("leafg", "g")}) x),
         |m1 AS (SELECT l_returnflag AS g, bucket, max(rmax) AS rmax
         |  FROM leafg GROUP BY 1, 2),
         |l1 AS (SELECT g AS grp_flag, 'ALL' AS grp_status, hll_estimate,
         |    n_buckets_used FROM (${Sketch.hllEstimateSql("m1", "g")}) x),
         |m2 AS (SELECT 'ALL' AS g, bucket, max(rmax) AS rmax
         |  FROM leafg GROUP BY 1, 2),
         |l2 AS (SELECT g AS grp_flag, 'ALL' AS grp_status, hll_estimate,
         |    n_buckets_used FROM (${Sketch.hllEstimateSql("m2", "g")}) x)
         |SELECT * FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1
         |  UNION ALL SELECT * FROM l2)
         |ORDER BY grp_flag, grp_status""".stripMargin
    },

    // identical closed-form arithmetic (pow alpha=0.3, same division
    // order); unnest-free — plain grouped aggregation
    "q311_temperature_mixture" ->
      """WITH bylang AS (
        |  SELECT lang, cast(count(*) as bigint) AS n_docs,
        |    cast(sum(n_chars) as bigint) AS chars
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT cast(sum(chars) as double) AS tc,
        |               cast(sum(pow(chars, 0.3)) as double) AS tq FROM bylang)
        |SELECT b.lang, b.n_docs, b.chars,
        |  round(b.chars / t.tc, 6) + 0.0 AS p,
        |  round(pow(b.chars, 0.3) / t.tq, 6) + 0.0 AS q,
        |  round((pow(b.chars, 0.3) / t.tq) / (b.chars / t.tc), 6) + 0.0 AS upsample,
        |  cast(round(pow(b.chars, 0.3) / t.tq * 100000, 0) as bigint) AS budget_docs
        |FROM bylang b CROSS JOIN tot t
        |ORDER BY b.lang""".stripMargin,

    // same rank/cumulative windows over the word counts
    "q312_vocab_coverage" ->
      """WITH w AS (
        |  SELECT word, cast(count(*) as bigint) AS f FROM (
        |    SELECT unnest(regexp_extract_all(trim(text), '\S+')) AS word
        |    FROM documents) GROUP BY word),
        |r AS (SELECT word, f,
        |    row_number() OVER (ORDER BY f DESC, word) AS rk,
        |    sum(f) OVER (ORDER BY f DESC, word
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(f) OVER () AS tot
        |  FROM w)
        |SELECT cast(n.n as int) AS top_n,
        |  cast(coalesce(max(CASE WHEN rk <= n.n THEN rk END), 0) as bigint) AS words_present,
        |  round(coalesce(max(CASE WHEN rk <= n.n THEN cum END), 0) / max(cast(tot as double)), 6) + 0.0 AS coverage
        |FROM r CROSS JOIN (SELECT unnest([10, 100, 1000]) AS n) n
        |GROUP BY n.n ORDER BY top_n""".stripMargin,

    // the identical portable text (decimal folds + Cramer scalars)
    "q319_ols_regression" ->
      graft.pipeline.Regression.olsSql("lineitem",
        "cast(l_quantity as double)", "cast(l_discount as double)",
        "cast(l_extendedprice as double) / 1000.0"),

    // unrolled rounds sharing Graph.hits' arithmetic
    "q329_hits" -> hitsOracleSql(4),

    // duck tokenizer + md5 spelling, same hashing core
    "q334_feature_hash" ->
      featureHashSql(graft.pipeline.TextClassify.duckTok,
        graft.pipeline.TopicModel.duckDialect),

    "q335_target_encoding" ->
      targetEncodingSql(graft.pipeline.TopicModel.duckDialect),

    "q336_permutation_test" ->
      permTestSql(graft.pipeline.TopicModel.duckDialect),

    // identical portable texts
    "q337_mann_whitney" -> mannWhitneySql,
    "q338_benford" -> benfordSql,
    "q339_welch_ttest" -> welchSql,
    "q341_markov_stationary" -> markovSql(4),
    "q342_anova" -> anovaSql,
    "q343_ks_test" -> ksSql,
    "q344_bh_fdr" -> bhFdrSql,
    "q346_woe_iv" -> woeSql,
    "q349_item_cooccurrence" -> itemCooccurSql,
    "q350_seq_patterns" -> seqPatternsSql,
    "q351_mutual_info" -> mutualInfoSql,
    "q352_cramers_v" -> cramersVSql,
    "q353_markov_entropy" -> markovEntropySql(4),

    // unrolled Katz recurrence, Graph.katz's arithmetic
    "q354_katz_centrality" -> katzOracleSql(4),

    // identical portable texts
    "q356_isotonic" -> isotonicSql,
    "q359_assortativity" -> assortativitySql,
    "q360_modularity" -> modularitySql,

    // duck vector / integer-division spellings, same cores
    "q355_lof" -> lofSql((a, b) => s"list_dot_product($a, $b)",
      "cast(embedding as double[])", spark = false),
    "q357_theil_sen" -> theilSenSql(e => s"epoch_us($e) // 86400000000"),
    "q358_rolling_ols" -> rollingOlsSql(e => s"epoch_us($e) // 86400000000"),
    "q361_huber" -> huberSql(e => s"epoch_us($e) // 86400000000"),
    "q362_ransac" -> ransacSql(graft.pipeline.TopicModel.duckDialect,
      e => s"epoch_us($e) // 86400000000"),
    "q363_burstiness" -> burstinessSql(e => s"epoch_us($e) // 86400000000"),
    "q364_dow_chi2" -> dowChi2Sql(e => s"epoch_us($e) // 86400000000"),

    // duck array/tokenizer spellings, same MATTR / burst cores
    "q365_mattr" -> mattrSql(spark = false),
    "q366_keyword_burst" ->
      keywordBurstSql(graft.pipeline.TextClassify.duckTok),

    // identical portable texts
    "q367_hilbert_layout" -> hilbertLayoutSql,
    "q371_t_closeness" -> tClosenessSql,
    "q373_psi" -> psiSql,
    "q374_gain_lift" -> gainLiftSql,
    "q376_triple_assoc" -> tripleAssocSql,

    // duck integer-division spellings, same cores
    "q372_conformal" -> conformalSql(e => s"epoch_us($e) // 86400000000"),
    "q375_cohort_ltv" -> cohortLtvSql(e => s"epoch_us($e) // 86400000000"),

    // identical portable texts
    "q377_next_event_accuracy" -> nextEventAccuracySql,
    "q380_ppr" -> pprSql(4),

    // duck tokenizer spellings, same ranking/coherence cores
    "q378_ndcg" -> ndcgSql(graft.pipeline.TextClassify.duckTok),
    "q379_coherence" -> coherenceSql(graft.pipeline.TextClassify.duckTok),
    "q384_textrank" -> textRankSql(graft.pipeline.TextClassify.duckTok, iters = 4),

    // identical portable texts
    "q383_sprt" -> sprtSql,
    "q385_neyman" -> neymanSql,
    "q386_krippendorff" -> krippendorffSql,
    "q387_bradley_terry" -> bradleyTerrySql(3),
    "q388_group_imputation" -> groupImputeSql,
    "q389_power_analysis" -> powerAnalysisSql,
    "q390_lorenz" -> lorenzSql,
    "q391_srm" -> srmSql,
    "q393_qte" -> qteSql,
    "q394_reciprocity_clustering" -> reciprocityClusteringSql,
    "q395_powerlaw_fit" -> powerlawFitSql,
    "q397_brier" -> brierSql,

    // duck integer-division spelling, same CUPED moments
    "q392_cuped" -> cupedSql(e => s"epoch_us($e) // 86400000000"),

    // identical portable texts
    "q398_stratified_ate" -> stratifiedAteSql,
    "q399_mcnemar" -> mcnemarSql,
    "q400_partial_corr" -> partialCorrSql,
    "q402_hhi" -> hhiSql,

    // duck integer-division spellings, same cores
    "q401_cooks_distance" ->
      cooksDistanceSql(e => s"epoch_us($e) // 86400000000"),
    "q403_runs_test" -> runsTestSql(e => s"epoch_us($e) // 86400000000"),
    "q404_gumbel" -> gumbelSql(e => s"epoch_us($e) // 86400000000"),
    "q405_newsvendor" -> newsvendorSql(e => s"epoch_us($e) // 86400000000"),
    "q408_kendall" -> kendallSql(e => s"epoch_us($e) // 86400000000"),

    // identical portable texts
    "q406_abc" -> abcSql,
    "q407_emd" -> emdSql,
    "q409_elasticity" -> elasticitySql,
    "q411_eb_shrinkage" -> ebShrinkageSql,
    "q412_fairness_audit" -> fairnessAuditSql,

    // duck integer-division spelling, same hazard table
    "q410_churn_hazard" ->
      churnHazardSql(e => s"epoch_us($e) // 7776000000000"),

    // identical portable texts
    "q413_hill_tail" -> hillTailSql,
    "q414_two_proportion_z" -> twoProportionSql,
    "q415_jarque_bera" -> jarqueBeraSql,
    "q417_multi_ols2" -> multiOls2Sql,
    "q418_rec_holdout" -> recHoldoutSql,
    "q419_copod" -> copodSql,
    "q420_simpson_flip" -> simpsonFlipSql,

    // duck tokenizer spelling, same ROUGE clipping
    "q421_rouge" -> rougeSql(graft.pipeline.TextClassify.duckTok),

    // duck positional tokenizer, same BLEU / diversity cores
    "q422_bleu" -> bleuSql(graft.pipeline.TextClassify.duckTokPos),
    "q424_distinct_n" -> distinctNSql(graft.pipeline.TextClassify.duckTokPos),
    "q425_self_overlap" ->
      selfOverlapSql(graft.pipeline.TextClassify.duckTokPos),

    // duck year spelling, same Laspeyres bridge
    "q423_price_volume" -> priceVolumeSql(e => s"year($e)"),

    // identical portable texts
    "q429_tost" -> tostSql,
    "q430_rec_coverage" -> recCoverageSql,

    // identical portable texts
    "q436_apriori_triples" -> aprioriTriplesSql,
    "q439_raking" -> rakingSql(3),
    "q440_scd2_snapshot" -> scd2Sql,
    "q441_absorbing_steps" -> absorbingSql(40, " MATERIALIZED"),
    "q444_cochran_armitage" -> cochranArmitageSql,
    "q445_kendall_w" -> kendallWSql,
    "q447_g_test" -> gTestSql,
    "q449_cliffs_delta" -> cliffsDeltaSql,
    "q450_atkinson" -> atkinsonSql,
    "q451_wilson_interval" -> wilsonSql,
    "q456_hosmer_lemeshow" -> hosmerLemeshowSql,
    "q460_rich_club" -> richClubSql,
    "q462_moods_median" -> moodsMedianSql,
    "q463_levene" -> leveneSql,
    "q466_otsu" -> otsuSql,
    "q467_borda" -> bordaSql,

    // duck integer-division spellings, same series cores (PACF/STL)
    "q464_pacf" -> pacfSql(e => s"epoch_us($e) // 86400000000"),
    "q465_stl_strength" ->
      stlStrengthSql(e => s"epoch_us($e) // 86400000000"),
    "q468_truss_peel" -> trussSql(2),
    "q469_renewal" -> renewalSql(e => s"epoch_us($e)", "//"),
    "q470_weibull" -> weibullSql(e => s"epoch_us($e)", "//"),
    "q471_xmr_chart" -> xmrSql(e => s"epoch_us($e) // 86400000000"),
    "q472_rmst" -> rmstSql(e => s"epoch_us($e)", "//"),
    "q475_icc" -> iccSql(e => s"epoch_us($e) // 86400000000"),
    "q476_seasonal_mk" ->
      seasonalMkSql(e => s"epoch_us($e) // 86400000000"),
    "q477_turning_point" ->
      turningPointSql(e => s"epoch_us($e) // 86400000000"),

    // duck positional tokenizer, same estimator cores
    "q473_chao1" -> chao1Sql(graft.pipeline.TextClassify.duckTokPos),
    "q474_chapman" ->
      chapmanSql(graft.pipeline.TextClassify.duckTokPos),

    // identical portable texts (linkage + ranking agreement)
    "q483_fellegi_sunter" -> fellegiSunterSql(2),
    // duck twin is the fully-unrolled 12x12 lateral-alias LCS DP
    "q486_lcs_sequences" ->
      lcsOracleSql(e => s"epoch_us($e) // 86400000000"),
    "q487_theil" -> theilSql,
    "q488_oaxaca" -> oaxacaSql,
    // duck twin needs MATERIALIZED on shared/per-round CTEs (q441 lesson)
    "q489_markov_attribution" ->
      markovAttributionSql(24, " MATERIALIZED"),
    "q490_err" -> errSql,
    "q491_kruskal_wallis" -> kruskalWallisSql,
    "q492_friedman" -> friedmanSql(e => s"epoch_us($e) // 86400000000"),
    "q493_competing_risks" -> cifSql(e => s"epoch_us($e)", "//"),
    "q494_burstiness_cg" ->
      burstinessSql(graft.pipeline.TextClassify.duckTokPos),
    "q495_cochran_q" ->
      cochranQSql(e => s"epoch_us($e) // 86400000000"),
    "q496_design_effect" -> deffSql,
    "q497_yuen_t" -> yuenSql,
    "q498_obf_monitor" -> obfSql(e => s"epoch_us($e) // 86400000000"),
    "q499_page_trend" ->
      pageTrendSql(e => s"epoch_us($e) // 86400000000"),
    "q500_tukey_hsd" -> tukeyHsdSql,
    "q501_dunn" -> dunnSql,
    "q502_james_stein" -> jamesSteinSql,
    "q503_box_cox" -> boxCoxSql,
    "q504_anderson_darling" -> adExpSql(e => s"epoch_us($e)", "//"),
    "q505_gmm2_em" -> gmm2Sql(3),
    "q506_monroe_log_odds" ->
      monroeSql(graft.pipeline.TextClassify.duckTokPos),
    "q507_syntetos_boylan" ->
      syntetosBoylanSql((a, b) => s"date_diff('day', $b, $a)"),
    "q508_poisson_gamma" ->
      poissonGammaSql("epoch_us(o.o_orderdate) // 604800000000"),
    "q509_psm" -> psmSql(e => s"epoch_us($e) // 86400000000"),
    "q510_rdd" -> rddSql,
    "q511_wald_iv" -> waldIvSql,
    "q512_event_study" ->
      eventStudySql(e => s"epoch_us($e) // 86400000000"),
    "q513_breusch_pagan" -> breuschPaganSql,
    "q514_hc0" -> hc0Sql,
    "q515_fixed_effects" ->
      fixedEffectsSql(e => s"epoch_us($e) // 86400000000"),
    "q516_clustered_se" ->
      clusteredSeSql(e => s"epoch_us($e) // 86400000000"),
    "q517_kde" -> kdeSql,
    "q518_nadaraya_watson" -> nadarayaWatsonSql,
    "q519_loess" -> loessSql,
    "q520_lad_regression" -> ladSql(3),
    "q521_poisson_glm" ->
      poissonGlmSql(e => s"epoch_us($e) // 86400000000"),
    "q522_cox_ph" -> coxPhSql(e => s"epoch_us($e)", "//"),
    "q523_aic_table" -> aicTableSql(e => s"epoch_us($e) // 86400000000"),
    "q524_granger" -> grangerSql(e => s"epoch_us($e) // 86400000000"),
    "q525_arch_lm" -> archSql(e => s"epoch_us($e) // 86400000000"),
    "q526_ljung_box" -> ljungBoxSql(e => s"epoch_us($e) // 86400000000"),
    "q527_clustering_coef" -> clusteringCoefSql,
    "q528_littles_law" -> littlesLawSql(e => s"epoch_us($e)", "//",
      "SELECT unnest(generate_series(0, 1000)) AS i"),
    "q529_mcc" -> mccSql,
    "q530_clayton_copula" ->
      claytonSql(e => s"epoch_us($e) // 86400000000"),
    "q531_gpd_pot" -> gpdPotSql,
    "q532_rec_novelty" -> recNoveltySql,
    "q533_conversion_paths" -> conversionPathsSql,
    "q534_price_dispersion" -> priceDispersionSql,
    "q535_dup_payments" ->
      dupPaymentSql((a, b) => s"date_diff('day', $b, $a)"),
    "q536_wasserstein" -> wassersteinSql,
    "q537_ewma_chart" ->
      ewmaChartSql(e => s"epoch_us($e) // 86400000000"),
    "q538_croston" ->
      crostonSql(e => s"date_diff('day', DATE '1970-01-01', cast($e as date))"),
    "q539_spectral_entropy" ->
      spectralEntropySql(e => s"epoch_us($e) // 86400000000"),
    "q540_herfindahl" -> herfindahlSql,
    "q541_energy_distance" -> energyDistanceSql,
    "q484_rbo" -> rboSql,
    "q485_kemeny" -> kemenySql,

    // identical portable text / duck spellings (calibration + survival)
    "q478_spiegelhalter" -> spiegelhalterSql,
    "q479_distance_corr" -> dcorSql(e => s"epoch_us($e) // 86400000000"),
    "q480_logrank" -> logRankSql(e => s"epoch_us($e)", "//"),
    "q481_sh_esd" -> shEsdSql(e => s"epoch_us($e) // 86400000000"),
    "q482_synth_control" -> synthControlSql(e => s"year($e)"),
    // recursive min-label closure over the same blocked match graph
    "q452_entity_resolution" -> entityResolutionOracleSql,
    // duck md5-prefix bucket spelling, same jackknife folds
    "q461_jackknife" -> jackknifeSql(
      "('0x' || substr(md5(cast(o_orderkey as varchar)), 1, 15))::BIGINT % 10"),
    // duck integer-division spelling, same ensemble core
    "q457_crps" -> crpsSql(e => s"epoch_us($e) // 86400000000"),
    // duck positional tokenizer, same lexical/stylometry cores
    "q458_yule_k" ->
      yuleKSql(graft.pipeline.TextClassify.duckTokPos),
    "q459_burrows_delta" ->
      burrowsDeltaSql(graft.pipeline.TextClassify.duckTokPos),

    // duck integer-division spellings, same backtest/uplift cores
    "q453_markov2_backtest" ->
      markov2Sql(e => s"epoch_us($e) // 86400000000"),
    "q454_overdispersion" ->
      overdispersionSql(e => s"epoch_us($e) // 86400000000"),
    "q455_qini" -> qiniSql(e => s"epoch_us($e) // 86400000000"),

    // duck integer-division spellings, same unrolled/window cores
    "q446_holt_winters" ->
      holtWintersSql(e => s"epoch_us($e) // 86400000000"),
    "q448_mase_theil" -> maseSql(e => s"epoch_us($e) // 86400000000"),

    // duck replay: train CTEs + encode replace-chain
    "q442_bpe_fertility" -> bpeFertilitySql(48),
    // duck positional tokenizer, same doubling-join ladder
    "q443_ngram_ladder" ->
      ngramLadderSql(graft.pipeline.TextClassify.duckTokPos,
        g => s"('0x' || substr(md5($g), 1, 15))::BIGINT"),

    // duck integer-division spellings, same journey/series cores
    "q437_shapley_attribution" ->
      shapleySql(e => s"epoch_us($e) // 86400000000"),
    "q438_diff_in_diff" -> didSql(e => s"epoch_us($e) // 86400000000"),

    // duck integer-division spellings, same series cores
    "q431_yule_walker" ->
      yuleWalkerSql(e => s"epoch_us($e) // 86400000000"),
    "q432_max_drawdown" ->
      drawdownSql(e => s"epoch_us($e) // 86400000000"),
    "q433_nelson_aalen" -> nelsonAalenSql(e => s"epoch_us($e)", "//"),
    "q434_esd_peel" -> esdPeelSql(e => s"epoch_us($e) // 86400000000"),
    // duck twin is the fully-unrolled 7x7 lateral-alias DP
    "q435_dtw_profiles" ->
      dtwOracleSql(e => s"epoch_us($e) // 86400000000"),
    "q426_perm_entropy" ->
      permEntropySql(e => s"epoch_us($e) // 86400000000"),
    "q427_hurst" -> hurstSql(e => s"epoch_us($e) // 86400000000"),
    "q428_periodogram" ->
      periodogramSql(e => s"epoch_us($e) // 86400000000"),

    // duck integer-division spelling, same DW residual walk
    "q416_durbin_watson" ->
      durbinWatsonSql(e => s"epoch_us($e) // 86400000000"),

    // duck winnowing fp CTEs + the shared final arithmetic
    "q396_dedup_eval" -> dedupEvalOracleSql,

    // duck integer-division spellings, same cores
    "q381_snaive_eval" -> snaiveEvalSql(e => s"epoch_us($e) // 86400000000"),
    "q382_binary_seg" -> binarySegSql(e => s"epoch_us($e) // 86400000000"),

    // duck md5 / vector spellings, same cores
    "q368_negative_sampling" ->
      negativeSamplingSql(graft.pipeline.TopicModel.duckDialect),
    "q369_hard_negatives" -> hardNegativesSql(
      (a, b) => s"list_dot_product($a, $b)", "cast(embedding as double[])"),
    "q370_intrinsic_dim" -> twoNNSql(
      (a, b) => s"list_dot_product($a, $b)", "cast(embedding as double[])",
      spark = false),

    // duck integer-division spelling, same Pearson folds
    "q340_acf" -> acfSql(e => s"epoch_us($e) // 86400000000"),

    // duck tokenizer spellings, same PMI / JS cores
    "q345_pmi" -> pmiSql(graft.pipeline.TextClassify.duckTok),
    "q347_js_divergence" -> jsDivergenceSql(
      """SELECT source, unnest(regexp_extract_all(lower(trim(text)), '\S+')) AS word
        |FROM documents WHERE text IS NOT NULL AND source IS NOT NULL""".stripMargin),

    // duck array-primitive spellings, same winnowing selection
    "q348_winnowing" -> winnowOracleSql,

    // duck positional tokenizer + ordered string_agg, same scoring core
    "q330_rake_keywords" ->
      graft.pipeline.TextClassify.rakeSql(
        graft.pipeline.TextClassify.duckTokPos,
        graft.pipeline.TextClassify.duckPhraseAgg),

    // identical portable texts
    "q331_gini" -> giniSql,
    "q332_spearman" -> spearmanSql,

    // duck md5 spelling, same A-Res key
    "q333_ares_sample" ->
      aresSql(graft.pipeline.TopicModel.duckDialect),

    // duck md5 spelling, same inverse-CDF Laplace
    "q325_dp_release" ->
      dpCountsSql(graft.pipeline.TopicModel.duckDialect),

    // identical portable text
    "q326_idw_interpolation" -> idwSql,

    // epoch_us spelling, same credit core
    "q327_attribution" ->
      attributionSql(e => s"epoch_us($e)"),

    // duck integer division spelling, same closed form
    "q328_exp_smoothing" ->
      expSmoothSql(e => s"epoch_us($e) // 86400000000"),

    // same scoring core over the duck tokenizer
    "q321_naive_bayes" ->
      graft.pipeline.TextClassify.naiveBayesSql(graft.pipeline.TextClassify.duckTok),

    "q322_chi2_terms" ->
      graft.pipeline.TextClassify.chi2Sql(graft.pipeline.TextClassify.duckTok, k = 5),

    // duck count spellings, shared formula core
    "q323_readability" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    cast(len(regexp_extract_all(trim(text), '\\S+')) as bigint) AS w,
         |    cast(len(regexp_extract_all(text, '[.!?]+')) as bigint) AS s,
         |    cast(len(regexp_extract_all(lower(text), '[aeiouy]+')) as bigint) AS y
         |  FROM documents WHERE text IS NOT NULL)
         |$readabilityCore""".stripMargin,

    // wedge enumeration + anti-join mirror of Graph.adamicAdar
    "q324_adamic_adar" ->
      """WITH raw AS (
        |  SELECT c_custkey % 60 AS src, (c_custkey + 13) % 60 AS dst FROM customer
        |  UNION ALL
        |  SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer
        |  UNION ALL
        |  SELECT c_custkey % 40, (c_custkey * 3 + 1) % 40 FROM customer),
        |ed AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM raw WHERE src != dst),
        |adj AS MATERIALIZED (SELECT u AS n, v AS nb FROM ed UNION ALL SELECT v, u FROM ed),
        |deg AS (SELECT n AS z, cast(count(*) as bigint) AS d FROM adj GROUP BY n),
        |wedge AS (
        |  SELECT a.n AS wu, b.n AS wv, a.nb AS z
        |  FROM adj a JOIN adj b ON a.nb = b.nb AND a.n < b.n),
        |aa AS (
        |  SELECT w.wu, w.wv,
        |    sum(cast(round(1.0 / ln(cast(d.d as double)), 9) as decimal(20,9))) AS s
        |  FROM wedge w JOIN deg d ON d.z = w.z WHERE d.d > 1
        |  GROUP BY w.wu, w.wv),
        |cand AS (
        |  SELECT aa.wu AS u, aa.wv AS v,
        |    round(cast(aa.s as double), 6) + 0.0 AS aa_score
        |  FROM aa LEFT JOIN ed e ON e.u = aa.wu AND e.v = aa.wv
        |  WHERE e.u IS NULL)
        |SELECT cast(u as bigint) AS u, cast(v as bigint) AS v, aa_score
        |FROM cand ORDER BY aa_score DESC, u, v LIMIT 20""".stripMargin,

    // identical round builders, unrolled (duck MATERIALIZED CTE chain)
    "q320_boosted_stumps" ->
      graft.pipeline.Boost.chainSql("lineitem",
        Seq("cast(l_quantity as double)", "cast(l_discount as double)"),
        "cast(l_extendedprice as double) / 1000.0", rounds = 3, lr = 0.5),

    // identical init + 2 H/W update rounds, unrolled as MATERIALIZED
    // CTEs from the same TopicModel step builders (duck dialect)
    "q318_nmf_topics" ->
      s"""WITH v AS MATERIALIZED ($nmfVSql),
         |${graft.pipeline.TopicModel.chainSql("v", k = 2, iters = 2)}
         |SELECT 'w' AS matrix, doc AS id, j, round(w, 6) + 0.0 AS value FROM w2
         |UNION ALL
         |SELECT 'h', term, j, round(h, 6) + 0.0 FROM h2
         |ORDER BY matrix, id, j""".stripMargin,

    // full 256-round unrolled replay (MATERIALIZED CTE per round) over
    // the customer-name vocabulary
    "q307_bpe_deep" ->
      s"""WITH ${bpeTrainCtes(256,
            "(SELECT c_name || ' ' || c_mktsegment AS text FROM customer)", "text")}
         |SELECT round, split_part(pair, ' ', 1) AS lhs,
         |  split_part(pair, ' ', 2) AS rhs, f AS freq
         |FROM (${(1 to 256).map(r => s"SELECT $r AS round, pair, f FROM m$r")
        .mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin,

    // engine twin gram construction (list_transform + inclusive slices)
    "q306_cross_source_leakage" ->
      """WITH ws AS (
        |  SELECT source, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT DISTINCT source, gram FROM (
        |    SELECT source, unnest(list_transform(range(1, len(w) - 6),
        |      i -> array_to_string(w[i : i + 7], ' '))) AS gram
        |    FROM ws WHERE len(w) >= 8) x),
        |tot AS (SELECT source, cast(count(*) as bigint) AS n FROM g GROUP BY source),
        |pair AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    cast(count(*) as bigint) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT p.source_a, p.source_b, p.shared,
        |  round(cast(p.shared as double) / (ta.n + tb.n - p.shared), 6) + 0.0 AS jaccard
        |FROM pair p
        |JOIN tot ta ON ta.source = p.source_a
        |JOIN tot tb ON tb.source = p.source_b
        |ORDER BY p.shared DESC, p.source_a, p.source_b LIMIT 20""".stripMargin,

    // published-polynomial edge constants scaled by the WGS84 authalic
    // radius Rq = a*sqrt(qP/2) (PROJ's ellipsoidal eqearth); rt_* echo
    // inputs; area_ratio = 1.000 is the equal-area property against the
    // ellipsoid patch
    "q305_equal_earth" ->
      """SELECT c_custkey,
        |  CAST('17243959.1' AS DOUBLE) AS world_x,
        |  CAST('8392927.6' AS DOUBLE) AS pole_y,
        |  round(cast(c_custkey % 340 - 170 as double), 6) + 0.0 AS rt_lon,
        |  round(cast((c_custkey * 7) % 160 - 80 as double), 6) + 0.0 AS rt_lat,
        |  CAST('1.0' AS DOUBLE) AS area_ratio
        |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin,

    // calibration replay: one scored table, per-query exact top-10 (self
    // excluded), per-budget cumulative hit counts
    "q308_nprobe_calibration" ->
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |${annInit(8)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |${annAssign("af", "c2")},
         |${annCalCtes(kCells = 8, k = 10, target = 0.9, nQueries = 8)}
         |SELECT cast(n_probe as int) AS n_probe, hits, recall,
         |  n_probe = (SELECT nsel FROM calsel) AS chosen
         |FROM calrec ORDER BY n_probe""".stripMargin,

    // one shared Lloyd chain; CALIBRATED per-side probe budget (the q308
    // chain picks nsel); within-cell argmax both directions; reciprocal join
    "q304_mutual_best_ivf" -> {
      def cosSql(x: String, y: String) =
        s"""list_dot_product($x, $y) /
           |  (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))""".stripMargin
      def probes(out: String, lbl: Int, idAs: String, vAs: String) =
        s"""$out AS (SELECT vec_id AS $idAs, vv AS $vAs, c FROM (
           |  SELECT p.vec_id, p.vv, cc.c, row_number() OVER (PARTITION BY p.vec_id
           |    ORDER BY ${cosSql("p.vv", "cc.v")} DESC, cc.c) AS rn
           |  FROM (SELECT vec_id, v AS vv FROM v WHERE label = $lbl) p
           |  CROSS JOIN c2 cc) x WHERE rn <= (SELECT nsel FROM calsel))""".stripMargin
      def side(out: String, lbl: Int, idAs: String, vAs: String) =
        s"""$out AS (SELECT af.vec_id AS $idAs, af.v AS $vAs, af.c
           |  FROM af JOIN v vv ON vv.vec_id = af.vec_id WHERE vv.label = $lbl)""".stripMargin
      def best(out: String, pr: String, sd: String, pid: String, pv: String,
               sid: String, sv: String) =
        s"""$out AS (SELECT $pid, $sid, cos FROM (
           |  SELECT p.$pid, s.$sid, ${cosSql(s"p.$pv", s"s.$sv")} AS cos,
           |    row_number() OVER (PARTITION BY p.$pid
           |      ORDER BY ${cosSql(s"p.$pv", s"s.$sv")} DESC, s.$sid) AS rn
           |  FROM $pr p JOIN $sd s ON s.c = p.c) x WHERE rn = 1)""".stripMargin
      s"""WITH v AS (SELECT vec_id, label, cast(embedding as double[]) AS v FROM embeddings),
         |${annInit(8)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |${annAssign("af", "c2")},
         |${annCalCtes(kCells = 8, k = 10, target = 0.9, nQueries = 8)},
         |${side("bf", 1, "bid", "bv")},
         |${side("afd", 0, "aid", "av")},
         |${probes("ap", 0, "aid", "av")},
         |${probes("bp", 1, "bid", "bv")},
         |${best("ab", "ap", "bf", "aid", "av", "bid", "bv")},
         |${best("ba", "bp", "afd", "bid", "bv", "aid", "av")}
         |SELECT cast(ab.aid as bigint) AS aid, cast(ab.bid as bigint) AS bid,
         |  round(ab.cos, 6) + 0.0 AS cosine,
         |  cast((SELECT nsel FROM calsel) as int) AS n_probe,
         |  (SELECT recall FROM calsel) AS cal_recall
         |FROM ab JOIN ba ON ab.aid = ba.aid AND ab.bid = ba.bid
         |ORDER BY aid""".stripMargin
    },

    // training replay + identical resample/AUC tail; DuckDB md5-int and
    // quantile_cont in place of conv/percentile
    "q303_auc_bootstrap" -> {
      val uExpr = "('0x'||substr(md5(concat(cast(s.doc_id as varchar), '|', " +
        "cast(t.b as varchar))),1,15))::BIGINT % 1000000"
      graft.pipeline.Classifier.oracleScoredIdSql(
        table = "documents", idCol = "doc_id",
        featureSqls = qcFeatureSqls, labelSql = qcLabelSql,
        where = qcWhere, lr = 0.5, iters = 3,
        tailSql = bootstrapAucTail(uExpr, (c, p) => s"quantile_cont($c, $p)"))
    },

    // reciprocal argmax replayed with the identical (cos DESC, id)
    // windows over the full bipartite score table
    "q302_mutual_best_match" -> {
      def cosSql(x: String, y: String) =
        s"""list_dot_product($x, $y) /
           |  (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))""".stripMargin
      s"""WITH a AS (SELECT vec_id AS aid, cast(embedding as double[]) AS av
         |  FROM embeddings WHERE label = 0),
         |b AS (SELECT vec_id AS bid, cast(embedding as double[]) AS bv
         |  FROM embeddings WHERE label = 1),
         |sc AS (SELECT a.aid, b.bid, ${cosSql("a.av", "b.bv")} AS cos
         |  FROM a CROSS JOIN b),
         |ab AS (SELECT aid, bid, cos FROM (
         |  SELECT aid, bid, cos,
         |    row_number() OVER (PARTITION BY aid ORDER BY cos DESC, bid) AS rk
         |  FROM sc) x WHERE rk = 1),
         |ba AS (SELECT aid, bid FROM (
         |  SELECT aid, bid,
         |    row_number() OVER (PARTITION BY bid ORDER BY cos DESC, aid) AS rk
         |  FROM sc) x WHERE rk = 1)
         |SELECT cast(ab.aid as bigint) AS aid, cast(ab.bid as bigint) AS bid,
         |  round(ab.cos, 6) + 0.0 AS cosine
         |FROM ab JOIN ba ON ab.aid = ba.aid AND ab.bid = ba.bid
         |ORDER BY aid""".stripMargin
    },

    // quantile_cont cuts; identical clamp/fold arithmetic
    "q301_winsorized_stats" ->
      """WITH cuts AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.05) AS p05,
        |    quantile_cont(value, 0.95) AS p95
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_type,
        |  cast(count(*) as bigint) AS n,
        |  round(cast(sum(cast(round(e.value, 6) as decimal(20,6))) as double)
        |    / count(*), 6) + 0.0 AS raw_mean,
        |  round(cast(sum(cast(round(greatest(c.p05, least(c.p95, e.value)), 6)
        |    as decimal(20,6))) as double) / count(*), 6) + 0.0 AS winsorized_mean,
        |  round(cast(sum(CASE WHEN e.value >= c.p05 AND e.value <= c.p95
        |      THEN cast(round(e.value, 6) as decimal(20,6))
        |      ELSE cast(0 as decimal(20,6)) END) as double)
        |    / sum(CASE WHEN e.value >= c.p05 AND e.value <= c.p95 THEN 1 ELSE 0 END),
        |    6) + 0.0 AS trimmed_mean,
        |  cast(sum(CASE WHEN e.value < c.p05 OR e.value > c.p95 THEN 1 ELSE 0 END)
        |    as bigint) AS n_clamped
        |FROM events e JOIN cuts c ON e.event_type = c.event_type
        |WHERE e.value IS NOT NULL
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // engine twins for split/regex/md5-int; identical metric arithmetic
    "q300_corpus_datasheet" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    cast(length(text) as bigint) AS n_chars,
        |    cast(len(string_split_regex(trim(text), '\s+')) as bigint) AS n_tok,
        |    cast(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) as bigint) AS n_alpha,
        |    md5(text) AS digest,
        |    ('0x'||substr(md5(cast(doc_id as varchar)),1,15))::BIGINT % 16 AS shard
        |  FROM documents WHERE text IS NOT NULL),
        |vocab AS (
        |  SELECT cast(count(distinct word) as bigint) AS v FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |    FROM documents WHERE text IS NOT NULL) w WHERE length(word) >= 1),
        |shards AS (
        |  SELECT max(c) AS cmax, min(c) AS cmin FROM (
        |    SELECT shard, cast(count(*) as bigint) AS c FROM d GROUP BY shard) s),
        |agg AS (
        |  SELECT cast(count(*) as bigint) AS n_docs,
        |    cast(sum(n_chars) as bigint) AS n_chars,
        |    cast(sum(n_tok) as bigint) AS n_tokens,
        |    cast(count(distinct digest) as bigint) AS n_distinct,
        |    round(cast(sum(n_tok) as double) / count(*), 6) + 0.0 AS mean_tokens,
        |    round(cast(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) as double)
        |      / count(*), 6) + 0.0 AS pct_short,
        |    round(cast(sum(CASE WHEN n_alpha * 10 < n_chars * 6 THEN 1 ELSE 0 END) as double)
        |      / count(*), 6) + 0.0 AS pct_low_alpha
        |  FROM d)
        |SELECT a.n_docs, a.n_chars, a.n_tokens,
        |  round(1.0 - cast(a.n_distinct as double) / a.n_docs, 6) + 0.0 AS exact_dup_pct,
        |  a.mean_tokens, a.pct_short, a.pct_low_alpha,
        |  v.v AS vocab_size,
        |  s.cmax AS shard_max, s.cmin AS shard_min,
        |  round(cast(s.cmax as double) / s.cmin, 6) + 0.0 AS shard_skew
        |FROM agg a CROSS JOIN vocab v CROSS JOIN shards s""".stripMargin,

    // same single-pass firsts/cumulative shape; unnest word split
    "q299_heaps_law" ->
      """WITH tok AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |    FROM documents WHERE text IS NOT NULL) w
        |  WHERE length(word) >= 1),
        |per_doc AS (
        |  SELECT doc_id, cast(count(*) as bigint) AS n_tok FROM tok GROUP BY doc_id),
        |firsts AS (
        |  SELECT first_doc, cast(count(*) as bigint) AS n_new
        |  FROM (SELECT word, min(doc_id) AS first_doc FROM tok GROUP BY word) f
        |  GROUP BY 1),
        |curve AS (
        |  SELECT d.doc_id,
        |    sum(d.n_tok) OVER (ORDER BY d.doc_id) AS cum_tok,
        |    sum(coalesce(f.n_new, 0)) OVER (ORDER BY d.doc_id) AS cum_vocab
        |  FROM per_doc d LEFT JOIN firsts f ON f.first_doc = d.doc_id),
        |pts AS (
        |  SELECT cast(round(ln(cast(cum_tok as double)), 9) as decimal(20,9)) AS x,
        |    cast(round(ln(cast(cum_vocab as double)), 9) as decimal(20,9)) AS y
        |  FROM curve WHERE cum_vocab > 0),
        |m AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(x) as double) AS sx, cast(sum(y) as double) AS sy,
        |    cast(sum(cast(x * y as decimal(30,18))) as double) AS sxy,
        |    cast(sum(cast(x * x as decimal(30,18))) as double) AS sxx,
        |    cast(sum(cast(y * y as decimal(30,18))) as double) AS syy
        |  FROM pts)
        |SELECT n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS beta,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0
        |    AS ln_k,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS r2
        |FROM m""".stripMargin,

    // identical regression moments; engine-specific word split only
    "q298_zipf_law" ->
      """WITH wc AS (
        |  SELECT word, cast(count(*) as bigint) AS freq FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |    FROM documents WHERE text IS NOT NULL) w
        |  WHERE length(word) >= 1 GROUP BY word),
        |rk AS (
        |  SELECT freq, row_number() OVER (ORDER BY freq DESC, word) AS rank
        |  FROM wc),
        |pts AS (
        |  SELECT cast(round(ln(cast(rank as double)), 9) as decimal(20,9)) AS x,
        |    cast(round(ln(cast(freq as double)), 9) as decimal(20,9)) AS y
        |  FROM rk WHERE rank <= 1000),
        |m AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(x) as double) AS sx, cast(sum(y) as double) AS sy,
        |    cast(sum(cast(x * y as decimal(30,18))) as double) AS sxy,
        |    cast(sum(cast(x * x as decimal(30,18))) as double) AS sxx,
        |    cast(sum(cast(y * y as decimal(30,18))) as double) AS syy
        |  FROM pts)
        |SELECT n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0
        |    AS intercept,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS r2
        |FROM m""".stripMargin,

    // identical cells/offsets/haversine text; md5 coords via the
    // '0x'-prefix bigint idiom
    "q297_geodesic_dwithin" ->
      """WITH pts AS (
        |  SELECT c_custkey AS id,
        |    cast(('0x'||substr(md5(cast(c_custkey as varchar)),1,15))::BIGINT % 3600 as double) / 10.0 - 180.0 AS lon,
        |    cast(('0x'||substr(md5(cast(c_custkey as varchar)),16,15))::BIGINT % 1200 as double) / 10.0 - 60.0 AS lat
        |  FROM customer WHERE c_custkey <= 1200),
        |cells AS (
        |  SELECT id, lon, lat,
        |    ((cast(floor(lon / 3.0) as bigint) % 120) + 120) % 120 AS cx,
        |    cast(floor(lat / 1.5) as bigint) AS cy
        |  FROM pts),
        |offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
        |  (1,-1),(1,0),(1,1)) AS t(dx, dy)),
        |cand AS (
        |  SELECT a.id AS ida, b.id AS idb, a.lon AS ax, a.lat AS ay,
        |    b.lon AS bx, b.lat AS by
        |  FROM cells a
        |  JOIN offs o ON true
        |  JOIN cells b ON b.cx = (a.cx + o.dx + 120) % 120 AND b.cy = a.cy + o.dy
        |  WHERE a.id < b.id),
        |withd AS (
        |  SELECT ida, idb,
        |    2.0 * 6371008.8 * asin(least(cast(1.0 as double),
        |      sqrt(pow(sin((radians(by) - radians(ay)) / 2), 2)
        |        + cos(radians(ay)) * cos(radians(by))
        |        * pow(sin((radians(bx) - radians(ax)) / 2), 2)))) AS d
        |  FROM cand)
        |SELECT ida, idb, round(d / 1000.0, 2) + 0.0 AS dist_km
        |FROM withd WHERE d <= 150000.0
        |ORDER BY ida, idb""".stripMargin,

    // the recomputed-from-scratch aggregate: merged partials must equal it
    "q296_incremental_agg" ->
      """SELECT o_orderpriority AS pri,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as decimal(18,2)) AS total,
        |  min(o_orderdate) AS first_d, max(o_orderdate) AS last_d
        |FROM orders GROUP BY o_orderpriority ORDER BY pri""".stripMargin,

    // identical class aggregation (portable SQL both engines)
    "q295_k_anonymity" ->
      """WITH q AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg, c.c_nationkey AS nat,
        |    cast(floor(c.c_acctbal / 1000.0) as bigint) AS bal_bucket,
        |    o.o_orderpriority AS sensitive
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
        |cls AS (
        |  SELECT seg, nat, bal_bucket,
        |    cast(count(*) as bigint) AS k,
        |    cast(count(distinct sensitive) as bigint) AS l
        |  FROM q GROUP BY seg, nat, bal_bucket)
        |SELECT
        |  cast(sum(k) as bigint) AS n_rows,
        |  cast(count(*) as bigint) AS n_classes,
        |  min(k) AS k_min,
        |  min(l) AS l_min,
        |  cast(sum(CASE WHEN k < 5 THEN k ELSE 0 END) as bigint) AS rows_at_risk,
        |  round(cast(sum(CASE WHEN k < 5 THEN k ELSE 0 END) as double)
        |    / sum(k), 6) + 0.0 AS pct_at_risk,
        |  cast(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) as bigint) AS homogeneous_classes
        |FROM cls""".stripMargin,

    // ellipse edge constants closed-form (2*sqrt(2)*a, sqrt(2)*a);
    // rt_* echo inputs; area_ratio = 1.000 is the equal-area property
    "q294_mollweide" ->
      """SELECT c_custkey,
        |  round(2 * sqrt(CAST('2.0' AS DOUBLE)) * CAST('6378137.0' AS DOUBLE), 1) + 0.0 AS world_x,
        |  round(sqrt(CAST('2.0' AS DOUBLE)) * CAST('6378137.0' AS DOUBLE), 1) + 0.0 AS pole_y,
        |  round(cast(c_custkey % 340 - 170 as double), 6) + 0.0 AS rt_lon,
        |  round(cast((c_custkey * 7) % 160 - 80 as double), 6) + 0.0 AS rt_lat,
        |  CAST('1.0' AS DOUBLE) AS area_ratio
        |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin,

    // identical windows/folds; epoch_us // day ids
    "q293_seasonal_decompose" ->
      """WITH d0 AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    cast(count(*) as bigint) AS n
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT unnest(range((SELECT min(day) FROM d0),
        |    (SELECT max(day) FROM d0) + 1)) AS day),
        |d AS (
        |  SELECT s.day, coalesce(d0.n, cast(0 as bigint)) AS n
        |  FROM spine s LEFT JOIN d0 ON d0.day = s.day),
        |tr AS (
        |  SELECT day, n,
        |    CASE WHEN count(*) OVER w = 7
        |      THEN cast(sum(n) OVER w as double) / 7.0 END AS trend
        |  FROM d
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT day, n, trend, day % 7 AS dow,
        |    cast(round(n - trend, 6) as decimal(20,6)) AS detr
        |  FROM tr WHERE trend IS NOT NULL),
        |seas AS (
        |  SELECT dow, cast(sum(detr) as double) / count(*) AS sidx
        |  FROM det GROUP BY dow),
        |res AS (
        |  SELECT d.day, d.n, d.trend, s.sidx,
        |    cast(d.detr as double) - s.sidx AS resid
        |  FROM det d JOIN seas s ON d.dow = s.dow),
        |sd AS (
        |  SELECT sqrt(cast(sum(cast(round(resid * resid, 6) as decimal(27,6))) as double)
        |    / count(*)) AS sigma
        |  FROM res)
        |SELECT r.day, r.n,
        |  round(r.trend, 6) + 0.0 AS trend,
        |  round(r.sidx, 6) + 0.0 AS seasonal,
        |  round(r.resid, 6) + 0.0 AS resid,
        |  (abs(r.resid) > 2.0 * sd.sigma) AS anomaly
        |FROM res r CROSS JOIN sd
        |ORDER BY r.day""".stripMargin,

    // same md5 bucket layout, same bucket-max merge over the day range
    "q292_rolling_hll" -> {
      val state = graft.pipeline.Sketch.hllBucketStateSql("ev", "user_id", "day")
      val est = graft.pipeline.Sketch.hllEstimateSql("merged", "d")
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
         |  FROM events WHERE user_id IS NOT NULL),
         |daily AS ($state),
         |days AS (SELECT DISTINCT day AS d FROM ev),
         |merged AS (
         |  SELECT w.d, w.bucket, max(w.rmax) AS rmax
         |  FROM (SELECT unnest(range(b.day, b.day + 7)) AS d, b.bucket, b.rmax
         |        FROM daily b) w
         |  JOIN days dd ON dd.d = w.d
         |  GROUP BY w.d, w.bucket),
         |est AS ($est),
         |exact AS (
         |  SELECT w.d, cast(count(distinct w.user_id) as bigint) AS exact_users
         |  FROM (SELECT unnest(range(e.day, e.day + 7)) AS d, e.user_id
         |        FROM (SELECT DISTINCT day, user_id FROM ev) e) w
         |  JOIN days dd ON dd.d = w.d
         |  GROUP BY w.d)
         |SELECT est.d, est.hll_estimate, est.n_buckets_used, exact.exact_users,
         |  round(abs(est.hll_estimate - exact.exact_users) / exact.exact_users, 6) + 0.0
         |    AS rel_err
         |FROM est JOIN exact ON est.d = exact.d
         |ORDER BY est.d""".stripMargin
    },

    // fold-0 training chain + all-rows scoring + shared calibration block
    "q291_calibration_fix" ->
      graft.pipeline.Classifier.oracleCalibrationFixSql(
        table = "documents", idCol = "doc_id",
        featureSqls = qcFeatureSqls, labelSql = qcLabelSql,
        where = qcWhere, lr = 0.5, iters = 3,
        foldSql = "('0x'||substr(md5(cast(doc_id as varchar)),1,15))::BIGINT % 2"),

    // per-fold unrolled training chains + shared fold-partitioned eval;
    // fold from the md5-prefix integer (the sampling-family idiom)
    "q290_cv_classifier" -> {
      val cv = graft.pipeline.Classifier.oracleCvEvalSql(
        table = "documents", idCol = "doc_id",
        featureSqls = qcFeatureSqls, labelSql = qcLabelSql,
        where = qcWhere, lr = 0.5, iters = 3,
        foldSql = "('0x'||substr(md5(cast(doc_id as varchar)),1,15))::BIGINT % 3",
        nFolds = 3)
      s"""SELECT cast(fold as bigint) AS fold, auc, tp, fp, tn, fn, accuracy, brier
         |FROM ($cv) t ORDER BY fold""".stripMargin
    },

    // identical grid/offset arithmetic and decimal folds
    "q288_getis_ord_hotspots" ->
      """WITH pts AS (
        |  SELECT ((cast(floor(c_acctbal) as bigint) % 20) + 20) % 20 AS cx,
        |    ((cast(floor(c_acctbal * 7) as bigint) % 15) + 15) % 15 AS cy,
        |    cast(c_acctbal as double) AS v
        |  FROM customer),
        |cells AS (
        |  SELECT cx, cy, sum(cast(round(v, 2) as decimal(18,2))) AS vsum
        |  FROM pts GROUP BY cx, cy),
        |stats AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(vsum) as double) / count(*) AS xbar,
        |    sqrt(cast(sum(cast(vsum * vsum as decimal(30,4))) as double)
        |      / count(*)
        |      - (cast(sum(vsum) as double) / count(*))
        |      * (cast(sum(vsum) as double) / count(*))) AS s
        |  FROM cells),
        |offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
        |  (1,-1),(1,0),(1,1)) AS t(dx, dy)),
        |nb AS (
        |  SELECT a.cx, a.cy,
        |    cast(count(*) as bigint) AS wi,
        |    sum(b.vsum) AS nsum
        |  FROM cells a
        |  JOIN offs o ON true
        |  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        |  GROUP BY a.cx, a.cy)
        |SELECT nb.cx, nb.cy, nb.wi,
        |  round(cast(nb.nsum as double), 2) + 0.0 AS neighborhood_sum,
        |  round((cast(nb.nsum as double) - st.xbar * nb.wi) /
        |    (st.s * sqrt((cast(st.n as double) * nb.wi - cast(nb.wi as double) * nb.wi)
        |      / (st.n - 1))), 6) + 0.0 AS gi_z
        |FROM nb CROSS JOIN stats st
        |ORDER BY nb.cx, nb.cy""".stripMargin,

    "q289_morans_i" ->
      """WITH pts AS (
        |  SELECT ((cast(floor(c_acctbal) as bigint) % 20) + 20) % 20 AS cx,
        |    ((cast(floor(c_acctbal * 7) as bigint) % 15) + 15) % 15 AS cy,
        |    cast(c_acctbal as double) AS v
        |  FROM customer),
        |cells AS (
        |  SELECT cx, cy, sum(cast(round(v, 2) as decimal(18,2))) AS vsumd
        |  FROM pts GROUP BY cx, cy),
        |stats AS (
        |  SELECT cast(count(*) as bigint) AS n,
        |    cast(sum(vsumd) as double) / count(*) AS xbar
        |  FROM cells),
        |offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
        |  (1,-1),(1,0),(1,1)) AS t(dx, dy)),
        |cross_t AS (
        |  SELECT sum(cast(round((cast(a.vsumd as double) - st.xbar) *
        |      (cast(b.vsumd as double) - st.xbar), 6) as decimal(27,6))) AS num,
        |    cast(count(*) as bigint) AS w
        |  FROM cells a
        |  JOIN offs o ON true
        |  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        |  CROSS JOIN stats st),
        |denom AS (
        |  SELECT sum(cast(round((cast(c.vsumd as double) - st.xbar) *
        |      (cast(c.vsumd as double) - st.xbar), 6) as decimal(27,6))) AS den
        |  FROM cells c CROSS JOIN stats st)
        |SELECT st.n, ct.w,
        |  round((cast(st.n as double) / ct.w) *
        |    (cast(ct.num as double) / cast(d.den as double)), 6) + 0.0 AS moran_i
        |FROM stats st CROSS JOIN cross_t ct CROSS JOIN denom d""".stripMargin,

    // identical stage joins; scalar-subquery counts
    "q286_ordered_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT
        |  (SELECT cast(count(*) as bigint) FROM v) AS n_view,
        |  (SELECT cast(count(*) as bigint) FROM c) AS n_click,
        |  (SELECT cast(count(*) as bigint) FROM p) AS n_purchase,
        |  round(cast((SELECT count(*) FROM c) as double) /
        |    (SELECT count(*) FROM v), 6) + 0.0 AS view_to_click,
        |  round(cast((SELECT count(*) FROM p) as double) /
        |    (SELECT count(*) FROM c), 6) + 0.0 AS click_to_purchase""".stripMargin,

    // same risk-set window; epoch_us // hour durations; identical
    // rounded-log decimal fold under exp
    "q287_kaplan_meier" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t1
        |  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t0
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |mx AS (
        |  SELECT user_id, max(ts) AS tmax FROM events GROUP BY user_id),
        |dur AS (
        |  SELECT s.user_id,
        |    CASE WHEN p.t1 IS NOT NULL
        |      THEN (epoch_us(p.t1) - epoch_us(s.t0)) // 3600000000
        |      ELSE (epoch_us(mx.tmax) - epoch_us(s.t0)) // 3600000000 END AS hrs,
        |    (p.t1 IS NOT NULL) AS observed
        |  FROM s JOIN mx ON s.user_id = mx.user_id
        |  LEFT JOIN p ON s.user_id = p.user_id),
        |ev AS (
        |  SELECT hrs,
        |    cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
        |    cast(count(*) as bigint) AS leaving
        |  FROM dur GROUP BY hrs),
        |rk AS (
        |  SELECT hrs, d,
        |    sum(leaving) OVER (ORDER BY hrs DESC) AS n_risk
        |  FROM ev),
        |km AS (
        |  SELECT hrs, d, n_risk,
        |    sum(CASE WHEN d > 0 AND d < n_risk
        |      THEN cast(round(ln(1.0 - cast(d as double) / n_risk), 9) as decimal(20,9))
        |      ELSE cast(0 as decimal(20,9)) END)
        |      OVER (ORDER BY hrs) AS logs,
        |    max(CASE WHEN d > 0 AND d = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY hrs) AS extinct
        |  FROM rk)
        |SELECT hrs, d, cast(n_risk as bigint) AS n_risk,
        |  round(CASE WHEN extinct = 1 THEN 0.0
        |    ELSE exp(cast(logs as double)) END, 6) + 0.0 AS survival
        |FROM km WHERE d > 0 ORDER BY hrs""".stripMargin,

    // identical running-sum arithmetic; epoch_us // day ids
    "q284_cusum_changepoint" ->
      """WITH d0 AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    cast(count(*) as bigint) AS n
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT unnest(range((SELECT min(day) FROM d0),
        |    (SELECT max(day) FROM d0) + 1)) AS day),
        |d AS (
        |  SELECT s.day, coalesce(d0.n, cast(0 as bigint)) AS n
        |  FROM spine s LEFT JOIN d0 ON d0.day = s.day),
        |m AS (SELECT cast(sum(n) as double) / count(*) AS mean FROM d),
        |c AS (
        |  SELECT day, n,
        |    sum(n - m.mean) OVER (ORDER BY day) AS cusum
        |  FROM d CROSS JOIN m)
        |SELECT day, n, round(cusum, 6) + 0.0 AS cusum,
        |  (abs(cusum) = max(abs(cusum)) OVER ()) AS is_changepoint
        |FROM c ORDER BY day""".stripMargin,

    // quantile_cont pairs with Spark percentile (q152 precedent)
    "q285_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, m.med,
        |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  WHERE e.value IS NOT NULL GROUP BY e.event_type, m.med)
        |SELECT a.event_type,
        |  cast(count(*) as bigint) AS n,
        |  round(a.med, 6) + 0.0 AS med,
        |  round(a.mad, 6) + 0.0 AS mad,
        |  cast(sum(CASE WHEN abs(e.value - a.med) >
        |    3.0 * cast(1.4826 as double) * a.mad THEN 1 ELSE 0 END) as bigint)
        |    AS n_outliers
        |FROM events e JOIN mad a ON e.event_type = a.event_type
        |WHERE e.value IS NOT NULL
        |GROUP BY a.event_type, a.med, a.mad
        |ORDER BY a.event_type""".stripMargin,

    // q52's unrolled-Lloyd replay at nProbe=2 — storage layout cannot
    // change the result, only the files scanned
    "q283_ivf_partition_prune" ->
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |${annInit(8)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |probes AS (SELECT c FROM (
         |  SELECT cc.c, row_number() OVER (ORDER BY
         |    list_dot_product($queryVecSql, cc.v) /
         |    (sqrt(list_dot_product($queryVecSql, $queryVecSql)) *
         |     sqrt(list_dot_product(cc.v, cc.v))) DESC, cc.c) AS rn
         |  FROM c2 cc) WHERE rn <= 2),
         |${annAssign("af", "c2")}
         |SELECT cast(vec_id as bigint) AS vec_id, round(cos, 6) + 0.0 AS cosine FROM (
         |  SELECT a.vec_id,
         |    list_dot_product(a.v, $queryVecSql) /
         |    (sqrt(list_dot_product(a.v, a.v)) *
         |     sqrt(list_dot_product($queryVecSql, $queryVecSql))) AS cos
         |  FROM af a JOIN probes USING (c))
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    // identical lag/window text; ties pinned by (ts, event_id)
    "q282_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |tc AS (
        |  SELECT prev, event_type AS cur, cast(count(*) as bigint) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type)
        |SELECT prev, cur, n,
        |  round(cast(n as double) / sum(n) OVER (PARTITION BY prev), 6) + 0.0 AS p
        |FROM tc ORDER BY prev, cur""".stripMargin,

    // identical integer week arithmetic via epoch_us //
    "q281_retention_cohorts" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
        |  FROM events WHERE user_id IS NOT NULL),
        |coh AS (SELECT user_id, min(wk) AS cohort FROM act GROUP BY user_id),
        |sz AS (SELECT cohort, cast(count(*) as bigint) AS n_cohort FROM coh GROUP BY cohort)
        |SELECT c.cohort, cast(a.wk - c.cohort as int) AS off_wk,
        |  cast(count(*) as bigint) AS n_active,
        |  s.n_cohort,
        |  round(cast(count(*) as double) / s.n_cohort, 6) + 0.0 AS retention
        |FROM act a JOIN coh c ON a.user_id = c.user_id
        |JOIN sz s ON s.cohort = c.cohort
        |GROUP BY c.cohort, a.wk, s.n_cohort
        |ORDER BY c.cohort, off_wk""".stripMargin,

    // direct/inverse exactness on the shared sphere radius
    "q280_geodesic_project" ->
      """SELECT c_custkey, true AS north_ok, true AS south_ok,
        |  true AS east_ok, true AS roundtrip_ok
        |FROM customer WHERE c_custkey <= 900 ORDER BY c_custkey""".stripMargin,

    // integer axis-aligned rectangles: overlap = clamped interval product,
    // weight = overlap / 12; identical double division + decimal fold
    "q279_areal_interpolation" ->
      """WITH src AS (
        |  SELECT c_custkey AS sid, cast(c_custkey % 97 as double) AS pop,
        |    c_custkey % 50 AS x0, (c_custkey * 3) % 40 AS y0
        |  FROM customer WHERE c_custkey <= 300),
        |zones AS (
        |  SELECT r.range AS zid, (r.range % 6) * 10 AS zx, (r.range // 6) * 10 AS zy
        |  FROM range(30) r),
        |pairs AS (
        |  SELECT z.zid, s.pop,
        |    greatest(0, least(s.x0 + 4, z.zx + 10) - greatest(s.x0, z.zx)) *
        |    greatest(0, least(s.y0 + 3, z.zy + 10) - greatest(s.y0, z.zy)) AS overlap
        |  FROM src s CROSS JOIN zones z)
        |SELECT cast(zid as bigint) AS zid,
        |  cast(count(*) as bigint) AS n_src,
        |  round(cast(sum(cast(round(pop * (overlap / 12.0), 6) as decimal(20,6))) as double), 4) + 0.0
        |    AS est_pop
        |FROM pairs WHERE overlap > 0 GROUP BY zid ORDER BY zid""".stripMargin,

    // q52's unrolled-Lloyd training + one-cell corpus assignment +
    // per-probe top-nProbe cells + cell equi-join + ranked cosine
    "q278_ivf_knn_join" -> {
      def cosSql(a: String, b: String) =
        s"""list_dot_product($a, $b) /
           |  (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |${annInit(8)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |${annAssign("af", "c2")},
         |l AS (SELECT vec_id AS lid, v AS lv FROM v WHERE vec_id % 25 = 0),
         |probes AS (SELECT lid, lv, c FROM (
         |  SELECT l.lid, l.lv, cc.c, row_number() OVER (PARTITION BY l.lid ORDER BY
         |    ${cosSql("l.lv", "cc.v")} DESC, cc.c) AS rn
         |  FROM l CROSS JOIN c2 cc) x WHERE rn <= 2),
         |cand AS (SELECT p.lid, a.vec_id AS rid, ${cosSql("p.lv", "a.v")} AS cos
         |  FROM probes p JOIN af a ON a.c = p.c)
         |SELECT cast(lid as bigint) AS lid, cast(rid as bigint) AS rid,
         |  round(cos, 6) + 0.0 AS cosine, cast(rk as int) AS rank
         |FROM (SELECT lid, rid, cos,
         |    row_number() OVER (PARTITION BY lid ORDER BY cos DESC, rid) AS rk
         |  FROM cand) x
         |WHERE rk <= 5 ORDER BY lid, rank""".stripMargin
    },

    // same train chain + per-occurrence doc_words CTE
    "q277_unigram_encode" ->
      graft.pipeline.Unigram.oracleEncodeSql(
        "(SELECT * FROM documents WHERE doc_id < 200) dd", "doc_id", "text",
        rounds = 2, seedSize = 150),

    // identical portable core behind a DuckDB word-split CTE
    "q276_unigram_tokenizer" ->
      graft.pipeline.Unigram.oracleSql("documents", "text",
        rounds = 2, seedSize = 150, topK = 30),

    // lossless round-trip <=> the parquet-direct aggregate matches
    "q275_orc_roundtrip" ->
      """SELECT l_returnflag,
        |  cast(count(*) as bigint) AS n,
        |  sum(cast(l_quantity as decimal(18,2))) AS sum_qty,
        |  sum(cast(l_extendedprice as decimal(18,2))) AS sum_price,
        |  max(cast(l_shipdate as date)) AS max_ship
        |FROM lineitem WHERE l_quantity < 30.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // farthest-point rounds unrolled: sK = argmax (md DESC, vec_id) over
    // dK-1; identical round-6 squared-L2 via list_dot_product
    "q274_kcenter_select" -> {
      def dist(v: String, c: String) =
        s"round(list_dot_product($v, $v) - 2 * list_dot_product($v, $c) + list_dot_product($c, $c), 6)"
      val rounds = (2 to 6).map { j =>
        val prev = s"d${j - 1}"
        s"""s$j AS (SELECT vec_id, v, md FROM $prev ORDER BY md DESC, vec_id LIMIT 1),
           |d$j AS (SELECT $prev.vec_id, $prev.v,
           |  least($prev.md, ${dist(s"$prev.v", s"s$j.v")}) AS md
           |  FROM $prev CROSS JOIN s$j)""".stripMargin
      }.mkString(",\n")
      val sel = (2 to 6).map(j =>
        s"UNION ALL SELECT $j AS rank, vec_id, md + 0.0 AS sel_dist FROM s$j").mkString("\n")
      s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         |d1 AS (SELECT e.vec_id, e.v, ${dist("e.v", "s1.v")} AS md
         |  FROM e CROSS JOIN s1),
         |$rounds
         |SELECT cast(rank as int) AS rank, cast(vec_id as bigint) AS vec_id, sel_dist FROM (
         |  SELECT 1 AS rank, vec_id, cast(NULL as double) AS sel_dist FROM s1
         |  $sel)
         |ORDER BY rank""".stripMargin
    },

    // identical training CTE replay as q266; calibration block shared
    // verbatim between the engines
    "q273_reliability_curve" ->
      graft.pipeline.Classifier.oracleReliabilitySql(
        table = "documents", idCol = "doc_id",
        featureSqls = qcFeatureSqls, labelSql = qcLabelSql,
        where = qcWhere, lr = 0.5, iters = 3),

    // meridian: d = R*10deg, maxSeg = R*3deg => n = 4 => 5 vertices at
    // exactly R*2.5deg spacing; diagonal: 9242.7 km / 500 km => 19
    // segments => 20 vertices, arcing to lat 59.2
    "q272_geodesic_segmentize" ->
      """SELECT c_custkey, 5 AS nv_m, 20 AS nv_diag,
        |  true AS uniform, true AS seg_exact, true AS len_kept,
        |  true AS arcs_poleward
        |FROM customer WHERE c_custkey <= 600 ORDER BY c_custkey""".stripMargin,

    // LPA rounds unrolled as CTEs; neighbor-majority argmax replayed with
    // the identical (count DESC, label ASC) row_number tie-break
    "q271_label_propagation" -> {
      val roundCtes = (1 to 4).map { k =>
        s"""c$k AS (SELECT und.a AS node, l${k - 1}.label, count(*) AS c
           |  FROM und JOIN l${k - 1} ON und.b = l${k - 1}.node GROUP BY 1, 2),
           |l$k AS (SELECT node, label FROM (
           |  SELECT node, label,
           |    row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rk
           |  FROM c$k) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH eraw AS (
         |  SELECT (c_custkey % 2) * 100 + (c_custkey % 29) AS a,
         |         (c_custkey % 2) * 100 + ((c_custkey * 5 + 3) % 29) AS b
         |  FROM customer),
         |dirr AS (SELECT a, b FROM eraw WHERE a <> b),
         |und AS (SELECT DISTINCT a, b FROM
         |  (SELECT a, b FROM dirr UNION ALL SELECT b, a FROM dirr)),
         |l0 AS (SELECT node, node AS label FROM (SELECT DISTINCT a AS node FROM und)),
         |$roundCtes
         |SELECT cast(node as bigint) AS node, cast(label as bigint) AS label
         |FROM l4 ORDER BY node""".stripMargin
    },

    // estimate replayed by the shared md5-layout HLL SQL; exact distinct
    // joined back; identical rel_err division shape
    "q269_hll_calibration" -> {
      val tokTable = "(SELECT source, unnest(regexp_extract_all(trim(text), '\\S+')) AS tok " +
        "FROM documents WHERE text IS NOT NULL) tt"
      s"""WITH est AS (${graft.pipeline.Sketch.hllSql(tokTable, "tok", "source")}),
         |ex AS (SELECT source, cast(count(DISTINCT tok) as bigint) AS exact
         |       FROM (SELECT source, unnest(regexp_extract_all(trim(text), '\\S+')) AS tok
         |             FROM documents WHERE text IS NOT NULL) GROUP BY source)
         |SELECT est.source, est.hll_estimate AS est, ex.exact,
         |  round(abs(est.hll_estimate - ex.exact) / ex.exact, 6) + 0.0 AS rel_err
         |FROM est JOIN ex ON est.source = ex.source ORDER BY est.source""".stripMargin
    },

    // same signature from the same md5 hash, DuckDB list comprehensions
    // instead of Spark HOFs; exact Jaccard as in the q35 oracle
    "q268_minhash_accuracy" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |           FROM documents WHERE doc_id <= 120),
        |s AS (SELECT doc_id,
        |        CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')])
        |             ELSE list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)])
        |        END AS sh
        |      FROM t WHERE len(toks) > 0),
        |g AS (SELECT doc_id, sh,
        |    [list_min([('0x' || substr(md5(cast(j as varchar) || ':' || sg), 1, 15))::BIGINT
        |       FOR sg IN sh]) FOR j IN range(0, 64)] AS sig
        |  FROM s),
        |pairs AS (
        |  SELECT
        |    cast(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) as double) / 64.0 AS est,
        |    cast(len(list_intersect(a.sh, b.sh)) as double) /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS exact
        |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |SELECT cast(count(*) as bigint) AS n_pairs,
        |  round(cast(sum(cast(round(abs(est - exact), 6) as decimal(18,6))) as double)
        |        / count(*), 6) + 0.0 AS mean_abs_err,
        |  round(max(abs(est - exact)), 6) + 0.0 AS max_abs_err
        |FROM pairs""".stripMargin,

    // both arms replayed: the q52 unrolled-Lloyd IVF CTE at nProbe=2 and
    // the q41 brute-force top-10; recall = id-overlap / k
    "q267_ann_recall" ->
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         |${annInit(8)},
         |${annLloyd(1)},
         |${annLloyd(2)},
         |probes AS (SELECT c FROM (
         |  SELECT cc.c, row_number() OVER (ORDER BY
         |    list_dot_product($queryVecSql, cc.v) /
         |    (sqrt(list_dot_product($queryVecSql, $queryVecSql)) *
         |     sqrt(list_dot_product(cc.v, cc.v))) DESC, cc.c) AS rn
         |  FROM c2 cc) WHERE rn <= 2),
         |${annAssign("af", "c2")},
         |approx AS (SELECT vec_id FROM (
         |  SELECT a.vec_id,
         |    list_dot_product(a.v, $queryVecSql) /
         |    (sqrt(list_dot_product(a.v, a.v)) *
         |     sqrt(list_dot_product($queryVecSql, $queryVecSql))) AS cos
         |  FROM af a JOIN probes USING (c))
         |  ORDER BY cos DESC, vec_id LIMIT 10),
         |exact AS (SELECT vec_id FROM (
         |  SELECT e.vec_id,
         |    list_dot_product(cast(e.embedding as double[]), $queryVecSql) /
         |    (sqrt(list_dot_product(cast(e.embedding as double[]), cast(e.embedding as double[]))) *
         |     sqrt(list_dot_product($queryVecSql, $queryVecSql))) AS c
         |  FROM embeddings e)
         |  ORDER BY c DESC, vec_id LIMIT 10)
         |SELECT cast(10 as bigint) AS k,
         |  cast(count(*) as bigint) AS n_overlap,
         |  round(cast(count(*) as double) / 10.0, 6) + 0.0 AS recall
         |FROM approx JOIN exact USING (vec_id)""".stripMargin,

    // training replayed via the q254 CTE chain, label joined back, then
    // the SHARED eval block (Classifier.evalSelectSql — one SQL string
    // for both engines, so every double op has the identical shape)
    "q266_classifier_eval" ->
      graft.pipeline.Classifier.oracleEvalSql(
        table = "documents", idCol = "doc_id",
        featureSqls = qcFeatureSqls, labelSql = qcLabelSql,
        where = qcWhere, lr = 0.5, iters = 3),

    // tile assignment + per-tile counts replayed closed-form (same
    // slippy arithmetic as q258 on the standard customer point synth);
    // rt_ok is the in-query decode verification, true by construction
    "q265_mvt_tiles" -> {
      val tx = "greatest(0, least(7, cast(floor((cast(c_custkey % 360 - 180 as double) + 180.0) / 360.0 * 8.0) as bigint)))"
      val ty = "greatest(0, least(7, cast(floor((1.0 - ln(tan(radians(cast((c_custkey * 7) % 160 - 80 as double))) + " +
        "1.0 / cos(radians(cast((c_custkey * 7) % 160 - 80 as double)))) / pi()) / 2.0 * 8.0) as bigint)))"
      s"""SELECT cast(3 as int) AS z, x, y, cast(count(*) as bigint) AS n_features,
         |  true AS rt_ok
         |FROM (SELECT $tx AS x, $ty AS y FROM customer WHERE c_custkey <= 4000)
         |GROUP BY x, y ORDER BY x, y""".stripMargin
    },

    // quadkeys rebuilt digit-by-digit from the q258 slippy tile indices
    // (same exact-rational x / mercator-ln y arguments); the prefix
    // property holds by construction
    "q264_quadkey" -> {
      def tx(z: Int) =
        s"greatest(0, least(cast(pow(2.0, $z) as bigint) - 1, " +
          s"cast(floor((cast(c_custkey % 340 - 170 as double) + 180.0) / 360.0 * pow(2.0, $z)) as bigint)))"
      def ty(z: Int) =
        s"greatest(0, least(cast(pow(2.0, $z) as bigint) - 1, " +
          s"cast(floor((1.0 - ln(tan(radians(cast((c_custkey * 7) % 160 - 80 as double))) + " +
          s"1.0 / cos(radians(cast((c_custkey * 7) % 160 - 80 as double)))) / pi()) / 2.0 * pow(2.0, $z)) as bigint)))"
      def qk(z: Int) = (z - 1 to 0 by -1).map(k =>
        s"cast(2 * ((ty$z >> $k) & 1) + ((tx$z >> $k) & 1) as varchar)").mkString("concat(", ", ", ")")
      s"""WITH t AS (
         |  SELECT c_custkey, ${tx(6)} AS tx6, ${ty(6)} AS ty6,
         |    ${tx(12)} AS tx12, ${ty(12)} AS ty12
         |  FROM customer WHERE c_custkey <= 1500)
         |SELECT c_custkey, ${qk(6)} AS qk6, ${qk(12)} AS qk12, true AS prefix_ok
         |FROM t ORDER BY c_custkey""".stripMargin
    },

    // round-trips echo the inputs (1/16-fraction coords are exact at
    // precision 4); the envelope area is the exact integer-sided square;
    // fewer quantization digits can only shrink the varints
    "q263_twkb" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    cast(c_custkey % 360 - 180 as double) + cast(c_custkey % 16 as double) / 16.0 AS x,
        |    cast((c_custkey * 7) % 160 - 80 as double) + cast(c_custkey % 8 as double) / 16.0 AS y,
        |    cast(c_custkey % 10 + 1 as double) AS s
        |  FROM customer WHERE c_custkey <= 2000)
        |SELECT c_custkey,
        |  round(x, 4) + 0.0 AS rt_x,
        |  round(y, 4) + 0.0 AS rt_y,
        |  round(s * s, 6) + 0.0 AS rt_area,
        |  true AS coarser_is_smaller
        |FROM pts ORDER BY c_custkey""".stripMargin,

    // sketches rebuilt from scratch: the 60-bit hash is the shared
    // md5-prefix derivation, bottom-256 per set via ORDER BY h LIMIT,
    // union/intersection as the same list ops, estimators in the same
    // double shapes ((k-1)*2^60/h_k; retained*2^60/min-theta)
    "q262_kmv_theta" -> {
      def sk(status: String) =
        s"""(SELECT list(h ORDER BY h) FROM (
           |  SELECT h FROM (
           |    SELECT DISTINCT ('0x' || substr(md5(cast(o_custkey as varchar)), 1, 15))::BIGINT AS h
           |    FROM orders WHERE o_orderstatus = '$status')
           |  ORDER BY h LIMIT 256))""".stripMargin
      """WITH sk AS (SELECT SKA AS a, SKB AS b),
        |ops AS (
        |  SELECT a, b,
        |    list_sort(list_distinct(list_concat(a, b)))[1:256] AS u,
        |    list_sort(list_intersect(a, b)) AS i,
        |    CASE WHEN len(a) < 256 THEN 1152921504606846976 ELSE a[256] END AS tha,
        |    CASE WHEN len(b) < 256 THEN 1152921504606846976 ELSE b[256] END AS thb
        |  FROM sk),
        |est AS (
        |  SELECT
        |    cast(len(a) as bigint) AS na, cast(len(b) as bigint) AS nb,
        |    CASE WHEN len(a) < 256 THEN cast(len(a) as double)
        |         ELSE round(255.0 * pow(2.0, 60) / a[256], 2) + 0.0 END AS est_a,
        |    CASE WHEN len(b) < 256 THEN cast(len(b) as double)
        |         ELSE round(255.0 * pow(2.0, 60) / b[256], 2) + 0.0 END AS est_b,
        |    CASE WHEN len(u) < 256 THEN cast(len(u) as double)
        |         ELSE round(255.0 * pow(2.0, 60) / u[256], 2) + 0.0 END AS est_union,
        |    round(cast(len(list_filter(i, v -> v < least(tha, thb))) as double)
        |          * pow(2.0, 60) / least(tha, thb), 2) + 0.0 AS est_intersect
        |  FROM ops),
        |ex AS (
        |  SELECT
        |    cast(count(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_custkey END) as bigint) AS exact_a,
        |    cast(count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) as bigint) AS exact_b
        |  FROM orders)
        |SELECT na, nb, est_a, est_b, est_union, est_intersect, exact_a, exact_b
        |FROM est CROSS JOIN ex""".stripMargin
        .replace("SKA", sk("O")).replace("SKB", sk("F"))
    },

    // the KN score replayed with the same count tables as q235 plus the
    // three continuation-type tables (each one GROUP BY over the bigram
    // TYPE table); identical double shape (greatest/discount/backoff),
    // ln rounded 6 -> decimal fold -> mean rounded 4
    "q261_kneser_ney_lm" ->
      """WITH d AS (
        |  SELECT doc_id, arr FROM (
        |    SELECT doc_id, list_filter(
        |      regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS arr
        |    FROM documents) WHERE len(arr) >= 2),
        |bg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
        |  FROM d, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i) u),
        |uni AS (SELECT tok, count(*) AS cu FROM (
        |  SELECT unnest(arr) AS tok FROM d) GROUP BY tok),
        |big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        |fert AS (SELECT w1, count(*) AS n1f FROM big GROUP BY w1),
        |cont AS (SELECT w2, count(*) AS n1p FROM big GROUP BY w2),
        |types AS (SELECT count(*) AS npp FROM big),
        |sc AS (SELECT bg.doc_id,
        |    cast(round(ln(
        |      greatest(cast(big.cb as double) - 0.75, 0.0) / u1.cu +
        |      (0.75 * cast(fert.n1f as double) / u1.cu) *
        |        (cast(cont.n1p as double) / types.npp)), 6)
        |      as decimal(20,6)) AS lp
        |  FROM bg
        |  JOIN big ON big.w1 = bg.w1 AND big.w2 = bg.w2
        |  JOIN uni u1 ON u1.tok = bg.w1
        |  JOIN fert ON fert.w1 = bg.w1
        |  JOIN cont ON cont.w2 = bg.w2
        |  CROSS JOIN types)
        |SELECT doc_id, cast(count(*) as bigint) AS n_bigrams,
        |  round(cast(sum(lp) as double) / count(*), 4) + 0.0 AS lpkn_mean
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // EXISTS/NOT EXISTS closed-form: point-in-polygon is boundary-
    // exclusive (same strict inequalities as the q21 oracle); the two
    // boxes partition on x, y is always interior except y = -80 rows
    "q260_spatial_semi_anti" -> {
      val in = s"((($oCustX > -180 AND $oCustX < -108) OR ($oCustX > -36 AND $oCustX < 36))" +
        s" AND $oCustY > -80 AND $oCustY < 80)"
      s"""SELECT side, n, key_sum FROM (
         |  SELECT 'semi' AS side, cast(count(*) as bigint) AS n,
         |    cast(sum(c_custkey) as bigint) AS key_sum FROM customer WHERE $in
         |  UNION ALL
         |  SELECT 'anti' AS side, cast(count(*) as bigint) AS n,
         |    cast(sum(c_custkey) as bigint) AS key_sum FROM customer WHERE NOT $in
         |) ORDER BY side""".stripMargin
    },

    // bucketize/interleave/file-assignment replayed term for term: the
    // equi-width bucket is pure double arithmetic in the identical shape
    // ((v - mn) / (mx - mn) * 256), the Morton value is 16 unrolled
    // shift/mask/or terms, and the file split is double-exact
    // (z*16 < 2^21). min/max/count aggregates are order-independent.
    "q259_zorder_layout" -> {
      def bucket(c: String, mn: String, mx: String): String =
        s"least(255, greatest(0, cast(floor((cast($c as double) - $mn) / ($mx - $mn) * 256.0) as bigint)))"
      val zTerms = (for (k <- 0 until 8; j <- 0 until 2) yield
        s"(((b$j >> $k) & 1) << ${k * 2 + j})").mkString(" | ")
      s"""WITH r AS (
         |  SELECT min(cast(l_extendedprice as double)) AS mn0,
         |         max(cast(l_extendedprice as double)) AS mx0,
         |         min(cast(l_quantity as double)) AS mn1,
         |         max(cast(l_quantity as double)) AS mx1
         |  FROM lineitem),
         |b AS (
         |  SELECT l_extendedprice, l_quantity,
         |    ${bucket("l_extendedprice", "r.mn0", "r.mx0")} AS b0,
         |    ${bucket("l_quantity", "r.mn1", "r.mx1")} AS b1
         |  FROM lineitem, r),
         |z AS (
         |  SELECT l_extendedprice, l_quantity, ($zTerms) AS zv FROM b)
         |SELECT cast(floor(zv * 16.0 / 65536.0) as bigint) AS file,
         |  count(*) AS n,
         |  min(l_extendedprice) AS ep_min, max(l_extendedprice) AS ep_max,
         |  min(l_quantity) AS q_min, max(l_quantity) AS q_max
         |FROM z GROUP BY 1 ORDER BY file""".stripMargin
    },

    // the origin->false-origin identity is a defining property of the
    // projection (EPSG registry constants); rt_* echo the inputs (the
    // projection+datum roundtrip converges far inside the 1e-6 rounding)
    "q253_rd_new" ->
      """SELECT c_custkey,
        |  155000.0 AS origin_e, 463000.0 AS origin_n,
        |  round(3.5 + cast(c_custkey % 35 as double) / 10.0, 6) + 0.0 AS rt_lon,
        |  round(50.8 + cast(c_custkey % 25 as double) / 10.0, 6) + 0.0 AS rt_lat
        |FROM customer WHERE c_custkey <= 400 ORDER BY c_custkey""".stripMargin,

    // slippy formulas replayed: x-tile is exact rational arithmetic; the
    // y-tile's ln/tan path rides the same trig-parity argument as q17
    // (integer-degree latitudes sit far from any tile boundary); tile
    // bounds from the same B/2^z arithmetic the kernel uses
    "q258_tile_shard" -> {
      val b = "CAST('20037508.342789244' AS DOUBLE)"
      def tx(z: Int) =
        s"greatest(0, least(cast(pow(2.0, $z) as bigint) - 1, " +
          s"cast(floor((cast(c_custkey % 340 - 170 as double) + 180.0) / 360.0 * pow(2.0, $z)) as bigint)))"
      def ty(z: Int) =
        s"greatest(0, least(cast(pow(2.0, $z) as bigint) - 1, " +
          s"cast(floor((1.0 - ln(tan(radians(cast((c_custkey * 7) % 160 - 80 as double))) + " +
          s"1.0 / cos(radians(cast((c_custkey * 7) % 160 - 80 as double)))) / pi()) / 2.0 * pow(2.0, $z)) as bigint)))"
      s"""SELECT c_custkey,
         |  ${tx(6)} AS tx6, ${ty(6)} AS ty6,
         |  ${tx(12)} AS tx12, ${ty(12)} AS ty12,
         |  round((0.0 - $b) + ${tx(6)} * (2 * $b / pow(2.0, 6)), 4) + 0.0 AS exmin,
         |  round($b - ${ty(6)} * (2 * $b / pow(2.0, 6)), 4) + 0.0 AS eymax
         |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin
    },

    // world_x replayed closed-form (R*pi — identical doubles both
    // engines); quarter_meridian pinned as a literal (externally checked
    // to <1 m vs the published WGS84 value in SinusoidalSpec); rt_* echo
    // integer-degree inputs; area_ratio = equal-area defining property
    "q257_sinusoidal" ->
      """SELECT c_custkey,
        |  round(CAST('6371007.181' AS DOUBLE) * pi(), 3) + 0.0 AS world_x,
        |  CAST('10001965.7' AS DOUBLE) AS quarter_meridian,
        |  round(cast(c_custkey % 340 - 170 as double), 6) + 0.0 AS rt_lon,
        |  round(cast((c_custkey * 7) % 160 - 80 as double), 6) + 0.0 AS rt_lat,
        |  CAST('1.0' AS DOUBLE) AS area_ratio
        |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin,

    // gn_* pin the EPSG GN 7-2 worked example (string->double literals so
    // both engines hold the identical nearest double); rt_* echo the
    // inputs (round trips converge far inside the 1e-6 rounding);
    // area_ratio = 1.000 is the defining equal-area property (projected
    // quad / authalic closed form; curvature error ~3e-7 << the 5e-4 grain)
    "q256_laea" ->
      """SELECT c_custkey,
        |  CAST('3962799.45' AS DOUBLE) AS gn_e,
        |  CAST('2999718.85' AS DOUBLE) AS gn_n,
        |  round(-10.0 + cast(c_custkey % 400 as double) / 10.0, 6) + 0.0 AS rt_lon,
        |  round(35.0 + cast((c_custkey * 7) % 350 as double) / 10.0, 6) + 0.0 AS rt_lat,
        |  round(-10.0 + cast(c_custkey % 400 as double) / 10.0, 6) + 0.0 AS polar_rt_lon,
        |  round(35.0 + cast((c_custkey * 7) % 350 as double) / 10.0, 6) + 0.0 AS polar_rt_lat,
        |  CAST('1.0' AS DOUBLE) AS area_ratio
        |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin,

    "q255_geodesic_area" -> {
      // Chamberlain-Duquette ring area closed form for an axis-aligned
      // ring (vertical edges have dLon=0 => contribute exactly 0.0);
      // mirrors Geodesy.sphericalRingArea's edge order and |.|*R*R/2.
      def ring(lonSpan: String, latLo: String, latHi: String): String = {
        val t1 = s"radians($lonSpan) * (2 + sin(radians($latLo)) + sin(radians($latLo)))"
        val t3 = s"radians(0.0 - ($lonSpan)) * (2 + sin(radians($latHi)) + sin(radians($latHi)))"
        s"abs(($t1) + ($t3)) * 6371008.8 * 6371008.8 / 2"
      }
      val ext = ring(oSide, oCustY, s"$oCustY + $oSide")
      val hole = ring(s"$oSide / 2.0", s"$oCustY + $oSide / 4.0",
        s"$oCustY + $oSide / 4.0 + $oSide / 2.0")
      s"""SELECT c_custkey,
         |  round(($ext) / 1e6, 3) AS ext_km2,
         |  round((($ext) - ($hole)) / 1e6, 3) AS holed_km2,
         |  0.0E0 AS pt_zero
         |FROM customer ORDER BY c_custkey""".stripMargin
    },

    "q254_quality_classifier" ->
      graft.pipeline.Classifier.oracleSql(
        table = "documents", idCol = "doc_id",
        featureSqls = qcFeatureSqls, labelSql = qcLabelSql,
        where = qcWhere, lr = 0.5, iters = 3),

    "q251_gml_read" ->
      s"""SELECT concat('f_', c_custkey) AS fid, c_custkey * 3 AS v,
         |  CASE WHEN c_custkey % 5 = 0 THEN 'Polygon' ELSE 'Point' END AS gtype,
         |  $oCustX AS gx, $oCustY AS gy,
         |  CASE WHEN c_custkey % 5 = 0 THEN $oSide * $oSide ELSE 0.0 END AS area
         |FROM customer WHERE c_custkey <= 300 ORDER BY v""".stripMargin,

    "q104_rep_valid_clip" ->
      s"""SELECT c_custkey,
         |  $oCustX + $oSide / 2 AS rx,
         |  $oCustY + $oSide / 2 AS ry,
         |  true AS rep_inside,
         |  true AS env_valid,
         |  false AS bowtie_valid,
         |  false AS flat_valid,
         |  round($oSide * $oSide / 2, 6) + 0.0 AS half_area,
         |  true AS clip_empty
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q103_boundary" ->
      """SELECT c_custkey,
        |  'LINESTRING (' || x0 || ' ' || y0 || ', ' || x1 || ' ' || y0 || ', ' ||
        |    x1 || ' ' || y1 || ', ' || x0 || ' ' || y1 || ', ' || x0 || ' ' || y0 || ')'
        |    AS env_boundary,
        |  true AS ring_closed,
        |  'MULTIPOINT ((0 0), (' || x0 || ' ' || y0 || '))' AS line_boundary,
        |  true AS point_empty
        |FROM (
        |  SELECT c_custkey,
        |    cast(c_custkey % 360 - 180 as bigint) AS x0,
        |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
        |    cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x1,
        |    cast((c_custkey * 7) % 160 - 80 + c_custkey % 10 + 1 as bigint) AS y1
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q102_health_report" ->
      """WITH m AS (
        |  SELECT source, text,
        |    cast(len(regexp_extract_all(text, '\S+')) as double) AS words,
        |    CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
        |         THEN cast(length(text) as double) / len(regexp_extract_all(text, '\S+'))
        |         ELSE 0.0 END AS mwl,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[.,;:!?]')) as double) / length(text)
        |         ELSE 0.0 END AS pr,
        |    CASE WHEN length(text) > 0
        |         THEN cast(len(regexp_extract_all(text, '[A-Z]')) as double) / length(text)
        |         ELSE 0.0 END AS ur,
        |    regexp_extract_all(lower(text), '\S+') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT source, text,
        |    cast((CASE WHEN words >= 50 AND words <= 100000 THEN 1.0
        |               WHEN words >= 10 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |         (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |         (CASE WHEN pr <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |         (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.2 as double) AS quality,
        |    cast(len(regexp_extract_all(text, '\S+')) as bigint) AS ntok,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}\x{f900}-\x{faff}]') THEN 'zh'
        |         WHEN len(toks) = 0 THEN 'und'
        |         WHEN greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) < 0.02 THEN 'und'
        |         WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'en'
        |         WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'fr'
        |         WHEN s_de = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'de'
        |         WHEN s_pt = greatest(s_en, s_es, s_fr, s_de, s_pt, s_it) THEN 'pt'
        |         ELSE 'it' END AS lang
        |  FROM (
        |    SELECT source, text, words, mwl, pr, ur, toks,
        |      CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','it','for','was','with'], x))) as double) / len(toks) END AS s_en,
        |      CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un','los','del','se','las','por'], x))) as double) / len(toks) END AS s_es,
        |      CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['le','la','de','et','les','des','en','un','du','une','que','est'], x))) as double) / len(toks) END AS s_fr,
        |      CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['der','die','und','das','von','zu','den','mit','ist','des','im','ein'], x))) as double) / len(toks) END AS s_de,
        |      CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['o','a','de','que','e','do','da','em','um','para','com','os'], x))) as double) / len(toks) END AS s_pt,
        |      CASE WHEN len(toks) = 0 THEN 0.0 ELSE cast(len(list_filter(toks, x -> list_contains(['il','di','che','la','e','un','per','in','una','del','con','non'], x))) as double) / len(toks) END AS s_it
        |    FROM m)),
        |base AS (
        |  SELECT source, cast(count(*) as bigint) AS n_docs,
        |    round(avg(quality), 6) + 0.0 AS avg_quality,
        |    cast(sum(ntok) as bigint) AS n_tokens
        |  FROM q GROUP BY source),
        |top AS (
        |  SELECT source, lang AS top_lang FROM (
        |    SELECT source, lang, count(*) AS c FROM q GROUP BY source, lang)
        |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY c DESC, lang) = 1),
        |dup AS (
        |  SELECT source,
        |    round(1.0 - cast(count(DISTINCT text) as double) / count(*), 6) + 0.0 AS dup_frac
        |  FROM q GROUP BY source)
        |SELECT base.source, n_docs, avg_quality, n_tokens, top_lang, dup_frac
        |FROM base JOIN top USING (source) JOIN dup USING (source)
        |ORDER BY base.source""".stripMargin,

    // 32-gon invariants are closed-form: 33 stored vertices (closing
    // vertex repeats), area = 0.5*n*r^2*sin(2pi/n), probes at r/2 and 2r
    // are strictly inside/outside (apothem = r*cos(pi/32) ~ 0.995r)
    "q101_buffer" ->
      """SELECT c_custkey,
        |  33 AS n_vertices,
        |  round(0.5 * 32 * sin(2 * pi() / 32), 4) + 0.0 AS area_ratio,
        |  true AS contains_inner,
        |  false AS contains_outer,
        |  true AS dwithin_inner
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q105_azimuth_closest" ->
      s"""SELECT c_custkey,
         |  round(atan2($oSide, 2.0), 6) + 0.0 AS az_east,
         |  round(atan2(-$oSide, 2.0) + 2 * pi(), 6) + 0.0 AS az_west,
         |  true AS az_self_null,
         |  $oCustX + 2 AS cx,
         |  $oCustY + cast(c_custkey % 3 + 3 as double) AS cy,
         |  round(sqrt(4.0 + cast(c_custkey % 3 + 3 as double) * cast(c_custkey % 3 + 3 as double)), 6) + 0.0
         |    AS short_len,
         |  $oCustX AS self_x
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q106_line_accessors" ->
      """SELECT c_custkey,
        |  'POINT (0 0)' AS sp,
        |  'POINT (' || x1 || ' ' || y1 || ')' AS ep,
        |  'POINT (' || x0 || ' ' || y0 || ')' AS p2,
        |  'POINT (' || x1 || ' ' || y1 || ')' AS plast,
        |  true AS oob_null,
        |  'LINESTRING (' || x1 || ' ' || y1 || ', ' || x0 || ' ' || y0 || ', 0 0)' AS rev,
        |  true AS point_sp_null
        |FROM (
        |  SELECT c_custkey,
        |    cast(c_custkey % 360 - 180 as bigint) AS x0,
        |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
        |    cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x1,
        |    cast((c_custkey * 7) % 160 - 80 + c_custkey % 10 + 1 as bigint) AS y1
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q107_snap_flip_perimeter" ->
      s"""SELECT c_custkey,
         |  4 * $oSide AS per_env,
         |  48.0 AS per_hole,
         |  0.0 AS per_line,
         |  $oCustX AS snap_x,
         |  $oCustY AS snap_y,
         |  $oCustX + 0.5 AS snap_half_x,
         |  $oCustY AS flip_x,
         |  'POINT (' || cast(c_custkey % 360 - 180 as bigint) || ' ' ||
         |    cast((c_custkey * 7) % 160 - 80 as bigint) || ')' AS flip_roundtrip
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q111_line_reference" ->
      s"""SELECT c_custkey,
         |  round($oCustX * 0.25, 6) + 0.0 AS ip_x,
         |  round($oCustY * 0.25, 6) + 0.0 AS ip_y,
         |  0.5 AS loc_mid,
         |  1.0 AS loc_past,
         |  round($oCustX * 0.25, 6) + 0.0 AS sub_x0,
         |  round($oCustX * 0.75, 6) + 0.0 AS sub_x1,
         |  true AS sub_bad_null,
         |  round($oCustX, 6) + 0.0 AS proj_x,
         |  round($oCustY, 6) + 0.0 AS proj_y
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q112_rings_makers" ->
      s"""SELECT c_custkey,
         |  1 AS n_holes,
         |  0 AS env_holes,
         |  true AS pt_holes_null,
         |  'LINESTRING (2 2, 4 2, 4 4, 2 4, 2 2)' AS hole1,
         |  true AS hole2_null,
         |  'LINESTRING (' || x0 || ' ' || y0 || ', ' || x2 || ' ' || y0 || ')' AS ml,
         |  $oSide * $oSide AS mp_area,
         |  true AS open_null
         |FROM (
         |  SELECT c_custkey,
         |    cast(c_custkey % 360 - 180 as bigint) AS x0,
         |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
         |    cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x2
         |  FROM customer)
         |ORDER BY c_custkey""".stripMargin,

    "q113_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  round(pow(u, 1.0 / n_chars), 6) + 0.0 AS skey
        |FROM (
        |  SELECT doc_id, n_chars,
        |    cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT as double)
        |      / 1152921504606846976 AS u
        |  FROM documents)
        |ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id
        |LIMIT 20""".stripMargin,

    "q114_dedup_keep_best" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, text, list_distinct(regexp_extract_all(trim(text), '\S+')) AS toks
        |      FROM documents WHERE doc_id < 60),
        |p AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM t a JOIN t b ON a.doc_id < b.doc_id
        |      WHERE cast(len(list_intersect(a.toks, b.toks)) as double) /
        |            cast(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) as double) >= 0.8),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |cc(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.id
        |),
        |comp AS (SELECT cast(id as bigint) AS doc_id, cast(min(lbl) as bigint) AS component
        |         FROM cc GROUP BY id),
        |q AS (
        |  SELECT doc_id, round(cast(
        |    (CASE WHEN words >= 50 AND words <= 100000 THEN 1.0
        |          WHEN words >= 10 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |    (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN pr <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.2 as double), 6) AS quality
        |  FROM (
        |    SELECT doc_id,
        |      cast(len(regexp_extract_all(text, '\S+')) as double) AS words,
        |      CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
        |           THEN cast(length(text) as double) / len(regexp_extract_all(text, '\S+'))
        |           ELSE 0.0 END AS mwl,
        |      CASE WHEN length(text) > 0
        |           THEN cast(len(regexp_extract_all(text, '[.,;:!?]')) as double) / length(text)
        |           ELSE 0.0 END AS pr,
        |      CASE WHEN length(text) > 0
        |           THEN cast(len(regexp_extract_all(text, '[A-Z]')) as double) / length(text)
        |           ELSE 0.0 END AS ur
        |    FROM t)),
        |j AS (
        |  SELECT c.doc_id, c.component, q.quality,
        |    count(*) OVER (PARTITION BY c.component) AS cluster_size,
        |    row_number() OVER (PARTITION BY c.component ORDER BY q.quality DESC, c.doc_id) AS rk
        |  FROM comp c JOIN q USING (doc_id))
        |SELECT doc_id, component, cast(cluster_size as bigint) AS cluster_size, quality
        |FROM j WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "q115_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as int) AS gid,
        |  cast(sum(cast(l_quantity as decimal(20,2))) as double) AS sum_qty,
        |  cast(count(*) as bigint) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls, gid""".stripMargin,

    "q117_sliding_window" ->
      """SELECT ws, event_type,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total
        |FROM (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) - i * INTERVAL '6 hours' AS ws,
        |    event_type, value
        |  FROM events, unnest([0, 1]) AS u(i))
        |GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin,

    "q118_csv_wkt" ->
      s"""SELECT cast(c_custkey as bigint) AS c_custkey,
         |  $oCustX AS gx, $oCustY AS gy, c_acctbal
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q140_pagination" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |ORDER BY c_custkey
        |LIMIT 50 OFFSET 100""".stripMargin,

    "q150_session_trajectories" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    cast(event_id % 220 - 110 as bigint) AS px,
        |    cast((event_id * 7) % 160 - 80 as bigint) AS py
        |  FROM events WHERE user_id < 40),
        |o AS (
        |  SELECT user_id, ts, event_id, px, py,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '6 hours'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts, event_id, px, py,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |h AS (
        |  SELECT user_id, sid, ts, event_id, px, py,
        |    lag(px) OVER (PARTITION BY user_id, sid ORDER BY event_id) AS ppx,
        |    lag(py) OVER (PARTITION BY user_id, sid ORDER BY event_id) AS ppy
        |  FROM s)
        |SELECT user_id, min(ts) AS ss,
        |  cast(count(*) as bigint) AS n,
        |  CASE WHEN count(*) >= 2
        |       THEN 'LINESTRING (' || string_agg(px || ' ' || py, ', ' ORDER BY event_id) || ')'
        |       ELSE NULL END AS traj,
        |  CASE WHEN count(*) >= 2
        |       THEN round(sum(CASE WHEN ppx IS NULL THEN 0.0
        |                 ELSE sqrt((px - ppx) * (px - ppx) + (py - ppy) * (py - ppy)) END), 6) + 0.0
        |       ELSE -1.0 END AS traj_len
        |FROM h GROUP BY user_id, sid
        |ORDER BY user_id, ss""".stripMargin,

    "q151_de9im_predicates" ->
      """SELECT c_custkey,
        |  (m = 0) AS eq_ab,
        |  (m = 1) AS ov_ab,
        |  (m = 2) AS tch_ab,
        |  (m = 3) AS dj_ab,
        |  (m = 0 OR m = 2) AS tch_lva,
        |  (m = 1) AS cr_lva,
        |  (m <> 3) AS cr_lvlh,
        |  (m <> 3) AS ov_lh3,
        |  true AS eq_rev,
        |  (m = 0 OR m = 2) AS tch_pa,
        |  (m = 1) AS cr_mpa
        |FROM (SELECT c_custkey, c_custkey % 4 AS m FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q152_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) + 0.0 AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) + 0.0 AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) + 0.0 AS p75,
        |  round(median(l_extendedprice), 6) + 0.0 AS med,
        |  round(quantile_cont(l_quantity, 0.9), 6) + 0.0 AS q90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q153_pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(aug, '\b555-[0-9]{4}\b')) AS n_phone,
        |  len(regexp_extract_all(aug, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        '\b555-[0-9]{4}\b', '<PHONE>', 'g'),
        |        '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g')) AS scrub_md5
        |FROM (
        |  SELECT doc_id, concat(text[1:40], ' contact user', doc_id,
        |    '@example.com or admin@test.org tel 555-01', doc_id % 90 + 10,
        |    ' ip 10.1.', doc_id % 256, '.7 end') AS aug
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q154_cube_grouping" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
        |  cast(count(*) as bigint) AS n,
        |  round(sum(l_quantity), 6) + 0.0 AS sq
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin,

    "q155_tfidf_topterms" ->
      """WITH tok AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        |    FROM documents WHERE doc_id < 2000)
        |  WHERE length(term) >= 3),
        |tf AS (SELECT doc_id, term, cast(count(*) as bigint) AS tf
        |       FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, cast(count(distinct doc_id) as bigint) AS df
        |       FROM tok GROUP BY term),
        |n AS (SELECT cast(count(*) as double) AS n
        |      FROM documents WHERE doc_id < 2000),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, rnk, round(score, 4) + 0.0 AS score
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, term) AS rnk FROM scored)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q156_delaunay" ->
      """SELECT c_custkey,
        |  cast(n - 2 + 2 * f as int) AS n_tri,
        |  round(cast(n * (n - 1) * (n - 2) as double) / 6.0 * sx, 6) + 0.0 AS tri_area
        |FROM (SELECT c_custkey,
        |        4 + c_custkey % 5 AS n,
        |        cast(c_custkey % 2 as int) AS f,
        |        cast(c_custkey % 3 + 1 as double) AS sx
        |      FROM customer WHERE c_custkey <= 600)
        |ORDER BY c_custkey""".stripMargin,

    "q157_voronoi" ->
      """SELECT c_custkey,
        |  cast(3 + c_custkey % 4 as int) AS n_cells,
        |  100.0 AS cell_area
        |FROM customer WHERE c_custkey <= 600
        |ORDER BY c_custkey""".stripMargin,

    "q158_url_canon" ->
      """WITH u AS (
        |  SELECT concat('https://',
        |    CASE cast(o_orderkey % 4 as int) WHEN 0 THEN 'WWW.Example.COM'
        |         WHEN 1 THEN 'docs.example.com'
        |         WHEN 2 THEN 'Blog.Test.ORG' ELSE 'cdn.test.org' END,
        |    '/p/', o_orderkey % 50,
        |    CASE cast(o_orderkey % 3 as int)
        |         WHEN 0 THEN concat('?utm_source=x&id=', o_orderkey % 7)
        |         WHEN 1 THEN concat('?id=', o_orderkey % 7) ELSE '' END,
        |    CASE WHEN o_orderkey % 2 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM orders WHERE o_orderkey <= 20000),
        |c AS (
        |  SELECT url, lower(regexp_extract(url, 'https?://([^/]+)', 1)) AS host,
        |    concat(lower(regexp_extract(url, 'https?://([^/]+)', 1)),
        |           regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1),
        |           CASE WHEN regexp_matches(url, '[?&]id=') THEN
        |             concat('?id=', regexp_extract(url, 'id=([0-9]+)', 1)) ELSE '' END) AS canon
        |  FROM u)
        |SELECT regexp_replace(host, '^www\.', '') AS domain,
        |  regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS reg_domain,
        |  cast(count(*) as bigint) AS n_urls,
        |  cast(count(distinct canon) as bigint) AS n_canon
        |FROM c GROUP BY domain, reg_domain ORDER BY domain""".stripMargin,

    "q159_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        |    FROM documents WHERE doc_id < 2000) WHERE term != ''),
        |pd AS (SELECT doc_id, cast(count(*) as double) AS dl,
        |         cast(sum(CASE WHEN term = 'query'  THEN 1 ELSE 0 END) as double) AS tfq,
        |         cast(sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) as double) AS tfv,
        |         cast(sum(CASE WHEN term = 'merge'  THEN 1 ELSE 0 END) as double) AS tfm
        |       FROM tok GROUP BY doc_id),
        |st AS (SELECT cast(count(*) as double) AS n, avg(dl) AS avgdl FROM pd),
        |df AS (SELECT cast(sum(CASE WHEN tfq > 0 THEN 1 ELSE 0 END) as double) AS dfq,
        |         cast(sum(CASE WHEN tfv > 0 THEN 1 ELSE 0 END) as double) AS dfv,
        |         cast(sum(CASE WHEN tfm > 0 THEN 1 ELSE 0 END) as double) AS dfm
        |       FROM pd),
        |sc AS (
        |  SELECT pd.doc_id,
        |    ln((st.n - df.dfq + 0.5) / (df.dfq + 0.5) + 1.0) * pd.tfq * 2.2
        |      / (pd.tfq + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
        |    ln((st.n - df.dfv + 0.5) / (df.dfv + 0.5) + 1.0) * pd.tfv * 2.2
        |      / (pd.tfv + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) +
        |    ln((st.n - df.dfm + 0.5) / (df.dfm + 0.5) + 1.0) * pd.tfm * 2.2
        |      / (pd.tfm + 1.2 * (0.25 + 0.75 * pd.dl / st.avgdl)) AS score,
        |    cast(pd.tfq as bigint) AS tfq, cast(pd.tfv as bigint) AS tfv,
        |    cast(pd.tfm as bigint) AS tfm, cast(pd.dl as bigint) AS dl
        |  FROM pd CROSS JOIN st CROSS JOIN df
        |  WHERE pd.tfq + pd.tfv + pd.tfm > 0)
        |SELECT rnk, doc_id, tfq, tfv, tfm, dl, round(score, 4) + 0.0 AS score
        |FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM sc)
        |WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    "q160_geo_hygiene" ->
      """SELECT c_custkey,
        |  concat('LINESTRING (0 0, ', d, ' 0, ', d, ' ', d, ', ', 2 * d, ' ', d, ')') AS merged,
        |  cast(3 as int) AS y_parts,
        |  concat('LINESTRING (0 0, ', d, ' 0, ', d, ' ', d, ')') AS dedup,
        |  concat('LINESTRING (0 1, ', d, ' 1, ', 2 * d, ' ', d + 1, ')') AS redu
        |FROM (SELECT c_custkey, c_custkey % 5 + 1 AS d
        |      FROM customer WHERE c_custkey <= 800)
        |ORDER BY c_custkey""".stripMargin,

    "q161_repetition_signals" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                             x -> x != '') AS toks
        |  FROM documents WHERE doc_id < 3000),
        |uni AS (
        |  SELECT doc_id, cast(len(toks) as bigint) AS n_tok,
        |         cast(len(list_distinct(toks)) as bigint) AS n_uniq
        |  FROM base),
        |big AS (
        |  SELECT doc_id, bg, cast(count(*) as bigint) AS c
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |          i -> concat(toks[i], ' ', toks[i + 1]))) AS bg
        |        FROM base WHERE len(toks) >= 2)
        |  GROUP BY doc_id, bg),
        |top AS (
        |  SELECT doc_id, bg AS top_bigram, c,
        |    sum(c) OVER (PARTITION BY doc_id) AS total,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg) AS rn
        |  FROM big)
        |SELECT u.doc_id, u.n_tok, u.n_uniq,
        |  round(1.0 - cast(u.n_uniq as double) / u.n_tok, 6) + 0.0 AS dup_frac,
        |  t.top_bigram, cast(t.c as bigint) AS top_cnt,
        |  round(cast(t.c as double) / t.total, 6) + 0.0 AS top_frac
        |FROM uni u JOIN top t ON u.doc_id = t.doc_id AND t.rn = 1
        |ORDER BY u.doc_id""".stripMargin,

    "q162_rank_family" ->
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) + 0.0 AS prnk
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,

    "q163_line_buffer" ->
      """SELECT c_custkey,
        |  round(2 * r * len + 16 * r * r * sin(pi() / 16), 4) + 0.0 AS cap_area,
        |  round(len * len + 4 * len * r + 16 * r * r * sin(pi() / 16), 4) + 0.0 AS poly_area,
        |  true AS covers_line
        |FROM (SELECT c_custkey, c_custkey % 7 + 1 AS len,
        |        cast(c_custkey % 3 + 1 as double) * 0.5 AS r
        |      FROM customer WHERE c_custkey <= 900)
        |ORDER BY c_custkey""".stripMargin,

    "q164_oriented_bounds" ->
      """SELECT c_custkey,
        |  round(w * h, 4) + 0.0 AS obb_area,
        |  round(sqrt(w * w + h * h) / 2, 6) + 0.0 AS mbr
        |FROM (SELECT c_custkey, cast(c_custkey % 5 + 2 as double) AS w,
        |        cast(c_custkey % 3 + 1 as double) AS h
        |      FROM customer WHERE c_custkey <= 700)
        |ORDER BY c_custkey""".stripMargin,

    "q165_concave_hull" ->
      """SELECT c_custkey,
        |  round(cast(w * h - nw * nh as double) + 0.5, 6) + 0.0 AS conc_area,
        |  round(w * h - nw * nh / 2.0, 6) + 0.0 AS conv_area
        |FROM (SELECT c_custkey,
        |        c_custkey % 3 + 4 AS w, c_custkey % 2 + 3 AS h,
        |        c_custkey % 2 + 1 AS nw, c_custkey % 2 + 1 AS nh
        |      FROM customer WHERE c_custkey <= 250)
        |ORDER BY c_custkey""".stripMargin,

    "q166_hexgrid" ->
      """SELECT c_custkey,
        |  cast(n as int) AS n_hex,
        |  round(n * 1.5 * sqrt(3.0) * r * r, 4) + 0.0 AS hex_area
        |FROM (
        |  SELECT c_custkey, r,
        |    (ncols - ncols // 2) * rows_even + (ncols // 2) * rows_odd AS n
        |  FROM (
        |    SELECT c_custkey, r,
        |      cast(floor(w / (1.5 * r)) as bigint) + 1 AS ncols,
        |      cast(floor(h / (sqrt(3.0) * r)) as bigint) + 1 AS rows_even,
        |      CASE WHEN h >= sqrt(3.0) * r / 2
        |           THEN cast(floor((h - sqrt(3.0) * r / 2) / (sqrt(3.0) * r)) as bigint) + 1
        |           ELSE 0 END AS rows_odd
        |    FROM (SELECT c_custkey,
        |            cast(c_custkey % 5 + 5 as double) AS w,
        |            cast(c_custkey % 4 + 4 as double) AS h,
        |            cast(c_custkey % 3 + 1 as double) * 0.5 AS r
        |          FROM customer WHERE c_custkey <= 500)))
        |ORDER BY c_custkey""".stripMargin,

    "q167_map_functions" ->
      """WITH g AS (
        |  SELECT o_custkey, o_orderstatus AS status, cast(count(*) as bigint) AS cnt
        |  FROM orders WHERE o_custkey < 100 GROUP BY o_custkey, o_orderstatus)
        |SELECT o_custkey, status, cnt,
        |  cast(count(*) OVER (PARTITION BY o_custkey) as int) AS nkeys,
        |  max(CASE WHEN status = 'O' THEN cnt END) OVER (PARTITION BY o_custkey) AS o_cnt
        |FROM g ORDER BY o_custkey, status""".stripMargin,

    "q168_json_roundtrip" ->
      """SELECT o_orderkey,
        |  to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS j,
        |  o_orderkey AS k_back,
        |  o_orderstatus AS s_back
        |FROM orders WHERE o_orderkey <= 5000
        |ORDER BY o_orderkey""".stripMargin,

    "q169_table_checksum" ->
      """SELECT bucket,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(h % 1000000007) as bigint) AS checksum,
        |  cast(max(h % 1000000007) as bigint) AS max_h
        |FROM (
        |  SELECT l_orderkey % 32 AS bucket,
        |    ('0x' || substr(md5(cast(l_orderkey as varchar) || '|' ||
        |      cast(l_linenumber as varchar) || '|' ||
        |      cast(cast(l_quantity as int) as varchar)), 1, 15))::BIGINT AS h
        |  FROM lineitem)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q170_node_lines" ->
      """SELECT c_custkey,
        |  cast(nh * (nv + 1) + nv * (nh + 1) as int) AS n_edges,
        |  round(cast((nh + nv) * 10 as double), 6) + 0.0 AS total_len
        |FROM (SELECT c_custkey, c_custkey % 3 + 1 AS nh, c_custkey % 3 + 2 AS nv
        |      FROM customer WHERE c_custkey <= 800)
        |ORDER BY c_custkey""".stripMargin,

    "q171_polygonize" ->
      """SELECT c_custkey,
        |  cast((nh - 1) * (nv - 1) as int) AS n_faces,
        |  round(cast(4 * (nh - 1) * (nv - 1) as double), 6) + 0.0 AS face_area
        |FROM (SELECT c_custkey, c_custkey % 3 + 2 AS nh, c_custkey % 2 + 2 AS nv
        |      FROM customer WHERE c_custkey <= 800)
        |ORDER BY c_custkey""".stripMargin,

    "q172_split_line" ->
      """SELECT c_custkey,
        |  cast(k + 1 as int) AS n_pieces,
        |  10.0 AS total_len,
        |  'LINESTRING (0 0, 2 0)' AS first_piece,
        |  concat('LINESTRING (', 2 * k, ' 0, 10 0)') AS last_piece
        |FROM (SELECT c_custkey, c_custkey % 3 + 1 AS k
        |      FROM customer WHERE c_custkey <= 800)
        |ORDER BY c_custkey""".stripMargin,

    "q173_makevalid" ->
      """SELECT c_custkey,
        |  false AS valid_before,
        |  true AS valid_after,
        |  cast(2 as int) AS n_parts,
        |  round(50.0 * s * s, 6) + 0.0 AS fixed_area
        |FROM (SELECT c_custkey, c_custkey % 4 + 1 AS s
        |      FROM customer WHERE c_custkey <= 800)
        |ORDER BY c_custkey""".stripMargin,

    "q174_skew_profile" ->
      """WITH f AS (
        |  SELECT l_suppkey AS key, cast(count(*) as bigint) AS cnt
        |  FROM lineitem GROUP BY l_suppkey),
        |s AS (
        |  SELECT cast(count(*) as bigint) AS n_keys,
        |    cast(max(cnt) as bigint) AS max_cnt,
        |    round(quantile_cont(cnt, 0.5), 6) + 0.0 AS p50,
        |    round(quantile_cont(cnt, 0.99), 6) + 0.0 AS p99
        |  FROM f),
        |top AS (
        |  SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key) AS rn
        |  FROM f)
        |SELECT t.rn, t.key, t.cnt, s.n_keys, s.max_cnt, s.p50, s.p99,
        |  round(s.max_cnt / s.p50, 6) + 0.0 AS skew_ratio,
        |  cast(ceil(s.max_cnt / s.p50) as bigint) AS salt_factor
        |FROM top t CROSS JOIN s WHERE t.rn <= 10
        |ORDER BY t.rn""".stripMargin,

    "q175_spherical_area" ->
      """SELECT c_custkey,
        |  round(radians(cast(lam as double)) * 6371008.8 * 6371008.8 / 1e9, 3) + 0.0 AS area_gm2
        |FROM (SELECT c_custkey, c_custkey % 60 + 10 AS lam
        |      FROM customer WHERE c_custkey <= 1000)
        |ORDER BY c_custkey""".stripMargin,

    "q176_funnel" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT s.user_id, min(e.ts) AS first_purchase
        |  FROM s JOIN events e ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
        |  GROUP BY s.user_id),
        |base AS (
        |  SELECT s.user_id, cast(date_trunc('day', s.signup_ts) as date) AS cohort,
        |    CASE WHEN c.first_purchase IS NOT NULL AND
        |              epoch(c.first_purchase) - epoch(s.signup_ts) <= 7 * 86400.0
        |         THEN 1 ELSE 0 END AS converted,
        |    CASE WHEN c.first_purchase IS NOT NULL AND
        |              epoch(c.first_purchase) - epoch(s.signup_ts) <= 7 * 86400.0
        |         THEN (epoch(c.first_purchase) - epoch(s.signup_ts)) / 3600.0
        |         END AS hours_to_convert
        |  FROM s LEFT JOIN conv c ON s.user_id = c.user_id)
        |SELECT cohort,
        |  cast(count(*) as bigint) AS n_signups,
        |  cast(sum(converted) as bigint) AS n_converted,
        |  round(avg(cast(converted as double)), 6) + 0.0 AS conv_rate,
        |  round(quantile_cont(hours_to_convert, 0.5), 4) + 0.0 AS median_hours
        |FROM base GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q177_retention" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT s.user_id,
        |    cast(floor((epoch(e.ts) - epoch(s.signup_ts)) / 604800.0) as int) AS w
        |  FROM s JOIN events e ON e.user_id = s.user_id
        |  WHERE e.ts >= s.signup_ts),
        |coh AS (
        |  SELECT user_id, cast(date_trunc('week', signup_ts) as date) AS cohort FROM s),
        |sizes AS (
        |  SELECT cohort, cast(count(*) as bigint) AS n_users FROM coh GROUP BY cohort)
        |SELECT c.cohort, a.w,
        |  cast(count(*) as bigint) AS n_active, z.n_users,
        |  round(cast(count(*) as double) / z.n_users, 6) + 0.0 AS retention
        |FROM coh c JOIN act a ON c.user_id = a.user_id
        |JOIN sizes z ON c.cohort = z.cohort
        |WHERE a.w BETWEEN 0 AND 3
        |GROUP BY c.cohort, a.w, z.n_users
        |ORDER BY c.cohort, a.w""".stripMargin,

    "q178_bfs_levels" ->
      """SELECT cast(l as int) AS level,
        |  cast(1::BIGINT << l as bigint) AS n_nodes,
        |  cast(1::BIGINT << l as bigint) AS min_node,
        |  cast((1::BIGINT << (l + 1)) - 1 as bigint) AS max_node
        |FROM (SELECT unnest(range(0, 12)) AS l)
        |ORDER BY level""".stripMargin,

    "q179_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (SELECT event_type, next_type, cast(count(*) as bigint) AS n
        |      FROM seq WHERE next_type IS NOT NULL GROUP BY event_type, next_type)
        |SELECT event_type, next_type, n,
        |  round(cast(n as double) / sum(n) OVER (PARTITION BY event_type), 6) + 0.0 AS p
        |FROM t ORDER BY event_type, next_type""".stripMargin,

    "q180_compaction_plan" ->
      """WITH f AS (
        |  SELECT p_partkey AS file_id, cast(p_retailprice * 1000 as bigint) AS bytes
        |  FROM part),
        |o AS (SELECT file_id, bytes,
        |        sum(bytes) OVER (ORDER BY file_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
        |      FROM f),
        |g AS (SELECT file_id, bytes,
        |        cast(floor(coalesce(prior, 0) / 134217728.0) as bigint) AS grp FROM o)
        |SELECT grp, cast(count(*) as bigint) AS n_files,
        |  cast(sum(bytes) as bigint) AS grp_bytes,
        |  min(file_id) AS first_file, max(file_id) AS last_file
        |FROM g GROUP BY grp ORDER BY grp""".stripMargin,

    "q224_image_decode" ->
      """WITH p AS (
        |  SELECT doc_id, 'IMG:' || cast(doc_id as varchar) || ':' || text AS s
        |  FROM documents)
        |SELECT doc_id,
        |  cast(64 + ('0x' || substr(md5(s), 1, 4))::BIGINT % 448 as int) AS decoded_width,
        |  cast(64 + ('0x' || substr(md5(s), 5, 4))::BIGINT % 448 as int) AS decoded_height,
        |  cast(('0x' || substr(md5(s), 9, 4))::BIGINT % 256 as double) AS mean_luma
        |FROM p ORDER BY doc_id""".stripMargin,

    "q225_image_ahash" -> {
      def lum(sCol: String) =
        s"""list_transform(range(60), i ->
           |   ('0x' || substr(md5(substr($sCol,
           |       cast(i * length($sCol) // 60 as int) + 1,
           |       cast((i + 1) * length($sCol) // 60 as int) -
           |         cast(i * length($sCol) // 60 as int))), 1, 15))::BIGINT % 256)""".stripMargin
      def pack(lumCol: String) =
        s"""cast(list_sum(list_transform(range(60), i ->
           |   CASE WHEN $lumCol[i + 1] >= list_sum($lumCol) / 60.0
           |        THEN (1::BIGINT << i) ELSE 0::BIGINT END)) as bigint)""".stripMargin
      s"""WITH s AS (SELECT doc_id, 'IMG:' || text AS s1,
         |    substr('IMG:' || text, 1, cast(floor(length('IMG:' || text) / 2) as int))
         |      || 'XXXXXXXX' ||
         |    substr('IMG:' || text, cast(floor(length('IMG:' || text) / 2) as int) + 9) AS s2
         |  FROM documents),
         |h0 AS (SELECT doc_id, ${lum("s1")} AS lum1, ${lum("s2")} AS lum2 FROM s),
         |h AS (SELECT doc_id, ${pack("lum1")} AS ah, ${pack("lum2")} AS ah_twin FROM h0)
         |SELECT a.doc_id,
         |  cast(bit_count(xor(a.ah, a.ah_twin)) as int) AS h_twin,
         |  cast(bit_count(xor(a.ah, b.ah)) as int) AS h_next
         |FROM h a JOIN h b ON b.doc_id = a.doc_id + 1
         |ORDER BY a.doc_id""".stripMargin
    },

    "q221_kmeans" -> {
      val iterCtes = (1 to 4).map { k =>
        s"""a$k AS (SELECT id, x, y, cid FROM (
           |  SELECT p.id, p.x, p.y, c.cid,
           |    row_number() OVER (PARTITION BY p.id
           |      ORDER BY (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy),
           |               c.cid) AS rn
           |  FROM p CROSS JOIN c${k - 1} c) WHERE rn = 1),
           |m$k AS (SELECT cid,
           |  round(cast(sum(cast(x as decimal(28,9))) as double) / count(*), 9) AS cx,
           |  round(cast(sum(cast(y as decimal(28,9))) as double) / count(*), 9) AS cy
           |  FROM a$k GROUP BY cid),
           |c$k AS (SELECT c.cid, coalesce(m.cx, c.cx) AS cx, coalesce(m.cy, c.cy) AS cy
           |  FROM c${k - 1} c LEFT JOIN m$k m USING (cid))""".stripMargin
      }.mkString(",\n")
      s"""WITH p AS (SELECT c_custkey AS id,
         |    cast(c_custkey % 360 - 180 as double) AS x,
         |    cast((c_custkey * 7) % 160 - 80 as double) AS y
         |  FROM customer WHERE c_custkey <= 600),
         |c0 AS (SELECT cast(row_number() OVER (ORDER BY id) - 1 as int) AS cid,
         |    x AS cx, y AS cy
         |  FROM (SELECT id, x, y FROM p ORDER BY id LIMIT 4)),
         |$iterCtes
         |SELECT id AS c_custkey, cast(cid as int) AS cluster FROM (
         |  SELECT p.id, c.cid,
         |    row_number() OVER (PARTITION BY p.id
         |      ORDER BY (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy),
         |               c.cid) AS rn
         |  FROM p CROSS JOIN c4 c) WHERE rn = 1
         |ORDER BY c_custkey""".stripMargin
    },

    "q222_rfm" ->
      """WITH m AS (
        |  SELECT o_custkey AS cust,
        |    max(o_orderdate) AS last_order,
        |    cast(count(*) as bigint) AS freq,
        |    cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |b AS (
        |  SELECT cust,
        |    ntile(4) OVER (ORDER BY last_order, cust) AS r_bucket,
        |    ntile(4) OVER (ORDER BY freq, cust) AS f_bucket,
        |    ntile(4) OVER (ORDER BY monetary, cust) AS m_bucket
        |  FROM m)
        |SELECT concat(r_bucket, f_bucket, m_bucket) AS segment,
        |  cast(count(*) as bigint) AS n_customers,
        |  min(cust) AS first_cust
        |FROM b GROUP BY r_bucket, f_bucket, m_bucket
        |ORDER BY segment""".stripMargin,

    "q223_clusterwithin" ->
      """WITH RECURSIVE
        |p AS (SELECT c_custkey AS id,
        |        cast(c_custkey % 360 - 180 as double) AS x,
        |        cast((c_custkey * 7) % 160 - 80 as double) AS y
        |      FROM customer WHERE c_custkey <= 300),
        |pr AS (SELECT a.id AS src, b.id AS dst FROM p a JOIN p b ON a.id < b.id
        |       WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 64.0),
        |e AS (SELECT src, dst FROM pr UNION ALL SELECT dst, src FROM pr),
        |cc(id, lbl) AS (
        |  SELECT id, id FROM p
        |  UNION
        |  SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.id)
        |SELECT cast(id as bigint) AS c_custkey, cast(min(lbl) as bigint) AS cluster
        |FROM cc GROUP BY id ORDER BY c_custkey""".stripMargin,

    "q219_chat_turns" ->
      """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id, cast(0 as int) AS pos, 'user' AS role,
        |  md5(array_to_string(ws[1:5], ' ')) AS content_md5,
        |  cast(5 as int) AS n_tokens
        |FROM w
        |UNION ALL
        |SELECT doc_id, cast(1 as int), 'assistant',
        |  md5(array_to_string(ws[6:10], ' ')), cast(5 as int)
        |FROM w
        |ORDER BY doc_id, pos""".stripMargin,

    "q220_argminmax" ->
      """SELECT c_nationkey,
        |  arg_max(c_name, c_acctbal * 100000 + c_custkey) AS richest,
        |  arg_min(c_name, c_acctbal * 100000 + c_custkey) AS poorest,
        |  cast(count(*) FILTER (WHERE c_acctbal > 5000.0) as bigint) AS n_rich,
        |  bool_and(c_acctbal >= 0.0 OR c_mktsegment IS NOT NULL) AS all_ok,
        |  bool_or(c_acctbal < 0.0) AS any_negative,
        |  round(cast(max(c_acctbal) as double), 2) AS max_bal
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q216_offsetcurve" ->
      """SELECT c_custkey,
        |  cast(3 as int) AS np,
        |  round(a - dd, 6) + 0.0 AS left_mx,
        |  round(dd, 6) + 0.0 AS left_my,
        |  round(a + b - 2 * dd, 6) + 0.0 AS left_len,
        |  round(a + dd, 6) + 0.0 AS right_mx,
        |  round(-dd, 6) + 0.0 AS right_my,
        |  round(a + b + 2 * dd, 6) + 0.0 AS right_len
        |FROM (SELECT c_custkey,
        |        cast(c_custkey % 9 + 4 as double) AS a,
        |        cast((c_custkey * 5) % 8 + 4 as double) AS b,
        |        cast(c_custkey % 3 + 1 as double) AS dd
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q217_twap" ->
      """WITH e AS (
        |  SELECT user_id, value, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us
        |  FROM events)
        |SELECT user_id,
        |  cast(count(*) as bigint) AS n_intervals,
        |  cast(sum(next_us - us) as bigint) AS total_us,
        |  round(cast(sum(cast(round(value * (next_us - us), 4) as decimal(30,4))) as double)
        |        / sum(next_us - us), 6) + 0.0 AS twap
        |FROM e WHERE next_us IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q218_pagerank" -> {
      val iterCtes = (1 to 6).map { k =>
        s"""c$k AS (SELECT e.v AS node,
           |  sum(cast(round(cast(t${k - 1}.r as double) / deg.deg, 9) as decimal(28,9))) AS m
           |  FROM e JOIN t${k - 1} ON e.s = t${k - 1}.node JOIN deg ON deg.s = e.s
           |  GROUP BY e.v),
           |t$k AS (SELECT nodes.node,
           |  cast(round(0.0025 + 0.85 * cast(coalesce(c$k.m, 0) as double), 9)
           |    as decimal(28,9)) AS r
           |  FROM nodes LEFT JOIN c$k USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH eraw AS (
         |  SELECT c_custkey % 60 AS s, (c_custkey + 13) % 60 AS v FROM customer
         |  UNION ALL
         |  SELECT c_custkey % 60, (c_custkey * 7 + 3) % 60 FROM customer),
         |e AS (SELECT DISTINCT s, v FROM eraw WHERE s <> v),
         |deg AS (SELECT s, cast(count(*) as bigint) AS deg FROM e GROUP BY s),
         |nodes AS (SELECT DISTINCT s AS node FROM e
         |          UNION SELECT DISTINCT v AS node FROM e),
         |t0 AS (SELECT node, cast(0.016666667 as decimal(28,9)) AS r FROM nodes),
         |$iterCtes
         |SELECT node, cast(r as double) AS pagerank FROM t6 ORDER BY node""".stripMargin
    },

    "q211_matryoshka" -> {
      def cosSql(arr: String, q: String) =
        s"""round(list_dot_product(cast($arr as double[]), $q) /
           |  (sqrt(list_dot_product(cast($arr as double[]), cast($arr as double[]))) *
           |   sqrt(list_dot_product($q, $q))), 6) + 0.0""".stripMargin
      val q16 = queryVec.take(16).mkString("[", ", ", "]")
      s"""SELECT vec_id, cos16, cos_full,
         |  cast(row_number() OVER (ORDER BY cos16 DESC, vec_id) as int) AS rank
         |FROM (
         |  SELECT vec_id,
         |    ${cosSql("embedding[1:16]", q16)} AS cos16,
         |    ${cosSql("embedding", queryVecSql)} AS cos_full
         |  FROM embeddings)
         |ORDER BY cos16 DESC, vec_id LIMIT 10""".stripMargin
    },

    "q212_embedding_stats" ->
      """SELECT label,
        |  cast(count(*) as bigint) AS n,
        |  round(cast(sum(cast(round(cast(embedding[1] as double), 7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS c0,
        |  round(cast(sum(cast(round(cast(embedding[2] as double), 7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS c1,
        |  round(cast(sum(cast(round(cast(embedding[3] as double), 7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS c2,
        |  round(cast(sum(cast(round(
        |    sqrt(list_dot_product(cast(embedding as double[]), cast(embedding as double[]))),
        |    7) as decimal(20,7))) as double) / count(*), 6) + 0.0 AS mean_norm
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin,

    "q213_line_edit" ->
      """SELECT c_custkey,
        |  'LINESTRING (0 0, ' || x0 || ' ' || y0 || ', ' || x1 || ' ' || y1 || ', 9 9)' AS add_end,
        |  'LINESTRING (0 0, 5 5, ' || x0 || ' ' || y0 || ', ' || x1 || ' ' || y1 || ')' AS add_mid,
        |  'LINESTRING (0 0, ' || x1 || ' ' || y1 || ')' AS rm_mid,
        |  'LINESTRING (0 0, ' || x0 || ' ' || y0 || ', 7 7)' AS set_last,
        |  true AS rm_guard,
        |  'MULTIPOINT ((' || x0 || ' ' || y0 || '))' AS multi_pt
        |FROM (
        |  SELECT c_custkey,
        |    cast(c_custkey % 360 - 180 as bigint) AS x0,
        |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
        |    cast(c_custkey % 360 - 180 + c_custkey % 10 + 1 as bigint) AS x1,
        |    cast((c_custkey * 7) % 160 - 80 + c_custkey % 10 + 1 as bigint) AS y1
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q214_islands" ->
      """WITH d AS (SELECT DISTINCT user_id, cast(ts as date) AS day FROM events),
        |r AS (SELECT user_id, day,
        |        (day - DATE '1970-01-01') -
        |          row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d)
        |SELECT user_id, min(day) AS island_start, max(day) AS island_end,
        |  cast(count(*) as bigint) AS n_days
        |FROM r GROUP BY user_id, grp
        |ORDER BY user_id, island_start""".stripMargin,

    "q215_hll_merge" -> {
      val hll = graft.pipeline.Sketch.hllSql(
        "(SELECT 'all' AS grp, user_id FROM events) tsub", "user_id", "grp")
      s"""SELECT h.hll_estimate AS merged_estimate,
         |  h.hll_estimate AS direct_estimate,
         |  cast(true as boolean) AS merge_lossless,
         |  e.exact_distinct
         |FROM ($hll) h
         |CROSS JOIN (SELECT cast(count(DISTINCT user_id) as bigint) AS exact_distinct
         |            FROM events) e""".stripMargin
    },

    "q206_volume_shipping" ->
      """SELECT supp_nation, cust_nation, yr,
        |  cast(sum(volume) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l.l_shipdate) AS yr,
        |    cast(l.l_extendedprice as decimal(20,2)) *
        |      cast(1.0 - l.l_discount as decimal(4,2)) AS volume
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, yr
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin,

    "q207_market_share" ->
      """SELECT yr,
        |  round(cast(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
        |                      ELSE cast(0 as decimal(22,4)) END) as double) /
        |        cast(sum(volume) as double), 6) + 0.0 AS share,
        |  cast(count(*) as bigint) AS n_items
        |FROM (
        |  SELECT year(o.o_orderdate) AS yr, n1.n_name AS supp_nation,
        |    cast(l.l_extendedprice as decimal(20,2)) *
        |      cast(1.0 - l.l_discount as decimal(4,2)) AS volume
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |  JOIN region r ON nc.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  WHERE r.r_name = 'ASIA')
        |GROUP BY yr
        |ORDER BY yr""".stripMargin,

    "q208_product_profit" ->
      """SELECT nation, yr,
        |  cast(sum(amount) as double) AS profit,
        |  cast(count(*) as bigint) AS n_items
        |FROM (
        |  SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
        |    cast(l.l_extendedprice as decimal(20,2)) *
        |      cast(1.0 - l.l_discount as decimal(4,2)) -
        |    cast(p.p_retailprice as decimal(20,2)) *
        |      cast(l.l_quantity as decimal(10,2)) * cast(0.1 as decimal(3,1)) AS amount
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE '%red%')
        |GROUP BY nation, yr
        |ORDER BY nation, yr""".stripMargin,

    "q209_correlated" ->
      """SELECT c.c_custkey,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price,
        |  (SELECT cast(count(*) as bigint) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O') AS n_open
        |FROM customer c
        |ORDER BY c.c_custkey""".stripMargin,

    "q210_regexp" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  cast(len(regexp_extract_all(text, 'ta[a-z]+')) as int) AS n_ta,
        |  regexp_matches(text, 'key.*value') AS has_kv,
        |  md5(regexp_replace(text, '^(\S+) (\S+)', '\2 \1')) AS swapped_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q201_unaryunion" ->
      """SELECT c_custkey,
        |  round(2.75 * s * s, 6) AS u_area,
        |  cast(2 as int) AS n_parts,
        |  cast(true as boolean) AS valid
        |FROM (SELECT c_custkey, cast(c_custkey % 10 + 1 as double) AS s FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q202_normalize" ->
      """SELECT c_custkey,
        |  cast(true as boolean) AS ring_canon_eq,
        |  cast(false as boolean) AS other_canon_eq,
        |  cast(true as boolean) AS mp_canon_eq,
        |  cast(true as boolean) AS equals_pred
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q203_generatepoints" ->
      """SELECT c_custkey,
        |  cast(c_custkey % 20 + 5 as int) AS n_pts,
        |  cast(true as boolean) AS covered
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q204_posexplode" ->
      """WITH w AS (SELECT doc_id, (str_split(text, ' '))[1:5] AS ws FROM documents)
        |SELECT doc_id, cast(unnest(range(5)) as int) AS pos, unnest(ws) AS tok
        |FROM w ORDER BY doc_id, pos""".stripMargin,

    "q205_jaccard_join" ->
      """WITH base AS (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS ws
        |              FROM documents),
        |docs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(ws) - 4),
        |    i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
        |         ws[i+4] || ' ' || ws[i+5])) AS sh
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    list_distinct(list_transform(range(len(ws) - 4),
        |      i -> (CASE WHEN i = 0 THEN 'XX' ELSE ws[i+1] END) || ' ' ||
        |           ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5]))
        |  FROM base)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(cast(len(list_intersect(a.sh, b.sh)) as double) /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) + 0.0
        |    AS jaccard
        |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        |WHERE cast(len(list_intersect(a.sh, b.sh)) as double) /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q196_c4_clean" ->
      """WITH w AS (SELECT doc_id, str_split(text || ' ' || text, ' ') AS ws
        |           FROM documents),
        |k AS (SELECT doc_id,
        |        array_to_string(ws[1:8], ' ') || '.' || chr(10) ||
        |        array_to_string(ws[9:14], ' ') || '?' AS clean
        |      FROM w)
        |SELECT doc_id, cast(2 as int) AS n_lines_kept, md5(clean) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    "q197_gopher" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |           THEN text || chr(10) || '- bullet a' || chr(10) || '- bullet b'
        |                || chr(10) || '- bullet c'
        |         WHEN doc_id % 7 = 0 THEN text || chr(10) || 'to be continued...'
        |         ELSE text END AS t2
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, t2,
        |    list_filter(string_split_regex(trim(t2), '\s+'), w -> w <> '') AS words,
        |    string_split(t2, chr(10)) AS lines
        |  FROM d),
        |f AS (
        |  SELECT doc_id,
        |    cast(len(words) as bigint) AS n_words,
        |    round(cast(list_sum(list_transform(words, w -> length(w))) as double)
        |          / len(words), 6) AS mean_word_len,
        |    round((cast(length(t2) - length(replace(t2, '#', '')) as double) +
        |           (length(t2) - length(replace(t2, '...', ''))) / 3.0)
        |          / len(words), 6) AS symbol_ratio,
        |    round(cast(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) as double)
        |          / len(lines), 6) AS bullet_frac,
        |    round(cast(len(list_filter(lines, l -> regexp_matches(trim(l), '\.\.\.$'))) as double)
        |          / len(lines), 6) AS ellipsis_frac,
        |    cast((CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'the') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'be') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'to') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'of') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'and') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'that') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'have') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'with') THEN 1 ELSE 0 END) as int)
        |      AS stopword_hits,
        |    round(cast(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) as double)
        |          / len(words), 6) AS alpha_frac
        |  FROM m)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |  ellipsis_frac, stopword_hits, alpha_frac,
        |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND symbol_ratio < 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |   AND stopword_hits >= 2 AND alpha_frac > 0.8) AS pass
        |FROM f ORDER BY doc_id""".stripMargin,

    "q198_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, source IN ('src0', 'src1', 'src2', 'src3') AS tgt,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 4096 AS b
        |  FROM (SELECT doc_id, source,
        |          unnest(regexp_extract_all(trim(text), '\S+')) AS tok
        |        FROM documents)),
        |pd AS (SELECT doc_id, b, cast(count(*) as bigint) AS occ
        |       FROM toks GROUP BY doc_id, b),
        |lm AS (SELECT b, cast(sum(CASE WHEN tgt THEN 1 ELSE 0 END) as bigint) AS tc,
        |         cast(count(*) as bigint) AS rc
        |       FROM toks GROUP BY b),
        |tot AS (SELECT cast(sum(tc) as bigint) AS nt, cast(sum(rc) as bigint) AS nr
        |        FROM lm)
        |SELECT doc_id, n_tokens,
        |  round(cast(s as double) / n_tokens, 4) + 0.0 AS dsir_weight
        |FROM (
        |  SELECT pd.doc_id,
        |    sum(cast(round(pd.occ * (ln(lm.tc + 1) - ln(tot.nt + 4096) -
        |                             ln(lm.rc + 1) + ln(tot.nr + 4096)), 6)
        |        as decimal(24,6))) AS s,
        |    cast(sum(pd.occ) as bigint) AS n_tokens
        |  FROM pd JOIN lm USING (b) CROSS JOIN tot
        |  GROUP BY pd.doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q199_binary_quant" -> {
      def half(arr: String, off: Int) =
        s"""cast(list_sum(list_transform(range(32), i ->
           |  CASE WHEN ($arr)[i + ${off + 1}] >= 0 THEN (1::BIGINT << i)
           |       ELSE 0::BIGINT END)) as bigint)""".stripMargin
      s"""WITH c AS (SELECT vec_id, ${half("embedding", 0)} AS lo,
         |             ${half("embedding", 32)} AS hi
         |           FROM embeddings),
         |q AS (SELECT ${half(queryVecSql, 0)} AS qlo, ${half(queryVecSql, 32)} AS qhi)
         |SELECT vec_id,
         |  cast(bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)) as int) AS hamming,
         |  cast(row_number() OVER (ORDER BY
         |    bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)), vec_id) as int) AS rank
         |FROM c CROSS JOIN q
         |ORDER BY hamming, vec_id LIMIT 10""".stripMargin
    },

    "q200_paragraph_dedup" ->
      """WITH w AS (SELECT doc_id, str_split(text || ' ' || text, ' ') AS ws
        |           FROM documents),
        |p AS (SELECT doc_id,
        |        'p1-' || cast(doc_id as varchar) || ' ' || array_to_string(ws[1:10], ' ') AS p1,
        |        'p2-' || cast(doc_id as varchar) || ' ' || array_to_string(ws[11:20], ' ') AS p2
        |      FROM w),
        |mn AS (SELECT min(doc_id) AS m FROM documents),
        |allrows AS (SELECT doc_id, p1, p2 FROM p
        |            UNION ALL SELECT doc_id + 100000, p1, p2 FROM p)
        |SELECT doc_id,
        |  cast(CASE WHEN doc_id >= 100000 THEN 0
        |            WHEN doc_id = (SELECT m FROM mn) THEN 3 ELSE 2 END as bigint) AS n_kept,
        |  md5(CASE WHEN doc_id >= 100000 THEN ''
        |           WHEN doc_id = (SELECT m FROM mn)
        |             THEN p1 || chr(10) || chr(10) || p2 || chr(10) || chr(10)
        |                  || 'standard footer paragraph'
        |           ELSE p1 || chr(10) || chr(10) || p2 END) AS body_md5
        |FROM allrows ORDER BY doc_id""".stripMargin,

    "q189_pivot" ->
      """SELECT o_orderpriority AS prio,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN cast(o_totalprice as decimal(20,2)) END) as double) AS f,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN cast(o_totalprice as decimal(20,2)) END) as double) AS o,
        |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN cast(o_totalprice as decimal(20,2)) END) as double) AS p
        |FROM orders GROUP BY o_orderpriority ORDER BY prio""".stripMargin,

    "q190_groupingsets" ->
      """SELECT coalesce(o_orderstatus, '@') AS st,
        |  coalesce(o_orderpriority, '@') AS prio,
        |  cast(grouping(o_orderstatus) as int) AS g_st,
        |  cast(grouping(o_orderpriority) as int) AS g_prio,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(o_totalprice as decimal(20,2))) as double) AS rev
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_st, g_prio, st, prio""".stripMargin,

    "q191_interval_overlap" ->
      """WITH o AS (
        |  SELECT o_orderkey, epoch_us(o_orderdate) AS o_start,
        |    epoch_us(o_orderdate) + (o_orderkey % 30 + 1) * 86400000000 AS o_end
        |  FROM orders WHERE o_custkey % 100 = 0),
        |l AS (
        |  SELECT l_orderkey, l_linenumber, epoch_us(l_shipdate) AS l_start,
        |    epoch_us(l_shipdate) + (l_partkey % 20 + 1) * 86400000000 AS l_end
        |  FROM lineitem WHERE l_suppkey % 100 = 0)
        |SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber,
        |  cast((least(o.o_end, l.l_end) - greatest(o.o_start, l.l_start)) / 86400000000 as bigint)
        |    AS overlap_days
        |FROM o JOIN l ON o.o_start <= l.l_end AND l.l_start <= o.o_end
        |ORDER BY o.o_orderkey, l.l_orderkey, l.l_linenumber""".stripMargin,

    "q192_scd2" ->
      """SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS valid_from_us,
        |  epoch_us(lead(ts) OVER w) AS valid_to_us,
        |  cast(row_number() OVER w as int) AS version,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q193_triangles" ->
      """WITH e0 AS (
        |  SELECT least(o_custkey % 60, (o_custkey * 7 + o_orderkey) % 60) AS u,
        |         greatest(o_custkey % 60, (o_custkey * 7 + o_orderkey) % 60) AS v
        |  FROM orders),
        |e AS (SELECT DISTINCT u, v FROM e0 WHERE u <> v)
        |SELECT
        |  (SELECT cast(count(DISTINCT n) as bigint) FROM
        |    (SELECT u AS n FROM e UNION ALL SELECT v FROM e)) AS n_nodes,
        |  (SELECT cast(count(*) as bigint) FROM e) AS n_edges,
        |  (SELECT cast(count(*) as bigint)
        |   FROM e a JOIN e b ON a.v = b.u JOIN e c ON c.u = a.u AND c.v = b.v)
        |    AS n_triangles""".stripMargin,

    "q194_disc_mode" ->
      """WITH r AS (SELECT l_returnflag AS flag, cast(l_quantity as double) AS q
        |           FROM lineitem),
        |m AS (SELECT flag, q, cast(count(*) as bigint) AS n FROM r GROUP BY flag, q),
        |o AS (SELECT flag, q, n,
        |        sum(n) OVER (PARTITION BY flag ORDER BY q) AS cum,
        |        sum(n) OVER (PARTITION BY flag) AS tot
        |      FROM m),
        |mm AS (SELECT flag, q AS mode_q, n,
        |         row_number() OVER (PARTITION BY flag ORDER BY n DESC, q) AS rn
        |       FROM m)
        |SELECT o.flag,
        |  min(CASE WHEN 2 * cum >= tot THEN q END) AS p50_disc,
        |  min(CASE WHEN 10 * cum >= 9 * tot THEN q END) AS p90_disc,
        |  max(mm.mode_q) AS mode_val,
        |  max(mm.n) AS mode_n
        |FROM o JOIN (SELECT flag, mode_q, n FROM mm WHERE rn = 1) mm
        |  ON o.flag = mm.flag
        |GROUP BY o.flag
        |ORDER BY o.flag""".stripMargin,

    "q195_fill" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN value < 50.0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id, (v IS NULL) AS was_null,
        |  last_value(v IGNORE NULLS) OVER w AS ffill,
        |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill,
        |  nth_value(v, 2 IGNORE NULLS) OVER w AS second_seen
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q181_frechet" ->
      """SELECT c_custkey,
        |  round(sqrt(13.0), 6) + 0.0 AS f_shift,
        |  round(cast(c_custkey % 10 + 1 as double), 6) + 0.0 AS f_rev,
        |  cast(0.0 as double) AS h_rev
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q182_simplifyvw" ->
      """SELECT c_custkey,
        |  cast(2 as int) AS np_above,
        |  cast(6.0 as double) AS len_above,
        |  cast(7 as int) AS np_below,
        |  round(6.0 * sqrt(1.0 + h * h), 6) AS len_below
        |FROM (SELECT c_custkey, cast(c_custkey % 5 + 1 as double) AS h FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q183_triangulate" ->
      """SELECT c_custkey,
        |  cast(3 as int) AS n_tris,
        |  round(w * h + w * r / 2.0, 6) AS tri_area,
        |  round(w * h + w * r / 2.0, 6) AS poly_area
        |FROM (SELECT c_custkey,
        |        cast(c_custkey % 5 + 2 as double) AS w,
        |        cast((c_custkey * 3) % 5 + 2 as double) AS h,
        |        cast((c_custkey * 7) % 4 + 1 as double) AS r
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q184_minboundingcircle" ->
      """SELECT c_custkey,
        |  cast(33 as int) AS np,
        |  round(sqrt(a * a + b * b) / 2.0, 6) AS r_east,
        |  round(sqrt(a * a + b * b) / 2.0, 6) AS r_north
        |FROM (SELECT c_custkey,
        |        cast(c_custkey % 7 + 1 as double) AS a,
        |        cast((c_custkey * 3) % 6 + 2 as double) AS b
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q185_tileenvelope" ->
      """SELECT c_custkey, z, tx, ty,
        |  round(-20037508.342789244 + tx * sz, 3) + 0.0 AS xmin,
        |  round((20037508.342789244 - ty * sz) - sz, 3) + 0.0 AS ymin,
        |  round((-20037508.342789244 + tx * sz) + sz, 3) + 0.0 AS xmax,
        |  round(20037508.342789244 - ty * sz, 3) + 0.0 AS ymax
        |FROM (
        |  SELECT c_custkey, z, tx, ty,
        |    2.0 * 20037508.342789244 / cast(pow(2, z) as bigint) AS sz
        |  FROM (SELECT c_custkey, cast(c_custkey % 8 + 1 as int) AS z,
        |          cast(c_custkey % cast(pow(2, c_custkey % 8 + 1) as bigint) as bigint) AS tx,
        |          cast((c_custkey * 3) % cast(pow(2, c_custkey % 8 + 1) as bigint) as bigint) AS ty
        |        FROM customer))
        |ORDER BY c_custkey""".stripMargin,

    "q186_chaikin" ->
      """SELECT c_custkey,
        |  cast(6 as int) AS np1,
        |  round(0.75 * (a + b) + 0.25 * sqrt(a * a + b * b), 6) AS len1,
        |  cast(12 as int) AS np2
        |FROM (SELECT c_custkey,
        |        cast(c_custkey % 9 + 1 as double) AS a,
        |        cast((c_custkey * 5) % 8 + 1 as double) AS b
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q187_sharedpaths" ->
      """SELECT c_custkey,
        |  round(cast(c_custkey % 4 + 2 as double) + 4.0, 6) AS shared_len,
        |  cast(2 as int) AS n_pieces
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q188_subdivide" ->
      """SELECT c_custkey,
        |  round(3.0 * w * h, 6) AS area_sum,
        |  cast(true as boolean) AS parts_small,
        |  cast(0.0 as double) AS minx,
        |  round(2.0 * h, 6) AS maxy
        |FROM (SELECT c_custkey,
        |        cast(c_custkey % 4 + 2 as double) AS w,
        |        cast((c_custkey * 3) % 4 + 2 as double) AS h
        |      FROM customer WHERE c_custkey <= 300)
        |ORDER BY c_custkey""".stripMargin,

    "q149_format_chain" ->
      s"""SELECT cast(c_custkey as bigint) AS c_custkey, c_name,
         |  $oCustX AS gx, $oCustY AS gy
         |FROM customer WHERE c_custkey <= 500
         |ORDER BY c_custkey""".stripMargin,

    "q147_profile" -> {
      def ex(c: String) =
        if (c == "o_totalprice") "cast(o_totalprice as decimal(12,2))" else c
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, cast(count(*) as bigint) AS n_rows,
           |  cast(count(${ex(c)}) as bigint) AS non_null,
           |  ${graft.pipeline.Sketch.hllScalarSql("orders", ex(c))} AS n_distinct,
           |  cast(min(${ex(c)}) as varchar) AS min_val,
           |  cast(max(${ex(c)}) as varchar) AS max_val
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q148_cdc_merge" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars, 'U' AS op, cast(-9223372036854775808 as bigint) AS seq
        |  FROM documents),
        |chg AS (
        |  SELECT doc_id, n_chars + 1000 AS n_chars, 'U' AS op, cast(1 as bigint) AS seq
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, cast(NULL as bigint), 'D', 2 FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 500000, cast(doc_id as bigint), 'U', 1
        |  FROM documents WHERE doc_id % 11 = 0),
        |all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
        |ranked AS (
        |  SELECT doc_id, n_chars, op,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY seq DESC, CASE WHEN op = 'D' THEN 1 ELSE 0 END DESC) AS rn
        |  FROM all_rows)
        |SELECT doc_id, n_chars FROM ranked
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY doc_id""".stripMargin,

    "q144_window_topk" ->
      """SELECT ws, event_type, n, rk FROM (
        |  SELECT ws, event_type, n,
        |    cast(row_number() OVER (PARTITION BY ws ORDER BY n DESC, event_type) as int) AS rk
        |  FROM (
        |    SELECT time_bucket(INTERVAL '24 hours', ts) AS ws, event_type,
        |      cast(count(*) as bigint) AS n
        |    FROM events GROUP BY 1, 2))
        |WHERE rk <= 3
        |ORDER BY ws, rk""".stripMargin,

    "q145_setop_all" ->
      """SELECT l_suppkey, cast(count(*) as bigint) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 10.0)
        |GROUP BY l_suppkey
        |UNION ALL
        |SELECT -1 AS l_suppkey, cast(count(*) as bigint) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 10.0)
        |ORDER BY l_suppkey, n""".stripMargin,

    "q146_null_semantics" ->
      """SELECT c_custkey,
        |  b IS NOT DISTINCT FROM LAG(b) OVER (ORDER BY c_custkey) AS same_as_prev,
        |  coalesce(b, -999.0) AS b_filled,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  CASE WHEN b IS NULL THEN 'missing' ELSE 'present' END AS presence,
        |  cast(row_number() OVER (ORDER BY b ASC NULLS FIRST, c_custkey) as int) AS rn_nf
        |FROM (
        |  SELECT c_custkey, c_mktsegment,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS b
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q142_rolling" ->
      """SELECT event_id, user_id,
        |  cast(sum(cast(value as decimal(20,2))) OVER (
        |    PARTITION BY user_id ORDER BY es
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as double) AS rolling_1h,
        |  cast(count(*) OVER (
        |    PARTITION BY user_id ORDER BY es
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as bigint) AS n_1h,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) + 0.0
        |    AS cd
        |FROM (
        |  SELECT event_id, user_id, value, cast(floor(epoch(ts)) as bigint) AS es
        |  FROM events WHERE user_id < 50)
        |ORDER BY user_id, event_id""".stripMargin,

    "q143_sphere_distance" ->
      s"""SELECT c_custkey,
         |  ${havSql(oCustX, oCustY)} + 0.0 AS d_origin,
         |  round(2 * 6371008.8 * asin(sin(radians(1.0) / 2)), 2) + 0.0 AS d_north1,
         |  0.0 AS d_self,
         |  true AS non_point_null
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q141_expand" ->
      s"""SELECT c_custkey,
         |  ($oSide + 4) * ($oSide + 4) AS grown,
         |  4.0 AS pt_box,
         |  true AS contains_orig,
         |  true AS shrink_null
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q138_upsample" ->
      """SELECT doc_id, source, cast(copy as int) AS copy FROM (
        |  SELECT doc_id, source, unnest(range(1, reps + 1)) AS copy FROM (
        |    SELECT doc_id, source,
        |      cast(floor(w) as int) +
        |      CASE WHEN ('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT % 1000
        |                < cast(round((w - floor(w)) * 1000) as bigint) THEN 1 ELSE 0 END AS reps
        |    FROM (
        |      SELECT doc_id, source,
        |        CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
        |                    WHEN 'src2' THEN 1.0 ELSE 0.0 END AS w
        |      FROM documents)))
        |ORDER BY doc_id, copy""".stripMargin,

    "q139_encode_ids" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(trim(text), '\S+')) AS token,
        |    unnest(range(1, len(regexp_extract_all(trim(text), '\S+')) + 1)) AS pos
        |  FROM documents),
        |vc AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |vocab AS (
        |  SELECT token, cast(row_number() OVER (ORDER BY cnt DESC, token) as int) AS tid
        |  FROM vc ORDER BY cnt DESC, token LIMIT 100),
        |enc AS (
        |  SELECT t.doc_id, t.pos, coalesce(v.tid, -1) AS tid
        |  FROM tok t LEFT JOIN vocab v USING (token))
        |SELECT doc_id,
        |  array_to_string(list(tid ORDER BY pos), ',') AS ids_str,
        |  cast(count(*) as int) AS n_ids
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q136_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qp,
        |  round(covar_samp(l_quantity, l_discount), 6) + 0.0 AS cov_qd,
        |  round(stddev_samp(l_quantity), 6) + 0.0 AS sd_q,
        |  round(var_samp(l_discount), 6) + 0.0 AS var_d,
        |  round(avg(l_tax), 6) + 0.0 AS avg_tax
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q137_unpivot" ->
      """SELECT c_custkey, metric, val FROM (
        |  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'acct2x', c_acctbal * 2 FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'acct_abs', abs(c_acctbal) FROM customer)
        |ORDER BY c_custkey, metric""".stripMargin,

    "q133_hausdorff" ->
      s"""SELECT c_custkey,
         |  round(sqrt(13.0), 6) + 0.0 AS hd_shift,
         |  round(sqrt((2 + $oSide) * (2 + $oSide) + (3 + $oSide) * (3 + $oSide)), 6) + 0.0 AS hd_pt,
         |  0.0 AS hd_self
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q134_normalized_dedup" ->
      """SELECT md5(norm) AS h,
        |  cast(count(*) as bigint) AS dup_count,
        |  min(doc_id) AS representative
        |FROM (
        |  SELECT doc_id,
        |    nfc_normalize(trim(regexp_replace(regexp_replace(text2,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g'))) AS norm
        |  FROM (
        |    SELECT doc_id, text AS text2 FROM documents
        |    UNION ALL
        |    SELECT doc_id + 1000000, '  ' || replace(text, ' ', '   ') || ' '
        |    FROM documents))
        |GROUP BY md5(norm)
        |HAVING count(*) > 1
        |ORDER BY h""".stripMargin,

    "q135_covers" ->
      """SELECT c_custkey,
        |  true AS corner_covered,
        |  false AS corner_contained,
        |  true AS edge_covered,
        |  false AS edge_contained,
        |  true AS mid_covered,
        |  false AS outside_covered,
        |  true AS corner_coveredby,
        |  true AS line_covers_end
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q131_datetime_breadth" ->
      """SELECT o_orderkey,
        |  cast(date_trunc('month', o_orderdate) as date) AS month_start,
        |  cast(year(o_orderdate) as int) AS yr,
        |  cast(quarter(o_orderdate) as int) AS qtr,
        |  cast(dayofweek(o_orderdate) + 1 as int) AS dow,
        |  cast(cast(o_orderdate as date) + INTERVAL 3 MONTH as date) AS plus3m,
        |  cast(cast(o_orderdate as date) - DATE '1995-01-01' as int) AS days_since,
        |  last_day(cast(o_orderdate as date)) AS month_end
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q132_string_breadth" ->
      """SELECT c_custkey,
        |  cast(levenshtein(c_name, 'Customer#000000001') as int) AS lev,
        |  lpad(cast(c_custkey as varchar), 12, '0') AS padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
        |  substring(repeat(c_mktsegment, 2), 1, 12) AS seg2,
        |  upper(substring(c_name, 1, 8)) AS name_up,
        |  cast(length(replace(c_name, '0', '')) as int) AS len_no_zero
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q129_json_props" ->
      """SELECT event_type,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(json_extract(props, 'k') as bigint)) as bigint) AS k_sum,
        |  cast(min(cast(json_extract(props, 'k') as bigint)) as bigint) AS k_min,
        |  cast(max(cast(json_extract(props, 'k') as bigint)) as bigint) AS k_max,
        |  cast(count(DISTINCT cast(json_extract(props, 'k') as bigint)) as bigint) AS k_distinct
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q130_array_breadth" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first_sorted,
        |  cast(len(list_distinct(toks)) as int) AS n_distinct,
        |  cast(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) as bigint) AS total_len,
        |  list_contains(toks, 'the') AS has_the,
        |  CASE WHEN len(toks) >= 2 THEN toks[1] || '>' || toks[2] ELSE NULL END AS first_bigram,
        |  array_to_string(list_reverse(toks[1:3]), '|') AS rev3
        |FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q128_squaregrid" ->
      s"""SELECT c_custkey,
         |  cast($oSide * $oSide as bigint) AS n_cells,
         |  $oSide * $oSide AS area_total,
         |  $oCustX AS mnx,
         |  $oCustX + $oSide AS mxx,
         |  $oCustY AS mny,
         |  $oCustY + $oSide AS mxy
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q126_window_breadth" ->
      """SELECT c_custkey,
        |  cast(ntile(4) OVER w as int) AS quartile,
        |  lag(c_acctbal) OVER w AS prev_bal,
        |  lead(c_acctbal) OVER w AS next_bal,
        |  first_value(c_acctbal) OVER w AS min_bal,
        |  last_value(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS max_bal,
        |  cast(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY c_nationkey) as bigint) AS n_pos
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q127_filter_agg" ->
      """SELECT c_nationkey,
        |  cast(count(*) as bigint) AS n,
        |  cast(count(*) FILTER (WHERE c_acctbal > 0) as bigint) AS n_pos,
        |  cast(count(*) FILTER (WHERE c_acctbal <= 0) as bigint) AS n_nonpos,
        |  cast(sum(cast(c_acctbal as decimal(20,2))) FILTER (WHERE c_mktsegment = 'BUILDING')
        |    as double) AS bal_building,
        |  cast(count(DISTINCT c_mktsegment) as bigint) AS n_segments
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q125_events_in_regions" ->
      """SELECT r.r_regionkey AS box, time_bucket(INTERVAL '24 hours', e.ts) AS ws,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(e.value as decimal(20,2))) as double) AS total
        |FROM (SELECT ts, value,
        |        cast(event_id % 220 - 110 as double) AS px,
        |        cast((event_id * 7) % 160 - 80 as double) AS py
        |      FROM events) e
        |JOIN (SELECT r_regionkey,
        |        cast(r_regionkey * 40 - 100 as double) AS x0,
        |        cast(r_regionkey * 40 - 60 as double) AS x1
        |      FROM region) r
        |  ON e.px > r.x0 AND e.px < r.x1 AND e.py > -50 AND e.py < 50
        |GROUP BY r.r_regionkey, time_bucket(INTERVAL '24 hours', e.ts)
        |ORDER BY box, ws""".stripMargin,

    "q124_trajectory" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    cast(event_id % 100 as bigint) AS x, cast((event_id * 3) % 100 as bigint) AS y
        |  FROM events WHERE event_id % 50 = 0),
        |h AS (
        |  SELECT user_id, event_id, x, y,
        |    lag(x) OVER (PARTITION BY user_id ORDER BY event_id) AS px,
        |    lag(y) OVER (PARTITION BY user_id ORDER BY event_id) AS py
        |  FROM e)
        |SELECT user_id,
        |  'LINESTRING (' || string_agg(x || ' ' || y, ', ' ORDER BY event_id) || ')' AS traj,
        |  cast(count(*) as bigint) AS n,
        |  round(sum(CASE WHEN px IS NULL THEN 0.0
        |                 ELSE sqrt((x - px) * (x - px) + (y - py) * (y - py)) END), 6) + 0.0
        |    AS traj_len
        |FROM h GROUP BY user_id HAVING count(*) >= 2
        |ORDER BY user_id""".stripMargin,

    "q123_collection_ops" ->
      """SELECT c_custkey,
        |  3 AS ng_mp,
        |  1 AS ng_point,
        |  'POINT (0 0)' AS g2,
        |  true AS g_oob_null,
        |  'MULTIPOINT ((' || x0 || ' ' || y0 || '), (5 5))' AS ce_points,
        |  'MULTILINESTRING ((0 0, 1 1))' AS ce_lines,
        |  true AS ce_poly_null
        |FROM (
        |  SELECT c_custkey,
        |    cast(c_custkey % 360 - 180 as bigint) AS x0,
        |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q122_sq8_ann" ->
      s"""WITH v AS (
         |  SELECT vec_id, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord
         |  FROM (SELECT vec_id, cast(embedding as double[]) AS e FROM embeddings)),
         |rng AS (SELECT ord, min(val) AS mn, max(val) AS mx FROM v GROUP BY ord),
         |enc AS (
         |  SELECT v.vec_id, v.ord,
         |    CASE WHEN r.mx = r.mn THEN r.mn
         |         ELSE r.mn + cast(round((v.val - r.mn) * 127 / (r.mx - r.mn), 0) as int)
         |              * (r.mx - r.mn) / 127.0 END AS dv
         |  FROM v JOIN rng r USING (ord)),
         |dec AS (SELECT vec_id, list(dv ORDER BY ord) AS d FROM enc GROUP BY vec_id)
         |SELECT vec_id,
         |  round(list_dot_product(d, $queryVecSql) /
         |        (sqrt(list_dot_product(d, d)) * sqrt(list_dot_product($queryVecSql, $queryVecSql))), 6) + 0.0
         |    AS cosine
         |FROM dec
         |ORDER BY list_dot_product(d, $queryVecSql) /
         |  (sqrt(list_dot_product(d, d)) * sqrt(list_dot_product($queryVecSql, $queryVecSql))) DESC, vec_id
         |LIMIT 10""".stripMargin,

    "q121_session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '6 hours'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS ss, max(ts) + INTERVAL '6 hours' AS se,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(value as decimal(20,2))) as double) AS total
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, ss""".stripMargin,

    "q119_normalize_text" ->
      """SELECT doc_id,
        |  nfc_normalize(trim(regexp_replace(regexp_replace(noisy,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g'))) AS norm,
        |  cast(length(noisy) as bigint) AS n_before,
        |  cast(length(nfc_normalize(trim(regexp_replace(regexp_replace(noisy,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g')))) as bigint) AS n_after
        |FROM (
        |  SELECT doc_id, chr(1) || '  ' || text || '  cafe' || chr(769) || '  ' AS noisy
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q120_far_angle_segmentize" ->
      s"""SELECT c_custkey,
         |  round(sqrt((2 + $oSide) * (2 + $oSide) + (3 + $oSide) * (3 + $oSide)), 6) + 0.0 AS md,
         |  'LINESTRING (' || x0 || ' ' || y0 || ', ' || cast(x0 + 2 + s as bigint) || ' ' ||
         |    cast(y0 + 3 + s as bigint) || ')' AS ll,
         |  round(atan2($oSide, 2.0) - pi() / 2 + 2 * pi(), 6) + 0.0 AS ang,
         |  true AS ang_self_null,
         |  cast(4 * $oSide + 1 as int) AS seg_n,
         |  round(4 * $oSide, 6) + 0.0 AS seg_len,
         |  2.0 AS seg_pt
         |FROM (
         |  SELECT c_custkey,
         |    cast(c_custkey % 360 - 180 as bigint) AS x0,
         |    cast((c_custkey * 7) % 160 - 80 as bigint) AS y0,
         |    cast(c_custkey % 10 + 1 as bigint) AS s
         |  FROM customer)
         |ORDER BY c_custkey""".stripMargin,

    "q116_dbscan" ->
      """WITH RECURSIVE
        |pts AS (SELECT c_custkey AS id,
        |  cast(('0x'||substr(md5(cast(c_custkey as varchar)),1,15))::BIGINT % 80 as double) AS x,
        |  cast(('0x'||substr(md5(cast(c_custkey as varchar)),16,15))::BIGINT % 80 as double) AS y
        |  FROM customer WHERE c_custkey <= 1200),
        |pairs AS (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
        |  ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 4.0),
        |neigh AS (SELECT ia AS id, count(*) AS nc FROM pairs GROUP BY ia),
        |core AS (SELECT id FROM neigh WHERE nc >= 3),
        |ce AS (SELECT ia, ib FROM pairs
        |  JOIN core a ON ia = a.id JOIN core b ON ib = b.id WHERE ia <> ib),
        |cc(id, lbl) AS (
        |  SELECT id, id FROM core
        |  UNION
        |  SELECT ce.ib, cc.lbl FROM cc JOIN ce ON ce.ia = cc.id),
        |comp AS (SELECT id, cast(min(lbl) as bigint) AS cluster FROM cc GROUP BY id),
        |border AS (
        |  SELECT p.ia AS id, min(comp.cluster) AS cluster
        |  FROM pairs p JOIN comp ON p.ib = comp.id
        |  WHERE p.ia NOT IN (SELECT id FROM core) AND p.ia <> p.ib
        |  GROUP BY p.ia)
        |SELECT p.id, p.x, p.y,
        |  (c.id IS NOT NULL) AS is_core,
        |  coalesce(comp.cluster, border.cluster) AS cluster
        |FROM pts p
        |LEFT JOIN core c ON p.id = c.id
        |LEFT JOIN comp ON p.id = comp.id
        |LEFT JOIN border ON p.id = border.id
        |ORDER BY p.id""".stripMargin,

    "q108_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS w FROM documents),
        |tg AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w) - 2)]) AS gram
        |  FROM toks WHERE doc_id % 37 <> 0),
        |eg AS (
        |  SELECT DISTINCT
        |    unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w) - 2)]) AS gram
        |  FROM toks WHERE doc_id % 37 = 0)
        |SELECT t.doc_id, cast(count(*) as bigint) AS n_shared, min(t.gram) AS sample_gram
        |FROM tg t JOIN eg e USING (gram)
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "q109_token_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(trim(text), '\S+')) AS t FROM documents),
        |cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t)
        |SELECT doc_id, cast(sum(c) as bigint) AS n_tokens, cast(count(*) as bigint) AS vocab,
        |  cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) as bigint) AS hapax,
        |  round(cast(count(*) as double) / sum(c), 6) + 0.0 AS ttr,
        |  round(ln(cast(sum(c) as double)) -
        |    cast(sum(cast(round(c * ln(c), 9) as decimal(38,9))) as double) / sum(c), 6) + 0.0
        |    AS entropy
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q110_quality_norm" ->
      """WITH scored AS (
        |  SELECT doc_id, source, round(cast(
        |    (CASE WHEN words >= 50 AND words <= 100000 THEN 1.0
        |          WHEN words >= 10 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |    (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN pr <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.2 as double), 6) AS quality
        |  FROM (
        |    SELECT doc_id, source,
        |      cast(len(regexp_extract_all(text, '\S+')) as double) AS words,
        |      CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
        |           THEN cast(length(text) as double) / len(regexp_extract_all(text, '\S+'))
        |           ELSE 0.0 END AS mwl,
        |      CASE WHEN length(text) > 0
        |           THEN cast(len(regexp_extract_all(text, '[.,;:!?]')) as double) / length(text)
        |           ELSE 0.0 END AS pr,
        |      CASE WHEN length(text) > 0
        |           THEN cast(len(regexp_extract_all(text, '[A-Z]')) as double) / length(text)
        |           ELSE 0.0 END AS ur
        |    FROM documents))
        |SELECT doc_id, source, quality,
        |  round(percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id), 6) + 0.0 AS pr,
        |  round(CASE WHEN qmax = qmin THEN 0.5
        |             ELSE (quality - qmin) / (qmax - qmin) END, 6) + 0.0 AS minmax
        |FROM (
        |  SELECT doc_id, source, quality,
        |    min(quality) OVER (PARTITION BY source) AS qmin,
        |    max(quality) OVER (PARTITION BY source) AS qmax
        |  FROM scored)
        |ORDER BY doc_id""".stripMargin,

    "q100_curation_pipeline" -> {
      import graft.pipeline.Corpus.{EmailRe, Ipv4Re, PhoneRe}
      s"""WITH cleaned AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g') AS t
         |  FROM documents),
         |kept AS (
         |  SELECT doc_id, t FROM cleaned
         |  WHERE len(regexp_extract_all(trim(t), '\\S+')) >= 20),
         |deduped AS (
         |  SELECT doc_id, t FROM (
         |    SELECT doc_id, t,
         |      row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
         |    FROM kept) WHERE rn = 1)
         |SELECT
         |  cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT % 16 as int) AS shard,
         |  cast(count(*) as bigint) AS n_docs,
         |  cast(sum(len(regexp_extract_all(trim(t), '\\S+'))) as bigint) AS n_tokens,
         |  min(doc_id) AS min_id
         |FROM deduped GROUP BY shard ORDER BY shard""".stripMargin
    },

    "q98_shard_assign" ->
      """SELECT cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::BIGINT % 64 as int) AS shard,
        |  cast(count(*) as bigint) AS n_docs,
        |  cast(sum(n_chars) as bigint) AS n_chars,
        |  min(doc_id) AS min_id
        |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,

    "q97_incremental_dedup" ->
      """WITH incoming AS (
        |  SELECT doc_id + 2000000 AS doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'fresh take ' || text ELSE text END AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, 'fresh take ' || text AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |nohist AS (
        |  SELECT i.doc_id, i.text FROM incoming i
        |  ANTI JOIN (SELECT DISTINCT md5(text) AS h FROM documents) hh
        |  ON md5(i.text) = hh.h),
        |ranked AS (
        |  SELECT doc_id, text,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM nohist)
        |SELECT doc_id, md5(text) AS text_md5 FROM ranked
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q95_token_drift" ->
      """WITH old AS (SELECT source, text FROM documents),
        |newer AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 3 = 0
        |         THEN text || ' breaking update coverage tonight'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0),
        |co AS (
        |  SELECT source, tok, count(*) AS c_o FROM (
        |    SELECT source, unnest(regexp_extract_all(trim(text), '\S+')) AS tok
        |    FROM old) GROUP BY source, tok),
        |cn AS (
        |  SELECT source, tok, count(*) AS c_n FROM (
        |    SELECT source, unnest(regexp_extract_all(trim(text), '\S+')) AS tok
        |    FROM newer) GROUP BY source, tok),
        |joint AS (
        |  SELECT source, tok, coalesce(c_o, 0) AS c_o, coalesce(c_n, 0) AS c_n
        |  FROM co FULL OUTER JOIN cn USING (source, tok)),
        |tot AS (
        |  SELECT source, sum(c_o) AS n_old_tokens, sum(c_n) AS n_new_tokens,
        |         count(*) AS joint_vocab
        |  FROM joint GROUP BY source)
        |SELECT j.source,
        |  cast(t.n_old_tokens as bigint) AS n_old_tokens,
        |  cast(t.n_new_tokens as bigint) AS n_new_tokens,
        |  cast(t.joint_vocab as bigint) AS joint_vocab,
        |  round(cast(sum(cast(round(
        |    ((c_n + 1)::DOUBLE / (t.n_new_tokens + t.joint_vocab)) *
        |    ln(((c_n + 1)::DOUBLE / (t.n_new_tokens + t.joint_vocab)) /
        |       ((c_o + 1)::DOUBLE / (t.n_old_tokens + t.joint_vocab))), 8)
        |    as decimal(24,8))) as double), 6) + 0.0 AS kl_divergence
        |FROM joint j JOIN tot t USING (source)
        |GROUP BY j.source, t.n_old_tokens, t.n_new_tokens, t.joint_vocab
        |ORDER BY j.source""".stripMargin,

    "q94_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
        |newer AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' [edited]' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |j AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN md5(o.text) <> md5(n.text) THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM old o FULL OUTER JOIN newer n ON o.doc_id = n.doc_id)
        |SELECT status, cast(count(*) as bigint) AS n,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM j GROUP BY status ORDER BY status""".stripMargin,

    "q91_oov_rate" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_extract_all(trim(text), '\S+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt FROM terms GROUP BY tok)
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= 200),
        |scored AS (
        |  SELECT t.doc_id,
        |    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM terms t LEFT JOIN vocab v USING (tok))
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_tokens,
        |  cast(sum(oov) as bigint) AS n_oov,
        |  round(sum(oov)::DOUBLE / count(*), 6) + 0.0 AS oov_rate
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q90_span_scrub" ->
      """WITH docs AS (
        |  SELECT doc_id, CASE WHEN doc_id % 4 = 0
        |    THEN text || ' join our mailing list for weekly updates today'
        |    ELSE text END AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, regexp_extract_all(trim(t), '\S+') AS w FROM docs),
        |tok AS (
        |  SELECT doc_id, unnest(generate_series(0, len(w) - 1)) AS p, unnest(w) AS tk
        |  FROM toks WHERE len(w) > 0),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, len(w) - 6)) AS pos,
        |    unnest([array_to_string(w[x + 1 : x + 6], ' ')
        |            FOR x IN generate_series(0, len(w) - 6)]) AS gram
        |  FROM toks WHERE len(w) >= 6),
        |freq AS (
        |  SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM grams)
        |  GROUP BY gram HAVING count(*) >= 3),
        |covered AS (
        |  SELECT DISTINCT doc_id, cp FROM (
        |    SELECT doc_id, unnest(generate_series(pos, pos + 5)) AS cp
        |    FROM grams WHERE gram IN (SELECT gram FROM freq))),
        |kept AS (
        |  SELECT tok.doc_id, tok.p, tok.tk FROM tok
        |  ANTI JOIN covered ON tok.doc_id = covered.doc_id AND tok.p = covered.cp),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS scrubbed,
        |         cast(count(*) as bigint) AS n_kept_tokens
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.n_kept_tokens, 0) AS n_kept_tokens,
        |  md5(coalesce(r.scrubbed, '')) AS scrubbed_md5
        |FROM docs d LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q88_chunk_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |chunks AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, greatest(0, cast(floor((len(t) - 9) / 40.0) as int)))) AS chunk_id,
        |    t
        |  FROM toks)
        |SELECT doc_id, cast(chunk_id as int) AS chunk_id,
        |  cast(len(t[chunk_id * 40 + 1 : chunk_id * 40 + 48]) as bigint) AS n_chunk_tokens,
        |  md5(array_to_string(t[chunk_id * 40 + 1 : chunk_id * 40 + 48], ' ')) AS chunk_md5
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    "q89_pack_sequences" ->
      """SELECT source, shard_id,
        |  cast(count(*) as bigint) AS n_docs,
        |  cast(sum(n_tokens) as bigint) AS n_tokens
        |FROM (
        |  SELECT source,
        |    cast(floor((cum - n_tokens) / 4096.0) as int) AS shard_id, n_tokens
        |  FROM (
        |    SELECT source, n_tokens,
        |      sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |    FROM (
        |      SELECT source, doc_id,
        |        cast(len(regexp_extract_all(trim(text), '\S+')) as bigint) AS n_tokens
        |      FROM documents)))
        |GROUP BY source, shard_id ORDER BY source, shard_id""".stripMargin,

    "q86_boilerplate" ->
      """WITH docs AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    substr(text, 1, 80),
        |    CASE WHEN doc_id % 3 = 0 THEN 'copyright footer example corp' END,
        |    substr(text, 81, 80),
        |    CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter' END) AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, unnest(generate_series(1, len(l))) AS pos, unnest(l) AS line
        |  FROM (SELECT doc_id, string_split(t, chr(10)) AS l FROM docs)),
        |boiler AS (
        |  SELECT line FROM lines WHERE trim(line) <> ''
        |  GROUP BY line
        |  HAVING count(DISTINCT doc_id) > 0.2 * (SELECT count(*) FROM docs)),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |  FROM lines WHERE line NOT IN (SELECT line FROM boiler)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
        |  cast(len(coalesce(r.clean_text, '')) as bigint) AS n_clean_chars
        |FROM docs d LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q83_stratified_sample" ->
      """SELECT source, sample_rank, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(cast(doc_id as varchar)), doc_id) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 40
        |ORDER BY source, sample_rank""".stripMargin,

    // md5-layout decode (q224 codec) + closed-form frame sampling:
    // sequence(0, dur-1, 1000) has ceil(dur/1000) elements ending at
    // floor((dur-1)/1000)*1000; dur = width*25 > 0 always.
    "q48_multimodal" ->
      """WITH p AS (
        |  SELECT doc_id, 'IMG:' || cast(doc_id as varchar) || ':' || text AS s
        |  FROM documents),
        |d AS (SELECT doc_id,
        |  cast(64 + ('0x' || substr(md5(s), 1, 4))::BIGINT % 448 as int) AS decoded_width,
        |  cast(64 + ('0x' || substr(md5(s), 5, 4))::BIGINT % 448 as int) AS decoded_height,
        |  cast(('0x' || substr(md5(s), 9, 4))::BIGINT % 256 as double) AS mean_luma
        |  FROM p)
        |SELECT doc_id, decoded_width, decoded_height, mean_luma,
        |  cast(8 as int) AS feat_dim,
        |  cast(ceil(decoded_width * 25 / 1000.0) as bigint) AS n_frames,
        |  cast((decoded_width * 25 - 1) // 1000 * 1000 as bigint) AS last_frame_ms
        |FROM d ORDER BY doc_id""".stripMargin
  )
}
