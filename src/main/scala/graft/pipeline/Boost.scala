package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Gradient-boosted decision STUMPS (depth-1 trees, squared loss) — the
 * quality-scoring model family's non-linear member, beside the linear
 * [[Regression]] and logistic [[Classifier]].
 *
 * Scale shape: each boosting round is ONE map-side-combined aggregation
 * over the data (per-(feature, bin) residual sums against fixed bin
 * edges) followed by metadata-sized work — cumulative sums over
 * features x bins rows pick the best split by variance reduction, and
 * the chosen stump is a ONE-ROW relation cross-joined into the next
 * round's residual expression. Neither predictions nor residuals are
 * ever materialized per row: the model after r rounds is r one-row
 * stump relations, so round r+1's corpus scan recomputes
 * y - sum(stumps(x)) inline. Driver state: nothing (Spark keeps each
 * stump as a localCheckpointed 1-row view); at 100 TB the cost is
 * `rounds` scans, the textbook distributed-boosting layout.
 *
 * Cross-engine exactness (the TopicModel/Classifier discipline): every
 * step's SQL text comes from ONE builder, used verbatim by the Spark
 * loop (temp views between rounds) and by the oracle's unrolled
 * MATERIALIZED-CTE chain. Sums fold round-12 decimal(30,12) terms;
 * split gains round to 12 before the deterministic
 * (gain DESC, feature, bin) pick; leaf values divide once in double.
 */
object Boost {

  private val dec = "decimal(30,12)"

  /** Fixed number of candidate bins per feature. */
  val Bins = 8

  /**
   * Stats CTE: global (min, max) per feature, exposed as one row per
   * feature f in 0..nf-1 with cols (f, mn, mx). `xs` are portable SQL
   * expressions. Equal-width edges from a one-scan min/max are the
   * deterministic, shuffle-free binning (quantile bins would cost a
   * sort; width bins keep the variance-reduction pick exact).
   */
  private[pipeline] def statsCte(rel: String, xs: Seq[String],
      mat: String): String = {
    // one scan for every feature's (min, max) — a per-feature UNION ALL
    // of full-scan arms costs |xs| passes over the data; the 1-row bmm
    // fold then unpivots for free
    val aggs = xs.zipWithIndex.map { case (x, i) =>
      s"cast(min($x) as double) AS mn$i, cast(max($x) as double) AS mx$i"
    }.mkString(", ")
    val arms = xs.indices.map(i =>
      s"SELECT $i AS f, mn$i AS mn, mx$i AS mx FROM bmm")
    // bmm carries the materialization hint too (ADVICE r08): an oracle
    // engine that inlines plain CTEs would otherwise re-run the corpus
    // min/max fold once per unpivot arm, defeating the one-scan intent.
    s"bmm AS $mat (SELECT $aggs FROM $rel),\nbstats AS $mat (${arms.mkString(" UNION ALL ")})"
  }

  /** Residual expression after the stumps chosen in rounds 1..r (each
    * a cross-joined 1-row relation aliased st1..str). */
  private[pipeline] def residExpr(yExpr: String, xs: Seq[String], r: Int): String =
    if (r == 0) s"($yExpr)"
    else {
      val terms = (1 to r).map { k =>
        val cases = xs.zipWithIndex.map { case (x, i) =>
          s"WHEN st$k.f = $i THEN CASE WHEN ($x) <= st$k.thr THEN st$k.lv ELSE st$k.rv END"
        }.mkString(" ")
        s"(CASE $cases ELSE 0.0 END)"
      }.mkString(" - ")
      s"(($yExpr) - $terms)"
    }

  /** Joined 1-row stump relations st1..str (empty string for r = 0). */
  private def stumpJoins(r: Int, name: Int => String): String =
    (1 to r).map(k => s" CROSS JOIN ${name(k)} st$k").mkString

  /**
   * One boosting round: emits CTEs computing the round-`r` best stump
   * as `$out`(f, thr, lv, rv, gain). Reads bstats and the stump
   * relations `name(1..r-1)`. `lr` is the shrinkage.
   */
  private[pipeline] def roundCtes(rel: String, xs: Seq[String], yExpr: String,
      r: Int, out: String, lr: Double, mat: String,
      name: Int => String): String = {
    val res = residExpr(yExpr, xs, r - 1)
    val joins = stumpJoins(r - 1, name)
    // bin index in 0..Bins-1 by equal-width edges; degenerate mn = mx
    // collapses to bin 0 (no split gain, never picked over a real one)
    def binExpr(x: String) =
      s"""CASE WHEN s.mx <= s.mn THEN 0 ELSE least($Bins - 1,
         |    greatest(0, cast(floor((($x) - s.mn) / ((s.mx - s.mn) / $Bins)) as int))) END""".stripMargin
    // ONE pass per round: cross-join the |xs|-row bstats relation and pick
    // the matching feature's bin by s.f — a per-feature UNION ALL of
    // full-scan arms would read (and, on Spark, re-shuffle) the data |xs|
    // times per round for the identical (f, b, res) multiset
    val binArms = xs.zipWithIndex.map { case (x, i) =>
      s"WHEN $i THEN ${binExpr(x)}"
    }.mkString("\n      ")
    val armSelects =
      s"""SELECT s.f, CASE s.f
         |      $binArms
         |      END AS b,
         |      cast(round($res, 12) as $dec) AS res
         |    FROM $rel$joins CROSS JOIN bstats s""".stripMargin
    val p = s"r${r}_"
    // counts stay bigint and residual sums stay decimal through the
    // GROUP BY and window folds (exact, order-independent on both
    // engines); doubles appear only in the gain/leaf scalar algebra,
    // where identical expression trees over identical inputs give
    // identical doubles.
    s"""${p}bins AS (
       |  SELECT f, b, cast(count(*) as bigint) AS c, sum(res) AS sr
       |  FROM (
       |    $armSelects
       |  ) z GROUP BY f, b),
       |${p}tot AS (SELECT f, cast(sum(c) as bigint) AS n,
       |  cast(sum(sr) as $dec) AS s FROM ${p}bins GROUP BY f),
       |${p}cum AS (
       |  SELECT b.f, b.b,
       |    cast(sum(b.c) OVER (PARTITION BY b.f ORDER BY b.b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS nl,
       |    cast(sum(b.sr) OVER (PARTITION BY b.f ORDER BY b.b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as $dec) AS sl,
       |    t.n, t.s
       |  FROM ${p}bins b JOIN ${p}tot t ON t.f = b.f),
       |${p}gain AS (
       |  SELECT f, b, nl, sl, n, s,
       |    round(cast(sl as double) * cast(sl as double) / nl
       |      + (cast(s as double) - cast(sl as double))
       |        * (cast(s as double) - cast(sl as double)) / (n - nl)
       |      - cast(s as double) * cast(s as double) / n, 12) AS g
       |  FROM ${p}cum WHERE nl > 0 AND n - nl > 0),
       |${p}best AS (SELECT f, b, nl, sl, n, s, g FROM ${p}gain
       |  ORDER BY g DESC, f, b LIMIT 1),
       |$out AS $mat (
       |  SELECT bb.f, s.mn + (bb.b + 1) * ((s.mx - s.mn) / $Bins) AS thr,
       |    round(cast($lr as double) * cast(bb.sl as double) / bb.nl, 12) AS lv,
       |    round(cast($lr as double)
       |      * (cast(bb.s as double) - cast(bb.sl as double)) / (bb.n - bb.nl), 12) AS rv,
       |    cast(bb.g as double) + 0.0 AS gain
       |  FROM ${p}best bb JOIN bstats s ON s.f = bb.f)""".stripMargin
  }

  /** Final per-round report: (round, feature, thr, lv, rv, gain) plus a
    * training-SSE row per round is deliberately omitted — the stump
    * table IS the model. */
  private[pipeline] def reportSql(rounds: Int, name: Int => String): String =
    (1 to rounds).map { k =>
      s"""SELECT $k AS round, f AS feature, round(thr, 6) + 0.0 AS thr,
         |  round(lv, 6) + 0.0 AS left_val, round(rv, 6) + 0.0 AS right_val,
         |  round(gain, 6) + 0.0 AS gain FROM ${name(k)}""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY round"

  /**
   * Complete unrolled chain for the DuckDB oracle. `rel` must expose
   * the feature/label expressions' columns.
   */
  def chainSql(rel: String, xs: Seq[String], yExpr: String, rounds: Int,
      lr: Double = 0.5, mat: String = "MATERIALIZED"): String = {
    require(rounds >= 1 && xs.nonEmpty)
    val name = (k: Int) => s"st$k"
    val steps = (1 to rounds)
      .map(r => roundCtes(rel, xs, yExpr, r, name(r), lr, mat, name))
      .mkString(",\n")
    s"""WITH ${statsCte(rel, xs, mat)},
       |$steps
       |${reportSql(rounds, name)}""".stripMargin
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /**
   * Run the chain on Spark: same builders, stumps materialized as
   * 1-row localCheckpointed views between rounds. Returns the stump
   * table (round, feature, thr, left_val, right_val, gain).
   */
  def trainStumps(data: DataFrame, xs: Seq[String], yExpr: String,
      rounds: Int, lr: Double = 0.5): DataFrame = {
    require(rounds >= 1 && xs.nonEmpty)
    val spark = data.sparkSession
    val run = seq.incrementAndGet()
    def vw(k: Int) = s"__boost${run}_st$k"
    val rel = s"__boost${run}_data"
    data.createOrReplaceTempView(rel)
    // TopicModel.matCut: lineage cut + size-estimate reset — the round-r
    // scan cross-joins every earlier stump, so inherited estimates would
    // otherwise compound exponentially across rounds
    TopicModel.matCut(spark.sql(s"WITH ${statsCte(rel, xs, "")} SELECT * FROM bstats"))
      .createOrReplaceTempView(s"__boost${run}_stats")
    (1 to rounds).foreach { r =>
      val ctes = roundCtes(rel, xs, yExpr, r, "stout", lr, "", vw)
        .replace("bstats", s"__boost${run}_stats")
      TopicModel.matCut(spark.sql(s"WITH $ctes SELECT * FROM stout"))
        .createOrReplaceTempView(vw(r))
    }
    spark.sql(reportSql(rounds, vw))
  }
}
