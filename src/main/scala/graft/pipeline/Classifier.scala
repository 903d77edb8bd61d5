package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering for training corpora: a distributed
 * full-batch logistic-regression trainer plus a codegen scoring
 * expression. This is the fastText/CCNet-style "train a linear quality
 * classifier, keep documents above a score threshold" step every
 * large-scale pretraining pipeline runs after the heuristic filters
 * (the reference's corpus surface stops at heuristics; this completes
 * the standard pipeline).
 *
 * Determinism contract (the q52/q221 codebook pattern, see Pca.scala):
 * every per-row quantity is pure IEEE double arithmetic evaluated from
 * an explicit parse tree (so any engine computes the identical double),
 * and the only aggregation is a sum of per-row TRUNCATED SCALED LONGS —
 * floor(g * 1e9) per row, summed as exact longs. Long sums commute, so
 * the gradient — and therefore every weight and every score — is
 * bit-identical across partitionings and across engines. The driver
 * holds (dim+1) doubles per iteration; each iteration is ONE
 * map-side-combined aggregation over the feature projection
 * (localCheckpointed once, so the loop never re-reads upstream lineage).
 *
 * The link is the rational "fast sigmoid" 0.5 + 0.5*z/(1+|z|) rather
 * than 1/(1+exp(-z)): division/abs are correctly-rounded IEEE ops with
 * identical results in every engine, while exp() is libm-dependent and
 * can flip the floor() at truncation boundaries. It is a valid monotone
 * link (logistic-family shape, same decision boundary structure); the
 * trainer is gradient descent on its squared-margin surrogate.
 *
 * Scale bounds: the scaled gradient sums need n * 1e9 < 2^63 — ~9e9
 * rows per executor-global sum. Beyond that, shard the fold (long
 * partials per shard, BigInt combine) exactly as Pca documents.
 */
object Classifier {

  /** CAST('…' AS DOUBLE) literal: string→double parses correctly-rounded
    * in both Spark (Java parseDouble) and DuckDB (strtod), so the
    * embedded weight is the exact driver double. */
  private def dlit(d: Double): String = s"CAST('$d' AS DOUBLE)"

  /** z = (w0*f0) + (w1*f1) + … + (b) — explicit parens pin the
    * left-to-right addition order in both engines. */
  private def zText(ws: Seq[String], fs: Seq[String], b: String): String =
    (ws.zip(fs).map { case (w, f) => s"($w * $f)" } :+ s"($b)")
      .mkString("(", " + ", ")")

  /** Rational fast sigmoid; E0 suffixes force double literals in both
    * Spark and DuckDB (plain 0.5 parses as DECIMAL in both). */
  private def sigText(z: String): String =
    s"(0.5E0 + ((0.5E0 * $z) / (1.0E0 + abs($z))))"

  /** Per-row truncated-scaled-long gradient term for feature f. */
  private def gradTermText(sig: String, y: String, f: String): String =
    s"floor((($sig - $y) * $f) * 1e9)"

  /**
   * Trains logistic regression (fast-sigmoid link) by full-batch gradient
   * descent. Returns weights ++ bias (length features.size + 1).
   * Rows with any null feature/label are dropped.
   */
  def trainLogistic(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      lr: Double,
      iters: Int): Array[Double] = {
    val n = features.length
    require(n >= 1 && iters >= 0 && lr > 0, "need >=1 feature, iters >= 0, lr > 0")
    val proj = df.select(
        features.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__f$i") } :+
          label.cast("double").as("__y"): _*)
      .na.drop("any")
      .localCheckpoint()
    // widenIfNarrow: each iteration is one per-row gradient aggregation
    // over this frame; a 1-partition checkpoint would run every round on
    // one core
    val projW = PlanUtil.widenIfNarrow(proj)
    val fs = (0 until n).map(i => s"__f$i")
    val w = Array.fill(n + 1)(0.0) // last slot = bias
    var it = 0
    while (it < iters) {
      val sig = sigText(zText(w.init.toSeq.map(dlit), fs, dlit(w.last)))
      val aggs = (fs :+ "1.0E0").map(f => sum(expr(gradTermText(sig, "__y", f)))) :+
        count(lit(1))
      val row = projW.agg(aggs.head, aggs.tail: _*).head()
      val cnt = row.getLong(n + 1).toDouble
      require(cnt > 0, "no non-null training rows")
      var j = 0
      while (j <= n) {
        // exact mirror of the oracle CTE: (w - lr * ((sum/1e9) / n))
        w(j) = w(j) - lr * ((row.getLong(j).toDouble / 1e9) / cnt)
        j += 1
      }
      it += 1
    }
    w
  }

  /** Scoring column for trained weights over the same feature columns —
    * the Column-tree twin of sigText/zText (identical IEEE op order, so
    * scores match the oracle CTE bit for bit). Pure codegen arithmetic —
    * inline in any projection. */
  def score(weights: Array[Double], features: Seq[Column]): Column = {
    require(weights.length == features.length + 1, "weights = features + bias")
    val z = features.zip(weights.init).map { case (f, w) => lit(w) * f.cast("double") }
      .reduceLeft(_ + _) + lit(weights.last)
    lit(0.5) + ((lit(0.5) * z) / (lit(1.0) + abs(z)))
  }

  /**
   * Unrolled-CTE oracle: the complete training + scoring recomputed in
   * portable SQL (DuckDB-runnable). `featureSqls`/`labelSql` are
   * expressions over `table`'s columns; must be engine-portable
   * (length/replace/least/greatest/arithmetic).
   */
  /** Weight/feature column names for `n` features. */
  private def wfNames(n: Int): (IndexedSeq[String], IndexedSeq[String]) =
    ((0 until n).map(i => s"w$i"), (0 until n).map(i => s"f$i"))

  /** The unrolled training-chain CTE text (it0..itN) shared by every
    * oracle builder: `prefix` namespaces the CTEs (per-fold chains),
    * `fromRel` is the training relation (e.g. a fold-filtered feat).
    * ONE copy of the sig/grad/decimal-fold idiom — the cross-engine
    * exactness contract lives here only. */
  private def iterChainSql(
      wNames: Seq[String], fNames: Seq[String],
      lr: Double, iters: Int, prefix: String, fromRel: String): String = {
    val it0 = s"${prefix}it0 AS (SELECT " +
      (wNames :+ "b").map(c => s"CAST('0.0' AS DOUBLE) AS $c").mkString(", ") + ")"
    val iterCtes = (1 to iters).map { k =>
      val sig = sigText(zText(wNames, fNames, "b"))
      val cols = (wNames.zip(fNames) :+ ("b" -> "1.0E0")).map { case (wn, fn) =>
        val g = s"sum(CAST(${gradTermText(sig, "y", fn)} AS BIGINT))"
        s"($wn - ${dlit(lr)} * ((($g / 1e9)) / count(*))) AS $wn"
      }
      s"${prefix}it$k AS (SELECT ${cols.mkString(", ")} FROM $fromRel CROSS JOIN ${prefix}it${k - 1} " +
        s"GROUP BY ${(wNames :+ "b").mkString(", ")})"
    }
    s"$it0, ${iterCtes.mkString(", ")}"
  }

  def oracleSql(
      table: String,
      idCol: String,
      featureSqls: Seq[String],
      labelSql: String,
      where: String,
      lr: Double,
      iters: Int): String = {
    val (wNames, fNames) = wfNames(featureSqls.length)
    val feat = s"feat AS (SELECT $idCol, " +
      featureSqls.zip(fNames).map { case (e, a) => s"($e) AS $a" }.mkString(", ") +
      s", ($labelSql) AS y FROM $table WHERE $where)"
    val chain = iterChainSql(wNames, fNames, lr, iters, "", "feat")
    val sigF = sigText(zText(wNames, fNames, "b"))
    s"WITH $feat, $chain " +
      s"SELECT $idCol, round($sigF, 6) AS score, " +
      s"CASE WHEN $sigF > 0.5E0 THEN 1 ELSE 0 END AS pred " +
      s"FROM feat CROSS JOIN it$iters ORDER BY $idCol"
  }

  /** Evaluation metrics over a (score DOUBLE rounded 6, y DOUBLE 0/1)
    * relation named `scored` — shared verbatim by the Spark query and
    * the DuckDB oracle so every double op has the identical shape.
    * AUC via the tie-aware Mann-Whitney rank statistic (average ranks
    * are exact dyadic halves, so the double sum is order-independent);
    * Brier through the decimal fold. The global rank is DECOMPOSED
    * (binned-rank discipline): scores are 6-decimal-rounded, so binning
    * on the DECIMAL score (never the raw double product, whose
    * boundary-landing values are the q676-class cross-engine flip
    * surface) is an exact, engine-identical bin key; rank =
    * cumulative count of strictly-lower bins (a <=1001-row window) plus a
    * PARTITIONed within-bin rank — no corpus-cardinality single-partition
    * WindowExec at any scale. Ties share a score, hence a bin, so rank()
    * semantics are preserved exactly. */
  val evalSelectSql: String =
    """WITH sb AS (SELECT score, y,
      |    floor(cast(score as decimal(10,6)) * 1000) AS sbin FROM scored),
      |sbc AS (SELECT sbin, cast(count(*) as bigint) AS c FROM sb GROUP BY sbin),
      |sbo AS (SELECT sbin, sum(c) OVER (ORDER BY sbin) - c AS base FROM sbc),
      |r AS (SELECT sb.score, sb.y,
      |    sbo.base + rank() OVER (PARTITION BY sb.sbin ORDER BY sb.score) AS rk,
      |    count(*) OVER (PARTITION BY sb.score) AS cs
      |  FROM sb JOIN sbo ON sbo.sbin = sb.sbin),
      |agg AS (SELECT
      |    sum(CASE WHEN y = 1.0 THEN (2 * rk + cs - 1) / 2.0 ELSE 0.0 END) AS sr,
      |    cast(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) as bigint) AS p,
      |    cast(sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) as bigint) AS nn,
      |    cast(sum(CASE WHEN score > 0.5 AND y = 1.0 THEN 1 ELSE 0 END) as bigint) AS tp,
      |    cast(sum(CASE WHEN score > 0.5 AND y = 0.0 THEN 1 ELSE 0 END) as bigint) AS fp,
      |    cast(sum(CASE WHEN score <= 0.5 AND y = 0.0 THEN 1 ELSE 0 END) as bigint) AS tn,
      |    cast(sum(CASE WHEN score <= 0.5 AND y = 1.0 THEN 1 ELSE 0 END) as bigint) AS fn,
      |    sum(cast(round((score - y) * (score - y), 12) as decimal(27,12))) AS bs,
      |    cast(count(*) as bigint) AS n
      |  FROM r)
      |SELECT
      |  round((sr - cast(p as double) * (p + 1) / 2.0) / (cast(p as double) * nn), 6) + 0.0 AS auc,
      |  tp, fp, tn, fn,
      |  round((tp + tn) / cast(n as double), 6) + 0.0 AS accuracy,
      |  (cast(((2 * cast(bs * 1000000000000 as bigint) + (1000000 * n)) - ((2 * cast(bs * 1000000000000 as bigint) + (1000000 * n)) % (2 * (1000000 * n)))) / (2 * (1000000 * n)) as bigint) / cast(1000000 as double)) + 0.0 AS brier
      |FROM agg""".stripMargin

  /**
   * Binned (histogram) AUC — the at-scale path the exact rank AUC in
   * [[evalSelectSql]] cannot take: one map-side-combined groupBy over
   * `bins` score buckets (no global sort, no global window), then the
   * trapezoidal area over the cumulative TPR/FPR curve computed on the
   * <= bins-row histogram. Error vs exact AUC is bounded by the within-
   * bin tie mass (~1/bins for a continuous score distribution); at 4096
   * bins on a 6-decimal score it is usually exact to 4+ decimals.
   *
   * Input: DataFrame with a score column in [0,1] and a 0/1 label
   * column. Output: one row (auc double).
   */
  def binnedAuc(scored: DataFrame, scoreCol: String, labelCol: String,
                bins: Int = 4096): DataFrame = {
    require(bins >= 2, "bins >= 2")
    val b = least(lit(bins - 1), greatest(lit(0),
      floor(col(scoreCol).cast("double") * bins).cast("int"))).as("__b")
    val hist = scored.select(b, col(labelCol).cast("double").as("__y"))
      .groupBy("__b")
      .agg(sum(when(col("__y") === 1.0, 1L).otherwise(0L)).as("__p"),
        sum(when(col("__y") === 1.0, 0L).otherwise(1L)).as("__n"))
    // cumulative counts DESC by bin (high scores first), then trapezoid:
    // sum over bins of dFPR * (TPR_prev + TPR_cur) / 2 — the window runs
    // over <= `bins` rows, metadata-sized at any data scale
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__b").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = hist.agg(sum("__p").as("__tp"), sum("__n").as("__tn")).head()
    val (tp, tn) = (totals.getLong(0), totals.getLong(1))
    require(tp > 0 && tn > 0, "binned AUC needs both classes present")
    hist
      .withColumn("__cp", sum(col("__p")).over(w))
      .withColumn("__cn", sum(col("__n")).over(w))
      .withColumn("__tpr", col("__cp").cast("double") / tp)
      .withColumn("__fpr", col("__cn").cast("double") / tn)
      .withColumn("__tprPrev", coalesce(
        lag(col("__tpr"), 1).over(org.apache.spark.sql.expressions.Window.orderBy(col("__b").desc)),
        lit(0.0)))
      .withColumn("__fprPrev", coalesce(
        lag(col("__fpr"), 1).over(org.apache.spark.sql.expressions.Window.orderBy(col("__b").desc)),
        lit(0.0)))
      .agg(sum((col("__fpr") - col("__fprPrev")) *
        (col("__tpr") + col("__tprPrev")) / 2.0).as("auc"))
  }

  /**
   * Reliability curve (calibration diagram) + expected calibration error
   * over the same (score rounded 6, y 0/1) `scored` relation as
   * [[evalSelectSql]]. Equal-FREQUENCY (decile) bins — the standard
   * reliability binning, and the one that stays informative when a
   * lightly-trained classifier's scores cluster in a narrow band where
   * equal-width bins collapse to one. Bin cuts are the nine interpolated
   * deciles (`cutsSelect` supplies the engine's exact-percentile
   * aggregate: Spark `percentile`, DuckDB `quantile_cont` — identical
   * p*(n-1) interpolation, the q152-proven cross-engine pair); assignment
   * is a broadcast comparison against 9 constants, and the bin aggregate
   * is ONE map-side-combined groupBy over <= 10 groups. Per bin: count,
   * decimal-folded mean predicted score, empirical positive rate, |gap|;
   * ECE is the count-weighted mean gap. Everything after the cuts is
   * shared verbatim by both engines.
   */
  def reliabilitySelectSql(cutsSelect: String): String = {
    // compare in exact micro-units against the integer cuts
    val binExpr = (1 to 9).map(j =>
        s"(CASE WHEN cast(round(score * 1000000) as bigint) > c$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""cuts AS ($cutsSelect),
       |b AS (SELECT cast($binExpr as int) AS bin,
       |    cast(round(score, 6) as decimal(18,6)) AS s6, y
       |  FROM scored CROSS JOIN cuts),
       |g AS (SELECT bin, cast(count(*) as bigint) AS n,
       |    sum(s6) AS ssum,
       |    cast(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) as bigint) AS pos
       |  FROM b GROUP BY bin),
       |e AS (SELECT (cast(((2 * cast(sum(abs(ssum - pos)) * 1000000 as bigint) + sum(n)) - ((2 * cast(sum(abs(ssum - pos)) * 1000000 as bigint) + sum(n)) % (2 * sum(n)))) / (2 * sum(n)) as bigint) / cast(1000000 as double)) + 0.0 AS ece FROM g)
       |SELECT bin, n,
       |  (cast(((2 * cast(ssum * 1000000 as bigint) + n) - ((2 * cast(ssum * 1000000 as bigint) + n) % (2 * n))) / (2 * n) as bigint) / cast(1000000 as double)) + 0.0 AS mean_score,
       |  (cast(((2 * pos * 1000000 + n) - ((2 * pos * 1000000 + n) % (2 * n))) / (2 * n) as bigint) / cast(1000000 as double)) + 0.0 AS pos_rate,
       |  (cast(((2 * cast(abs(ssum - pos) * 1000000 as bigint) + n) - ((2 * cast(abs(ssum - pos) * 1000000 as bigint) + n) % (2 * n))) / (2 * n) as bigint) / cast(1000000 as double)) + 0.0 AS gap,
       |  e.ece AS ece
       |FROM g CROSS JOIN e ORDER BY bin""".stripMargin
  }

  /**
   * Fold-partitioned twin of [[evalSelectSql]] for cross-validated
   * evaluation: expects a `scored_all(fold, score, y)` relation (one row
   * per HELD-OUT document, scored by the model trained on the other
   * folds) and emits one metric row per fold — same tie-aware rank AUC /
   * confusion / decimal-folded Brier, windows and groups partitioned by
   * fold. Shared verbatim by both engines. Rank decomposed per
   * [[evalSelectSql]]: a fold is still corpus/k rows, so the per-fold
   * rank runs PARTITIONed by (fold, score-bin) plus a bins-sized
   * cumulative offset window.
   */
  val cvEvalSelectSql: String =
    """sb AS (SELECT fold, score, y,
      |    floor(cast(score as decimal(10,6)) * 1000) AS sbin FROM scored_all),
      |sbc AS (SELECT fold, sbin, cast(count(*) as bigint) AS c
      |  FROM sb GROUP BY fold, sbin),
      |sbo AS (SELECT fold, sbin,
      |    sum(c) OVER (PARTITION BY fold ORDER BY sbin) - c AS base FROM sbc),
      |r AS (SELECT sb.fold, sb.score, sb.y,
      |    sbo.base + rank() OVER (PARTITION BY sb.fold, sb.sbin
      |      ORDER BY sb.score) AS rk,
      |    count(*) OVER (PARTITION BY sb.fold, sb.score) AS cs
      |  FROM sb JOIN sbo ON sbo.fold = sb.fold AND sbo.sbin = sb.sbin),
      |agg AS (SELECT fold,
      |    sum(CASE WHEN y = 1.0 THEN (2 * rk + cs - 1) / 2.0 ELSE 0.0 END) AS sr,
      |    cast(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) as bigint) AS p,
      |    cast(sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) as bigint) AS nn,
      |    cast(sum(CASE WHEN score > 0.5 AND y = 1.0 THEN 1 ELSE 0 END) as bigint) AS tp,
      |    cast(sum(CASE WHEN score > 0.5 AND y = 0.0 THEN 1 ELSE 0 END) as bigint) AS fp,
      |    cast(sum(CASE WHEN score <= 0.5 AND y = 0.0 THEN 1 ELSE 0 END) as bigint) AS tn,
      |    cast(sum(CASE WHEN score <= 0.5 AND y = 1.0 THEN 1 ELSE 0 END) as bigint) AS fn,
      |    sum(cast(round((score - y) * (score - y), 12) as decimal(27,12))) AS bs,
      |    cast(count(*) as bigint) AS n
      |  FROM r GROUP BY fold)
      |SELECT fold,
      |  round((sr - cast(p as double) * (p + 1) / 2.0) / (cast(p as double) * nn), 6) + 0.0 AS auc,
      |  tp, fp, tn, fn,
      |  round((tp + tn) / cast(n as double), 6) + 0.0 AS accuracy,
      |  (cast(((2 * cast(bs * 1000000000000 as bigint) + (1000000 * n)) - ((2 * cast(bs * 1000000000000 as bigint) + (1000000 * n)) % (2 * (1000000 * n)))) / (2 * (1000000 * n)) as bigint) / cast(1000000 as double)) + 0.0 AS brier
      |FROM agg ORDER BY fold""".stripMargin

  /**
   * Full DuckDB oracle for k-fold CROSS-VALIDATED evaluation: one
   * unrolled training chain per fold (each FROM the other folds), scores
   * on the held-out fold, union into `scored_all`, then
   * [[cvEvalSelectSql]]. `foldSql` must be an engine-portable integer
   * expression in [0, nFolds).
   */
  def oracleCvEvalSql(
      table: String,
      idCol: String,
      featureSqls: Seq[String],
      labelSql: String,
      where: String,
      lr: Double,
      iters: Int,
      foldSql: String,
      nFolds: Int): String = {
    val (wNames, fNames) = wfNames(featureSqls.length)
    val feat = s"feat AS (SELECT $idCol, ($foldSql) AS fold, " +
      featureSqls.zip(fNames).map { case (e, a) => s"($e) AS $a" }.mkString(", ") +
      s", ($labelSql) AS y FROM $table WHERE $where)"
    val sigF = sigText(zText(wNames, fNames, "b"))
    val perFold = (0 until nFolds).map { f =>
      (iterChainSql(wNames, fNames, lr, iters, s"cv${f}_",
          s"(SELECT * FROM feat WHERE fold <> $f) feat"),
        s"SELECT $f AS fold, round($sigF, 6) AS score, y FROM " +
          s"(SELECT * FROM feat WHERE fold = $f) feat CROSS JOIN cv${f}_it$iters")
    }
    val chains = perFold.map(_._1).mkString(", ")
    val union = perFold.map(_._2).mkString(" UNION ALL ")
    s"WITH $feat, $chains, scored_all AS ($union), " + cvEvalSelectSql
  }

  /**
   * Histogram-binning calibration FIX (Zadrozny & Elkan): learn the
   * decile-bin -> empirical-positive-rate map on fold 0, apply it to
   * fold 1, and report before/after ECE and Brier on the held-out fold —
   * the remedy for the miscalibration the reliability curve (q273)
   * measures. Expects `cal_scored(fold, score, y)`; `percentileFn` is the
   * engine's exact-percentile aggregate (Spark `percentile`, DuckDB
   * `quantile_cont`). Unseen bins fall back to 0.5. Everything after the
   * cuts is shared verbatim by both engines; all folds are
   * decimal-folded.
   */
  def calibrationFixSelectSql(percentileFn: String): String = {
    val cuts = (1 to 9).map(j => exactCutSql(percentileFn, j))
      .mkString("SELECT ", ", ", " FROM cal_scored WHERE fold = 0")
    val binExpr = (1 to 9).map(j =>
        s"(CASE WHEN cast(round(score * 1000000) as bigint) > c$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""cuts AS ($cuts),
       |binned AS (SELECT fold, cast($binExpr as int) AS bin,
       |    cast(round(score, 6) as decimal(18,6)) AS s6, y
       |  FROM cal_scored CROSS JOIN cuts),
       |map0 AS (SELECT bin,
       |    (cast(((2 * sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) * 1000000 + count(*)) - ((2 * sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) * 1000000 + count(*)) % (2 * count(*)))) / (2 * count(*)) as bigint) / cast(1000000 as double)) AS calib
       |  FROM binned WHERE fold = 0 GROUP BY bin),
       |ev AS (SELECT b.bin, b.s6, b.y,
       |    cast(coalesce(m.calib, 0.5) as decimal(18,6)) AS cal
       |  FROM binned b LEFT JOIN map0 m ON m.bin = b.bin
       |  WHERE b.fold = 1),
       |g AS (SELECT bin, cast(count(*) as bigint) AS n,
       |    sum(s6) AS ssum, sum(cal) AS csum,
       |    cast(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) as bigint) AS pos,
       |    sum(cast(round((cast(s6 as double) - y) * (cast(s6 as double) - y), 12)
       |      as decimal(27,12))) AS bs_raw,
       |    sum(cast(round((cast(cal as double) - y) * (cast(cal as double) - y), 12)
       |      as decimal(27,12))) AS bs_cal
       |  FROM ev GROUP BY bin)
       |SELECT cast(sum(n) as bigint) AS n_eval,
       |  (cast(((2 * cast(sum(abs(ssum - pos)) * 1000000 as bigint) + sum(n)) - ((2 * cast(sum(abs(ssum - pos)) * 1000000 as bigint) + sum(n)) % (2 * sum(n)))) / (2 * sum(n)) as bigint) / cast(1000000 as double)) + 0.0 AS ece_raw,
       |  (cast(((2 * cast(sum(abs(csum - pos)) * 1000000 as bigint) + sum(n)) - ((2 * cast(sum(abs(csum - pos)) * 1000000 as bigint) + sum(n)) % (2 * sum(n)))) / (2 * sum(n)) as bigint) / cast(1000000 as double)) + 0.0 AS ece_cal,
       |  (cast(((2 * cast(sum(bs_raw) * 1000000000000 as bigint) + (1000000 * sum(n))) - ((2 * cast(sum(bs_raw) * 1000000000000 as bigint) + (1000000 * sum(n))) % (2 * (1000000 * sum(n))))) / (2 * (1000000 * sum(n))) as bigint) / cast(1000000 as double)) + 0.0 AS brier_raw,
       |  (cast(((2 * cast(sum(bs_cal) * 1000000000000 as bigint) + (1000000 * sum(n))) - ((2 * cast(sum(bs_cal) * 1000000000000 as bigint) + (1000000 * sum(n))) % (2 * (1000000 * sum(n))))) / (2 * (1000000 * sum(n))) as bigint) / cast(1000000 as double)) + 0.0 AS brier_cal
       |FROM g""".stripMargin
  }

  /** DuckDB oracle for the calibration fix: training chain on fold 0
    * only, scores over ALL rows into `cal_scored`, then
    * [[calibrationFixSelectSql]] with DuckDB's percentile aggregate. */
  def oracleCalibrationFixSql(
      table: String,
      idCol: String,
      featureSqls: Seq[String],
      labelSql: String,
      where: String,
      lr: Double,
      iters: Int,
      foldSql: String): String = {
    val (wNames, fNames) = wfNames(featureSqls.length)
    val feat = s"feat AS (SELECT $idCol, ($foldSql) AS fold, " +
      featureSqls.zip(fNames).map { case (e, a) => s"($e) AS $a" }.mkString(", ") +
      s", ($labelSql) AS y FROM $table WHERE $where)"
    val chain = iterChainSql(wNames, fNames, lr, iters, "",
      "(SELECT * FROM feat WHERE fold = 0) feat")
    val sigF = sigText(zText(wNames, fNames, "b"))
    s"WITH $feat, $chain, " +
      s"cal_scored AS (SELECT fold, round($sigF, 6) AS score, y " +
      s"FROM feat CROSS JOIN it$iters), " +
      calibrationFixSelectSql("quantile_cont")
  }

  /** Exact integer micro-unit decile cut: scores are round-6 doubles, so
    * the interpolated quantile is a 7-decimal rational that can land
    * EXACTLY on a 6-decimal half-boundary (the q676 flip class, here as a
    * bin EDGE — a 1-ulp engine difference moves boundary scores across
    * bins). Interpolating over 10x-micro integers makes the quantile
    * integer-valued (deci-fraction times a multiple of 10), and the final
    * half-up /10 is exact integer arithmetic. */
  private def exactCutSql(fn: String, j: Int): String = {
    val p = s"cast(round($fn(cast(round(score * 1000000) as bigint) * 10," +
      s" cast(0.$j as double))) as bigint)"
    s"cast(((2 * $p + 10) - ((2 * $p + 10) % 20)) / 20 as bigint) AS c$j"
  }

  /** Decile-cut CTE bodies for [[reliabilitySelectSql]] (micro-unit ints). */
  val sparkCutsSelect: String =
    (1 to 9).map(j => exactCutSql("percentile", j))
      .mkString("SELECT ", ", ", " FROM scored")
  val duckdbCutsSelect: String =
    (1 to 9).map(j => exactCutSql("quantile_cont", j))
      .mkString("SELECT ", ", ", " FROM scored")

  /** Full DuckDB oracle for classifier EVALUATION: replays training via
    * the [[oracleSql]] CTE chain, joins the label back, then applies
    * [[evalSelectSql]]. */
  def oracleEvalSql(
      table: String,
      idCol: String,
      featureSqls: Seq[String],
      labelSql: String,
      where: String,
      lr: Double,
      iters: Int): String =
    oracleScoredSql(table, idCol, featureSqls, labelSql, where, lr, iters,
      evalSelectSql.stripPrefix("WITH "))

  /** [[oracleEvalSql]] with the [[reliabilitySelectSql]] calibration block
    * (DuckDB decile cuts). */
  def oracleReliabilitySql(
      table: String,
      idCol: String,
      featureSqls: Seq[String],
      labelSql: String,
      where: String,
      lr: Double,
      iters: Int): String =
    oracleScoredSql(table, idCol, featureSqls, labelSql, where, lr, iters,
      reliabilitySelectSql(duckdbCutsSelect))

  /** [[oracleScoredSql]] variant exposing the id: the tail sees a
    * `scored_id(doc_id, score, y)` relation — for resampling/bootstrap
    * tails that need a per-row hash key. */
  def oracleScoredIdSql(
      table: String,
      idCol: String,
      featureSqls: Seq[String],
      labelSql: String,
      where: String,
      lr: Double,
      iters: Int,
      tailSql: String): String = {
    val trained = oracleSql(table, idCol, featureSqls, labelSql, where, lr, iters)
    val body = trained.stripPrefix("WITH ")
    val noOrder = body.substring(0, body.lastIndexOf(" ORDER BY "))
    val selStart = noOrder.lastIndexOf("SELECT ")
    val ctes = noOrder.substring(0, selStart).trim.stripSuffix(",")
    val finalSel = noOrder.substring(selStart)
    s"WITH $ctes, sc0 AS ($finalSel), " +
      s"scored_id AS (SELECT sc0.$idCol AS doc_id, sc0.score, feat.y " +
      s"FROM sc0 JOIN feat ON sc0.$idCol = feat.$idCol), " +
      tailSql
  }

  /** Replays training via the [[oracleSql]] CTE chain, joins the label
    * back into a `scored` relation, then applies `tailSql` (a CTE-list +
    * final SELECT with the leading WITH already stripped). */
  private def oracleScoredSql(
      table: String,
      idCol: String,
      featureSqls: Seq[String],
      labelSql: String,
      where: String,
      lr: Double,
      iters: Int,
      tailSql: String): String = {
    val trained = oracleSql(table, idCol, featureSqls, labelSql, where, lr, iters)
    // strip the leading WITH and the trailing ORDER BY; reuse the CTE
    // chain, add the label join and the shared eval block
    val body = trained.stripPrefix("WITH ")
    val noOrder = body.substring(0, body.lastIndexOf(" ORDER BY "))
    val selStart = noOrder.lastIndexOf("SELECT ")
    val ctes = noOrder.substring(0, selStart).trim.stripSuffix(",")
    val finalSel = noOrder.substring(selStart)
    s"WITH $ctes, sc0 AS ($finalSel), " +
      s"scored AS (SELECT sc0.score, feat.y FROM sc0 JOIN feat ON sc0.$idCol = feat.$idCol), " +
      tailSql
  }
}
