package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Inter-annotator agreement for labeled-data QA — the acceptance gate a
 * training-data pipeline runs before trusting human (or model-as-judge)
 * labels. Two classical chance-corrected statistics:
 *
 *   - Cohen's kappa, per rater PAIR, computed on the items the pair
 *     jointly rated (the standard pairwise form);
 *   - Fleiss' kappa over the whole panel (requires a constant number of
 *     ratings per item — enforced loudly).
 *
 * Both are exact-by-construction across engines: every sum is an
 * integer count (or a sum of integer products) aggregated as BIGINT, and
 * the floating-point division happens once, in a single deterministic
 * scalar expression per output row — no order-dependent double folds.
 *
 * Scale shape: Cohen is one equi-join on the item key (fan-out bounded
 * by raters^2 per item) followed by counting aggregations keyed by the
 * pair; Fleiss is two counting aggregations keyed by (item,label) and
 * (label). No driver state, no collect.
 */
object Agreement {

  /**
   * Pairwise Cohen's kappa for every unordered rater pair.
   *
   * Input: one row per rating with (itemCol, raterCol, labelCol); a
   * rater is assumed to rate an item at most once (duplicates would
   * inflate the joint counts — deduplicate upstream if needed).
   *
   * po = agree/n; pe = sum_label c1(l)*c2(l) / n^2, with the marginals
   * c1/c2 taken over the pair's JOINTLY rated items (so raters with
   * disjoint workloads never produce a row).
   *
   * @return (r1, r2, n_items, po, pe, kappa) — one row per pair with
   *         r1 < r2; kappa is null when pe = 1 (degenerate: both raters
   *         constant on the same label).
   */
  def cohenKappa(ann: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val a = ann.select(col(itemCol).as("__it"),
      col(raterCol).as("r1"), col(labelCol).as("l1"))
    val b = ann.select(col(itemCol).as("__it"),
      col(raterCol).as("r2"), col(labelCol).as("l2"))
    val pairs = a.join(b, Seq("__it")).where(col("r1") < col("r2"))
    val joint = pairs.groupBy("r1", "r2")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("l1") === col("l2"), 1L).otherwise(0L)).as("agree"))
    // per-pair marginals over jointly rated items
    val m1 = pairs.groupBy("r1", "r2", "l1").agg(count(lit(1)).as("c1"))
      .withColumnRenamed("l1", "__l")
    val m2 = pairs.groupBy("r1", "r2", "l2").agg(count(lit(1)).as("c2"))
      .withColumnRenamed("l2", "__l")
    val peNum = m1.join(m2, Seq("r1", "r2", "__l"))
      .groupBy("r1", "r2").agg(sum(col("c1") * col("c2")).as("pe_num"))
    joint.join(peNum, Seq("r1", "r2"))
      .select(col("r1"), col("r2"), col("n_items"),
        (col("agree").cast("double") / col("n_items")).as("po"),
        (col("pe_num").cast("double") /
          (col("n_items") * col("n_items"))).as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
  }

  /**
   * Fleiss' kappa over the full panel. Requires every item to carry the
   * same number of ratings n >= 2 (the statistic is undefined otherwise)
   * — violations fail loudly rather than silently averaging.
   *
   * With N items, n ratings each, per-cell counts n_ij and per-label
   * totals C_j = sum_i n_ij:
   *   Pbar = (sum_ij n_ij^2 - N*n) / (N*n*(n-1))
   *   Pe   = sum_j C_j^2 / (N*n)^2
   * Both numerators are exact BIGINT sums; division happens once.
   *
   * @return a single row (n_items, n_raters, p_bar, p_e, kappa); kappa
   *         null when Pe = 1.
   */
  def fleissKappa(ann: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val perItem = ann.groupBy(col(itemCol).as("__it"))
      .agg(count(lit(1)).as("__n"))
    val ns = perItem.select(countDistinct(col("__n")).as("k"),
      min(col("__n")).as("n"), count(lit(1)).as("big_n")).head()
    require(ns.getLong(0) == 1L && ns.getLong(1) >= 2L,
      s"Fleiss' kappa needs a constant >=2 ratings per item; saw " +
        s"${ns.getLong(0)} distinct counts (min ${ns.getLong(1)})")
    val n = ns.getLong(1)
    val bigN = ns.getLong(2)
    val cell = ann.groupBy(col(itemCol).as("__it"), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("nij"))
    val sumSq = cell.agg(sum(col("nij") * col("nij")).as("ss"))
    val labelSq = cell.groupBy("__l").agg(sum(col("nij")).as("cj"))
      .agg(sum(col("cj") * col("cj")).as("cs"))
    sumSq.crossJoin(labelSq)
      .select(
        lit(bigN).as("n_items"), lit(n).as("n_raters"),
        ((col("ss") - lit(bigN * n)).cast("double") /
          lit((bigN * n * (n - 1)).toDouble)).as("p_bar"),
        (col("cs").cast("double") /
          lit((bigN * n).toDouble * (bigN * n).toDouble)).as("p_e"))
      .withColumn("kappa",
        when(col("p_e") < 1.0,
          (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e"))))
  }
}
