package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Local Outlier Factor (Breunig et al. 2000), exact k-NN variant over an
 * embedding corpus: per point the k nearest by round-9-pinned squared
 * euclidean (precomputed norms + one dot per pair), k-distance,
 * reachability distance, local reachability density, and the LOF ratio —
 * every aggregation decimal-folded and every ranking id-tie-broken so a
 * SQL oracle replays the chain bit-exactly.
 *
 * Why an operator and not the SQL text the oracle runs: the kNN relation
 * feeds THREE consumers (k-distance, lrd, and the final ratio join), and
 * Spark inlines WITH-CTEs — the measured plan ran the 4M-pair
 * join + sort + window pipeline four times (14.5 s at sf0.1). The
 * localCheckpoints below materialize kNN (and lrd, used twice) exactly
 * once: 14.5 s -> ~4 s, and at 100 TB "materialize the kNN graph, then
 * run the cheap joins" is the only sane plan (with the cross join
 * replaced by IVF-candidate neighborhoods — Similarity's at-scale path —
 * exactly as the q51/q302 exact-twin precedent documents).
 */
object Outliers {

  def lof(emb: DataFrame, idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    TextRegistry.register(emb.sparkSession)
    // widenIfNarrow: a single-row-group parquet checkpoint is 1 partition,
    // which would compute all n^2 pair distances in one task (measured
    // 5.5 s of the query's 6.3 s); wide inputs pass through untouched
    val pts = PlanUtil.widenIfNarrow(
      emb.selectExpr(s"$idCol AS id", s"$vecCol AS v",
          s"vec_dot($vecCol, $vecCol) AS n2")
        .localCheckpoint()) // materialize norms once (and stop inlining)
    val d = pts.as("a").join(pts.as("b"), col("b.id") =!= col("a.id"))
      .selectExpr("a.id AS ia", "b.id AS ib",
        "round(a.n2 - 2 * vec_dot(a.v, b.v) + b.n2, 9) AS d2")
    val knn = d
      .withColumn("rk", row_number().over(
        Window.partitionBy("ia").orderBy(col("d2"), col("ib"))))
      .filter(col("rk") <= k)
      .select("ia", "ib", "d2")
      .localCheckpoint() // ONE pair-join + window, three consumers below
    val kd = knn.groupBy(col("ia").as("id")).agg(max("d2").as("kdist"))
    val lrd = knn.join(kd, knn("ib") === kd("id"))
      .groupBy(knn("ia").as("id"))
      .agg(expr(s"round(cast($k.0 as double) / cast(sum(cast(round(" +
        "greatest(kdist, d2), 9) as decimal(25,9))) as double), 9)").as("lrd"))
      .localCheckpoint() // used on both sides of the ratio join
    val la = lrd.select(col("id").as("la_id"), col("lrd").as("la"))
    val lb = lrd.select(col("id").as("lb_id"), col("lrd").as("lb"))
    knn.join(la, knn("ia") === la("la_id"))
      .join(lb, knn("ib") === lb("lb_id"))
      .groupBy(col("ia").as("id"), col("la"))
      .agg(expr("round(cast(sum(cast(round(lb, 9) as decimal(25,9))) as double)" +
        s" / ($k * la), 6) + 0.0").as("lof"))
      .select("id", "lof")
  }
}
