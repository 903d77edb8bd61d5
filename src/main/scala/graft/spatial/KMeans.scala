package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ST_ClusterKMeans-parity planar k-means (Lloyd), with every step pinned
 * for determinism and cross-engine reproducibility:
 *
 *  - seeding: the k smallest ids' coordinates (no RNG);
 *  - assignment: argmin of squared distance, ties to the smaller cluster
 *    id (a lexicographic least() over (distance, cid) structs — exact
 *    double arithmetic, so every engine orders identically);
 *  - update: per-cluster mean via exact decimal sums, rounded to 9
 *    decimals (partitioning-independent); empty clusters keep their
 *    previous centroid.
 *
 * Scale shape: one codegen'd scan + one tiny k-row aggregate collect per
 * iteration — the only driver state is the k x 2 centroid array (the same
 * shape as Similarity.trainIvfCentroids). Input is localCheckpointed so
 * iterations do not recompute upstream lineage.
 */
object KMeans {

  def cluster(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val pts = graft.pipeline.PlanUtil.widenIfNarrow(
      df.select(col(idCol).cast("long").as("__id"),
          col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
        .filter(col("__x").isNotNull && col("__y").isNotNull)
        .localCheckpoint())
    var cents: Array[(Double, Double)] = pts.orderBy("__id").limit(k)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    require(cents.length == k, s"need at least $k rows to seed $k clusters")

    def assignExpr(cs: Array[(Double, Double)]): Column = {
      val structs = cs.zipWithIndex.map { case ((cx, cy), i) =>
        struct(
          ((col("__x") - cx) * (col("__x") - cx) +
           (col("__y") - cy) * (col("__y") - cy)).as("d"),
          lit(i).as("c"))
      }
      (if (structs.length == 1) structs.head else least(structs: _*)).getField("c")
    }

    var it = 0
    while (it < iters) {
      val cur = cents
      val means = pts.withColumn("__c", assignExpr(cur))
        .groupBy("__c").agg(
          round(sum(col("__x").cast("decimal(28,9)")).cast("double") / count(lit(1)), 9).as("mx"),
          round(sum(col("__y").cast("decimal(28,9)")).cast("double") / count(lit(1)), 9).as("my"))
        .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
      it += 1
    }
    pts.withColumn("cluster", assignExpr(cents))
      .select(col("__id").as(idCol), col("cluster"))
  }
}
