package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Physical-shape helpers shared by the pipeline operators. */
object PlanUtil {

  /**
   * Widen a NARROW materialized frame before per-row-heavy or fan-out
   * stages. A frame read from a single file / single parquet row group (or
   * localCheckpointed from one) has 1 partition, and everything computed
   * directly above it — per-row kernels, pair fan-outs, per-iteration
   * aggregations — serializes on one core. Repartitioning such a frame
   * costs one exchange of its (by construction small) data.
   *
   * No-op when the frame already has at least half the cluster's default
   * parallelism: a production-scale input arrives wide, and an
   * unconditional repartition there would be a pointless full shuffle of
   * the corpus. Call this only on materialized (checkpointed) frames —
   * `rdd.getNumPartitions` forces plan execution otherwise.
   */
  def widenIfNarrow(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= want) df else df.repartition(want)
  }
}
