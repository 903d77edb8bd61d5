package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed cardinality sketching (HyperLogLog, Flajolet et al. 2007)
 * with a DETERMINISTIC cross-engine hash: buckets and ranks derive from
 * md5 of the key, so the estimate is bit-reproducible on any engine —
 * unlike `approx_count_distinct`, whose xxhash64-based sketch is
 * Spark-internal. Used for cheap distinct counts over 100 TB key sets
 * (one aggregation, 256 longs of state per group, map-side combinable).
 *
 * Layout: p = 8 (m = 256 buckets). bucket = first 8 md5 bits; rank =
 * leading-zero count of the next 60 bits + 1 (all-zero chunk => 61).
 * Estimate = alpha_m * m^2 / (sum 2^-rank + empty buckets), with the
 * standard linear-counting correction below 2.5 m. Everything is exact
 * integer/bit arithmetic until the final harmonic sum, which both
 * engines compute in IEEE doubles.
 */
object Sketch {

  private val M = 256
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  /** bucket + rank columns for a (string-castable) key expression. */
  private def parts(key: Column): (Column, Column) = {
    val hex = md5(key.cast("string"))
    val bucket = conv(substring(hex, 1, 2), 16, 10).cast("int")
    val chunk = conv(substring(hex, 3, 15), 16, 10).cast("long")
    val rank = when(chunk === 0L, lit(61))
      .otherwise(lit(61) - length(bin(chunk))).cast("int")
    (bucket, rank)
  }

  /**
   * HLL distinct-count estimate of `keyCol` per group (all rows in one
   * group when `groupCols` is empty). Emits `hll_estimate` (rounded to 4
   * decimals for cross-engine stability) next to `n_buckets_used`.
   * Two-phase: (group, bucket) max-rank aggregation — map-side partials —
   * then the harmonic fold per group.
   */
  def hllDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    val (bucket, rank) = parts(col(keyCol))
    val g = groupCols.map(col)
    val perBucket = df
      .withColumn("__b", bucket).withColumn("__r", rank)
      .groupBy(g :+ col("__b"): _*)
      .agg(max(col("__r")).as("__rmax"))
    perBucket
      .groupBy(g: _*)
      .agg(
        sum(pow(lit(2.0), -col("__rmax"))).as("__hsum"),
        count(lit(1)).cast("int").as("n_buckets_used"))
      .withColumn("__raw",
        lit(Alpha * M * M) / (col("__hsum") + (lit(M) - col("n_buckets_used"))))
      .withColumn("hll_estimate",
        round(when(col("__raw") <= 2.5 * M && col("n_buckets_used") < M,
            lit(M.toDouble) * log(lit(M.toDouble) / (lit(M) - col("n_buckets_used"))))
          .otherwise(col("__raw")), 4) + lit(0.0))
      .drop("__hsum", "__raw")
  }

  /** The same computation as portable SQL (shared by tests/oracles). */
  def hllSql(table: String, keyCol: String, groupCol: String): String =
    s"""SELECT $groupCol,
       |  round(CASE WHEN raw <= ${2.5 * M} AND n_buckets_used < $M
       |             THEN $M.0 * ln($M.0 / ($M - n_buckets_used))
       |             ELSE raw END, 4) + 0.0 AS hll_estimate,
       |  n_buckets_used
       |FROM (
       |  SELECT $groupCol,
       |    ${Alpha * M * M} / (sum(power(2.0, -rmax)) + ($M - count(*))) AS raw,
       |    cast(count(*) as int) AS n_buckets_used
       |  FROM (
       |    SELECT $groupCol, bucket, max(rank) AS rmax
       |    FROM (
       |      SELECT $groupCol,
       |        cast(('0x' || substr(md5(cast($keyCol as varchar)), 1, 2))::BIGINT as int) AS bucket,
       |        cast(CASE WHEN chunk = 0 THEN 61 ELSE 61 - length(bin(chunk)) END as int) AS rank
       |      FROM (
       |        SELECT $groupCol, $keyCol,
       |          ('0x' || substr(md5(cast($keyCol as varchar)), 3, 15))::BIGINT AS chunk
       |        FROM $table))
       |    GROUP BY $groupCol, bucket)
       |  GROUP BY $groupCol)""".stripMargin
}
