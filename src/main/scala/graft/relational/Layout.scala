package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data-clustering layout (the OPTIMIZE ZORDER BY of the
 * lakehouse table formats): bucketize each clustering column, Morton-
 * interleave the bucket bits into one Long, and range-partition + sort by
 * that value before writing. Files then hold rows that are close in EVERY
 * clustering dimension, so parquet min/max footer stats prune multi-
 * predicate scans — the layout operation that makes a 100 TB table
 * queryable on dimensions other than its partition key.
 *
 * Scale shape: one tiny min/max aggregation (2·d doubles to the driver),
 * one codegen projection for the z-value (pure Column bit arithmetic —
 * no UDF), and ONE range exchange for the write — identical cost to any
 * global sort. Nothing driver-side grows with the data.
 *
 * Bucketing is equi-width over the observed [min,max] — deterministic and
 * replayable by an external engine (the q259 oracle recomputes it term
 * for term in DuckDB). Equi-DEPTH bucketing (skew-resistant) is available
 * by feeding [[Quantiles.exactPercentiles]] cut points to
 * [[bucketByBounds]]. Morton is the interleave (the Delta/Iceberg
 * default); 2-D Hilbert exists in the FlatGeobuf R-tree writer for the
 * spatial case where its stricter locality pays.
 *
 * Reference capability parity: GeoPolars inherits sorted/partitioned
 * writes from Polars' IO; the spatial analogue here is
 * `sources/GeoParquet` cell partitioning. This operator generalizes that
 * to arbitrary numeric dimensions.
 */
object Layout {

  /**
   * Morton (Z-order) interleave of `d` bucket-id columns, `bits` bits
   * each. Bit k of bucket j lands at interleaved position k*d + j, so
   * column 0 holds the LEAST significant interleaved bit of each round —
   * earlier columns get finer granularity on ties. Pure Column bit
   * arithmetic (bits*d shift/mask/or terms, whole-stage codegen).
   * Requires bits*d <= 62; callers pass bucket ids already in
   * [0, 2^bits) ([[equiWidthBucket]] clamps).
   */
  def mortonInterleave(buckets: Seq[Column], bits: Int): Column = {
    val d = buckets.length
    require(d >= 1, "at least one clustering column")
    require(bits >= 1 && bits * d <= 62, s"bits*d must be <= 62, got ${bits * d}")
    val terms = for {
      (b, j) <- buckets.zipWithIndex
      k <- 0 until bits
    } yield shiftleft(shiftright(b.cast("long"), k).bitwiseAND(lit(1L)), k * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /**
   * Equi-width bucket id in [0, 2^bits) for a value over [mn, mx]
   * (clamped; nulls -> bucket 0 so null rows cluster together at the z
   * origin instead of poisoning the sort). Degenerate range -> bucket 0.
   */
  def equiWidthBucket(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val n = (1L << bits).toDouble
    if (!(mx > mn)) lit(0L)
    else coalesce(
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(n)).cast("long"))),
      lit(0L))
  }

  /**
   * Bucket id from explicit ascending cut points (e.g. exact percentiles
   * from [[Quantiles]] for equi-depth layout): id = number of bounds
   * strictly below the value. bounds.length should be 2^bits - 1.
   */
  def bucketByBounds(c: Column, bounds: Seq[Double]): Column = {
    val v = c.cast("double")
    bounds.map(b => when(v > lit(b), 1L).otherwise(0L))
      .reduceOption((a, b) => a + b).map(coalesce(_, lit(0L))).getOrElse(lit(0L))
  }

  /** Observed (min, max) per column — ONE aggregation, 2·d doubles. */
  def ranges(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"), max(col(c).cast("double")).as(s"__mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      require(!r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1),
        s"clustering column '${cols(i)}' has no non-null values " +
          "(empty input or all-null column) — z-order needs an observed range")
      (r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }
  }

  /**
   * df + a `zCol` Long column: equi-width Morton z-value over the
   * observed per-column ranges.
   */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
                 zCol: String = "__z"): DataFrame = {
    val rs = ranges(df, cols)
    val buckets = cols.zip(rs).map { case (c, (mn, mx)) =>
      equiWidthBucket(col(c), mn, mx, bits)
    }
    df.withColumn(zCol, mortonInterleave(buckets, bits))
  }

  /**
   * Z-order clustered write: range-partition on the z-value into
   * ~`numFiles` output tasks, sort within each, write parquet. The range
   * partitioner equalizes FILE SIZES (sampled boundaries); use
   * [[deterministicFile]] when a replayable assignment matters more than
   * balance.
   */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
                  bits: Int = 8, numFiles: Int = 64): Unit = {
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Deterministic equi-z-width file assignment: file = floor(z * numFiles
   * / 2^(bits*d)). Exact in double arithmetic for bits*d <= 52, so an
   * external engine replays it bit-for-bit (q259's oracle does).
   */
  def deterministicFile(z: Column, bits: Int, d: Int, numFiles: Int): Column = {
    require(bits * d <= 52, "z*numFiles must stay double-exact")
    floor(z.cast("double") * numFiles / math.pow(2.0, bits * d)).cast("long")
  }
}
