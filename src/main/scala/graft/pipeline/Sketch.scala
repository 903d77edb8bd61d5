package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  def hllDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame =
    hllFromBuckets(hllBuckets(df, keyCol, groupCols), groupCols)

  /** The mergeable sketch STATE: max rank per (group, bucket). A single
    * streaming-legal aggregation — maintain it incrementally (update/
    * complete mode) and finish with hllFromBuckets whenever an estimate
    * is needed; max() makes merging across batches/partitions exact. */
  def hllBuckets(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    val (bucket, rank) = parts(col(keyCol))
    val g = groupCols.map(col)
    // null keys are ignored (count-distinct semantics; also keeps the
    // estimate identical to the HllDistinctAgg SQL aggregate, which
    // skips nulls) — without this a null key would occupy a phantom
    // bucket and inflate n_buckets_used. Caveat: a group whose EVERY
    // key is null has no surviving rows, so it is absent here, while
    // the UDAF (groupBy semantics) emits it with estimate 0.0
    df.filter(col(keyCol).isNotNull)
      .withColumn("__b", bucket).withColumn("__r", rank)
      .groupBy(g :+ col("__b"): _*)
      .agg(max(col("__r")).as("__rmax"))
  }

  /** Finishing fold over hllBuckets state (batch-side, tiny input). */
  def hllFromBuckets(perBucket: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
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

  /** The same computation as portable SQL (shared by tests/oracles);
    * null keys excluded like hllBuckets / HllDistinctAgg. */
  def hllSql(table: String, keyCol: String, groupCol: String): String =
    // recomposed from the two building blocks so the md5 layout and the
    // bias-correction constants exist in exactly one place each
    hllEstimateSql(s"(${hllBucketStateSql(table, keyCol, groupCol)}) hst", groupCol)

  /** Oracle building block: the per-(group, bucket) max-rank state CTE
    * body over `table` (same md5 layout as [[hllBuckets]]) — compose
    * rolling/merged estimates from it with [[hllEstimateSql]]. */
  def hllBucketStateSql(table: String, keyCol: String, groupCol: String): String =
    s"""SELECT $groupCol, bucket, max(rank) AS rmax
       |FROM (
       |  SELECT $groupCol,
       |    cast(('0x' || substr(md5(cast($keyCol as varchar)), 1, 2))::BIGINT as int) AS bucket,
       |    cast(CASE WHEN chunk = 0 THEN 61 ELSE 61 - length(bin(chunk)) END as int) AS rank
       |  FROM (
       |    SELECT $groupCol, $keyCol,
       |      ('0x' || substr(md5(cast($keyCol as varchar)), 3, 15))::BIGINT AS chunk
       |    FROM $table WHERE $keyCol IS NOT NULL))
       |GROUP BY $groupCol, bucket""".stripMargin

  /** Oracle building block: the finishing estimate over a
    * `(groupCol, bucket, rmax)` relation (twin of [[hllFromBuckets]]). */
  def hllEstimateSql(bucketsRel: String, groupCol: String): String =
    s"""SELECT $groupCol,
       |  round(CASE WHEN raw <= ${2.5 * M} AND n_buckets_used < $M
       |             THEN $M.0 * ln($M.0 / ($M - n_buckets_used))
       |             ELSE raw END, 4) + 0.0 AS hll_estimate,
       |  n_buckets_used
       |FROM (
       |  SELECT $groupCol,
       |    ${Alpha * M * M} / (sum(power(2.0, -rmax)) + ($M - count(*))) AS raw,
       |    cast(count(*) as int) AS n_buckets_used
       |  FROM $bucketsRel
       |  GROUP BY $groupCol)""".stripMargin

  /** Ungrouped variant of [[hllSql]]: a scalar subquery computing the
    * whole-table estimate for one key expression (oracle building block
    * for Profile.profile's sketch-distinct default). */
  def hllScalarSql(table: String, keyExpr: String): String =
    s"""(SELECT round(CASE WHEN raw <= ${2.5 * M} AND n_buckets_used < $M
       |             THEN $M.0 * ln($M.0 / ($M - n_buckets_used))
       |             ELSE raw END, 4) + 0.0
       |FROM (
       |  SELECT ${Alpha * M * M} / (sum(power(2.0, -rmax)) + ($M - count(*))) AS raw,
       |    cast(count(*) as int) AS n_buckets_used
       |  FROM (
       |    SELECT bucket, max(rank) AS rmax
       |    FROM (
       |      SELECT
       |        cast(('0x' || substr(md5(cast(k as varchar)), 1, 2))::BIGINT as int) AS bucket,
       |        cast(CASE WHEN chunk = 0 THEN 61
       |             ELSE 61 - length(bin(chunk)) END as int) AS rank
       |      FROM (
       |        SELECT k, ('0x' || substr(md5(cast(k as varchar)), 3, 15))::BIGINT AS chunk
       |        FROM (SELECT $keyExpr AS k FROM $table) WHERE k IS NOT NULL))
       |    GROUP BY bucket)))""".stripMargin

  // ---------------------------------------------------------- Count-Min

  private val CmsDepth = 4
  private val CmsWidth = 256

  /** Depth-row hash: 2 md5 hex digits per row (positions 1,3,5,7) → bucket
    * 0..255. Deterministic and engine-portable like the HLL layout. */
  private def cmsBucket(key: Column, depth: Int): Column =
    conv(substring(md5(key.cast("string")), 1 + 2 * depth, 2), 16, 10).cast("int")

  /**
   * Count-Min sketch (Cormode & Muthukrishnan 2005) frequency table:
   * `CmsDepth` x `CmsWidth` counters built in ONE map-side-combinable
   * aggregation over the raw rows — the shuffle moves at most
   * depth*width rows per partition regardless of input size or key
   * cardinality, which is the whole point at 100 TB: frequency estimates
   * without a per-key shuffle. Returns (depth, bucket, cnt).
   */
  def cmsTable(df: DataFrame, keyCol: String): DataFrame =
    df.select(explode(array((0 until CmsDepth).map { d =>
        struct(lit(d).as("depth"), cmsBucket(col(keyCol), d).as("bucket"))
      }: _*)).as("__e"))
      .select(col("__e.depth").as("depth"), col("__e.bucket").as("bucket"))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))

  /**
   * Point-estimate the frequency of each row of `candidates` (small —
   * distinct keys to interrogate) against a CMS table: min over the
   * depth rows of the key's bucket counter. The sketch side is tiny
   * (depth*width rows) and broadcasts; estimates are one-sided
   * (estimate >= true count, over-count bounded by ~2n/width w.h.p.).
   */
  def cmsEstimate(candidates: DataFrame, cms: DataFrame, keyCol: String): DataFrame = {
    val probes = candidates.select(col(keyCol),
        explode(array((0 until CmsDepth).map { d =>
          struct(lit(d).as("depth"), cmsBucket(col(keyCol), d).as("bucket"))
        }: _*)).as("__e"))
      .select(col(keyCol), col("__e.depth").as("depth"), col("__e.bucket").as("bucket"))
    // LEFT join: a probe that hashes into an untouched counter cell has
    // count 0 there, and the min must see that 0 — an inner join would
    // silently inflate (or drop) keys absent from the sketched data
    probes.join(broadcast(cms), Seq("depth", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /** The CMS estimate per candidate key as portable SQL (tests/oracles).
    * `candSql` must select one column named `keyCol`. */
  def cmsSql(table: String, keyCol: String, candSql: String): String = {
    def bucketSql(d: Int) =
      s"cast(('0x' || substr(md5(cast($keyCol as varchar)), ${1 + 2 * d}, 2))::BIGINT as int)"
    val stack = (0 until CmsDepth)
      .map(d => s"SELECT $d AS depth, ${bucketSql(d)} AS bucket FROM $table")
      .mkString("\nUNION ALL\n")
    val probes = (0 until CmsDepth)
      .map(d => s"SELECT $keyCol, $d AS depth, ${bucketSql(d)} AS bucket FROM ($candSql)")
      .mkString("\nUNION ALL\n")
    s"""SELECT $keyCol, min(coalesce(cnt, 0)) AS cms_estimate
       |FROM ($probes) p
       |LEFT JOIN (SELECT depth, bucket, count(*) AS cnt FROM ($stack) GROUP BY depth, bucket) s
       |USING (depth, bucket)
       |GROUP BY $keyCol""".stripMargin
  }

  // ----------------------------------------------------------- Bloom

  val BloomBits = 16384 // 2^14 => 256 longs
  val BloomHashes = 4

  /** Hash row i of key -> bit position: 4 md5 hex digits per hash
    * (disjoint slices), mod m. Deterministic/portable like HLL + CMS. */
  private def bloomPos(key: Column, i: Int): Column =
    conv(substring(md5(key.cast("string")), 1 + 4 * i, 4), 16, 10)
      .cast("int") % BloomBits

  /**
   * Build the filter's bit words on the driver: one distinct-positions
   * aggregation over the KEY side (at most k*|keys| rows, at most m
   * distinct, so <= 2 KB of longs comes back at m=16384). The key set
   * can itself be arbitrarily large — saturation degrades the FP rate,
   * never correctness.
   */
  def bloomBits(keys: DataFrame, keyCol: String): Array[Long] = {
    // null keys can never match anything — drop them rather than NPE on
    // the null bit positions they'd hash to
    val positions = keys.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until BloomHashes).map { i =>
        bloomPos(col(keyCol), i)
      }: _*)).as("pos")).distinct()
    val words = new Array[Long](BloomBits / 64)
    positions.collect().foreach { r =>
      val p = r.getInt(0)
      words(p / 64) |= (1L << (p % 64))
    }
    words
  }

  /**
   * Membership test column against driver-built words — a pure codegen
   * bit probe (k array reads + masks per row, no join, no shuffle). The
   * 100 TB semi-join pattern: bloom-prune the probe scan down to ~FP%
   * before the exact join ever shuffles anything; false positives are
   * possible (the later exact join removes them), false negatives are
   * not.
   */
  def bloomContains(key: Column, words: Array[Long]): Column =
    (0 until BloomHashes).map { i =>
      val p = bloomPos(key, i)
      call_function("shiftright",
        element_at(typedLit(words), (p / 64).cast("int") + 1), (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** Bloom membership per probe key as portable SQL (tests/oracles):
    * rebuilds the bit set relationally — a probe key passes iff all k of
    * its positions appear in the key side's position set. `keysSql` must
    * select one column named `keyCol`; emits (key, bloom_pass). */
  def bloomSql(probeSql: String, probeKey: String, keysSql: String, keyCol: String): String = {
    def posSql(c: String, i: Int) =
      s"(('0x' || substr(md5(cast($c as varchar)), ${1 + 4 * i}, 4))::BIGINT % $BloomBits)"
    val bits = (0 until BloomHashes)
      .map(i => s"SELECT ${posSql(keyCol, i)} AS pos FROM ($keysSql)")
      .mkString(" UNION ")
    val probes = (0 until BloomHashes)
      .map(i => s"SELECT $probeKey, ${posSql(probeKey, i)} AS pos FROM ($probeSql)")
      .mkString(" UNION ALL ")
    s"""SELECT $probeKey,
       |  (sum(CASE WHEN b.pos IS NULL THEN 1 ELSE 0 END) = 0) AS bloom_pass
       |FROM ($probes) p
       |LEFT JOIN ($bits) b USING (pos)
       |GROUP BY $probeKey""".stripMargin
  }

  // ------------------------------------------------- histogram quantiles

  /**
   * Mergeable equi-width-histogram quantile estimate: two scans (min/max
   * + bin counts), `nBins` longs of state per group — vs the full sort or
   * per-group memory a rank-exact percentile needs (q69). The estimate
   * interpolates uniformly inside the quantile's bin, so error is bounded
   * by one bin width. Deterministic closed-form arithmetic → the same
   * doubles on any engine (hash-exact oracle for an APPROXIMATE sketch).
   *
   * Output: one row per group with `est_q<NN>` per requested quantile.
   */
  def histQuantiles(
      dfRaw: DataFrame,
      valCol: String,
      groupCols: Seq[String],
      qs: Seq[Double],
      nBins: Int = 128): DataFrame = {
    // null measurements are ignored, matching percentile()/quantile_cont
    // semantics — otherwise they'd inflate __n and pollute the first bin
    val df = dfRaw.filter(col(valCol).isNotNull)
    val g = groupCols.map(col)
    val stats = df.groupBy(g: _*).agg(
      min(col(valCol)).cast("double").as("__lo"),
      max(col(valCol)).cast("double").as("__hi"),
      count(lit(1)).as("__n"))
    val w = (col("__hi") - col("__lo")) / nBins
    val bin = when(col("__hi") > col("__lo"),
        least(floor((col(valCol).cast("double") - col("__lo")) / w).cast("int"), lit(nBins - 1)))
      .otherwise(lit(0))
    val withStats =
      if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), groupCols)
    val hist = withStats
      .withColumn("__b", bin)
      .groupBy(g ++ Seq(col("__b"), col("__lo"), col("__hi"), col("__n")): _*)
      .agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(g: _*).orderBy(col("__b"))))
    // the quantile's bin is the unique one with cumBefore < q*n <= cum
    val ests = qs.map { q =>
      val target = lit(q) * col("__n")
      val interp = col("__lo") + ((col("__hi") - col("__lo")) / nBins) *
        (col("__b") + (target - (col("__cum") - col("__c"))) / col("__c"))
      val hit = (col("__cum") - col("__c") < target) && (target <= col("__cum"))
      (round(max(when(hit, interp)), 4) + lit(0.0))
        .as(s"est_q${math.round(q * 100)}")
    }
    cum.groupBy(g: _*).agg(ests.head, ests.tail: _*)
  }

  /** The same computation as portable SQL (shared by tests/oracles). */
  def histQuantilesSql(
      table: String,
      valCol: String,
      groupCol: String,
      qs: Seq[Double],
      nBins: Int = 128): String = {
    val ests = qs.map { q =>
      s"""round(max(CASE WHEN cum - c < $q * n AND $q * n <= cum
         |  THEN lo + ((hi - lo) / $nBins) * (b + ($q * n - (cum - c)) / c) END), 4) + 0.0
         |  AS est_q${math.round(q * 100)}""".stripMargin
    }.mkString(",\n  ")
    s"""SELECT $groupCol, $ests
       |FROM (
       |  SELECT *, sum(c) OVER (PARTITION BY $groupCol ORDER BY b) AS cum
       |  FROM (
       |    SELECT $groupCol, b, lo, hi, n, count(*) AS c
       |    FROM (
       |      SELECT t.$groupCol,
       |        CASE WHEN hi > lo
       |             THEN least(cast(floor((cast($valCol as double) - lo) / ((hi - lo) / $nBins)) as int), ${nBins - 1})
       |             ELSE 0 END AS b,
       |        lo, hi, n
       |      FROM (SELECT * FROM $table WHERE $valCol IS NOT NULL) t
       |      JOIN (SELECT $groupCol, cast(min($valCol) as double) AS lo,
       |                   cast(max($valCol) as double) AS hi, count(*) AS n
       |            FROM $table WHERE $valCol IS NOT NULL GROUP BY $groupCol) s
       |      USING ($groupCol))
       |    GROUP BY $groupCol, b, lo, hi, n))
       |GROUP BY $groupCol""".stripMargin
  }
}
