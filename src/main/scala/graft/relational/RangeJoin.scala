package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed range (interval) joins without a nested-loop plan.
 *
 * Spark plans a pure inequality join (`p.t BETWEEN i.start AND i.end` with
 * no equi conjunct) as BroadcastNestedLoopJoin — O(n*m) and
 * driver-memory-bound. That is fatal at 100 TB. These operators rewrite the
 * range predicate into an equi-join on a computed BIN key (the 1-D analog
 * of graft.spatial.SpatialJoin.gridJoin):
 *
 *  - points map to exactly ONE bin: floorDiv(t, bin);
 *  - intervals are exploded across every bin they touch
 *    (ceil(len / bin) + 1 replicas — pick `bin` near the typical interval
 *    length so replication stays O(1));
 *  - a plain shuffle equi-join on the bin key meets each point only with
 *    the intervals of its own bin, then the exact BETWEEN refines.
 *
 * Each point lands in one bin, so no post-join dedup is needed (unlike the
 * 2-D grid join where both sides replicate). Skewed bins (a bin holding a
 * large share of points) are handled by Spark AQE skew-join splitting since
 * this IS a standard SortMergeJoin after the rewrite.
 */
object RangeJoin {

  /** Exact floor division in long arithmetic, correct for negative values
    * (unlike integer `div`, which truncates toward 0) AND for the full
    * long range: the exact multiple `c - pmod(c, b)` is divided as
    * DECIMAL, not double, so quotients stay exact beyond 2^53. */
  private def floorDiv(c: Column, b: Long): Column =
    ((c.cast("decimal(38,0)") - pmod(c, lit(b))) / lit(b)).cast("long")

  /**
   * Join point rows to interval rows: pointExpr in [startExpr, endExpr]
   * (inclusive both ends), as an equi shuffle join on bins of width
   * `binSize`. All expressions must evaluate to LONG (cast timestamps with
   * unix_micros). Emits all columns of both inputs; names must not clash.
   */
  def pointInInterval(
      points: DataFrame,
      pointExpr: Column,
      intervals: DataFrame,
      startExpr: Column,
      endExpr: Column,
      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val p = points.withColumn("__pt", pointExpr.cast("long"))
      .withColumn("__bin", floorDiv(col("__pt"), binSize))
    val i = intervals
      .withColumn("__lo", startExpr.cast("long"))
      .withColumn("__hi", endExpr.cast("long"))
      .filter(col("__lo") <= col("__hi"))
      .withColumn("__bin",
        explode(sequence(floorDiv(col("__lo"), binSize), floorDiv(col("__hi"), binSize))))
    p.join(i, Seq("__bin"))
      .filter(col("__pt") >= col("__lo") && col("__pt") <= col("__hi"))
      .drop("__bin", "__pt", "__lo", "__hi")
  }

  /**
   * Interval-overlap join: left intervals [lLo, lHi] x right intervals
   * [rLo, rHi] that overlap (inclusive ends), as an equi shuffle join on
   * bins. Both sides replicate across their touched bins, so each
   * overlapping pair would meet once per shared bin; the reference-bin
   * filter (the bin containing max(lLo, rLo) — the overlap's left edge)
   * keeps exactly one copy WITHOUT a distinct/dedup shuffle. All interval
   * expressions must evaluate to LONG; column names must not clash.
   */
  def intervalOverlap(
      left: DataFrame,
      lLo: Column,
      lHi: Column,
      right: DataFrame,
      rLo: Column,
      rHi: Column,
      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def tag(df: DataFrame, lo: Column, hi: Column, loN: String, hiN: String): DataFrame =
      df.withColumn(loN, lo.cast("long"))
        .withColumn(hiN, hi.cast("long"))
        .filter(col(loN) <= col(hiN))
        .withColumn("__bin",
          explode(sequence(floorDiv(col(loN), binSize), floorDiv(col(hiN), binSize))))
    val l = tag(left, lLo, lHi, "__llo", "__lhi")
    val r = tag(right, rLo, rHi, "__rlo", "__rhi")
    l.join(r, Seq("__bin"))
      .filter(col("__llo") <= col("__rhi") && col("__rlo") <= col("__lhi"))
      .filter(floorDiv(greatest(col("__llo"), col("__rlo")), binSize) === col("__bin"))
      .drop("__bin", "__llo", "__lhi", "__rlo", "__rhi")
  }

  /**
   * Self proximity join: all unordered pairs (a, b), a.id < b.id, with
   * |a.t - b.t| <= tolerance. With binSize = tolerance, side A keeps its
   * single bin and side B is replicated into {bin-1, bin, bin+1}; any
   * within-tolerance pair then shares EXACTLY one join key (A's bin is one
   * value, B's three replica bins are distinct), so no dedup pass is
   * needed — the exact |dt| filter only removes false positives.
   *
   * Used for near-simultaneous event correlation (co-occurring events,
   * burst detection) where a timestamp self-join would otherwise be a
   * cross product.
   */
  def selfProximity(
      df: DataFrame,
      idCol: String,
      timeExpr: Column,
      tolerance: Long,
      leftSuffix: String = "_a",
      rightSuffix: String = "_b"): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val base = df.withColumn("__t", timeExpr.cast("long"))
    val bin = floorDiv(col("__t"), tolerance)
    val a = base.withColumn("__bin", bin)
    val b = base.withColumn("__bin", explode(array(bin - 1, bin, bin + 1)))
    val ar = a.select(col("__bin") +:
      base.columns.map(c => col(c).as(c + leftSuffix)).toSeq: _*)
    val br = b.select(col("__bin") +:
      base.columns.map(c => col(c).as(c + rightSuffix)).toSeq: _*)
    val ta = col("__t" + leftSuffix)
    val tb = col("__t" + rightSuffix)
    ar.join(br, Seq("__bin"))
      .filter(col(idCol + leftSuffix) < col(idCol + rightSuffix))
      .filter(abs(ta - tb) <= tolerance)
      .drop("__bin", "__t" + leftSuffix, "__t" + rightSuffix)
  }
}
