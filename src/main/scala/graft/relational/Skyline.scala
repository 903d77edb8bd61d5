package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * 2-D skyline (Pareto frontier, maximize both axes): rows not dominated by
 * any other row — no other row is >= on both coordinates and > on at least
 * one. The multi-criteria "best tradeoffs" operator (Borzsony et al. 2001)
 * that a naive formulation writes as an O(n^2) NOT EXISTS self-join.
 *
 * Physical shape — never O(n^2), never a nested-loop join:
 *  1. PRUNE: bucket x into an equi-width grid (bounds via a broadcast
 *     1-row min/max aggregate — no driver collect). Per-bucket max-y and
 *     its suffix-max over strictly-higher buckets form a tiny (<=
 *     `buckets`-row) broadcast table; any row with y < suffix-max is
 *     dominated by some row in a strictly-higher bucket (strictly greater
 *     x by the bucket boundary) and is dropped. Survivors ~ frontier +
 *     per-bucket stragglers.
 *  2. EXACT: dedupe the pruned set to (x, y) pairs, sort by (x desc,
 *     y desc); a pair is dominated iff the running max of y over STRICTLY
 *     PRIOR rows reaches y (prior rows are exactly x' > x, or x' = x with
 *     y' > y — the dominance candidates, since pairs are distinct). One
 *     window, rows-frame only — exact for any orderable y, no numeric
 *     range frame needed. Surviving pairs semi-join back (broadcast; the
 *     frontier is small) so duplicate frontier rows all survive, matching
 *     the NOT EXISTS definition (equal points dominate neither).
 *
 * The exact pass orders globally on x, but its input is the pruned
 * candidate set, bounded by the frontier size + O(buckets) stragglers —
 * not the table. Null x/y rows are excluded (dominance is undefined).
 */
object Skyline {

  def skyline2(df: DataFrame, xCol: String, yCol: String, buckets: Int = 256): DataFrame = {
    val outCols: Seq[Column] = df.columns.map(col).toSeq
    val x = col(xCol).cast("double")
    val y = col(yCol)
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)

    // ---- prune pass
    val bounds = broadcast(rows.agg(min(x).as("__xmin"), max(x).as("__xmax")))
    val bucketed = rows.crossJoin(bounds)
      .withColumn("__bk",
        least(lit(buckets - 1),
          floor((x - col("__xmin")) /
            ((col("__xmax") - col("__xmin") + lit(1e-9)) / buckets))).cast("long"))
    val bktMax = bucketed.groupBy("__bk").agg(max(y).as("__bmax"))
    val wAbove = Window.orderBy(col("__bk").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val above = bktMax
      .withColumn("__above", max(col("__bmax")).over(wAbove))
      .select(col("__bk"), col("__above"))
    val pruned = bucketed.join(broadcast(above), Seq("__bk"))
      .filter(col("__above").isNull || y >= col("__above"))
      .select(outCols: _*)

    // ---- exact pass over the candidates
    val pairs = pruned.select(col(xCol).as("__sx"), col(yCol).as("__sy")).distinct()
    val wPrev = Window.orderBy(col("__sx").desc, col("__sy").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = pairs
      .withColumn("__mx", max(col("__sy")).over(wPrev))
      .filter(col("__mx").isNull || col("__mx") < col("__sy"))
      .select(col("__sx"), col("__sy"))
    pruned.join(broadcast(frontier),
        col(xCol) === col("__sx") && col(yCol) === col("__sy"), "left_semi")
  }
}
