package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization — splitting a per-key event stream into
 * sessions whenever the inter-event gap reaches `gap`.
 *
 * Two formulations with identical boundaries:
 *
 *  - [[sessionAggregate]] uses Spark's native `session_window` grouping:
 *    one shuffle on (keys, merged window), works UNCHANGED on a
 *    Structured Streaming frame (watermark + append mode), and benefits
 *    from Spark's session-merge exec. An event extends a session while
 *    its time is at or before current-end = last-time + gap (the merge
 *    is INCLUSIVE at the boundary — verified empirically), i.e. a new
 *    session starts only when the gap EXCEEDS `gap`.
 *
 *  - [[assignIds]] gives every ROW its (key, session_idx) — the shape
 *    downstream feature pipelines need (session_window only yields
 *    aggregates). lag + running sum over one window sort: new_session =
 *    (t - prev_t > gap), session_idx = cumulative sum. Same single
 *    shuffle cost as a SortMergeJoin; boundaries match sessionAggregate
 *    by construction.
 */
object Sessionize {

  /** Per-session aggregate via native session_window (batch + streaming).
    * Emits keys, session_start/session_end (the gap-extended window),
    * n_events, first/last event times. */
  def sessionAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      gap: String): DataFrame =
    df.groupBy(keyCols.map(col) :+ session_window(col(timeCol), gap): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).as("first_event"),
        max(col(timeCol)).as("last_event"))
      .select(keyCols.map(col) ++ Seq(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("first_event"), col("last_event")): _*)

  /**
   * Per-row session ids: appends `session_idx` (0-based per key, in time
   * order). `gapMicros` compares `unix_micros(timeCol)` differences;
   * `tieBreak` makes the sort total when times collide.
   */
  def assignIds(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      gapMicros: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(timeCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val t = unix_micros(col(timeCol))
    val prev = lag(t, 1).over(w)
    df.withColumn("__new",
        when(prev.isNull || (t - prev) > gapMicros, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__new")
  }
}
