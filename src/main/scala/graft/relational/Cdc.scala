package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture application — the batch MERGE/upsert every lakehouse
 * ingest pipeline runs: fold a change stream (upserts + deletes with a
 * monotone sequence) into a base snapshot; the LATEST change per key wins,
 * a delete tombstone removes the row.
 *
 * Scale shape: one union + one window over the key — a single shuffle on
 * the key column, no join (the base snapshot participates as
 * sequence -inf upserts). Deterministic under concurrent equal sequence
 * numbers via the (seq, op) tie-break (delete beats upsert at the same
 * seq, matching "process deletes last" CDC convention).
 */
object Cdc {

  /**
   * @param base     current snapshot (key + value columns)
   * @param changes  change rows: same value columns + `opCol` ('U' upsert /
   *                 'D' delete) + `seqCol` (monotone change sequence)
   * @return the next snapshot (key + value columns of `base`)
   */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val valueCols = base.columns.filterNot(_ == keyCol).toSeq
    val b = base
      .withColumn(opCol, lit("U"))
      .withColumn(seqCol, lit(Long.MinValue))
      .select(col(keyCol) +: valueCols.map(col) :+ col(opCol) :+ col(seqCol): _*)
    val c = changes
      .select(col(keyCol) +: valueCols.map(col) :+ col(opCol) :+ col(seqCol): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, when(col(opCol) === "D", 1).otherwise(0).desc)
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(col(keyCol) +: valueCols.map(col): _*)
  }

  /**
   * Slowly-changing-dimension type 2 from a change log: each change row
   * becomes a version with [valid_from, valid_to) derived from the NEXT
   * change of the same key; the open version has valid_to NULL and
   * is_current true.
   *
   * Scale shape: one window over (key, order) — a single shuffle on the
   * key, no self-join. `orderCols` must make the ordering total per key
   * (e.g. ts + a unique id) or version boundaries would be nondeterministic.
   */
  def scd2(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
