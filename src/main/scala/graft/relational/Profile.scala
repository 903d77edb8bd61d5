package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-scan column profiling (the ANALYZE/data-quality report a curation
 * pipeline runs before trusting a new drop): per column — non-null count,
 * distinct count, min/max — plus the table row count, all from a single
 * aggregation over one scan. The wide 1-row aggregate is then unpivoted
 * with stack().
 *
 * Distinct counts default to the deterministic HLL sketch
 * ([[graft.pipeline.HllDistinctAgg]], 256 bytes of state per column): at
 * 100 TB a per-column exact `count(DISTINCT)` is an expand-shuffle whose
 * width multiplies by the column count, while the sketch keeps the whole
 * profile one map-side-combinable pass. `exactDistinct = true` opts back
 * into exact counts for small tables.
 */
object Profile {

  private def hllCol(c: String) = graft.internal.exprColumn(
    graft.pipeline.HllDistinctAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(
        graft.internal.columnExpr(col(c)),
        org.apache.spark.sql.types.StringType)).toAggregateExpression())

  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c)).cast("double") else hllCol(c))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr = cols
      .map(c => s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c")
      .mkString(s"stack(${cols.size}, ", ", ", ") AS (col_name, non_null, n_distinct, min_val, max_val)")
    one.selectExpr("__n AS n_rows", stackExpr)
      .select(col("col_name"), col("n_rows"), col("non_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  // ----------------------------------------------------------- rule audit

  /**
   * Constraint-suite audit (the Great-Expectations/Deequ-style gate a
   * pipeline runs before publishing a table). Each rule is a (name,
   * violation-predicate) pair; ALL rules evaluate in ONE aggregation over
   * one scan (conditional sums with map-side partials), then unpivot to a
   * long (check, violations, total, pass) report. Compose with
   * [[uniquenessCheck]] / [[referentialCheck]] by unionByName — all three
   * emit the same schema.
   */
  def audit(
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    // rule sums AND any declared unique-key distinct counts fold into the
    // SAME single-scan aggregation: a separate uniquenessCheck would re-read
    // the table once per key (q233 measured the extra scans at ~2x)
    val aggs = rules.map { case (n, c) =>
      sum(when(c, 1L).otherwise(0L)).as(s"__v_$n")
    } ++ uniqueKeys.map { case (n, cols) =>
      (count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*)).as(s"__v_$n")
    }
    val allNames = rules.map(_._1) ++ uniqueKeys.map(_._1)
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr = allNames.map(n => s"'$n', __v_$n")
      .mkString(s"stack(${allNames.size}, ", ", ", ") AS (check_name, violations)")
    one.selectExpr("__n", stackExpr)
      .select(col("check_name"), col("violations"), col("__n").as("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Duplicate-key count for a declared unique key (0 = constraint holds). */
  def uniquenessCheck(df: DataFrame, keyCols: Seq[String], name: String): DataFrame =
    df.agg(count(lit(1)).as("__n"),
        countDistinct(col(keyCols.head), keyCols.tail.map(col): _*).as("__d"))
      .select(lit(name).as("check_name"), (col("__n") - col("__d")).as("violations"),
        col("__n").as("total"), (col("__n") === col("__d")).as("pass"))

  /**
   * Referential-integrity check: child rows whose key has no parent.
   * Distributed shape: ONE scan of the child — LEFT OUTER join its key
   * column against the deduped parent key set (broadcastable for dimension
   * tables) with a hit marker, then total and orphan counts come from the
   * same aggregation (the former anti-join + separate count() read the
   * child twice); the child table never collects.
   */
  def referentialCheck(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val parentKeys = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("__hit", lit(1))
    child.select(col(childKey))
      .join(parentKeys, Seq(childKey), "left")
      .agg(count(lit(1)).as("total"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
  }
}
