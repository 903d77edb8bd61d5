package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-scan column profiling (the ANALYZE/data-quality report a curation
 * pipeline runs before trusting a new drop): per column — non-null count,
 * distinct count, min/max — plus the table row count, all from a single
 * aggregation over one scan (count-distincts expand map-side; no per-column
 * passes). The wide 1-row aggregate is then unpivoted with stack().
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
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
}
