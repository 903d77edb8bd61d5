package graft.spatial

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.{GeoRegistry, GeomAggregates}
import graft.internal.{columnExpr, exprColumn}

/**
 * Distributed dissolve (unary_union of a whole geometry column, reference
 * semantics: py-geopolars docs/source/reference/geoseries.rst:104-112
 * `unary_union` — reserved there, implemented here).
 *
 * A bare `st_union_agg` over one group funnels every partial buffer into a
 * single final reducer that dissolves the whole dataset single-threaded.
 * This operator keeps the dissolve distributed with the grid-cell discipline
 * of [[SpatialJoin.gridJoin]]:
 *
 *  1. one tiny aggregation computes the global envelope-center bbox
 *     (4 doubles to the driver);
 *  2. each geometry is assigned to ONE grid cell by its envelope center —
 *     a geometry is never duplicated, so no clip/de-dup step is needed;
 *  3. `groupBy(cell)` dissolves WITHIN each cell across the cluster
 *     (cells^2 reducers work in parallel; partial buffers still pre-dissolve
 *     map-side every 64 geometries);
 *  4. the final `st_union_agg` merges the <= cells^2 per-cell results —
 *     bounded by the grid, not the input row count. Cell results that share
 *     no overlap concatenate for free inside Union.union's
 *     connected-overlap-component grouping; only geometry that genuinely
 *     crosses a cell boundary pays a real merge.
 *
 * At 100 TB: size `cells` so a cell's dissolved boundary fits a reducer
 * (cells ~ sqrt(input partitions) is a good default); the final stage's
 * input stays cells^2 rows regardless of input size.
 */
object Dissolve {

  private def unionAggCol(c: Column): Column =
    exprColumn(GeomAggregates.UnionAgg(columnExpr(c)).toAggregateExpression())

  /**
   * Dissolve `geomCol` (WKB) per `groupCols` (globally when empty) via the
   * two-stage grid plan. Output: `groupCols` + `union_geom` (WKB).
   */
  def unionAll(
      df: DataFrame,
      geomCol: String,
      groupCols: Seq[String] = Nil,
      cells: Int = 16): DataFrame = {
    require(cells >= 1, "cells must be >= 1")
    val spark = df.sparkSession
    GeoRegistry.register(spark)

    val cx = (expr(s"st_xmin($geomCol)") + expr(s"st_xmax($geomCol)")) / 2.0
    val cy = (expr(s"st_ymin($geomCol)") + expr(s"st_ymax($geomCol)")) / 2.0
    val bboxRow = df.agg(
      min(cx).as("x0"), max(cx).as("x1"),
      min(cy).as("y0"), max(cy).as("y1")).head()
    if (bboxRow.isNullAt(0)) {
      // no non-empty geometry: one null result per group (empty when grouped)
      return if (groupCols.isEmpty)
        df.sparkSession.range(1).select(lit(null).cast("binary").as("union_geom"))
      else
        df.groupBy(groupCols.map(col): _*).agg(unionAggCol(col(geomCol)).as("union_geom"))
    }
    val (x0, x1, y0, y1) =
      (bboxRow.getDouble(0), bboxRow.getDouble(1), bboxRow.getDouble(2), bboxRow.getDouble(3))
    val sx = if (x1 > x0) (x1 - x0) else 1.0
    val sy = if (y1 > y0) (y1 - y0) else 1.0
    val ix = least(greatest(floor((cx - lit(x0)) / lit(sx) * cells), lit(0.0)), lit((cells - 1).toDouble))
    val iy = least(greatest(floor((cy - lit(y0)) / lit(sy) * cells), lit(0.0)), lit((cells - 1).toDouble))
    val cell = (ix * cells + iy).cast("long")

    val g = groupCols.map(col)
    val perCell = df
      .withColumn("__cell", cell)
      .groupBy(g :+ col("__cell"): _*)
      .agg(unionAggCol(col(geomCol)).as("__u"))
    if (groupCols.isEmpty)
      perCell.agg(unionAggCol(col("__u")).as("union_geom"))
    else
      perCell.groupBy(g: _*).agg(unionAggCol(col("__u")).as("union_geom"))
  }
}
