package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.GeoParquet

/**
 * GeoParquet covering-column write + BboxPruningRule: a spatial filter over
 * a geo parquet table must turn into pushed double-range predicates on the
 * bbox struct (visible in the scan's PushedFilters) while returning exactly
 * the rows the spatial predicate selects.
 */
class BboxPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("geoparquet").toFile
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/pts"
    // 1000 points on a line y = x, x in [0, 999]
    val df = spark.range(1000).selectExpr(
      "id", "st_point(cast(id as double), cast(id as double)) AS geometry")
    GeoParquet.write(df, path)
    path
  }

  private def scanString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("written table carries the covering struct") {
    val df = GeoParquet.read(spark, dir)
    assert(df.columns.contains("geometry_bbox"))
    val r = df.selectExpr("min(geometry_bbox.xmin)", "max(geometry_bbox.xmax)").collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 999.0)
  }

  test("st_intersects(geom, lit) derives pushed bbox ranges and keeps exact results") {
    val df = GeoParquet.read(spark, dir)
      .filter("st_intersects(geometry, st_makeenvelope(100.0, 100.0, 110.0, 110.0))")
    val plan = scanString(df)
    assert(plan.contains("PushedFilters") &&
      (plan.contains("xmin") || plan.contains("xmax")), plan)
    assert(df.count() == 11) // 100..110 inclusive (boundary intersects)
  }

  test("st_within(geom, lit) prunes and filters exactly") {
    val df = GeoParquet.read(spark, dir)
      .filter("st_within(geometry, st_makeenvelope(0.0, 0.0, 50.0, 50.0))")
    assert(scanString(df).contains("xmin"))
    assert(df.count() == 49) // strictly inside: 1..49
  }

  test("st_dwithin expands the window by the distance") {
    val df = GeoParquet.read(spark, dir)
      .filter("st_dwithin(geometry, st_point(500.0, 500.0), 7.0)")
    assert(scanString(df).contains("xmax"))
    // |(x,x)-(500,500)| <= 7  =>  |x-500|*sqrt(2) <= 7  =>  x in [496, 504]
    assert(df.count() == 9)
  }

  test("rule is idempotent (no conjunct explosion)") {
    val df = GeoParquet.read(spark, dir)
      .filter("st_intersects(geometry, st_makeenvelope(1.0, 1.0, 2.0, 2.0))")
    val optimized = df.queryExecution.optimizedPlan.toString
    // 4 derived range conjuncts, each exactly once
    assert(optimized.split("xmin").length - 1 <= 2, optimized) // one in GetStructField ref per side
    assert(df.count() == 2)
  }

  test("tables without a covering column are untouched") {
    val plain = spark.range(10).selectExpr("st_point(cast(id as double), 0.0) AS geometry")
    val df = plain.filter("st_intersects(geometry, st_makeenvelope(0.0, -1.0, 5.0, 1.0))")
    assert(df.count() == 6)
  }
}
