package graft.spatial

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GeoRegistry

class DissolveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("grouped dissolve: chained boxes collapse to one rectangle per group") {
    GeoRegistry.register(spark)
    // group g: boxes [i*0.5, i*0.5+1] x [0,1] for i in 0..19 -> one 10.5x1 rect
    val df = spark.range(200).selectExpr(
      "id % 10 AS g",
      "st_makeenvelope(cast((id div 10) * 0.5 as double), 0.0, " +
        "cast((id div 10) * 0.5 + 1.0 as double), 1.0) AS geom")
    val out = Dissolve.unionAll(df, "geom", groupCols = Seq("g"), cells = 4)
      .selectExpr("g", "round(st_area(union_geom), 9) AS a",
        "st_numgeometries(union_geom) AS parts")
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getDouble(1) == 19 * 0.5 + 1.0, s"group ${r.getLong(0)}")
      assert(r.getInt(2) == 1, s"group ${r.getLong(0)} parts")
    }
  }

  test("api dissolve facade: global union keeps the geometry column name") {
    GeoRegistry.register(spark)
    val df = spark.range(40).selectExpr(
      "st_makeenvelope(cast(id * 0.5 as double), 0.0, " +
        "cast(id * 0.5 + 1.0 as double), 1.0) AS geometry")
    val g = graft.api.GeoDataFrame(df).dissolve()
    val r = g.df.selectExpr("round(st_area(geometry), 9) AS a").collect()
    assert(r.length == 1 && r(0).getDouble(0) == 39 * 0.5 + 1.0)
  }

  test("empty and all-null inputs") {
    GeoRegistry.register(spark)
    val empty = spark.range(0).selectExpr("st_point(0.0, 0.0) AS geom")
    assert(Dissolve.unionAll(empty, "geom").collect()(0).isNullAt(0))
    val nulls = spark.range(5).selectExpr("cast(null as binary) AS geom")
    assert(Dissolve.unionAll(nulls, "geom").collect()(0).isNullAt(0))
  }
}
