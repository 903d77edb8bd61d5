package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom._

class GeoArrowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def setup(): Unit = GeoRegistry.register(spark)

  test("point struct encode/decode roundtrip and affine chain") {
    setup()
    val df = Seq((1L, 3.0, 4.0), (2L, -2.5, 7.0)).toDF("id", "x", "y")
      .selectExpr("id", "st_point(x, y) AS g")
    val p = GeoArrow.toPointStruct(col("g"))
    val out = df.select(col("id"),
        GeoArrow.translate(GeoArrow.scale(p, lit(2.0), lit(2.0)), lit(1.0), lit(-1.0)).as("q"),
        expr("st_astext(" +
          "st_translate(st_scale(g, 2.0, 2.0, '0,0'), 1.0, -1.0))").as("wkt"),
        GeoArrow.distance(p, GeoArrow.xy(lit(0.0), lit(0.0))).as("d"))
      .collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    val q = r1.getStruct(1)
    assert(q.getDouble(0) == 7.0 && q.getDouble(1) == 7.0)
    assert(r1.getString(2) == "POINT (7 7)")
    assert(r1.getDouble(3) == 5.0)

    // decode boundary: struct -> WKB Point
    val back = df.select(GeoArrow.fromPointStruct(GeoArrow.toPointStruct(col("g"))).as("g2"))
      .collect().map(r => WKB.readOrNull(r.getAs[Array[Byte]]("g2")))
    assert(back.toSet == Set(Point(3, 4), Point(-2.5, 7)))
  }

  test("ringdump area/perimeter with holes matches st_area/st_length") {
    setup()
    // 10x10 square with a 2x2 hole
    val wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
    val df = Seq(wkt).toDF("w").selectExpr("st_geomfromtext(w) AS g")
    val r = df.select(
        GeoArrow.polygonArea(expr("st_ringdump(g)")).as("a"),
        GeoArrow.polygonPerimeter(expr("st_ringdump(g)")).as("p"),
        expr("st_area(g)").as("a0"),
        expr("st_perimeter(g)").as("p0"))
      .collect()(0)
    assert(r.getDouble(0) == 96.0 && r.getDouble(0) == r.getDouble(2))
    assert(r.getDouble(1) == 48.0 && r.getDouble(1) == r.getDouble(3))
  }

  test("st_ringdump is Polygon-only: MultiPolygon dumps to null") {
    setup()
    // the two-level encoding cannot mark part boundaries; a flattened dump
    // would make polygonArea subtract other parts' exteriors as holes
    val mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
    val r = Seq(mp).toDF("w")
      .selectExpr("st_ringdump(st_geomfromtext(w)) AS rings",
        "st_area(st_geomfromtext(w)) AS a")
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 2.0) // st_area itself still sums the parts
  }

  test("lineLength on a coorddump chain matches st_length") {
    setup()
    val wkt = "LINESTRING (0 0, 3 4, 3 10)"
    val df = Seq(wkt).toDF("w").selectExpr("st_geomfromtext(w) AS g")
    val r = df.select(
        GeoArrow.lineLength(expr("st_coorddump(g)")).as("l"),
        expr("st_length(g)").as("l0")).collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getDouble(0) == r.getDouble(1))
  }
}
