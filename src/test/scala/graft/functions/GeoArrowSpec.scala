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

  test("st_partsdump fourth list level: multipolygon area/perimeter keep part boundaries") {
    setup()
    // part 1: 10x10 with a 2x2 hole; part 2: disjoint 4x4.
    // flattening to a ringdump would subtract part 2's exterior as a hole
    // (100 - 4 - 16 = 80); the parts encoding must give 100 - 4 + 16 = 112.
    val mp = "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(4 4, 4 6, 6 6, 6 4, 4 4)), ((20 0, 24 0, 24 4, 20 4, 20 0)))"
    val r = Seq(mp).toDF("w").selectExpr("st_geomfromtext(w) AS g")
      .select(
        GeoArrow.multiPolygonArea(expr("st_partsdump(g)")).as("a"),
        GeoArrow.multiPolygonPerimeter(expr("st_partsdump(g)")).as("p"),
        expr("st_area(g)").as("a0"),
        expr("st_perimeter(g)").as("p0"),
        expr("size(st_partsdump(g))").as("nparts"),
        expr("size(st_partsdump(g)[0])").as("nrings0"))
      .collect()(0)
    assert(r.getDouble(0) == 112.0 && r.getDouble(0) == r.getDouble(2))
    assert(r.getDouble(1) == 64.0 && r.getDouble(1) == r.getDouble(3)) // 40 + 8 + 16
    assert(r.getInt(4) == 2 && r.getInt(5) == 2)
    // a plain Polygon dumps as one part (the encoding is total over the
    // areal family), and its parts-area equals the ringdump area
    val p = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    val r2 = Seq(p).toDF("w").selectExpr("st_geomfromtext(w) AS g")
      .select(
        GeoArrow.multiPolygonArea(expr("st_partsdump(g)")).as("a"),
        GeoArrow.polygonArea(expr("st_ringdump(g)")).as("ar"),
        expr("size(st_partsdump(g))").as("np"))
      .collect()(0)
    assert(r2.getDouble(0) == 96.0 && r2.getDouble(0) == r2.getDouble(1))
    assert(r2.getInt(2) == 1)
  }

  test("st_linedump chains: multilinestring total length, linestring as one chain") {
    setup()
    val ml = "MULTILINESTRING ((0 0, 3 4), (10 0, 10 6))"
    val r = Seq(ml).toDF("w").selectExpr("st_geomfromtext(w) AS g")
      .select(
        GeoArrow.multiLineLength(expr("st_linedump(g)")).as("l"),
        expr("st_length(g)").as("l0"),
        expr("size(st_linedump(g))").as("n"))
      .collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getDouble(0) == r.getDouble(1))
    assert(r.getInt(2) == 2)
    val r2 = Seq("LINESTRING (0 0, 3 4, 3 10)").toDF("w")
      .selectExpr("st_geomfromtext(w) AS g")
      .select(GeoArrow.multiLineLength(expr("st_linedump(g)")).as("l"),
        expr("size(st_linedump(g))").as("n"))
      .collect()(0)
    assert(r2.getDouble(0) == 11.0 && r2.getInt(1) == 1)
    // a polygon is not a line-family geometry: dumps to SQL NULL
    val r3 = Seq("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))").toDF("w")
      .selectExpr("st_linedump(st_geomfromtext(w)) AS d").collect()(0)
    assert(r3.isNullAt(0))
  }
}
