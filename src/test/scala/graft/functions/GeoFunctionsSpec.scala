package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom.{WKB, WKT}

/**
 * End-to-end Spark tests of the st_* surface (SQL + DSL), pinned to the
 * reference's documented semantics (SURVEY §2.2-2.3; FIXTURES.md §5).
 */
class GeoFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wkbOf(wkt: String): Array[Byte] = WKB.write(WKT.read(wkt))

  private lazy val fixture = {
    val rows = Seq(
      ("point", wkbOf("POINT (3 4)")),
      ("line", wkbOf("LINESTRING (0 0, 3 0, 3 4)")),
      ("ring", wkbOf("LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)")),
      ("poly", wkbOf("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")),
      ("mpoint", wkbOf("MULTIPOINT ((0 0), (1 1), (2 2))")),
      ("mpoly", wkbOf("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")),
      ("empty", wkbOf("POLYGON EMPTY")),
      ("null", null)
    )
    rows.toDF("id", "geometry")
  }

  private def one(id: String, expr: String): Any =
    fixture.filter($"id" === id).selectExpr(expr).head.get(0)

  test("st_area: shoelace minus holes; 0 for points/lines; null for null/invalid") {
    assert(one("poly", "st_area(geometry)") == 96.0) // 100 - 4
    assert(one("point", "st_area(geometry)") == 0.0)
    assert(one("line", "st_area(geometry)") == 0.0)
    assert(one("mpoly", "st_area(geometry)") == 5.0)
    assert(one("empty", "st_area(geometry)") == 0.0)
    assert(one("null", "st_area(geometry)") == null)
  }

  test("st_length: cartesian; polygon => exterior ring only (geoseries.rs:35-41)") {
    assert(one("line", "st_length(geometry)") == 7.0)
    assert(one("poly", "st_length(geometry)") == 40.0) // exterior only, not hole
    assert(one("point", "st_length(geometry)") == 0.0)
  }

  test("st_x/st_y on points; null for non-points") {
    assert(one("point", "st_x(geometry)") == 3.0)
    assert(one("point", "st_y(geometry)") == 4.0)
    assert(one("line", "st_x(geometry)") == null)
  }

  test("st_geometrytype / st_geomtypeid (GEOS ids, enums.py:4-15)") {
    assert(one("point", "st_geometrytype(geometry)") == "Point")
    assert(one("poly", "st_geomtypeid(geometry)") == 3)
    assert(one("mpoly", "st_geomtypeid(geometry)") == 6)
  }

  test("st_isempty / st_isring / st_numpoints") {
    assert(one("empty", "st_isempty(geometry)") == true)
    assert(one("poly", "st_isempty(geometry)") == false)
    assert(one("ring", "st_isring(geometry)") == true)
    assert(one("line", "st_isring(geometry)") == false)
    assert(one("poly", "st_numpoints(geometry)") == 10)
  }

  test("st_envelope / bbox accessors") {
    assert(one("line", "st_astext(st_envelope(geometry))") == "POLYGON ((0 0, 3 0, 3 4, 0 4, 0 0))")
    assert(one("poly", "st_xmin(geometry)") == 0.0)
    assert(one("poly", "st_xmax(geometry)") == 10.0)
    assert(one("empty", "st_xmin(geometry)") == null)
  }

  test("st_centroid: area-weighted; may fall outside (geoseries.rs:18-21)") {
    val Row(x, y) = fixture.filter($"id" === "point")
      .selectExpr("st_x(st_centroid(geometry)) x", "st_y(st_centroid(geometry)) y").head
    assert(x == 3.0 && y == 4.0)
    // square 10x10 with hole (2,2)-(4,4): x = (100*5 - 4*3)/96 = 488/96
    assert(math.abs(one("poly", "st_x(st_centroid(geometry))").asInstanceOf[Double] - 488.0 / 96) < 1e-9)
  }

  test("st_convexhull degrades below 3 distinct points (geoseries.py:76-90)") {
    assert(one("point", "st_geometrytype(st_convexhull(geometry))") == "Point")
    assert(one("mpoint", "st_geometrytype(st_convexhull(geometry))").toString.startsWith("LineString")
      || one("mpoint", "st_geometrytype(st_convexhull(geometry))") == "LineString") // collinear points
    assert(one("poly", "st_geometrytype(st_convexhull(geometry))") == "Polygon")
  }

  test("st_exteriorring: polygon only, else null (geoseries.rs:43-47)") {
    assert(one("poly", "st_astext(st_exteriorring(geometry))") ==
      "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)")
    assert(one("point", "st_exteriorring(geometry)") == null)
  }

  test("st_dump + explode multiplies rows (geoseries.rs:49-50)") {
    val n = fixture.filter($"id" === "mpoly")
      .select(explode(st.dump($"geometry")).as("part")).count()
    assert(n == 2)
    val single = fixture.filter($"id" === "point")
      .select(explode(st.dump($"geometry")).as("part")).count()
    assert(single == 1)
  }

  test("affine family: translate/rotate/scale/skew through SQL") {
    assert(one("point", "st_astext(st_translate(geometry, 1.0, 2.0))") == "POINT (4 6)")
    assert(one("point", "st_astext(st_affine(geometry, 2.0,0.0,0.0,2.0,0.0,0.0))") == "POINT (6 8)")
    // scale about explicit origin 0,0
    assert(one("point", "st_astext(st_scale(geometry, 2.0, 2.0, '0,0'))") == "POINT (6 8)")
    // rotate 180 about center of a point = identity
    val r = one("point", "st_x(st_rotate(geometry, 180.0))").asInstanceOf[Double]
    assert(math.abs(r - 3.0) < 1e-9)
  }

  test("st_distance row-aligned over two columns (geoseries.rs:141-146)") {
    val df = Seq((wkbOf("POINT (0 0)"), wkbOf("POINT (3 4)"))).toDF("a", "b")
    assert(df.select(st.distance($"a", $"b")).head.getDouble(0) == 5.0)
  }

  test("st_intersects / st_contains / st_within") {
    val df = Seq((wkbOf("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"), wkbOf("POINT (1 1)")))
      .toDF("poly", "pt")
    assert(df.selectExpr("st_contains(poly, pt)").head.getBoolean(0))
    assert(df.selectExpr("st_within(pt, poly)").head.getBoolean(0))
    assert(df.selectExpr("st_intersects(poly, pt)").head.getBoolean(0))
    assert(!df.selectExpr("st_contains(pt, poly)").head.getBoolean(0))
  }

  test("st_simplify Douglas-Peucker keeps endpoints (geoseries.rs:109-116)") {
    val df = Seq(wkbOf("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")).toDF("g")
    assert(df.selectExpr("st_astext(st_simplify(g, 0.1))").head.getString(0) ==
      "LINESTRING (0 0, 4 0)")
  }

  test("st_geodesiclength methods (geoseries.rs:52-58)") {
    val df = Seq(wkbOf("LINESTRING (0 0, 1 0)")).toDF("g")
    val hav = df.selectExpr("st_geodesiclength(g, 'haversine')").head.getDouble(0)
    assert(math.abs(hav - 111195) < 10)
    val vin = df.selectExpr("st_geodesiclength(g, 'vincenty')").head.getDouble(0)
    assert(math.abs(vin - 111319.49) < 1)
  }

  test("st_transform 4326 -> 3857 (ops/proj.rs analog)") {
    val df = Seq(wkbOf("POINT (180 0)")).toDF("g")
    val x = df.selectExpr("st_x(st_transform(g, 'EPSG:4326', 'EPSG:3857'))").head.getDouble(0)
    assert(math.abs(x - 20037508.34) < 0.01)
  }

  test("CRS registry is pluggable: a custom projection works through SQL st_transform") {
    // register a spherical sinusoidal projection (ops/proj.rs 'CRS passed
    // explicitly' analog: any caller-supplied transform plugs in)
    val R = 6371008.8
    graft.geom.CRS.register("EPSG:4326", "CUSTOM:SINU", { case (lon, lat) =>
      (R * math.toRadians(lon) * math.cos(math.toRadians(lat)), R * math.toRadians(lat))
    })
    val df = Seq(wkbOf("POINT (90 60)")).toDF("g")
    val r = df.selectExpr(
      "st_x(st_transform(g, 'EPSG:4326', 'CUSTOM:SINU')) AS x",
      "st_y(st_transform(g, 'EPSG:4326', 'CUSTOM:SINU')) AS y").head
    assert(math.abs(r.getDouble(0) - R * (math.Pi / 2) * 0.5) < 1e-6)
    assert(math.abs(r.getDouble(1) - R * (math.Pi / 3)) < 1e-6)
    // unregistered pair still fails loudly
    val err = intercept[Exception](
      df.selectExpr("st_transform(g, 'EPSG:4326', 'CUSTOM:NOPE')").collect())
    assert(err.getMessage.contains("no CRS transform") ||
      Option(err.getCause).exists(_.getMessage.contains("no CRS transform")))
  }

  test("constructors: st_point / st_geomfromtext / st_makeenvelope") {
    val df = spark.range(1)
    assert(df.selectExpr("st_astext(st_point(1.5, 2.5))").head.getString(0) == "POINT (1.5 2.5)")
    assert(df.selectExpr("st_area(st_makeenvelope(0.0, 0.0, 4.0, 3.0))").head.getDouble(0) == 12.0)
    assert(df.selectExpr("st_astext(st_geomfromtext('POINT (1 2)'))").head.getString(0) == "POINT (1 2)")
    assert(df.selectExpr("st_geomfromtext('not wkt')").head.get(0) == null)
  }

  test("DSL facade mirrors SQL") {
    val df = fixture.filter($"id" === "poly")
    assert(df.select(st.area($"geometry")).head.getDouble(0) == 96.0)
    assert(df.select(st.numPoints($"geometry")).head.getInt(0) == 10)
  }

  test("st_boundary: rings, mod-2 endpoints, empty cases") {
    val df = spark.range(1).toDF("id")
    def wkt(e: String) = df.selectExpr(s"st_astext(st_boundary($e))").head.getString(0)
    assert(wkt("st_makeenvelope(0.0, 0.0, 2.0, 1.0)") ==
      "LINESTRING (0 0, 2 0, 2 1, 0 1, 0 0)")
    // two-ring polygon -> both rings
    assert(wkt("st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))')")
      .startsWith("MULTILINESTRING"))
    // open line -> endpoints; shared interior endpoint cancels (mod 2)
    assert(wkt("st_geomfromtext('LINESTRING (0 0, 5 5)')") == "MULTIPOINT ((0 0), (5 5))")
    assert(wkt("st_geomfromtext('MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))')") ==
      "MULTIPOINT ((0 0), (2 0))")
    // closed line and point boundaries are empty => SQL NULL
    assert(df.selectExpr(
      "st_boundary(st_geomfromtext('LINESTRING (0 0, 1 0, 1 1, 0 0)'))").head.get(0) == null)
    assert(df.selectExpr("st_boundary(st_point(3.0, 4.0))").head.get(0) == null)
  }

  test("st_representativepoint is inside even for concave shapes; st_isvalid; clip") {
    val df = spark.range(1).toDF("id")
    // U-shape whose centroid falls in the notch (outside the polygon)
    val u = "'POLYGON ((0 0, 10 0, 10 10, 7 10, 7 2, 3 2, 3 10, 0 10, 0 0))'"
    assert(!df.selectExpr(
      s"st_contains(st_geomfromtext($u), st_centroid(st_geomfromtext($u)))").head.getBoolean(0),
      "fixture centroid should be outside (else the test proves nothing)")
    assert(df.selectExpr(
      s"st_contains(st_geomfromtext($u), st_representativepoint(st_geomfromtext($u)))").head.getBoolean(0))
    // validity: square with hole valid; hole outside the shell invalid
    assert(df.selectExpr(
      "st_isvalid(st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'))").head.getBoolean(0))
    assert(!df.selectExpr(
      "st_isvalid(st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (20 20, 22 20, 22 22, 20 22, 20 20))'))").head.getBoolean(0))
    // clip keeps the overlapping part only
    val a = df.selectExpr(
      "st_area(st_clipbyrect(st_makeenvelope(0.0, 0.0, 10.0, 10.0), 5.0, 5.0, 20.0, 20.0))").head.getDouble(0)
    assert(a == 25.0, s"clip area $a")
  }

  test("st_buffer: point n-gon invariants, multipoint dissolve, null cases") {
    val df = spark.range(1).toDF("id")
    // default 8 quad segs => 32-gon; area -> pi*r^2 as segs grow
    val a32 = df.selectExpr("st_area(st_buffer(st_point(2.0, 3.0), 10.0))").head.getDouble(0)
    assert(math.abs(a32 - math.Pi * 100) / (math.Pi * 100) < 0.01, s"area $a32")
    val a64 = df.selectExpr("st_area(st_buffer(st_point(2.0, 3.0), 10.0, 16.0))").head.getDouble(0)
    assert(math.abs(a64 - math.Pi * 100) < math.abs(a32 - math.Pi * 100))
    assert(df.selectExpr("st_numpoints(st_buffer(st_point(0.0, 0.0), 1.0))").head.getInt(0) == 33)
    // center and near-boundary containment; dwithin agreement
    assert(df.selectExpr(
      "st_contains(st_buffer(st_point(2.0, 3.0), 10.0), st_point(2.0, 3.0))").head.getBoolean(0))
    assert(!df.selectExpr(
      "st_contains(st_buffer(st_point(2.0, 3.0), 10.0), st_point(13.0, 3.0))").head.getBoolean(0))
    // overlapping multipoint buffers dissolve into one polygon
    val mpArea = df.selectExpr(
      "st_area(st_buffer(st_geomfromtext('MULTIPOINT (0 0, 1 0)'), 2.0))").head.getDouble(0)
    assert(mpArea < 2 * (math.Pi * 4) && mpArea > math.Pi * 4, s"dissolved area $mpArea")
    // line buffer now supported (capsule union, BufferSpec): 2-dim result
    assert(df.selectExpr(
      "st_geomtypeid(st_buffer(st_geomfromtext('LINESTRING (0 0, 1 1)'), 1.0))").head.getInt(0) == 3)
    assert(df.selectExpr("st_buffer(st_point(0.0, 0.0), 0.0)").head.get(0) == null)
  }
}
