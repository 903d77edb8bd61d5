package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def one(sql: String) = spark.sql(s"SELECT $sql AS v").head().get(0)

  test("slippy reference points: z0 world, z1 quadrants, Greenwich z12") {
    assert(one("st_tilex(st_point(0.0, 0.0), 0)") == 1L - 1L)
    assert(one("st_tiley(st_point(0.0, 0.0), 0)") == 0L)
    // (0,0) sits on the z1 seam -> tile (1,1) by the floor convention
    assert(one("st_tilex(st_point(0.0, 0.0), 1)") == 1L)
    assert(one("st_tiley(st_point(0.0, 0.0), 1)") == 1L)
    assert(one("st_tilex(st_point(-180.0, 0.0), 1)") == 0L)
    // z12: lon 0 -> 2048, lat 51.5 (London-ish) -> 1362 (the classic example)
    assert(one("st_tilex(st_point(0.0, 51.5), 12)") == 2048L)
    assert(one("st_tiley(st_point(0.0, 51.5), 12)") == 1362L)
  }

  test("quadkey: z1 quadrants, digit reconstruction, prefix property") {
    // z1: digit = 2*yBit + xBit -> NW=0, NE=1, SW=2, SE=3
    assert(one("st_quadkey(st_point(-170.0, 80.0), 1)") == "0")
    assert(one("st_quadkey(st_point(170.0, 80.0), 1)") == "1")
    assert(one("st_quadkey(st_point(-170.0, -80.0), 1)") == "2")
    assert(one("st_quadkey(st_point(170.0, -80.0), 1)") == "3")
    // digits reconstruct from the tile indices at z12 (London example)
    val qk = one("st_quadkey(st_point(0.0, 51.5), 12)").toString
    val (tx, ty) = (2048L, 1362L)
    val expect = (11 to 0 by -1).map(k => 2 * ((ty >> k) & 1) + ((tx >> k) & 1)).mkString
    assert(qk == expect)
    // prefix property: every ancestor key prefixes the z12 key
    for (z <- 1 to 11)
      assert(qk.startsWith(one(s"st_quadkey(st_point(0.0, 51.5), $z)").toString))
    // invalid: zoom 0 has no digits; non-points null
    assert(one("st_quadkey(st_point(0.0, 0.0), 0)") == null)
    assert(one("st_quadkey(st_makeenvelope(0.0, 0.0, 1.0, 1.0), 5)") == null)
  }

  test("clamping: poles and the antimeridian stay in range") {
    for (z <- Seq(1, 6, 12)) {
      val n = (1L << z) - 1
      assert(one(s"st_tiley(st_point(0.0, 90.0), $z)") == 0L)
      assert(one(s"st_tiley(st_point(0.0, -90.0), $z)") == n)
      assert(one(s"st_tilex(st_point(180.0, 0.0), $z)") == n) // clamped east edge
    }
  }

  test("tile envelope: world at z0, quadrant at z1, point containment") {
    val b = 20037508.342789244
    val r = spark.sql(
      """SELECT st_xmin(e) AS x0, st_ymin(e) AS y0, st_xmax(e) AS x1, st_ymax(e) AS y1
        |FROM (SELECT st_tileenvelope(0, 0, 0) AS e)""".stripMargin).head()
    assert(r.getDouble(0) == -b && r.getDouble(2) == b)
    assert(r.getDouble(1) == -b && r.getDouble(3) == b)
    val q = spark.sql(
      """SELECT st_xmin(e) AS x0, st_ymax(e) AS y1
        |FROM (SELECT st_tileenvelope(1, 1, 1) AS e)""".stripMargin).head()
    assert(q.getDouble(0) == 0.0 && q.getDouble(1) == 0.0)
    // a point's own tile contains its 3857 image (interior point)
    val ok = spark.sql(
      """SELECT st_contains(
        |  st_tileenvelope(8, st_tilex(p, 8), st_tiley(p, 8)),
        |  st_transform(p, 'EPSG:4326', 'EPSG:3857')) AS c
        |FROM (SELECT st_point(13.3, 52.5) AS p)""".stripMargin).head().getBoolean(0)
    assert(ok)
  }

  test("invalid input: bad zoom or out-of-range tile -> null; non-point -> null") {
    assert(one("st_tilex(st_point(0.0, 0.0), 31)") == null)
    assert(one("st_tileenvelope(4, 16, 0)") == null)
    assert(one("st_tileenvelope(-1, 0, 0)") == null)
    assert(one("st_tilex(st_geomfromtext('LINESTRING (0 0, 1 1)'), 4)") == null)
  }
}
