package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class SinusoidalSpec extends AnyFunSuite {
  import CRS._

  private val modis = Sinusoidal(WGS84E, Some(Geodesy.WGS84_A), 0, 0, 0)
  private val modisTrue = Sinusoidal(WGS84E, Some(ModisSphereR), 0, 0, 0)
  private val ellip = Sinusoidal(WGS84E, None, 0, 0, 0)

  test("MODIS grid bounds: x(180,0) = R*pi, y(_,90) = R*pi/2") {
    val (xMax, _) = modisTrue.forward(180.0, 0.0)
    assert(math.abs(xMax - ModisSphereR * math.Pi) < 1e-6)
    assert(math.abs(xMax - 20015109.354) < 1e-2) // the published MODIS bound
    val (_, yMax) = modisTrue.forward(0.0, 90.0)
    assert(math.abs(yMax - ModisSphereR * math.Pi / 2) < 1e-6)
    assert(math.abs(yMax - 10007554.677) < 1e-2)
  }

  test("spherical round-trip sub-mm world-wide") {
    for (lon <- -170 to 170 by 20; lat <- -80 to 80 by 10) {
      val (x, y) = modisTrue.forward(lon, lat)
      val (lo, la) = modisTrue.inverse(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("ellipsoidal round-trip sub-mm world-wide") {
    for (lon <- -170 to 170 by 40; lat <- -85 to 85 by 5) {
      val (x, y) = ellip.forward(lon, lat)
      val (lo, la) = ellip.inverse(x, y)
      val (x2, y2) = ellip.forward(lo, la)
      assert(math.hypot(x2 - x, y2 - y) < 1e-3, s"($lon,$lat)")
    }
  }

  test("equal-area: spherical quad matches R^2*dLam*(sin(lat2)-sin(lat1))") {
    val r = ModisSphereR
    for ((lon, lat) <- Seq((0.0, 0.0), (100.0, 45.0), (-60.0, -30.0))) {
      val d = 0.5
      val corners = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
        .map { case (lo, la) => modisTrue.forward(lo, la) }
      var area = 0.0
      for (i <- corners.indices) {
        val (x1, y1) = corners(i); val (x2, y2) = corners((i + 1) % 4)
        area += x1 * y2 - x2 * y1
      }
      area = math.abs(area) / 2
      val truth = r * r * math.toRadians(d) *
        (math.sin(math.toRadians(lat + d)) - math.sin(math.toRadians(lat)))
      assert(math.abs(area - truth) / truth < 2e-4, s"($lon,$lat): $area vs $truth")
    }
  }

  test("ellipsoidal meridian arc: y(0,90) is the quarter meridian") {
    val (_, y) = ellip.forward(0.0, 90.0)
    assert(math.abs(y - 10001965.729) < 1.0, s"y=$y") // WGS84 quarter meridian ~10,001,965.73 m
  }

  test("registry: MODIS and ESRI:54008 compose through the 4326 hub") {
    val p = CRS.transform(Point(100.0, 45.0), "EPSG:4326", "MODIS").asInstanceOf[Point]
    val rt = CRS.transform(p, "MODIS", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(rt.x - 100.0) < 1e-7 && math.abs(rt.y - 45.0) < 1e-7)
    val q = CRS.transform(Point(-60.0, -30.0), "EPSG:4326", "ESRI:54008").asInstanceOf[Point]
    val rtq = CRS.transform(q, "ESRI:54008", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(rtq.x + 60.0) < 1e-7 && math.abs(rtq.y + 30.0) < 1e-7)
  }
}
