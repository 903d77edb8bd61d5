package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class LaeaCrsSpec extends AnyFunSuite {
  import Geodesy._
  import CRS._

  private val laea3035 = LambertAzimuthalEqualArea(GRS80, 52.0, 10.0, 4321000.0, 3210000.0)

  test("natural origin maps to the false origin exactly") {
    val (x, y) = laea3035.forward(10.0, 52.0)
    assert(math.abs(x - 4321000.0) < 1e-6 && math.abs(y - 3210000.0) < 1e-6)
  }

  test("EPSG Guidance Note 7-2 worked example (ETRS89-LAEA)") {
    // phi = 50N, lam = 5E => E 3962799.45, N 2999718.85 (method 9820 example)
    val (x, y) = laea3035.forward(5.0, 50.0)
    assert(math.abs(x - 3962799.45) < 0.05, s"E=$x")
    assert(math.abs(y - 2999718.85) < 0.05, s"N=$y")
  }

  test("forward/inverse round-trip sub-mm over the European domain") {
    for (lon <- -10 to 30 by 5; lat <- 35 to 70 by 5) {
      val (x, y) = laea3035.forward(lon, lat)
      val (lo, la) = laea3035.inverse(x, y)
      val (x2, y2) = laea3035.forward(lo, la)
      assert(math.hypot(x2 - x, y2 - y) < 1e-3, s"($lon,$lat)")
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat) -> ($lo,$la)")
    }
  }

  test("the projection is equal-area (quad area matches the authalic closed form)") {
    // planar shoelace of a projected 0.5-degree quad vs the exact
    // ellipsoidal area a^2*(1-e^2)*dLam*(q2-q1)/2 — the defining property
    val ell = GRS80
    val e = ell.e; val e2 = ell.e2
    def q(latDeg: Double): Double = {
      val sp = math.sin(math.toRadians(latDeg))
      (1 - e2) * (sp / (1 - e2 * sp * sp) - (1 / (2 * e)) * math.log((1 - e * sp) / (1 + e * sp)))
    }
    for ((lon, lat) <- Seq((10.0, 52.0), (-5.0, 40.0), (25.0, 65.0))) {
      val d = 0.5
      val corners = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
        .map { case (lo, la) => laea3035.forward(lo, la) }
      var area = 0.0
      for (i <- corners.indices) {
        val (x1, y1) = corners(i); val (x2, y2) = corners((i + 1) % 4)
        area += x1 * y2 - x2 * y1
      }
      area = math.abs(area) / 2
      // ellipsoid quad area = a^2 * dLam * (q(lat2) - q(lat1)) / 2
      // (q carries the (1-e^2) factor already)
      val truth = ell.a * ell.a * math.toRadians(d) * (q(lat + d) - q(lat)) / 2
      assert(math.abs(area - truth) / truth < 2e-4, s"($lon,$lat): planar=$area exact=$truth")
    }
  }

  test("polar aspect: pole at false origin, round-trip, southern hemisphere") {
    val north = LambertAzimuthalEqualArea(WGS84E, 90.0, -40.0, 0.0, 0.0)
    val (px, py) = north.forward(-40.0, 90.0)
    assert(math.hypot(px, py) < 1e-6)
    for (lon <- Seq(-170.0, -40.0, 0.0, 60.0, 179.0); lat <- Seq(45.0, 60.0, 85.0)) {
      val (x, y) = north.forward(lon, lat)
      val (lo, la) = north.inverse(x, y)
      val lonDiff = ((lo - lon) % 360 + 540) % 360 - 180
      assert(math.abs(la - lat) < 1e-9 && math.abs(lonDiff) < 1e-9,
        s"($lon,$lat) -> ($lo,$la)")
    }
    val southPolar = LambertAzimuthalEqualArea(WGS84E, -90.0, 0.0, 0.0, 0.0)
    val (sx, sy) = southPolar.forward(0.0, -70.0)
    val (slo, sla) = southPolar.inverse(sx, sy)
    assert(math.abs(slo - 0.0) < 1e-9 && math.abs(sla + 70.0) < 1e-9)
  }

  test("registry: EPSG:3035/3571/3574 compose through the 4326 hub") {
    val g = Point(5.0, 50.0)
    val p = CRS.transform(g, "EPSG:4326", "EPSG:3035").asInstanceOf[Point]
    assert(math.abs(p.x - 3962799.45) < 0.05 && math.abs(p.y - 2999718.85) < 0.05)
    val back = CRS.transform(p, "EPSG:3035", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(back.x - 5.0) < 1e-7 && math.abs(back.y - 50.0) < 1e-7)
    val arctic = CRS.transform(Point(10.0, 75.0), "EPSG:4326", "EPSG:3574").asInstanceOf[Point]
    val rt = CRS.transform(arctic, "EPSG:3574", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(rt.x - 10.0) < 1e-7 && math.abs(rt.y - 75.0) < 1e-7)
    // projected->projected resolves through the hub
    val cross = CRS.transform(Point(4321000.0, 3210000.0), "EPSG:3035", "EPSG:3857")
    assert(cross != null)
  }

  test("PROJJSON method 9820 dispatch") {
    val json =
      """{"type":"ProjectedCRS","name":"ETRS89-extended / LAEA Europe",
        |"base_crs":{"type":"GeographicCRS","datum":{"type":"GeodeticReferenceFrame",
        |  "name":"ETRS89","ellipsoid":{"name":"GRS 1980","semi_major_axis":6378137,
        |  "inverse_flattening":298.257222101}}},
        |"conversion":{"name":"Europe Equal Area 2001","method":{"name":"Lambert Azimuthal Equal Area",
        |  "id":{"authority":"EPSG","code":9820}},
        |"parameters":[
        |  {"name":"Latitude of natural origin","value":52,"id":{"authority":"EPSG","code":8801}},
        |  {"name":"Longitude of natural origin","value":10,"id":{"authority":"EPSG","code":8802}},
        |  {"name":"False easting","value":4321000,"id":{"authority":"EPSG","code":8806}},
        |  {"name":"False northing","value":3210000,"id":{"authority":"EPSG","code":8807}}]}}""".stripMargin
    CRS.registerProjJson("TEST:LAEA", json)
    val p = CRS.transform(Point(5.0, 50.0), "EPSG:4326", "TEST:LAEA").asInstanceOf[Point]
    assert(math.abs(p.x - 3962799.45) < 0.05 && math.abs(p.y - 2999718.85) < 0.05)
  }
}
