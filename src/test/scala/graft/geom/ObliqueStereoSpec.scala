package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Oblique (double) Stereographic — EPSG method 9809 (Guidance Note 7-2),
  * the RD New / Amersfoort projection: the guidance note's worked example,
  * defining invariants, and registry/proj4/PROJJSON dispatch. */
class ObliqueStereoSpec extends AnyFunSuite {
  import CRS._

  // RD New defining parameters (EPSG:28992): Bessel 1841, origin at the
  // Amersfoort church tower, k0 = 0.9999079, FE/FN = 155000/463000
  private val rd = ObliqueStereographic(Bessel1841,
    lat0 = 52.15616055555555, lon0 = 5.38763888888889,
    k0 = 0.9999079, x0 = 155000, y0 = 463000)

  test("EPSG GN 7-2 worked example: 53N 6E -> 196105.283 E, 557057.739 N") {
    val (x, y) = rd.forward(6.0, 53.0)
    assert(math.abs(x - 196105.283) < 0.01, s"E was $x")
    assert(math.abs(y - 557057.739) < 0.01, s"N was $y")
    val (lon, lat) = rd.inverse(196105.283, 557057.739)
    assert(math.abs(lon - 6.0) < 1e-7 && math.abs(lat - 53.0) < 1e-7)
  }

  test("origin maps to the false origin; scale k0 at the origin") {
    val (x, y) = rd.forward(5.38763888888889, 52.15616055555555)
    assert(math.abs(x - 155000.0) < 1e-6 && math.abs(y - 463000.0) < 1e-6)
    // local scale at the origin = k0 (numeric east-west derivative)
    val d = 1e-5
    val (x2, _) = rd.forward(5.38763888888889 + d, 52.15616055555555)
    val phi = math.toRadians(52.15616055555555)
    val nu = Bessel1841.a / math.sqrt(1 - Bessel1841.e2 * math.sin(phi) * math.sin(phi))
    val k = (x2 - x) / (math.toRadians(d) * nu * math.cos(phi))
    assert(math.abs(k - 0.9999079) < 1e-6, s"scale at origin was $k")
  }

  test("forward/inverse roundtrip sub-mm over the Dutch domain and beyond") {
    for (lon <- Seq(3.2, 5.4, 7.2, 10.0); lat <- Seq(50.7, 52.2, 53.5, 55.0)) {
      val (x, y) = rd.forward(lon, lat)
      val (lon2, lat2) = rd.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("EPSG:28992 registry: WGS84 round-trip through projection + datum legs") {
    val p = CRS.transform(Point(5.0, 52.0), "EPSG:4326", "EPSG:28992").asInstanceOf[Point]
    // sanity: central Netherlands lands inside the RD usage envelope
    assert(p.x > 0 && p.x < 300000 && p.y > 280000 && p.y < 640000, s"$p")
    val back = CRS.transform(p, "EPSG:28992", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(back.x - 5.0) < 1e-7 && math.abs(back.y - 52.0) < 1e-7)
  }

  test("proj4 +proj=sterea and PROJJSON method 9809 dispatch") {
    val (fwd, _) = CRS.fromProj4(
      "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 " +
        "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    val direct = rd.forward(6.0, 53.0)
    assert(fwd((6.0, 53.0)) == direct)
    val json =
      """{"type":"ProjectedCRS","name":"RD New",
        |"base_crs":{"datum":{"ellipsoid":{"semi_major_axis":6377397.155,"inverse_flattening":299.1528128}}},
        |"conversion":{"method":{"name":"Oblique Stereographic","id":{"authority":"EPSG","code":9809}},
        |"parameters":[
        |  {"name":"Latitude of natural origin","value":52.15616055555555,"id":{"authority":"EPSG","code":8801}},
        |  {"name":"Longitude of natural origin","value":5.38763888888889,"id":{"authority":"EPSG","code":8802}},
        |  {"name":"Scale factor at natural origin","value":0.9999079,"id":{"authority":"EPSG","code":8805}},
        |  {"name":"False easting","value":155000,"id":{"authority":"EPSG","code":8806}},
        |  {"name":"False northing","value":463000,"id":{"authority":"EPSG","code":8807}}]}}""".stripMargin
    CRS.registerProjJson("TEST:RD", json)
    val viaJson = CRS.transform(Point(6.0, 53.0), "EPSG:4326", "TEST:RD").asInstanceOf[Point]
    assert(math.abs(viaJson.x - direct._1) < 1e-9 && math.abs(viaJson.y - direct._2) < 1e-9)
  }
}
