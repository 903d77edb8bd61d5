package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Polar Stereographic (Snyder §21 / EPSG 9829+9810): defining
  * invariants — pole maps to the false origin, unit scale on the standard
  * parallel, sub-mm roundtrips, axis orientation — plus proj4/PROJJSON
  * registry dispatch for the EPSG:3031/3413/5041/5042 family. */
class PolarStereoSpec extends AnyFunSuite {
  import CRS._

  private val antarctic = PolarStereographic(WGS84E, south = true,
    latTs = -71, k = 1.0, lon0 = 0, x0 = 0, y0 = 0)
  private val nsidcN = PolarStereographic(WGS84E, south = false,
    latTs = 70, k = 1.0, lon0 = -45, x0 = 0, y0 = 0)
  private val upsN = PolarStereographic(WGS84E, south = false,
    latTs = 90, k = 0.994, lon0 = 0, x0 = 2000000, y0 = 2000000)

  test("pole maps to the false origin exactly") {
    val (sx, sy) = antarctic.forward(123.0, -90.0)
    assert(math.abs(sx) < 1e-9 && math.abs(sy) < 1e-9)
    val (ux, uy) = upsN.forward(-77.0, 90.0)
    assert(math.abs(ux - 2000000) < 1e-9 && math.abs(uy - 2000000) < 1e-9)
  }

  test("unit scale on the standard parallel (variant B) / k0 at pole (variant A)") {
    // local scale along the parallel: ratio of projected arc to true
    // parallel arc for a small east-west step
    def parallelScale(p: PolarStereographic, lon: Double, lat: Double): Double = {
      val d = 1e-4
      val (x1, y1) = p.forward(lon, lat)
      val (x2, y2) = p.forward(lon + d, lat)
      val phi = math.toRadians(lat)
      val nu = WGS84E.a / math.sqrt(1 - WGS84E.e2 * math.sin(phi) * math.sin(phi))
      math.hypot(x2 - x1, y2 - y1) / (math.toRadians(d) * nu * math.cos(phi))
    }
    assert(math.abs(parallelScale(antarctic, 30.0, -71.0) - 1.0) < 1e-7)
    assert(math.abs(parallelScale(nsidcN, 100.0, 70.0) - 1.0) < 1e-7)
    // variant A: scale k0 at (near) the pole
    assert(math.abs(parallelScale(upsN, 0.0, 89.999) - 0.994) < 1e-5)
  }

  test("axis orientation follows the EPSG conventions") {
    // south aspect: along lon_0, northing grows POSITIVE away from the pole
    val (_, ySouth) = antarctic.forward(0.0, -80.0)
    assert(ySouth > 0)
    // north aspect: along lon_0, northing is negative (y = -rho cos theta)
    val (xN, yN) = nsidcN.forward(-45.0, 80.0)
    assert(math.abs(xN) < 1e-6 && yN < 0)
    // and 90 degrees east of lon_0 is +x
    val (xE, yE) = nsidcN.forward(45.0, 80.0)
    assert(xE > 0 && math.abs(yE) < 1e-6)
  }

  test("forward/inverse roundtrip sub-mm over the usage domain") {
    def rt(p: PolarStereographic, lons: Seq[Double], lats: Seq[Double]): Unit =
      for (lon <- lons; lat <- lats) {
        val (x, y) = p.forward(lon, lat)
        val (lon2, lat2) = p.inverse(x, y)
        assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
          s"($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
      }
    rt(antarctic, Seq(-179.0, -60.0, 0.0, 120.0), Seq(-60.5, -71.0, -89.9))
    rt(nsidcN, Seq(-170.0, -45.0, 10.0, 179.0), Seq(60.0, 70.0, 89.9))
    rt(upsN, Seq(-120.0, 0.0, 90.0), Seq(84.0, 89.0, 89.99))
  }

  test("registry: EPSG:3031/3413/5041/5042 compose through the 4326 hub") {
    val prj = CRS.transform(Point(155.0, -77.5), "EPSG:4326", "EPSG:3031")
      .asInstanceOf[Point]
    val back = CRS.transform(prj, "EPSG:3031", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(back.x - 155.0) < 1e-9 && math.abs(back.y + 77.5) < 1e-9)
    // polar -> polar composes across the hub (3413 -> 5041 both north)
    val p3413 = nsidcN.forward(30.0, 75.0)
    val ups = CRS.transform(Point(p3413._1, p3413._2), "EPSG:3413", "EPSG:5041")
      .asInstanceOf[Point]
    val (lonU, latU) = upsN.inverse(ups.x, ups.y)
    assert(math.abs(lonU - 30.0) < 1e-9 && math.abs(latU - 75.0) < 1e-9)
  }

  test("proj4: +proj=stere polar-aspect guard and variant dispatch") {
    val (fwd, inv) = CRS.fromProj4(
      "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84")
    val (x, y) = fwd((45.0, -75.0))
    val direct = antarctic.forward(45.0, -75.0)
    assert(x == direct._1 && y == direct._2)
    assert(math.abs(inv((x, y))._2 + 75.0) < 1e-9)
    intercept[IllegalArgumentException] {
      CRS.fromProj4("+proj=stere +lat_0=52 +lon_0=5 +ellps=WGS84") // oblique
    }
  }

  test("PROJJSON: polar stereographic variant B method dispatch") {
    val json =
      """{"type":"ProjectedCRS","name":"Antarctic PS",
        |"base_crs":{"datum":{"ellipsoid":{"semi_major_axis":6378137,"inverse_flattening":298.257223563}}},
        |"conversion":{"method":{"name":"Polar Stereographic (variant B)","id":{"authority":"EPSG","code":9829}},
        |"parameters":[
        |  {"name":"Latitude of standard parallel","value":-71,"id":{"authority":"EPSG","code":8832}},
        |  {"name":"Longitude of origin","value":0,"id":{"authority":"EPSG","code":8833}},
        |  {"name":"False easting","value":0,"id":{"authority":"EPSG","code":8806}},
        |  {"name":"False northing","value":0,"id":{"authority":"EPSG","code":8807}}]}}""".stripMargin
    CRS.registerProjJson("TEST:PSB", json)
    val viaJson = CRS.transform(Point(100.0, -80.0), "EPSG:4326", "TEST:PSB")
      .asInstanceOf[Point]
    val (dx, dy) = antarctic.forward(100.0, -80.0)
    assert(math.abs(viaJson.x - dx) < 1e-9 && math.abs(viaJson.y - dy) < 1e-9)
  }
}
