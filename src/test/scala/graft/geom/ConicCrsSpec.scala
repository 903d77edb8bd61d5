package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Conic projections (Snyder §14/§15): false-origin identities, inverse
  * roundtrips, and the Albers equal-area property. */
class ConicCrsSpec extends AnyFunSuite {
  import CRS._

  test("natural origin maps to the false origin exactly") {
    // forward(lon0, lat0) = (x0, y0) is a defining property of the 2SP forms
    val (lx, ly) = Lambert93.forward(3.0, 46.5)
    assert(math.abs(lx - 700000.0) < 1e-6 && math.abs(ly - 6600000.0) < 1e-6)
    val (ax, ay) = ConusAlbers.forward(-96.0, 23.0)
    assert(math.abs(ax) < 1e-6 && math.abs(ay) < 1e-6)
    val (cx, cy) = CaliforniaAlbers.forward(-120.0, 0.0)
    assert(math.abs(cx) < 1e-6 && math.abs(cy + 4000000.0) < 1e-6)
    val (sx, sy) = StatCanLcc.forward(-91.866667, 63.390675)
    assert(math.abs(sx - 6200000.0) < 1e-6 && math.abs(sy - 3000000.0) < 1e-6)
  }

  test("forward/inverse roundtrip to sub-mm over each domain") {
    def rt(fwd: (Double, Double) => (Double, Double),
           inv: (Double, Double) => (Double, Double),
           lons: Seq[Double], lats: Seq[Double]): Unit =
      for (lon <- lons; lat <- lats) {
        val (x, y) = fwd(lon, lat)
        val (lon2, lat2) = inv(x, y)
        assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
          s"($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
      }
    rt(Lambert93.forward, Lambert93.inverse,
      Seq(-4.9, 0.0, 3.0, 8.1), Seq(41.2, 46.5, 50.9))
    rt(ConusAlbers.forward, ConusAlbers.inverse,
      Seq(-124.0, -96.0, -67.5), Seq(25.1, 37.0, 48.9))
    rt(CaliforniaAlbers.forward, CaliforniaAlbers.inverse,
      Seq(-124.0, -120.0, -114.2), Seq(32.6, 37.2, 41.9))
    rt(StatCanLcc.forward, StatCanLcc.inverse,
      Seq(-140.0, -91.866667, -52.6), Seq(42.0, 63.4, 82.9))
  }

  test("general TM matches the UTM path and roundtrips; proj4 parsing") {
    // TM parameterized as UTM zone 31N must match lonLatToUtm exactly
    val tm = TransverseMercator(WGS84E, 0, 3.0, 0.9996, 500000.0, 0.0)
    for (lon <- Seq(0.5, 3.0, 5.9); lat <- Seq(-40.0, 0.0, 52.3)) {
      val (x1, y1) = lonLatToUtm(lon, lat, 31, north = true)
      val (x2, y2) = tm.forward(lon, lat)
      assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6, s"($lon,$lat)")
      val (lon2, lat2) = tm.inverse(x2, y2)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    // non-zero lat_0 (state-plane style): natural origin -> false origin
    val sp = TransverseMercator(GRS80, 31.0, -110.166667, 0.9999, 213360.0, 0.0)
    val (ox, oy) = sp.forward(-110.166667, 31.0)
    assert(math.abs(ox - 213360.0) < 1e-6 && math.abs(oy) < 1e-6)
    val (blon, blat) = sp.inverse(250000.0, 150000.0)
    val (bx, by) = sp.forward(blon, blat)
    assert(math.abs(bx - 250000.0) < 1e-6 && math.abs(by - 150000.0) < 1e-6)

    // proj4 string -> same LCC as the built-in Lambert-93
    val (fwd, inv) = fromProj4(
      "+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80")
    val (px, py) = fwd((2.5, 47.0))
    val (lx, ly) = Lambert93.forward(2.5, 47.0)
    assert(px == lx && py == ly)
    val (rl, rp) = inv((px, py))
    assert(math.abs(rl - 2.5) < 1e-9 && math.abs(rp - 47.0) < 1e-9)
    // registry round-trip through st-style transform: EPSG:326xx inverse
    val (ux, uy) = lonLatToUtm(5.0, 50.0, 31, north = true)
    val back = CRS.transform(Point(ux, uy), "EPSG:32631", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(back.x - 5.0) < 1e-9 && math.abs(back.y - 50.0) < 1e-9)
  }

  test("PROJJSON parses to the same transforms as the built-ins") {
    // Lambert-93 as EPSG would emit it (method/parameter ids + values)
    val lcc2154 =
      """{"type":"ProjectedCRS","name":"RGF93 / Lambert-93",
        | "base_crs":{"datum":{"ellipsoid":{"name":"GRS 1980",
        |   "semi_major_axis":6378137,"inverse_flattening":298.257222101}}},
        | "conversion":{"name":"Lambert-93",
        |  "method":{"name":"Lambert Conic Conformal (2SP)","id":{"authority":"EPSG","code":9802}},
        |  "parameters":[
        |   {"name":"Latitude of false origin","value":46.5,"id":{"authority":"EPSG","code":8821}},
        |   {"name":"Longitude of false origin","value":3,"id":{"authority":"EPSG","code":8822}},
        |   {"name":"Latitude of 1st standard parallel","value":44,"id":{"authority":"EPSG","code":8823}},
        |   {"name":"Latitude of 2nd standard parallel","value":49,"id":{"authority":"EPSG","code":8824}},
        |   {"name":"Easting at false origin","value":700000,"id":{"authority":"EPSG","code":8826}},
        |   {"name":"Northing at false origin","value":6600000,"id":{"authority":"EPSG","code":8827}}]}}
        |""".stripMargin
    val (fwd, inv) = fromProjJson(lcc2154)
    val (px, py) = fwd((2.5, 47.0))
    val (lx, ly) = Lambert93.forward(2.5, 47.0)
    assert(px == lx && py == ly)
    val (rl, rp) = inv((px, py))
    assert(math.abs(rl - 2.5) < 1e-9 && math.abs(rp - 47.0) < 1e-9)

    // TM by parameter NAMES only (no ids) — the fallback path
    val tmJson =
      """{"type":"ProjectedCRS",
        | "base_crs":{"datum":{"ellipsoid":{"semi_major_axis":6378137,
        |   "inverse_flattening":298.257223563}}},
        | "conversion":{"method":{"name":"Transverse Mercator"},
        |  "parameters":[
        |   {"name":"Latitude of natural origin","value":0},
        |   {"name":"Longitude of natural origin","value":3},
        |   {"name":"Scale factor at natural origin","value":0.9996},
        |   {"name":"False easting","value":500000},
        |   {"name":"False northing","value":0}]}}
        |""".stripMargin
    val (tf, _) = fromProjJson(tmJson)
    val (ux, uy) = lonLatToUtm(4.2, 51.0, 31, north = true)
    val (tx2, ty2) = tf((4.2, 51.0))
    assert(math.abs(tx2 - ux) < 1e-9 && math.abs(ty2 - uy) < 1e-9)

    // registry wiring
    CRS.registerProjJson("TEST:L93", lcc2154)
    val moved = CRS.transform(Point(2.5, 47.0), "EPSG:4326", "TEST:L93").asInstanceOf[Point]
    assert(moved.x == lx && moved.y == ly)

    // projected -> projected composes through the 4326 hub: 3857 -> 2154
    val (wx, wy) = lonLatToWebMercator(2.5, 47.0)
    val hub = CRS.transform(Point(wx, wy), "EPSG:3857", "EPSG:2154").asInstanceOf[Point]
    assert(math.abs(hub.x - lx) < 1e-5 && math.abs(hub.y - ly) < 1e-5)
    // and 2154 -> UTM 31N equals forward UTM of the roundtripped lon/lat
    val (ex, ey) = lonLatToUtm(2.5, 47.0, 31, north = true)
    val viaUtm = CRS.transform(Point(lx, ly), "EPSG:2154", "EPSG:32631").asInstanceOf[Point]
    assert(math.abs(viaUtm.x - ex) < 1e-5 && math.abs(viaUtm.y - ey) < 1e-5)
  }

  test("Albers preserves area; LCC preserves shape locally") {
    // small square at a standard parallel: Albers area scale = 1 (equal-area
    // everywhere), LCC scale factor = 1 ON the standard parallel
    def quadArea(ps: Seq[(Double, Double)]): Double = {
      var s = 0.0
      for (i <- ps.indices) {
        val (x1, y1) = ps(i); val (x2, y2) = ps((i + 1) % ps.length)
        s += x1 * y2 - x2 * y1
      }
      math.abs(s) / 2
    }
    val d = 0.01
    // ellipsoidal patch area ~ a^2 (1-e2) cos(phi) dlam dphi / (1 - e2 sin^2 phi)^2
    val phi = math.toRadians(29.5)
    val ell = GRS80
    val patch = ell.a * ell.a * (1 - ell.e2) * math.cos(phi) *
      math.toRadians(d) * math.toRadians(d) /
      math.pow(1 - ell.e2 * math.sin(phi) * math.sin(phi), 2)
    val proj = Seq((-96.0, 29.5), (-96.0 + d, 29.5), (-96.0 + d, 29.5 + d), (-96.0, 29.5 + d))
      .map { case (lo, la) => ConusAlbers.forward(lo, la) }
    assert(math.abs(quadArea(proj) / patch - 1.0) < 1e-4)

    // LCC on lat1: distance along the parallel scales by 1 (chord vs arc
    // differs only at O(dtheta^2) — far below the tolerance for d=0.01 deg)
    val (x1, y1) = Lambert93.forward(2.0, 44.0)
    val (x2, y2) = Lambert93.forward(2.0 + d, 44.0)
    val chord = math.hypot(x2 - x1, y2 - y1)
    val nu = ell.a / math.sqrt(1 - ell.e2 * math.sin(math.toRadians(44.0)) * math.sin(math.toRadians(44.0)))
    val groundDist = nu * math.cos(math.toRadians(44.0)) * math.toRadians(d)
    assert(math.abs(chord / groundDist - 1.0) < 1e-6)
  }
}
