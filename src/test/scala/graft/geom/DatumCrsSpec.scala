package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Datum shifts (7-parameter Helmert) + ellipsoidal Mercator: the round-4
  * additions to the CRS registry. TM-on-Airy is pinned to the Ordnance
  * Survey's published worked example ("A guide to coordinate systems in
  * Great Britain", Annex: OSGB36 lat/lon <-> National Grid). */
class DatumCrsSpec extends AnyFunSuite {
  import CRS._

  private def dms(d: Double, m: Double, s: Double): Double = d + m / 60 + s / 3600

  test("TM on Airy 1830 reproduces the OS National Grid worked example") {
    // OSGB36 phi = 52d39'27.2531" N, lam = 1d43'4.5177" E
    //   -> E 651409.903, N 313177.270 (OS guide, mm-rounded)
    val tm = TransverseMercator(Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0)
    val (e, n) = tm.forward(dms(1, 43, 4.5177), dms(52, 39, 27.2531))
    assert(math.abs(e - 651409.903) < 0.005, s"easting $e")
    assert(math.abs(n - 313177.270) < 0.005, s"northing $n")
    val (lon2, lat2) = tm.inverse(651409.903, 313177.270)
    assert(math.abs(lon2 - dms(1, 43, 4.5177)) < 1e-7)
    assert(math.abs(lat2 - dms(52, 39, 27.2531)) < 1e-7)
  }

  test("geodetic <-> geocentric (Bowring) is an identity on both ellipsoids") {
    for (ell <- Seq(WGS84E, Airy1830, Intl1924);
         lon <- Seq(-5.5, 0.0, 1.7); lat <- Seq(49.9, 52.65, 60.8)) {
      val (x, y, z) = geodeticToGeocentric(ell, lon, lat)
      val (lon2, lat2) = geocentricToGeodetic(ell, x, y, z)
      assert(math.abs(lon2 - lon) < 1e-10 && math.abs(lat2 - lat) < 1e-10,
        s"$ell ($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("Helmert to/from WGS84 round-trips and shifts by the expected order") {
    val h = Helmert(446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489)
    val (x, y, z) = geodeticToGeocentric(WGS84E, -2.0, 52.0)
    val (lx, ly, lz) = h.fromWgs(x, y, z)
    // the OSGB36 frame offset is ~100s of meters in geocentric space
    val d = math.sqrt((lx - x) * (lx - x) + (ly - y) * (ly - y) + (lz - z) * (lz - z))
    assert(d > 300 && d < 900, s"shift magnitude $d")
    // linearized reverse composes with forward to ~1 cm (second-order
    // r*dx / ds^2 terms; OSGB's ds = -20.5 ppm is among the largest in use)
    val (rx, ry, rz) = h.toWgs(lx, ly, lz)
    val rd = math.sqrt((rx - x) * (rx - x) + (ry - y) * (ry - y) + (rz - z) * (rz - z))
    assert(rd < 0.02, s"roundtrip residual $rd m")
  }

  test("EPSG:27700 / OSGB36 registry: datum leg applied, roundtrip stable") {
    // WGS84 -> 27700 differs from a datum-less Airy TM by the ~100 m
    // OSGB36<->WGS84 separation; roundtrip must come home to ~1e-7 deg
    val p = Point(-1.5, 52.5)
    val bng = CRS.transform(p, "EPSG:4326", "EPSG:27700").asInstanceOf[Point]
    val tm = TransverseMercator(Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0)
    val tmOnly = tm.forward(-1.5, 52.5)
    val sep = math.hypot(bng.x - tmOnly._1, bng.y - tmOnly._2)
    assert(sep > 50 && sep < 300, s"datum separation $sep m")
    val back = CRS.transform(bng, "EPSG:27700", "EPSG:4326").asInstanceOf[Point]
    assert(math.abs(back.x + 1.5) < 1e-7 && math.abs(back.y - 52.5) < 1e-7)
    // the geographic tag and the projected CRS share one datum leg:
    // unproject 27700 with the TM alone = transform 4326 -> OSGB36 geo
    val geo = CRS.transform(p, "EPSG:4326", "OSGB36").asInstanceOf[Point]
    val (glon, glat) = tm.inverse(bng.x, bng.y)
    assert(math.abs(geo.x - glon) < 1e-9 && math.abs(geo.y - glat) < 1e-9)
  }

  test("EPSG:27700 documented accuracy envelope: single Helmert within 5 m of the OSTN truth") {
    // OS 'A guide to coordinate systems in Great Britain' worked example:
    // ETRS89 52deg 39' 28.8282" N, 1deg 42' 57.8663" E corresponds to
    // OSTN-grid-corrected British National Grid E 651409.792 N 313177.448.
    // The README documents the single-Helmert path as grid-approximate:
    // ~2 m typical, ~3.5 m at the national extremes (the OS's stated
    // envelope for the single national Helmert). This point sits in East
    // Anglia near the worst case — measured 3.46 m here. The assertion
    // pins the envelope (< 5 m) AND that the datum leg actually runs
    // (> 0.1 m from truth would also hold for OSTN itself, but a
    // datum-less path is ~100 m off and fails loudly).
    val lat = 52.0 + 39.0 / 60 + 28.8282 / 3600
    val lon = 1.0 + 42.0 / 60 + 57.8663 / 3600
    val bng = CRS.transform(Point(lon, lat), "EPSG:4326", "EPSG:27700").asInstanceOf[Point]
    val err = math.hypot(bng.x - 651409.792, bng.y - 313177.448)
    assert(err < 5.0, s"single-Helmert error $err m vs OSTN truth (documented ~2 m typical / ~3.5 m worst)")
  }

  test("ellipsoidal Mercator: atanh identity, sphere routing, lat_ts") {
    // Snyder's log form equals y = a (atanh(sin phi) - e atanh(e sin phi))
    val m = Mercator(WGS84E, 0, 1.0, 0, 0, 0)
    def atanh(x: Double) = 0.5 * math.log((1 + x) / (1 - x))
    for (lat <- Seq(-66.6, -10.0, 23.45, 45.0, 75.0)) {
      val (_, y) = m.forward(12.0, lat)
      val s = math.sin(math.toRadians(lat))
      val yId = WGS84E.a * (atanh(s) - WGS84E.e * atanh(WGS84E.e * s))
      assert(math.abs(y - yId) < 1e-6, s"lat $lat: $y vs $yId")
      val (lon2, lat2) = m.inverse(m.forward(12.0, lat)._1, y)
      assert(math.abs(lon2 - 12.0) < 1e-11 && math.abs(lat2 - lat) < 1e-11)
    }
    // '+proj=merc +ellps=WGS84' (EPSG:3395 style) is ellipsoidal: northing
    // ~0.5% (tens of km) south of the spherical web-mercator value at 45N
    val (fe, _) = fromProj4("+proj=merc +ellps=WGS84")
    val (_, ye) = fe((12.0, 45.0))
    val (_, ys) = lonLatToWebMercator(12.0, 45.0)
    assert(ye < ys && (ys - ye) / ys > 0.003 && (ys - ye) / ys < 0.008,
      s"ellipsoidal $ye vs spherical $ys")
    // a pinned sphere routes to the spherical formulas
    val (fs, _) = fromProj4("+proj=merc +a=6378137 +b=6378137")
    assert(fs((12.0, 45.0))._2 == ys)
    // variant B: true scale at lat_ts means unit ground scale there
    val mB = Mercator(WGS84E, 0, 1.0, 30.0, 0, 0)
    val phi = math.toRadians(30.0)
    val nu = WGS84E.a / math.sqrt(1 - WGS84E.e2 * math.sin(phi) * math.sin(phi))
    val dx = mB.forward(0.01, 30.0)._1 - mB.forward(0.0, 30.0)._1
    val ground = nu * math.cos(phi) * math.toRadians(0.01)
    assert(math.abs(dx / ground - 1.0) < 1e-9)
  }

  test("PROJJSON BoundCRS (position-vector and coordinate-frame) = +towgs84") {
    def bound(methodCode: Int, methodName: String, sgn: Double) =
      s"""{"type":"BoundCRS",
         | "source_crs":{"type":"ProjectedCRS",
         |  "base_crs":{"datum":{"ellipsoid":{"name":"Airy 1830",
         |    "semi_major_axis":6377563.396,"inverse_flattening":299.3249646}}},
         |  "conversion":{"method":{"name":"Transverse Mercator","id":{"authority":"EPSG","code":9807}},
         |   "parameters":[
         |    {"name":"Latitude of natural origin","value":49,"id":{"authority":"EPSG","code":8801}},
         |    {"name":"Longitude of natural origin","value":-2,"id":{"authority":"EPSG","code":8802}},
         |    {"name":"Scale factor at natural origin","value":0.9996012717,"id":{"authority":"EPSG","code":8805}},
         |    {"name":"False easting","value":400000,"id":{"authority":"EPSG","code":8806}},
         |    {"name":"False northing","value":-100000,"id":{"authority":"EPSG","code":8807}}]}},
         | "transformation":{"method":{"name":"$methodName","id":{"authority":"EPSG","code":$methodCode}},
         |  "parameters":[
         |   {"name":"X-axis translation","value":446.448,"id":{"authority":"EPSG","code":8605}},
         |   {"name":"Y-axis translation","value":-125.157,"id":{"authority":"EPSG","code":8606}},
         |   {"name":"Z-axis translation","value":542.06,"id":{"authority":"EPSG","code":8607}},
         |   {"name":"X-axis rotation","value":${sgn * 0.15},"id":{"authority":"EPSG","code":8608}},
         |   {"name":"Y-axis rotation","value":${sgn * 0.247},"id":{"authority":"EPSG","code":8609}},
         |   {"name":"Z-axis rotation","value":${sgn * 0.842},"id":{"authority":"EPSG","code":8610}},
         |   {"name":"Scale difference","value":-20.489,"id":{"authority":"EPSG","code":8611}}]}}
         |""".stripMargin
    val viaReg = CRS.transform(Point(-1.5, 52.5), "EPSG:4326", "EPSG:27700").asInstanceOf[Point]
    val (pvF, pvI) = fromProjJson(bound(9606, "Position Vector transformation (geog2D domain)", 1.0))
    val (px, py) = pvF((-1.5, 52.5))
    assert(math.abs(px - viaReg.x) < 1e-6 && math.abs(py - viaReg.y) < 1e-6)
    val (bl, bp) = pvI((px, py))
    assert(math.abs(bl + 1.5) < 1e-7 && math.abs(bp - 52.5) < 1e-7)
    // coordinate-frame rotation = opposite rotation signs, same transform
    val (cfF, _) = fromProjJson(bound(9607, "Coordinate Frame rotation (geog2D domain)", -1.0))
    val (cx, cy) = cfF((-1.5, 52.5))
    assert(math.abs(cx - px) < 1e-9 && math.abs(cy - py) < 1e-9)
  }
}
