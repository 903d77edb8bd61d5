package graft.geom

/**
 * Geodesic lengths and CRS transforms — pure-Scala ports of published
 * formulas (no PROJ available offline; reference wraps the PROJ C library at
 * ops/proj.rs:33-70 and offers geodesic-length methods {geodesic(Karney),
 * haversine, vincenty} at geoseries.rs:52-58 / geo.rs:61-78).
 *
 * Constants follow georust/geo: MEAN_EARTH_RADIUS = 6371008.8 m (haversine),
 * WGS84 a=6378137, f=1/298.257223563 (vincenty/geodesic).
 */
object Geodesy {
  val MeanEarthRadius = 6371008.8

  /**
   * Area of a polygon on the mean-Earth sphere, edges as great circles,
   * lon/lat degrees. Signed solid angle summed over the triangle fan with
   * the Oosterom-Strackee formula (sign-correct for non-convex rings);
   * holes subtract. Returns square meters.
   */
  def sphericalArea(rings: Array[Array[Double]]): Double = {
    def unit(lonDeg: Double, latDeg: Double): Array[Double] = {
      val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
      Array(math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon), math.sin(lat))
    }
    def ringSolidAngle(r: Array[Double]): Double = {
      val n = r.length / 2 - 1 // closed ring
      if (n < 3) return 0.0
      val v0 = unit(r(0), r(1))
      var sum = 0.0
      var i = 1
      while (i + 1 < n + 1) {
        val a = unit(r(2 * i), r(2 * i + 1))
        val b = unit(r(2 * (i + 1)), r(2 * (i + 1) + 1))
        // signed excess of spherical triangle (v0, a, b)
        val cx = a(1) * b(2) - a(2) * b(1)
        val cy = a(2) * b(0) - a(0) * b(2)
        val cz = a(0) * b(1) - a(1) * b(0)
        val num = v0(0) * cx + v0(1) * cy + v0(2) * cz
        val den = 1.0 +
          (v0(0) * a(0) + v0(1) * a(1) + v0(2) * a(2)) +
          (a(0) * b(0) + a(1) * b(1) + a(2) * b(2)) +
          (b(0) * v0(0) + b(1) * v0(1) + b(2) * v0(2))
        sum += 2.0 * math.atan2(num, den)
        i += 1
      }
      math.abs(sum)
    }
    if (rings.isEmpty) return 0.0
    var area = ringSolidAngle(rings(0))
    var h = 1
    while (h < rings.length) { area -= ringSolidAngle(rings(h)); h += 1 }
    math.max(area, 0.0) * MeanEarthRadius * MeanEarthRadius
  }
  val WGS84_A = 6378137.0
  val WGS84_F = 1.0 / 298.257223563
  val WGS84_B = WGS84_A * (1 - WGS84_F)

  sealed trait Method
  object Method {
    case object Geodesic extends Method
    case object Haversine extends Method
    case object Vincenty extends Method
    case object Karney extends Method
    def parse(s: String): Method = s.trim.toLowerCase match {
      case "geodesic"  => Geodesic
      case "haversine" => Haversine
      case "vincenty"  => Vincenty
      case "karney"    => Karney
      case other => throw new IllegalArgumentException(
        s"unknown geodesic length method '$other' (expected geodesic|haversine|vincenty|karney)")
    }
  }

  /** Haversine great-circle distance in meters; inputs are lon/lat degrees. */
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1); val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * MeanEarthRadius * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Vincenty inverse distance (meters) on WGS84. Falls back to haversine on
    * non-convergence (near-antipodal pairs). */
  def vincenty(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    if (lon1 == lon2 && lat1 == lat2) return 0.0
    val L = math.toRadians(lon2 - lon1)
    val U1 = math.atan((1 - WGS84_F) * math.tan(math.toRadians(lat1)))
    val U2 = math.atan((1 - WGS84_F) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(U1); val cosU1 = math.cos(U1)
    val sinU2 = math.sin(U2); val cosU2 = math.cos(U2)
    var lambda = L
    var iter = 0
    var converged = false
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    while (iter < 200 && !converged) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.sqrt(
        (cosU2 * sinL) * (cosU2 * sinL) +
          (cosU1 * sinU2 - sinU1 * cosU2 * cosL) * (cosU1 * sinU2 - sinU1 * cosU2 * cosL))
      if (sinSigma == 0) return 0.0
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0.0 else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val C = WGS84_F / 16 * cosSqAlpha * (4 + WGS84_F * (4 - 3 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = L + (1 - C) * WGS84_F * sinAlpha *
        (sigma + C * sinSigma * (cos2SigmaM + C * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return haversine(lon1, lat1, lon2, lat2)
    val uSq = cosSqAlpha * (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    val A = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val B = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = B * sinSigma * (cos2SigmaM + B / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        B / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    WGS84_B * A * (sigma - deltaSigma)
  }

  /** "geodesic" method (Karney 2013 in the reference via geographiclib).
    * Vincenty agrees with Karney to sub-mm except near-antipodal points;
    * the catalog's 'geodesic' stays Vincenty-aliased for oracle stability.
    * [[karney]] below is the true auxiliary-sphere inverse (series +
    * monotonic bisection), correct including the antipodal region where
    * Vincenty diverges. */
  def geodesic(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    vincenty(lon1, lat1, lon2, lat2)

  /**
   * Karney-style geodesic inverse DISTANCE on WGS84 (Karney 2013,
   * "Algorithms for geodesics"): solve for the departure azimuth on the
   * auxiliary sphere, then integrate the distance series. The azimuth
   * equation lambda12(alpha1) is monotonic under the canonical point
   * arrangement (Karney §4), so a bracketed bisection converges
   * unconditionally — including near-antipodal pairs, where Vincenty's
   * fixed-point iteration diverges. Distance series to eps^6 (sub-mm).
   *
   * One documented approximation: for EXACTLY-equatorial pairs (both
   * latitudes 0) with lam12 > (1-f)*pi the geodesic leaves the equator and
   * the full solution needs Karney's astroid start; this sliver returns
   * min(equatorial arc, meridional semicircumference) instead — exact at
   * lam12 = pi, up to ~0.1% high inside the sliver. All non-equatorial
   * pairs (any |lat| > 0) take the full series + bisection path.
   */
  def karney(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val a = WGS84_A; val f = WGS84_F
    val e2 = f * (2 - f)
    val ep2 = e2 / (1 - e2)
    if (lon1 == lon2 && lat1 == lat2) return 0.0

    // canonical arrangement: point 1 is the one with the larger |beta|,
    // moved to the southern hemisphere; lam12 in [0, pi]
    var b1 = math.atan((1 - f) * math.tan(math.toRadians(lat1)))
    var b2 = math.atan((1 - f) * math.tan(math.toRadians(lat2)))
    var lam12 = {
      var d = math.toRadians(lon2 - lon1) % (2 * math.Pi)
      if (d > math.Pi) d -= 2 * math.Pi
      if (d < -math.Pi) d += 2 * math.Pi
      d
    }
    if (math.abs(b1) < math.abs(b2)) { val t = b1; b1 = b2; b2 = t }
    if (b1 > 0) { b1 = -b1; b2 = -b2 }
    lam12 = math.abs(lam12)

    val sb1 = math.sin(b1); val cb1 = math.cos(b1)
    val sb2 = math.sin(b2); val cb2 = math.cos(b2)

    // I1 distance integral: s = b * A1 * (sigma + sum C1_l sin 2l sigma)
    def a1Coeff(eps: Double): Double = {
      val e2_ = eps * eps
      (1 + e2_ / 4 + e2_ * e2_ / 64 + e2_ * e2_ * e2_ / 256) / (1 - eps)
    }
    def c1Coeffs(eps: Double): Array[Double] = {
      val e1 = eps; val e2_ = eps * e1; val e3 = eps * e2_
      val e4 = eps * e3; val e5 = eps * e4; val e6 = eps * e5
      Array(
        -e1 / 2 + 3 * e3 / 16 - e5 / 32,
        -e2_ / 16 + e4 / 32 - 9 * e6 / 2048,
        -e3 / 48 + 3 * e5 / 256,
        -5 * e4 / 512 + 3 * e6 / 512,
        -7 * e5 / 1280,
        -7 * e6 / 2048)
    }
    def sinSeries(c: Array[Double], sigma: Double): Double = {
      var s = 0.0; var l = 0
      while (l < c.length) { s += c(l) * math.sin(2 * (l + 1) * sigma); l += 1 }
      s
    }
    // I3 longitude integral: lam = omega - f sin(alpha0) I3-term
    def a3Coeff(eps: Double): Double = {
      val n = f / (2 - f)
      1.0 -
        (1.0 / 2 - n / 2) * eps -
        (1.0 / 4 + n / 8 - 3 * n * n / 8) * eps * eps -
        (1.0 / 16 + 3 * n / 16 + n * n / 16) * eps * eps * eps -
        (3.0 / 64 + n / 32) * eps * eps * eps * eps -
        (3.0 / 128) * eps * eps * eps * eps * eps
    }
    def c3Coeffs(eps: Double): Array[Double] = {
      val n = f / (2 - f)
      val e1 = eps; val e2_ = eps * e1; val e3 = eps * e2_
      val e4 = eps * e3; val e5 = eps * e4
      Array(
        (1.0 / 4 - n / 4) * e1 + (1.0 / 8 - n * n / 8) * e2_ +
          (3.0 / 64 + 3 * n / 64 - n * n / 64) * e3 +
          (5.0 / 128 + n / 64) * e4 + (3.0 / 128) * e5,
        (1.0 / 16 - 3 * n / 32 + n * n / 32) * e2_ +
          (3.0 / 64 - n / 32 - 3 * n * n / 64) * e3 +
          (3.0 / 128 + n / 128) * e4 + (5.0 / 256) * e5,
        (5.0 / 192 - 3 * n / 64 + 5 * n * n / 192) * e3 +
          (3.0 / 128 - 5 * n / 192) * e4 + (7.0 / 512) * e5,
        (7.0 / 512 - 7 * n / 256) * e4 + (7.0 / 512) * e5,
        (21.0 / 2560) * e5)
    }

    // lambda12 and s12 for a trial departure azimuth alpha1 at point 1
    def eval(alpha1: Double): (Double, Double) = {
      val sa1 = math.sin(alpha1); val ca1 = math.cos(alpha1)
      val sinA0 = sa1 * cb1
      val cosA0 = math.sqrt(1 - sinA0 * sinA0)
      val sig1 = math.atan2(sb1, ca1 * cb1)
      val om1 = math.atan2(sinA0 * sb1, ca1 * cb1) // = atan2(sinA0 sin sig1, cos sig1)
      // alpha2 with the non-negative cosine branch (forward continuation)
      val ca2sq = math.max(0.0, cb2 * cb2 - sinA0 * sinA0)
      val ca2 = math.sqrt(ca2sq) / 1.0
      val sig2 = math.atan2(sb2, ca2)
      val om2 = math.atan2(sinA0 * sb2, ca2)
      val k2 = ep2 * cosA0 * cosA0
      val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
      val a3 = a3Coeff(eps); val c3 = c3Coeffs(eps)
      val lam = (om2 - om1) - f * sinA0 * a3 *
        ((sig2 - sig1) + (sinSeries(c3, sig2) - sinSeries(c3, sig1)))
      val a1c = a1Coeff(eps); val c1 = c1Coeffs(eps)
      val s12 = (a * (1 - f)) * a1c *
        ((sig2 - sig1) + (sinSeries(c1, sig2) - sinSeries(c1, sig1)))
      (lam, s12)
    }

    // equatorial shortcut: both points on the equator and the geodesic
    // stays equatorial only while lam12 <= (1-f) pi
    if (sb1 == 0.0 && sb2 == 0.0) {
      if (lam12 <= (1 - f) * math.Pi) return a * lam12
      // beyond the cutoff the solution leaves the equator; this exactly-
      // equatorial sliver is the classic degenerate corner (Karney treats
      // it with the astroid machinery) — bound it by the cheaper of the
      // equatorial segment and the polar meridional route (exact at
      // lam12 = pi, <=0.1% high inside the sliver)
      // meridional semicircumference via the distance series at alpha0 = 0
      val epsPolar = ep2 / (2 * (1 + math.sqrt(1 + ep2)) + ep2)
      val polar = (a * (1 - f)) * a1Coeff(epsPolar) * math.Pi
      return math.min(a * lam12, polar)
    }
    // meridional (lam12 == 0): alpha1 = 0 evaluates directly
    if (lam12 == 0.0) return eval(0.0)._2

    // bisect on the monotonic lambda12(alpha1) over (0, pi)
    var lo = 1e-12
    var hi = math.Pi - 1e-12
    var i = 0
    while (i < 80) {
      val mid = (lo + hi) / 2
      val (lam, _) = eval(mid)
      if (lam < lam12) lo = mid else hi = mid
      i += 1
    }
    eval((lo + hi) / 2)._2
  }

  private def pairDist(m: Method)(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    m match {
      case Method.Haversine => haversine(lon1, lat1, lon2, lat2)
      case Method.Vincenty  => vincenty(lon1, lat1, lon2, lat2)
      case Method.Geodesic  => geodesic(lon1, lat1, lon2, lat2)
      case Method.Karney    => karney(lon1, lat1, lon2, lat2)
    }

  /**
   * Signed Chamberlain–Duquette spherical ring area (m^2) on the
   * MeanEarthRadius sphere — the published approximation PostGIS'
   * sphere path and turf.js use (NASA JPL Publication 07-3): per edge
   * rad(dLon) * (2 + sin(radLat1) + sin(radLat2)), total * R^2 / 2.
   * The "2 +" term telescopes to zero over a closed ring; what remains
   * is the trapezoid rule in the cylindrical equal-area projection —
   * i.e. edges are treated as straight in lon/lat space (the GeoJSON
   * convention), unlike [[sphericalArea]] whose edges are great circles.
   * Accuracy ~0.3% vs the full ellipsoidal (Karney) area, dominated by
   * the spherical approximation, not the trapezoid rule.
   */
  def sphericalRingArea(cs: Array[Double]): Double = {
    var total = 0.0
    var i = 0
    while (i + 3 < cs.length) {
      total += math.toRadians(cs(i + 2) - cs(i)) *
        (2.0 + math.sin(math.toRadians(cs(i + 1))) + math.sin(math.toRadians(cs(i + 3))))
      i += 2
    }
    total * MeanEarthRadius * MeanEarthRadius / 2
  }

  /** Geodesic (spherical) area in m^2: |exterior| minus |holes| per
    * polygon, summed over multi-parts; non-areal geometries => 0.0.
    * Ring orientation is irrelevant (each ring's area is |signed|). */
  def geodesicArea(g: Geometry): Double = g match {
    case p: Polygon =>
      if (p.isEmpty || p.rings.isEmpty) 0.0
      else {
        val ext = math.abs(sphericalRingArea(p.rings(0)))
        var holes = 0.0
        var i = 1
        while (i < p.rings.length) { holes += math.abs(sphericalRingArea(p.rings(i))); i += 1 }
        math.max(ext - holes, 0.0)
      }
    case mp: MultiPolygon      => mp.geoms.foldLeft(0.0)(_ + geodesicArea(_))
    case c: GeometryCollection => c.geoms.foldLeft(0.0)(_ + geodesicArea(_))
    case _ => 0.0
  }

  /** Geodesic length of a geometry in meters (coords = lon/lat degrees).
    * Polygon => exterior ring, matching euclidean_length semantics. */
  def geodesicLength(g: Geometry, m: Method): Double = {
    def lineLen(cs: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i + 3 < cs.length) { s += pairDist(m)(cs(i), cs(i + 1), cs(i + 2), cs(i + 3)); i += 2 }
      s
    }
    g match {
      case l: LineString => lineLen(l.coords)
      case p: Polygon    => if (p.isEmpty) 0.0 else lineLen(p.rings(0))
      case mg: MultiLineString => mg.geoms.foldLeft(0.0)(_ + geodesicLength(_, m))
      case mg: MultiPolygon    => mg.geoms.foldLeft(0.0)(_ + geodesicLength(_, m))
      case c: GeometryCollection => c.geoms.foldLeft(0.0)(_ + geodesicLength(_, m))
      case _ => 0.0
    }
  }
}

/**
 * Pluggable CRS transform registry (reference exposes to_crs via PROJ,
 * geoseries.rs:148-161; we implement the published projection math for the
 * common web/analysis CRSs and keep the registry open for extension).
 */
object CRS {
  type XY = (Double, Double)
  private val R = Geodesy.WGS84_A // WebMercator sphere radius = WGS84 semi-major
  private val MaxLat = 85.06 // WebMercator clamp

  /** EPSG:4326 lon/lat -> EPSG:3857 WebMercator meters. */
  def lonLatToWebMercator(lon: Double, lat: Double): XY = {
    val la = math.max(-MaxLat, math.min(MaxLat, lat))
    (R * math.toRadians(lon), R * math.log(math.tan(math.Pi / 4 + math.toRadians(la) / 2)))
  }

  def webMercatorToLonLat(x: Double, y: Double): XY =
    (math.toDegrees(x / R), math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2))

  /** UTM via the general [[TransverseMercator]] (Krüger order-4 series,
    * Karney 2011) — zone's central meridian, k0 = 0.9996. */
  def lonLatToUtm(lon: Double, lat: Double, zone: Int, north: Boolean): XY =
    TransverseMercator(WGS84E, 0, zone * 6 - 183, 0.9996,
      500000.0, if (north) 0.0 else 10000000.0).forward(lon, lat)

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  // ------------------------------------------------------------- conics
  // Lambert conformal conic (2SP) and Albers equal-area conic (2SP),
  // ellipsoidal forms from Snyder, "Map Projections — A Working Manual"
  // (USGS PP 1395, 1987), §15 (eq. 15-1..15-10) and §14 (14-1..14-11).
  // These cover the CRSs real regional data ships in (Lambert-93,
  // CONUS/California Albers, StatsCan LCC) that the 4326/3857/UTM
  // registry could not express.

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
  }
  /** GRS80 (NAD83 / RGF93 / ETRS89 families; treated as coincident with
    * WGS84 at the sub-meter level, the standard null-transform assumption). */
  val GRS80 = Ellipsoid(6378137.0, 298.257222101)
  /** WGS84 via its defining inverse flattening (1/invF reproduces
    * Geodesy.WGS84_F bit-exactly; never build this as 1/(1/f)). */
  val WGS84E = Ellipsoid(6378137.0, 298.257223563)
  /** Airy 1830 (OSGB36 / British National Grid). */
  val Airy1830 = Ellipsoid(6377563.396, 299.3249646)
  /** International 1924 / Hayford (ED50, Belgian Lambert 72, ...). */
  val Intl1924 = Ellipsoid(6378388.0, 297.0)
  /** Bessel 1841 (DHDN, CH1903, Japanese Tokyo datum families). */
  val Bessel1841 = Ellipsoid(6377397.155, 299.1528128)
  /** Clarke 1880 (IGN) (NTF / Lambert zone CRSs). */
  val Clarke1880IGN = Ellipsoid(6378249.2, 293.4660212936269)

  // ------------------------------------------------------- datum shifts
  // 7-parameter Helmert in the position-vector sign convention (EPSG
  // method 9606; PROJ '+towgs84=dx,dy,dz,rx,ry,rz,ds'): the parameters
  // transform geocentric coordinates FROM the local datum TO WGS84.
  // The reference gets datum shifts from full PROJ
  // (geopolars-geo/src/ops/proj.rs:33-70); this is the published-formula
  // subset: single Helmert, no NTv2/OSTN grid refinement, so national
  // grids are good to the standard single-Helmert ~2 m, not cm.

  /** dx/dy/dz meters, rx/ry/rz arc-seconds, ds parts-per-million. */
  final case class Helmert(
      dx: Double, dy: Double, dz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, dsPpm: Double) {
    private val rx = math.toRadians(rxSec / 3600.0)
    private val ry = math.toRadians(rySec / 3600.0)
    private val rz = math.toRadians(rzSec / 3600.0)
    private val m = 1.0 + dsPpm * 1e-6
    private val m2 = 1.0 - dsPpm * 1e-6

    /** local-datum geocentric -> WGS84 geocentric. */
    def toWgs(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (dx + m * (x - rz * y + ry * z),
        dy + m * (rz * x + y - rx * z),
        dz + m * (-ry * x + rx * y + z))
    /** WGS84 geocentric -> local-datum geocentric: the standard
      * negated-parameter reverse of the linearized transform (the exact
      * inverse differs by second-order r*dx / ds^2 terms — ~1 cm at OSGB's
      * ds = -20.5 ppm, the same approximation PROJ documents for
      * reversible Helmert use). */
    def fromWgs(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (-dx + m2 * (x + rz * y - ry * z),
        -dy + m2 * (-rz * x + y + rx * z),
        -dz + m2 * (ry * x - rx * y + z))
  }

  /** Geodetic lon/lat degrees (h = 0) -> geocentric XYZ meters. */
  def geodeticToGeocentric(ell: Ellipsoid, lon: Double, lat: Double): (Double, Double, Double) = {
    val phi = math.toRadians(lat); val lam = math.toRadians(lon)
    val sp = math.sin(phi)
    val nu = ell.a / math.sqrt(1 - ell.e2 * sp * sp)
    (nu * math.cos(phi) * math.cos(lam),
      nu * math.cos(phi) * math.sin(lam),
      nu * (1 - ell.e2) * sp)
  }

  /** Geocentric XYZ -> geodetic lon/lat degrees via Bowring's one-shot
    * formula (1976) — non-iterative (cross-engine replayable term by term),
    * sub-micrometer for near-surface points. */
  def geocentricToGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val p = math.sqrt(x * x + y * y)
    val b = ell.a * (1 - ell.f)
    val ep2 = (ell.a * ell.a - b * b) / (b * b)
    val th = math.atan2(z * ell.a, p * b)
    val st = math.sin(th); val ct = math.cos(th)
    val phi = math.atan2(z + ep2 * b * st * st * st,
      p - ell.e2 * ell.a * ct * ct * ct)
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
  }

  // Snyder 14-15 / 15-9 helpers
  private def mFac(ell: Ellipsoid, phi: Double): Double =
    math.cos(phi) / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
  private def tFac(ell: Ellipsoid, phi: Double): Double =
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - ell.e * math.sin(phi)) / (1 + ell.e * math.sin(phi)), ell.e / 2)
  private def qFac(ell: Ellipsoid, phi: Double): Double = {
    val s = math.sin(phi)
    (1 - ell.e2) * (s / (1 - ell.e2 * s * s) -
      1 / (2 * ell.e) * math.log((1 - ell.e * s) / (1 + ell.e * s)))
  }

  /** Lambert conformal conic, 2 standard parallels (Snyder §15). Angles in
    * degrees; returns projected meters with the given false origin. */
  final case class LambertConic(
      ell: Ellipsoid, lat1: Double, lat2: Double, lat0: Double, lon0: Double,
      x0: Double, y0: Double) {
    private val p1 = math.toRadians(lat1); private val p2 = math.toRadians(lat2)
    private val p0 = math.toRadians(lat0); private val l0 = math.toRadians(lon0)
    private val n =
      if (lat1 == lat2) math.sin(p1)
      else math.log(mFac(ell, p1) / mFac(ell, p2)) / math.log(tFac(ell, p1) / tFac(ell, p2))
    private val fF = mFac(ell, p1) / (n * math.pow(tFac(ell, p1), n))
    private val rho0 = ell.a * fF * math.pow(tFac(ell, p0), n)

    def forward(lon: Double, lat: Double): XY = {
      val rho = ell.a * fF * math.pow(tFac(ell, math.toRadians(lat)), n)
      val th = n * (math.toRadians(lon) - l0)
      (x0 + rho * math.sin(th), y0 + rho0 - rho * math.cos(th))
    }
    def inverse(x: Double, y: Double): XY = {
      val dx = x - x0; val dy = rho0 - (y - y0)
      val rho = math.signum(n) * math.sqrt(dx * dx + dy * dy)
      val th = math.atan2(math.signum(n) * dx, math.signum(n) * dy)
      val t = math.pow(rho / (ell.a * fF), 1 / n)
      // Snyder 7-9: fixed-point for phi from t (15 rounds, deterministic)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val es = ell.e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - es) / (1 + es), ell.e / 2))
        i += 1
      }
      (math.toDegrees(th / n + l0), math.toDegrees(phi))
    }
  }

  /** Albers equal-area conic, 2 standard parallels (Snyder §14). */
  final case class AlbersConic(
      ell: Ellipsoid, lat1: Double, lat2: Double, lat0: Double, lon0: Double,
      x0: Double, y0: Double) {
    private val p1 = math.toRadians(lat1); private val p2 = math.toRadians(lat2)
    private val p0 = math.toRadians(lat0); private val l0 = math.toRadians(lon0)
    private val m1 = mFac(ell, p1); private val m2 = mFac(ell, p2)
    private val q1 = qFac(ell, p1); private val q2 = qFac(ell, p2)
    private val n = if (lat1 == lat2) math.sin(p1) else (m1 * m1 - m2 * m2) / (q2 - q1)
    private val cC = m1 * m1 + n * q1
    private val rho0 = ell.a * math.sqrt(cC - n * qFac(ell, p0)) / n

    def forward(lon: Double, lat: Double): XY = {
      val rho = ell.a * math.sqrt(cC - n * qFac(ell, math.toRadians(lat))) / n
      val th = n * (math.toRadians(lon) - l0)
      (x0 + rho * math.sin(th), y0 + rho0 - rho * math.cos(th))
    }
    def inverse(x: Double, y: Double): XY = {
      val dx = x - x0; val dy = rho0 - (y - y0)
      val rho = math.sqrt(dx * dx + dy * dy)
      val q = (cC - math.pow(rho * n / ell.a, 2)) / n
      val th = math.atan2(math.signum(n) * dx, math.signum(n) * dy)
      // Snyder 3-16: Newton-ish fixed-point for phi from q (15 rounds)
      var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi); val es = ell.e * s
        val om = 1 - ell.e2 * s * s
        phi += om * om / (2 * math.cos(phi)) *
          (q / (1 - ell.e2) - s / om + 1 / (2 * ell.e) * math.log((1 - es) / (1 + es)))
        i += 1
      }
      (math.toDegrees(th / n + l0), math.toDegrees(phi))
    }
  }

  /**
   * Ellipsoidal Mercator (Snyder §7, eq. 7-7/7-8 forward, 7-9/7-10
   * inverse) — the EPSG:3395 "World Mercator" family (+proj=merc on a true
   * ellipsoid). NOT the spherical web/pseudo-mercator: on WGS84 the
   * ellipsoidal northing differs from the spherical one by ~0.1-0.3%
   * (kilometers at mid latitudes). Scale is pinned either by `k0` directly
   * (EPSG method 9804, variant A) or by a true-scale latitude `latTs`
   * (method 9805, variant B: k0 = m(latTs)). Poles diverge (y -> inf),
   * matching PROJ.
   */
  final case class Mercator(
      ell: Ellipsoid, lonNat: Double, k: Double, latTs: Double,
      x0: Double, y0: Double) {
    private val l0 = math.toRadians(lonNat)
    private val k0 = if (latTs == 0.0) k else k * mFac(ell, math.toRadians(latTs))

    def forward(lon: Double, lat: Double): XY = {
      // y = -a k0 ln t with Snyder's t (15-9): ln tan(pi/4 + phi/2) equals
      // -ln tan(pi/4 - phi/2), so eq. 7-7 folds onto the shared tFac helper
      val phi = math.toRadians(lat)
      (x0 + ell.a * k0 * (math.toRadians(lon) - l0),
        y0 - ell.a * k0 * math.log(tFac(ell, phi)))
    }
    def inverse(x: Double, y: Double): XY = {
      val t = math.exp(-(y - y0) / (ell.a * k0))
      // Snyder 7-9: fixed-point for phi from t (15 rounds, deterministic —
      // the same iteration as the LCC inverse)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val es = ell.e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - es) / (1 + es), ell.e / 2))
        i += 1
      }
      (math.toDegrees((x - x0) / (ell.a * k0) + l0), math.toDegrees(phi))
    }
  }

  /**
   * General Transverse Mercator (Krüger order-4 series, Karney 2011), any
   * natural origin / scale / false origin — the state-plane-style
   * parameterization. Forward AND inverse, sub-mm in-zone.
   */
  final case class TransverseMercator(
      ell: Ellipsoid, lat0: Double, lon0: Double, k0: Double,
      x0: Double, y0: Double) {
    private val n = ell.f / (2 - ell.f)
    private val a1 = ell.a / (1 + n) * (1 + n * n / 4 + n * n * n * n / 64)
    // Krüger coefficients to n^4 (Karney 2011 eq. 35-36): the order-4 terms
    // make forward/inverse true inverses to ~1e-7 m (order-3 pairs mismatch
    // at the n^4 * a ~ 3e-5 m level)
    private val alpha = Array(0.0,
      n / 2 - 2.0 / 3 * n * n + 5.0 / 16 * n * n * n + 41.0 / 180 * n * n * n * n,
      13.0 / 48 * n * n - 3.0 / 5 * n * n * n + 557.0 / 1440 * n * n * n * n,
      61.0 / 240 * n * n * n - 103.0 / 140 * n * n * n * n,
      49561.0 / 161280 * n * n * n * n)
    private val beta = Array(0.0,
      n / 2 - 2.0 / 3 * n * n + 37.0 / 96 * n * n * n - 1.0 / 360 * n * n * n * n,
      1.0 / 48 * n * n + 1.0 / 15 * n * n * n - 437.0 / 1440 * n * n * n * n,
      17.0 / 480 * n * n * n - 37.0 / 840 * n * n * n * n,
      4397.0 / 161280 * n * n * n * n)
    private val l0 = math.toRadians(lon0)

    private def xiEta(lonR: Double, latR: Double): (Double, Double) = {
      val sinPhi = math.sin(latR)
      val t = math.sinh(atanh(sinPhi) - ell.e * atanh(ell.e * sinPhi))
      val lam = lonR - l0
      val xiP = math.atan2(t, math.cos(lam))
      val etaP = atanh(math.sin(lam) / math.sqrt(1 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 4) {
        xi += alpha(j) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alpha(j) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
        j += 1
      }
      (xi, eta)
    }
    // meridian arc (scaled by A1) at the natural-origin latitude
    private val xi0 = if (lat0 == 0.0) 0.0 else xiEta(l0, math.toRadians(lat0))._1

    def forward(lon: Double, lat: Double): XY = {
      val (xi, eta) = xiEta(math.toRadians(lon), math.toRadians(lat))
      (x0 + k0 * a1 * eta, y0 + k0 * a1 * (xi - xi0))
    }

    def inverse(x: Double, y: Double): XY = {
      val xi = (y - y0) / (k0 * a1) + xi0
      val eta = (x - x0) / (k0 * a1)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 4) {
        xiP -= beta(j) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.max(-1.0, math.min(1.0, math.sin(xiP) / math.cosh(etaP))))
      val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
      // conformal-latitude inverse by fixed point (15 rounds, deterministic)
      var phi = chi
      var i = 0
      while (i < 15) {
        val es = ell.e * math.sin(phi)
        phi = 2 * math.atan(math.tan(math.Pi / 4 + chi / 2) *
          math.pow((1 + es) / (1 - es), ell.e / 2)) - math.Pi / 2
        i += 1
      }
      (math.toDegrees(lam + l0), math.toDegrees(phi))
    }
  }

  /**
   * Polar Stereographic, ellipsoidal (Snyder §21, eqs. 21-33..21-41; EPSG
   * methods 9829 variant B / 9810 variant A) — the polar-science CRS family
   * (EPSG:3031 Antarctic, EPSG:3413 NSIDC Arctic, EPSG:5041/5042 UPS) the
   * conic/cylindrical projections cannot reach (both degenerate at the
   * poles). Scale pinned by a true-scale latitude `latTs` (variant B:
   * rho = a·m(tsAbs)·t/t(tsAbs)) or by `k0` at the pole (variant A:
   * rho = 2·a·k0·t/sqrt((1+e)^(1+e)·(1−e)^(1−e))). South aspect runs the
   * north formulas on the mirrored latitude with northing flipped
   * (E = FE + rho·sinθ, N = FN + rho·cosθ — EPSG 9829 south convention).
   */
  final case class PolarStereographic(
      ell: Ellipsoid, south: Boolean, latTs: Double, k: Double,
      lon0: Double, x0: Double, y0: Double) {
    private val l0 = math.toRadians(lon0)
    // rho = rhoK * t in both variants
    private val rhoK: Double = {
      val tsAbs = math.abs(latTs)
      if (tsAbs < 90.0 - 1e-12) {
        val phiC = math.toRadians(tsAbs)
        ell.a * mFac(ell, phiC) / tFac(ell, phiC)
      } else
        2 * ell.a * k / math.sqrt(
          math.pow(1 + ell.e, 1 + ell.e) * math.pow(1 - ell.e, 1 - ell.e))
    }

    def forward(lon: Double, lat: Double): XY = {
      val phi = math.toRadians(if (south) -lat else lat)
      val rho = rhoK * tFac(ell, phi)
      val theta = math.toRadians(lon) - l0
      if (south) (x0 + rho * math.sin(theta), y0 + rho * math.cos(theta))
      else (x0 + rho * math.sin(theta), y0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): XY = {
      val dx = x - x0
      val dy = if (south) y - y0 else -(y - y0)
      val rho = math.hypot(dx, dy)
      val t = rho / rhoK
      // Snyder 7-9 fixed point for phi from t (same deterministic loop as
      // the Mercator/LCC inverses)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val es = ell.e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - es) / (1 + es), ell.e / 2))
        i += 1
      }
      val lam = if (rho == 0.0) l0 else l0 + math.atan2(dx, dy)
      // the full longitude circle is in-domain at the poles: wrap
      // l0 + atan2 back to [-180, 180)
      var lonDeg = math.toDegrees(lam)
      if (lonDeg >= 180) lonDeg -= 360
      else if (lonDeg < -180) lonDeg += 360
      (lonDeg, math.toDegrees(if (south) -phi else phi))
    }
  }

  /**
   * Oblique (double) Stereographic, EPSG method 9809 (Guidance Note 7-2):
   * ellipsoid -> conformal sphere -> stereographic — the projection behind
   * the Dutch RD New grid (EPSG:28992), which neither the polar
   * stereographic nor the conic family can express. Forward and inverse
   * follow the guidance-note formulation: conformal latitude via
   * w = c·[S1·S2^e]^n, sphere radius R = sqrt(rho0·nu0), and the
   * closed-form g/h/i/j inverse with a Newton step back to geodetic
   * latitude.
   */
  final case class ObliqueStereographic(
      ell: Ellipsoid, lat0: Double, lon0: Double, k0: Double,
      x0: Double, y0: Double) {
    private val e = ell.e
    private val e2 = ell.e2
    private val phi0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val s0 = math.sin(phi0)
    private val rho0 = ell.a * (1 - e2) / math.pow(1 - e2 * s0 * s0, 1.5)
    private val nu0 = ell.a / math.sqrt(1 - e2 * s0 * s0)
    private val bigR = math.sqrt(rho0 * nu0)
    private val n = math.sqrt(1 + e2 * math.pow(math.cos(phi0), 4) / (1 - e2))
    private val (c, chi0) = {
      val s1 = (1 + s0) / (1 - s0)
      val s2 = (1 - e * s0) / (1 + e * s0)
      val w1 = math.pow(s1 * math.pow(s2, e), n)
      val sinChi00 = (w1 - 1) / (w1 + 1)
      val cc = (n + s0) * (1 - sinChi00) / ((n - s0) * (1 + sinChi00))
      val w2 = cc * w1
      (cc, math.asin((w2 - 1) / (w2 + 1)))
    }
    private val sinChi0 = math.sin(chi0)
    private val cosChi0 = math.cos(chi0)

    def forward(lon: Double, lat: Double): XY = {
      val phi = math.toRadians(lat)
      val dLam = n * (math.toRadians(lon) - l0)
      val sp = math.sin(phi)
      val sa = (1 + sp) / (1 - sp)
      val sb = (1 - e * sp) / (1 + e * sp)
      val w = c * math.pow(sa * math.pow(sb, e), n)
      val chi = math.asin((w - 1) / (w + 1))
      val b = 1 + math.sin(chi) * sinChi0 + math.cos(chi) * cosChi0 * math.cos(dLam)
      (x0 + 2 * bigR * k0 * math.cos(chi) * math.sin(dLam) / b,
        y0 + 2 * bigR * k0 * (math.sin(chi) * cosChi0 - math.cos(chi) * sinChi0 * math.cos(dLam)) / b)
    }

    def inverse(x: Double, y: Double): XY = {
      val dE = x - x0
      val dN = y - y0
      val g = 2 * bigR * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * bigR * k0 * math.tan(chi0) + g
      val i = math.atan2(dE, h + dN)
      val j = math.atan2(dE, g - dN) - i
      val chi = chi0 + 2 * math.atan((dN - dE * math.tan(j / 2)) / (2 * bigR * k0))
      val dLam = j + 2 * i
      val lon = math.toDegrees(dLam / n + l0)
      // conformal -> geodetic: Newton on the isometric latitude (GN 7-2)
      val psi = 0.5 * math.log((1 + math.sin(chi)) / (c * (1 - math.sin(chi)))) / n
      var phi = 2 * math.atan(math.exp(psi)) - math.Pi / 2
      var it = 0
      while (it < 15) {
        val sp = math.sin(phi)
        val psiI = math.log(
          math.tan(phi / 2 + math.Pi / 4) *
            math.pow((1 - e * sp) / (1 + e * sp), e / 2))
        phi = phi - (psiI - psi) * math.cos(phi) * (1 - e2 * sp * sp) / (1 - e2)
        it += 1
      }
      (lon, math.toDegrees(phi))
    }
  }

  /**
   * Lambert Azimuthal Equal Area, EPSG method 9820 (Snyder §24 pp.
   * 187-190): authalic-latitude formulation on the ellipsoid — the
   * projection behind the ETRS89-LAEA Europe grid (EPSG:3035, the EU
   * INSPIRE standard statistical grid) and the polar LAEA family
   * (EPSG:3571-3576 Arctic). Oblique/equatorial aspect uses the
   * (beta0, Rq, D) construction; the polar aspects have their own
   * closed-form rho = a*sqrt(qP -/+ q). Inverse recovers the authalic
   * latitude, then Snyder eq. 3-16 fixed-point back to geodetic.
   */
  final case class LambertAzimuthalEqualArea(
      ell: Ellipsoid, lat0: Double, lon0: Double, x0: Double, y0: Double) {
    private val e = ell.e
    private val e2 = ell.e2
    private val l0 = math.toRadians(lon0)
    private val phi0 = math.toRadians(lat0)
    /** Snyder 3-12: q(phi). */
    private def q(phi: Double): Double = {
      val sp = math.sin(phi)
      (1 - e2) * (sp / (1 - e2 * sp * sp) -
        (1 / (2 * e)) * math.log((1 - e * sp) / (1 + e * sp)))
    }
    private val qP = q(math.Pi / 2)
    private val north = lat0 >= 90.0 - 1e-9
    private val south = lat0 <= -90.0 + 1e-9
    private val polar = north || south
    // oblique-aspect constants (unused in the polar branch)
    private val q0 = q(phi0)
    private val beta0 = if (polar) 0.0 else math.asin(q0 / qP)
    private val sinB0 = math.sin(beta0)
    private val cosB0 = math.cos(beta0)
    private val rq = ell.a * math.sqrt(qP / 2)
    private val m0 = math.cos(phi0) / math.sqrt(1 - e2 * math.pow(math.sin(phi0), 2))
    private val bigD = if (polar) 1.0 else ell.a * m0 / (rq * cosB0)

    def forward(lon: Double, lat: Double): XY = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon) - l0
      val qq = q(phi)
      if (polar) {
        // Snyder 24-23/24-25: rho = a*sqrt(qP - q) (north), a*sqrt(qP + q) (south)
        val rho = ell.a * math.sqrt(if (north) math.max(qP - qq, 0.0) else math.max(qP + qq, 0.0))
        if (north) (x0 + rho * math.sin(lam), y0 - rho * math.cos(lam))
        else (x0 + rho * math.sin(lam), y0 + rho * math.cos(lam))
      } else {
        val beta = math.asin(qq / qP)
        val sb = math.sin(beta); val cb = math.cos(beta); val cl = math.cos(lam)
        val b = rq * math.sqrt(2 / (1 + sinB0 * sb + cosB0 * cb * cl))
        (x0 + b * bigD * cb * math.sin(lam),
          y0 + (b / bigD) * (cosB0 * sb - sinB0 * cb * cl))
      }
    }

    /** Snyder 3-16 fixed point: geodetic latitude from q. */
    private def phiFromQ(qq: Double): Double = {
      if (math.abs(qq) >= math.abs(qP) - 1e-14) return if (qq >= 0) math.Pi / 2 else -math.Pi / 2
      var phi = math.asin(qq / 2)
      var i = 0
      while (i < 15) {
        val sp = math.sin(phi)
        val den = 1 - e2 * sp * sp
        phi = phi + den * den / (2 * math.cos(phi)) *
          (qq / (1 - e2) - sp / den + (1 / (2 * e)) * math.log((1 - e * sp) / (1 + e * sp)))
        i += 1
      }
      phi
    }

    def inverse(x: Double, y: Double): XY = {
      val dx = x - x0
      val dy = y - y0
      if (polar) {
        val rho = math.hypot(dx, dy)
        val qq0 = qP - math.pow(rho / ell.a, 2)
        val qq = if (north) qq0 else -qq0
        val lam =
          if (rho == 0.0) 0.0
          else if (north) math.atan2(dx, -dy)
          else math.atan2(dx, dy)
        var lonDeg = math.toDegrees(l0 + lam)
        if (lonDeg >= 180) lonDeg -= 360 else if (lonDeg < -180) lonDeg += 360
        (lonDeg, math.toDegrees(phiFromQ(qq)))
      } else {
        val rho = math.hypot(dx / bigD, bigD * dy)
        if (rho == 0.0) return (math.toDegrees(l0), math.toDegrees(phi0))
        val ce = 2 * math.asin(math.min(1.0, rho / (2 * rq)))
        val sc = math.sin(ce); val cc = math.cos(ce)
        val qq = qP * (cc * sinB0 + bigD * dy * sc * cosB0 / rho)
        val lam = math.atan2(dx * sc,
          bigD * rho * cosB0 * cc - bigD * bigD * dy * sinB0 * sc)
        (math.toDegrees(l0 + lam), math.toDegrees(phiFromQ(qq)))
      }
    }
  }

  /**
   * Sinusoidal (Sanson-Flamsteed), Snyder §30 — the equal-area projection
   * behind the MODIS land-tile grid (spherical, R = 6371007.181 authalic)
   * and ESRI:54008 World Sinusoidal. Spherical when `sphereR` is set:
   * x = R·dLam·cos(phi), y = R·phi. Ellipsoidal otherwise (Snyder 30-8/30-9):
   * x = a·dLam·cos(phi)/sqrt(1-e2·sin2(phi)), y = M(phi) meridian arc
   * (series 3-21), inverse via the rectifying-latitude series (3-26).
   * Equal-area in both forms.
   */
  /**
   * Mollweide (homolographic), Snyder §31 — THE classic equal-area world
   * projection (ESRI:54009 World Mollweide): elliptical outline, straight
   * parallels. Spherical formulas on radius `R` (PROJ's convention uses
   * the ellipsoid's semi-major axis as the sphere). Forward solves
   * 2th + sin 2th = pi sin(phi) by Newton (quadratic convergence, exact
   * poles short-circuited); inverse is closed-form.
   */
  /**
   * Equal Earth (Savric, Patterson & Jenny 2018) — the modern equal-area
   * world projection (ESRI:54035), a Robinson-like outline with exact
   * equal-area property; published polynomial in the parametric latitude
   * theta where sin(theta) = (sqrt(3)/2) sin(beta). Ellipsoidal form
   * matches PROJ's eqearth: beta is the AUTHALIC latitude
   * (sin(beta) = q(phi)/qP, Snyder 3-12) and the scale radius is the
   * authalic radius Rq = a*sqrt(qP/2), so positions agree with
   * PROJ/ESRI output on +ellps input. `sphereR` pins the spherical form
   * (beta = phi, radius R) for +R input. Inverse solves the
   * y-polynomial for theta by Newton (quadratic convergence), then
   * recovers phi from the authalic latitude by Newton on q.
   */
  final case class EqualEarth(
      ell: Ellipsoid, sphereR: Option[Double], lon0: Double, x0: Double, y0: Double) {
    private val l0 = math.toRadians(lon0)
    private val spherical = sphereR.isDefined
    private val e = ell.e
    private val e2 = ell.e2
    /** Snyder 3-12: q(phi) from sin(phi). */
    private def qOfSin(sp: Double): Double =
      (1 - e2) * (sp / (1 - e2 * sp * sp) -
        (1 / (2 * e)) * math.log((1 - e * sp) / (1 + e * sp)))
    private val qP = if (spherical) 2.0 else qOfSin(1.0)
    private val R = sphereR.getOrElse(ell.a * math.sqrt(qP / 2))
    /** sin of the authalic latitude (identity for the spherical form). */
    private def sinBeta(phi: Double): Double =
      if (spherical) math.sin(phi)
      else math.max(-1.0, math.min(1.0, qOfSin(math.sin(phi)) / qP))
    /** Snyder 3-16 fixed point: geodetic latitude back from sin(beta). */
    private def phiFromSinBeta(sb: Double): Double = {
      if (spherical) return math.asin(math.max(-1.0, math.min(1.0, sb)))
      val qq = sb * qP
      if (math.abs(qq) >= math.abs(qP) - 1e-14)
        return if (qq >= 0) math.Pi / 2 else -math.Pi / 2
      var phi = math.asin(qq / 2)
      var i = 0
      while (i < 15) {
        val sp = math.sin(phi)
        val den = 1 - e2 * sp * sp
        phi = phi + den * den / (2 * math.cos(phi)) *
          (qq / (1 - e2) - sp / den + (1 / (2 * e)) * math.log((1 - e * sp) / (1 + e * sp)))
        i += 1
      }
      phi
    }
    private val A1 = 1.340264
    private val A2 = -0.081106
    private val A3 = 0.000893
    private val A4 = 0.003796
    private val Mc = math.sqrt(3.0) / 2.0
    private def yPoly(t: Double): Double = {
      val t2 = t * t; val t6 = t2 * t2 * t2
      t * (A1 + A2 * t2 + t6 * (A3 + A4 * t2))
    }
    private def yPolyD(t: Double): Double = {
      val t2 = t * t; val t6 = t2 * t2 * t2
      A1 + 3 * A2 * t2 + t6 * (7 * A3 + 9 * A4 * t2)
    }
    def forward(lon: Double, lat: Double): XY = {
      val phi = math.toRadians(lat)
      var dLam = math.toRadians(lon) - l0
      if (dLam > math.Pi) dLam -= 2 * math.Pi else if (dLam < -math.Pi) dLam += 2 * math.Pi
      val th = math.asin(math.max(-1.0, math.min(1.0, Mc * sinBeta(phi))))
      (x0 + R * dLam * math.cos(th) / (Mc * yPolyD(th)),
        y0 + R * yPoly(th))
    }
    def inverse(x: Double, y: Double): XY = {
      val target = (y - y0) / R
      var th = target // good start: yPoly ~ A1*t near 0
      var i = 0
      while (i < 50) {
        val next = th - (yPoly(th) - target) / yPolyD(th)
        if (math.abs(next - th) < 1e-15) { th = next; i = 50 } else { th = next; i += 1 }
      }
      val phi = phiFromSinBeta(math.sin(th) / Mc)
      val cosTh = math.cos(th)
      val lam =
        if (cosTh < 1e-12) l0
        else l0 + (x - x0) * Mc * yPolyD(th) / (R * cosTh)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  final case class Mollweide(R: Double, lon0: Double, x0: Double, y0: Double) {
    private val l0 = math.toRadians(lon0)
    private val Sqrt2 = math.sqrt(2.0)
    private def theta(phi: Double): Double = {
      val target = math.Pi * math.sin(phi)
      if (math.abs(phi) >= math.Pi / 2 - 1e-12) return math.signum(phi) * math.Pi / 2
      var th = phi
      var i = 0
      while (i < 50) {
        val f = 2 * th + math.sin(2 * th) - target
        val d = 2 + 2 * math.cos(2 * th)
        if (math.abs(d) < 1e-15) return th
        val next = th - f / d
        if (math.abs(next - th) < 1e-15) return next
        th = next
        i += 1
      }
      th
    }
    def forward(lon: Double, lat: Double): XY = {
      val phi = math.toRadians(lat)
      var dLam = math.toRadians(lon) - l0
      if (dLam > math.Pi) dLam -= 2 * math.Pi else if (dLam < -math.Pi) dLam += 2 * math.Pi
      val th = theta(phi)
      (x0 + 2 * Sqrt2 / math.Pi * R * dLam * math.cos(th),
        y0 + Sqrt2 * R * math.sin(th))
    }
    def inverse(x: Double, y: Double): XY = {
      val sinTh = math.max(-1.0, math.min(1.0, (y - y0) / (Sqrt2 * R)))
      val th = math.asin(sinTh)
      val phi = math.asin(math.max(-1.0, math.min(1.0,
        (2 * th + math.sin(2 * th)) / math.Pi)))
      val cosTh = math.cos(th)
      val lam =
        if (cosTh < 1e-12) l0
        else l0 + math.Pi * (x - x0) / (2 * Sqrt2 * R * cosTh)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  final case class Sinusoidal(
      ell: Ellipsoid, sphereR: Option[Double], lon0: Double, x0: Double, y0: Double) {
    private val l0 = math.toRadians(lon0)
    private val e2 = ell.e2
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    // meridian-arc coefficients (Snyder 3-21)
    private val m0c = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    private val m2c = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
    private val m4c = 15 * e4 / 256 + 45 * e6 / 1024
    private val m6c = 35 * e6 / 3072
    private def arc(phi: Double): Double =
      ell.a * (m0c * phi - m2c * math.sin(2 * phi) + m4c * math.sin(4 * phi) - m6c * math.sin(6 * phi))
    // rectifying-latitude inverse coefficients (Snyder 3-24/3-26)
    private val e1 = {
      val s = math.sqrt(1 - e2); (1 - s) / (1 + s)
    }
    private def phiFromArc(m: Double): Double = {
      val mu = m / (ell.a * m0c)
      mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    }

    def forward(lon: Double, lat: Double): XY = {
      val phi = math.toRadians(lat)
      var dLam = math.toRadians(lon) - l0
      if (dLam > math.Pi) dLam -= 2 * math.Pi else if (dLam < -math.Pi) dLam += 2 * math.Pi
      sphereR match {
        case Some(r) => (x0 + r * dLam * math.cos(phi), y0 + r * phi)
        case None =>
          (x0 + ell.a * dLam * math.cos(phi) / math.sqrt(1 - e2 * math.pow(math.sin(phi), 2)),
            y0 + arc(phi))
      }
    }

    def inverse(x: Double, y: Double): XY = {
      val dx = x - x0; val dy = y - y0
      val (phi, dLam) = sphereR match {
        case Some(r) =>
          val p = dy / r
          (p, if (math.abs(math.cos(p)) < 1e-12) 0.0 else dx / (r * math.cos(p)))
        case None =>
          val p = phiFromArc(dy)
          val c = math.cos(p)
          (p, if (math.abs(c) < 1e-12) 0.0
              else dx * math.sqrt(1 - e2 * math.pow(math.sin(p), 2)) / (ell.a * c))
      }
      var lonDeg = math.toDegrees(l0 + dLam)
      if (lonDeg > 180) lonDeg -= 360 else if (lonDeg < -180) lonDeg += 360
      (lonDeg, math.toDegrees(phi))
    }
  }

  /** The MODIS authalic sphere radius (meters). */
  val ModisSphereR = 6371007.181

  /**
   * Spherical DIRECT geodesic (the forward problem, twin of the inverse
   * distance functions in [[Geodesy]]): the point `distMeters` along the
   * great circle leaving (lon, lat) at initial bearing `azimuthDeg`
   * (clockwise from north), on [[Geodesy.MeanEarthRadius]] so
   * st_distancesphere round-trips the distance exactly. Standard direct
   * formulas; pole/antimeridian-safe (atan2, lon naturally wraps).
   */
  def directSphere(lon: Double, lat: Double,
                   azimuthDeg: Double, distMeters: Double): (Double, Double) = {
    val f1 = math.toRadians(lat)
    val th = math.toRadians(azimuthDeg)
    val dl = distMeters / Geodesy.MeanEarthRadius
    val sinF2 = math.sin(f1) * math.cos(dl) + math.cos(f1) * math.sin(dl) * math.cos(th)
    val f2 = math.asin(math.max(-1.0, math.min(1.0, sinF2)))
    val lon2 = math.toRadians(lon) + math.atan2(
      math.sin(th) * math.sin(dl) * math.cos(f1),
      math.cos(dl) - math.sin(f1) * sinF2)
    // normalize to (-180, 180]
    val lonDeg = {
      val x = math.toDegrees(lon2)
      val w = ((x + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
      if (w == -180.0) 180.0 else w
    }
    (lonDeg, math.toDegrees(f2))
  }

  /**
   * Spherical azimuthal equidistant, oblique aspect (Snyder §25,
   * eq. 25-2..25-15): planar distance FROM THE PROJECTION CENTER equals
   * great-circle distance exactly — the projection behind geodesic
   * buffering (project, planar buffer, inverse), PostGIS's
   * ST_Buffer(geography) strategy. R defaults to [[Geodesy.MeanEarthRadius]]
   * so distances agree with st_distancesphere's haversine.
   */
  final case class AzimuthalEquidistant(R: Double, lon0: Double, lat0: Double) {
    private val f0 = math.toRadians(lat0)
    private val sin0 = math.sin(f0)
    private val cos0 = math.cos(f0)
    def forward(lon: Double, lat: Double): XY = {
      val la = math.toRadians(lat)
      val dl = math.toRadians(lon - lon0)
      val cosc = sin0 * math.sin(la) + cos0 * math.cos(la) * math.cos(dl)
      val c = math.acos(math.max(-1.0, math.min(1.0, cosc)))
      val kp = if (c < 1e-12) 1.0 else c / math.sin(c)
      (R * kp * math.cos(la) * math.sin(dl),
        R * kp * (cos0 * math.sin(la) - sin0 * math.cos(la) * math.cos(dl)))
    }
    def inverse(x: Double, y: Double): XY = {
      val rho = math.sqrt(x * x + y * y)
      if (rho < 1e-9) return (lon0, lat0)
      val c = rho / R
      val sinc = math.sin(c); val cosc = math.cos(c)
      val lat = math.asin(math.max(-1.0, math.min(1.0,
        cosc * sin0 + y * sinc * cos0 / rho)))
      val lon = math.toRadians(lon0) +
        math.atan2(x * sinc, rho * cos0 * cosc - y * sin0 * sinc)
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** Lambert-93 (EPSG:2154, France), CONUS Albers (EPSG:5070), California
    * Albers (EPSG:3310), Statistics-Canada LCC (EPSG:3347) — parameters from
    * the EPSG registry entries for these CRSs. */
  val Lambert93 = LambertConic(GRS80, 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0)
  val ConusAlbers = AlbersConic(GRS80, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
  val CaliforniaAlbers = AlbersConic(GRS80, 34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0)
  val StatCanLcc = LambertConic(GRS80, 49.0, 77.0, 63.390675, -91.866667, 6200000.0, 3000000.0)

  /** Registry keyed by "EPSG:xxxx" pairs. Extensible via register(). */
  private val transforms = scala.collection.concurrent.TrieMap[(String, String), XY => XY](
    ("EPSG:4326", "EPSG:3857") -> { case (x, y) => lonLatToWebMercator(x, y) },
    ("EPSG:3857", "EPSG:4326") -> { case (x, y) => webMercatorToLonLat(x, y) },
    ("EPSG:4326", "EPSG:4326") -> identity,
    ("EPSG:3857", "EPSG:3857") -> identity,
    ("EPSG:4326", "EPSG:2154") -> { case (x, y) => Lambert93.forward(x, y) },
    ("EPSG:2154", "EPSG:4326") -> { case (x, y) => Lambert93.inverse(x, y) },
    ("EPSG:4326", "EPSG:5070") -> { case (x, y) => ConusAlbers.forward(x, y) },
    ("EPSG:5070", "EPSG:4326") -> { case (x, y) => ConusAlbers.inverse(x, y) },
    ("EPSG:4326", "EPSG:3310") -> { case (x, y) => CaliforniaAlbers.forward(x, y) },
    ("EPSG:3310", "EPSG:4326") -> { case (x, y) => CaliforniaAlbers.inverse(x, y) },
    ("EPSG:4326", "EPSG:3347") -> { case (x, y) => StatCanLcc.forward(x, y) },
    ("EPSG:3347", "EPSG:4326") -> { case (x, y) => StatCanLcc.inverse(x, y) })

  def register(from: String, to: String, fn: XY => XY): Unit = transforms((norm(from), norm(to))) = fn

  /**
   * Parse a proj4-style definition into (forward, inverse) against
   * EPSG:4326 lon/lat — the reference accepts arbitrary PROJ strings /
   * PROJJSON via the PROJ C library (geopolars-geo/src/ops/proj.rs:33-70,
   * py-geopolars geoseries.py:257-261); here the common published-formula
   * projections are implemented natively: lcc, aea, tmerc, utm, merc,
   * longlat, with +ellps=GRS80|WGS84, +lat_0/1/2, +lon_0, +k_0/+k,
   * +x_0/+y_0, +zone, +south.
   */
  def fromProj4(definition: String): (XY => XY, XY => XY) = {
    val kv = definition.trim.split("\\s+").filter(_.startsWith("+")).map { tok =>
      val t = tok.drop(1)
      val i = t.indexOf('=')
      if (i < 0) (t, "") else (t.take(i), t.drop(i + 1))
    }.toMap
    def d(k: String, dflt: Double) = kv.get(k).map(_.toDouble).getOrElse(dflt)
    val ell = kv.getOrElse("ellps", kv.getOrElse("datum", "WGS84")) match {
      case "GRS80" | "NAD83" => GRS80
      case "airy" => Airy1830
      case "intl" | "ED50" => Intl1924
      case "bessel" => Bessel1841
      case "clrk80ign" => Clarke1880IGN
      case _ => WGS84E
    }
    // +towgs84=dx,dy,dz[,rx,ry,rz,ds]: local datum -> WGS84 Helmert; an
    // all-zero list is the explicit null transform
    val helmert = kv.get("towgs84")
      .map(_.split(",").map(_.trim.toDouble).padTo(7, 0.0))
      .filter(_.exists(_ != 0.0))
      .map(p => Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6)))
    val (projFwd, projInv): (XY => XY, XY => XY) =
      kv.getOrElse("proj", "") match {
      case "longlat" => (identity[XY] _, identity[XY] _)
      case "merc" =>
        // '+proj=merc' is ellipsoidal Mercator (EPSG:3395 style) unless the
        // definition pins a sphere (+R, +a==+b, +ellps=sphere) — the
        // web-mercator spelling. Routing every merc to the spherical
        // formulas was silently ~0.1-0.3% wrong in northing on WGS84.
        val sphere = kv.contains("R") || kv.get("ellps").contains("sphere") ||
          (kv.contains("a") && kv.get("a") == kv.get("b"))
        if (sphere) {
          val r = kv.get("R").orElse(kv.get("a")).map(_.toDouble).getOrElse(Geodesy.WGS84_A)
          ({ case (x, y) =>
              val la = math.max(-85.06, math.min(85.06, y))
              (r * math.toRadians(x), r * math.log(math.tan(math.Pi / 4 + math.toRadians(la) / 2))) },
            { case (x, y) =>
              (math.toDegrees(x / r), math.toDegrees(2 * math.atan(math.exp(y / r)) - math.Pi / 2)) })
        } else {
          val p = Mercator(ell, d("lon_0", 0), d("k_0", d("k", 1.0)),
            d("lat_ts", 0), d("x_0", 0), d("y_0", 0))
          ((p.forward _).tupled, (p.inverse _).tupled)
        }
      case "lcc" =>
        val p = LambertConic(ell, d("lat_1", 0), d("lat_2", d("lat_1", 0)),
          d("lat_0", 0), d("lon_0", 0), d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "aea" =>
        val p = AlbersConic(ell, d("lat_1", 0), d("lat_2", d("lat_1", 0)),
          d("lat_0", 0), d("lon_0", 0), d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "tmerc" =>
        val p = TransverseMercator(ell, d("lat_0", 0), d("lon_0", 0),
          d("k_0", d("k", 1.0)), d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "utm" =>
        val zone = d("zone", 30).toInt
        val south = kv.contains("south")
        val p = TransverseMercator(ell, 0, zone * 6 - 183, 0.9996,
          500000.0, if (south) 10000000.0 else 0.0)
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "stere" =>
        val lat0 = d("lat_0", 90)
        require(math.abs(math.abs(lat0) - 90) < 1e-9,
          s"+proj=stere supported in the polar aspect only (+lat_0=+/-90), got +lat_0=$lat0")
        val p = PolarStereographic(ell, south = lat0 < 0,
          latTs = d("lat_ts", 90), k = d("k_0", d("k", 1.0)),
          lon0 = d("lon_0", 0), x0 = d("x_0", 0), y0 = d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "sterea" =>
        val p = ObliqueStereographic(ell, d("lat_0", 0), d("lon_0", 0),
          d("k_0", d("k", 1.0)), d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "laea" =>
        val p = LambertAzimuthalEqualArea(ell, d("lat_0", 0), d("lon_0", 0),
          d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "sinu" =>
        // +R pins the spherical (MODIS) form; an ellipsoid gives Snyder's
        // ellipsoidal sinusoidal (ESRI:54008 style)
        val p = Sinusoidal(ell, kv.get("R").map(_.toDouble),
          d("lon_0", 0), d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "moll" =>
        // spherical on +R, else on the ellipsoid's semi-major axis
        // (PROJ's Mollweide convention)
        val p = Mollweide(kv.get("R").map(_.toDouble).getOrElse(ell.a),
          d("lon_0", 0), d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case "eqearth" =>
        // +R pins the spherical form; +ellps gives PROJ's authalic form
        val p = EqualEarth(ell, kv.get("R").map(_.toDouble),
          d("lon_0", 0), d("x_0", 0), d("y_0", 0))
        ((p.forward _).tupled, (p.inverse _).tupled)
      case other => throw new IllegalArgumentException(
        s"unsupported +proj=$other (supported: longlat, merc, lcc, aea, tmerc, utm, stere[polar], sterea, laea, sinu, moll, eqearth)")
    }
    helmert match {
      case None => (projFwd, projInv)
      case Some(h) =>
        // datum'd CRS: the 4326 legs pass through geocentric space —
        // forward = WGS84 lon/lat -> local-datum lon/lat -> projected;
        // inverse = unproject -> local-datum lon/lat -> WGS84 lon/lat
        val wgsToLocal: XY => XY = { case (lon, lat) =>
          val (x, y, z) = geodeticToGeocentric(WGS84E, lon, lat)
          val (x2, y2, z2) = h.fromWgs(x, y, z)
          geocentricToGeodetic(ell, x2, y2, z2)
        }
        val localToWgs: XY => XY = { case (lon, lat) =>
          val (x, y, z) = geodeticToGeocentric(ell, lon, lat)
          val (x2, y2, z2) = h.toWgs(x, y, z)
          geocentricToGeodetic(WGS84E, x2, y2, z2)
        }
        (p => projFwd(wgsToLocal(p)), p => localToWgs(projInv(p)))
    }
  }

  /** Register `tag` <-> EPSG:4326 from a proj4 definition (both directions). */
  def registerProj4(tag: String, definition: String): Unit = {
    val (fwd, inv) = fromProj4(definition)
    register("EPSG:4326", tag, fwd)
    register(tag, "EPSG:4326", inv)
  }

  /**
   * Options object for CRS resolution — the analog of the reference's
   * `ProjOptions { search_paths }` (geopolars-geo/src/ops/proj.rs:12-31),
   * which points PROJ at extra resource directories. An offline engine has
   * no proj.db; here a search path is a directory of custom CRS definition
   * files that get registered before transforming:
   *   `<TAG>.proj4`    — a proj4 string (TAG's first '_' becomes ':', so
   *                      `EPSG_32633.proj4` registers "EPSG:32633")
   *   `<TAG>.projjson` — a PROJJSON document
   */
  final case class ProjOptions(searchPaths: Seq[String] = Nil)

  /** Scan the option's search paths and register every definition found;
    * returns the registered tags (idempotent — re-registration replaces).
    * Unreadable/invalid entries are skipped, not fatal — one bad file must
    * not abort the rest of the directory. NOTE: the registry is a
    * driver-JVM static; like registerProj4/registerProjJson, custom tags
    * registered here are visible to local-mode executors (this project's
    * deployment target) but a multi-JVM cluster would need the
    * registration replayed on executors (e.g. from a static init). */
  def registerSearchPaths(options: ProjOptions): Seq[String] =
    options.searchPaths.flatMap { dir =>
      val d = new java.io.File(dir)
      val files = Option(d.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      files.toSeq.filter(_.isFile).flatMap { f =>
        val name = f.getName
        def tag(stem: String): String = stem.replaceFirst("_", ":")
        val attempt = scala.util.Try {
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8).trim
          if (name.endsWith(".proj4")) {
            val t = tag(name.stripSuffix(".proj4"))
            registerProj4(t, text); Some(t)
          } else if (name.endsWith(".projjson")) {
            val t = tag(name.stripSuffix(".projjson"))
            registerProjJson(t, text); Some(t)
          } else None
        }
        attempt.getOrElse(None)
      }
    }

  // Built-in national grids on non-WGS84 datums — the first real-world CRSs
  // a Helmert-less registry breaks on. Parameters are the published EPSG
  // proj4 definitions; accuracy is single-Helmert (~2 m vs the OSTN/NTv2
  // grid truth), the documented bound of [[Helmert]].
  registerProj4("EPSG:27700", // British National Grid (OSGB36 / Airy 1830)
    "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 " +
      "+ellps=airy +towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489")
  registerProj4("OSGB36", // the same datum, geographic (lon/lat on Airy)
    "+proj=longlat +ellps=airy +towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489")
  registerProj4("EPSG:31370", // Belgian Lambert 72 (Intl 1924)
    "+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 +lat_0=90 " +
      "+lon_0=4.367486666666666 +x_0=150000.013 +y_0=5400088.438 " +
      "+ellps=intl +towgs84=-106.8686,52.2978,-103.7239,0.3366,-0.457,1.8422,-1.2747")
  registerProj4("EPSG:3031", // Antarctic Polar Stereographic (WGS84)
    "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
  registerProj4("EPSG:3413", // NSIDC Sea Ice Polar Stereographic North
    "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +ellps=WGS84")
  registerProj4("EPSG:5041", // UPS North (variant A, k0 at the pole)
    "+proj=stere +lat_0=90 +lat_ts=90 +lon_0=0 +k=0.994 +x_0=2000000 +y_0=2000000 +ellps=WGS84")
  registerProj4("EPSG:5042", // UPS South
    "+proj=stere +lat_0=-90 +lat_ts=-90 +lon_0=0 +k=0.994 +x_0=2000000 +y_0=2000000 +ellps=WGS84")
  registerProj4("EPSG:28992", // RD New / Amersfoort (oblique stereographic, Bessel)
    "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 " +
      "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel " +
      "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725")
  registerProj4("EPSG:3035", // ETRS89-LAEA Europe (EU INSPIRE statistical grid)
    "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80")
  registerProj4("EPSG:3571", // North Pole LAEA Bering Sea (WGS84)
    "+proj=laea +lat_0=90 +lon_0=180 +x_0=0 +y_0=0 +ellps=WGS84")
  registerProj4("EPSG:3574", // North Pole LAEA Atlantic
    "+proj=laea +lat_0=90 +lon_0=-40 +x_0=0 +y_0=0 +ellps=WGS84")
  registerProj4("MODIS", // the MODIS land-tile sinusoidal grid (authalic sphere)
    "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181")
  registerProj4("ESRI:54008", // World Sinusoidal (WGS84 ellipsoid)
    "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
  registerProj4("ESRI:54009", // World Mollweide (spherical on WGS84 a)
    "+proj=moll +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
  registerProj4("ESRI:54035", // Equal Earth (ellipsoidal/authalic, PROJ-matching)
    "+proj=eqearth +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")

  /**
   * Parse a PROJJSON ProjectedCRS document into (forward, inverse) against
   * EPSG:4326 — the other CRS spelling the reference accepts
   * (py-geopolars geoseries.py:257-261 passes pyproj CRS -> PROJJSON).
   * Conversion methods are matched by EPSG method code (name as fallback):
   * 9802 LCC 2SP, 9822 Albers, 9807 Transverse Mercator, 3856/1024
   * Popular-Web Mercator; parameters by EPSG parameter code. The ellipsoid
   * comes from base_crs.datum.ellipsoid (semi_major_axis +
   * inverse_flattening).
   */
  def fromProjJson(json: String): (XY => XY, XY => XY) = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    if (Option(root.get("type")).exists(_.asText == "BoundCRS")) {
      // BoundCRS = source CRS + a datum transformation to WGS84 (the
      // PROJJSON spelling of +towgs84). Supported transformation methods:
      // Position Vector (EPSG 9606/1033) and Coordinate Frame rotation
      // (9607/1032, opposite rotation sign), 3- or 7-parameter.
      val src = root.get("source_crs")
      val tr = root.get("transformation")
      require(src != null && tr != null, "PROJJSON BoundCRS: need source_crs + transformation")
      val (projFwd, projInv) = fromCrsNode(src)
      val srcEll = projJsonEllipsoid(src)
      val tm = tr.get("method")
      val tmCode = Option(tm).flatMap(n => Option(n.get("id"))).map(_.get("code").asInt).getOrElse(-1)
      val tmName = Option(tm).flatMap(n => Option(n.get("name"))).map(_.asText.toLowerCase).getOrElse("")
      val coordFrame = tmCode == 9607 || tmCode == 1032 || tmName.contains("coordinate frame")
      val tp = {
        val it = tr.get("parameters").elements()
        val byCode = scala.collection.mutable.Map.empty[Int, Double]
        val byName = scala.collection.mutable.Map.empty[String, Double]
        while (it.hasNext) {
          val p = it.next()
          val v = p.get("value").asDouble
          Option(p.get("id")).foreach(id => byCode(id.get("code").asInt) = v)
          Option(p.get("name")).foreach(n => byName(n.asText.toLowerCase) = v)
        }
        (code: Int, name: String) => byCode.get(code).orElse(byName.get(name)).getOrElse(0.0)
      }
      val sgn = if (coordFrame) -1.0 else 1.0
      val h = Helmert(
        tp(8605, "x-axis translation"), tp(8606, "y-axis translation"),
        tp(8607, "z-axis translation"),
        sgn * tp(8608, "x-axis rotation"), sgn * tp(8609, "y-axis rotation"),
        sgn * tp(8610, "z-axis rotation"), tp(8611, "scale difference"))
      val wgsToLocal: XY => XY = { case (lon, lat) =>
        val (x, y, z) = geodeticToGeocentric(WGS84E, lon, lat)
        val (x2, y2, z2) = h.fromWgs(x, y, z)
        geocentricToGeodetic(srcEll, x2, y2, z2)
      }
      val localToWgs: XY => XY = { case (lon, lat) =>
        val (x, y, z) = geodeticToGeocentric(srcEll, lon, lat)
        val (x2, y2, z2) = h.toWgs(x, y, z)
        geocentricToGeodetic(WGS84E, x2, y2, z2)
      }
      (p => projFwd(wgsToLocal(p)), p => localToWgs(projInv(p)))
    } else fromCrsNode(root)
  }

  /** Ellipsoid of a PROJJSON CRS node: ProjectedCRS reads
    * base_crs.datum.ellipsoid, GeographicCRS reads datum.ellipsoid;
    * datum ensembles fall back to their members' common ellipsoid field. */
  private def projJsonEllipsoid(node: com.fasterxml.jackson.databind.JsonNode): Ellipsoid = {
    val base = Option(node.get("base_crs")).getOrElse(node)
    val datum = Option(base.get("datum")).orElse(Option(base.get("datum_ensemble")))
    datum.flatMap(d => Option(d.get("ellipsoid")))
      .map(n => Ellipsoid(n.get("semi_major_axis").asDouble,
        n.get("inverse_flattening").asDouble))
      .getOrElse(WGS84E)
  }

  private def fromCrsNode(root: com.fasterxml.jackson.databind.JsonNode): (XY => XY, XY => XY) = {
    if (Option(root.get("type")).exists(_.asText == "GeographicCRS"))
      return (identity[XY] _, identity[XY] _)
    val conv = root.get("conversion")
    require(conv != null, "PROJJSON: expected a ProjectedCRS with a conversion")
    val method = conv.get("method")
    val methodCode =
      Option(method.get("id")).map(_.get("code").asInt).getOrElse(-1)
    val methodName =
      Option(method.get("name")).map(_.asText.toLowerCase).getOrElse("")
    val params = {
      val it = conv.get("parameters").elements()
      val buf = scala.collection.mutable.Map.empty[Int, Double]
      val byName = scala.collection.mutable.Map.empty[String, Double]
      while (it.hasNext) {
        val p = it.next()
        val v = p.get("value").asDouble
        Option(p.get("id")).foreach(id => buf(id.get("code").asInt) = v)
        Option(p.get("name")).foreach(n => byName(n.asText.toLowerCase) = v)
      }
      (code: Int, name: String, dflt: Double) =>
        buf.get(code).orElse(byName.get(name.toLowerCase)).getOrElse(dflt)
    }
    val ell = {
      val e = Option(root.get("base_crs"))
        .flatMap(b => Option(b.get("datum"))).flatMap(d => Option(d.get("ellipsoid")))
      e.map(n => Ellipsoid(n.get("semi_major_axis").asDouble,
          n.get("inverse_flattening").asDouble))
        .getOrElse(WGS84E)
    }
    def lccOrAea(isLcc: Boolean): (XY => XY, XY => XY) = {
      val lat0 = params(8821, "latitude of false origin", 0)
      val lon0 = params(8822, "longitude of false origin", 0)
      val lat1 = params(8823, "latitude of 1st standard parallel", lat0)
      val lat2 = params(8824, "latitude of 2nd standard parallel", lat1)
      val x0 = params(8826, "easting at false origin", 0)
      val y0 = params(8827, "northing at false origin", 0)
      if (isLcc) {
        val p = LambertConic(ell, lat1, lat2, lat0, lon0, x0, y0)
        ((p.forward _).tupled, (p.inverse _).tupled)
      } else {
        val p = AlbersConic(ell, lat1, lat2, lat0, lon0, x0, y0)
        ((p.forward _).tupled, (p.inverse _).tupled)
      }
    }
    if (methodCode == 9802 || methodName.contains("lambert conic conformal"))
      lccOrAea(isLcc = true)
    else if (methodCode == 9822 || methodName.contains("albers"))
      lccOrAea(isLcc = false)
    else if (methodCode == 9807 || methodName.contains("transverse mercator")) {
      val p = TransverseMercator(ell,
        params(8801, "latitude of natural origin", 0),
        params(8802, "longitude of natural origin", 0),
        params(8805, "scale factor at natural origin", 1.0),
        params(8806, "false easting", 0),
        params(8807, "false northing", 0))
      ((p.forward _).tupled, (p.inverse _).tupled)
    } else if (methodCode == 1024 || methodCode == 3856 ||
        methodName.contains("popular visualisation pseudo mercator")) {
      ({ case (x, y) => lonLatToWebMercator(x, y) },
        { case (x, y) => webMercatorToLonLat(x, y) })
    } else if (methodCode == 9804 || methodCode == 9805 ||
        (methodName.contains("mercator") && !methodName.contains("transverse"))) {
      // true-ellipsoid Mercator: variant A pins k0 (9804), variant B a
      // true-scale latitude (9805)
      val p = Mercator(ell,
        params(8802, "longitude of natural origin", 0),
        params(8805, "scale factor at natural origin", 1.0),
        params(8823, "latitude of 1st standard parallel", 0),
        params(8806, "false easting", 0),
        params(8807, "false northing", 0))
      ((p.forward _).tupled, (p.inverse _).tupled)
    } else if (methodCode == 9829 || methodCode == 9810 ||
        methodName.contains("polar stereographic")) {
      // variant B (9829) pins a standard parallel, variant A (9810) k0 at
      // the pole; the aspect (north/south) follows the origin latitude's
      // sign (variant B: standard parallel; variant A: natural origin)
      val latTs = params(8832, "latitude of standard parallel",
        params(8801, "latitude of natural origin", 90))
      val lon0 = params(8833, "longitude of origin",
        params(8802, "longitude of natural origin", 0))
      val p = PolarStereographic(ell, south = latTs < 0, latTs = latTs,
        k = params(8805, "scale factor at natural origin", 1.0),
        lon0 = lon0,
        x0 = params(8806, "false easting", 0),
        y0 = params(8807, "false northing", 0))
      ((p.forward _).tupled, (p.inverse _).tupled)
    } else if (methodCode == 9820 || methodName.contains("lambert azimuthal equal area")) {
      val p = LambertAzimuthalEqualArea(ell,
        params(8801, "latitude of natural origin", 0),
        params(8802, "longitude of natural origin", 0),
        params(8806, "false easting", 0),
        params(8807, "false northing", 0))
      ((p.forward _).tupled, (p.inverse _).tupled)
    } else if (methodCode == 9809 || methodName.contains("oblique stereographic")) {
      val p = ObliqueStereographic(ell,
        params(8801, "latitude of natural origin", 0),
        params(8802, "longitude of natural origin", 0),
        params(8805, "scale factor at natural origin", 1.0),
        params(8806, "false easting", 0),
        params(8807, "false northing", 0))
      ((p.forward _).tupled, (p.inverse _).tupled)
    } else throw new IllegalArgumentException(
      s"unsupported PROJJSON conversion method '$methodName' (code $methodCode)")
  }

  /** Register `tag` <-> EPSG:4326 from a PROJJSON document. */
  def registerProjJson(tag: String, json: String): Unit = {
    val (fwd, inv) = fromProjJson(json)
    register("EPSG:4326", tag, fwd)
    register(tag, "EPSG:4326", inv)
  }

  private def norm(s: String): String = {
    val u = s.trim.toUpperCase
    if (u.forall(_.isDigit)) s"EPSG:$u" else u
  }

  // UTM zones resolved dynamically: EPSG:326xx (N) / 327xx (S)
  private def utmTm(code: String): Option[TransverseMercator] =
    if (code.startsWith("EPSG:326") && code.length == 10)
      Some(TransverseMercator(WGS84E,
        0, code.substring(8).toInt * 6 - 183, 0.9996, 500000.0, 0.0))
    else if (code.startsWith("EPSG:327") && code.length == 10)
      Some(TransverseMercator(WGS84E,
        0, code.substring(8).toInt * 6 - 183, 0.9996, 500000.0, 10000000.0))
    else None

  /** Point transform for one normalized (from, to) pair, if expressible:
    * a registered entry, a dynamic UTM leg, or nothing. */
  private def resolveDirect(key: (String, String)): Option[XY => XY] =
    transforms.get(key)
      .orElse {
        if (key._1 == "EPSG:4326") utmTm(key._2).map(tm => (p: XY) => tm.forward(p._1, p._2))
        else if (key._2 == "EPSG:4326") utmTm(key._1).map(tm => (p: XY) => tm.inverse(p._1, p._2))
        else None
      }

  def transform(g: Geometry, from: String, to: String): Geometry = {
    val key = (norm(from), norm(to))
    // direct entry first; otherwise PIVOT THROUGH EPSG:4326 (the PROJ
    // pipeline behavior: any projected->projected pair composes via the
    // geographic hub as long as both legs exist)
    val fn = resolveDirect(key).orElse {
      if (key._1 == "EPSG:4326" || key._2 == "EPSG:4326") None
      else for {
        toGeo <- resolveDirect((key._1, "EPSG:4326"))
        fromGeo <- resolveDirect(("EPSG:4326", key._2))
      } yield (p: XY) => fromGeo(toGeo(p))
    }.getOrElse(throw new IllegalArgumentException(
      s"no CRS transform registered for ${key._1} -> ${key._2} (directly or via EPSG:4326)"))
    g.mapCoords((x, y) => fn((x, y)))
  }
}
