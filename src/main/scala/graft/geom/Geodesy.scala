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
    def parse(s: String): Method = s.trim.toLowerCase match {
      case "geodesic"  => Geodesic
      case "haversine" => Haversine
      case "vincenty"  => Vincenty
      case other => throw new IllegalArgumentException(
        s"unknown geodesic length method '$other' (expected geodesic|haversine|vincenty)")
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
    * we use Vincenty-with-fallback here. TODO: port GeographicLib inverse. */
  def geodesic(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    vincenty(lon1, lat1, lon2, lat2)

  private def pairDist(m: Method)(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    m match {
      case Method.Haversine => haversine(lon1, lat1, lon2, lat2)
      case Method.Vincenty  => vincenty(lon1, lat1, lon2, lat2)
      case Method.Geodesic  => geodesic(lon1, lat1, lon2, lat2)
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

  /** Transverse Mercator (spherical approx only used for tests; full Krüger
    * series on WGS84 below) — UTM zone from central meridian. */
  def lonLatToUtm(lon: Double, lat: Double, zone: Int, north: Boolean): XY = {
    // Krüger series (order 4) on WGS84 — published formulas (Karney 2011, "Transverse
    // Mercator with an accuracy of a few nanometers"), truncated: sub-mm in-zone.
    val a = Geodesy.WGS84_A; val f = Geodesy.WGS84_F
    val n = f / (2 - f)
    val k0 = 0.9996
    val lon0 = math.toRadians(zone * 6 - 183)
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon) - lon0
    val e = math.sqrt(f * (2 - f))
    // conformal latitude
    val sinPhi = math.sin(phi)
    val t = math.sinh(atanh(sinPhi) - e * atanh(e * sinPhi))
    val xiP = math.atan2(t, math.cos(lam))
    val etaP = atanh(math.sin(lam) / math.sqrt(1 + t * t))
    val A1 = a / (1 + n) * (1 + n * n / 4 + n * n * n * n / 64)
    val alpha = Array(
      0.0,
      n / 2 - 2.0 / 3 * n * n + 5.0 / 16 * n * n * n,
      13.0 / 48 * n * n - 3.0 / 5 * n * n * n,
      61.0 / 240 * n * n * n)
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 3) {
      xi += alpha(j) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += alpha(j) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    val easting = 500000.0 + k0 * A1 * eta
    val northing = (if (north) 0.0 else 10000000.0) + k0 * A1 * xi
    (easting, northing)
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  /** Registry keyed by "EPSG:xxxx" pairs. Extensible via register(). */
  private val transforms = scala.collection.concurrent.TrieMap[(String, String), XY => XY](
    ("EPSG:4326", "EPSG:3857") -> { case (x, y) => lonLatToWebMercator(x, y) },
    ("EPSG:3857", "EPSG:4326") -> { case (x, y) => webMercatorToLonLat(x, y) },
    ("EPSG:4326", "EPSG:4326") -> identity,
    ("EPSG:3857", "EPSG:3857") -> identity)

  def register(from: String, to: String, fn: XY => XY): Unit = transforms((norm(from), norm(to))) = fn

  private def norm(s: String): String = {
    val u = s.trim.toUpperCase
    if (u.forall(_.isDigit)) s"EPSG:$u" else u
  }

  def transform(g: Geometry, from: String, to: String): Geometry = {
    val key = (norm(from), norm(to))
    // UTM zones resolved dynamically: EPSG:326xx (N) / 327xx (S)
    val fn = transforms.getOrElse(key, {
      val toN = key._2
      if (toN.startsWith("EPSG:326") && key._1 == "EPSG:4326") {
        val zone = toN.substring(8).toInt
        (p: XY) => lonLatToUtm(p._1, p._2, zone, north = true)
      } else if (toN.startsWith("EPSG:327") && key._1 == "EPSG:4326") {
        val zone = toN.substring(8).toInt
        (p: XY) => lonLatToUtm(p._1, p._2, zone, north = false)
      } else throw new IllegalArgumentException(s"no CRS transform registered for ${key._1} -> ${key._2}")
    })
    g.mapCoords((x, y) => fn((x, y)))
  }
}
