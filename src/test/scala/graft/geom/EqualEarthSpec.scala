package graft.geom

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.CRS.{EqualEarth, WGS84E}

/** Equal Earth (Savric-Patterson-Jenny 2018): published-polynomial edge
  * constants, Newton inverse convergence, round-trips, equal-area — in
  * BOTH forms: spherical (+R) and PROJ's ellipsoidal/authalic default. */
class EqualEarthSpec extends AnyFunSuite {
  private val a = 6378137.0
  // spherical form (beta = phi, radius a) — the published-paper constants
  private val p = EqualEarth(WGS84E, Some(a), 0, 0, 0)
  // ellipsoidal form — PROJ's eqearth on +ellps=WGS84 (authalic beta, Rq)
  private val pe = EqualEarth(WGS84E, None, 0, 0, 0)

  test("outline: equator edge and pole height match the published polynomial") {
    val M = math.sqrt(3.0) / 2.0
    val A1 = 1.340264
    val (xe, ye) = p.forward(180, 0)
    assert(math.abs(xe - math.Pi * a / (M * A1)) < 1e-6 && math.abs(ye) < 1e-6)
    val tp = math.asin(M)
    val yPole = a * tp * (A1 - 0.081106 * tp * tp +
      math.pow(tp, 6) * (0.000893 + 0.003796 * tp * tp))
    val (xp, yp) = p.forward(0, 90)
    assert(math.abs(xp) < 1e-6 && math.abs(yp - yPole) < 1e-6)
  }

  test("ellipsoidal outline: authalic radius scales the spherical edge constants") {
    // PROJ's eqearth on an ellipsoid = the spherical formulas on the
    // AUTHALIC sphere: same polynomial, radius Rq = a*sqrt(qP/2), and the
    // equator/pole map through beta = authalic latitude (0 and pi/2 are
    // fixed points of the authalic conversion, so only the radius moves).
    val e2 = WGS84E.e2; val e = WGS84E.e
    val qP = (1 - e2) * (1 / (1 - e2) - (1 / (2 * e)) * math.log((1 - e) / (1 + e)))
    val rq = a * math.sqrt(qP / 2)
    val (sx, _) = p.forward(180, 0)
    val (ex, ey0) = pe.forward(180, 0)
    assert(math.abs(ex - sx * rq / a) < 1e-6 && math.abs(ey0) < 1e-6)
    val (_, sy) = p.forward(0, 90)
    val (_, ey) = pe.forward(0, 90)
    assert(math.abs(ey - sy * rq / a) < 1e-6)
    // reference values (computed from the closed formulas above)
    assert(math.abs(ex - 17243959.1) < 0.1)
    assert(math.abs(ey - 8392927.6) < 0.1)
  }

  test("forward/inverse round-trip across the globe (both forms)") {
    for (lon <- -170 to 170 by 35; lat <- -88 to 88 by 22) {
      val (x, y) = p.forward(lon, lat)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"sph ($lon,$lat)")
      val (x2, y2) = pe.forward(lon, lat)
      val (lo2, la2) = pe.inverse(x2, y2)
      assert(math.abs(lo2 - lon) < 1e-9 && math.abs(la2 - lat) < 1e-9, s"ell ($lon,$lat)")
    }
  }

  test("equal-area: small-patch planar area matches the spherical patch within 0.1%") {
    for ((lon, lat) <- Seq((0.0, 0.0), (100.0, 55.0), (-45.0, -80.0))) {
      val d = 0.02
      val corners = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
        .map { case (lo, la) => p.forward(lo, la) }
      val planar = math.abs(corners.zip(corners.tail :+ corners.head)
        .map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2)
      val sphere = a * a * math.toRadians(d) *
        (math.sin(math.toRadians(lat + d)) - math.sin(math.toRadians(lat)))
      assert(math.abs(planar / sphere - 1.0) < 1e-3, s"($lon,$lat) ratio ${planar / sphere}")
    }
  }

  test("ellipsoidal equal-area: small-patch planar area matches the ELLIPSOID patch within 0.1%") {
    // authalic mapping preserves ellipsoid surface area exactly; the patch
    // area on the ellipsoid is a^2 * dLam * (q(phi2) - q(phi1)) / 2
    val e2 = WGS84E.e2; val e = WGS84E.e
    def q(latDeg: Double): Double = {
      val sp = math.sin(math.toRadians(latDeg))
      (1 - e2) * (sp / (1 - e2 * sp * sp) -
        (1 / (2 * e)) * math.log((1 - e * sp) / (1 + e * sp)))
    }
    for ((lon, lat) <- Seq((0.0, 0.0), (100.0, 55.0), (-45.0, -80.0))) {
      val d = 0.02
      val corners = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
        .map { case (lo, la) => pe.forward(lo, la) }
      val planar = math.abs(corners.zip(corners.tail :+ corners.head)
        .map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2)
      val ellPatch = a * a * math.toRadians(d) * (q(lat + d) - q(lat)) / 2
      assert(math.abs(planar / ellPatch - 1.0) < 1e-3, s"($lon,$lat) ratio ${planar / ellPatch}")
    }
  }

  test("registry: ESRI:54035 round-trips through st-level CRS plumbing") {
    val g = WKT.read("POINT (-77.04 38.9)")
    val back = CRS.transform(CRS.transform(g, "EPSG:4326", "ESRI:54035"),
      "ESRI:54035", "EPSG:4326")
    back.foreachCoord { (x, y) =>
      assert(math.abs(x + 77.04) < 1e-9 && math.abs(y - 38.9) < 1e-9)
    }
  }
}
