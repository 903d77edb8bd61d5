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
