package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Mollweide (Snyder §31): elliptical outline constants, Newton theta
  * convergence incl. poles, round-trips, and the equal-area property. */
class MollweideSpec extends AnyFunSuite {
  private val a = 6378137.0
  private val p = CRS.Mollweide(a, 0, 0, 0)

  test("outline: equator edge at 2*sqrt(2)*a, poles at sqrt(2)*a, origin at 0") {
    val (xe, ye) = p.forward(180, 0)
    assert(math.abs(xe - 2 * math.sqrt(2) * a) < 1e-6 && math.abs(ye) < 1e-6)
    val (xp, yp) = p.forward(0, 90)
    assert(math.abs(xp) < 1e-6 && math.abs(yp - math.sqrt(2) * a) < 1e-6)
    val (xs, ys) = p.forward(0, -90)
    assert(math.abs(xs) < 1e-6 && math.abs(ys + math.sqrt(2) * a) < 1e-6)
    assert(p.forward(0, 0) == ((0.0, 0.0)))
  }

  test("forward/inverse round-trip across the globe") {
    for (lon <- -170 to 170 by 35; lat <- -85 to 85 by 17) {
      val (x, y) = p.forward(lon, lat)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("equal-area: small-patch planar area matches the spherical patch within 0.1%") {
    for ((lon, lat) <- Seq((10.0, 0.0), (-120.0, 45.0), (60.0, -70.0))) {
      val d = 0.02
      val corners = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
        .map { case (lo, la) => p.forward(lo, la) }
      // shoelace
      val planar = math.abs(corners.zip(corners.tail :+ corners.head)
        .map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2)
      val sphere = a * a * math.toRadians(d) *
        (math.sin(math.toRadians(lat + d)) - math.sin(math.toRadians(lat)))
      assert(math.abs(planar / sphere - 1.0) < 1e-3, s"($lon,$lat) ratio ${planar / sphere}")
    }
  }

  test("registry: ESRI:54009 transform round-trips through st-level CRS plumbing") {
    val g = WKT.read("POINT (12.5 -33.25)")
    val fwd = CRS.transform(g, "EPSG:4326", "ESRI:54009")
    val back = CRS.transform(fwd, "ESRI:54009", "EPSG:4326")
    back.foreachCoord { (x, y) =>
      assert(math.abs(x - 12.5) < 1e-9 && math.abs(y + 33.25) < 1e-9)
    }
  }
}
