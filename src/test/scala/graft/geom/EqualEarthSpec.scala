package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Equal Earth (Savric-Patterson-Jenny 2018): published-polynomial edge
  * constants, Newton inverse convergence, round-trips, equal-area. */
class EqualEarthSpec extends AnyFunSuite {
  private val a = 6378137.0
  private val p = CRS.EqualEarth(a, 0, 0, 0)

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

  test("forward/inverse round-trip across the globe") {
    for (lon <- -170 to 170 by 35; lat <- -88 to 88 by 22) {
      val (x, y) = p.forward(lon, lat)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
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

  test("registry: ESRI:54035 round-trips through st-level CRS plumbing") {
    val g = WKT.read("POINT (-77.04 38.9)")
    val back = CRS.transform(CRS.transform(g, "EPSG:4326", "ESRI:54035"),
      "ESRI:54035", "EPSG:4326")
    back.foreachCoord { (x, y) =>
      assert(math.abs(x + 77.04) < 1e-9 && math.abs(y - 38.9) < 1e-9)
    }
  }
}
