package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class SphericalAreaSpec extends AnyFunSuite {
  private val R = Geodesy.MeanEarthRadius
  private def ring(pts: (Double, Double)*): Array[Array[Double]] =
    Array((pts :+ pts.head).flatMap { case (lo, la) => Seq(lo, la) }.toArray)

  test("polar triangle area = lambda * R^2") {
    for (deg <- Seq(10.0, 45.0, 90.0)) {
      val a = Geodesy.sphericalArea(ring((0, 0), (deg, 0), (0, 90)))
      val expect = math.toRadians(deg) * R * R
      assert(math.abs(a - expect) / expect < 1e-9, s"deg=$deg")
    }
  }

  test("octant is one eighth of the sphere") {
    val a = Geodesy.sphericalArea(ring((0, 0), (90, 0), (0, 90)))
    assert(math.abs(a - 4 * math.Pi * R * R / 8) / a < 1e-9)
  }

  test("orientation-insensitive; hole subtracts") {
    val outer = ring((0, 0), (90, 0), (0, 90))(0)
    val rev = outer.grouped(2).toArray.reverse.flatten
    assert(math.abs(Geodesy.sphericalArea(Array(outer)) -
                    Geodesy.sphericalArea(Array(rev))) < 1e-3)
    val hole = ring((10, 10), (20, 10), (10, 20))(0)
    val withHole = Geodesy.sphericalArea(Array(outer, hole))
    assert(withHole < Geodesy.sphericalArea(Array(outer)))
  }

  test("small polygon approaches planar area in meters") {
    // 0.01-degree square near the equator: ~1.1km x 1.1km
    val d = 0.01
    val a = Geodesy.sphericalArea(ring((0, 0), (d, 0), (d, d), (0, d)))
    val side = math.toRadians(d) * R
    assert(math.abs(a - side * side) / (side * side) < 1e-4)
  }

  test("degenerate rings have zero area") {
    assert(Geodesy.sphericalArea(ring((0, 0), (10, 0))) == 0.0)
    assert(Geodesy.sphericalArea(Array.empty) == 0.0)
  }
}
