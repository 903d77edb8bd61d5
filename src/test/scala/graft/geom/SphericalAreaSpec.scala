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

  // ---- Chamberlain-Duquette (planar-in-lon/lat edges) variant ----

  test("CD: agrees with great-circle area on a small equatorial square") {
    val d = 0.01
    val cd = Geodesy.geodesicArea(Polygon(ring((0, 0), (d, 0), (d, d), (0, d))))
    val gc = Geodesy.sphericalArea(ring((0, 0), (d, 0), (d, d), (0, d)))
    assert(math.abs(cd - gc) / gc < 1e-5, s"cd=$cd gc=$gc")
  }

  test("CD: full equatorial band via two hemispheres-of-longitude") {
    // ring spanning all longitudes at |lat| <= 30: band area = 4*pi*R^2 * sin(30)
    val band = ring((-180, -30), (180, -30), (180, 30), (-180, 30))
    val a = Geodesy.geodesicArea(Polygon(band))
    val expect = 4 * math.Pi * R * R * math.sin(math.toRadians(30))
    assert(math.abs(a - expect) / expect < 1e-12)
  }

  test("CD: hole subtracts; orientation-insensitive; non-areal is zero") {
    val outer = ring((0, 0), (10, 0), (10, 10), (0, 10))(0)
    val hole = ring((2, 2), (4, 2), (4, 4), (2, 4))(0)
    val ext = Geodesy.geodesicArea(Polygon(Array(outer)))
    val holed = Geodesy.geodesicArea(Polygon(Array(outer, hole)))
    assert(holed < ext && holed > 0)
    val rev = outer.grouped(2).toArray.reverse.flatten
    assert(Geodesy.geodesicArea(Polygon(Array(rev))) == ext)
    assert(Geodesy.geodesicArea(Point(1.0, 2.0)) == 0.0)
    assert(Geodesy.geodesicArea(LineString(Array(0.0, 0.0, 1.0, 1.0))) == 0.0)
  }
}
