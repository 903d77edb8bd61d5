package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Canonical form + seeded point generation. */
class NormalizeSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)

  test("normalize: rotated and reversed rings converge to identical bytes") {
    val a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = g("POLYGON ((4 4, 4 0, 0 0, 0 4, 4 4))") // CW, rotated start
    val c = g("POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))") // CCW, rotated start
    val na = WKB.write(Shape.normalize(a))
    assert(java.util.Arrays.equals(na, WKB.write(Shape.normalize(b))))
    assert(java.util.Arrays.equals(na, WKB.write(Shape.normalize(c))))
  }

  test("normalize: exterior CCW, holes CW, holes sorted") {
    val p = Shape.normalize(g(
      "POLYGON ((0 0, 0 9, 9 9, 9 0, 0 0), (5 5, 6 5, 6 6, 5 6, 5 5), (1 1, 2 1, 2 2, 1 2, 1 1))"))
      .asInstanceOf[Polygon]
    assert(Algos.signedRingArea(p.rings(0)) > 0)
    assert(p.rings.drop(1).forall(r => Algos.signedRingArea(r) < 0))
    // holes ordered by coordinate array: (1 1, ...) before (5 5, ...)
    assert(p.rings(1)(0) == 1.0 && p.rings(2)(0) == 5.0)
    // every ring starts at its smallest vertex
    p.rings.foreach { r =>
      val n = r.length / 2 - 1
      val min = (0 until n).minBy(i => (r(2 * i), r(2 * i + 1)))
      assert(min == 0)
    }
  }

  test("normalize: multi-part order and open-line direction canonicalize") {
    val m1 = g("MULTIPOLYGON (((5 0, 6 0, 6 1, 5 0)), ((0 0, 1 0, 1 1, 0 0)))")
    val m2 = g("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 0, 6 0, 6 1, 5 0)))")
    assert(java.util.Arrays.equals(
      WKB.write(Shape.normalize(m1)), WKB.write(Shape.normalize(m2))))
    val l = g("LINESTRING (5 5, 0 0)")
    assert(Shape.normalize(l) == g("LINESTRING (0 0, 5 5)"))
    // distinct geometries stay distinct
    assert(!java.util.Arrays.equals(
      WKB.write(Shape.normalize(g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))),
      WKB.write(Shape.normalize(g("POLYGON ((0 0, 4 0, 4 4, 0 3, 0 0))")))))
  }

  test("generatePoints: deterministic, covered, exact count; concave shapes too") {
    val square = g("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))")
    val p1 = Shape.generatePoints(square, 40, 7L).asInstanceOf[MultiPoint]
    val p2 = Shape.generatePoints(square, 40, 7L).asInstanceOf[MultiPoint]
    assert(p1 == p2 && p1.geoms.length == 40)
    p1.geoms.foreach(p => assert(p.x >= 2 && p.x <= 8 && p.y >= 2 && p.y <= 8))
    val lshape = g("POLYGON ((0 0, 8 0, 8 2, 2 2, 2 8, 0 8, 0 0))").asInstanceOf[Polygon]
    val pl = Shape.generatePoints(lshape, 25, 3L).asInstanceOf[MultiPoint]
    assert(pl.geoms.length == 25)
    pl.geoms.foreach(p => assert(Algos.pointInPolygon(p.x, p.y, lshape) >= 0))
    // different seed, different points
    assert(Shape.generatePoints(square, 40, 8L) != p1)
    assert(Shape.generatePoints(g("LINESTRING (0 0, 1 1)"), 5, 1L) == null)
  }
}
