package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class PolygonizeSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)

  test("closed square ring polygonizes to one square") {
    val p = Algos.polygonize(g("LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"))
    assert(math.abs(Algos.area(p) - 16.0) < 1e-9)
    assert(p.isInstanceOf[Polygon])
  }

  test("grid of 3 horizontals x 3 verticals yields 4 unit cells") {
    val p = Algos.polygonize(g(
      "MULTILINESTRING ((0 0, 4 0), (0 2, 4 2), (0 4, 4 4), (0 0, 0 4), (2 0, 2 4), (4 0, 4 4))"))
    val mp = p.asInstanceOf[MultiPolygon]
    assert(mp.geoms.length == 4)
    assert(math.abs(Algos.area(p) - 16.0) < 1e-9)
    mp.geoms.foreach(cell => assert(math.abs(Algos.area(cell) - 4.0) < 1e-9))
  }

  test("unclosed arrangement with a dangling edge still finds the faces") {
    val p = Algos.polygonize(g(
      "MULTILINESTRING ((0 0, 4 0, 4 4, 0 4, 0 0), (4 0, 8 0))"))
    assert(math.abs(Algos.area(p) - 16.0) < 1e-9)
  }

  test("two separate triangles give two faces") {
    val p = Algos.polygonize(g(
      "MULTILINESTRING ((0 0, 2 0, 1 2, 0 0), (10 0, 12 0, 11 2, 10 0))"))
    val mp = p.asInstanceOf[MultiPolygon]
    assert(mp.geoms.length == 2)
    assert(math.abs(Algos.area(p) - 4.0) < 1e-9)
  }

  test("X crossing without closure has no faces") {
    assert(Algos.polygonize(g("MULTILINESTRING ((0 0, 4 4), (0 4, 4 0))")) == null)
  }

  test("deterministic under input permutation") {
    val a = Algos.polygonize(g("MULTILINESTRING ((0 0, 2 0), (2 0, 2 2), (2 2, 0 2), (0 2, 0 0))"))
    val b = Algos.polygonize(g("MULTILINESTRING ((0 2, 0 0), (2 2, 0 2), (2 0, 2 2), (0 0, 2 0))"))
    assert(WKT.write(a) == WKT.write(b))
  }
}
