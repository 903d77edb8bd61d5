package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class LineMergeSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)
  private def w(geom: Geometry) = WKT.write(geom)

  test("scrambled, direction-flipped segments merge into one canonical line") {
    val m = g("MULTILINESTRING ((3 0, 0 0), (3 3, 3 0), (3 3, 6 3))")
    assert(w(Algos.lineMerge(m)) == "LINESTRING (0 0, 3 0, 3 3, 6 3)")
  }

  test("merge result is independent of component order") {
    val a = Algos.lineMerge(g("MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))"))
    val b = Algos.lineMerge(g("MULTILINESTRING ((2 0, 1 1), (1 1, 0 0))"))
    assert(w(a) == w(b) && w(a) == "LINESTRING (0 0, 1 1, 2 0)")
  }

  test("Y junction (degree 3) does not merge through the fork") {
    val y = g("MULTILINESTRING ((0 0, 1 1), (2 0, 1 1), (1 1, 1 3))")
    val m = Algos.lineMerge(y)
    assert(m.isInstanceOf[MultiLineString])
    assert(m.asInstanceOf[MultiLineString].geoms.length == 3)
  }

  test("two disconnected chains stay separate, each canonical") {
    val m = Algos.lineMerge(g("MULTILINESTRING ((10 0, 12 0), (5 5, 0 5), (12 0, 14 2))"))
    assert(w(m) == "MULTILINESTRING ((0 5, 5 5), (10 0, 12 0, 14 2))")
  }

  test("segments forming a cycle merge into one closed canonical ring") {
    val m = Algos.lineMerge(g("MULTILINESTRING ((0 0, 1 0), (1 0, 1 1), (1 1, 0 1), (0 1, 0 0))"))
    val ls = m.asInstanceOf[LineString]
    assert(ls.isClosed)
    // canonical: starts at the smallest vertex, oriented toward the smaller neighbor
    assert(w(ls) == "LINESTRING (0 0, 0 1, 1 1, 1 0, 0 0)")
  }

  test("non-line input is rejected") {
    assert(Algos.lineMerge(g("POINT (1 2)")) == null)
    assert(Algos.lineMerge(g("POLYGON ((0 0, 1 0, 1 1, 0 0))")) == null)
  }

  test("removeRepeatedPoints drops consecutive duplicates, keeps endpoints") {
    val l = g("LINESTRING (0 0, 0 0, 5 0, 5 0, 5 0, 5 5, 5 5)")
    assert(w(Algos.removeRepeatedPoints(l, 0.0)) == "LINESTRING (0 0, 5 0, 5 5)")
    // tolerance mode: near-duplicates within 0.5 collapse
    val l2 = g("LINESTRING (0 0, 0.2 0.1, 5 0, 5.1 0.1, 5 5)")
    assert(w(Algos.removeRepeatedPoints(l2, 0.5)) == "LINESTRING (0 0, 5 0, 5 5)")
  }

  test("removeRepeatedPoints on rings preserves closure; collapsed shell empties") {
    val p = g("POLYGON ((0 0, 0 0, 4 0, 4 4, 4 4, 0 4, 0 0))")
    assert(w(Algos.removeRepeatedPoints(p, 0.0)) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val tiny = g("POLYGON ((0 0, 0.1 0, 0.1 0.1, 0 0))")
    assert(Algos.removeRepeatedPoints(tiny, 1.0).isEmpty)
  }
}
