package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class NodeLinesSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)

  private def parts(x: Geometry): Array[LineString] =
    x.asInstanceOf[MultiLineString].geoms

  private def totalLen(x: Geometry): Double = Algos.length(x)

  test("X crossing splits both segments: 4 edges, length preserved") {
    val m = Algos.nodeLines(g("MULTILINESTRING ((0 0, 10 10), (0 10, 10 0))"))
    assert(parts(m).length == 4)
    assert(math.abs(totalLen(m) - 2 * math.hypot(10, 10)) < 1e-9)
  }

  test("grid of 2 horizontals x 3 verticals: h*(v+1) + v*(h+1) edges") {
    val m = Algos.nodeLines(g(
      "MULTILINESTRING ((0 2, 10 2), (0 6, 10 6), (2 0, 2 10), (5 0, 5 10), (8 0, 8 10))"))
    assert(parts(m).length == 2 * 4 + 3 * 3)
    assert(math.abs(totalLen(m) - (2 * 10 + 3 * 10)) < 1e-9)
  }

  test("T junction splits only the crossed line") {
    val m = Algos.nodeLines(g("MULTILINESTRING ((0 0, 10 0), (5 0, 5 5))"))
    assert(parts(m).length == 3)
  }

  test("touching endpoints produce no extra splits") {
    val m = Algos.nodeLines(g("MULTILINESTRING ((0 0, 5 0), (5 0, 10 0))"))
    assert(parts(m).length == 2)
  }

  test("collinear overlap deduplicates the shared edge") {
    val m = Algos.nodeLines(g("MULTILINESTRING ((0 0, 10 0), (5 0, 15 0))"))
    // pieces: (0-5), (5-10) from first; (5-10) dup, (10-15) from second
    assert(parts(m).length == 3)
    assert(math.abs(totalLen(m) - 15.0) < 1e-9)
  }

  test("multi-vertex input splits per segment and is deterministic") {
    val a = Algos.nodeLines(g("MULTILINESTRING ((0 0, 4 0, 4 4), (2 -2, 2 2))"))
    val b = Algos.nodeLines(g("MULTILINESTRING ((2 -2, 2 2), (0 0, 4 0, 4 4))"))
    assert(WKT.write(a) == WKT.write(b))
    assert(parts(a).length == 5) // (0-2,0),(2-4,0),(4,0-4),(2,-2-0),(2,0-2)
  }

  test("non-line input rejected") {
    assert(Algos.nodeLines(g("POINT (0 0)")) == null)
  }
}
