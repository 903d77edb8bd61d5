package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class SplitMakeValidSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)
  private def parts(x: Geometry) = x.asInstanceOf[MultiLineString].geoms

  test("split a line by a crossing line: two pieces, direction preserved") {
    val m = Algos.splitLine(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (5 -5, 5 5)"))
    assert(parts(m).length == 2)
    assert(WKT.write(m) == "MULTILINESTRING ((0 0, 5 0), (5 0, 10 0))")
  }

  test("split by a point on the line") {
    val m = Algos.splitLine(g("LINESTRING (0 0, 10 0)"), g("POINT (3 0)"))
    assert(WKT.write(m) == "MULTILINESTRING ((0 0, 3 0), (3 0, 10 0))")
  }

  test("blade missing the line leaves it whole") {
    val m = Algos.splitLine(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (0 5, 10 5)"))
    assert(parts(m).length == 1)
  }

  test("multi-vertex line: cut at a crossing mid-segment and at an on-blade vertex") {
    val m = Algos.splitLine(g("LINESTRING (0 0, 4 0, 4 4)"), g("LINESTRING (2 -1, 2 1)"))
    assert(WKT.write(m) == "MULTILINESTRING ((0 0, 2 0), (2 0, 4 0, 4 4))")
    val v = Algos.splitLine(g("LINESTRING (0 0, 4 0, 4 4)"), g("POINT (4 0)"))
    assert(WKT.write(v) == "MULTILINESTRING ((0 0, 4 0), (4 0, 4 4))")
  }

  test("multiple cuts in order") {
    val m = Algos.splitLine(g("LINESTRING (0 0, 12 0)"),
      g("MULTILINESTRING ((3 -1, 3 1), (9 -1, 9 1))"))
    assert(WKT.write(m) == "MULTILINESTRING ((0 0, 3 0), (3 0, 9 0), (9 0, 12 0))")
  }

  test("makevalid repairs a bowtie into two triangles") {
    val bow = g("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
    assert(!Algos.isValid(bow))
    val fixed = Algos.makeValid(bow)
    assert(Algos.isValid(fixed))
    val mp = fixed.asInstanceOf[MultiPolygon]
    assert(mp.geoms.length == 2)
    assert(math.abs(Algos.area(fixed) - 50.0) < 1e-9) // two 25-area triangles
  }

  test("makevalid passes valid geometry through untouched") {
    val p = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(Algos.makeValid(p) eq p)
    val l = g("LINESTRING (0 0, 1 1)")
    assert(Algos.makeValid(l) eq l)
  }

  test("vertex-touching pinch is accepted by isValid and passes through untouched") {
    // isValid flags proper edge crossings; a ring touching itself at a
    // shared vertex is outside the repair trigger by design
    val pinched = g("POLYGON ((0 0, 5 5, 10 0, 10 10, 5 5, 0 10, 0 0))")
    assert(Algos.isValid(pinched))
    assert(Algos.makeValid(pinched) eq pinched)
  }

  test("makevalid repairs a double-crossing ring, preserving covered area") {
    // rectangle ring whose top edge dips below the bottom edge twice
    val z = g("POLYGON ((0 0, 12 0, 12 4, 8 -2, 4 -2, 0 4, 0 0))")
    assert(!Algos.isValid(z))
    val fixed = Algos.makeValid(z)
    assert(Algos.isValid(fixed))
    // faces assembled from the noded boundary cover a positive area equal
    // to the arrangement's bounded cells
    assert(Algos.area(fixed) > 0)
    assert(fixed.isInstanceOf[MultiPolygon] || fixed.isInstanceOf[Polygon])
  }
}
