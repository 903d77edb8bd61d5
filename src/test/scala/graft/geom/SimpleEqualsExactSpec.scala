package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** is_simple / equals_exact — the last reserved predicates of the reference's
  * declared surface (py-geopolars geoseries.rst:33-52), pinned to GEOS/JTS
  * behavior: self-intersection taxonomy for simplicity, structural
  * per-ordinate tolerance for exact equality. */
class SimpleEqualsExactSpec extends AnyFunSuite {
  private def g(wkt: String): Geometry = WKT.read(wkt)

  // ------------------------------------------------------------- is_simple

  test("points and straight lines are simple") {
    assert(Algos.isSimple(g("POINT (3 4)")))
    assert(Algos.isSimple(g("LINESTRING (0 0, 1 0, 2 1)")))
  }

  test("self-crossing line (bowtie path) is not simple") {
    assert(!Algos.isSimple(g("LINESTRING (0 0, 10 10, 10 0, 0 10)")))
  }

  test("closed ring is simple; figure-eight through a shared vertex is not") {
    assert(Algos.isSimple(g("LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)")))
    // revisits (5 5) mid-path
    assert(!Algos.isSimple(g("LINESTRING (0 0, 5 5, 10 0, 10 10, 5 5, 0 10, 0 0)")))
  }

  test("line touching its own interior (lollipop) is not simple") {
    assert(!Algos.isSimple(g("LINESTRING (0 0, 10 0, 10 10, 5 0)")))
  }

  test("line folding back over itself (collinear overlap) is not simple") {
    assert(!Algos.isSimple(g("LINESTRING (0 0, 10 0, 5 0)")))
  }

  test("consecutive duplicate vertices do not break simplicity") {
    assert(Algos.isSimple(g("LINESTRING (0 0, 5 0, 5 0, 10 0)")))
  }

  test("multipoint simple iff no repeated coordinates") {
    assert(Algos.isSimple(g("MULTIPOINT ((0 0), (1 1))")))
    assert(!Algos.isSimple(g("MULTIPOINT ((0 0), (1 1), (0 0))")))
  }

  test("multilinestring: endpoint-to-endpoint contact is simple, interior contact is not") {
    assert(Algos.isSimple(g("MULTILINESTRING ((0 0, 10 0), (10 0, 10 10))")))
    // crosses in the interior
    assert(!Algos.isSimple(g("MULTILINESTRING ((0 0, 10 10), (0 10, 10 0))")))
    // endpoint of one lands mid-segment on the other (T)
    assert(!Algos.isSimple(g("MULTILINESTRING ((0 0, 10 0), (5 0, 5 5))")))
    // duplicate element = 1-dim shared piece
    assert(!Algos.isSimple(g("MULTILINESTRING ((0 0, 10 0), (0 0, 10 0))")))
  }

  test("valid polygon is simple; bowtie ring is not") {
    assert(Algos.isSimple(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
    assert(!Algos.isSimple(g("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")))
  }

  // ---------------------------------------------------------- equals_exact

  test("equals_exact: identical and within-tolerance coordinates") {
    val a = g("LINESTRING (0 0, 10 0, 10 10)")
    assert(Algos.equalsExact(a, g("LINESTRING (0 0, 10 0, 10 10)"), 0.0))
    assert(Algos.equalsExact(a, g("LINESTRING (0.4 0, 10 0.4, 10 10)"), 0.5))
    assert(!Algos.equalsExact(a, g("LINESTRING (0.6 0, 10 0, 10 10)"), 0.5))
  }

  test("equals_exact is structural: reversed ring and different type fail") {
    val a = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val rev = g("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    assert(!Algos.equalsExact(a, rev, 0.0)) // topologically equal, structurally not
    assert(Algos.equalsTop(a, rev))
    assert(!Algos.equalsExact(g("POINT (1 1)"), g("MULTIPOINT ((1 1))"), 0.0))
  }

  test("equals_exact: vertex-count mismatch fails even within tolerance") {
    assert(!Algos.equalsExact(
      g("LINESTRING (0 0, 5 0, 10 0)"), g("LINESTRING (0 0, 10 0)"), 1.0))
  }

  test("multi-part equals_exact recurses per part in order") {
    val a = g("MULTIPOINT ((0 0), (1 1))")
    // 1.1 - 1.0 = 0.10000000000000009 in binary: tolerance must clear it
    // (JTS equalsExact has the same per-ordinate FP comparison)
    assert(Algos.equalsExact(a, g("MULTIPOINT ((0.1 0), (1 1.1))"), 0.125))
    assert(!Algos.equalsExact(a, g("MULTIPOINT ((1 1), (0 0))"), 0.125))
  }
}
