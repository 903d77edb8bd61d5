package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** DE-9IM predicate family (touches/crosses/overlaps/equals/disjoint) over
  * the configurations that separate them: edge-adjacency vs partial overlap
  * vs containment, collinear line overlap vs point crossing, boundary-only
  * line/polygon contact vs traversal. */
class RelatePredicatesSpec extends AnyFunSuite {
  private def g(wkt: String): Geometry = WKT.read(wkt)

  private def box(x1: Double, y1: Double, x2: Double, y2: Double): Geometry =
    g(s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))")

  // ------------------------------------------------------- polygon/polygon

  test("polygons sharing an edge touch but do not overlap") {
    val a = box(0, 0, 10, 10); val b = box(10, 0, 20, 10)
    assert(Algos.touches(a, b) && Algos.touches(b, a))
    assert(!Algos.overlapsPred(a, b))
    assert(!Algos.crosses(a, b))
    assert(!Algos.equalsTop(a, b))
  }

  test("polygons sharing only a corner touch") {
    assert(Algos.touches(box(0, 0, 10, 10), box(10, 10, 20, 20)))
  }

  test("partially overlapping polygons overlap, don't touch") {
    val a = box(0, 0, 10, 10); val b = box(5, 5, 15, 15)
    assert(Algos.overlapsPred(a, b) && Algos.overlapsPred(b, a))
    assert(!Algos.touches(a, b))
    assert(!Algos.crosses(a, b)) // area/area pairs never cross
  }

  test("contained polygon neither touches nor overlaps") {
    val a = box(0, 0, 10, 10); val b = box(2, 2, 8, 8)
    assert(!Algos.touches(a, b) && !Algos.overlapsPred(a, b))
  }

  test("plus-sign rectangles (no vertex inside the other) overlap") {
    val h = box(0, 4, 10, 6); val v = box(4, 0, 6, 10)
    assert(Algos.overlapsPred(h, v))
    assert(!Algos.touches(h, v))
  }

  test("identical polygons are equal regardless of ring start/orientation") {
    val a = box(0, 0, 10, 10)
    val rev = g("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    val shifted = g("POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))")
    assert(Algos.equalsTop(a, rev) && Algos.equalsTop(a, shifted))
    assert(!Algos.overlapsPred(a, rev)) // equal => covered => not overlaps
    assert(!Algos.touches(a, rev))      // interiors clearly intersect
  }

  test("disjoint polygons: disjoint only") {
    val a = box(0, 0, 10, 10); val b = box(20, 0, 30, 10)
    assert(!Algos.intersects(a, b))
    assert(!Algos.touches(a, b) && !Algos.overlapsPred(a, b) && !Algos.crosses(a, b))
  }

  // ------------------------------------------------------------- line/line

  test("lines crossing at an interior point cross, don't touch") {
    val a = g("LINESTRING (0 5, 10 5)"); val b = g("LINESTRING (5 0, 5 10)")
    assert(Algos.crosses(a, b) && Algos.crosses(b, a))
    assert(!Algos.touches(a, b) && !Algos.overlapsPred(a, b))
  }

  test("line ending on the interior of another touches (T junction)") {
    val a = g("LINESTRING (0 5, 5 5)"); val b = g("LINESTRING (5 0, 5 10)")
    assert(Algos.touches(a, b) && Algos.touches(b, a))
    assert(!Algos.crosses(a, b))
  }

  test("lines meeting end-to-end touch") {
    val a = g("LINESTRING (0 0, 5 5)"); val b = g("LINESTRING (5 5, 10 0)")
    assert(Algos.touches(a, b))
  }

  test("lines crossing at a shared mid-vertex cross (no single-segment proper cross)") {
    val a = g("LINESTRING (0 0, 5 5, 10 0)"); val b = g("LINESTRING (0 10, 5 5, 10 10)")
    assert(Algos.crosses(a, b))
    assert(!Algos.touches(a, b))
  }

  test("collinear partial overlap of lines = overlaps, not crosses") {
    val a = g("LINESTRING (0 0, 10 0)"); val b = g("LINESTRING (5 0, 15 0)")
    assert(Algos.overlapsPred(a, b) && Algos.overlapsPred(b, a))
    assert(!Algos.crosses(a, b) && !Algos.touches(a, b))
  }

  test("line covered by a longer line: neither overlaps nor crosses nor touches") {
    val a = g("LINESTRING (0 0, 10 0)"); val b = g("LINESTRING (2 0, 8 0)")
    assert(Algos.coversX(a, b) && !Algos.coversX(b, a))
    assert(!Algos.overlapsPred(a, b) && !Algos.crosses(a, b) && !Algos.touches(a, b))
  }

  test("same line, reversed orientation and redundant vertex, is equal") {
    val a = g("LINESTRING (0 0, 10 0)"); val b = g("LINESTRING (10 0, 4 0, 0 0)")
    assert(Algos.equalsTop(a, b) && Algos.equalsTop(b, a))
  }

  test("multiline covering spans components (per-part recursion would fail)") {
    val a = g("MULTILINESTRING ((0 0, 5 0), (5 0, 10 0))")
    val b = g("LINESTRING (2 0, 8 0)")
    assert(Algos.coversX(a, b))
    assert(Algos.equalsTop(a, g("LINESTRING (0 0, 10 0)")))
  }

  // ---------------------------------------------------------- line/polygon

  test("line through a polygon crosses it") {
    val p = box(0, 0, 10, 10); val l = g("LINESTRING (-5 5, 15 5)")
    assert(Algos.crosses(l, p) && Algos.crosses(p, l))
    assert(!Algos.touches(l, p))
  }

  test("line along a polygon edge touches (interior of polygon untouched)") {
    val p = box(0, 0, 10, 10); val l = g("LINESTRING (0 0, 10 0)")
    assert(Algos.touches(l, p) && Algos.touches(p, l))
    assert(!Algos.crosses(l, p))
  }

  test("line ending at a polygon corner touches") {
    val p = box(0, 0, 10, 10); val l = g("LINESTRING (-5 -5, 0 0)")
    assert(Algos.touches(l, p))
  }

  test("line inside a polygon: covered, not crossing") {
    val p = box(0, 0, 10, 10); val l = g("LINESTRING (2 2, 8 8)")
    assert(Algos.coversX(p, l))
    assert(!Algos.crosses(l, p) && !Algos.touches(l, p))
  }

  test("chord with endpoints on the boundary is contained, not crossing (no exterior part)") {
    val p = box(0, 0, 10, 10); val l = g("LINESTRING (0 5, 5 0)")
    assert(Algos.contains(p, l) && Algos.coversX(p, l))
    assert(!Algos.crosses(l, p)) // OGC: crosses needs a piece in the exterior
    assert(!Algos.touches(l, p)) // interiors intersect
  }

  test("chord exiting and re-entering through a notch vertex crosses") {
    // concave polygon: chord passes through interior, exits at the notch
    val p = g("POLYGON ((0 0, 10 0, 10 10, 5 2, 0 10, 0 0))")
    val l = g("LINESTRING (1 4, 9 4)") // dips outside near the notch at (5 2)? no: above y=2 between arms
    // the chord passes through both arms and the exterior wedge between them
    assert(Algos.crosses(l, p))
  }

  // --------------------------------------------------------- point/others

  test("point on boundary touches; interior point does not") {
    val p = box(0, 0, 10, 10)
    assert(Algos.touches(g("POINT (0 5)"), p))
    assert(Algos.touches(g("POINT (0 0)"), p))
    assert(!Algos.touches(g("POINT (5 5)"), p))
    assert(!Algos.crosses(g("POINT (5 5)"), p)) // single point never crosses
  }

  test("point at a line endpoint touches; mid-line point does not") {
    val l = g("LINESTRING (0 0, 10 0)")
    assert(Algos.touches(g("POINT (0 0)"), l))
    assert(!Algos.touches(g("POINT (5 0)"), l))
  }

  test("multipoint straddling a polygon crosses it") {
    val p = box(0, 0, 10, 10)
    assert(Algos.crosses(g("MULTIPOINT ((5 5), (20 20))"), p))
    // all points on the boundary: touches, not crosses
    assert(Algos.touches(g("MULTIPOINT ((0 5), (10 5))"), p))
    assert(!Algos.crosses(g("MULTIPOINT ((0 5), (10 5))"), p))
    // all inside: covered, no crossing
    assert(!Algos.crosses(g("MULTIPOINT ((5 5), (6 6))"), p))
  }

  test("multipoints sharing some but not all points overlap") {
    val a = g("MULTIPOINT ((0 0), (5 5))"); val b = g("MULTIPOINT ((5 5), (9 9))")
    assert(Algos.overlapsPred(a, b))
    assert(!Algos.equalsTop(a, b))
    assert(Algos.equalsTop(a, g("MULTIPOINT ((5 5), (0 0))")))
  }

  test("point equality") {
    assert(Algos.equalsTop(g("POINT (3 4)"), g("POINT (3 4)")))
    assert(!Algos.equalsTop(g("POINT (3 4)"), g("POINT (3 5)")))
    assert(!Algos.equalsTop(g("POINT (3 4)"), g("LINESTRING (3 4, 3 4)")))
    // a single-member multipoint is topologically equal to the point,
    // including duplicate members (same point set)
    assert(Algos.equalsTop(g("POINT (3 4)"), g("MULTIPOINT ((3 4))")))
    assert(Algos.equalsTop(g("MULTIPOINT ((3 4), (3 4))"), g("POINT (3 4)")))
    assert(!Algos.equalsTop(g("POINT (3 4)"), g("MULTIPOINT ((3 4), (5 6))")))
  }

  // ------------------------------------------------- polygons with holes

  test("geometry in a hole touches the shell ring but never overlaps") {
    val donut = g("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (5 5, 15 5, 15 15, 5 15, 5 5))")
    val inHole = box(8, 8, 12, 12)         // strictly inside the hole
    val onHoleRing = box(5, 5, 15, 15)     // exactly fills the hole
    assert(!Algos.intersects(donut, inHole))
    assert(Algos.touches(donut, onHoleRing))
    assert(!Algos.overlapsPred(donut, onHoleRing))
  }

  test("predicate partition: exactly one of touches/overlaps-or-crosses holds on contact") {
    val a = box(0, 0, 10, 10)
    val cases = Seq(
      "POINT (0 5)"                                    -> "touch",
      "POINT (5 5)"                                    -> "inside",
      "POINT (50 50)"                                  -> "disjoint",
      "LINESTRING (0 0, 10 0)"                         -> "touch",
      "LINESTRING (-5 5, 15 5)"                        -> "cross",
      "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"     -> "touch",
      "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"        -> "overlap")
    for ((w, kind) <- cases) {
      val b = g(w)
      val isect = Algos.intersects(a, b)
      assert(isect == Algos.intersects(b, a), s"intersects asymmetric for $w")
      kind match {
        case "disjoint" => assert(!isect)
        case "touch"    => assert(Algos.touches(a, b) && !Algos.overlapsPred(a, b) && !Algos.crosses(a, b))
        case "cross"    => assert(Algos.crosses(a, b) && !Algos.touches(a, b))
        case "overlap"  => assert(Algos.overlapsPred(a, b) && !Algos.touches(a, b))
        case "inside"   => assert(isect && !Algos.touches(a, b) && !Algos.overlapsPred(a, b) && !Algos.crosses(a, b))
      }
    }
  }
}
