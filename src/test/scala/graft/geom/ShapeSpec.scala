package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Round-2 shape kernels: Fréchet, Visvalingam-Whyatt, ear clipping,
  * bounding circle geometry, Chaikin, shared paths, subdivide, tiles. */
class ShapeSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)

  // ---------------------------------------------------------- Fréchet

  test("frechet: identical lines -> 0") {
    val l = g("LINESTRING (0 0, 5 0, 5 5)")
    assert(Shape.frechet(l, l) == 0.0)
  }

  test("frechet: translation = |shift| for congruent polylines") {
    val l = g("LINESTRING (0 0, 5 0, 5 5, 9 7)")
    val t = l.mapCoords((x, y) => (x + 3, y + 4))
    assert(math.abs(Shape.frechet(l, t) - 5.0) < 1e-12)
  }

  test("frechet is order-sensitive where hausdorff is not") {
    val a = g("LINESTRING (0 0, 10 0)")
    val b = g("LINESTRING (10 0, 0 0)")
    assert(Shape.frechet(a, b) == 10.0)
    assert(Algos.hausdorff(a, b) == 0.0)
  }

  test("frechet >= hausdorff always (sampled fixtures)") {
    val fixtures = Seq(
      ("LINESTRING (0 0, 1 3, 4 1, 6 6)", "LINESTRING (0 1, 2 2, 5 2, 6 5)"),
      ("LINESTRING (0 0, 10 0)", "LINESTRING (0 1, 5 4, 10 1)"),
      ("LINESTRING (2 2, 3 3)", "LINESTRING (0 0, 9 9, 0 9)"))
    for ((wa, wb) <- fixtures) {
      val (a, b) = (g(wa), g(wb))
      assert(Shape.frechet(a, b) >= Algos.hausdorff(a, b) - 1e-12)
    }
  }

  // --------------------------------------------- Visvalingam-Whyatt

  test("simplifyVW: collinear interior vertices drop at any positive threshold") {
    val l = Shape.simplifyVW(g("LINESTRING (0 0, 1 0, 2 0, 3 0)"), 1e-9)
    assert(l == g("LINESTRING (0 0, 3 0)"))
  }

  test("simplifyVW: threshold below min area keeps everything") {
    val orig = g("LINESTRING (0 0, 1 2, 2 0, 3 2, 4 0)")
    assert(Shape.simplifyVW(orig, 0.5) == orig)
  }

  test("simplifyVW: huge threshold collapses an open line to its endpoints") {
    val l = Shape.simplifyVW(g("LINESTRING (0 0, 1 2, 2 0, 3 2, 4 0, 5 2, 6 0)"), 1e6)
    assert(l == g("LINESTRING (0 0, 6 0)"))
  }

  test("simplifyVW: ring keeps at least a triangle") {
    val p = Shape.simplifyVW(g("POLYGON ((0 0, 4 0, 4 4, 2 5, 0 4, 0 0))"), 1e6)
      .asInstanceOf[Polygon]
    assert(p.exterior.length == 8) // 3 distinct vertices + closure
  }

  // ------------------------------------------------------ ear clipping

  test("triangulate: convex polygon fans into n-2 triangles of equal total area") {
    val p = g("POLYGON ((0 0, 6 0, 6 4, 3 6, 0 4, 0 0))")
    val t = Shape.triangulate(p).asInstanceOf[MultiPolygon]
    assert(t.geoms.length == 3)
    assert(math.abs(Algos.area(t) - Algos.area(p)) < 1e-9)
  }

  test("triangulate: reflex (L-shaped) polygon preserves area, no triangle leaks outside") {
    val p = g("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    val t = Shape.triangulate(p).asInstanceOf[MultiPolygon]
    assert(t.geoms.length == 4) // 6 distinct vertices -> n-2
    assert(math.abs(Algos.area(t) - 12.0) < 1e-9)
    // centroid of every triangle lies inside the original polygon
    t.geoms.foreach { tri =>
      val c = Algos.centroid(tri)
      assert(Algos.pointInPolygon(c.x, c.y, p.asInstanceOf[Polygon]) > 0)
    }
  }

  test("triangulate: CW input normalizes; holes and lines -> null") {
    val cw = g("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")
    val t = Shape.triangulate(cw).asInstanceOf[MultiPolygon]
    assert(t.geoms.length == 2 && math.abs(Algos.area(t) - 16.0) < 1e-12)
    assert(Shape.triangulate(g("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (4 4, 5 4, 5 5, 4 5, 4 4))")) == null)
    assert(Shape.triangulate(g("LINESTRING (0 0, 1 1)")) == null)
  }

  // ------------------------------------------- bounding circle geometry

  test("minBoundingCircleGeom: 32-gon containing all inputs, correct radius") {
    val mp = g("MULTIPOINT ((0 0), (6 8), (3 3))")
    val c = Shape.minBoundingCircleGeom(mp, 32).asInstanceOf[Polygon]
    assert(c.exterior.length == 66) // 32 + closure
    val e = c.envelope
    assert(math.abs(e.maxX - 8.0) < 1e-9 && math.abs(e.maxY - 9.0) < 1e-9)
  }

  test("minBoundingCircleGeom: single point -> the point itself") {
    assert(Shape.minBoundingCircleGeom(g("POINT (3 4)"), 32) == Point(3, 4))
  }

  // ------------------------------------------------------------ Chaikin

  test("chaikin open line: endpoints preserved, 2n points, corner cut") {
    val l = Shape.chaikin(g("LINESTRING (0 0, 4 0, 4 4)"), 1).asInstanceOf[LineString]
    assert(l.numPoints == 6)
    assert(l.coords(0) == 0.0 && l.coords(1) == 0.0)
    assert(l.coords(10) == 4.0 && l.coords(11) == 4.0)
    // the original corner (4,0) is gone
    assert(!(0 until l.numPoints).exists(i => l.coords(2 * i) == 4.0 && l.coords(2 * i + 1) == 0.0))
  }

  test("chaikin ring: vertex count doubles, stays closed, area grows toward circle") {
    val p0 = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val p = Shape.chaikin(p0, 1).asInstanceOf[Polygon]
    val r = p.exterior
    assert(r.length == 18) // 8 distinct + closure
    assert(r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
    // corner cutting removes 4 half-unit corner triangles: 16 - 4*0.5 = 14
    assert(math.abs(Algos.area(p) - 14.0) < 1e-12)
  }

  // ------------------------------------------------------- shared paths

  test("sharedPaths: overlap piece with interval merge of coincident blades") {
    val a = g("LINESTRING (0 0, 10 0)")
    // two b-segments overlap each other on [2,6] and [4,8] -> merged [2,8]
    val b = g("MULTILINESTRING ((2 0, 6 0), (4 0, 8 0))")
    val sp = Shape.sharedPaths(a, b).asInstanceOf[MultiLineString]
    assert(sp.geoms.length == 1)
    assert(math.abs(Algos.length(sp) - 6.0) < 1e-12)
  }

  test("sharedPaths: opposite-direction overlap still detected; disjoint -> empty") {
    val a = g("LINESTRING (0 0, 10 0)")
    val rev = g("LINESTRING (7 0, 3 0)")
    val sp = Shape.sharedPaths(a, rev).asInstanceOf[MultiLineString]
    assert(math.abs(Algos.length(sp) - 4.0) < 1e-12)
    val none = Shape.sharedPaths(a, g("LINESTRING (0 1, 10 1)")).asInstanceOf[MultiLineString]
    assert(none.geoms.isEmpty)
    assert(Shape.sharedPaths(a, g("POINT (1 0)")) == null)
  }

  // ---------------------------------------------------------- subdivide

  test("subdivide: small input passes through; large tiles exactly") {
    val rect = g("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    assert(Shape.subdivide(rect, 8).toSeq == Seq(rect))
    val dense = Algos.segmentize(g("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))"), 1.0)
    val parts = Shape.subdivide(dense, 12)
    assert(parts.length > 1)
    assert(parts.forall(_.numPoints <= 12))
    assert(math.abs(parts.map(Algos.area).sum - 64.0) < 1e-9)
  }

  // ------------------------------------------------------- offset curve

  test("offsetCurve: elbow miter on both sides; straight line stays parallel") {
    val elbow = g("LINESTRING (0 0, 10 0, 10 6)")
    val left = Shape.offsetCurve(elbow, 2.0).asInstanceOf[LineString]
    assert(left.coords.map(x => math.rint(x * 1e9) / 1e9).toSeq ==
      Seq(0.0, 2.0, 8.0, 2.0, 8.0, 6.0))
    val right = Shape.offsetCurve(elbow, -2.0).asInstanceOf[LineString]
    assert(right.coords.map(x => math.rint(x * 1e9) / 1e9).toSeq ==
      Seq(0.0, -2.0, 12.0, -2.0, 12.0, 6.0))
    val straight = Shape.offsetCurve(g("LINESTRING (0 0, 4 0, 9 0)"), 1.5)
      .asInstanceOf[LineString]
    assert(straight == g("LINESTRING (0 1.5, 4 1.5, 9 1.5)"))
    assert(Shape.offsetCurve(g("POINT (1 1)"), 1.0) == null)
  }

  // ------------------------------------------------------- line editing

  test("add/remove/set point and st_multi semantics") {
    val l = g("LINESTRING (0 0, 5 0, 5 5)")
    assert(Shape.addPoint(l, Point(9, 9), -1) == g("LINESTRING (0 0, 5 0, 5 5, 9 9)"))
    assert(Shape.addPoint(l, Point(1, 1), 1) == g("LINESTRING (0 0, 1 1, 5 0, 5 5)"))
    assert(Shape.addPoint(l, Point(1, 1), 4) == null)
    assert(Shape.removePoint(l, 1) == g("LINESTRING (0 0, 5 5)"))
    assert(Shape.removePoint(g("LINESTRING (0 0, 1 1)"), 0) == null)
    assert(Shape.setPoint(l, -1, Point(7, 7)) == g("LINESTRING (0 0, 5 0, 7 7)"))
    assert(Shape.setPoint(l, 3, Point(7, 7)) == null)
    assert(Shape.asMulti(Point(1, 2)) == MultiPoint(Array(Point(1, 2))))
    assert(Shape.asMulti(g("MULTIPOINT ((1 2))")) == g("MULTIPOINT ((1 2))"))
  }

  // -------------------------------------------------------------- tiles

  test("tileEnvelope: z=0 is the whole world; z=1 quadrants; bad input null") {
    val o = 20037508.342789244
    val world = Shape.tileEnvelope(0, 0, 0).envelope
    assert(world.minX == -o && world.maxX == o && world.minY == -o && world.maxY == o)
    val q = Shape.tileEnvelope(1, 1, 0).envelope // NE quadrant (y from north)
    assert(q.minX == 0.0 && q.maxX == o && q.minY == 0.0 && q.maxY == o)
    assert(Shape.tileEnvelope(1, 2, 0) == null && Shape.tileEnvelope(-1, 0, 0) == null)
  }
}
