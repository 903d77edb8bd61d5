package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** st_azimuth / st_closestpoint / st_shortestline kernels plus the line
  * accessors and coordinate utilities (q105-q107). */
class ProximityAccessorsSpec extends AnyFunSuite {
  private def pg(wkt: String): Geometry = WKT.read(wkt)
  private def props(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(7); (1 to n).foreach(_ => body(rnd))
  }

  // ------------------------------------------------------------- proximity

  test("azimuth: cardinal directions and quadrant wrap") {
    assert(Algos.azimuth(0, 0, 0, 1) == 0.0)                       // north
    assert(Algos.azimuth(0, 0, 1, 0) == math.Pi / 2)               // east
    assert(Algos.azimuth(0, 0, 0, -1) == math.Pi)                  // south
    assert(Algos.azimuth(0, 0, -1, 0) == 3 * math.Pi / 2)          // west
    assert(Algos.azimuth(2, 3, 2, 3).isNaN)                        // degenerate
    assert(math.abs(Algos.azimuth(0, 0, 1, 1) - math.Pi / 4) < 1e-15)
  }

  test("closestPoints: point to envelope clamps to nearest corner/edge") {
    val env = pg("POLYGON ((2 3, 5 3, 5 6, 2 6, 2 3))")
    // below-left of the box: corner
    val c1 = Algos.closestPoints(env, Point(0, 0))
    assert(c1(0) == 2.0 && c1(1) == 3.0 && c1(2) == 0.0 && c1(3) == 0.0)
    // directly below: edge projection
    val c2 = Algos.closestPoints(env, Point(4, 0))
    assert(c2(0) == 4.0 && c2(1) == 3.0)
    // symmetric direction: first pair element lies ON the first argument
    val c3 = Algos.closestPoints(Point(4, 0), env)
    assert(c3(0) == 4.0 && c3(1) == 0.0 && c3(2) == 4.0 && c3(3) == 3.0)
  }

  test("closestPoints: matches distance on random disjoint segment pairs") {
    props(200) { rnd =>
      def seg(dx: Double) = LineString(Array(
        dx + rnd.nextDouble() * 4, rnd.nextDouble() * 10,
        dx + rnd.nextDouble() * 4, rnd.nextDouble() * 10))
      val a = seg(0); val b = seg(10) // x-ranges [0,4] vs [10,14]: disjoint
      val c = Algos.closestPoints(a, b)
      val d = math.hypot(c(0) - c(2), c(1) - c(3))
      assert(math.abs(d - Algos.distance(a, b)) < 1e-9)
    }
  }

  test("closestPoints: intersecting inputs return a shared witness") {
    val a = pg("LINESTRING (0 0, 10 10)")
    val b = pg("LINESTRING (0 10, 10 0)")
    val c = Algos.closestPoints(a, b)
    assert(c(0) == 5.0 && c(1) == 5.0 && c(2) == 5.0 && c(3) == 5.0)
    // vertex-on-boundary witness
    val env = pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val w = Algos.closestPoints(env, Point(2, 2))
    assert(w(0) == 2.0 && w(1) == 2.0)
    assert(Algos.closestPoints(env, Point.empty) == null)
  }

  // -------------------------------------------------------- line accessors

  test("start/end/pointN on a LineString; null elsewhere") {
    val l = pg("LINESTRING (0 0, 3 4, 10 -2)")
    assert(Algos.startPoint(l) == Point(0, 0))
    assert(Algos.endPoint(l) == Point(10, -2))
    assert(Algos.pointN(l, 1) == Point(0, 0))
    assert(Algos.pointN(l, 2) == Point(3, 4))
    assert(Algos.pointN(l, 3) == Point(10, -2))
    assert(Algos.pointN(l, -1) == Point(10, -2))
    assert(Algos.pointN(l, -3) == Point(0, 0))
    assert(Algos.pointN(l, 4) == null)
    assert(Algos.pointN(l, -4) == null)
    assert(Algos.pointN(l, 0) == null)
    assert(Algos.startPoint(pg("POINT (1 2)")) == null)
    assert(Algos.endPoint(pg("POLYGON ((0 0, 1 0, 1 1, 0 0))")) == null)
  }

  test("reverse preserves structure and reverses traversal") {
    assert(WKT.write(Algos.reverse(pg("LINESTRING (0 0, 1 1, 2 0)"))) ==
      "LINESTRING (2 0, 1 1, 0 0)")
    // polygon rings reverse per ring; part order stays
    assert(WKT.write(Algos.reverse(pg("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"))) ==
      "MULTILINESTRING ((1 1, 0 0), (3 3, 2 2))")
    assert(Algos.reverse(pg("POINT (1 2)")) == Point(1, 2))
    // double reverse is identity
    val poly = pg("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(Algos.reverse(Algos.reverse(poly)) == poly)
    // reversing a ring flips signed orientation: area is unchanged (absolute)
    assert(Algos.area(Algos.reverse(poly)) == Algos.area(poly))
  }

  test("snapToGrid rounds half-up; size<=0 is identity") {
    assert(Algos.snapToGrid(Point(1.25, -1.25), 1.0) == Point(1.0, -1.0))
    assert(Algos.snapToGrid(Point(1.5, 2.5), 1.0) == Point(2.0, 3.0))
    assert(Algos.snapToGrid(Point(1.25, 0.3), 0.5) == Point(1.5, 0.5))
    assert(Algos.snapToGrid(Point(1.23, 4.56), 0.0) == Point(1.23, 4.56))
    val l = Algos.snapToGrid(pg("LINESTRING (0.1 0.9, 3.4 3.6)"), 1.0)
    assert(WKT.write(l) == "LINESTRING (0 1, 3 4)")
  }

  test("flipCoordinates swaps axes; involution") {
    assert(Algos.flipCoordinates(Point(3, 7)) == Point(7, 3))
    val g = pg("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    assert(Algos.flipCoordinates(Algos.flipCoordinates(g)) == g)
    assert(WKT.write(Algos.flipCoordinates(pg("LINESTRING (1 2, 3 4)"))) ==
      "LINESTRING (2 1, 4 3)")
  }

  test("perimeter sums all rings incl. holes; 0 for non-areal") {
    assert(Algos.perimeter(pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")) == 16.0)
    assert(Algos.perimeter(
      pg("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")) == 48.0)
    assert(Algos.perimeter(pg("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")) == 12.0)
    assert(Algos.perimeter(pg("LINESTRING (0 0, 3 4)")) == 0.0)
    assert(Algos.perimeter(pg("POINT (1 2)")) == 0.0)
  }

  // ---------------------------------------------------- linear referencing

  test("lineInterpolatePoint walks multi-segment lines by length") {
    val l = pg("LINESTRING (0 0, 4 0, 4 4)") // total length 8
    assert(Algos.lineInterpolatePoint(l, 0.0) == Point(0, 0))
    assert(Algos.lineInterpolatePoint(l, 0.25) == Point(2, 0))
    assert(Algos.lineInterpolatePoint(l, 0.5) == Point(4, 0))
    assert(Algos.lineInterpolatePoint(l, 0.75) == Point(4, 2))
    assert(Algos.lineInterpolatePoint(l, 1.0) == Point(4, 4))
    assert(Algos.lineInterpolatePoint(l, -3.0) == Point(0, 0)) // clamps
    assert(Algos.lineInterpolatePoint(l, 9.0) == Point(4, 4))
    assert(Algos.lineInterpolatePoint(pg("POINT (1 2)"), 0.5) == null)
  }

  test("lineLocatePoint returns length fraction of the nearest on-line point") {
    val l = pg("LINESTRING (0 0, 4 0, 4 4)")
    assert(Algos.lineLocatePoint(l, 2, 0) == 0.25)
    assert(Algos.lineLocatePoint(l, 4, 2) == 0.75)
    assert(Algos.lineLocatePoint(l, 2, 1) == 0.25)   // off-line probe projects down
    assert(Algos.lineLocatePoint(l, -5, 0) == 0.0)   // clamps to start
    assert(Algos.lineLocatePoint(l, 4, 9) == 1.0)    // clamps to end
    assert(Algos.lineLocatePoint(pg("POLYGON ((0 0, 1 0, 1 1, 0 0))"), 0, 0).isNaN)
  }

  test("lineSubstring keeps interior vertices, interpolates cut ends") {
    val l = pg("LINESTRING (0 0, 4 0, 4 4)")
    assert(WKT.write(Algos.lineSubstring(l, 0.25, 0.75)) == "LINESTRING (2 0, 4 0, 4 2)")
    assert(WKT.write(Algos.lineSubstring(l, 0.0, 0.5)) == "LINESTRING (0 0, 4 0)")
    assert(WKT.write(Algos.lineSubstring(l, 0.625, 1.0)) == "LINESTRING (4 1, 4 4)")
    assert(Algos.lineSubstring(l, 0.75, 0.25) == null)
    assert(Algos.lineSubstring(l, 0.5, 0.5) == null)
  }

  test("project: inverse of azimuth+distance") {
    props(100) { rnd =>
      val (x1, y1) = (rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble)
      val (x2, y2) = (rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble)
      if (x1 != x2 || y1 != y2) {
        val az = Algos.azimuth(x1, y1, x2, y2)
        val d = math.hypot(x2 - x1, y2 - y1)
        val p = Algos.project(x1, y1, d, az)
        assert(math.abs(p.x - x2) < 1e-9 && math.abs(p.y - y2) < 1e-9)
      }
    }
  }

  test("interior rings and polygon/line builders") {
    val holed = pg("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(Algos.numInteriorRings(holed) == 1)
    assert(Algos.numInteriorRings(pg("POLYGON ((0 0, 1 0, 1 1, 0 0))")) == 0)
    assert(Algos.numInteriorRings(pg("POINT (1 1)")) == -1)
    assert(WKT.write(Algos.interiorRingN(holed, 1)) == "LINESTRING (2 2, 4 2, 4 4, 2 4, 2 2)")
    assert(Algos.interiorRingN(holed, 2) == null)
    assert(Algos.interiorRingN(holed, 0) == null)
    assert(WKT.write(Algos.makeLine(Point(0, 0), Point(3, 4))) == "LINESTRING (0 0, 3 4)")
    assert(WKT.write(Algos.makeLine(pg("LINESTRING (0 0, 1 1)"), Point(2, 2))) ==
      "LINESTRING (0 0, 1 1, 2 2)")
    assert(Algos.makeLine(holed, Point(0, 0)) == null)
    val ring = pg("LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)")
    assert(Algos.area(Algos.makePolygon(ring)) == 16.0)
    assert(Algos.makePolygon(pg("LINESTRING (0 0, 1 1)")) == null)
  }

  test("farthestPoints: vertex-exact max distance; dual of closestPoints") {
    val env = pg("POLYGON ((2 3, 5 3, 5 6, 2 6, 2 3))")
    val f = Algos.farthestPoints(Point(0, 0), env)
    assert(f(0) == 0.0 && f(1) == 0.0 && f(2) == 5.0 && f(3) == 6.0)
    // max over two segments: attained at endpoints
    val g = Algos.farthestPoints(pg("LINESTRING (0 0, 1 0)"), pg("LINESTRING (10 0, 11 0)"))
    assert(g(0) == 0.0 && g(2) == 11.0)
    assert(Algos.farthestPoints(Point(0, 0), Point.empty) == null)
    // intersecting inputs still have a farthest pair (unlike distance = 0)
    val self = Algos.farthestPoints(env, env)
    assert(math.hypot(self(0) - self(2), self(1) - self(3)) == math.hypot(3, 3))
  }

  test("angle: clockwise at the vertex, degenerate rays are NaN") {
    // at origin: ray to (0,1) is north (az 0), ray to (1,0) is east (az pi/2)
    assert(Algos.angle(0, 1, 0, 0, 1, 0) == math.Pi / 2)        // north -> east
    assert(Algos.angle(1, 0, 0, 0, 0, 1) == 3 * math.Pi / 2)    // east -> north (cw wrap)
    assert(Algos.angle(0, 1, 0, 0, 0, -1) == math.Pi)
    assert(Algos.angle(0, 0, 0, 0, 1, 1).isNaN)
  }

  test("segmentize densifies to <= maxLen pieces, preserves length/shape") {
    val l = pg("LINESTRING (0 0, 8 0)")
    assert(WKT.write(Algos.segmentize(l, 2.0)) == "LINESTRING (0 0, 2 0, 4 0, 6 0, 8 0)")
    assert(WKT.write(Algos.segmentize(l, 3.0)) ==
      "LINESTRING (0 0, 2.6666666666666665 0, 5.333333333333333 0, 8 0)")
    assert(Algos.segmentize(l, 0.0) eq l)
    val ring = Algos.segmentize(pg("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"), 1.0)
    assert(ring.numPoints == 13) // 4 sides x 3 pieces + closure
    assert(Algos.area(ring) == 9.0)
    assert(Algos.perimeter(ring.asInstanceOf[Polygon]) == 12.0)
  }

  test("normalizeText strips control chars, collapses ws, composes NFC") {
    import graft.pipeline.TextKernels.normalizeText
    assert(normalizeText("  a \t\n b  ") == "a b")
    assert(normalizeText("café") == "café")
    assert(normalizeText("") == "")
    assert(normalizeText("  ") == "")
    // \x0B and \x0C are stripped (not collapsed): java/RE2 \s disagreement zone
    assert(normalizeText("ab") == "ab")
  }

  // ------------------------------------------------------------ SQL surface

  test("WKB fuzz: corrupt bytes decode to null, never throw") {
    val rnd = new scala.util.Random(99)
    (1 to 2000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(60))(rnd.nextInt(256).toByte)
      WKB.readOrNull(bytes) // must not throw, result may be null or garbage-valid
    }
    // truncations of a valid geometry
    val good = WKB.write(pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    (0 until good.length).foreach { n =>
      WKB.readOrNull(java.util.Arrays.copyOf(good, n))
    }
    // absurd declared counts must not allocate/crash
    val bomb = java.nio.ByteBuffer.allocate(9).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bomb.put(1.toByte).putInt(5).putInt(Int.MaxValue) // multipolygon, 2^31-1 parts
    assert(WKB.readOrNull(bomb.array()) == null)
  }

  test("covers vs contains: boundary contact suffices for covers only") {
    val env = pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(Algos.covers(env, Point(0, 0)) && !Algos.contains(env, Point(0, 0)))
    assert(Algos.covers(env, Point(2, 0)) && !Algos.contains(env, Point(2, 0)))
    assert(Algos.covers(env, Point(2, 2)) && Algos.contains(env, Point(2, 2)))
    assert(!Algos.covers(env, Point(5, 2)))
    // a line lying on the boundary is covered, not contained
    assert(Algos.covers(env, pg("LINESTRING (0 0, 4 0)")))
    assert(!Algos.covers(env, pg("LINESTRING (0 0, 5 0)")))
    // line covers its endpoints (contains excludes them)
    val l = pg("LINESTRING (0 0, 3 4)")
    assert(Algos.covers(l, Point(0, 0)) && !Algos.contains(l, Point(0, 0)))
    assert(Algos.covers(l, Point(1.5, 2.0)))
    assert(Algos.covers(pg("MULTIPOINT ((1 1), (2 2))"), pg("MULTIPOINT ((2 2), (1 1))")))
  }

  test("hausdorff: translation of a box is the shift norm; subsets collapse") {
    val env = pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val shifted = AffineOps.translate(env, 2, 3)
    assert(math.abs(Algos.hausdorff(env, shifted) - math.hypot(2, 3)) < 1e-12)
    assert(Algos.hausdorff(env, env) == 0.0)
    // point vs box: symmetric max = farthest corner
    assert(Algos.hausdorff(Point(0, 0), pg("POLYGON ((2 3, 5 3, 5 6, 2 6, 2 3))")) ==
      math.hypot(5, 6))
    assert(Algos.hausdorff(Point(0, 0), Point.empty).isNaN)
    // asymmetric sets: H is the max of both directions
    assert(Algos.hausdorff(pg("MULTIPOINT ((0 0))"), pg("MULTIPOINT ((0 0), (10 0))")) == 10.0)
  }

  test("st_collectionextract recurses into nested collections") {
    val spark = graft.TestSpark.spark
    val row = spark.sql(
      """SELECT st_astext(st_collectionextract(st_geomfromtext(
        |  'GEOMETRYCOLLECTION (MULTIPOINT ((1 1), (2 2)), LINESTRING (0 0, 1 1))'), 1)) AS pts
        |""".stripMargin).head()
    assert(row.getString(0) == "MULTIPOINT ((1 1), (2 2))")
  }

  test("st_squaregrid guards absurd cell counts without overflowing") {
    val spark = graft.TestSpark.spark
    val e = intercept[Exception] {
      spark.sql("SELECT st_squaregrid(0.0, 0.0, 1e10, 1e10, 1.0)").collect()
    }
    assert(e.getMessage != null)
  }

  test("st_squaregrid tessellates origin-aligned cells; version export") {
    val spark = graft.TestSpark.spark
    val row = spark.sql(
      """SELECT
        |  size(st_squaregrid(0.0, 0.0, 3.0, 2.0, 1.0)) AS n,
        |  st_astext(element_at(st_squaregrid(0.0, 0.0, 3.0, 2.0, 1.0), 1)) AS first_cell,
        |  st_astext(element_at(st_squaregrid(0.0, 0.0, 3.0, 2.0, 1.0), 6)) AS last_cell,
        |  size(st_squaregrid(0.5, 0.5, 1.5, 1.5, 1.0)) AS n_unaligned,
        |  st_squaregrid(0.0, 0.0, 0.0, 1.0, 1.0) IS NULL AS degenerate_null,
        |  graft_version() AS ver
        |""".stripMargin).head()
    assert(row.getInt(0) == 6)
    assert(row.getString(1) == "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(row.getString(2) == "POLYGON ((2 1, 3 1, 3 2, 2 2, 2 1))")
    assert(row.getInt(3) == 4) // unaligned box straddles 2x2 cells
    assert(row.getBoolean(4))
    assert(row.getString(5) == graft.BuildInfo.versionString)
  }

  test("new kernels evaluate through SQL with codegen") {
    val spark = graft.TestSpark.spark
    val row = spark.sql(
      """SELECT
        |  st_azimuth(st_point(0.0, 0.0), st_point(1.0, 0.0)) AS az,
        |  st_x(st_closestpoint(st_makeenvelope(2.0, 3.0, 5.0, 6.0), st_point(0.0, 0.0))) AS cx,
        |  st_astext(st_shortestline(st_point(0.0, 0.0), st_makeenvelope(2.0, 0.0, 4.0, 2.0))) AS sl,
        |  st_astext(st_pointn(st_geomfromtext('LINESTRING (0 0, 3 4, 6 0)'), -2)) AS p2,
        |  st_astext(st_reverse(st_geomfromtext('LINESTRING (0 0, 1 1)'))) AS rev,
        |  st_astext(st_snaptogrid(st_point(1.25, 2.75), 0.5)) AS snapped,
        |  st_perimeter(st_makeenvelope(0.0, 0.0, 3.0, 2.0)) AS per,
        |  st_astext(st_flipcoordinates(st_point(1.0, 2.0))) AS flipped,
        |  st_astext(st_startpoint(st_geomfromtext('LINESTRING (9 8, 7 6)'))) AS sp,
        |  st_astext(st_endpoint(st_geomfromtext('LINESTRING (9 8, 7 6)'))) AS ep
        |""".stripMargin).head()
    assert(row.getDouble(0) == math.Pi / 2)
    assert(row.getDouble(1) == 2.0)
    assert(row.getString(2) == "LINESTRING (0 0, 2 0)")
    assert(row.getString(3) == "POINT (3 4)")
    assert(row.getString(4) == "LINESTRING (1 1, 0 0)")
    assert(row.getString(5) == "POINT (1.5 3)")
    assert(row.getDouble(6) == 10.0)
    assert(row.getString(7) == "POINT (2 1)")
    assert(row.getString(8) == "POINT (9 8)")
    assert(row.getString(9) == "POINT (7 6)")
  }
}
