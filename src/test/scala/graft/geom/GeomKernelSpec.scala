package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomKernelSpec extends AnyFunSuite {
  // deterministic pseudo-property tests (no scalatest-scalacheck bridge offline)
  private def props(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42); (1 to n).foreach(_ => body(rnd))
  }
  private def unif(rnd: scala.util.Random, lo: Double, hi: Double): Double =
    lo + rnd.nextDouble() * (hi - lo)

  private def pg(wkt: String): Geometry = WKT.read(wkt)

  // ------------------------------------------------------------------ WKB

  test("WKB round-trips every geometry type") {
    val fixtures = Seq(
      "POINT (1 2)",
      "POINT EMPTY",
      "LINESTRING (0 0, 1 1, 2 0)",
      "LINESTRING EMPTY",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "POLYGON EMPTY",
      "MULTIPOINT ((0 0), (1 1))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
      "GEOMETRYCOLLECTION EMPTY")
    for (w <- fixtures) {
      val g = pg(w)
      val rt = WKB.read(WKB.write(g))
      // case-class == fails on NaN coords (empty points); WKT text is canonical
      assert(WKT.write(rt) == WKT.write(g), s"roundtrip failed for $w")
    }
  }

  test("WKB reads big-endian input") {
    // big-endian POINT (1 2)
    val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte).putInt(1).putDouble(1.0).putDouble(2.0)
    assert(WKB.read(buf.array()) == Point(1, 2))
  }

  test("WKB property round-trip on random points/linestrings") {
    props(100) { rnd =>
      val ls = LineString(Array.fill(8)(unif(rnd, -1e6, 1e6)))
      assert(WKB.read(WKB.write(ls)) == ls)
      val p = Point(unif(rnd, -1e6, 1e6), unif(rnd, -1e6, 1e6))
      assert(WKB.read(WKB.write(p)) == p)
    }
  }

  test("peekTypeId matches full decode") {
    val fixtures = Seq("POINT (1 2)" -> 0, "LINESTRING (0 0, 1 1)" -> 1,
      "POLYGON ((0 0, 1 0, 1 1, 0 0))" -> 3, "MULTIPOINT ((0 0))" -> 4,
      "MULTILINESTRING ((0 0, 1 1))" -> 5, "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))" -> 6,
      "GEOMETRYCOLLECTION (POINT (0 0))" -> 7)
    for ((w, id) <- fixtures) assert(WKB.peekTypeId(WKB.write(pg(w))) == id, w)
  }

  // ----------------------------------------------------------------- area

  test("area: shoelace with holes; zero for points/lines") {
    assert(Algos.area(pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")) == 16.0)
    assert(Algos.area(pg("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")) == 96.0)
    assert(Algos.area(pg("POINT (3 3)")) == 0.0)
    assert(Algos.area(pg("LINESTRING (0 0, 5 5)")) == 0.0)
    // CW orientation must give the same unsigned area
    assert(Algos.area(pg("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")) == 16.0)
    assert(Algos.area(pg("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")) == 5.0)
  }

  test("area invariant under translation/rotation (property)") {
    val tri = pg("POLYGON ((0 0, 5 0, 0 5, 0 0))")
    props(100) { rnd =>
      val moved = AffineOps.rotate(
        AffineOps.translate(tri, unif(rnd, -100, 100), unif(rnd, -100, 100)),
        unif(rnd, 0, 360), TransformOrigin.Center)
      assert(math.abs(Algos.area(moved) - 12.5) < 1e-6)
    }
  }

  // --------------------------------------------------------------- length

  test("length: segments sum; polygon = exterior ring only") {
    assert(Algos.length(pg("LINESTRING (0 0, 3 4)")) == 5.0)
    assert(Algos.length(pg("LINESTRING (0 0, 3 4, 3 9)")) == 10.0)
    // hole should NOT count (reference geoseries.rs:38-40)
    assert(Algos.length(pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")) == 16.0)
    assert(Algos.length(pg("POINT (1 1)")) == 0.0)
  }

  // ------------------------------------------------------------- centroid

  test("centroid: mean/length-weighted/area-weighted") {
    val c1 = Algos.centroid(pg("POINT (3 7)"))
    assert(c1 == Point(3, 7))
    val c2 = Algos.centroid(pg("MULTIPOINT ((0 0), (2 0), (2 2), (0 2))"))
    assert(c2 == Point(1, 1))
    val c3 = Algos.centroid(pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(math.abs(c3.x - 2) < 1e-12 && math.abs(c3.y - 2) < 1e-12)
    val c4 = Algos.centroid(pg("LINESTRING (0 0, 0 10)"))
    assert(c4 == Point(0, 5))
    // right triangle centroid = mean of vertices
    val c5 = Algos.centroid(pg("POLYGON ((0 0, 6 0, 0 6, 0 0))"))
    assert(math.abs(c5.x - 2) < 1e-12 && math.abs(c5.y - 2) < 1e-12)
    // hole pulls centroid away
    val c6 = Algos.centroid(pg("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (6 6, 9 6, 9 9, 6 9, 6 6))"))
    assert(c6.x < 5 && c6.y < 5)
    assert(Algos.centroid(Point.empty).isEmpty)
  }

  // --------------------------------------------------- envelope & hull

  test("envelope geometry") {
    assert(WKT.write(Algos.envelopeGeom(pg("LINESTRING (1 2, 5 7, 3 0)"))) ==
      "POLYGON ((1 0, 5 0, 5 7, 1 7, 1 0))")
    assert(Algos.envelopeGeom(pg("POINT (2 3)")) == Point(2, 3))
  }

  test("convex hull: diamond + interior point; degenerate cases") {
    val h = Algos.convexHull(pg("MULTIPOINT ((0 5), (5 0), (0 -5), (-5 0), (1 1))"))
    assert(Algos.area(h) == 50.0)
    assert(h.asInstanceOf[Polygon].rings(0).length / 2 == 5) // 4 distinct + closure
    assert(Algos.convexHull(pg("POINT (1 1)")) == Point(1, 1))
    assert(Algos.convexHull(pg("MULTIPOINT ((0 0), (3 3))")).isInstanceOf[LineString])
    // envelope contains hull contains the geometry's coords (property)
    props(100) { rnd =>
      val mp = MultiPoint(Array.fill(6)(Point(unif(rnd, -50, 50), unif(rnd, -50, 50))))
      val hull = Algos.convexHull(mp)
      mp.geoms.foreach { p =>
        assert(hull.envelope.contains(p.x, p.y))
        hull match {
          case poly: Polygon => assert(Algos.pointInPolygon(p.x, p.y, poly) > 0)
          case _ => ()
        }
      }
    }
  }

  // ------------------------------------------------------------ ring ops

  test("exterior ring and is_ring") {
    val ext = Algos.exteriorRing(pg("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"))
    assert(WKT.write(ext) == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)")
    assert(Algos.exteriorRing(pg("POINT (1 1)")) == null)
    assert(Algos.isRing(pg("LINESTRING (0 0, 1 0, 1 1, 0 0)")))
    assert(!Algos.isRing(pg("LINESTRING (0 0, 1 0, 1 1)")))
  }

  // ------------------------------------------------------------- simplify

  test("Douglas-Peucker keeps endpoints, drops near-collinear points") {
    val l = pg("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    val s = Algos.simplify(l, 0.1).asInstanceOf[LineString]
    assert(s.numPoints == 2)
    assert(s.coords(0) == 0 && s.coords(2) == 4)
    val keep = Algos.simplify(pg("LINESTRING (0 0, 2 2, 4 0)"), 0.1).asInstanceOf[LineString]
    assert(keep.numPoints == 3)
  }

  // ---------------------------------------------------------- predicates

  test("point-in-polygon: interior/boundary/exterior, holes") {
    val p = pg("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))").asInstanceOf[Polygon]
    assert(Algos.pointInPolygon(2, 2, p) == 2)
    assert(Algos.pointInPolygon(0, 5, p) == 1)  // on exterior boundary
    assert(Algos.pointInPolygon(5, 5, p) == 0)  // inside hole
    assert(Algos.pointInPolygon(4, 5, p) == 1)  // on hole boundary
    assert(Algos.pointInPolygon(20, 20, p) == 0)
  }

  test("intersects / contains matrix (reference spatial_index.rs:89-137 semantics)") {
    val square = pg("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")
    assert(Algos.intersects(square, pg("POINT (1 1)")))
    assert(Algos.contains(square, pg("POINT (1 1)")))
    assert(!Algos.contains(square, pg("POINT (0 10)"))) // boundary not contained
    assert(Algos.intersects(square, pg("POINT (0 10)"))) // but intersects
    assert(!Algos.intersects(square, pg("POINT (30 30)")))
    // polygon-polygon
    val overlap = pg("POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))")
    assert(Algos.intersects(square, overlap) && Algos.intersects(overlap, square))
    assert(!Algos.contains(square, overlap))
    val inner = pg("POLYGON ((5 5, 8 5, 8 8, 5 8, 5 5))")
    assert(Algos.contains(square, inner) && !Algos.contains(inner, square))
    assert(Algos.intersects(square, inner))
    // disjoint
    val far = pg("POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))")
    assert(!Algos.intersects(square, far) && !Algos.contains(square, far))
    // surrounding ring (envelope overlaps, no real intersection: square inside hole)
    val donut = pg("POLYGON ((-10 -10, 40 -10, 40 40, -10 40, -10 -10), (-5 -5, 25 -5, 25 25, -5 25, -5 -5))")
    assert(!Algos.intersects(donut, pg("POINT (10 10)")))
    assert(!Algos.contains(donut, square))
    // line cases
    val line = pg("LINESTRING (-5 10, 25 10)")
    assert(Algos.intersects(square, line))
    assert(!Algos.contains(square, line))
    val lineIn = pg("LINESTRING (2 2, 18 18)")
    assert(Algos.contains(square, lineIn))
    // linestring contains point (not endpoint)
    val seg = pg("LINESTRING (0 0, 10 0)")
    assert(Algos.contains(seg, pg("POINT (5 0)")))
    assert(!Algos.contains(seg, pg("POINT (0 0)"))) // endpoint = boundary
    assert(Algos.intersects(seg, pg("POINT (0 0)")))
  }

  // ------------------------------------------------------------- distance

  test("distance") {
    assert(Algos.distance(pg("POINT (0 0)"), pg("POINT (3 4)")) == 5.0)
    assert(Algos.distance(pg("POINT (5 5)"), pg("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")) ==
      math.sqrt(9 + 9))
    assert(Algos.distance(pg("POINT (1 1)"), pg("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")) == 0.0)
    assert(Algos.distance(pg("LINESTRING (0 0, 10 0)"), pg("LINESTRING (0 5, 10 5)")) == 5.0)
    assert(Algos.distance(pg("LINESTRING (0 0, 10 10)"), pg("LINESTRING (0 10, 10 0)")) == 0.0)
  }

  // --------------------------------------------------------------- affine

  test("affine family: translate/rotate/scale/skew/matrix") {
    val p = pg("POINT (1 2)")
    assert(AffineOps.translate(p, 10, 20) == Point(11, 22))
    val r = AffineOps.rotate(p, 90, TransformOrigin.XY(0, 0)).asInstanceOf[Point]
    assert(math.abs(r.x - (-2)) < 1e-12 && math.abs(r.y - 1) < 1e-12)
    val s = AffineOps.scale(pg("LINESTRING (0 0, 2 2)"), 2, 3, TransformOrigin.XY(0, 0))
    assert(WKT.write(s) == "LINESTRING (0 0, 4 6)")
    // scale about center keeps center fixed
    val sq = pg("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val s2 = AffineOps.scale(sq, 2, 2, TransformOrigin.Center)
    assert(s2.envelope == Envelope(-1, -1, 3, 3))
    // skew: x' = x + tan(xs)*(y - oy)
    val sk = AffineOps.skew(pg("POINT (0 1)"), 45, 0, TransformOrigin.XY(0, 0)).asInstanceOf[Point]
    assert(math.abs(sk.x - 1.0) < 1e-12 && math.abs(sk.y - 1.0) < 1e-12)
    // matrix composition property: translate∘translate = translate of sums
    props(100) { rnd =>
      val (a, b, c, d) = (unif(rnd, -50, 50), unif(rnd, -50, 50), unif(rnd, -50, 50), unif(rnd, -50, 50))
      val m = AffineMatrix.translation(a, b).compose(AffineMatrix.translation(c, d))
      assert(m == AffineMatrix.translation(a + c, b + d))
    }
  }

  test("rotate 360 == identity (property)") {
    props(100) { rnd =>
      val (x, y) = (unif(rnd, -100, 100), unif(rnd, -100, 100))
      val p = AffineOps.rotate(Point(x, y), 360, TransformOrigin.XY(0, 0)).asInstanceOf[Point]
      assert(math.abs(p.x - x) < 1e-9 && math.abs(p.y - y) < 1e-9)
    }
  }

  // -------------------------------------------------------------- geodesy

  test("geodesic lengths: haversine/vincenty sanity") {
    // 1 degree of longitude at the equator
    val hav = Geodesy.haversine(0, 0, 1, 0)
    assert(math.abs(hav - 111195.0) < 10, s"haversine=$hav")
    val vin = Geodesy.vincenty(0, 0, 1, 0)
    assert(math.abs(vin - 111319.49) < 1, s"vincenty=$vin") // WGS84 equatorial degree
    // symmetric
    assert(Geodesy.haversine(10, 20, 30, 40) == Geodesy.haversine(30, 40, 10, 20))
    assert(Geodesy.vincenty(0, 0, 0, 0) == 0.0)
    // known pair: Paris (2.3522, 48.8566) -> London (-0.1276, 51.5072) ≈ 343.5 km
    val pl = Geodesy.vincenty(2.3522, 48.8566, -0.1276, 51.5072)
    assert(math.abs(pl - 343500) < 1500, s"paris-london=$pl")
    val line = pg("LINESTRING (0 0, 1 0, 1 1)")
    val hl = Geodesy.geodesicLength(line, Geodesy.Method.Haversine)
    assert(hl > 200000 && hl < 230000)
  }

  test("CRS: WebMercator round-trip and known values") {
    val (x, y) = CRS.lonLatToWebMercator(0, 0)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6)
    val (x2, _) = CRS.lonLatToWebMercator(180, 0)
    assert(math.abs(x2 - 20037508.34) < 0.01)
    props(100) { rnd =>
      val (lon, lat) = (unif(rnd, -179, 179), unif(rnd, -84, 84))
      val (mx, my) = CRS.lonLatToWebMercator(lon, lat)
      val (lon2, lat2) = CRS.webMercatorToLonLat(mx, my)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    // UTM zone 31N at (3E, 0N): easting 500km at central meridian
    val (e, n) = CRS.lonLatToUtm(3, 0, 31, north = true)
    assert(math.abs(e - 500000) < 1e-6 && math.abs(n) < 1e-6)
    // UTM 31N Paris (independent Krüger order-6 check): (452482.53, 5411717.18)
    val (pe, pn) = CRS.lonLatToUtm(2.3522, 48.8566, 31, north = true)
    assert(math.abs(pe - 452482.53) < 0.5, s"easting=$pe")
    assert(math.abs(pn - 5411717.18) < 0.5, s"northing=$pn")
  }

  test("explode parts") {
    val parts = Geometry.parts(pg("MULTIPOINT ((0 0), (1 1), (2 2))"))
    assert(parts.length == 3 && parts(1) == Point(1, 1))
    assert(Geometry.parts(pg("POINT (5 5)")).length == 1)
  }
}
