package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class BoundingSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)

  test("min bounding circle: two points -> diameter circle") {
    val c = Algos.minBoundingCircle(g("MULTIPOINT ((0 0), (6 8))"))
    assert(math.abs(c(0) - 3) < 1e-12 && math.abs(c(1) - 4) < 1e-12 && math.abs(c(2) - 5) < 1e-12)
  }

  test("min bounding circle: equilateral-ish triangle uses circumcircle") {
    val c = Algos.minBoundingCircle(g("MULTIPOINT ((0 0), (10 0), (5 8)))"))
    // all three on the boundary
    for ((x, y) <- Seq((0.0, 0.0), (10.0, 0.0), (5.0, 8.0)))
      assert(math.abs(math.hypot(x - c(0), y - c(1)) - c(2)) < 1e-9)
  }

  test("min bounding circle: obtuse triangle -> longest-side diameter") {
    val c = Algos.minBoundingCircle(g("MULTIPOINT ((0 0), (10 0), (1 1))"))
    assert(math.abs(c(2) - 5) < 1e-9 && math.abs(c(0) - 5) < 1e-9)
  }

  test("min bounding circle of rectangle corners = half diagonal") {
    val c = Algos.minBoundingCircle(g("MULTIPOINT ((0 0), (6 0), (6 4), (0 4))"))
    assert(math.abs(c(2) - math.hypot(6, 4) / 2) < 1e-9)
  }

  test("interior points never grow the circle") {
    val c = Algos.minBoundingCircle(g("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5), (3 7))"))
    assert(math.abs(c(2) - math.hypot(10, 10) / 2) < 1e-9)
  }

  test("oriented envelope of an axis-aligned rectangle is itself") {
    val e = Algos.orientedEnvelope(g("MULTIPOINT ((0 0), (6 0), (6 4), (0 4))"))
    assert(math.abs(Algos.area(e) - 24.0) < 1e-9)
  }

  test("oriented envelope of a rotated rectangle recovers its area") {
    // rect 6x4 rotated 30 degrees
    val cos = math.cos(math.Pi / 6); val sin = math.sin(math.Pi / 6)
    val corners = Seq((0.0, 0.0), (6.0, 0.0), (6.0, 4.0), (0.0, 4.0)).map {
      case (x, y) => (x * cos - y * sin, x * sin + y * cos)
    }
    val wkt = "MULTIPOINT (" + corners.map { case (x, y) => s"($x $y)" }.mkString(", ") + ")"
    val e = Algos.orientedEnvelope(g(wkt))
    assert(math.abs(Algos.area(e) - 24.0) < 1e-9)
    // strictly smaller than the axis-aligned envelope
    val aabb = Algos.area(Algos.envelopeGeom(g(wkt)))
    assert(aabb > 24.0 + 1e-6)
  }

  test("oriented envelope covers the input points (within float tolerance)") {
    val pts = g("MULTIPOINT ((0 0), (7 2), (3 9), (5 5), (1 4))")
    val e = Algos.orientedEnvelope(pts)
    pts.asInstanceOf[MultiPoint].geoms.foreach { p =>
      assert(Algos.distance(e, p) < 1e-9, s"point $p outside oriented envelope")
    }
    assert(Algos.area(e) >= Algos.area(Algos.convexHull(pts)) - 1e-9)
  }

  test("degenerate inputs degrade like the hull") {
    assert(Algos.orientedEnvelope(g("POINT (3 4)")).isInstanceOf[Point])
    val line = Algos.orientedEnvelope(g("MULTIPOINT ((0 0), (5 5))"))
    assert(Algos.geomDim(line) == 1)
    val c = Algos.minBoundingCircle(g("POINT (3 4)"))
    assert(c(2) == 0.0)
  }
}
