package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class DelaunaySpec extends AnyFunSuite {

  private def tri(xs: Array[Double], ys: Array[Double]) = Delaunay.triangulate(xs, ys)

  test("unit square with center point: 4 triangles fanning the center") {
    val xs = Array(0.0, 1.0, 1.0, 0.0, 0.5)
    val ys = Array(0.0, 0.0, 1.0, 1.0, 0.5)
    val t = tri(xs, ys)
    assert(t.length == 4)
    val area = t.map(a => math.abs(
      (a(2) - a(0)) * (a(5) - a(1)) - (a(4) - a(0)) * (a(3) - a(1))) / 2).sum
    assert(math.abs(area - 1.0) < 1e-12)
  }

  test("triangle count = 2n - 2 - h and area covers the hull") {
    // parabola points (all on hull, h = n) plus one interior point
    for (n <- 4 to 9) {
      val xs = (0 until n).map(_.toDouble).toArray
      val ys = xs.map(x => x * x)
      val t0 = tri(xs, ys)
      assert(t0.length == n - 2, s"parabola n=$n")
      val withInner = tri(xs :+ 1.25, ys :+ (n - 2).toDouble)
      assert(withInner.length == n, s"parabola+interior n=$n")
      val hullArea = n.toDouble * (n - 1) * (n - 2) / 6.0
      def sumArea(t: Array[Array[Double]]) = t.map(a => math.abs(
        (a(2) - a(0)) * (a(5) - a(1)) - (a(4) - a(0)) * (a(3) - a(1))) / 2).sum
      assert(math.abs(sumArea(t0) - hullArea) < 1e-9)
      assert(math.abs(sumArea(withInner) - hullArea) < 1e-9)
    }
  }

  test("Delaunay empty-circumcircle property holds on a scattered set") {
    // deterministic pseudo-random points; quadratic jitter breaks the
    // exactly-affine runs the linear-congruential pattern would create
    val n = 40
    val xs = (0 until n).map(i => ((i * 73) % 97).toDouble + 0.0001 * i * i).toArray
    val ys = (0 until n).map(i => ((i * 151) % 89).toDouble + 0.00013 * i * i).toArray
    val t = tri(xs, ys)
    // every triangle's circumcircle must be strictly empty of other points
    for (a <- t) {
      val (ax, ay, bx, by, cx, cy) = (a(0), a(1), a(2), a(3), a(4), a(5))
      val d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) +
                (cx * cx + cy * cy) * (ay - by)) / d
      val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) +
                (cx * cx + cy * cy) * (bx - ax)) / d
      val r2 = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
      for (i <- 0 until n) {
        val d2 = (xs(i) - ux) * (xs(i) - ux) + (ys(i) - uy) * (ys(i) - uy)
        assert(d2 >= r2 * (1 - 1e-9), s"point $i inside circumcircle")
      }
    }
    // Euler check: T = 2n - 2 - b where b counts every point ON the hull
    // boundary (collinear boundary points included, which the hull ring drops)
    val hull = Algos.convexHull(MultiPoint(xs.indices.map(i => Point(xs(i), ys(i))).toArray))
    val b = hull match {
      case p: Polygon => xs.indices.count(i => Algos.pointInPolygon(xs(i), ys(i), p) == 1)
      case _          => fail("hull not a polygon")
    }
    assert(t.length == 2 * n - 2 - b)
    // triangulation tiles the hull exactly
    val sumArea = t.map(a => math.abs(
      (a(2) - a(0)) * (a(5) - a(1)) - (a(4) - a(0)) * (a(3) - a(1))) / 2).sum
    assert(math.abs(sumArea - Algos.area(hull)) < 1e-6 * Algos.area(hull))
  }

  test("degenerate inputs: collinear or tiny sets give an empty collection") {
    assert(tri(Array(0.0, 1.0, 2.0, 3.0), Array(0.0, 1.0, 2.0, 3.0)).isEmpty)
    assert(tri(Array(0.0, 1.0), Array(0.0, 0.0)).isEmpty)
    val g = Delaunay.triangles(WKT.read("MULTIPOINT ((0 0), (1 1))"))
    assert(g.isInstanceOf[GeometryCollection] && g.asInstanceOf[GeometryCollection].geoms.isEmpty)
  }

  test("duplicate points are deduplicated before triangulation") {
    val t = tri(Array(0.0, 1.0, 1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 1.0, 0.0))
    assert(t.length == 2)
  }

  test("deterministic output independent of input point order") {
    val xs = Array(3.0, 0.0, 5.0, 2.0, 4.0, 1.0)
    val ys = Array(1.0, 0.0, 2.0, 4.0, 0.5, 3.0)
    val t1 = tri(xs, ys)
    val t2 = tri(xs.reverse, ys.reverse)
    assert(t1.length == t2.length)
    assert(t1.zip(t2).forall { case (a, b) => a.sameElements(b) })
  }
}
