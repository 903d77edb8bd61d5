package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class VoronoiSpec extends AnyFunSuite {

  test("two sites: bisector splits the rectangle into the expected areas") {
    val cs = Voronoi.cells(Array(2.0, 8.0), Array(5.0, 5.0), 0, 0, 10, 10)
    assert(cs.length == 2)
    val areas = cs.map { case (_, _, r) => ringArea(r) }
    assert(areas.forall(a => math.abs(a - 50.0) < 1e-12)) // vertical bisector x=5
  }

  test("2x2 grid of sites: four equal quadrant cells") {
    val cs = Voronoi.cells(Array(2.5, 7.5, 2.5, 7.5), Array(2.5, 2.5, 7.5, 7.5), 0, 0, 10, 10)
    assert(cs.length == 4)
    cs.foreach { case (_, _, r) => assert(math.abs(ringArea(r) - 25.0) < 1e-12) }
  }

  test("cells tile the clip rectangle and each contains its site") {
    val xs = Array(1.0, 8.0, 6.0, 4.0, 2.0, 9.0, 7.0)
    val ys = Array(1.0, 6.0, 2.0, 7.0, 3.0, 8.0, 4.0)
    val cs = Voronoi.cells(xs, ys, 0, 0, 10, 10)
    assert(cs.length == 7)
    val total = cs.map { case (_, _, r) => ringArea(r) }.sum
    assert(math.abs(total - 100.0) < 1e-9)
    cs.foreach { case (px, py, r) =>
      val poly = Polygon(Array(r ++ Array(r(0), r(1))))
      assert(Algos.pointInPolygon(px, py, poly) > 0, s"site ($px,$py) outside its cell")
    }
  }

  test("nearest-site property holds at cell ring vertices (within tolerance)") {
    val xs = Array(1.0, 8.0, 6.0, 4.0)
    val ys = Array(1.0, 6.0, 2.0, 7.0)
    val cs = Voronoi.cells(xs, ys, 0, 0, 10, 10)
    cs.foreach { case (px, py, r) =>
      var i = 0
      while (i + 1 < r.length) {
        val dSelf = math.hypot(r(i) - px, r(i + 1) - py)
        xs.indices.foreach { j =>
          val dOther = math.hypot(r(i) - xs(j), r(i + 1) - ys(j))
          assert(dOther >= dSelf - 1e-9)
        }
        i += 2
      }
    }
  }

  test("single site owns the whole rectangle; site outside still tiles it") {
    val one = Voronoi.cells(Array(5.0), Array(5.0), 0, 0, 10, 10)
    assert(one.length == 1 && math.abs(ringArea(one(0)._3) - 100.0) < 1e-12)
    // two sites, one outside the rect: areas still sum to the rect
    val cs = Voronoi.cells(Array(5.0, 20.0), Array(5.0, 5.0), 0, 0, 10, 10)
    assert(math.abs(cs.map(c => ringArea(c._3)).sum - 100.0) < 1e-12)
  }

  test("geometry entry emits a collection of valid polygons") {
    val g = Voronoi.polygons(WKT.read("MULTIPOINT ((2 2), (8 8), (2 8))"), 0, 0, 10, 10)
    val gc = g.asInstanceOf[GeometryCollection]
    assert(gc.geoms.length == 3)
    assert(math.abs(Algos.area(gc) - 100.0) < 1e-9)
  }

  private def ringArea(r: Array[Double]): Double = {
    if (r.length < 6) return 0.0
    var s = 0.0
    val m = r.length / 2
    var i = 0
    while (i < m) {
      val j = (i + 1) % m
      s += r(2 * i) * r(2 * j + 1) - r(2 * j) * r(2 * i + 1)
      i += 1
    }
    math.abs(s) / 2
  }
}
