package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class ConcaveHullSpec extends AnyFunSuite {

  /** unit-grid points over an L-shape: full w x h rect minus a notch of
    * nw x nh cells cut from the top-right corner */
  private def lShape(w: Int, h: Int, nw: Int, nh: Int): Geometry = {
    val pts = for {
      x <- 0 to w; y <- 0 to h
      if !(x > w - nw && y > h - nh)
    } yield Point(x.toDouble, y.toDouble)
    MultiPoint(pts.toArray)
  }

  test("threshold sqrt(2) keeps the unit cells plus the notch-corner half cell") {
    // at the notch's inner corner, three corners of the cut cell remain, so
    // the (1,1,sqrt2) half-cell triangle survives the edge filter: +0.5
    val g = lShape(6, 4, 3, 2)
    val hull = Delaunay.concaveHull(g, 1.5)
    val cells = 6 * 4 - 3 * 2
    assert(math.abs(Algos.area(hull) - (cells + 0.5)) < 1e-9)
  }

  test("large threshold reduces to the convex hull area") {
    val g = lShape(6, 4, 3, 2)
    val hull = Delaunay.concaveHull(g, 1e9)
    val convex = Algos.area(Algos.convexHull(g))
    assert(math.abs(Algos.area(hull) - convex) < 1e-9)
    // and the convex hull is strictly larger than the concave one here
    assert(convex > 6 * 4 - 3 * 2 + 1e-6)
  }

  test("tiny threshold kills every triangle") {
    assert(Delaunay.concaveHull(lShape(3, 3, 1, 1), 0.5) == null)
  }

  test("disconnected clusters come back as separate parts") {
    val pts = (for { x <- 0 to 2; y <- 0 to 2 } yield Point(x.toDouble, y.toDouble)) ++
              (for { x <- 10 to 12; y <- 0 to 2 } yield Point(x.toDouble, y.toDouble))
    val hull = Delaunay.concaveHull(MultiPoint(pts.toArray), 1.5)
    assert(math.abs(Algos.area(hull) - 8.0) < 1e-9) // two 2x2 blocks
  }
}
