package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Delaunay triangulation (Bowyer-Watson incremental insertion with a
 * super-triangle), over the distinct vertices of any input geometry —
 * the PostGIS `ST_DelaunayTriangles` capability the reference's docs
 * leave to the GEOS backend stub (geopolars-geos/src/lib.rs:1).
 *
 * Deterministic: points are inserted in lexicographic (x, y) order and the
 * result triangles are emitted in a canonical order (each CCW, rotated to
 * start at its lexicographically smallest vertex; triangles sorted by their
 * vertex tuples), so the same point set always yields byte-identical WKB
 * under any partitioning or retry.
 *
 * Per-row inputs are small (a geometry's vertices); the O(n^2) worst case
 * of incremental insertion is irrelevant at that granularity — scale comes
 * from running the expression across billions of rows, which this supports
 * as a plain codegen-friendly unary kernel.
 */
object Delaunay {

  /** Triangulate distinct points; returns packed (x1,y1,x2,y2,x3,y3) per
    * triangle. Fewer than 3 distinct or all-collinear points => empty. */
  def triangulate(xs0: Array[Double], ys0: Array[Double]): Array[Array[Double]] = {
    // dedup + deterministic insertion order
    val pts = xs0.indices.map(i => (xs0(i), ys0(i))).distinct.sorted
    val n = pts.length
    if (n < 3) return Array.empty

    // super-triangle comfortably containing the bbox
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = Double.MinValue; var maxY = Double.MinValue
    pts.foreach { case (x, y) =>
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
    }
    val d = math.max(maxX - minX, maxY - minY) max 1.0
    val cx = (minX + maxX) / 2; val cy = (minY + maxY) / 2
    // The super-triangle must sit beyond every real circumcircle, or hull
    // triangles whose (possibly near-degenerate) circumcircle reaches a
    // super vertex are suppressed, leaving coverage holes. Any triangle of
    // any intermediate triangulation is some point triple, so the max
    // circumradius over all triples bounds the required distance. O(n^3)
    // is fine at per-row vertex counts; cap the blow-up of almost-exactly
    // collinear triples (beyond the cap they behave as collinear anyway).
    var reach = 20 * d
    if (n <= 300) {
      var rmax = 0.0
      var ti = 0
      while (ti < n) {
        var tj = ti + 1
        while (tj < n) {
          var tk = tj + 1
          while (tk < n) {
            val ax = pts(ti)._1; val ay = pts(ti)._2
            val bx = pts(tj)._1; val by = pts(tj)._2
            val ox = pts(tk)._1; val oy = pts(tk)._2
            val area2 = math.abs((bx - ax) * (oy - ay) - (by - ay) * (ox - ax))
            if (area2 > 0) {
              val la = math.hypot(bx - ax, by - ay)
              val lb = math.hypot(ox - bx, oy - by)
              val lc = math.hypot(ax - ox, ay - oy)
              val r = math.min(la * lb * lc / (2 * area2), 1e9 * d)
              if (r > rmax) rmax = r
            }
            tk += 1
          }
          tj += 1
        }
        ti += 1
      }
      reach = math.max(reach, 4 * rmax + 20 * d)
    }
    val s1 = (cx - 2 * reach, cy - reach)
    val s2 = (cx + 2 * reach, cy - reach)
    val s3 = (cx, cy + 2 * reach)

    // triangle = indices into vertex list; super vertices are n, n+1, n+2
    val vx = new Array[Double](n + 3); val vy = new Array[Double](n + 3)
    var i = 0
    while (i < n) { vx(i) = pts(i)._1; vy(i) = pts(i)._2; i += 1 }
    vx(n) = s1._1; vy(n) = s1._2
    vx(n + 1) = s2._1; vy(n + 1) = s2._2
    vx(n + 2) = s3._1; vy(n + 2) = s3._2

    final case class Tri(a: Int, b: Int, c: Int)
    var tris = ArrayBuffer(Tri(n, n + 1, n + 2))

    // Exact predicate signs via BigDecimal: double inputs are exact
    // rationals, so these determinant signs are computed without rounding —
    // the cavity stays consistent even on near-degenerate inputs (the
    // failure mode of float Bowyer-Watson is an incircle misclassification
    // producing a non-star cavity and silent coverage holes).
    import java.math.BigDecimal
    @inline def bd(d: Double) = new BigDecimal(d)

    def orientSign(ax: Double, ay: Double, bx: Double, by: Double,
                   px: Double, py: Double): Int = {
      // fast float filter with a conservative error bound, exact fallback
      val detl = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
      val detsum = math.abs((bx - ax) * (py - ay)) + math.abs((by - ay) * (px - ax))
      if (math.abs(detl) > detsum * 1e-12) math.signum(detl).toInt
      else bd(bx).subtract(bd(ax)).multiply(bd(py).subtract(bd(ay)))
             .subtract(bd(by).subtract(bd(ay)).multiply(bd(px).subtract(bd(ax)))).signum()
    }

    /** strict in-circumcircle test for triangle t (any orientation):
      * float evaluation with a conservative relative-error filter, exact
      * BigDecimal fallback only inside the uncertainty band */
    def inCircle(t: Tri, px: Double, py: Double): Boolean = {
      var (a, b, c) = (t.a, t.b, t.c)
      if (orientSign(vx(a), vy(a), vx(b), vy(b), vx(c), vy(c)) < 0) { val tmp = b; b = c; c = tmp }
      val axd = vx(a) - px; val ayd = vy(a) - py
      val bxd = vx(b) - px; val byd = vy(b) - py
      val cxd = vx(c) - px; val cyd = vy(c) - py
      val a2d = axd * axd + ayd * ayd
      val b2d = bxd * bxd + byd * byd
      val c2d = cxd * cxd + cyd * cyd
      val t1 = a2d * (bxd * cyd - cxd * byd)
      val t2 = b2d * (axd * cyd - cxd * ayd)
      val t3 = c2d * (axd * byd - bxd * ayd)
      val detd = t1 - t2 + t3
      val mag = math.abs(t1) + math.abs(t2) + math.abs(t3)
      if (math.abs(detd) > mag * 1e-11) return detd > 0
      // uncertain: exact arithmetic (double inputs are exact rationals)
      val ax = bd(vx(a)).subtract(bd(px)); val ay = bd(vy(a)).subtract(bd(py))
      val bx = bd(vx(b)).subtract(bd(px)); val by = bd(vy(b)).subtract(bd(py))
      val cx = bd(vx(c)).subtract(bd(px)); val cy = bd(vy(c)).subtract(bd(py))
      val a2 = ax.multiply(ax).add(ay.multiply(ay))
      val b2 = bx.multiply(bx).add(by.multiply(by))
      val c2 = cx.multiply(cx).add(cy.multiply(cy))
      val det = a2.multiply(bx.multiply(cy).subtract(cx.multiply(by)))
        .subtract(b2.multiply(ax.multiply(cy).subtract(cx.multiply(ay))))
        .add(c2.multiply(ax.multiply(by).subtract(bx.multiply(ay))))
      det.signum() > 0
    }

    def orient(ax: Double, ay: Double, bx: Double, by: Double,
               px: Double, py: Double): Double =
      orientSign(ax, ay, bx, by, px, py).toDouble

    i = 0
    while (i < n) {
      val px = vx(i); val py = vy(i)
      val bad = tris.filter(inCircle(_, px, py))
      if (bad.nonEmpty) {
        // cavity boundary = edges appearing in exactly one bad triangle
        val edgeCount = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), Int]
        def addEdge(u: Int, v: Int): Unit = {
          val k = if (u < v) (u, v) else (v, u)
          edgeCount(k) = edgeCount.getOrElse(k, 0) + 1
        }
        bad.foreach { t => addEdge(t.a, t.b); addEdge(t.b, t.c); addEdge(t.c, t.a) }
        tris = tris.filterNot(bad.contains)
        edgeCount.foreach { case ((u, v), cnt) =>
          if (cnt == 1) tris += Tri(u, v, i)
        }
      } else {
        // point outside every circumcircle cannot happen inside the super
        // triangle for a valid insertion; skip defensively
      }
      i += 1
    }

    // drop triangles using super vertices; canonicalize
    val out = ArrayBuffer.empty[Array[Double]]
    tris.foreach { t =>
      if (t.a < n && t.b < n && t.c < n) {
        var (a, b, c) = (t.a, t.b, t.c)
        // CCW
        val o = orient(vx(a), vy(a), vx(b), vy(b), vx(c), vy(c))
        if (o == 0) () // degenerate sliver (collinear) — skip
        else {
          if (o < 0) { val tmp = b; b = c; c = tmp }
          // rotate to smallest vertex first (by (x, y))
          def key(v: Int) = (vx(v), vy(v))
          val rot =
            if (Ordering[(Double, Double)].lteq(key(a), key(b)) &&
                Ordering[(Double, Double)].lteq(key(a), key(c))) (a, b, c)
            else if (Ordering[(Double, Double)].lteq(key(b), key(a)) &&
                     Ordering[(Double, Double)].lteq(key(b), key(c))) (b, c, a)
            else (c, a, b)
          out += Array(vx(rot._1), vy(rot._1), vx(rot._2), vy(rot._2), vx(rot._3), vy(rot._3))
        }
      }
    }
    out.sortBy(t => (t(0), t(1), t(2), t(3), t(4), t(5))).toArray
  }

  /** Geometry-level entry: triangulates the distinct vertices of g into a
    * GeometryCollection of triangle Polygons (empty collection when the
    * input has <3 distinct or collinear vertices); null for null input. */
  def triangles(g: Geometry): Geometry = {
    if (g == null) return null
    val xs = ArrayBuffer.empty[Double]; val ys = ArrayBuffer.empty[Double]
    g.foreachCoord { (x, y) => xs += x; ys += y }
    val tris = triangulate(xs.toArray, ys.toArray)
    GeometryCollection(tris.map { t =>
      // close the ring
      Polygon(Array(Array(t(0), t(1), t(2), t(3), t(4), t(5), t(0), t(1)))): Geometry
    })
  }

  /**
   * Concave hull as an edge-length-filtered Delaunay union (alpha-shape
   * variant): triangles whose longest edge exceeds `maxEdge` are dropped,
   * the rest dissolve into the hull. maxEdge = +inf reduces to the convex
   * hull region; small maxEdge carves concavities (and may disconnect —
   * parts come back as a MultiPolygon). Null when no triangle survives.
   */
  def concaveHull(g: Geometry, maxEdge: Double): Geometry = {
    if (g == null) return null
    val xs = ArrayBuffer.empty[Double]; val ys = ArrayBuffer.empty[Double]
    g.foreachCoord { (x, y) => xs += x; ys += y }
    val kept = triangulate(xs.toArray, ys.toArray).filter { t =>
      val e1 = math.hypot(t(2) - t(0), t(3) - t(1))
      val e2 = math.hypot(t(4) - t(2), t(5) - t(3))
      val e3 = math.hypot(t(0) - t(4), t(1) - t(5))
      math.max(e1, math.max(e2, e3)) <= maxEdge
    }
    if (kept.isEmpty) return null
    Union.union(kept.map(t =>
      Polygon(Array(Array(t(0), t(1), t(2), t(3), t(4), t(5), t(0), t(1)))): Geometry).toSeq)
  }
}
