package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Voronoi diagram of a point set, clipped to a rectangle — the dual of
 * [[Delaunay]] and the other half of the GEOS-backend surface the
 * reference stubs out (geopolars-geos/src/lib.rs:1; PostGIS
 * `ST_VoronoiPolygons`).
 *
 * Each site's cell is computed directly as the clip rectangle cut by the
 * perpendicular-bisector half-plane against every other site
 * (Sutherland-Hodgman convex clipping). O(k^2) per row over per-row site
 * counts; cells are emitted in lexicographic site order so output is
 * deterministic under any partitioning.
 */
object Voronoi {

  /** Clip convex ring (open coord list) by half-plane dot(z - m, nrm) <= 0. */
  private def clipHalfPlane(ring: Array[Double], mx: Double, my: Double,
                            nx: Double, ny: Double): Array[Double] = {
    val m = ring.length / 2
    if (m == 0) return ring
    val out = ArrayBuffer.empty[Double]
    var i = 0
    while (i < m) {
      val ax = ring(2 * i); val ay = ring(2 * i + 1)
      val j = (i + 1) % m
      val bx = ring(2 * j); val by = ring(2 * j + 1)
      val da = (ax - mx) * nx + (ay - my) * ny
      val db = (bx - mx) * nx + (by - my) * ny
      if (da <= 0) { out += ax; out += ay }
      if ((da < 0 && db > 0) || (da > 0 && db < 0)) {
        val t = da / (da - db)
        out += ax + t * (bx - ax); out += ay + t * (by - ay)
      }
      i += 1
    }
    // drop consecutive duplicates introduced by boundary-grazing cuts
    val ded = ArrayBuffer.empty[Double]
    var k = 0
    val om = out.length / 2
    while (k < om) {
      val x = out(2 * k); val y = out(2 * k + 1)
      val pn = ded.length
      if (pn < 2 || ded(pn - 2) != x || ded(pn - 1) != y) { ded += x; ded += y }
      k += 1
    }
    if (ded.length >= 4 && ded(0) == ded(ded.length - 2) && ded(1) == ded(ded.length - 1)) {
      ded.remove(ded.length - 2, 2)
    }
    ded.toArray
  }

  /** Voronoi cells of the distinct input sites clipped to the rectangle;
    * returns (siteX, siteY, openRing) in lexicographic site order. Cells
    * degenerate to empty when a site's region misses the rectangle. */
  def cells(xs: Array[Double], ys: Array[Double],
            minX: Double, minY: Double, maxX: Double, maxY: Double): Array[(Double, Double, Array[Double])] = {
    val sites = xs.indices.map(i => (xs(i), ys(i))).distinct.sorted.toArray
    sites.map { case (px, py) =>
      var ring = Array(minX, minY, maxX, minY, maxX, maxY, minX, maxY)
      var i = 0
      while (i < sites.length && ring.nonEmpty) {
        val (qx, qy) = sites(i)
        if (qx != px || qy != py) {
          // bisector half-plane containing p: dot(z - mid, q - p) <= 0
          ring = clipHalfPlane(ring, (px + qx) / 2, (py + qy) / 2, qx - px, qy - py)
        }
        i += 1
      }
      (px, py, ring)
    }
  }

  /** Geometry-level entry: GeometryCollection of cell Polygons for the
    * distinct vertices of g, clipped to the given rectangle. Sites whose
    * cell misses the rectangle contribute nothing; null for null input. */
  def polygons(g: Geometry, minX: Double, minY: Double,
               maxX: Double, maxY: Double): Geometry = {
    if (g == null) return null
    val xs = ArrayBuffer.empty[Double]; val ys = ArrayBuffer.empty[Double]
    g.foreachCoord { (x, y) => xs += x; ys += y }
    val cs = cells(xs.toArray, ys.toArray, minX, minY, maxX, maxY)
    GeometryCollection(cs.collect {
      case (_, _, ring) if ring.length >= 6 =>
        Polygon(Array(ring ++ Array(ring(0), ring(1)))): Geometry
    })
  }
}
