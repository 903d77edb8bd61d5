package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Shape-analysis and shape-editing kernels added in round 2 — the remaining
 * GEOS-surface ops the reference declares through its stub backend
 * (reference: geopolars/geopolars-geos/src/lib.rs:1 reserves the GEOS op
 * surface; docs/source/reference/geoseries.rst lists the commented-out
 * constructive/measurement sections).
 *
 * Pure functions over the packed-coordinate Geometry ADT; no Spark imports.
 */
object Shape {

  // ------------------------------------------------------------- Fréchet

  /**
   * Discrete Fréchet distance between the vertex sequences of two
   * geometries (the standard coupling-DP of Eiter & Mannila 1994).
   * NaN when either side has no vertices.
   */
  def frechet(a: Geometry, b: Geometry): Double = {
    val pa = coordsOf(a); val pb = coordsOf(b)
    val n = pa.length / 2; val m = pb.length / 2
    if (n == 0 || m == 0) return Double.NaN
    @inline def dist(i: Int, j: Int): Double =
      math.hypot(pa(2 * i) - pb(2 * j), pa(2 * i + 1) - pb(2 * j + 1))
    // rolling one-row DP: ca(j) = coupling distance for (i, j)
    val row = new Array[Double](m)
    row(0) = dist(0, 0)
    var j = 1
    while (j < m) { row(j) = math.max(row(j - 1), dist(0, j)); j += 1 }
    var i = 1
    while (i < n) {
      var diag = row(0) // d(i-1, j-1)
      row(0) = math.max(row(0), dist(i, 0))
      j = 1
      while (j < m) {
        val up = row(j) // d(i-1, j)
        row(j) = math.max(math.min(math.min(up, diag), row(j - 1)), dist(i, j))
        diag = up
        j += 1
      }
      i += 1
    }
    row(m - 1)
  }

  private def coordsOf(g: Geometry): Array[Double] = {
    val buf = ArrayBuffer.empty[Double]
    g.foreachCoord((x, y) => { buf += x; buf += y })
    buf.toArray
  }

  // ------------------------------------------- Visvalingam-Whyatt simplify

  /**
   * Visvalingam-Whyatt simplification: iteratively drop the vertex whose
   * triangle with its neighbors has the smallest effective area, while that
   * area is below `threshold`. Endpoints of open lines are preserved; rings
   * keep at least 3 distinct vertices. The area-threshold companion of the
   * distance-threshold st_simplify (Douglas-Peucker).
   */
  def simplifyVW(g: Geometry, threshold: Double): Geometry = g match {
    case l: LineString if !l.isEmpty => LineString(vwOpen(l.coords, threshold))
    case p: Polygon if !p.isEmpty =>
      val rings = p.rings.map(r => vwRing(r, threshold)).filter(_.length >= 8)
      if (rings.isEmpty || rings(0).length < 8) Polygon(Array.empty)
      else Polygon(rings)
    case m: MultiLineString =>
      MultiLineString(m.geoms.map(l => simplifyVW(l, threshold).asInstanceOf[LineString]))
    case m: MultiPolygon =>
      val ps = m.geoms.map(pp => simplifyVW(pp, threshold).asInstanceOf[Polygon]).filter(!_.isEmpty)
      MultiPolygon(ps)
    case gc: GeometryCollection =>
      GeometryCollection(gc.geoms.map(simplifyVW(_, threshold)))
    case other => other
  }

  @inline private def triArea(cs: Array[Double], i: Int, j: Int, k: Int): Double =
    math.abs((cs(2 * j) - cs(2 * i)) * (cs(2 * k + 1) - cs(2 * i + 1)) -
             (cs(2 * k) - cs(2 * i)) * (cs(2 * j + 1) - cs(2 * i + 1))) / 2.0

  /** Open polyline VW: first/last pinned. O(n^2) scan — rows hold few vertices. */
  private def vwOpen(cs: Array[Double], threshold: Double): Array[Double] = {
    val n = cs.length / 2
    if (n <= 2) return cs
    val alive = Array.fill(n)(true)
    var count = n
    var continue = true
    while (continue && count > 2) {
      // find min effective area among interior alive vertices
      var minA = Double.PositiveInfinity; var minI = -1
      var i = 0
      val idx = new Array[Int](count)
      var k = 0
      while (i < n) { if (alive(i)) { idx(k) = i; k += 1 }; i += 1 }
      var t = 1
      while (t < count - 1) {
        val a = triArea(cs, idx(t - 1), idx(t), idx(t + 1))
        if (a < minA) { minA = a; minI = idx(t) }
        t += 1
      }
      if (minI >= 0 && minA < threshold) { alive(minI) = false; count -= 1 }
      else continue = false
    }
    packAlive(cs, alive, count)
  }

  /** Closed-ring VW: operates on distinct vertices, re-closes; keeps >= 3. */
  private def vwRing(ring: Array[Double], threshold: Double): Array[Double] = {
    val n = ring.length / 2 - 1 // distinct vertices (last == first)
    if (n <= 3) return ring
    val alive = Array.fill(n)(true)
    var count = n
    var continue = true
    while (continue && count > 3) {
      val idx = new Array[Int](count)
      var i = 0; var k = 0
      while (i < n) { if (alive(i)) { idx(k) = i; k += 1 }; i += 1 }
      var minA = Double.PositiveInfinity; var minI = -1
      var t = 0
      while (t < count) {
        val a = triArea(ring, idx((t + count - 1) % count), idx(t), idx((t + 1) % count))
        if (a < minA) { minA = a; minI = idx(t) }
        t += 1
      }
      if (minI >= 0 && minA < threshold) { alive(minI) = false; count -= 1 }
      else continue = false
    }
    val out = new Array[Double](2 * count + 2)
    var i = 0; var k = 0
    while (i < n) {
      if (alive(i)) { out(2 * k) = ring(2 * i); out(2 * k + 1) = ring(2 * i + 1); k += 1 }
      i += 1
    }
    out(2 * count) = out(0); out(2 * count + 1) = out(1)
    out
  }

  private def packAlive(cs: Array[Double], alive: Array[Boolean], count: Int): Array[Double] = {
    val out = new Array[Double](2 * count)
    var i = 0; var k = 0
    while (i < alive.length) {
      if (alive(i)) { out(2 * k) = cs(2 * i); out(2 * k + 1) = cs(2 * i + 1); k += 1 }
      i += 1
    }
    out
  }

  // --------------------------------------------------------- ear clipping

  /**
   * Triangulate a simple polygon (no holes) by ear clipping; MultiPolygon
   * input triangulates each part. Polygons with interior rings, or
   * non-areal input, return null (SQL NULL). Result: MultiPolygon of
   * n-2 triangles per part.
   */
  def triangulate(g: Geometry): Geometry = g match {
    case p: Polygon if !p.isEmpty =>
      if (p.rings.length > 1) null
      else earClip(p.exterior) match {
        case null => null
        case ts   => MultiPolygon(ts)
      }
    case m: MultiPolygon if !m.isEmpty =>
      val all = ArrayBuffer.empty[Polygon]
      var i = 0
      while (i < m.geoms.length) {
        val p = m.geoms(i)
        if (!p.isEmpty) {
          if (p.rings.length > 1) return null
          val ts = earClip(p.exterior)
          if (ts == null) return null
          all ++= ts
        }
        i += 1
      }
      MultiPolygon(all.toArray)
    case _ => null
  }

  private def earClip(ringIn: Array[Double]): Array[Polygon] = {
    // distinct vertices, CCW-normalized
    var n = ringIn.length / 2 - 1
    if (n < 3) return null
    var vs = new Array[Double](2 * n)
    System.arraycopy(ringIn, 0, vs, 0, 2 * n)
    if (Algos.signedRingArea(ringIn) < 0) {
      val rev = new Array[Double](2 * n)
      var i = 0
      while (i < n) { rev(2 * i) = vs(2 * (n - 1 - i)); rev(2 * i + 1) = vs(2 * (n - 1 - i) + 1); i += 1 }
      vs = rev
    }
    @inline def cross(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    val next = Array.tabulate(n)(i => (i + 1) % n)
    val prev = Array.tabulate(n)(i => (i + n - 1) % n)
    val tris = ArrayBuffer.empty[Polygon]
    var remaining = n
    var cur = 0
    var guard = 0
    // strict mode: a vertex ON the candidate ear's boundary blocks it (a
    // diagonal through a reflex vertex would let a later ear leak outside
    // the polygon). If a full cycle finds no strict ear, relax for one clip
    // (two-ears theorem guarantees progress on simple input otherwise).
    var relaxed = false
    while (remaining > 3 && guard <= 2 * remaining) {
      guard += 1
      val p = prev(cur); val nx = next(cur)
      val ax = vs(2 * p); val ay = vs(2 * p + 1)
      val bx = vs(2 * cur); val by = vs(2 * cur + 1)
      val cx = vs(2 * nx); val cy = vs(2 * nx + 1)
      val convex = cross(ax, ay, bx, by, cx, cy) > 0
      var isEar = convex
      if (convex) {
        // no other remaining vertex inside (strict: or on the boundary of)
        // the candidate ear
        var w = next(nx)
        while (isEar && w != p) {
          val px = vs(2 * w); val py = vs(2 * w + 1)
          val isCorner = (px == ax && py == ay) || (px == bx && py == by) || (px == cx && py == cy)
          if (!isCorner) {
            val d1 = cross(ax, ay, bx, by, px, py)
            val d2 = cross(bx, by, cx, cy, px, py)
            val d3 = cross(cx, cy, ax, ay, px, py)
            val blocks = if (relaxed) d1 > 0 && d2 > 0 && d3 > 0
                         else d1 >= 0 && d2 >= 0 && d3 >= 0
            if (blocks) isEar = false
          }
          w = next(w)
        }
      }
      if (isEar) {
        tris += Polygon(Array(Array(ax, ay, bx, by, cx, cy, ax, ay)))
        next(p) = nx; prev(nx) = p
        remaining -= 1
        cur = nx
        guard = 0
        relaxed = false
      } else {
        cur = next(cur)
        if (guard == remaining && !relaxed) relaxed = true // one full cycle: relax
        else if (guard >= 2 * remaining && relaxed) return null // stuck even relaxed
      }
    }
    if (remaining > 3) return null // degenerate / self-intersecting input
    val p = prev(cur); val nx = next(cur)
    tris += Polygon(Array(Array(
      vs(2 * p), vs(2 * p + 1), vs(2 * cur), vs(2 * cur + 1),
      vs(2 * nx), vs(2 * nx + 1), vs(2 * p), vs(2 * p + 1))))
    tris.toArray
  }

  // ------------------------------------------- minimum bounding circle geom

  /**
   * Minimum enclosing circle as geometry: a `segs`-gon approximation of the
   * Welzl circle (first vertex due east, counter-clockwise). Degenerate
   * radius-0 inputs return the center Point.
   */
  def minBoundingCircleGeom(g: Geometry, segs: Int): Geometry = {
    val c = Algos.minBoundingCircle(g)
    if (c == null) return null
    val (cx, cy, r) = (c(0), c(1), c(2))
    if (r == 0.0) return Point(cx, cy)
    val k = math.max(4, segs)
    val ring = new Array[Double](2 * k + 2)
    var i = 0
    while (i < k) {
      val t = 2.0 * math.Pi * i / k
      ring(2 * i) = cx + r * math.cos(t)
      ring(2 * i + 1) = cy + r * math.sin(t)
      i += 1
    }
    ring(2 * k) = ring(0); ring(2 * k + 1) = ring(1)
    Polygon(Array(ring))
  }

  // ----------------------------------------------------- Chaikin smoothing

  /**
   * Chaikin corner cutting (PostGIS ST_ChaikinSmoothing): each edge
   * contributes the 1/4 and 3/4 points; open lines keep their endpoints,
   * rings cut every corner. `iters` capped at 5 (vertex count grows 2^k).
   */
  def chaikin(g: Geometry, iters: Int): Geometry = {
    val it = math.min(math.max(iters, 0), 5)
    def open(cs: Array[Double], rounds: Int): Array[Double] = {
      var v = cs
      var r = 0
      while (r < rounds && v.length >= 6) { v = chaikinOpenOnce(v); r += 1 }
      v
    }
    def ring(cs: Array[Double], rounds: Int): Array[Double] = {
      var v = cs
      var r = 0
      while (r < rounds && v.length >= 8) { v = chaikinRingOnce(v); r += 1 }
      v
    }
    g match {
      case l: LineString if !l.isEmpty => LineString(open(l.coords, it))
      case p: Polygon if !p.isEmpty    => Polygon(p.rings.map(ring(_, it)))
      case m: MultiLineString => MultiLineString(m.geoms.map(l => LineString(open(l.coords, it))))
      case m: MultiPolygon    => MultiPolygon(m.geoms.map(p => Polygon(p.rings.map(ring(_, it)))))
      case other => other
    }
  }

  // layout: p0, (Q,R per edge), p_{n-1}
  private def chaikinOpenOnce(cs: Array[Double]): Array[Double] = {
    val n = cs.length / 2
    val res = new Array[Double](4 * (n - 1) + 4)
    res(0) = cs(0); res(1) = cs(1)
    var i = 0
    while (i < n - 1) {
      val x0 = cs(2 * i); val y0 = cs(2 * i + 1)
      val x1 = cs(2 * i + 2); val y1 = cs(2 * i + 3)
      res(4 * i + 2) = 0.75 * x0 + 0.25 * x1; res(4 * i + 3) = 0.75 * y0 + 0.25 * y1
      res(4 * i + 4) = 0.25 * x0 + 0.75 * x1; res(4 * i + 5) = 0.25 * y0 + 0.75 * y1
      i += 1
    }
    res(4 * n - 2) = cs(2 * n - 2); res(4 * n - 1) = cs(2 * n - 1)
    res
  }

  private def chaikinRingOnce(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2 - 1 // distinct vertices
    val res = new Array[Double](4 * n + 2)
    var i = 0
    while (i < n) {
      val x0 = ring(2 * i); val y0 = ring(2 * i + 1)
      val x1 = ring(2 * i + 2); val y1 = ring(2 * i + 3)
      res(4 * i) = 0.75 * x0 + 0.25 * x1; res(4 * i + 1) = 0.75 * y0 + 0.25 * y1
      res(4 * i + 2) = 0.25 * x0 + 0.75 * x1; res(4 * i + 3) = 0.25 * y0 + 0.75 * y1
      i += 1
    }
    res(4 * n) = res(0); res(4 * n + 1) = res(1)
    res
  }

  // ---------------------------------------------------------- shared paths

  /**
   * Collinear overlap between two lineal geometries: for every segment of
   * `a`, the union of parameter intervals where `b` runs along it, emitted
   * as a MultiLineString (direction of `a`; overlap pieces within one
   * segment are interval-merged, so coincident `b` segments never
   * double-report). Non-lineal input => null; no overlap => empty.
   */
  def sharedPaths(a: Geometry, b: Geometry): Geometry = {
    if (!isLineal(a) || !isLineal(b)) return null
    val segsA = segmentsOf(a); val segsB = segmentsOf(b)
    val pieces = ArrayBuffer.empty[LineString]
    var i = 0
    while (i < segsA.length) {
      val (ax0, ay0, ax1, ay1) = segsA(i)
      val dx = ax1 - ax0; val dy = ay1 - ay0
      val len2 = dx * dx + dy * dy
      if (len2 > 0) {
        val ivs = ArrayBuffer.empty[(Double, Double)]
        var j = 0
        while (j < segsB.length) {
          val (bx0, by0, bx1, by1) = segsB(j)
          val c1 = dx * (by0 - ay0) - dy * (bx0 - ax0)
          val c2 = dx * (by1 - ay0) - dy * (bx1 - ax0)
          if (c1 == 0.0 && c2 == 0.0) { // collinear
            val t0 = ((bx0 - ax0) * dx + (by0 - ay0) * dy) / len2
            val t1 = ((bx1 - ax0) * dx + (by1 - ay0) * dy) / len2
            val lo = math.max(0.0, math.min(t0, t1))
            val hi = math.min(1.0, math.max(t0, t1))
            if (hi > lo) ivs += ((lo, hi))
          }
          j += 1
        }
        if (ivs.nonEmpty) {
          val sorted = ivs.sortBy(_._1)
          var (lo, hi) = sorted(0)
          var k = 1
          while (k <= sorted.length) {
            if (k < sorted.length && sorted(k)._1 <= hi) hi = math.max(hi, sorted(k)._2)
            else {
              pieces += LineString(Array(ax0 + lo * dx, ay0 + lo * dy, ax0 + hi * dx, ay0 + hi * dy))
              if (k < sorted.length) { lo = sorted(k)._1; hi = sorted(k)._2 }
            }
            k += 1
          }
        }
      }
      i += 1
    }
    MultiLineString(pieces.toArray)
  }

  private def isLineal(g: Geometry): Boolean = g match {
    case _: LineString | _: MultiLineString => true
    case _ => false
  }

  private def segmentsOf(g: Geometry): Array[(Double, Double, Double, Double)] = {
    val out = ArrayBuffer.empty[(Double, Double, Double, Double)]
    def add(cs: Array[Double]): Unit = {
      var i = 0
      while (i + 3 < cs.length) { out += ((cs(i), cs(i + 1), cs(i + 2), cs(i + 3))); i += 2 }
    }
    g match {
      case l: LineString => add(l.coords)
      case m: MultiLineString => m.geoms.foreach(l => add(l.coords))
      case _ =>
    }
    out.toArray
  }

  // -------------------------------------------------------------- subdivide

  /**
   * Recursively split areal geometry until every part has at most
   * `maxVertices` vertices (PostGIS ST_Subdivide): halve the envelope on
   * its longer axis, clip through the planar-overlay kernel, recurse.
   * Points/lines pass through unchanged; maxVertices floors at 8.
   */
  def subdivide(g: Geometry, maxVertices: Int): Array[Geometry] = {
    val maxV = math.max(8, maxVertices)
    val out = ArrayBuffer.empty[Geometry]
    def clipRect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
      Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))
    def polys(x: Geometry): Seq[Polygon] = x match {
      case p: Polygon if !p.isEmpty => Seq(p)
      case m: MultiPolygon => m.geoms.toSeq.filter(!_.isEmpty)
      case gc: GeometryCollection => gc.geoms.toSeq.flatMap(polys)
      case _ => Seq.empty
    }
    def go(x: Geometry, depth: Int): Unit = {
      if (x == null || x.isEmpty) return
      if (x.numPoints <= maxV || depth >= 24) { polys(x).foreach(out += _); return }
      val e = x.envelope
      if (e.isEmpty) return
      val (r1, r2) =
        if (e.width >= e.height) {
          val mx = (e.minX + e.maxX) / 2
          (clipRect(e.minX, e.minY, mx, e.maxY), clipRect(mx, e.minY, e.maxX, e.maxY))
        } else {
          val my = (e.minY + e.maxY) / 2
          (clipRect(e.minX, e.minY, e.maxX, my), clipRect(e.minX, my, e.maxX, e.maxY))
        }
      go(Union.intersection(x, r1), depth + 1)
      go(Union.intersection(x, r2), depth + 1)
    }
    g match {
      case null => Array.empty
      case _: Polygon | _: MultiPolygon | _: GeometryCollection =>
        go(g, 0); out.toArray
      case other => Array(other)
    }
  }

  // ----------------------------------------------------------- normalize

  private def cmpCoord(ax: Double, ay: Double, bx: Double, by: Double): Int =
    if (ax < bx) -1 else if (ax > bx) 1
    else if (ay < by) -1 else if (ay > by) 1 else 0

  private def lexLess(a: Array[Double], b: Array[Double]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a(i) < b(i)) return true
      if (a(i) > b(i)) return false
      i += 1
    }
    a.length < b.length
  }

  private def reversedCoords(cs: Array[Double]): Array[Double] = {
    val n = cs.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = cs(n - i - 2); out(i + 1) = cs(n - i - 1); i += 2 }
    out
  }

  /** Canonical closed ring: requested orientation (ccw=true for exteriors),
    * start rotated to the lexicographically smallest vertex. */
  private def canonRing(ring: Array[Double], ccw: Boolean): Array[Double] = {
    val n = ring.length / 2 - 1
    if (n < 3) return ring
    val oriented =
      if ((Algos.signedRingArea(ring) > 0) == ccw) ring else reversedCoords(ring)
    var mi = 0
    var i = 1
    while (i < n) {
      if (cmpCoord(oriented(2 * i), oriented(2 * i + 1),
                   oriented(2 * mi), oriented(2 * mi + 1)) < 0) mi = i
      i += 1
    }
    if (mi == 0) return oriented
    val out = new Array[Double](ring.length)
    i = 0
    while (i < n) {
      val src = (mi + i) % n
      out(2 * i) = oriented(2 * src); out(2 * i + 1) = oriented(2 * src + 1)
      i += 1
    }
    out(2 * n) = out(0); out(2 * n + 1) = out(1)
    out
  }

  /**
   * Canonical form: byte-identical representations for geometrically
   * identical inputs (modulo ring rotation / orientation / part order) —
   * the equality-by-hash primitive for dedup and anti-entropy checks.
   * Exterior rings CCW, holes CW, every ring starts at its smallest
   * vertex, holes and multi-parts sort by their coordinate arrays, open
   * lines point from their smaller endpoint.
   */
  def normalize(g: Geometry): Geometry = g match {
    case l: LineString if !l.isEmpty =>
      val c = l.coords
      if (l.isClosed && l.numPoints > 3) LineString(canonRing(c, ccw = true))
      else if (cmpCoord(c(0), c(1), c(c.length - 2), c(c.length - 1)) > 0)
        LineString(reversedCoords(c))
      else l
    case p: Polygon if !p.isEmpty =>
      val ext = canonRing(p.rings(0), ccw = true)
      val holes = p.rings.drop(1).map(r => canonRing(r, ccw = false)).sortWith(lexLess)
      Polygon(ext +: holes)
    case m: MultiPoint =>
      MultiPoint(m.geoms.sortWith((a, b) => cmpCoord(a.x, a.y, b.x, b.y) < 0))
    case m: MultiLineString =>
      MultiLineString(m.geoms.map(l => normalize(l).asInstanceOf[LineString])
        .sortWith((a, b) => lexLess(a.coords, b.coords)))
    case m: MultiPolygon =>
      MultiPolygon(m.geoms.map(p => normalize(p).asInstanceOf[Polygon])
        .sortWith((a, b) => lexLess(a.rings(0), b.rings(0))))
    case gc: GeometryCollection =>
      val parts = gc.geoms.map(normalize)
      val keyed = parts.map(p => (p, coordsOf(p)))
      GeometryCollection(keyed.sortWith((a, b) =>
        if (a._1.typeId != b._1.typeId) a._1.typeId < b._1.typeId
        else lexLess(a._2, b._2)).map(_._1))
    case other => other
  }

  // ------------------------------------------- polygon ring orientation

  /**
   * Force polygon ring orientation (PostGIS ST_ForcePolygonCW/CCW):
   * exterior rings to the requested winding, holes to the opposite. Ring
   * START VERTICES are preserved (only direction flips — unlike
   * [[normalize]], which also canonicalizes start points and part order).
   * Non-areal geometries pass through unchanged; collections recurse.
   */
  def forceOrientation(g: Geometry, cwExterior: Boolean): Geometry = {
    def ring(r: Array[Double], wantCW: Boolean): Array[Double] = {
      val cw = Algos.signedRingArea(r) < 0
      if (cw == wantCW) r else reversedCoords(r)
    }
    g match {
      case p: Polygon if !p.isEmpty =>
        Polygon(ring(p.rings(0), cwExterior) +:
          p.rings.drop(1).map(ring(_, !cwExterior)))
      case m: MultiPolygon =>
        MultiPolygon(m.geoms.map(p => forceOrientation(p, cwExterior).asInstanceOf[Polygon]))
      case gc: GeometryCollection =>
        GeometryCollection(gc.geoms.map(forceOrientation(_, cwExterior)))
      case other => other
    }
  }

  /**
   * True iff every polygon component has its exterior wound in the given
   * direction and every hole opposite; null (None) when the input has no
   * polygon component (orientation is undefined for points/lines).
   */
  def isPolygonOriented(g: Geometry, cw: Boolean): Option[Boolean] = {
    def polyOk(p: Polygon): Boolean = {
      val extCW = Algos.signedRingArea(p.rings(0)) < 0
      extCW == cw && p.rings.drop(1).forall(r => (Algos.signedRingArea(r) < 0) == !cw)
    }
    g match {
      case p: Polygon if !p.isEmpty => Some(polyOk(p))
      case m: MultiPolygon if m.geoms.nonEmpty => Some(m.geoms.forall(polyOk))
      case gc: GeometryCollection =>
        val sub = gc.geoms.flatMap(isPolygonOriented(_, cw))
        if (sub.isEmpty) None else Some(sub.forall(identity))
      case _ => None
    }
  }

  // --------------------------------------------------------- offset curve

  /**
   * Parallel offset of a lineal geometry: positive distance offsets to the
   * LEFT of the travel direction, negative to the right (PostGIS
   * ST_OffsetCurve convention). Consecutive offset segments join by miter
   * (line-line intersection); collinear runs fall back to the plain
   * per-vertex offset. Slice semantics: no self-intersection repair and no
   * arc joins — adequate for the gently-curved inputs this targets
   * (route buffering, lane offsetting); null for non-lineal input.
   */
  def offsetCurve(g: Geometry, dist: Double): Geometry = g match {
    case l: LineString if l.numPoints >= 2 =>
      val dedup = Algos.removeRepeatedPoints(l, 0.0) match {
        case ll: LineString if ll.numPoints >= 2 => ll
        case _ => return null
      }
      val cs = dedup.coords
      val n = cs.length / 2
      // unit left-normals per segment
      val nx = new Array[Double](n - 1); val ny = new Array[Double](n - 1)
      var i = 0
      while (i < n - 1) {
        val dx = cs(2 * i + 2) - cs(2 * i); val dy = cs(2 * i + 3) - cs(2 * i + 1)
        val len = math.hypot(dx, dy)
        nx(i) = -dy / len; ny(i) = dx / len
        i += 1
      }
      val out = new Array[Double](2 * n)
      out(0) = cs(0) + nx(0) * dist; out(1) = cs(1) + ny(0) * dist
      out(2 * n - 2) = cs(2 * n - 2) + nx(n - 2) * dist
      out(2 * n - 1) = cs(2 * n - 1) + ny(n - 2) * dist
      i = 1
      while (i < n - 1) {
        // miter: intersect offset line of segment i-1 with that of segment i
        val ax = cs(2 * i - 2) + nx(i - 1) * dist; val ay = cs(2 * i - 1) + ny(i - 1) * dist
        val ux = cs(2 * i) - cs(2 * i - 2); val uy = cs(2 * i + 1) - cs(2 * i - 1)
        val bx = cs(2 * i) + nx(i) * dist; val by = cs(2 * i + 1) + ny(i) * dist
        val vx = cs(2 * i + 2) - cs(2 * i); val vy = cs(2 * i + 3) - cs(2 * i + 1)
        val den = ux * vy - uy * vx
        if (den == 0.0) { // collinear: plain offset of the shared vertex
          out(2 * i) = cs(2 * i) + nx(i) * dist; out(2 * i + 1) = cs(2 * i + 1) + ny(i) * dist
        } else {
          val t = ((bx - ax) * vy - (by - ay) * vx) / den
          out(2 * i) = ax + t * ux; out(2 * i + 1) = ay + t * uy
        }
        i += 1
      }
      LineString(out)
    case m: MultiLineString =>
      val parts = m.geoms.map(l => offsetCurve(l, dist))
      if (parts.contains(null)) null
      else MultiLineString(parts.map(_.asInstanceOf[LineString]))
    case _ => null
  }

  // --------------------------------------------------------- line editing

  /** Insert a vertex: pos -1 appends, pos in [0, n] inserts before that
    * 0-based index (PostGIS ST_AddPoint convention); otherwise null. */
  def addPoint(g: Geometry, p: Geometry, pos: Int): Geometry = (g, p) match {
    case (l: LineString, pt: Point) if !pt.isEmpty =>
      val n = l.numPoints
      val at = if (pos == -1) n else pos
      if (at < 0 || at > n) null
      else {
        val out = new Array[Double](l.coords.length + 2)
        System.arraycopy(l.coords, 0, out, 0, 2 * at)
        out(2 * at) = pt.x; out(2 * at + 1) = pt.y
        System.arraycopy(l.coords, 2 * at, out, 2 * at + 2, l.coords.length - 2 * at)
        LineString(out)
      }
    case _ => null
  }

  /** Remove the 0-based vertex; null if out of range or the result would
    * drop under 2 points (PostGIS ST_RemovePoint). */
  def removePoint(g: Geometry, pos: Int): Geometry = g match {
    case l: LineString =>
      val n = l.numPoints
      if (pos < 0 || pos >= n || n <= 2) null
      else {
        val out = new Array[Double](l.coords.length - 2)
        System.arraycopy(l.coords, 0, out, 0, 2 * pos)
        System.arraycopy(l.coords, 2 * pos + 2, out, 2 * pos, l.coords.length - 2 * pos - 2)
        LineString(out)
      }
    case _ => null
  }

  /** Replace the vertex at the 0-based index (negative counts from the
    * end, PostGIS ST_SetPoint); out of range => null. */
  def setPoint(g: Geometry, pos: Int, p: Geometry): Geometry = (g, p) match {
    case (l: LineString, pt: Point) if !pt.isEmpty =>
      val n = l.numPoints
      val at = if (pos < 0) n + pos else pos
      if (at < 0 || at >= n) null
      else {
        val out = l.coords.clone()
        out(2 * at) = pt.x; out(2 * at + 1) = pt.y
        LineString(out)
      }
    case _ => null
  }

  /** Wrap an atomic geometry in its multi-type (PostGIS ST_Multi); multi
    * and collection inputs pass through unchanged. */
  def asMulti(g: Geometry): Geometry = g match {
    case p: Point      => MultiPoint(Array(p))
    case l: LineString => MultiLineString(Array(l))
    case p: Polygon    => MultiPolygon(Array(p))
    case other         => other
  }

  // ------------------------------------------------------ generate points

  @inline private def mix64(z0: Long): Long = {
    // splitmix64 finalizer (public domain, Steele et al.)
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  private def coveredByAreal(x: Double, y: Double, g: Geometry): Boolean = g match {
    case p: Polygon => Algos.pointInPolygon(x, y, p) >= 0
    case m: MultiPolygon => m.geoms.exists(p => Algos.pointInPolygon(x, y, p) >= 0)
    case gc: GeometryCollection => gc.geoms.exists(coveredByAreal(x, y, _))
    case _ => false
  }

  /**
   * `n` deterministic pseudo-random points covered by the areal geometry
   * (PostGIS ST_GeneratePoints with an explicit seed): splitmix64-driven
   * rejection sampling over the envelope — same (geometry, n, seed) always
   * yields the same MultiPoint, on any executor. Degenerate inputs whose
   * area is a vanishing fraction of their envelope give up after 4096
   * attempts per point and return the points found.
   */
  def generatePoints(g: Geometry, n: Int, seed: Long): Geometry = {
    g match {
      case _: Polygon | _: MultiPolygon | _: GeometryCollection =>
        if (n <= 0) return MultiPoint(Array.empty)
        val e = g.envelope
        if (e.isEmpty) return null
        val pts = ArrayBuffer.empty[Point]
        var attempt = 0L
        val maxAttempts = 4096L * n
        while (pts.length < n && attempt < maxAttempts) {
          val x = e.minX + u01(mix64(seed * 0x5851f42dL + 2 * attempt)) * e.width
          val y = e.minY + u01(mix64(seed * 0x5851f42dL + 2 * attempt + 1)) * e.height
          if (coveredByAreal(x, y, g)) pts += Point(x, y)
          attempt += 1
        }
        MultiPoint(pts.toArray)
      case _ => null
    }
  }

  // ----------------------------------------------------------- XYZ tiles

  private val WebMercOrigin = 20037508.342789244

  /** Web-Mercator (EPSG:3857) envelope of slippy-map tile (z, x, y); y counts
    * from the north (OSM convention), matching PostGIS ST_TileEnvelope. */
  def tileEnvelope(z: Int, x: Long, y: Long): Geometry = {
    if (z < 0 || z > 30) return null
    val dim = 1L << z
    if (x < 0 || y < 0 || x >= dim || y >= dim) return null
    val size = 2.0 * WebMercOrigin / dim
    val x0 = -WebMercOrigin + x * size
    val y1 = WebMercOrigin - y * size
    val x1 = x0 + size
    val y0 = y1 - size
    Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))
  }
}
