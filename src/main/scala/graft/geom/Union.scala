package graft.geom

import scala.collection.mutable

/**
 * Cascaded geometry union — the dissolve kernel behind `st_union_agg`.
 *
 * The reference reserves `unary_union` in its docs but never implements it
 * (reference: py-geopolars/docs/source/reference/geoseries.rst:104-112,
 * commented out); this is the capability the docs declare, built for the
 * Spark aggregate path (SURVEY §2.5).
 *
 * Polygon dissolve uses a planar-overlay ("edge fragment") method:
 *
 *   1. group polygons into connected overlap components (envelope prefilter +
 *      exact intersects, union-find) — disjoint components never interact,
 *      which is what makes the aggregate's merge cheap;
 *   2. within a component, split every ring edge at every intersection with
 *      the other polygons' edges;
 *   3. keep a fragment iff it lies on the union's boundary: sample the two
 *      points offset ± from the fragment midpoint along its normal — exactly
 *      one side must be inside the union (this single rule handles overlap
 *      interiors, shared edges between adjacent polygons, and holes);
 *   4. de-duplicate coincident fragments (shared borders survive once);
 *   5. stitch fragments into closed rings, taking the most-counterclockwise
 *      outgoing fragment at junction vertices;
 *   6. classify rings shell/hole by containment parity and nest holes under
 *      their smallest containing shell.
 *
 * Points union = distinct; lines union = concatenation (no noding needed for
 * the declared surface); mixed types → GeometryCollection.
 */
object Union {

  private val SnapGrid = 1e9 // 1e-9 coordinate snap for vertex keys

  private def key(x: Double, y: Double): (Long, Long) =
    (math.rint(x * SnapGrid).toLong, math.rint(y * SnapGrid).toLong)

  /** One directed boundary piece between consecutive split points. */
  private final case class Frag(x1: Double, y1: Double, x2: Double, y2: Double) {
    def canonicalKey: ((Long, Long), (Long, Long)) = {
      val a = key(x1, y1); val b = key(x2, y2)
      if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) (a, b) else (b, a)
    }
  }

  def union(inputs: Seq[Geometry]): Geometry = {
    val polys = mutable.ArrayBuffer[Polygon]()
    val points = mutable.ArrayBuffer[Point]()
    val lines = mutable.ArrayBuffer[LineString]()
    def flatten(g: Geometry): Unit = g match {
      case null                 => ()
      case p: Point             => if (!p.isEmpty) points += p
      case l: LineString        => if (!l.isEmpty) lines += l
      case p: Polygon           => if (!p.isEmpty) polys += p
      case m: GeometryCollectionLike => m.geoms.foreach(flatten)
    }
    inputs.foreach(flatten)

    val distinctPts: Array[Point] = {
      val seen = mutable.LinkedHashMap[(Long, Long), Point]()
      points.foreach(p => seen.getOrElseUpdate(key(p.x, p.y), p))
      seen.values.toArray
    }
    val dissolved: Array[Polygon] = if (polys.isEmpty) Array.empty else dissolve(polys.toArray)

    val outGeoms = mutable.ArrayBuffer[Geometry]()
    if (dissolved.length == 1) outGeoms += dissolved(0)
    else if (dissolved.length > 1) outGeoms += MultiPolygon(dissolved)
    if (lines.length == 1) outGeoms += lines(0)
    else if (lines.length > 1) outGeoms += MultiLineString(lines.toArray)
    // points already covered by a polygon/line dissolve into the surface
    val freePts = distinctPts.filter(p =>
      !dissolved.exists(pl => Algos.pointInPolygon(p.x, p.y, pl) > 0) &&
      !lines.exists(l => Algos.contains(l, p)))
    if (outGeoms.isEmpty) {
      if (freePts.length == 1) return freePts(0)
      if (freePts.length > 1) return MultiPoint(freePts)
      return GeometryCollection(Array.empty)
    }
    if (freePts.length == 1) outGeoms += freePts(0)
    else if (freePts.length > 1) outGeoms += MultiPoint(freePts)
    if (outGeoms.length == 1) outGeoms(0) else GeometryCollection(outGeoms.toArray)
  }

  /** Remove collinear interior vertices from a closed ring (first==last). */
  private def dropCollinear(r: Array[Double]): Array[Double] = {
    val n = r.length / 2 - 1 // distinct vertices (last repeats first)
    if (n < 4) return r
    val keep = new Array[Boolean](n)
    var kept = 0
    var i = 0
    while (i < n) {
      val (px, py) = (r(2 * ((i + n - 1) % n)), r(2 * ((i + n - 1) % n) + 1))
      val (cx, cy) = (r(2 * i), r(2 * i + 1))
      val (nx, ny) = (r(2 * ((i + 1) % n)), r(2 * ((i + 1) % n) + 1))
      val cross = (cx - px) * (ny - py) - (cy - py) * (nx - px)
      keep(i) = math.abs(cross) > 1e-12
      if (keep(i)) kept += 1
      i += 1
    }
    if (kept == n || kept < 3) return r
    val out = new Array[Double]((kept + 1) * 2)
    var j = 0
    i = 0
    while (i < n) {
      if (keep(i)) { out(2 * j) = r(2 * i); out(2 * j + 1) = r(2 * i + 1); j += 1 }
      i += 1
    }
    out(2 * kept) = out(0); out(2 * kept + 1) = out(1)
    out
  }

  private def polysOf(g: Geometry): Array[Polygon] = g match {
    case p: Polygon if !p.isEmpty => Array(p)
    case m: MultiPolygon          => m.geoms.filterNot(_.isEmpty)
    case gc: GeometryCollection   => gc.geoms.flatMap(polysOf)
    case _                        => Array.empty
  }

  private def wrap(ps: Array[Polygon]): Geometry =
    if (ps.isEmpty) GeometryCollection(Array.empty)
    else if (ps.length == 1) ps(0)
    else MultiPolygon(ps)

  private def hasLines(g: Geometry): Boolean = g match {
    case _: LineString | _: MultiLineString => true
    case gc: GeometryCollectionLike         => gc.geoms.exists(hasLines)
    case _                                  => false
  }

  /**
   * Binary intersection. Point vs area uses containment; area vs area runs
   * the overlay with membership `a && b`. Line operands are unsupported —
   * returns null, which surfaces as SQL NULL.
   */
  def intersection(a: Geometry, b: Geometry): Geometry = (a, b) match {
    case _ if hasLines(a) || hasLines(b) => null
    case (p: Point, g) => if (Algos.intersects(g, p)) p else GeometryCollection(Array.empty)
    case (g, p: Point) => if (Algos.intersects(g, p)) p else GeometryCollection(Array.empty)
    case _ =>
      val (pa, pb) = (polysOf(a), polysOf(b))
      if (pa.isEmpty || pb.isEmpty) GeometryCollection(Array.empty)
      else if (!pa.exists(x => pb.exists(y => x.envelope.intersects(y.envelope))))
        GeometryCollection(Array.empty)
      else wrap(overlayBinary(pa, pb, _ && _))
  }

  /** Symmetric difference (XOR membership; point operands keep union's
    * absorbed-if-inside semantics). Line operands => null (SQL NULL). */
  def symDifference(a: Geometry, b: Geometry): Geometry = (a, b) match {
    case _ if hasLines(a) || hasLines(b) => null
    case (p: Point, q: Point) =>
      if (p == q) GeometryCollection(Array.empty) else MultiPoint(Array(p, q))
    case (p: Point, g) => symDiffPointArea(p, g)
    case (g, p: Point) => symDiffPointArea(p, g)
    case _ =>
      val (pa, pb) = (polysOf(a), polysOf(b))
      if (pa.isEmpty) wrap(pb)
      else if (pb.isEmpty) wrap(pa)
      else if (!pa.exists(x => pb.exists(y => x.envelope.intersects(y.envelope))))
        wrap(pa ++ pb)
      else wrap(overlayBinary(pa, pb, _ != _))
  }

  private def symDiffPointArea(p: Point, g: Geometry): Geometry =
    if (Algos.intersects(g, p)) g // point has measure zero inside the area
    else GeometryCollection(Array(g, p))

  /** Binary difference a − b (area operands; point minuend handled directly).
    * Line operands => null (SQL NULL). */
  def difference(a: Geometry, b: Geometry): Geometry = (a, b) match {
    case _ if hasLines(a) || hasLines(b) => null
    case (p: Point, g) => if (Algos.intersects(g, p)) GeometryCollection(Array.empty) else p
    case _ =>
      val (pa, pb) = (polysOf(a), polysOf(b))
      if (pa.isEmpty) GeometryCollection(Array.empty)
      else if (pb.isEmpty ||
               !pa.exists(x => pb.exists(y => x.envelope.intersects(y.envelope)))) wrap(pa)
      else wrap(overlayBinary(pa, pb, (ia, ib) => ia && !ib))
  }

  // ------------------------------------------------------------ polygons

  private def dissolve(ps: Array[Polygon]): Array[Polygon] = {
    // union-find over the overlap graph (envelope prefilter, exact refine)
    val parent = Array.tabulate(ps.length)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r); parent(i) = r; r }
    val envs = ps.map(_.envelope)
    for (i <- ps.indices; j <- (i + 1) until ps.length)
      if (envs(i).intersects(envs(j)) && Algos.intersects(ps(i), ps(j))) {
        val (ri, rj) = (find(i), find(j)); if (ri != rj) parent(ri) = rj
      }
    val groups = ps.indices.groupBy(find).values
    groups.flatMap { idxs =>
      if (idxs.length == 1) Array(ps(idxs.head))
      else overlayUnion(idxs.map(ps).toArray)
    }.toArray.sortBy(p => { val e = p.envelope; (e.minX, e.minY) })
  }

  /** Intersection parameters of segment (ax1,ay1)-(ax2,ay2) with (bx1..by2),
    * as t values along A in (0,1); includes endpoints of B lying on A and
    * collinear-overlap projections. */
  private def splitParams(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
                          bx1: Double, by1: Double, bx2: Double, by2: Double,
                          out: mutable.ArrayBuffer[Double]): Unit = {
    val rX = ax2 - ax1; val rY = ay2 - ay1
    val sX = bx2 - bx1; val sY = by2 - by1
    val denom = rX * sY - rY * sX
    val qpX = bx1 - ax1; val qpY = by1 - ay1
    if (math.abs(denom) > 1e-14) {
      val t = (qpX * sY - qpY * sX) / denom
      val u = (qpX * rY - qpY * rX) / denom
      if (t > 1e-12 && t < 1 - 1e-12 && u >= -1e-12 && u <= 1 + 1e-12) out += t
    } else {
      // parallel: project B's endpoints onto A when collinear
      val cross = qpX * rY - qpY * rX
      if (math.abs(cross) < 1e-9) {
        val len2 = rX * rX + rY * rY
        if (len2 > 0) {
          val t1 = (qpX * rX + qpY * rY) / len2
          val t2 = ((bx2 - ax1) * rX + (by2 - ay1) * rY) / len2
          if (t1 > 1e-12 && t1 < 1 - 1e-12) out += t1
          if (t2 > 1e-12 && t2 < 1 - 1e-12) out += t2
        }
      }
    }
  }

  /** True if (x,y) is strictly inside any polygon of the group
    * (Algos.pointInPolygon: 0 = outside, 1 = boundary, 2 = interior). */
  private def insideUnion(x: Double, y: Double, group: Array[Polygon]): Boolean = {
    var i = 0
    while (i < group.length) {
      if (Algos.pointInPolygon(x, y, group(i)) == 2) return true
      i += 1
    }
    false
  }

  /** Split one ring's edges at intersections with `others`' edges into frags. */
  private def splitRings(
      polys: Array[Polygon], others: Int => Iterator[Array[Double]],
      frags: mutable.ArrayBuffer[Frag]): Unit = {
    for (pi <- polys.indices; ring <- polys(pi).rings) {
      var i = 0
      while (i + 3 < ring.length) {
        val (x1, y1, x2, y2) = (ring(i), ring(i + 1), ring(i + 2), ring(i + 3))
        if (x1 != x2 || y1 != y2) {
          val ts = mutable.ArrayBuffer[Double]()
          others(pi).foreach { r2 =>
            var j = 0
            while (j + 3 < r2.length) {
              splitParams(x1, y1, x2, y2, r2(j), r2(j + 1), r2(j + 2), r2(j + 3), ts)
              j += 2
            }
          }
          val cuts = (0.0 +: ts.distinct.sorted :+ 1.0).toArray
          var c = 0
          while (c + 1 < cuts.length) {
            val (t0, t1) = (cuts(c), cuts(c + 1))
            if (t1 - t0 > 1e-12)
              frags += Frag(x1 + t0 * (x2 - x1), y1 + t0 * (y2 - y1),
                            x1 + t1 * (x2 - x1), y1 + t1 * (y2 - y1))
            c += 1
          }
        }
        i += 2
      }
    }
  }

  private def overlayUnion(group: Array[Polygon]): Array[Polygon] = {
    // 1-2. collect ring edges, split at intersections with OTHER polygons
    val frags = mutable.ArrayBuffer[Frag]()
    splitRings(group,
      pi => group.indices.iterator.filter(_ != pi).flatMap(group(_).rings.iterator), frags)
    val eps = epsFor(group)
    overlayCore(frags, (x, y) => insideUnion(x, y, group), eps)
  }

  /**
   * Binary region overlay: result boundary = fragments of either side's
   * rings where `member(insideA, insideB)` flips across the fragment.
   * member = (a,b) => a||b gives union; a&&b intersection; a&&!b difference.
   */
  private[geom] def overlayBinary(
      aPolys: Array[Polygon], bPolys: Array[Polygon],
      member: (Boolean, Boolean) => Boolean): Array[Polygon] = {
    val frags = mutable.ArrayBuffer[Frag]()
    splitRings(aPolys, _ => bPolys.iterator.flatMap(_.rings.iterator), frags)
    splitRings(bPolys, _ => aPolys.iterator.flatMap(_.rings.iterator), frags)
    val eps = epsFor(aPolys ++ bPolys)
    overlayCore(frags,
      (x, y) => member(insideUnion(x, y, aPolys), insideUnion(x, y, bPolys)), eps)
  }

  /**
   * Side-sampling offset budget: must stay below the thinnest input
   * polygon's smaller envelope dimension (sampling further than a region is
   * thick steps OVER it — a 1e8-wide, 1-tall rectangle classified with a
   * global-extent eps loses its own long edges), with a floating-point floor
   * tied to the coordinate magnitude.
   */
  private def epsFor(polys: Array[Polygon]): Double = {
    var minDim = Double.PositiveInfinity
    var maxDim = 1.0
    polys.foreach { p =>
      val e = p.envelope
      if (!e.isEmpty) {
        val d = math.min(e.width, e.height)
        if (d > 0 && d < minDim) minDim = d
        maxDim = math.max(maxDim, math.max(e.width, e.height))
      }
    }
    if (minDim == Double.PositiveInfinity) maxDim * 1e-7
    else math.max(minDim * 1e-7, maxDim * 1e-12)
  }

  /** Classify + stitch + nest: shared tail of every overlay operation. */
  private def overlayCore(
      frags: mutable.ArrayBuffer[Frag],
      inRegion: (Double, Double) => Boolean,
      eps: Double): Array[Polygon] = {
    // 3. boundary classification by side sampling: exactly one side inside.
    // Offset is capped by the fragment's own length so small features mixed
    // with a large extent aren't sampled past their neighborhood.
    def offsetFor(len: Double): Double = math.min(eps, len * 0.1)
    val kept = frags.filter { f =>
      val mx = (f.x1 + f.x2) / 2; val my = (f.y1 + f.y2) / 2
      val dx = f.x2 - f.x1; val dy = f.y2 - f.y1
      val len = math.hypot(dx, dy)
      if (len < 1e-12) false
      else {
        val off = offsetFor(len)
        val nx = -dy / len * off; val ny = dx / len * off
        val leftIn = inRegion(mx + nx, my + ny)
        val rightIn = inRegion(mx - nx, my - ny)
        leftIn != rightIn
      }
    }

    // 4. dedupe coincident fragments; orient so the region interior is on the
    //    LEFT (standard shell-CCW/hole-CW convention falls out of this).
    val canon = mutable.LinkedHashMap[((Long, Long), (Long, Long)), Frag]()
    kept.foreach { f =>
      val mx = (f.x1 + f.x2) / 2; val my = (f.y1 + f.y2) / 2
      val dx = f.x2 - f.x1; val dy = f.y2 - f.y1
      val len = math.hypot(dx, dy)
      val off = offsetFor(len)
      val nx = -dy / len * off; val ny = dx / len * off
      val oriented =
        if (inRegion(mx + nx, my + ny)) f
        else Frag(f.x2, f.y2, f.x1, f.y1)
      canon.getOrElseUpdate(f.canonicalKey, oriented)
    }

    // 5. stitch into rings: follow fragments; at junctions take the most
    //    counterclockwise turn relative to the incoming direction
    val outgoing = mutable.HashMap[(Long, Long), mutable.ArrayBuffer[Frag]]()
    canon.values.foreach { f =>
      outgoing.getOrElseUpdate(key(f.x1, f.y1), mutable.ArrayBuffer()) += f
    }
    val used = mutable.HashSet[Frag]()
    val rings = mutable.ArrayBuffer[Array[Double]]()
    canon.values.foreach { start =>
      if (!used.contains(start)) {
        val pts = mutable.ArrayBuffer[Double](start.x1, start.y1)
        var cur = start
        var guard = 0
        val maxSteps = canon.size + 2
        var closed = false
        while (!closed && guard < maxSteps) {
          used += cur
          pts += cur.x2; pts += cur.y2
          if (key(cur.x2, cur.y2) == key(start.x1, start.y1)) closed = true
          else {
            val nexts = outgoing.getOrElse(key(cur.x2, cur.y2), mutable.ArrayBuffer())
              .filterNot(used.contains)
            if (nexts.isEmpty) { guard = maxSteps } // dead end — drop open chain
            else {
              val inAng = math.atan2(cur.y2 - cur.y1, cur.x2 - cur.x1)
              cur = nexts.maxBy { n =>
                val outAng = math.atan2(n.y2 - n.y1, n.x2 - n.x1)
                // turn angle in (-pi, pi]; most CCW = largest
                var d = outAng - inAng + math.Pi
                while (d <= -math.Pi) d += 2 * math.Pi
                while (d > math.Pi) d -= 2 * math.Pi
                d
              }
            }
          }
          guard += 1
        }
        if (closed && pts.length >= 8) {
          val cleaned = dropCollinear(pts.toArray)
          if (cleaned.length >= 8) rings += cleaned
        }
      }
    }

    // 6. shells vs holes by containment parity; holes nest in smallest shell
    //    (rings were collinear-cleaned above: repeated dissolves otherwise
    //    accumulate split vertices and make the next overlay quadratic in
    //    them — this keeps the aggregate's compact() amortized cost flat)
    val ringArr = rings.toArray
    def ringContains(outer: Array[Double], inner: Array[Double]): Boolean = {
      // representative inner vertex strictly inside outer; vertices ON the
      // outer boundary (touch points) are inconclusive — keep scanning
      var i = 0
      while (i + 1 < inner.length) {
        val r = Algos.pointInRing(inner(i), inner(i + 1), outer)
        if (r == 2) return true
        if (r == 0) return false
        i += 2
      }
      false
    }
    val depth = ringArr.map(r => ringArr.count(o => !(o eq r) && ringContains(o, r)))
    val shells = ringArr.indices.filter(i => depth(i) % 2 == 0)
    val holes = ringArr.indices.filter(i => depth(i) % 2 == 1)
    shells.map { si =>
      val myHoles = holes.filter { hi =>
        ringContains(ringArr(si), ringArr(hi)) &&
          // immediate parent: no other shell between
          !shells.exists(s2 => s2 != si && ringContains(ringArr(si), ringArr(s2)) &&
            ringContains(ringArr(s2), ringArr(hi)))
      }
      Polygon((ringArr(si) +: myHoles.map(ringArr(_))).toArray)
    }.toArray
  }
}
