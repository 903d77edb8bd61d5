package graft.spatial

import graft.geom.Envelope

/**
 * Immutable STR-packed (Sort-Tile-Recursive) R-tree over (envelope, payload)
 * entries.
 *
 * Spark-side re-expression of the reference's `SpatialIndex { r_tree:
 * RTree<TreeNode> }` (reference: geopolars/src/spatial_index.rs:278-350,
 * node = row index + AABB envelope). Built once per broadcast side of a
 * spatial join on each executor-deserialized copy; bulk-loaded (STR packing)
 * rather than incrementally inserted, which gives near-optimal packing and a
 * cheap, serialization-friendly flat-array layout.
 *
 * Query is envelope intersection => candidate payloads; exact predicate
 * refinement happens in the caller (filter-and-refine,
 * spatial_index.rs:74-143).
 */
final class STRtree private (
    // flat arrays: nodes stored level-contiguous, leaves first is NOT used;
    // instead we store a classic implicit tree: each node has [minX,minY,maxX,maxY]
    bounds: Array[Double],        // 4 doubles per node
    childOffset: Array[Int],      // first child node index, or -1 for leaf nodes
    childCount: Array[Int],       // children (internal) or entries (leaf)
    entryStart: Array[Int],       // for leaves: offset into entryIdx
    entryIdx: Array[Int],         // payload indices, leaf-contiguous
    entryBounds: Array[Double],   // 4 doubles per entry, aligned with entryIdx
    val size: Int,
    root: Int
) extends Serializable {

  /** Visit every payload whose envelope intersects `q`. */
  def query(q: Envelope)(f: Int => Unit): Unit = {
    if (size == 0 || q.isEmpty) return
    val stack = new java.util.ArrayDeque[Integer]()
    stack.push(root)
    while (!stack.isEmpty) {
      val n = stack.pop()
      val b = n * 4
      if (q.maxX >= bounds(b) && q.minX <= bounds(b + 2) &&
          q.maxY >= bounds(b + 1) && q.minY <= bounds(b + 3)) {
        if (childOffset(n) < 0) {
          var i = entryStart(n)
          val end = i + childCount(n)
          while (i < end) {
            val eb = i * 4
            if (q.maxX >= entryBounds(eb) && q.minX <= entryBounds(eb + 2) &&
                q.maxY >= entryBounds(eb + 1) && q.minY <= entryBounds(eb + 3)) f(entryIdx(i))
            i += 1
          }
        } else {
          var c = childOffset(n)
          val end = c + childCount(n)
          while (c < end) { stack.push(c); c += 1 }
        }
      }
    }
  }

  def queryToBuffer(q: Envelope): scala.collection.mutable.ArrayBuffer[Int] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    query(q)(buf += _)
    buf
  }

  /** Min distance between `q` and the envelope at `off` in `arr` (0 when
    * they overlap). */
  private def envDist(arr: Array[Double], off: Int, q: Envelope): Double = {
    val dx = math.max(0.0, math.max(arr(off) - q.maxX, q.minX - arr(off + 2)))
    val dy = math.max(0.0, math.max(arr(off + 1) - q.maxY, q.minY - arr(off + 3)))
    math.sqrt(dx * dx + dy * dy)
  }

  /**
   * k nearest payloads to `q` by `exactDist`, best-first branch-and-bound:
   * a priority queue ordered by (distance, payload) holds tree nodes and
   * entries at their envelope LOWER-BOUND distance; a popped entry is
   * re-queued at its exact distance, and a popped EXACT entry is final
   * (everything still queued has a bound >= it). Ties are resolved toward
   * the smaller payload index, so results are deterministic when several
   * candidates are equidistant. Entries with empty envelopes (null/invalid
   * geometries) never qualify. Returns (payload, exactDist) ascending.
   *
   * `exactDist` must never be below the envelope distance (true for any
   * geometry metric over these envelopes); NaN disqualifies the entry.
   */
  def nearestK(q: Envelope, k: Int)(exactDist: Int => Double): Array[(Int, Double)] = {
    if (size == 0 || k <= 0 || q.isEmpty) return Array.empty
    // kind: 0 = internal/leaf node (id = node), 1 = entry at lower bound
    // (id = entry slot), 2 = entry at exact distance (id = entry slot)
    final case class Item(dist: Double, payload: Int, kind: Int, id: Int)
    val pq = new java.util.PriorityQueue[Item](32, (a: Item, b: Item) => {
      val c = java.lang.Double.compare(a.dist, b.dist)
      if (c != 0) c
      else {
        // nodes (payload -1) expand before entries at the same distance
        val p = Integer.compare(a.payload, b.payload)
        if (p != 0) p else Integer.compare(a.kind, b.kind)
      }
    })
    pq.add(Item(envDist(bounds, root * 4, q), -1, 0, root))
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Double)](k)
    while (out.length < k && !pq.isEmpty) {
      val it = pq.poll()
      it.kind match {
        case 0 =>
          val n = it.id
          if (childOffset(n) < 0) {
            var i = entryStart(n)
            val end = i + childCount(n)
            while (i < end) {
              val eb = i * 4
              if (entryBounds(eb) <= entryBounds(eb + 2)) // skip empty envelopes
                pq.add(Item(envDist(entryBounds, eb, q), entryIdx(i), 1, i))
              i += 1
            }
          } else {
            var c = childOffset(n)
            val end = c + childCount(n)
            while (c < end) { pq.add(Item(envDist(bounds, c * 4, q), -1, 0, c)); c += 1 }
          }
        case 1 =>
          val d = exactDist(it.payload)
          if (!d.isNaN) pq.add(Item(math.max(d, it.dist), it.payload, 2, it.id))
        case 2 =>
          out += ((it.payload, it.dist))
      }
    }
    out.toArray
  }
}

object STRtree {
  val DefaultFanout = 16

  /** Bulk-load from parallel arrays of envelopes; payload = array index. */
  def build(envs: Array[Envelope], fanout: Int = DefaultFanout): STRtree = {
    val n = envs.length
    if (n == 0)
      return new STRtree(Array(0, 0, -1, -1), Array(-1), Array(0), Array(0), Array.empty,
        Array.empty, 0, 0)

    // --- STR leaf packing: sort by center-x, tile into sqrt(n/fanout) slabs,
    // sort each slab by center-y, chunk into leaves of `fanout`.
    val idx = Array.tabulate(n)(identity)
    val nonEmpty = idx.filter(i => !envs(i).isEmpty)
    // all rows null/invalid => same sentinel empty tree as n == 0 (otherwise
    // leafEntries stays empty and level.head below throws)
    if (nonEmpty.isEmpty)
      return new STRtree(Array(0, 0, -1, -1), Array(-1), Array(0), Array(0), Array.empty,
        Array.empty, 0, 0)
    val sorted = nonEmpty.sortBy(i => envs(i).centerX)
    val leafCount = math.max(1, math.ceil(sorted.length.toDouble / fanout).toInt)
    val slabCount = math.max(1, math.ceil(math.sqrt(leafCount.toDouble)).toInt)
    val slabSize = math.max(1, math.ceil(sorted.length.toDouble / slabCount).toInt)

    val leafEntries = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    var s = 0
    while (s < sorted.length) {
      val slab = sorted.slice(s, math.min(s + slabSize, sorted.length)).sortBy(i => envs(i).centerY)
      var j = 0
      while (j < slab.length) {
        leafEntries += slab.slice(j, math.min(j + fanout, slab.length))
        j += fanout
      }
      s += slabSize
    }

    // --- build levels bottom-up into flat arrays
    val boundsBuf = scala.collection.mutable.ArrayBuffer[Double]()
    val childOffBuf = scala.collection.mutable.ArrayBuffer[Int]()
    val childCntBuf = scala.collection.mutable.ArrayBuffer[Int]()
    val entryStartBuf = scala.collection.mutable.ArrayBuffer[Int]()
    val entryIdxBuf = scala.collection.mutable.ArrayBuffer[Int]()
    val entryBoundsBuf = scala.collection.mutable.ArrayBuffer[Double]()

    def addNode(env: Envelope, firstChild: Int, count: Int, eStart: Int): Int = {
      val id = childOffBuf.length
      boundsBuf += env.minX += env.minY += env.maxX += env.maxY
      childOffBuf += firstChild
      childCntBuf += count
      entryStartBuf += eStart
      id
    }

    // leaves
    var level = leafEntries.toArray.map { es =>
      val env = es.foldLeft(Envelope.empty)((e, i) => e.expand(envs(i)))
      val eStart = entryIdxBuf.length
      entryIdxBuf ++= es
      es.foreach { i =>
        val e = envs(i)
        entryBoundsBuf += e.minX += e.minY += e.maxX += e.maxY
      }
      addNode(env, -1, es.length, eStart)
    }
    // internal levels
    while (level.length > 1) {
      val next = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < level.length) {
        val group = level.slice(i, math.min(i + fanout, level.length))
        val env = group.foldLeft(Envelope.empty) { (e, nid) =>
          val b = nid * 4
          e.expand(Envelope(boundsBuf(b), boundsBuf(b + 1), boundsBuf(b + 2), boundsBuf(b + 3)))
        }
        next += addNode(env, group.head, group.length, 0)
        i += fanout
      }
      level = next.toArray
    }

    new STRtree(boundsBuf.toArray, childOffBuf.toArray, childCntBuf.toArray,
      entryStartBuf.toArray, entryIdxBuf.toArray, entryBoundsBuf.toArray,
      nonEmpty.length, level.head)
  }
}
