package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geom.{Geometry => Geom, _}

/**
 * Distributed filter-and-refine spatial join.
 *
 * Semantics pinned to the reference's `spatial_join(lhs, rhs,
 * SpatialJoinArgs)` (reference: geopolars/src/spatial_index.rs:37-204):
 *  - predicates Intersects | Contains (spatial_index.rs:15-35); Contains is
 *    evaluated as contains(left, right)
 *  - join types inner | left only (spatial_index.rs:187-203)
 *  - every output column suffixed `_left`/`_right` (configurable,
 *    spatial_index.rs:164-184)
 *
 * Physical plan (Spark-first, not the reference's single-node algorithm):
 *
 *  1. BROADCAST strategy (right side fits in the driver/executors): collect
 *     (rowId, wkb) of the right side, build one STR-packed R-tree, broadcast
 *     it; mapPartitions over the (unsuffled) left side probes the tree and
 *     refines with the exact predicate => (lid, rid) pair table; two
 *     broadcast-friendly equi-joins stitch the full rows back (the same
 *     "index-pair frame + host equi-join" shape as spatial_index.rs:145-203,
 *     but Spark supplies distribution, spill, and left-outer null
 *     completion).
 *
 *  2. GRID strategy (both sides large): overlay a fixed grid over the data
 *     extent, flatMap each row to the cells its envelope covers, equi-join
 *     on cell (shuffle co-partitions matching cells), refine exactly, and
 *     de-duplicate pairs that met in multiple cells. No broadcast, no
 *     driver-side materialization; scales to both sides being 100 TB because
 *     the shuffle key is the grid cell.
 */
object SpatialJoin {

  sealed trait Predicate extends Serializable
  object Predicate {
    case object Intersects extends Predicate
    case object Contains extends Predicate
    def parse(s: String): Predicate = s.trim.toLowerCase match {
      case "intersects" => Intersects
      case "contains"   => Contains
      case other        => throw new IllegalArgumentException(s"unknown spatial predicate: $other")
    }
  }

  /**
   * Exact refinement, transliterating the reference's (geom-type, geom-type,
   * predicate) dispatch matrix verbatim (spatial_index.rs:89-137): point vs
   * polygon/multipolygon/line uses boundary-excluding `contains` REGARDLESS
   * of the requested predicate; polygon-family pairs honor the predicate;
   * unsupported combinations are false.
   */
  private[graft] def refine(pred: Predicate, l: Geom, r: Geom): Boolean = (l, r) match {
    case (p: Point, g: Polygon)           => Algos.contains(g, p)
    case (g: Polygon, p: Point)           => Algos.contains(g, p)
    case (p: Point, g: MultiPolygon)      => Algos.contains(g, p)
    case (g: MultiPolygon, p: Point)      => Algos.contains(g, p)
    case (a: Polygon, b: Polygon) =>
      if (pred == Predicate.Contains) Algos.contains(a, b) else Algos.intersects(a, b)
    case (a: MultiPolygon, b: Polygon) =>
      if (pred == Predicate.Contains) Algos.contains(a, b) else Algos.intersects(a, b)
    case (a: Polygon, b: MultiPolygon) if pred == Predicate.Intersects => Algos.intersects(a, b)
    case (g: LineString, p: Point)        => Algos.contains(g, p)
    case (p: Point, g: LineString)        => Algos.contains(g, p)
    case (g: MultiLineString, p: Point)   => Algos.contains(g, p)
    case (p: Point, g: MultiLineString)   => Algos.contains(g, p)
    case _ => false
  }

  /**
   * Broadcast filter-refine join. `right` must be broadcast-sized: its full
   * rows are collected once, indexed into an STR-tree, and broadcast; the
   * left side streams through a single stateless mapPartitions emitting the
   * joined (suffixed) rows directly — one pass, no pair table, no stitch
   * shuffles. (The reference materializes an index-pair frame and re-joins
   * through its host, spatial_index.rs:145-203; Spark lets us skip that
   * because the probe already holds both rows.)
   */
  /** Broadcast-side index shared by this batch join and the streaming
    * stream-static join: full rows + decoded geometries + STR-tree. */
  private[graft] final case class RowIndex(
      tree: STRtree, geoms: Array[Geom], rows: Array[org.apache.spark.sql.Row])
      extends Serializable

  private[graft] def buildRowIndex(df: DataFrame, geomCol: String): RowIndex = {
    val rows = df.collect()
    val gIdx = df.schema.fieldIndex(geomCol)
    val geoms = new Array[Geom](rows.length)
    val envs = new Array[Envelope](rows.length)
    var i = 0
    while (i < rows.length) {
      val b = rows(i).get(gIdx)
      geoms(i) = if (b == null) null else WKB.readOrNull(b.asInstanceOf[Array[Byte]])
      envs(i) = if (geoms(i) == null) Envelope.empty else geoms(i).envelope
      i += 1
    }
    RowIndex(STRtree.build(envs), geoms, rows)
  }

  /** Probe one streamed row against the broadcast index, emitting joined
    * rows; left joins null-fill when nothing matches. */
  private[graft] def probeRow(
      lRow: org.apache.spark.sql.Row, gIdx: Int, idx: RowIndex,
      hit: (Geom, Geom) => Boolean, leftJoin: Boolean,
      nRight: Int): Iterator[org.apache.spark.sql.Row] = {
    val b = lRow.get(gIdx)
    val g = if (b == null) null else WKB.readOrNull(b.asInstanceOf[Array[Byte]])
    val out = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    if (g != null) {
      idx.tree.query(g.envelope) { j =>
        if (idx.geoms(j) != null && hit(g, idx.geoms(j)))
          out += org.apache.spark.sql.Row.fromSeq(lRow.toSeq ++ idx.rows(j).toSeq)
      }
    }
    if (out.nonEmpty) out.iterator
    else if (leftJoin)
      Iterator(org.apache.spark.sql.Row.fromSeq(lRow.toSeq ++ Seq.fill(nRight)(null)))
    else Iterator.empty
  }

  /** Existence probe for semi/anti joins: true iff ANY indexed row
    * matches — the refinement short-circuits after the first hit, so a
    * dense region costs one hit, not its full candidate list. Null or
    * invalid left geometry -> false (no match, SQL EXISTS semantics). */
  private[graft] def probeExists(
      lRow: org.apache.spark.sql.Row, gIdx: Int, idx: RowIndex,
      hit: (Geom, Geom) => Boolean): Boolean = {
    val b = lRow.get(gIdx)
    val g = if (b == null) null else WKB.readOrNull(b.asInstanceOf[Array[Byte]])
    if (g == null) return false
    var found = false
    idx.tree.query(g.envelope) { j =>
      if (!found && idx.geoms(j) != null && hit(g, idx.geoms(j))) found = true
    }
    found
  }

  /** Grid-cell id for a (cx, cy) pair — shared by gridJoin and the
    * stream-stream join's cell expression. */
  private[graft] def cellId(cx: Long, cy: Long): Long = (cx << 32) | (cy & 0xffffffffL)

  /**
   * Reusable prebuilt broadcast index over one side of a spatial join —
   * parity with the reference's caller-provided `Arc<SpatialIndex>`
   * (spatial_index.rs:20-21, 48-71): build once, pass to any number of
   * joins against the same (unchanged) indexed side, skipping the collect +
   * tree build + broadcast per query.
   */
  final class BroadcastIndex private[spatial] (
      private[spatial] val bc: org.apache.spark.broadcast.Broadcast[RowIndex],
      private[spatial] val schema: org.apache.spark.sql.types.StructType,
      val geomCol: String) extends Serializable {
    def unpersist(): Unit = bc.unpersist()
  }

  /** Build a reusable broadcast STR-tree index over `df` (the future right
    * side of [[joinWithIndex]]). */
  def buildIndex(df: DataFrame, geomCol: String = "geometry"): BroadcastIndex =
    new BroadcastIndex(
      df.sparkSession.sparkContext.broadcast(buildRowIndex(df, geomCol)),
      df.schema, geomCol)

  /** Broadcast filter-refine join against a prebuilt [[BroadcastIndex]]
    * (reference: precomputed-index reuse test, spatial_index.rs:558-625). */
  def joinWithIndex(
      left: DataFrame,
      rightIndex: BroadcastIndex,
      predicate: Predicate = Predicate.Intersects,
      joinType: String = "inner",
      leftGeom: String = "geometry",
      lSuffix: String = "_left",
      rSuffix: String = "_right"): DataFrame =
    joinImpl(left, rightIndex.bc, rightIndex.schema, predicate, joinType,
      leftGeom, lSuffix, rSuffix)

  def join(
      left: DataFrame,
      right: DataFrame,
      predicate: Predicate = Predicate.Intersects,
      joinType: String = "inner",
      leftGeom: String = "geometry",
      rightGeom: String = "geometry",
      lSuffix: String = "_left",
      rSuffix: String = "_right"): DataFrame = {
    val spark = left.sparkSession
    val bc = spark.sparkContext.broadcast(buildRowIndex(right, rightGeom))
    joinImpl(left, bc, right.schema, predicate, joinType, leftGeom, lSuffix, rSuffix)
  }

  private def joinImpl(
      left: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[RowIndex],
      rightSchema: org.apache.spark.sql.types.StructType,
      predicate: Predicate,
      joinType: String,
      leftGeom: String,
      lSuffix: String,
      rSuffix: String): DataFrame = {
    require(Set("inner", "left", "semi", "anti")(joinType),
      "spatial join supports inner|left (spatial_index.rs:187-203) plus " +
        s"semi|anti (Spark leftsemi/leftanti extension), got $joinType")

    // semi/anti: left columns only, unsuffixed (Spark leftsemi/leftanti
    // convention) — rows kept iff a match exists (semi) / none does
    // (anti); anti keeps null/invalid-geometry left rows (NOT EXISTS).
    // Same broadcast index, but the probe short-circuits at the first
    // refined hit instead of materializing the candidate list.
    if (joinType == "semi" || joinType == "anti") {
      val lgIdx0 = left.schema.fieldIndex(leftGeom)
      val pred0 = predicate
      val want = joinType == "semi"
      return left.mapPartitions { it =>
        val idx = bc.value
        it.filter(r => probeExists(r, lgIdx0, idx, refine(pred0, _, _)) == want)
      }(org.apache.spark.sql.Encoders.row(left.schema))
    }

    // every output column suffixed, both sides (spatial_index.rs:164-184)
    val outSchema = org.apache.spark.sql.types.StructType(
      left.schema.fields.map(f => f.copy(name = f.name + lSuffix)) ++
      rightSchema.fields.map(f => f.copy(name = f.name + rSuffix, nullable = true)))
    val lgIdx = left.schema.fieldIndex(leftGeom)
    val pred = predicate
    val leftJoin = joinType == "left"
    val nRight = rightSchema.fields.length

    left.mapPartitions { it =>
      val idx = bc.value
      it.flatMap(probeRow(_, lgIdx, idx, refine(pred, _, _), leftJoin, nRight))
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * k-nearest-neighbor spatial join (PostGIS `<->` / Sedona KNN-join
   * analog): for every left row, the `k` right rows nearest by
   * `Algos.distance`, with `knn_rank` (1-based) and `knn_dist` appended.
   *
   * Physical plan: broadcast STR-tree over the right side, one stateless
   * mapPartitions pass over the left side running a best-first
   * branch-and-bound descent per row ([[STRtree.nearestK]]) — O(log n +
   * candidates) probes instead of scanning all right rows, no shuffle of
   * the left side at all. Determinism: the right side is sorted by
   * `rightOrderCol` before indexing, and equidistant candidates resolve
   * toward the smaller index, so ties ALWAYS break toward the smaller
   * `rightOrderCol` value. Left rows with null/invalid geometry emit
   * nothing (inner semantics).
   */
  def knnJoin(
      left: DataFrame,
      right: DataFrame,
      k: Int,
      rightOrderCol: String,
      leftGeom: String = "geometry",
      rightGeom: String = "geometry",
      lSuffix: String = "_left",
      rSuffix: String = "_right"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = left.sparkSession
    val rightSorted = right.orderBy(rightOrderCol)
    val bc = spark.sparkContext.broadcast(buildRowIndex(rightSorted, rightGeom))
    val outSchema = org.apache.spark.sql.types.StructType(
      left.schema.fields.map(f => f.copy(name = f.name + lSuffix)) ++
      right.schema.fields.map(f => f.copy(name = f.name + rSuffix, nullable = true)) ++
      Seq(org.apache.spark.sql.types.StructField("knn_rank", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("knn_dist", org.apache.spark.sql.types.DoubleType, nullable = false)))
    val lgIdx = left.schema.fieldIndex(leftGeom)
    val kk = k

    left.mapPartitions { it =>
      val idx = bc.value
      it.flatMap { lRow =>
        val b = lRow.get(lgIdx)
        val g = if (b == null) null else WKB.readOrNull(b.asInstanceOf[Array[Byte]])
        if (g == null || g.isEmpty) Iterator.empty
        else {
          val hits = idx.tree.nearestK(g.envelope, kk) { j =>
            val rg = idx.geoms(j)
            if (rg == null || rg.isEmpty) Double.NaN else Algos.distance(g, rg)
          }
          hits.iterator.zipWithIndex.map { case ((j, d), r) =>
            // Seq[Any]: Seq(int, double) would weak-lub both to Double
            org.apache.spark.sql.Row.fromSeq(
              lRow.toSeq ++ idx.rows(j).toSeq ++ Seq[Any](r + 1, d))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * Grid-partitioned join for two large sides: no driver materialization, no
   * broadcast. `cellSize` fixes the grid; rows are replicated to every cell
   * their envelope touches, the equi-join on cell co-partitions the work,
   * and duplicate pair hits are removed with a distinct on (lid, rid).
   */
  /**
   * Size-dispatching spatial join: broadcasts + STR-tree-probes when the
   * RIGHT side's optimizer size estimate fits under
   * `spark.sql.autoBroadcastJoinThreshold`, otherwise falls back to the
   * grid-partitioned shuffle join — the same decision Spark itself makes
   * between BroadcastHashJoin and SortMergeJoin, applied to the spatial
   * operator. Semantics are identical on both paths (SpatialJoinSpec pins
   * parity), so callers can "just join" and keep working when the dim
   * table grows past memory.
   */
  def autoJoin(
      left: DataFrame,
      right: DataFrame,
      cellSize: Double,
      predicate: Predicate = Predicate.Intersects,
      joinType: String = "inner",
      leftGeom: String = "geometry",
      rightGeom: String = "geometry",
      lSuffix: String = "_left",
      rSuffix: String = "_right",
      leftIdCol: Option[String] = None,
      rightIdCol: Option[String] = None): DataFrame = {
    val threshold = left.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val rightSmall = threshold > 0 &&
      right.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
    if (rightSmall)
      join(left, right, predicate, joinType, leftGeom, rightGeom, lSuffix, rSuffix)
    else
      gridJoin(left, right, cellSize, predicate, joinType, leftGeom, rightGeom,
        lSuffix, rSuffix, leftIdCol, rightIdCol)
  }

  def gridJoin(
      left: DataFrame,
      right: DataFrame,
      cellSize: Double,
      predicate: Predicate = Predicate.Intersects,
      joinType: String = "inner",
      leftGeom: String = "geometry",
      rightGeom: String = "geometry",
      lSuffix: String = "_left",
      rSuffix: String = "_right",
      leftIdCol: Option[String] = None,
      rightIdCol: Option[String] = None): DataFrame = {
    require(Set("inner", "left", "semi", "anti")(joinType),
      s"spatial join supports inner|left|semi|anti, got $joinType")
    val spark = left.sparkSession
    import spark.implicits._

    val lId = "__graft_lid"
    val rId = "__graft_rid"
    // Each side's row id is referenced by two sub-plans (the cell/pair branch
    // and the stitch branch). monotonically_increasing_id() is
    // nondeterministic, so recomputation between branches could mis-stitch:
    // use a caller-supplied stable unique key when available (free, fully
    // deterministic — the 100 TB path, where inputs carry primary keys),
    // otherwise pin the generated ids with an eager localCheckpoint (blocks
    // are ContextCleaner-released once the frame is unreachable, unlike a
    // persist() nothing ever unpersists).
    def tag(df: DataFrame, id: String, stable: Option[String]): DataFrame = stable match {
      case Some(c) => df.withColumn(id, col(c).cast("long"))
      case None    => df.withColumn(id, monotonically_increasing_id()).localCheckpoint()
    }
    val leftW = tag(left, lId, leftIdCol)
    val rightW = tag(right, rId, rightIdCol)

    def cells(df: DataFrame, id: String, geomCol: String): DataFrame =
      df.select(col(id), col(geomCol)).as[(Long, Array[Byte])]
        .flatMap { case (rowId, wkb) =>
          val g = if (wkb == null) null else WKB.readOrNull(wkb)
          if (g == null) Iterator.empty
          else {
            val e = g.envelope
            if (e.isEmpty) Iterator.empty
            else {
              val x0 = math.floor(e.minX / cellSize).toLong
              val x1 = math.floor(e.maxX / cellSize).toLong
              val y0 = math.floor(e.minY / cellSize).toLong
              val y1 = math.floor(e.maxY / cellSize).toLong
              for {
                cx <- (x0 to x1).iterator
                cy <- (y0 to y1).iterator
              } yield (rowId, (cx << 32) | (cy & 0xffffffffL), wkb)
            }
          }
        }.toDF(id, "__cell", "__wkb")

    // distinct wkb names per side: the pruning join below merges the two
    // lineages, so dataset-ref disambiguation (lc("__wkb")) stops working
    val lc0 = cells(leftW, lId, leftGeom).withColumnRenamed("__wkb", "__lwkb")
    val rc = cells(rightW, rId, rightGeom).withColumnRenamed("__wkb", "__rwkb")

    // Dynamic cell pruning (the spatial analogue of dynamic partition
    // pruning): when the right side occupies a bounded number of grid
    // cells (limit-probed), broadcast its DISTINCT cell set and filter
    // the left expanded table with a broadcast join BEFORE the cell
    // shuffle. A regional right side joined against a planet-scale left
    // then shuffles only the region's rows instead of everything; rows
    // pruned here could never produce a pair, so inner AND left results
    // are unchanged (left-outer null-fill happens in stitch from the
    // full left side). Costs one narrow scan of the right side + a
    // <=8B-per-cell broadcast; disable with graft.gridjoin.pruneMaxCells=0.
    // Default gate: the probe (one narrow right-side scan + a count job) only
    // pays off when the right side is big enough that shuffling un-pruned
    // left rows would dominate it. When the optimizer estimates the right
    // side under the broadcast threshold the whole join is already small —
    // skip the probe (a measured ~2x overhead on sf0.1-sized joins). An
    // EXPLICIT graft.gridjoin.pruneMaxCells setting always wins, both ways.
    val pruneMax = spark.conf.getOption("graft.gridjoin.pruneMaxCells")
      .map(_.toLong).getOrElse {
        val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
        val rightSmall = thr > 0 &&
          right.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
        if (rightSmall) 0L else 4000000L
      }
    // Hot-cell salting is OPT-IN (0 = off): its detection needs per-cell
    // counts of BOTH sides — one extra decode pass over each cell
    // expansion — which is worth paying when a profile (tools/SkewBench)
    // shows quadratic cells, not on every join. Same posture as Spark's
    // own skew-join knobs: the byte-skew case is already covered by AQE;
    // this flag covers the byte-LIGHT quadratic case AQE cannot see.
    val saltThresh = spark.conf.getOption("graft.gridjoin.hotCellPairs")
      .map(_.toLong).getOrElse(0L)
    // ONE per-cell count pass over the right side serves BOTH pruning and
    // hot-cell detection (map-side combined, <= one row per occupied
    // cell — bounded by a sanely-sized grid, not by the data).
    // localCheckpoint FIRST so the probe and both consumers read the
    // materialized metadata table instead of re-decoding the right side.
    val rCntPinned: Option[DataFrame] =
      if (pruneMax <= 0 && saltThresh <= 0) None
      else Some(rc.groupBy("__cell").agg(count(lit(1)).as("__rcnt")).localCheckpoint())
    // Int-range guard mirrors Quantiles.BuiltinMaxRowsKey: a huge
    // user-set cap means "prune with a bounded probe", not an overflowed
    // negative limit()
    val pruneCap = math.min(pruneMax, (Int.MaxValue - 1).toLong)
    val lc = rCntPinned match {
      case Some(rCnt) if pruneMax > 0 &&
          rCnt.limit((pruneCap + 1).toInt).count() <= pruneCap =>
        lc0.join(broadcast(rCnt.select("__cell")), "__cell")
      case _ => lc0
    }

    // Hot-cell salting: a cell dense on BOTH sides is a quadratic refine
    // bomb that byte-based AQE skew-split cannot see (the cell's bytes
    // are tiny, its l*r candidate count is not — measured in
    // tools/SkewBench). Detect cells whose candidate-pair product
    // exceeds `saltThresh` from the two metadata-sized per-cell counts,
    // then split them k ways (k = ceil(pairs/thresh), capped 64): each
    // left row keeps ONE deterministic salt (xxhash64 of its id), the
    // right row is replicated to all k, so every candidate pair still
    // meets exactly once and per-task refine work is bounded. Cold cells
    // pay nothing (salt 0 both sides via the broadcast left join).
    // Enable with graft.gridjoin.hotCellPairs=<max pairs per task>.
    val (lcS, rcS, joinKeys) =
      if (saltThresh <= 0) (lc, rc, Seq("__cell"))
      else {
        val rCnt = rCntPinned.get // saltThresh > 0 forces the pinned table
        val lCnt = lc.groupBy("__cell").agg(count(lit(1)).as("__lcnt"))
        val hot = lCnt.join(rCnt, "__cell")
          .where(col("__lcnt") * col("__rcnt") > saltThresh)
          .select(col("__cell"),
            least(lit(64L), ceil(col("__lcnt") * col("__rcnt") / lit(saltThresh.toDouble))
              .cast("long")).as("__k"))
          .limit(65537).collect()
        require(hot.length <= 65536,
          "more than 65536 hot grid cells — the grid is mis-sized for this " +
            "density; shrink cellSize instead of salting everything")
        if (hot.isEmpty) (lc, rc, Seq("__cell"))
        else {
          val hotDf = broadcast(
            spark.createDataFrame(spark.sparkContext.parallelize(hot.toSeq, 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("__cell", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("__k", org.apache.spark.sql.types.LongType)))))
          // explicit repartition with a PINNED partition count: the salt
          // buckets are byte-light by construction, so AQE's byte-based
          // partition coalescing would merge them straight back into one
          // task — a user-specified repartition(n, cols) is exempt from
          // coalescing and co-partitions both sides for the join
          val nShuffle = spark.sessionState.conf.numShufflePartitions
          val l2 = lc.join(hotDf, Seq("__cell"), "left")
            .withColumn("__salt", pmod(xxhash64(col(lId)), coalesce(col("__k"), lit(1L))))
            .drop("__k")
            .repartition(nShuffle, col("__cell"), col("__salt"))
          val r2 = rc.join(hotDf, Seq("__cell"), "left")
            .withColumn("__salt",
              explode(sequence(lit(0L), coalesce(col("__k"), lit(1L)) - 1)))
            .drop("__k")
            .repartition(nShuffle, col("__cell"), col("__salt"))
          (l2, r2, Seq("__cell", "__salt"))
        }
      }
    val pred = predicate
    val cs = cellSize
    // Reference-point dedup: a pair whose envelopes both touch k cells meets
    // k times after the cell equi-join; instead of a distinct() (a second
    // full shuffle of the pair table), emit the pair only in the ONE cell
    // holding the min corner of the envelope intersection — that corner lies
    // in both envelopes, so both rows were replicated there, and it belongs
    // to exactly one cell.
    val refineUdf = udf { (cell: Long, a: Array[Byte], b: Array[Byte]) =>
      val ga = WKB.readOrNull(a); val gb = WKB.readOrNull(b)
      ga != null && gb != null && {
        val ea = ga.envelope; val eb = gb.envelope
        val refCell = cellId(
          math.floor(math.max(ea.minX, eb.minX) / cs).toLong,
          math.floor(math.max(ea.minY, eb.minY) / cs).toLong)
        refCell == cell && refine(pred, ga, gb)
      }
    }
    val pairs = lcS.join(rcS, joinKeys)
      .filter(refineUdf(col("__cell"), col("__lwkb"), col("__rwkb")))
      .select(col(lId), col(rId).as(rId + "_p"))

    // semi/anti on the grid path: the matched-lid set replaces the
    // stitch — same output contract as the broadcast path (left columns
    // only, unsuffixed), so autoJoin's dispatch stays semantics-free
    if (joinType == "semi" || joinType == "anti")
      leftW.join(pairs.select(lId).distinct(),
        Seq(lId), if (joinType == "semi") "leftsemi" else "leftanti").drop(lId)
    else stitch(leftW, rightW, pairs, joinType, lId, rId, lSuffix, rSuffix)
  }

  /** Reassemble full rows from the (lid, rid) pair table — two equi-joins,
    * suffixing every user column like spatial_index.rs:164-184. */
  private def stitch(
      leftW: DataFrame, rightW: DataFrame, pairs: DataFrame,
      joinType: String, lId: String, rId: String,
      lSuffix: String, rSuffix: String): DataFrame = {
    val lRenamed = leftW.columns.foldLeft(leftW) { (df, c) =>
      if (c == lId) df else df.withColumnRenamed(c, c + lSuffix)
    }
    val rRenamed = rightW.columns.foldLeft(rightW) { (df, c) =>
      if (c == rId) df else df.withColumnRenamed(c, c + rSuffix)
    }
    val pairJoinType = if (joinType == "left") "left" else "inner"
    lRenamed
      .join(pairs, Seq(lId), pairJoinType)
      .join(rRenamed, col(rId + "_p") === col(rId), pairJoinType)
      .drop(lId, rId, rId + "_p")
  }
}
