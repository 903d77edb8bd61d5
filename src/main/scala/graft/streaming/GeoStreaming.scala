package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.geom.{Geometry => Geom, _}
import graft.spatial.STRtree

/**
 * Structured Streaming surface (SURVEY §2.10 — capability extension; the
 * reference is batch-only).
 *
 * Every st_* expression is stateless, so the whole scalar surface already
 * works unchanged in `readStream.select/filter(...)`. This module adds the
 * pieces that need streaming-specific shape:
 *
 *  - [[streamStaticSpatialJoin]]: the streaming analog of the broadcast
 *    spatial join — the static side is indexed ONCE into a broadcast R-tree,
 *    each micro-batch probes it with a stateless mapPartitions; no state
 *    store, no watermark requirement, arbitrarily long-running.
 *  - [[windowedCount]]: tumbling/sliding event-time windows with a
 *    watermark (late data dropped after `delay`).
 *  - [[runningEnvelope]]: per-key streaming geometry state via
 *    mapGroupsWithState — maintains the bbox-union of everything seen per
 *    key, the streaming twin of st_envelope_agg.
 */
object GeoStreaming {

  /**
   * Stream-static spatial join (inner | left). The static side is collected
   * and indexed at query definition; output columns are the stream columns
   * plus the static columns suffixed `staticSuffix` on name collision.
   */
  def streamStaticSpatialJoin(
      stream: DataFrame,
      static: DataFrame,
      predicate: graft.spatial.SpatialJoin.Predicate = graft.spatial.SpatialJoin.Predicate.Intersects,
      joinType: String = "inner",
      streamGeom: String = "geometry",
      staticGeom: String = "geometry",
      staticSuffix: String = "_static"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"inner|left only, got $joinType")
    val spark = stream.sparkSession
    val bc = spark.sparkContext.broadcast(
      graft.spatial.SpatialJoin.buildRowIndex(static, staticGeom))

    val streamNames = stream.schema.fieldNames.toSet
    val staticOutFields = static.schema.fields.map { f =>
      if (streamNames.contains(f.name)) f.copy(name = f.name + staticSuffix, nullable = true)
      else f.copy(nullable = true)
    }
    val outSchema = StructType(stream.schema.fields ++ staticOutFields)
    val gIdx = stream.schema.fieldIndex(streamGeom)
    val pred = predicate
    val leftJoin = joinType == "left"
    val nStatic = staticOutFields.length

    stream.mapPartitions { it =>
      val idx = bc.value
      it.flatMap(graft.spatial.SpatialJoin.probeRow(
        _, gIdx, idx, graft.spatial.SpatialJoin.refine(pred, _, _), leftJoin, nStatic))
    }(Encoders.row(outSchema))
  }

  /**
   * Watermarked tumbling/sliding window counts per key:
   * `windowedCount(events, "ts", "10 minutes", "5 minutes", $"event_type")`.
   */
  def windowedCount(
      stream: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: keys): _*)
      .agg(count(lit(1)).as("n"))

  /**
   * Stream-stream spatial join (inner), the windowed extension SURVEY §2.10
   * deferred: rows from the two streams pair when their geometries'
   * envelopes share a grid cell, their event times are within
   * `timeConstraintSecs`, and the exact predicate holds.
   *
   * Scalable shape: each side is exploded to the grid cells its envelope
   * covers, so the join key is (cell) equality plus the event-time range —
   * exactly what Spark's watermarked symmetric stream-stream join needs to
   * bound state. Pairs that meet in several cells are deduped downstream by
   * the caller if needed (each emitted row carries both ids).
   */
  def streamStreamSpatialJoin(
      left: DataFrame,
      right: DataFrame,
      cellSize: Double,
      leftTs: String,
      rightTs: String,
      watermarkDelay: String,
      timeConstraintSecs: Long,
      predicate: graft.spatial.SpatialJoin.Predicate = graft.spatial.SpatialJoin.Predicate.Intersects,
      leftGeom: String = "geometry",
      rightGeom: String = "geometry"): DataFrame = {
    def cells(df: DataFrame, geom: String, side: String): DataFrame = {
      val cellExpr =
        s"""flatten(transform(
           |  sequence(cast(floor(st_xmin($geom) / $cellSize) as long),
           |           cast(floor(st_xmax($geom) / $cellSize) as long)),
           |  cx -> transform(
           |    sequence(cast(floor(st_ymin($geom) / $cellSize) as long),
           |             cast(floor(st_ymax($geom) / $cellSize) as long)),
           |    cy -> cx * 4294967296L + (cy & 4294967295L))))""".stripMargin
      df.withColumn(s"__cell_$side", explode(expr(cellExpr)))
    }
    val pred = predicate
    // general st_* predicate semantics (not the reference's join-refine
    // matrix, which has no point-point row): intersects/contains via Algos
    val refineUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
      val ga = WKB.readOrNull(a); val gb = WKB.readOrNull(b)
      ga != null && gb != null && (pred match {
        case graft.spatial.SpatialJoin.Predicate.Intersects => Algos.intersects(ga, gb)
        case graft.spatial.SpatialJoin.Predicate.Contains   => Algos.contains(ga, gb)
      })
    }
    val l = cells(left.withWatermark(leftTs, watermarkDelay), leftGeom, "l")
    val r = cells(right.withWatermark(rightTs, watermarkDelay), rightGeom, "r")
    l.join(r,
      col("__cell_l") === col("__cell_r") &&
      col(rightTs).between(
        col(leftTs) - expr(s"INTERVAL $timeConstraintSecs SECONDS"),
        col(leftTs) + expr(s"INTERVAL $timeConstraintSecs SECONDS")) &&
      refineUdf(l(leftGeom), r(rightGeom)),
      "inner")
      .drop("__cell_l", "__cell_r")
  }

  /**
   * Stream-stream TEMPORAL proximity join: all pairs with
   * |left.ts - right.ts| <= toleranceSecs (plus optional equi keys).
   *
   * Same 1-D bin rewrite as the batch `RangeJoin.selfProximity`: both
   * sides carry a time-bin equi key (bin width = tolerance; the right
   * side replicates into {bin-1, bin, bin+1}), so the stateful join
   * co-partitions on the bin instead of holding a cross-product, and the
   * watermark + BETWEEN constraint bound the symmetric state. A
   * within-tolerance pair shares EXACTLY one bin key (left keeps a single
   * bin), so no post-join dedup is needed.
   */
  def streamProximityJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      toleranceSecs: Long,
      watermarkDelay: String,
      extraKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(toleranceSecs > 0, "tolerance must be positive")
    val binL = expr(s"floor(unix_micros($leftTs) / ${toleranceSecs * 1000000L})")
    val binR = expr(s"floor(unix_micros($rightTs) / ${toleranceSecs * 1000000L})")
    val l = left.withWatermark(leftTs, watermarkDelay).withColumn("__bin_l", binL)
    val r = right.withWatermark(rightTs, watermarkDelay)
      .withColumn("__bin_r", explode(array(binR - 1, binR, binR + 1)))
    val keyCond = extraKeys.map { case (a, b) => l(a) === r(b) }
      .foldLeft(col("__bin_l") === col("__bin_r"))(_ && _)
    l.join(r,
      keyCond &&
      col(rightTs).between(
        col(leftTs) - expr(s"INTERVAL $toleranceSecs SECONDS"),
        col(leftTs) + expr(s"INTERVAL $toleranceSecs SECONDS")),
      "inner")
      .drop("__bin_l", "__bin_r")
  }

  /**
   * Left-outer variant of [[streamProximityJoin]]: left rows with no
   * partner within the tolerance emit null-padded once the watermark
   * passes their join window (Spark's watermarked stream-stream outer
   * join; the bin equi-key plus the event-time range condition satisfy
   * the state-cleanup requirements). The exploded 3-bin right side never
   * duplicates a left row — a pair agrees on exactly one bin value.
   */
  def streamProximityJoinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      toleranceSecs: Long,
      watermarkDelay: String): DataFrame = {
    require(toleranceSecs > 0, "tolerance must be positive")
    val binL = expr(s"floor(unix_micros($leftTs) / ${toleranceSecs * 1000000L})")
    val binR = expr(s"floor(unix_micros($rightTs) / ${toleranceSecs * 1000000L})")
    val l = left.withWatermark(leftTs, watermarkDelay).withColumn("__bin_l", binL)
    val r = right.withWatermark(rightTs, watermarkDelay)
      .withColumn("__bin_r", explode(array(binR - 1, binR, binR + 1)))
    l.join(r,
      col("__bin_l") === col("__bin_r") &&
      col(rightTs).between(
        col(leftTs) - expr(s"INTERVAL $toleranceSecs SECONDS"),
        col(leftTs) + expr(s"INTERVAL $toleranceSecs SECONDS")),
      "left_outer")
      .drop("__bin_l", "__bin_r")
  }

  private val envSchema = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))

  /**
   * Streaming per-key envelope union (st_envelope_agg over an unbounded
   * stream): emits the updated (key, xmin, ymin, xmax, ymax) whenever a key
   * sees new data. State per key is 4 doubles — O(distinct keys) total.
   */
  def runningEnvelope(stream: DataFrame, keyCol: String, geomCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val kIdx = stream.schema.fieldIndex(keyCol)
    val gIdx = stream.schema.fieldIndex(geomCol)

    stream
      .groupByKey(_.getString(kIdx))
      .mapGroupsWithState[(Double, Double, Double, Double), (String, Double, Double, Double, Double)] {
        (key: String, rows: Iterator[Row], state: GroupState[(Double, Double, Double, Double)]) =>
          var env = state.getOption
            .map { case (x0, y0, x1, y1) => Envelope(x0, y0, x1, y1) }
            .getOrElse(Envelope.empty)
          rows.foreach { r =>
            val b = r.get(gIdx)
            val g = if (b == null) null else WKB.readOrNull(b.asInstanceOf[Array[Byte]])
            if (g != null) env = env.expand(g.envelope)
          }
          state.update((env.minX, env.minY, env.maxX, env.maxY))
          (key, env.minX, env.minY, env.maxX, env.maxY)
      }
      .toDF(keyCol, "xmin", "ymin", "xmax", "ymax")
  }

  /**
   * Event-time sessionization with gap timeout — the flatMapGroupsWithState
   * + EventTimeTimeout pattern (the streaming twin of q121's batch session
   * windows, and of [[graft.pipeline.Sessionize]]).
   *
   * Correctness under reordering: a session is NEVER emitted while the
   * watermark could still admit an event that extends (or prepends to)
   * it. State holds ALL open sessions for the key, sorted; each event
   * merges into any session within `gapSecs` on EITHER side (bridging
   * events merge two sessions into one), so cross-batch disorder inside
   * the watermark delay lands in the right session with the right
   * boundaries. A session is emitted — exactly once, append-mode — only
   * when the watermark passes sessionEnd + gap, at which point no
   * admissible event (t >= watermark) can touch it. State is O(active
   * sessions per key), bounded by watermarkDelay / gap + 1.
   *
   * Output: (key, session_start, session_end, n_events), epoch seconds.
   */
  /**
   * Streaming per-key anomaly detection: maintain Welford running
   * mean/variance per key via flatMapGroupsWithState and flag values more
   * than `zThreshold` standard deviations from the mean seen SO FAR
   * (state BEFORE the incoming value — a point can't vouch for itself).
   * The streaming companion of the batch seasonal/z-score queries
   * (q284/q293): constant state per key (n, mean, M2 — three doubles),
   * no watermark requirement, emission per event in arrival order with
   * a (ts, value) in-batch sort for determinism.
   *
   * First `minN` observations of a key never flag (the variance
   * estimate is meaningless below a few points).
   */
  def runningZScore(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      zThreshold: Double,
      minN: Long = 5L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val kIdx = stream.schema.fieldIndex(keyCol)
    val tIdx = stream.schema.fieldIndex(tsCol)
    val vIdx = stream.schema.fieldIndex(valueCol)
    stream.groupByKey(_.getString(kIdx))
      .flatMapGroupsWithState[(Long, Double, Double), (String, Long, Double, Double, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Row], state: GroupState[(Long, Double, Double)]) =>
          var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          val sorted = rows.map(r => (r.getTimestamp(tIdx).getTime, r.getDouble(vIdx)))
            .toSeq.sortBy(identity)
          val out = sorted.map { case (tsMs, v) =>
            val sd = if (n >= 2) math.sqrt(m2 / (n - 1)) else 0.0
            val z = if (n >= minN && sd > 0) (v - mean) / sd else 0.0
            val flag = n >= minN && sd > 0 && math.abs(z) > zThreshold
            // Welford update AFTER scoring
            n += 1
            val d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            (key, tsMs / 1000, v, math.rint(z * 1e6) / 1e6, flag)
          }
          state.update((n, mean, m2))
          out.iterator
      }
      .toDF(keyCol, "ts_sec", "value", "z", "is_anomaly")
  }

  /**
   * Streaming SCD2 (slowly-changing-dimension type 2) maintenance: per
   * business key, hold the open version (status, since) plus a pending
   * buffer of not-yet-final events; once the watermark passes an event it
   * is applied in event-time order (later-arriving earlier events are
   * dropped by withWatermark, so the order is final at that point). A
   * status change CLOSES the open version and emits it as
   * (key, status, valid_from_sec, valid_to_sec); consecutive same-status
   * events compress away — the append-mode streaming twin of the q440
   * batch reconstruction. State per key = one open version + the
   * watermark-bounded pending buffer, so state size is delay-bounded and
   * independent of history length.
   */
  def scd2Stream(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      statusCol: String,
      watermarkDelay: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val wm = stream.withWatermark(tsCol, watermarkDelay)
    val kIdx = stream.schema.fieldIndex(keyCol)
    val tIdx = stream.schema.fieldIndex(tsCol)
    val sIdx = stream.schema.fieldIndex(statusCol)
    wm.groupByKey(_.getString(kIdx))
      .flatMapGroupsWithState[(List[(Long, String)], Option[(String, Long)]),
        (String, String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[Row],
         state: GroupState[(List[(Long, String)], Option[(String, Long)])]) =>
          var (pending, open) = state.getOption
            .getOrElse((Nil: List[(Long, String)], None: Option[(String, Long)]))
          rows.foreach { r =>
            pending = (r.getTimestamp(tIdx).getTime, r.getString(sIdx)) :: pending
          }
          // events strictly below the watermark are final (an equal-ts
          // straggler may still arrive, so those stay buffered)
          val wmMs = state.getCurrentWatermarkMs()
          val (ready, hold) = pending.partition(_._1 < wmMs)
          val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long, Long)]
          ready.sortBy(identity).foreach { case (t, st) =>
            open match {
              case Some((cur, since)) if cur != st =>
                out += ((key, cur, since / 1000, t / 1000))
                open = Some((st, t))
              case Some(_) => // same status: SCD2 compression, no new version
              case None => open = Some((st, t))
            }
          }
          if (hold.isEmpty && open.isEmpty) state.remove()
          else {
            state.update((hold, open))
            if (hold.nonEmpty)
              state.setTimeoutTimestamp(math.max(hold.map(_._1).min + 1, wmMs + 1))
          }
          out.iterator
      }
      .toDF(keyCol, "status", "valid_from", "valid_to")
  }

  def sessionize(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSecs: Long,
      watermarkDelay: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val wm = stream.withWatermark(tsCol, watermarkDelay)
    val kIdx = stream.schema.fieldIndex(keyCol)
    val tIdx = stream.schema.fieldIndex(tsCol)
    val gapMs = gapSecs * 1000L

    // state: open sessions as sorted (startMs, endMs, nEvents)
    wm.groupByKey(_.getString(kIdx))
      .flatMapGroupsWithState[List[(Long, Long, Long)], (String, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[Row], state: GroupState[List[(Long, Long, Long)]]) =>
          var sessions: List[(Long, Long, Long)] = state.getOption.getOrElse(Nil)

          rows.foreach { r =>
            val t = r.getTimestamp(tIdx).getTime
            // partition into (before, touching, after) — touching = within
            // gap on either side; a bridging event merges them all
            val (touch, rest) = sessions.partition { case (s, e, _) =>
              t >= s - gapMs && t <= e + gapMs
            }
            val merged: (Long, Long, Long) =
              if (touch.isEmpty) (t, t, 1L)
              else (math.min(t, touch.map(_._1).min),
                math.max(t, touch.map(_._2).max),
                touch.map(_._3).sum + 1L)
            sessions = (merged :: rest).sortBy(_._1)
          }

          // emit every session no admissible event can still touch
          val wmMs = state.getCurrentWatermarkMs()
          val (expired, open) = sessions.partition { case (_, e, _) => e + gapMs < wmMs }
          if (open.nonEmpty) {
            state.update(open)
            // earliest close instant among open sessions; clamped one ms
            // past the watermark for the e+gap == wm boundary (still open
            // there: an event AT the watermark may touch it)
            state.setTimeoutTimestamp(math.max(open.map(_._2).min + gapMs, wmMs + 1))
          } else state.remove()
          expired.sortBy(_._1)
            .map { case (s, e, n) => (key, s / 1000, e / 1000, n) }.iterator
      }
      .toDF(keyCol, "session_start", "session_end", "n_events")
  }
}
