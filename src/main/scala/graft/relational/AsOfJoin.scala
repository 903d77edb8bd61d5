package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed as-of (temporal alignment) join.
 *
 * For every left row, find the single right row with the same key whose
 * time is the latest one `<=` the left time (direction = backward), or the
 * earliest one `>=` it (forward). This is the standard event/feature
 * alignment primitive in training-data pipelines (align labels to the most
 * recent feature snapshot, events to the last order, ticks to quotes).
 *
 * Spark has no native as-of join; the naive formulation
 * (`JOIN ON key AND r.t <= l.t` + windowed max) joins every left row to ALL
 * earlier right rows first — O(n*m) per key — before discarding all but one.
 *
 * This implementation is the union + ordered-window rewrite:
 *
 *   1. tag right rows 0 / left rows 1 and union them into one relation
 *      (right carries a payload struct, left carries its row struct);
 *   2. one hash shuffle on the key, sort within partition by
 *      (time, tag, tieBreak) — a single window sort, NOT a join;
 *   3. `last(payload, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
 *      hands each left row exactly the latest right payload at or before
 *      its time (ties between right rows resolved by the LAST tieBreak
 *      value in ascending order, i.e. the max);
 *   4. keep left rows, unpack the payload, apply the optional tolerance.
 *
 * Cost at scale: ONE shuffle of left+right on the key and a per-partition
 * sort — the same price as a SortMergeJoin, with no intermediate pair
 * blow-up and O(1) window state per row. 100 TB note: parallelism is
 * bounded by the key cardinality (windows never split a key); for few hot
 * keys, pre-split left by time range and align each split against the
 * right rows of its range.
 */
object AsOfJoin {

  /** Direction of the as-of lookup. */
  sealed trait Direction
  /** Latest right row with rightTime <= leftTime. */
  case object Backward extends Direction
  /** Earliest right row with rightTime >= leftTime. */
  case object Forward extends Direction

  /**
   * As-of join `left` with `right`.
   *
   * @param leftKeys / rightKeys  equi keys (same length, positional match)
   * @param leftTime / rightTime  ordering columns (numeric or timestamp)
   * @param payloadCols  right columns to attach to each left row (emitted
   *                     under these names; must not clash with left names)
   * @param tieBreak     right column breaking timestamp ties — the row with
   *                     the LARGEST tieBreak value wins (deterministic)
   * @param tolerance    optional max |leftTime - rightTime| as a Column on
   *                     the time column's difference domain; matches beyond
   *                     it are nulled out
   * @param joinType     "left" keeps unmatched left rows with null payload;
   *                     "inner" drops them
   */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreak: Option[String] = None,
      tolerance: Option[Column] = None,
      direction: Direction = Backward,
      joinType: String = "left"): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
      "as-of join needs at least one equi key")
    require(joinType == "left" || joinType == "inner",
      s"as-of join supports left|inner, got $joinType")

    val leftCols = left.columns.toSeq
    val keyNames = leftKeys.indices.map(i => s"__k$i")

    // Right side: keys + time + tie + payload struct. SQL equi-join
    // semantics: a NULL key or NULL time can never match, so those right
    // rows are dropped up front (otherwise Window.partitionBy would group
    // null keys together and hand them to null-key left rows).
    val rightSlim = right.select(
      rightKeys.zip(keyNames).map { case (c, k) => col(c).as(k) } ++
        Seq(col(rightTime).cast(left.schema(leftTime).dataType).as("__t"),
          coalesce(tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)), lit(Long.MinValue)).as("__tie"),
          struct(col(rightTime).as("__rt") +: payloadCols.map(col): _*).as("__payload"),
          lit(0).as("__tag"),
          lit(null).cast(structType(left)).as("__row")): _*)
      .filter(keyNames.map(col(_).isNotNull).reduce(_ && _) && col("__t").isNotNull)

    val leftSlim = left.select(
      leftKeys.zip(keyNames).map { case (c, k) => col(c).as(k) } ++
        Seq(col(leftTime).as("__t"),
          lit(0L).as("__tie"),
          lit(null).cast(rightSlim.schema("__payload").dataType).as("__payload"),
          lit(1).as("__tag"),
          struct(leftCols.map(col): _*).as("__row")): _*)

    val unioned = rightSlim.unionByName(leftSlim)

    // Backward: ascending scan, right rows (tag 0) sort before left rows at
    // equal time, so an exact-time right row IS visible to the left row.
    // Forward: descending scan, same tag order keeps exact-time matches.
    // Null left times sort FIRST in both scans (before any right row), so
    // a NULL time never matches — mirroring SQL comparison semantics.
    val ordering: Seq[Column] = direction match {
      case Backward => Seq(col("__t").asc_nulls_first, col("__tag").asc, col("__tie").asc)
      case Forward  => Seq(col("__t").desc_nulls_first, col("__tag").asc, col("__tie").asc)
    }
    val w = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withMatch = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val tolOk = tolerance match {
      case Some(tol) =>
        val dt = direction match {
          case Backward => col("__t") - col("__match.__rt")
          case Forward  => col("__match.__rt") - col("__t")
        }
        col("__match").isNotNull && dt <= tol
      case None => col("__match").isNotNull
    }
    val guarded = withMatch.withColumn("__match",
      when(tolOk, col("__match")).otherwise(lit(null)))

    val filtered = if (joinType == "inner") guarded.filter(col("__match").isNotNull) else guarded

    filtered.select(
      leftCols.map(c => col(s"__row.`$c`").as(c)) ++
        payloadCols.map(c => col(s"__match.`$c`").as(c)): _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  /**
   * Broadcast as-of LOOKUP — the streaming-safe variant of [[join]] for a
   * SMALL right side (a dimension/feature snapshot table, the broadcast
   * join regime).
   *
   * The right side is collected once into (key, time)-sorted primitive
   * arrays plus a parallel payload-row array, all in ONE broadcast; each
   * left row resolves its match with an executor-local binary search
   * (latest right time <= left time, ties by the largest tieBreak) and
   * returns the payload struct directly — no join operator at all, so
   * the plan is a single projection. Completely STATELESS per row — no shuffle, no
   * window, no streaming state — so the same call enriches a Structured
   * Streaming DataFrame (stream-static as-of) or a batch one.
   *
   * Key and time columns must be integral/timestamp-free on the caller
   * side: pass LONG expressions (cast timestamps with unix_micros).
   *
   * GUARDED: the build side is collected to the driver, so it is bounded by
   * `maxBuildRows` (default from `graft.asof.lookupMaxRows`, 1M). A larger
   * right side auto-dispatches to the shuffle [[join]] — same semantics
   * (backward, left, max-tieBreak ties), one shuffle instead of a driver
   * collect — mirroring SpatialJoin.autoJoin's broadcast/grid dispatch.
   * Callers that need the stateless row-lookup shape regardless (stream
   * enrichment, where a shuffle window is not an option) should size
   * `maxBuildRows` explicitly to what the driver can hold.
   */
  def broadcastLookup(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      payloadCols: Seq[String],
      tieBreak: Option[String] = None,
      maxBuildRows: Int = -1): DataFrame = {
    val spark = right.sparkSession
    val buildCap =
      if (maxBuildRows > 0) maxBuildRows
      else spark.conf.getOption("graft.asof.lookupMaxRows").map(_.toInt).getOrElse(1000000)

    // Collect (key, time, tie, payload) ONCE and derive both the search
    // index and the rid->payload table from the same driver-side array —
    // recomputing ids in a second Spark action could order duplicate sort
    // keys differently between actions.
    // Null keys/times can never match (SQL semantics) and would NPE the
    // driver-side getLong sort: drop them; null tie-breaks lose ties.
    val tieCol = coalesce(tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)), lit(Long.MinValue))
    val prepared = right
      .withColumn("__k", rightKey.cast("long"))
      .withColumn("__rt", rightTime.cast("long"))
      .withColumn("__tb", tieCol)
      .filter(col("__k").isNotNull && col("__rt").isNotNull)
    // cap+1 probe: CollectLimit pulls partitions incrementally, so an
    // oversized build side costs one truncated scan, not a full collect.
    // (Measured at sf0.1: the probe is CHEAPER warm than a count-first
    // guard + separate parallel collect — 0.35 s vs 0.49 s — because the
    // probe's collect IS the build fetch.)
    val probed = prepared
      .select(col("__k"), col("__rt"), col("__tb"),
        struct(payloadCols.map(col): _*).as("__p"))
      .limit(buildCap + 1)
      .collect()
    if (probed.length > buildCap) {
      // too big to broadcast-index: route to the shuffle as-of join on the
      // same cast-to-long key/time domains
      val l2 = left
        .withColumn("__bk", leftKey.cast("long"))
        .withColumn("__bt", leftTime.cast("long"))
      val r2 = right
        .withColumn("__bk", rightKey.cast("long"))
        .withColumn("__bt", rightTime.cast("long"))
      return join(l2, r2, Seq("__bk"), Seq("__bk"), "__bt", "__bt",
        payloadCols, tieBreak).drop("__bk", "__bt")
    }
    // Sort an index array over primitive (k, t, tb) columns instead of
    // sortBy on boxed tuples (tuple boxing measured at ~0.29 s for a
    // 150k-row build side — as large as the collect itself).
    val nProbe = probed.length
    val pk = new Array[Long](nProbe)
    val pt = new Array[Long](nProbe)
    val pb = new Array[Long](nProbe)
    var pi = 0
    while (pi < nProbe) {
      pk(pi) = probed(pi).getLong(0); pt(pi) = probed(pi).getLong(1)
      pb(pi) = probed(pi).getLong(2); pi += 1
    }
    val order = new Array[Integer](nProbe)
    pi = 0
    while (pi < nProbe) { order(pi) = Integer.valueOf(pi); pi += 1 }
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val i = a.intValue(); val j = b.intValue()
        var c = java.lang.Long.compare(pk(i), pk(j))
        if (c == 0) c = java.lang.Long.compare(pt(i), pt(j))
        if (c == 0) c = java.lang.Long.compare(pb(i), pb(j))
        c
      }
    })
    val collected = new Array[org.apache.spark.sql.Row](nProbe)
    pi = 0
    while (pi < nProbe) { collected(pi) = probed(order(pi).intValue()); pi += 1 }

    // Flat primitive index: (keys, times) sorted by (key, time, tieBreak),
    // rid = position in the sorted array. Two executor-side binary
    // searches (key range, then time within it) replace the former
    // Map[Long, (Array, Array)] — which cost a boxed driver groupBy plus
    // Java-serializing ~|keys| small objects per broadcast (measured as
    // the dominant q75 term); two long arrays serialize as 16 bytes/row.
    val n = collected.length
    val ks = new Array[Long](n)
    val ts2 = new Array[Long](n)
    var ci = 0
    while (ci < n) {
      ks(ci) = collected(ci).getLong(0); ts2(ci) = collected(ci).getLong(1); ci += 1
    }
    // Ship the payload rows inside the SAME broadcast and return the
    // matched payload struct straight from the probe UDF: one broadcast,
    // zero join operators. (The former rid -> LocalRelation ->
    // broadcast-hash-join indirection rebuilt a 150k-row HashedRelation
    // per query — measured ~0.3 s of the q75 total.)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    val payloadSchema = StructType(payloadCols.map(nm => prepared.schema(nm)))
    val payloadRows = new Array[Row](n)
    var ri = 0
    while (ri < n) { payloadRows(ri) = collected(ri).getStruct(3); ri += 1 }
    val bc = spark.sparkContext.broadcast((ks, ts2, payloadRows))

    // Java UDF API: the Scala closure form cannot declare a Row return
    // schema (untyped Scala UDFs are rejected by default).
    val lookup = udf(new org.apache.spark.sql.api.java.UDF2[java.lang.Long, java.lang.Long, Row] {
      override def call(k: java.lang.Long, t: java.lang.Long): Row = {
        if (k == null || t == null) return null
        val (keys, times, payload) = bc.value
        // lower bound of k
        var lo = 0; var hi = keys.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (keys(mid) < k) lo = mid + 1 else hi = mid
        }
        val start = lo
        // upper bound of k
        hi = keys.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (keys(mid) <= k) lo = mid + 1 else hi = mid
        }
        val end = lo
        if (start >= end) return null
        // last slot in [start, end) with times(i) <= t (ties sorted
        // tieBreak-ascending, so the last qualifying slot carries the
        // max tieBreak)
        var l2 = start; var h2 = end - 1; var ans = -1
        while (l2 <= h2) {
          val mid = (l2 + h2) >>> 1
          if (times(mid) <= t) { ans = mid; l2 = mid + 1 } else h2 = mid - 1
        }
        if (ans < 0) null else payload(ans)
      }
    }, payloadSchema)

    val probeCol = lookup(leftKey.cast("long"), leftTime.cast("long"))
    // withColumn REPLACES a same-named left column silently; the join-based
    // fallback path keeps both sides, so a collision here would change
    // semantics depending on which path dispatch picked. Fail loud instead.
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"as-of payload columns ${clash.mkString(", ")} collide with left-side " +
        "columns; rename or drop them on one side before the join")
    val withPayload = left.withColumn("__p", probeCol)
    payloadCols.foldLeft(withPayload) { (df, nm) =>
        df.withColumn(nm, col("__p").getField(nm))
      }
      .drop("__p")
  }
}
