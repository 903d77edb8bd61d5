package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GeoStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-static spatial join over micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Double)]
    val stream = input.toDF().toDF("id", "x", "y")
      .selectExpr("id", "st_point(x, y) AS geometry")
    val boxes = spark.range(2).selectExpr(
      "id AS box_id",
      "st_makeenvelope(cast(id * 100 as double), 0.0, cast(id * 100 + 50 as double), 50.0) AS geometry")

    val joined = GeoStreaming.streamStaticSpatialJoin(stream, boxes)
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      input.addData((1L, 10.0, 10.0), (2L, 110.0, 10.0), (3L, 75.0, 10.0))
      q.processAllAvailable()
      input.addData((4L, 25.0, 25.0))
      q.processAllAvailable()
      val rows = spark.table("ssj").selectExpr("id", "box_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // id 3 (x=75) falls in no box; ids 1,4 in box 0; id 2 in box 1
      assert(rows == Seq((1L, 0L), (2L, 1L), (4L, 0L)))
    } finally q.stop()
  }

  test("stream-static left join keeps unmatched stream rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("id", "x").selectExpr("id", "st_point(x, 0.0) AS geometry")
    val box = spark.sql("SELECT st_makeenvelope(-1.0, -1.0, 1.0, 1.0) AS geometry, 'hit' AS tag")
    val joined = GeoStreaming.streamStaticSpatialJoin(stream, box, joinType = "left")
    val q = joined.writeStream.format("memory").queryName("ssjl").outputMode("append").start()
    try {
      input.addData((1L, 0.0), (2L, 99.0))
      q.processAllAvailable()
      val rows = spark.table("ssjl").selectExpr("id", "tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(rows == Seq((1L, "hit"), (2L, null)))
    } finally q.stop()
  }

  test("stream-stream temporal proximity join pairs within tolerance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val inA = MemoryStream[(Long, Timestamp)]
    val inB = MemoryStream[(Long, Timestamp)]
    val a = inA.toDF().toDF("aid", "ats")
    val b = inB.toDF().toDF("bid", "bts")
    val joined = GeoStreaming.streamProximityJoin(a, b, "ats", "bts",
      toleranceSecs = 10, watermarkDelay = "1 minute")
    val q = joined.writeStream.format("memory").queryName("sspj")
      .outputMode("append").start()
    try {
      inA.addData((1L, ts(100)), (2L, ts(200)), (3L, ts(305)))
      inB.addData((10L, ts(105)), (20L, ts(290)), (30L, ts(310)), (40L, ts(99)))
      q.processAllAvailable()
      val got = spark.table("sspj").select("aid", "bid")
        .as[(Long, Long)].collect().toSet
      // |dt|<=10: (1,10) dt=5, (1,40) dt=1, (3,30) dt=5; (2,20) dt=90 no
      assert(got == Set((1L, 10L), (1L, 40L), (3L, 30L)))
    } finally q.stop()
  }

  test("watermarked windowed count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "kind")
    val counts = GeoStreaming.windowedCount(stream, "ts", "10 minutes", "5 minutes",
      org.apache.spark.sql.functions.col("kind"))
    val q = counts.writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((t(1), "a"), (t(3), "a"), (t(12), "b"))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .selectExpr("window.start", "kind", "n").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).sorted.toSeq
      assert(rows.contains(("2024-01-01 10:00:00.0", "a", 2L)))
      assert(rows.contains(("2024-01-01 10:10:00.0", "b", 1L)))
    } finally q.stop()
  }

  test("pipeline expressions are streaming-safe in a stateless select") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.pipeline.TextRegistry.register(spark)
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("id", "text")
      .selectExpr("id", "text_stats(text).n_tokens AS n", "lang_id(text) AS lang",
        "cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c")
    val q = out.writeStream.format("memory").queryName("pipe").outputMode("append").start()
    try {
      input.addData((1L, "the quick brown fox is in the house"), (2L, ""))
      q.processAllAvailable()
      val rows = spark.table("pipe").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).sortBy(_._1)
      assert(rows(0) == ((1L, 8, "en", 1.0)))
      assert(rows(1)._2 == 0 && rows(1)._3 == "und")
    } finally q.stop()
  }

  test("streaming exact dedup drops repeats within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val stream = input.toDF().toDF("ts", "id", "text")
    val out = graft.pipeline.Dedup.exactStreaming(stream, "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((t(1), 1L, "doc a"), (t(2), 2L, "doc b"), (t(3), 3L, "doc a"))
      q.processAllAvailable()
      input.addData((t(4), 4L, "doc a"), (t(5), 5L, "doc c"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 5L)) // 3 and 4 are dup content within watermark
    } finally q.stop()
  }

  test("stream-stream spatial join pairs co-located, time-close events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val lIn = MemoryStream[(Long, Double, Double, Timestamp)]
    val rIn = MemoryStream[(Long, Double, Double, Timestamp)]
    val l = lIn.toDF().toDF("l_id", "x", "y", "l_ts")
      .selectExpr("l_id", "st_point(x, y) AS geometry", "l_ts")
    val r = rIn.toDF().toDF("r_id", "x", "y", "r_ts")
      .selectExpr("r_id", "st_point(x, y) AS rgeom", "r_ts")
    val joined = GeoStreaming.streamStreamSpatialJoin(
      l, r, cellSize = 10.0, "l_ts", "r_ts", "10 minutes",
      timeConstraintSecs = 120,
      predicate = graft.spatial.SpatialJoin.Predicate.Intersects,
      leftGeom = "geometry", rightGeom = "rgeom")
    val q = joined.writeStream.format("memory").queryName("sss").outputMode("append").start()
    try {
      // (1,1) and (1.5,1): same cell, 1 min apart => pair.
      // (50,50) vs (1,1): different cells => no pair.
      // (2,2) at 10:30 vs (1,1) at 10:01: same cell, 29 min apart => no pair
      //   (time constraint) — and points never st_intersect unless equal, so
      //   use equal coordinates for the positive case.
      lIn.addData((1L, 1.0, 1.0, t(1)), (2L, 50.0, 50.0, t(1)))
      rIn.addData((10L, 1.0, 1.0, t(2)), (11L, 1.0, 1.0, t(30)))
      q.processAllAvailable()
      val rows = spark.table("sss").selectExpr("l_id", "r_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(rows == Seq((1L, 10L)))
    } finally q.stop()
  }

  test("runningEnvelope accumulates per-key bbox across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double, Double)]
    val stream = input.toDF().toDF("k", "x", "y").selectExpr("k", "st_point(x, y) AS geometry")
    val env = GeoStreaming.runningEnvelope(stream, "k", "geometry")
    val q = env.writeStream.format("memory").queryName("re").outputMode("update").start()
    try {
      input.addData(("a", 0.0, 0.0), ("a", 5.0, 2.0))
      q.processAllAvailable()
      input.addData(("a", -3.0, 7.0), ("b", 1.0, 1.0))
      q.processAllAvailable()
      val last = spark.table("re").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .groupBy(_._1).map { case (k, vs) => vs.last }.toSeq.sortBy(_._1)
      assert(last == Seq(("a", -3.0, 0.0, 5.0, 7.0), ("b", 1.0, 1.0, 1.0, 1.0)))
    } finally q.stop()
  }

  test("HLL bucket state maintained on a stream finalizes to the batch estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("g", "k")
    // hllBuckets is ONE streaming-legal aggregation; complete mode keeps
    // the whole (small: <= groups * 256 rows) sketch state queryable
    val state = graft.pipeline.Sketch.hllBuckets(stream, "k", Seq("g"))
    val q = state.writeStream.format("memory").queryName("hllstate")
      .outputMode("complete").start()
    try {
      input.addData((1L to 800L).map(i => ("g", i * 13 % 700)): _*)
      q.processAllAvailable()
      input.addData((1L to 800L).map(i => ("g", i * 17 % 900)): _*)
      q.processAllAvailable()
      val streamed = graft.pipeline.Sketch
        .hllFromBuckets(spark.table("hllstate"), Seq("g"))
        .select("hll_estimate").as[Double].head()
      val batch = graft.pipeline.Sketch.hllDistinct(
          ((1L to 800L).map(i => ("g", i * 13 % 700)) ++
           (1L to 800L).map(i => ("g", i * 17 % 900))).toDF("g", "k"), "k", Seq("g"))
        .select("hll_estimate").as[Double].head()
      assert(streamed == batch, s"streamed $streamed != batch $batch")
    } finally q.stop()
  }

  test("CMS counter table maintained on a stream matches the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val stream = input.toDF().toDF("k")
    val state = graft.pipeline.Sketch.cmsTable(stream, "k")
    val q = state.writeStream.format("memory").queryName("cmsstate")
      .outputMode("complete").start()
    try {
      input.addData(1L to 500L: _*)
      q.processAllAvailable()
      input.addData((1L to 500L).map(_ % 50): _*)
      q.processAllAvailable()
      val streamed = spark.table("cmsstate")
        .as[(Int, Int, Long)].collect().toSet
      val batch = graft.pipeline.Sketch
        .cmsTable(((1L to 500L) ++ (1L to 500L).map(_ % 50)).toDF("k"), "k")
        .as[(Int, Int, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming contamination flag is stateless and matches batch decontaminate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup

    val evalDocs = Seq((100L, "the secret eval answer is forty two"))
      .toDF("doc_id", "text")
    // eval gram set collected once (benchmark-sized), then a pure projection
    val evalGrams = evalDocs
      .select(org.apache.spark.sql.functions.explode(Dedup.gramsCol($"text", 3)).as("g"))
      .distinct().as[String].collect().toSeq

    val input = MemoryStream[(Long, String)]
    val flagged = input.toDF().toDF("doc_id", "text")
      .withColumn("contaminated", Dedup.contaminatedFlag($"text", evalGrams, 3))
    val q = flagged.writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta"),
        (2L, "we know the secret eval answer is forty two now"),
        (3L, "short"))
      q.processAllAvailable()
      val rows = spark.table("decon").select("doc_id", "contaminated").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
      assert(rows == Seq((1L, false), (2L, true), (3L, false)))
      // parity with the batch aggregating operator
      val batchIds = Dedup.decontaminate(
          Seq((1L, "alpha beta gamma delta"),
              (2L, "we know the secret eval answer is forty two now"),
              (3L, "short")).toDF("doc_id", "text"),
          evalDocs, "doc_id", "text", 3)
        .select("doc_id").as[Long].collect().toSet
      assert(batchIds == Set(2L))
    } finally q.stop()
  }

  test("streaming session_window merges events within the gap (q121 shape)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.session_window
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input.toDF().toDF("ts", "uid")
      .groupBy(session_window($"ts", "10 minutes"), $"uid")
      .count()
    val q = sessions.writeStream.format("memory").queryName("sessw")
      .outputMode("complete").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      input.addData((t(0), 1L), (t(5), 1L), (t(30), 1L), (t(2), 2L))
      q.processAllAvailable()
      val rows = spark.table("sessw")
        .selectExpr("uid", "session_window.start AS s", "session_window.end AS e", "count")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).sorted.toSeq
      assert(rows == Seq(
        (1L, "2026-01-01 10:00:00.0", "2026-01-01 10:15:00.0", 2L),
        (1L, "2026-01-01 10:30:00.0", "2026-01-01 10:40:00.0", 1L),
        (2L, "2026-01-01 10:02:00.0", "2026-01-01 10:12:00.0", 1L)))
    } finally q.stop()
  }

  test("geometry aggregates run on streams: per-key makeline + envelope in complete mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double, Double)]
    input.toDF().toDF("uid", "seq", "x", "y").createOrReplaceTempView("traj_in")
    val agg = spark.sql(
      """SELECT uid, st_astext(st_makeline_agg(st_point(x, y), seq)) AS traj,
        |  st_astext(st_envelope_agg(st_point(x, y))) AS bbox
        |FROM traj_in GROUP BY uid""".stripMargin)
    val q = agg.writeStream.format("memory").queryName("trajagg")
      .outputMode("complete").start()
    try {
      input.addData((1L, 2L, 10.0, 0.0), (1L, 1L, 0.0, 0.0))
      q.processAllAvailable()
      input.addData((1L, 3L, 10.0, 5.0)) // late batch extends the same line
      q.processAllAvailable()
      val row = spark.table("trajagg").orderBy("uid").head()
      assert(row.getString(1) == "LINESTRING (0 0, 10 0, 10 5)")
      assert(row.getString(2) == "POLYGON ((0 0, 10 0, 10 5, 0 5, 0 0))")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER proximity join emits null-padded rows after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val inA = MemoryStream[(Long, Timestamp)]
    val inB = MemoryStream[(Long, Timestamp)]
    val a = inA.toDF().toDF("aid", "ats")
    val b = inB.toDF().toDF("bid", "bts")
    val joined = GeoStreaming.streamProximityJoinLeftOuter(a, b, "ats", "bts",
      toleranceSecs = 10, watermarkDelay = "10 seconds")
    val q = joined.writeStream.format("memory").queryName("ssoj")
      .outputMode("append").start()
    try {
      inA.addData((1L, ts(100)), (2L, ts(200))) // 1 matches, 2 never will
      inB.addData((10L, ts(105)))
      q.processAllAvailable()
      // push both watermarks far past aid=2's join window so the outer
      // (null-padded) result for it can be finalized and emitted
      inA.addData((9L, ts(1000)))
      inB.addData((90L, ts(1000)))
      q.processAllAvailable()
      inA.addData((8L, ts(2000)))
      inB.addData((80L, ts(2000)))
      q.processAllAvailable()
      val got = spark.table("ssoj").selectExpr("aid", "bid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got.contains((1L, 10L)), s"matched pair missing: $got")
      assert(got.contains((2L, -1L)), s"outer null row for aid=2 missing: $got")
    } finally q.stop()
  }

  test("streaming SCD2: out-of-order change log closes versions in event-time order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val input = MemoryStream[(String, Timestamp, String)]
    val scd = GeoStreaming.scd2Stream(
      input.toDF().toDF("uid", "ts", "status"), "uid", "ts", "status",
      watermarkDelay = "250 seconds")
    val q = scd.writeStream.format("memory").queryName("scd2s")
      .outputMode("append").start()
    try {
      // u1 arrives OUT OF ORDER across batches: bronze@100, gold@300
      input.addData(("u1", ts(300), "gold"), ("u1", ts(100), "bronze"))
      q.processAllAvailable()
      // silver@200 lands between them, admissible under the 250s delay (wm=50)
      input.addData(("u1", ts(200), "silver"),
        ("u1", ts(310), "gold")) // same-status repeat: must compress away
      q.processAllAvailable()
      // advance the watermark far past everything so all changes finalize
      input.addData(("zz", ts(1000), "x"))
      q.processAllAvailable()
      input.addData(("zz", ts(2000), "x"))
      q.processAllAvailable()
      val got = spark.table("scd2s")
        .selectExpr("uid", "status", "valid_from", "valid_to").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      // event-time ordering restored: bronze [100,200), silver [200,300);
      // gold stays OPEN (never emitted in append mode), repeat compressed
      assert(got.contains(("u1", "bronze", 100L, 200L)), s"bronze version: $got")
      assert(got.contains(("u1", "silver", 200L, 300L)), s"silver version: $got")
      assert(!got.exists(r => r._1 == "u1" && r._2 == "gold"), s"gold must stay open: $got")
      assert(got.count(_._1 == "u1") == 2, s"exactly two closed u1 versions: $got")
    } finally q.stop()
  }

  test("event-time sessionization: gap split, watermark timeout close, state freed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val input = MemoryStream[(String, Timestamp)]
    val stream = input.toDF().toDF("uid", "ts")
    val sessions = GeoStreaming.sessionize(stream, "uid", "ts",
      gapSecs = 30, watermarkDelay = "10 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // u1: two bursts split by a >30s gap; u2: one event
      input.addData(("u1", ts(100)), ("u1", ts(110)), ("u1", ts(120)),
        ("u2", ts(105)))
      q.processAllAvailable()
      input.addData(("u1", ts(200)), ("u1", ts(215))) // new session; also emits the old one
      q.processAllAvailable()
      // advance the watermark far past every open session's end+gap
      input.addData(("zz", ts(1000)))
      q.processAllAvailable()
      input.addData(("zz", ts(2000)))
      q.processAllAvailable()
      val got = spark.table("sess")
        .selectExpr("uid", "session_start", "session_end", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got.contains(("u1", 100L, 120L, 3L)), s"first u1 session: $got")
      assert(got.contains(("u1", 200L, 215L, 2L)), s"second u1 session: $got")
      assert(got.contains(("u2", 105L, 105L, 1L)), s"u2 singleton: $got")
      // cross-batch disorder: a late-but-admissible event PREPENDS to an
      // open session from an earlier batch (correct start + count)
      val inL = MemoryStream[(String, Timestamp)]
      val sL = GeoStreaming.sessionize(inL.toDF().toDF("uid", "ts"), "uid", "ts",
        gapSecs = 30, watermarkDelay = "100 seconds")
      val qL = sL.writeStream.format("memory").queryName("sessL")
        .outputMode("append").start()
      try {
        inL.addData(("A", ts(200)))
        qL.processAllAvailable()
        inL.addData(("A", ts(185))) // watermark = 100, admitted; within gap BEFORE start
        qL.processAllAvailable()
        inL.addData(("zz", ts(1000)))
        qL.processAllAvailable()
        inL.addData(("zz", ts(2000)))
        qL.processAllAvailable()
        val gL = spark.table("sessL")
          .selectExpr("uid", "session_start", "session_end", "n_events").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(gL.contains(("A", 185L, 200L, 2L)), s"late prepend: $gL")
      } finally qL.stop()

      // bridging: an event between two open sessions merges them into one
      val inB = MemoryStream[(String, Timestamp)]
      val sB = GeoStreaming.sessionize(inB.toDF().toDF("uid", "ts"), "uid", "ts",
        gapSecs = 30, watermarkDelay = "200 seconds")
      val qB = sB.writeStream.format("memory").queryName("sessB")
        .outputMode("append").start()
      try {
        inB.addData(("B", ts(100)), ("B", ts(110)))
        qB.processAllAvailable()
        inB.addData(("B", ts(150)), ("B", ts(160))) // 150-110=40 > gap: second session
        qB.processAllAvailable()
        inB.addData(("B", ts(130))) // touches both -> bridge merge
        qB.processAllAvailable()
        inB.addData(("zz", ts(1000)))
        qB.processAllAvailable()
        inB.addData(("zz", ts(2000)))
        qB.processAllAvailable()
        val gB = spark.table("sessB")
          .selectExpr("uid", "session_start", "session_end", "n_events").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(gB.contains(("B", 100L, 160L, 5L)), s"bridge merge: $gB")
        assert(!gB.exists(t => t._1 == "B" && t != ("B", 100L, 160L, 5L)),
          s"no partial B sessions: $gB")
      } finally qB.stop()

      // within-batch disorder: events arrive out of order, one session
      val in2 = MemoryStream[(String, Timestamp)]
      val s2 = GeoStreaming.sessionize(in2.toDF().toDF("uid", "ts"), "uid", "ts",
        gapSecs = 30, watermarkDelay = "5 seconds")
      val q2 = s2.writeStream.format("memory").queryName("sess2")
        .outputMode("append").start()
      try {
        in2.addData(("a", ts(120)), ("a", ts(100)), ("a", ts(110)))
        q2.processAllAvailable()
        in2.addData(("zz", ts(500)))
        q2.processAllAvailable()
        in2.addData(("zz", ts(900)))
        q2.processAllAvailable()
        val g2 = spark.table("sess2")
          .selectExpr("uid", "session_start", "session_end", "n_events").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(g2.contains(("a", 100L, 120L, 3L)), s"disorder session: $g2")
      } finally q2.stop()
    } finally q.stop()
  }

  test("runningZScore flags outliers against prior state only; state carries across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val stream = input.toDF().toDF("k", "ts", "v")
    val out = graft.streaming.GeoStreaming.runningZScore(
      stream, "k", "ts", "v", zThreshold = 3.0, minN = 5)
    val q = out.writeStream.format("memory").queryName("zsc").outputMode("append").start()
    try {
      def t(sec: Int) = Timestamp.valueOf(f"2024-01-01 10:00:${sec}%02d")
      // batch 1: 6 calm values around 10
      input.addData((1 to 6).map(i => ("a", t(i), 10.0 + 0.1 * (i % 3))): _*)
      q.processAllAvailable()
      assert(spark.table("zsc").filter($"is_anomaly").count() == 0)
      // batch 2: a wild spike + another calm value — spike flags, calm doesn't;
      // the spike is judged by PRIOR state (cross-batch carry)
      input.addData(("a", t(10), 50.0), ("a", t(11), 10.1))
      q.processAllAvailable()
      val rows = spark.table("zsc").filter($"ts_sec" >= t(10).getTime / 1000)
        .select("value", "is_anomaly").as[(Double, Boolean)].collect().toMap
      assert(rows(50.0))
      assert(!rows(10.1))
      // a fresh key with < minN observations never flags, even wild ones
      input.addData(("b", t(20), 0.0), ("b", t(21), 1000.0))
      q.processAllAvailable()
      assert(spark.table("zsc").filter($"k" === "b" && $"is_anomaly").count() == 0)
    } finally q.stop()
  }

  test("streaming LSH alarms: edited near-dups collide across batches, distinct docs stay silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"
    val edited = base.replace("lazy", "sleepy") // high-Jaccard edit
    val other = "completely different text about databases partitioning shuffles and columnar storage"

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val stream = input.toDF().toDF("ts", "id", "text")
    val out = graft.pipeline.Dedup.lshStreamingAlarms(
      stream, "id", "text", "ts", delay = "10 minutes", horizonSecs = 3600)
    val q = out.writeStream.format("memory").queryName("lshal")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((t(1), 1L, base), (t(2), 2L, other))
      q.processAllAvailable()
      // batch 1: first sightings only — no alarms
      assert(spark.table("lshal").count() == 0)
      input.addData((t(3), 3L, edited), (t(4), 4L, "unrelated fresh content about geodesic buffers"))
      q.processAllAvailable()
      val rows = spark.table("lshal")
        .select("id", "first_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((3L, 1L)), s"alarms: $rows") // edited doc alarms against doc 1 only
      // exact repeat of doc 2 alarms in every band
      input.addData((t(5), 5L, other))
      q.processAllAvailable()
      val n5 = spark.table("lshal").filter($"id" === 5L).count()
      assert(n5 == 16L, s"exact repeat should collide in all 16 bands, got $n5")
      assert(spark.table("lshal").filter($"id" === 5L)
        .select("first_id").as[Long].collect().toSet == Set(2L))
    } finally q.stop()
  }

  test("streaming winnowing alarms: shared passages collide, disjoint text stays silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val passage = "this exact shared paragraph is long enough to carry winnowing fingerprints"
    val docA = "intro words before it. " + passage
    // same passage inside an otherwise different doc — LOW overall Jaccard,
    // exactly the case band-LSH under-fires on and substring alarms catch
    val docB = passage + " then entirely unrelated trailing commentary regarding climate"
    val other = "completely different text about databases partitioning shuffles and columnar storage"

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val stream = input.toDF().toDF("ts", "id", "text")
    val out = graft.pipeline.Dedup.winnowStreamingAlarms(
      stream, "id", "text", "ts", delay = "10 minutes", horizonSecs = 3600)
    val q = out.writeStream.format("memory").queryName("winal")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((t(1), 1L, docA), (t(2), 2L, other))
      q.processAllAvailable()
      assert(spark.table("winal").count() == 0) // first sightings only
      input.addData((t(3), 3L, docB), (t(4), 4L, "unrelated fresh content about geodesic buffers"))
      q.processAllAvailable()
      val rows = spark.table("winal")
        .select("id", "first_id").as[(Long, Long)].collect().toSet
      assert(rows.nonEmpty && rows.forall(_ == ((3L, 1L))), s"alarms: $rows")
      // the density guarantee makes the shared-passage collision certain,
      // not probabilistic: the passage exceeds k + w - 1 chars
      val shared = graft.pipeline.TextKernels
        .winnowFingerprints(docA, 8, 4).toSet
        .intersect(graft.pipeline.TextKernels.winnowFingerprints(docB, 8, 4).toSet)
      assert(spark.table("winal").filter($"id" === 3L).count() == shared.size)
      // an exact repeat alarms on every fingerprint of the doc
      input.addData((t(5), 5L, other))
      q.processAllAvailable()
      val n5 = spark.table("winal").filter($"id" === 5L).count()
      val fp2 = graft.pipeline.TextKernels.winnowFingerprints(other, 8, 4).length
      assert(n5 == fp2, s"exact repeat should collide on all $fp2 fingerprints, got $n5")
    } finally q.stop()
  }
}
