package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * As-of and range joins checked against brute-force formulations of the
 * same semantics on deterministic pseudo-random data (LCG, fixed seed).
 */
class RelationalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // deterministic LCG so the suite never flakes
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private lazy val rightRows: Seq[(Long, Long, Long, Double)] = { // key, t, id, v
    val r = lcg(7).map(x => math.floorMod(x, 1000L))
    (1L to 300L).map(i => (r.next() % 5, r.next(), i, r.next() / 7.0))
  }
  private lazy val leftRows: Seq[(Long, Long, Long)] = { // key, t, id
    val r = lcg(99).map(x => math.floorMod(x, 1000L))
    (1L to 200L).map(i => (r.next() % 6, r.next(), i))
  }

  test("asof backward matches brute force (latest right.t <= left.t, max id tie-break)") {
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "rt", "rid", "v")
    val got = AsOfJoin.join(left, right,
        leftKeys = Seq("k"), rightKeys = Seq("k"), leftTime = "t", rightTime = "rt",
        payloadCols = Seq("rid", "v"), tieBreak = Some("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap

    val expected = leftRows.map { case (k, t, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got == expected)
  }

  test("asof forward + inner + tolerance matches brute force") {
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "rt", "rid", "v")
    val tol = 50L
    val got = AsOfJoin.join(left, right,
        leftKeys = Seq("k"), rightKeys = Seq("k"), leftTime = "t", rightTime = "rt",
        payloadCols = Seq("rid"), tieBreak = Some("rid"),
        tolerance = Some(lit(tol)), direction = AsOfJoin.Forward, joinType = "inner")
      .select("lid", "rid").as[(Long, Long)].collect().toMap

    val expected = leftRows.flatMap { case (k, t, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 >= t && r._2 - t <= tol)
      if (cands.isEmpty) None
      else Some(lid -> cands.minBy(r => (r._2, -r._3))._3)
    }.toMap
    assert(got == expected)
  }

  test("asof left join keeps unmatched left rows with null payload") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 20L, 5L, 0.0)).toDF("k", "rt", "rid", "v") // only later
    val out = AsOfJoin.join(left, right, Seq("k"), Seq("k"), "t", "rt", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, None)))
  }

  test("pointInInterval matches brute force across bin boundaries") {
    val points = leftRows.toDF("k", "pt", "lid")
    val ivals = rightRows.map { case (k, t, id, _) => (k, t, t + (id % 70), id) }
      .toDF("ik", "lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(points, col("pt"), ivals, col("lo"), col("hi"), 64L)
      .select("lid", "iid").as[(Long, Long)].collect().toSet
    val expected = (for {
      (k, t, lid) <- leftRows
      (ik, lo, iid2, _) <- rightRows
      hi = lo + (iid2 % 70)
      if t >= lo && t <= hi
    } yield (lid, iid2)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("pointInInterval plans as an equi join, not BroadcastNestedLoopJoin") {
    val points = leftRows.toDF("k", "pt", "lid")
    val ivals = rightRows.map { case (k, t, id, _) => (k, t, t + 10, id) }
      .toDF("ik", "lo", "hi", "iid")
    val plan = RangeJoin.pointInInterval(points, col("pt"), ivals, col("lo"), col("hi"), 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("selfProximity matches brute force (pairs within tolerance, once each)") {
    val df = leftRows.toDF("k", "t", "id")
    val tol = 37L
    val got = RangeJoin.selfProximity(df, "id", col("t"), tol)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val expected = (for {
      (_, ta, ia) <- leftRows
      (_, tb, ib) <- leftRows
      if ia < ib && math.abs(ta - tb) <= tol
    } yield (ia, ib)).toSet
    assert(got.toSet == expected)
    assert(got.length == expected.size, "each pair must appear exactly once")
  }

  test("selfProximity handles negative times (floor-division bins)") {
    val df = Seq((-5L, 1L), (-3L, 2L), (4L, 3L), (100L, 4L)).toDF("t", "id")
    val got = RangeJoin.selfProximity(df, "id", col("t"), 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("broadcastLookup agrees with the shuffle as-of join") {
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "rt", "rid", "v")
    val viaShuffle = AsOfJoin.join(left, right,
        Seq("k"), Seq("k"), "t", "rt", Seq("rid", "v"), tieBreak = Some("rid"))
      .select("lid", "rid", "v").as[(Long, Option[Long], Option[Double])]
      .collect().toSet
    val viaLookup = AsOfJoin.broadcastLookup(left, right,
        col("k"), col("k"), col("t"), col("rt"), Seq("rid", "v"), tieBreak = Some("rid"))
      .select("lid", "rid", "v").as[(Long, Option[Long], Option[Double])]
      .collect().toSet
    assert(viaLookup == viaShuffle)
  }

  test("broadcastLookup guard: over-cap build side dispatches to the shuffle join") {
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "rt", "rid", "v")
    def run(cap: Int) = AsOfJoin.broadcastLookup(left, right,
        col("k"), col("k"), col("t"), col("rt"), Seq("rid", "v"),
        tieBreak = Some("rid"), maxBuildRows = cap)
      .select("lid", "rid", "v").as[(Long, Option[Long], Option[Double])]
      .collect().toSet
    // cap = 1 < |right| forces the shuffle path; results must be identical
    // to the broadcast-index path (threshold-flip parity), and the shuffle
    // path must preserve the left schema untouched (no __bk/__bt residue)
    assert(run(1) == run(1000000))
    val dispatched = AsOfJoin.broadcastLookup(left, right,
      col("k"), col("k"), col("t"), col("rt"), Seq("rid", "v"),
      tieBreak = Some("rid"), maxBuildRows = 1)
    assert(dispatched.columns.toSeq == Seq("k", "t", "lid", "rid", "v"))
  }

  test("asof join: NULL keys and NULL times never match (SQL equi-join semantics)") {
    val left = Seq(
      (Option(1L), Option(10L), 1L),   // normal match
      (Option.empty[Long], Option(10L), 2L), // null key
      (Option(1L), Option.empty[Long], 3L)   // null time
    ).toDF("k", "t", "lid")
    val right = Seq(
      (Option(1L), Option(5L), 100L),
      (Option.empty[Long], Option(1L), 200L), // null right key must never match
      (Option(1L), Option.empty[Long], 300L)  // null right time must never match
    ).toDF("k", "rt", "rid")
    for (dir <- Seq(AsOfJoin.Backward, AsOfJoin.Forward)) {
      val got = AsOfJoin.join(left, right, Seq("k"), Seq("k"), "t", "rt",
          Seq("rid"), tieBreak = Some("rid"), direction = dir)
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      val expectMatch = if (dir == AsOfJoin.Backward) Some(100L) else None
      assert(got == Map(1L -> expectMatch, 2L -> None, 3L -> None), s"dir=$dir")
    }
    // broadcastLookup: same inputs must not NPE and must agree on nulls
    val viaLookup = AsOfJoin.broadcastLookup(left, right,
        col("k"), col("k"), col("t"), col("rt"), Seq("rid"), tieBreak = Some("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(viaLookup == Map(1L -> Some(100L), 2L -> None, 3L -> None))
  }

  test("saltedJoin result multiset is identical to the plain equi-join") {
    // 80% of left rows share ONE hot key
    val skewed = (1L to 500L).map(i => (if (i % 5 == 0) i % 7 else 42L, i))
      .toDF("k", "lid")
    val other = (0L to 60L).map(k => (k, s"v$k")).toDF("rk", "v")
    val plain = skewed.join(other, skewed("k") === other("rk"))
      .select("lid", "v").as[(Long, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedJoin(skewed, other, Seq("k"), Seq("rk"), "lid", 8)
      .select("lid", "v").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedJoin shuffles on (key, salt), spreading a hot key") {
    val skewed = (1L to 100L).map(i => (42L, i)).toDF("k", "lid")
    val other = Seq((42L, "x")).toDF("rk", "v")
    val plan = SkewJoin.saltedJoin(skewed, other, Seq("k"), Seq("rk"), "lid", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("broadcastLookup enriches a stream (stateless stream-static as-of)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, Long)] // key, t, id
    val stream = input.toDF().toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 500L))
      .toDF("k", "rt", "rid")
    val out = AsOfJoin.broadcastLookup(stream, right,
      col("k"), col("k"), col("t"), col("rt"), Seq("rid"))
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, 15L, 1L), (1L, 25L, 2L), (2L, 1L, 3L), (3L, 9L, 4L))
      q.processAllAvailable()
      val rows = spark.table("asof_stream").select("lid", "rid")
        .as[(Long, Option[Long])].collect().toMap
      assert(rows == Map(1L -> Some(100L), 2L -> Some(200L),
        3L -> None, 4L -> None))
    } finally q.stop()
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // the 100 TB fact-to-fact pattern: both sides written bucketed on the
    // join key join WITHOUT any Exchange — only sorts above the scans
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_cust")
    try {
      (1L to 500L).map(i => (i, i % 40, i * 2.5)).toDF("oid", "ck", "amt")
        .write.bucketBy(8, "ck").sortBy("ck").saveAsTable("bt_orders")
      (0L to 39L).map(i => (i, s"c$i")).toDF("ck", "name")
        .write.bucketBy(8, "ck").saveAsTable("bt_cust")
      val autoBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      try {
        val joined = spark.table("bt_orders").join(spark.table("bt_cust"), "ck")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == 500)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autoBc)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bt_orders")
      spark.sql("DROP TABLE IF EXISTS bt_cust")
    }
  }

  test("Cdc.applyChanges: latest seq wins, delete beats upsert at equal seq, inserts appear") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", "U", 1L), (1L, "a3", "U", 5L),   // two upserts: seq 5 wins
      (2L, null.asInstanceOf[String], "D", 1L),    // delete
      (3L, "c2", "U", 2L), (3L, null.asInstanceOf[String], "D", 2L), // tie: delete wins
      (9L, "new", "U", 1L)                         // insert
    ).toDF("k", "v", "op", "seq")
    val out = graft.relational.Cdc.applyChanges(base, changes, "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a3"), (9L, "new")))
    // no changes => identity
    val none = changes.filter($"k" < 0)
    assert(graft.relational.Cdc.applyChanges(base, none, "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
