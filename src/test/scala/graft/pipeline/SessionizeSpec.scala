package graft.pipeline

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // key, time-seconds, id — deterministic LCG
  private lazy val rows: Seq[(Long, Long, Long)] = {
    val it = Iterator.iterate(11L)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    (1L to 400L).map { i =>
      val k = math.floorMod(it.next(), 4L)
      val t = math.floorMod(it.next(), 5000L)
      (k, t, i)
    }
  }

  private def bruteSessions(gapSec: Long): Map[(Long, Long), (Long, Long, Long)] = {
    // (key, idx) -> (first, last, count); new session when diff > gap
    rows.groupBy(_._1).flatMap { case (k, grp) =>
      val sorted = grp.sortBy(r => (r._2, r._3)).map(_._2)
      var idx = -1L; var prev = Long.MinValue
      val out = collection.mutable.Map[(Long, Long), (Long, Long, Long)]()
      sorted.foreach { t =>
        if (prev == Long.MinValue || t - prev > gapSec) idx += 1
        val cur = out.getOrElse((k, idx), (t, t, 0L))
        out((k, idx)) = (math.min(cur._1, t), math.max(cur._2, t), cur._3 + 1)
        prev = t
      }
      out
    }
  }

  test("assignIds matches brute-force gap splitting") {
    val df = rows.map { case (k, t, i) => (k, ts(t), i) }.toDF("k", "t", "id")
    val got = Sessionize.assignIds(df, Seq("k"), "t", gapMicros = 60L * 1000000, Seq("id"))
      .groupBy("k", "session_idx")
      .agg(count(lit(1)).as("n"), (min(unix_micros(col("t"))) / 1000000).cast("long").as("f"),
        (max(unix_micros(col("t"))) / 1000000).cast("long").as("l"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4), r.getLong(2)))
      .toMap
    assert(got == bruteSessions(60L))
  }

  test("sessionAggregate (native session_window) has the same boundaries") {
    val df = rows.map { case (k, t, i) => (k, ts(t), i) }.toDF("k", "t", "id")
    val got = Sessionize.sessionAggregate(df, Seq("k"), "t", "60 seconds")
      .select(col("k"), (unix_micros(col("first_event")) / 1000000).cast("long"),
        (unix_micros(col("last_event")) / 1000000).cast("long"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4)).toSet
    val expected = bruteSessions(60L)
      .map { case ((k, _), (f, l, n)) => (k, f, l, n) }.toSet
    assert(got == expected)
  }

  test("gap boundary: exactly `gap` MERGES, one microsecond past splits (both paths)") {
    val atBoundary = Seq((1L, ts(0), 1L), (1L, ts(60), 2L)).toDF("k", "t", "id")
    assert(Sessionize.assignIds(atBoundary, Seq("k"), "t", 60L * 1000000, Seq("id"))
      .select("session_idx").as[Long].collect().toSet == Set(0L))
    assert(Sessionize.sessionAggregate(atBoundary, Seq("k"), "t", "60 seconds").count() == 1L)
    val past = Seq((1L, ts(0), 1L), (1L, ts(61), 2L)).toDF("k", "t", "id")
    assert(Sessionize.assignIds(past, Seq("k"), "t", 60L * 1000000, Seq("id"))
      .select("session_idx").as[Long].collect().toSet == Set(0L, 1L))
    assert(Sessionize.sessionAggregate(past, Seq("k"), "t", "60 seconds").count() == 2L)
  }

  test("sessionAggregate works on a stream (watermark + append)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Sessionize.sessionAggregate(
      input.toDF().toDF("k", "t").withWatermark("t", "10 seconds"),
      Seq("k"), "t", "30 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(100)), (1L, ts(110)), (1L, ts(200)))
      q.processAllAvailable()
      input.addData((1L, ts(500))) // advances watermark past the first sessions
      q.processAllAvailable()
      input.addData((1L, ts(900)))
      q.processAllAvailable()
      val rows = spark.table("sess_stream")
        .select((unix_micros(col("session_start")) / 1000000).cast("long"), col("n_events"))
        .as[(Long, Long)].collect().toSet
      assert(rows.contains((100L, 2L)) && rows.contains((200L, 1L)))
    } finally q.stop()
  }
}
