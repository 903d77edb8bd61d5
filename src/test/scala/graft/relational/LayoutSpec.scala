package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def morton(buckets: Seq[Long], bits: Int): Long = {
    var z = 0L
    val d = buckets.length
    for (j <- 0 until d; k <- 0 until bits)
      z |= ((buckets(j) >> k) & 1L) << (k * d + j)
    z
  }

  test("mortonInterleave matches the reference bit interleave (2-D and 3-D)") {
    val rnd = new scala.util.Random(11)
    for (d <- Seq(2, 3); bits <- Seq(4, 8)) {
      val rows = (1 to 200).map(_ => Seq.fill(d)(rnd.nextInt(1 << bits).toLong))
      val df = rows.map(r => (r.head, r(1), if (d > 2) r(2) else 0L)).toDF("a", "b", "c")
      val cols = Seq(col("a"), col("b"), col("c")).take(d)
      val got = df.select(Layout.mortonInterleave(cols, bits).as("z"))
        .collect().map(_.getLong(0)).toSeq
      val want = rows.map(r => morton(r, bits))
      assert(got == want, s"d=$d bits=$bits")
    }
  }

  test("equiWidthBucket clamps, handles nulls and degenerate ranges") {
    val df = Seq(Some(-5.0), Some(0.0), Some(5.0), Some(10.0), Some(15.0), None).toDF("v")
    val got = df.select(Layout.equiWidthBucket(col("v"), 0.0, 10.0, 2).as("b"))
      .collect().map(_.getLong(0)).toSeq
    // width 2.5: -5 -> clamp 0; 0 -> 0; 5 -> 2; 10 -> clamp 3; 15 -> clamp 3; null -> 0
    assert(got == Seq(0L, 0L, 2L, 3L, 3L, 0L))
    val degen = df.select(Layout.equiWidthBucket(col("v"), 7.0, 7.0, 4).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(degen == Set(0L))
  }

  test("bucketByBounds counts strictly-smaller cut points") {
    val df = Seq(0.5, 1.0, 1.5, 2.5, 99.0).toDF("v")
    val got = df.select(Layout.bucketByBounds(col("v"), Seq(1.0, 2.0, 3.0)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L, 2L, 3L))
  }

  test("z-order clustering shrinks per-file spans vs arrival order") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 20000).map(_ => (rnd.nextDouble() * 1000, rnd.nextDouble() * 50))
    val df = rows.toDF("x", "y")
    val nFiles = 16

    def avgSpanProduct(fileCol: org.apache.spark.sql.DataFrame): Double = {
      val spans = fileCol.groupBy("file")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect()
      spans.map(r => r.getDouble(1) * r.getDouble(2)).sum / spans.length
    }

    val zed = Layout.withZValue(df, Seq("x", "y"), bits = 8)
      .withColumn("file", Layout.deterministicFile(col("__z"), 8, 2, nFiles))
    val arrival = df.withColumn("file",
      (monotonically_increasing_id() % nFiles).cast("long"))

    val zSpan = avgSpanProduct(zed)
    val aSpan = avgSpanProduct(arrival)
    // random arrival: every file spans ~the whole plane; z-order files
    // cover a contiguous z range -> orders of magnitude tighter boxes
    assert(zSpan < aSpan / 4, s"z=$zSpan arrival=$aSpan")
  }

  test("zorderWrite round-trips and produces clustered files") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 5000).map(_ => (rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val df = rows.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    Layout.zorderWrite(df, dir, Seq("x", "y"), bits = 8, numFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.columns.toSet == Set("x", "y"))
    // per-parquet-file min/max boxes should be far tighter than the domain
    val spans = back.withColumn("f", input_file_name())
      .groupBy("f").agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length > 1)
    val avg = spans.map(r => r.getDouble(1) * r.getDouble(2)).sum / spans.length
    assert(avg < 100.0 * 100.0 / 3, s"avg file box area $avg")
  }
}
