package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{Corpus, Similarity, TextAnalysis}

/** The round-2 curation kernels are pure per-row expressions, so they must
  * run unchanged inside a streaming micro-batch (stateless select — no
  * watermark, no state store). */
class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("c4 clean + gopher flags + shingles + binary quantization on a stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val out = docs.select(
      col("id"),
      Corpus.c4CleanText(col("text")).as("clean"),
      TextAnalysis.gopherFlags(col("text")).getField("n_words").as("n_words"),
      expr("word_shingles(text, 2)").as("sh"))
    val q = out.writeStream.format("memory").queryName("cur_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "This line stays intact today.\nno punct"),
                    (2L, "tiny"))
      q.processAllAvailable()
      val rows = spark.table("cur_stream")
        .select("id", "clean", "n_words", "sh")
        .as[(Long, String, Long, Seq[String])].collect().sortBy(_._1)
      assert(rows(0)._2 == "This line stays intact today.")
      assert(rows(0)._3 == 7L)
      assert(rows(0)._4.contains("This line"))
      assert(rows(1)._2 == "" && rows(1)._3 == 1L)
    } finally q.stop()
  }

  test("sign-bit quantization streams and matches the batch packing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0 else -1.0)
    val input = MemoryStream[Long]
    val vecs = input.toDF().toDF("id").withColumn("v", typedLit(v))
    val out = vecs.select(col("id"),
      Similarity.binaryHalfCol(col("v"), 0).as("lo"),
      Similarity.binaryHalfCol(col("v"), 32).as("hi"))
    val q = out.writeStream.format("memory").queryName("bq_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(1L)
      q.processAllAvailable()
      val r = spark.table("bq_stream").as[(Long, Long, Long)].collect().head
      assert(r._2 == Similarity.binaryHalf(v, 0))
      assert(r._3 == Similarity.binaryHalf(v, 32))
    } finally q.stop()
  }

  test("bpe encode and pca projection run stateless on a stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val enc = graft.pipeline.Bpe.bpeEncode(docs, "id", "text",
      Seq(("a", "b"), ("ab", "c")))
    val q = enc.writeStream.format("memory").queryName("bpe_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "abc ab zz"))
      q.processAllAvailable()
      val syms = spark.table("bpe_stream")
        .select("word_pos", "sym_pos", "symbol")
        .as[(Int, Int, String)].collect().toSet
      assert(syms == Set((0, 0, "abc"), (1, 0, "ab"), (2, 0, "z"), (2, 1, "z")))
    } finally q.stop()

    val vin = MemoryStream[Long]
    val vecs = vin.toDF().toDF("id")
      .withColumn("v", typedLit(Array(3.0, 4.0)))
    val proj = vecs.select(col("id"),
      graft.pipeline.Pca.projectCol(col("v"), Array(1.0, 0.0), Array(1.0, 0.0)).as("pc1"))
    val q2 = proj.writeStream.format("memory").queryName("pca_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      vin.addData(1L)
      q2.processAllAvailable()
      assert(spark.table("pca_stream").as[(Long, Double)].collect().head._2 == 2.0)
    } finally q2.stop()
  }

  test("quality-classifier scoring and tile sharding run stateless on a stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // train on a static batch (the normal pattern: offline train, online score)
    val train = Seq((1L, 0.9, 1.0), (2L, 0.1, 0.0), (3L, 0.8, 1.0), (4L, 0.2, 0.0))
      .toDF("id", "f0", "y")
    val w = graft.pipeline.Classifier.trainLogistic(train, Seq($"f0"), $"y", 1.0, 10)
    val input = MemoryStream[(Long, Double, Double, Double)]
    val stream = input.toDF().toDF("id", "f0", "lon", "lat")
    val out = stream.select(col("id"),
      graft.pipeline.Classifier.score(w, Seq(col("f0"))).as("score"),
      expr("st_tilex(st_point(lon, lat), 6)").as("tx"),
      expr("st_tiley(st_point(lon, lat), 6)").as("ty"))
    val q = out.writeStream.format("memory").queryName("clf_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, 0.9, 0.0, 51.5), (2L, 0.1, -180.0, 0.0))
      q.processAllAvailable()
      val rows = spark.table("clf_stream")
        .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
      assert(rows(0)._2 > 0.5 && rows(1)._2 < 0.5) // separable scores survive the stream
      assert(rows(0)._3 == 32L && rows(1)._3 == 0L) // Greenwich / antimeridian tiles
      // streamed scores are bit-identical to the batch projection
      val batch = Seq((1L, 0.9), (2L, 0.1)).toDF("id", "f0")
        .select(graft.pipeline.Classifier.score(w, Seq(col("f0"))).as("s"))
        .as[Double].collect()
      assert(rows.map(_._2).toSeq == batch.toSeq)
    } finally q.stop()
  }
}
