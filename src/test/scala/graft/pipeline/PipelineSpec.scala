package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark sql engines"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id representative") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 4) // row 4 deduped
    assert(out.filter($"text".contains("lazy dog")).select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("exactGroups reports group sizes") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").filter($"dup_count" > 1).collect()
    assert(g.length == 1 && g(0).getAs[Long]("dup_count") == 2 && g(0).getAs[Long]("representative") == 1L)
  }

  test("minhash LSH finds the near-dup pair and the exact pair") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash pairs: identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
  }

  test("token jaccard pairs via inverted index") {
    val pairs = Dedup.tokenJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)))
  }

  test("ngram_jaccard expression: exact values") {
    val v = docs.filter($"doc_id" === 1)
      .selectExpr("ngram_jaccard(text, 'the quick brown fox jumps over the lazy dog', 2)")
      .head.getDouble(0)
    assert(v == 1.0)
  }

  test("embedding near-dup + brute-force topk agree on self-similarity") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val dups = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", dim = 4, planes = 8,
      threshold = 0.95).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((1L, 4L)))
    assert(!dups.exists(p => p._2 == 3L && p._1 == 1L))

    val topk = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Array(1.0, 0.0, 0.0, 0.0), 2).select("vec_id").as[Long].collect().toSeq
    assert(topk.toSet == Set(1L, 4L)) // both cosine 1.0
  }

  test("lshTopK recall on clustered vectors") {
    val vecs = (0 until 50).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0f, 0f, 0f) else Array(0f, 1.0f, 0f, 0f)
      (i.toLong, base.map(v => v + (i % 7) * 0.01f))
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Array(1.0, 0, 0, 0), 5)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(vecs, "vec_id", "embedding", Array(1.0, 0, 0, 0), 5,
      numPlanes = 8, maxProbeHamming = 2).select("vec_id").as[Long].collect().toSet
    assert((exact intersect approx).size >= 3) // recall >= 0.6 on this easy set
  }

  test("knnJoin ranks per query") {
    val data = Seq((1L, Array(1.0f, 0f)), (2L, Array(0f, 1.0f)), (3L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0f))).toDF("q_id", "q_vec")
    val out = Similarity.knnJoin(data, q, "vec_id", "embedding", "q_id", "q_vec", 2)
      .select("vec_id", "rank").as[(Long, Int)].collect().toMap
    assert(out(1L) == 1 && out(3L) == 2)
  }

  test("text analysis metrics") {
    val m = TextAnalysis.analyze(docs, "doc_id", "text").filter($"doc_id" === 1).head()
    assert(m.getAs[Int]("n_tokens") == 9)
    assert(m.getAs[Int]("n_chars") == 43)
    assert(m.getAs[String]("lang_pred") == "en")
    val empty = TextAnalysis.analyze(docs, "doc_id", "text").filter($"doc_id" === 5).head()
    assert(empty.getAs[Int]("n_tokens") == 0)
    assert(empty.getAs[String]("lang_pred") == "und")
  }

  test("multimodal: decode/extract/sample plumbing shapes") {
    val media = Seq(
      (1L, Array[Byte](1, 2, 3, 4), 1000L),
      (2L, null.asInstanceOf[Array[Byte]], 2500L)
    ).toDF("media_id", "payload", "duration_ms")
    val dec = Multimodal.decodeImages(media, "payload")
    assert(dec.columns.contains("decoded_width") && dec.count() == 2)
    assert(dec.filter($"media_id" === 2).head.getAs[Int]("decoded_width") == 0)
    val feat = Multimodal.extractFeatures(media, "payload", dim = 8)
    assert(feat.head.getAs[scala.collection.Seq[Float]]("features").length == 8)
    // determinism: same payload -> same features
    val f1 = Multimodal.extractFeatures(media, "payload", 8).filter($"media_id" === 1)
      .head.getAs[scala.collection.Seq[Float]]("features")
    val f2 = Multimodal.extractFeatures(media, "payload", 8).filter($"media_id" === 1)
      .head.getAs[scala.collection.Seq[Float]]("features")
    assert(f1 == f2)
    val frames = Multimodal.sampleFrames(media, "duration_ms", 400L)
    assert(frames.filter($"media_id" === 1).count() == 3) // 0,400,800
    assert(frames.filter($"media_id" === 2).count() == 7) // 0..2400 step 400
  }
}
