package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-2 curation operators: C4 line filter, Gopher flags, DSIR weights,
  * paragraph dedup, binary-quantized hamming search. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("c4CleanText keeps only punctuated >=3-word lines without chrome") {
    val text = Seq(
      "This line is a keeper.",            // kept
      "Too short.",                        // dropped: 2 words
      "no terminal punctuation here",      // dropped
      "Is this a keeper?\"",               // kept (quote after ?)
      "please enable JavaScript now.",     // dropped: javascript
      "Lorem Ipsum filler text here.",     // dropped: lorem ipsum
      "if (x) { return y; }.",             // dropped: brace
      "   padded but still a keeper.   "   // kept: trim applies
    ).mkString("\n")
    val out = Seq(text).toDF("t")
      .select(Corpus.c4CleanText(col("t")).as("c")).as[String].head()
    assert(out.split("\n").toSeq == Seq(
      "This line is a keeper.",
      "Is this a keeper?\"",
      "   padded but still a keeper.   "))
  }

  test("gopherFlags: crafted text trips each rule independently") {
    def flags(t: String) = Seq(t).toDF("t")
      .select(TextAnalysis.gopherFlags(col("t")).as("g")).select("g.*").head()
    val good = (1 to 60).map(i => s"word${i % 9}").mkString(" ") +
      " the and of that have with"
    val g = flags(good)
    assert(g.getAs[Boolean]("pass"))
    assert(g.getAs[Long]("n_words") == 66)
    // word count too low
    assert(!flags("the and of words here.").getAs[Boolean]("pass"))
    // bullets dominate
    val bullets = (1 to 20).map(_ => "- item listed here").mkString("\n")
    assert(flags(bullets).getAs[Double]("bullet_frac") == 1.0)
    // symbol ratio
    val hashy = (1 to 60).map(_ => "###").mkString(" ") + " the and"
    assert(!flags(hashy).getAs[Boolean]("pass"))
  }

  test("dsirWeights: target-typical docs outrank raw-typical docs") {
    val target = (1 to 20).map(i => (i.toLong, "alpha beta gamma delta", true))
    val raw = (21 to 40).map(i => (i.toLong, "omega psi chi phi", false))
    val probeT = Seq((100L, "alpha beta gamma delta", false))
    val probeR = Seq((101L, "omega psi chi phi", false))
    val df = (target ++ raw ++ probeT ++ probeR).toDF("id", "text", "tgt")
    val w = TextAnalysis.dsirWeights(df, "id", "text", col("tgt"))
      .select("id", "dsir_weight").as[(Long, Double)].collect().toMap
    // the smoothing mass (buckets >> corpus) shifts absolute values, so
    // only the ORDERING is the invariant: target-like beats raw-like
    assert(w(100L) > w(101L))
  }

  test("paragraphDedup: keep-first across docs, within-doc repeats, order preserved") {
    val docs = Seq(
      (1L, "AAA\n\nBBB\n\nAAA"),   // within-doc repeat of AAA dropped
      (2L, "BBB\n\nCCC"),          // BBB already seen in doc 1
      (3L, "  \n\nCCC")            // blank paragraph ignored; CCC seen
    ).toDF("id", "body")
    val out = Corpus.paragraphDedup(docs, "id", "body")
      .select("id", "dedup_text", "n_kept")
      .as[(Long, String, Long)].collect().toMap2
    assert(out(1L) == ("AAA\n\nBBB", 2L))
    assert(out(2L) == ("CCC", 1L))
    assert(out(3L) == ("", 0L))
  }

  test("jaccardSetJoin (prefix filter) is complete vs brute force, incl. hot-token pairs") {
    val r = new scala.util.Random(13)
    // sets over a small universe so overlaps are common AND every token is
    // frequent — the regime where the maxDf-guarded variant loses pairs
    val universe = (1 to 30).map(i => s"t$i")
    val rows = (1L to 80L).map { i =>
      (i, r.shuffle(universe).take(5 + r.nextInt(10)).toArray)
    }
    val got = Dedup.jaccardSetJoin(rows.toDF("id", "s"), "id", "s", 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      uni = sa.toSet.union(sb.toSet).size
      if inter.toDouble / uni >= 0.6
    } yield (ia, ib)).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // fixture actually exercises the join
  }

  test("hammingTopK matches brute force") {
    val r = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i => (i, Array.fill(64)(r.nextGaussian())))
    val q = Array.fill(64)(r.nextGaussian())
    val got = Similarity.hammingTopK(
        vecs.toDF("id", "v"), "id", "v", q, 15)
      .select("id", "hamming").as[(Long, Int)].collect().toSeq
    def bits(v: Array[Double]) = v.map(x => if (x >= 0) 1 else 0)
    val qb = bits(q)
    val expected = vecs.map { case (id, v) =>
      (id, bits(v).zip(qb).count { case (a, b) => a != b })
    }.sortBy { case (id, h) => (h, id) }.take(15)
    assert(got == expected)
  }

  test("winnowing fingerprints: min-over-windows, case-insensitive, short/empty text") {
    TextRegistry.register(spark)
    // both variants equal an independent min-over-char-windows recompute
    val t = "The quick brown fox jumps over the lazy dog"
    def windows(s: String, w: Int) =
      (0 to s.length - w).map(i => s.substring(i, i + w))
    assert(TextKernels.fingerprint(t, 8) ==
      windows(t.toLowerCase, 8).map(TextKernels.hash64(_, 1L)).min)
    assert(TextKernels.fingerprintMd5(t, 8) ==
      windows(t.toLowerCase, 8).map(TextKernels.md5Hash60).min)
    // case-insensitive; whitespace-sensitive (char shingles, not tokens)
    assert(TextKernels.fingerprintMd5(t.toUpperCase, 8) ==
      TextKernels.fingerprintMd5(t, 8))
    assert(TextKernels.fingerprintMd5(t.replace(" ", "  "), 8) !=
      TextKernels.fingerprintMd5(t, 8))
    // shorter than the shingle: one window of the whole text; empty: 0
    assert(TextKernels.fingerprintMd5("abc", 8) == TextKernels.md5Hash60("abc"))
    assert(TextKernels.fingerprintMd5("", 8) == 0L)
    assert(TextKernels.fingerprint("", 8) == 0L)
    // SQL registry wiring matches the kernels
    val (sqlNative, sqlMd5) = spark.sql(
        s"SELECT doc_fingerprint('$t', 8), fingerprint_md5('$t', 8)")
      .as[(Long, Long)].head()
    assert(sqlNative == TextKernels.fingerprint(t, 8))
    assert(sqlMd5 == TextKernels.fingerprintMd5(t, 8))
  }

  private implicit class ToMap2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
