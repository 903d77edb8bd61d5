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

  test("winnowing: kernel matches a naive reference; density guarantee holds") {
    // naive reference of the same selection rule
    def ref(text: String, k: Int, w: Int): Set[Long] = {
      val t = text.toLowerCase
      val n = t.length - (k - 1)
      if (n < w) return Set.empty
      val h = (0 until n).map(i => TextKernels.md5Hash60(t.substring(i, i + k)))
      (w - 1 until n).map { q =>
        val win = (q - (w - 1)) to q
        val m = win.map(h).min
        h(win.filter(p => h(p) == m).max) // rightmost min
      }.toSet
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away",
      "aaaaaaaaaaaaaaaaaaaaaa", // heavy hash ties exercise the rightmost rule
      "abcabcabcabcabcabcabc", // periodic text: repeated gram hashes
      "short", // below k + w - 1: no fingerprints
      "exactly11ch") // boundary: exactly k + w - 1 chars -> one window
    for (s <- texts) {
      val got = TextKernels.winnowFingerprints(s, 8, 4)
      assert(got.toSet == ref(s, 8, 4), s"mismatch for '$s'")
      assert(got.length == got.distinct.length, "kernel output must be distinct")
    }
    // density guarantee: any window of w consecutive grams contains a
    // selected gram, so a doc with n >= w grams fingerprints non-empty
    assert(TextKernels.winnowFingerprints("exactly11ch", 8, 4).nonEmpty)
    // shared-substring guarantee: two docs sharing a long substring share
    // at least one fingerprint
    val core = "this exact shared passage is long enough to fingerprint"
    val f1 = TextKernels.winnowFingerprints("prefix one " + core, 8, 4).toSet
    val f2 = TextKernels.winnowFingerprints(core + " suffix two", 8, 4).toSet
    assert(f1.intersect(f2).nonEmpty)
  }

  test("winnowing: Winnow.fingerprints + sharedPairs find the near-dup pair") {
    val fp = Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 4)
    val pairs = Winnow.sharedPairs(fp, "doc_id", minBucket = 2, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // docs 1 and 4 are identical -> share every fingerprint; 1-2 and 2-4
    // share the common-prefix fingerprints
    val exact = pairs.find(p => p._1 == 1L && p._2 == 4L)
    assert(exact.isDefined, s"exact-dup pair missing from $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L))
    val fp1 = fp.filter(col("doc_id") === 1L).count()
    assert(exact.get._3 == fp1, "identical docs must share all fingerprints")
  }

  test("window_distinct_counts matches the naive per-window distinct") {
    def ref(toks: Array[String], w: Int): Seq[Int] =
      if (toks.length < w) Seq.empty
      else (0 to toks.length - w).map(i => toks.slice(i, i + w).distinct.length)
    val cases = Seq(
      ("a b a c a b d e".split(" "), 3),
      ("x x x x x".split(" "), 2),
      ("a b c d".split(" "), 4), // exactly one window
      ("a b c".split(" "), 4), // below one window -> empty
      (Array.empty[String], 3))
    for ((toks, w) <- cases)
      assert(TextKernels.windowDistinctCounts(toks, w).toSeq == ref(toks, w),
        s"toks=${toks.mkString(",")} w=$w")
  }

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
    // duration <= 0 emits no frames (FakeCodec.frameOffsets parity)
    val zero = Seq((3L, Array[Byte](1), 0L), (4L, Array[Byte](1), -5L))
      .toDF("media_id", "payload", "duration_ms")
    assert(Multimodal.sampleFrames(zero, "duration_ms", 400L).count() == 0)
  }

  test("md5Hash60 equals DuckDB's ('0x' || substr(md5(s),1,15))::BIGINT") {
    // md5('abc') = 900150983cd24fb0... => 0x900150983cd24fb
    assert(TextKernels.md5Hash60("abc") == 648541476951500027L)
    assert(TextKernels.md5Hash60("") == 0xd41d8cd98f00b20L) // md5('') = d41d8cd98f00b204...
  }

  test("simhashPairsMd5 finds exact dups at hamming 0") {
    val pairs = Dedup.simhashPairsMd5(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("textCounts equals the java-regex reference on randomized strings") {
    // deterministic pseudo-property test (no scalatest-scalacheck bridge
    // offline): 500 random strings over a char set that stresses every
    // class boundary, compared against the regexes the kernel replaced
    val rnd = new scala.util.Random(42)
    val alphabet =
      "aZ09 .,;:!?\t\n\f\r-_#é丁" + "\uD83D\uDE00" // + surrogate halves: adjacency forms pairs AND lone surrogates
    def randomString(): String =
      Array.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val tokRe = "\\S+".r
    val subRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val punctRe = "[.,;:!?]".r
    val upperRe = "[A-Z]".r
    (0 until 500).foreach { _ =>
      val s = randomString()
      val got = TextKernels.textCounts(s)
      assert(got(0) == tokRe.findAllIn(s).length, s"tokens for ${s.take(40)}")
      assert(got(1) == subRe.findAllIn(s).length, s"subwords for ${s.take(40)}")
      assert(got(2) == punctRe.findAllIn(s).length, s"punct for ${s.take(40)}")
      assert(got(3) == upperRe.findAllIn(s).length, s"upper for ${s.take(40)}")
    }
  }

  test("text_stats matches the regex semantics it replaced") {
    val rows = Seq(
      (1L, "Hello, World! 42 abc42x"),
      (2L, "  leading  and   trailing  "),
      (3L, ""),
      (4L, "a.b,c;d:e!f?g")
    ).toDF("id", "t")
    TextRegistry.register(spark)
    val got = rows.selectExpr("id",
        "text_stats(t) AS ts",
        "size(regexp_extract_all(t, '\\\\S+', 0)) AS rt",
        "size(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)) AS rs",
        "size(regexp_extract_all(t, '[.,;:!?]', 0)) AS rp",
        "size(regexp_extract_all(t, '[A-Z]', 0)) AS ru")
      .collect()
    got.foreach { r =>
      val ts = r.getStruct(1)
      assert(ts.getInt(0) == r.getInt(2), s"tokens id=${r.getLong(0)}")
      assert(ts.getInt(1) == r.getInt(3), s"subwords id=${r.getLong(0)}")
      assert(ts.getInt(2) == r.getInt(4), s"punct id=${r.getLong(0)}")
      assert(ts.getInt(3) == r.getInt(5), s"upper id=${r.getLong(0)}")
    }
  }

  test("cosine_sim expression equals scala reference and handles zero vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))
    ).toDF("id", "a", "b")
    TextRegistry.register(spark)
    val out = vecs.selectExpr("id", "cosine_sim(a, b) AS c").as[(Long, Double)].collect().toMap
    val expect = (4.0 + 10.0 + 18.0) / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(out(1L) - expect) < 1e-12)
    assert(out(2L) == 0.0)
  }

  test("dtw_distance matches a full-matrix reference, is symmetric, zero on identity") {
    def refDtw(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length; val m = b.length
      val dp = Array.fill(n, m)(0.0)
      for (i <- 0 until n; j <- 0 until m) {
        val c = math.abs(a(i) - b(j))
        dp(i)(j) = c + ((i, j) match {
          case (0, 0) => 0.0
          case (0, _) => dp(0)(j - 1)
          case (_, 0) => dp(i - 1)(0)
          case _      => math.min(math.min(dp(i - 1)(j), dp(i - 1)(j - 1)), dp(i)(j - 1))
        })
      }
      dp(n - 1)(m - 1)
    }
    val a = Array(0.1, 0.5, 0.9, 0.4, 0.2)
    val b = Array(0.2, 0.2, 0.8, 0.9, 0.1, 0.3)
    TextRegistry.register(spark)
    val rows = Seq((1L, a, b), (2L, b, a), (3L, a, a),
      (4L, Array.empty[Double], b)).toDF("id", "a", "b")
    val out = rows.selectExpr("id", "dtw_distance(a, b) AS d").as[(Long, Double)].collect().toMap
    assert(out(1L) == refDtw(a, b))       // rolling buffer == full matrix, bit-equal
    assert(out(2L) == out(1L))            // |.| cost is symmetric
    assert(out(3L) == 0.0)                // perfect alignment
    assert(out(4L) == 0.0)                // documented empty-input degenerate case
    // warping beats lockstep on a shifted series: DTW(a, shift(a)) < L1(a, shift(a))
    val shifted = Array(0.1, 0.1, 0.5, 0.9, 0.4)
    val l1 = a.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    assert(refDtw(a, shifted) < l1)
  }

  test("lcs_length matches a full-matrix reference; empty and null-element cases") {
    def refLcs(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.fill(a.length + 1, b.length + 1)(0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
                   else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val a = Seq("v", "c", "p", "v", "s", "c")
    val b = Seq("c", "v", "p", "s", "v")
    TextRegistry.register(spark)
    val rows = Seq((1L, a, b), (2L, a, a), (3L, Seq.empty[String], b)).toDF("id", "a", "b")
    val out = rows.selectExpr("id", "lcs_length(a, b) AS l").as[(Long, Int)].collect().toMap
    assert(out(1L) == refLcs(a, b))
    assert(out(2L) == a.length)
    assert(out(3L) == 0)
    // null elements never match (SQL semantics)
    val withNull = spark.sql(
      "SELECT lcs_length(array('x', cast(null as string), 'y'), array('x', 'y')) AS l")
      .as[Int].head()
    assert(withNull == 2)
  }

  test("ivf: train + probe-all equals brute force; fewer probes stays subset-consistent") {
    val vecs = (0 until 60).map { i =>
      val base = i % 3 match {
        case 0 => Array(1.0f, 0f, 0f, 0f)
        case 1 => Array(0f, 1.0f, 0f, 0f)
        case _ => Array(0f, 0f, 1.0f, 0f)
      }
      (i.toLong, base.map(v => v + (i % 5) * 0.02f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding", k = 3, iters = 2)
    assert(cents.length == 3 && cents.forall(_.length == 4))
    val q = Array(1.0, 0.0, 0.0, 0.0)
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    val all = Similarity.ivfTopK(vecs, "vec_id", "embedding", cents, q, 5, nProbe = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == exact) // probing every cell is exhaustive
    val one = Similarity.ivfTopK(vecs, "vec_id", "embedding", cents, q, 5, nProbe = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(one == exact) // clustered data: the query's own cell holds the top-k
  }

  test("calibrateNProbe: full sweep reaches 1.0, chosen is the smallest budget over target") {
    // 3 tight clusters (same synth as the IVF test): a query's own cell
    // holds most of its true top-k, so recall must be high at nProbe=1
    // and EXACTLY 1.0 at nProbe=3 (probing every cell is exhaustive)
    val vecs = (0 until 60).map { i =>
      val base = i % 3 match {
        case 0 => Array(1.0f, 0f, 0f, 0f)
        case 1 => Array(0f, 1.0f, 0f, 0f)
        case _ => Array(0f, 0f, 1.0f, 0f)
      }
      (i.toLong, base.map(v => v + (i % 5) * 0.02f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding", k = 3, iters = 2)
    val cal = Similarity.calibrateNProbe(vecs, "vec_id", "embedding", cents,
        k = 5, targetRecall = 0.99, nQueries = 6)
      .orderBy("n_probe")
      .as[(Int, Long, Double, Boolean)].collect().toSeq
    assert(cal.map(_._1) == Seq(1, 2, 3))
    assert(cal.last._3 == 1.0, s"full sweep must be exact: $cal")
    // recall is monotone in the budget
    assert(cal.sliding(2).forall(p => p.head._3 <= p.last._3))
    // exactly one chosen row, and it is the smallest budget >= target
    val chosen = cal.filter(_._4)
    assert(chosen.length == 1)
    assert(chosen.head._1 == cal.find(_._3 >= 0.99).map(_._1).getOrElse(3))
    // determinism across partitionings
    val again = Similarity.calibrateNProbe(vecs.repartition(7), "vec_id", "embedding",
        cents, k = 5, targetRecall = 0.99, nQueries = 6)
      .orderBy("n_probe").as[(Int, Long, Double, Boolean)].collect().toSeq
    assert(again == cal)
  }

  test("Corpus.clean composes quality floor, lang filter, exact dedup") {
    val corpus = Seq(
      (1L, ("the quick brown fox is in the house and it was fine " * 5).trim), // en, long
      (2L, ("the quick brown fox is in the house and it was fine " * 5).trim), // exact dup
      (3L, "zz qq ww"),                                                        // und
      (4L, "the fox")                                                          // en but too short
    ).toDF("doc_id", "text")
    val out = Corpus.clean(corpus, "doc_id", "text", minQuality = 0.9, langs = Seq("en"))
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("exact embedding near-dup pairs match threshold semantics") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupExact(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("pca topComponent: dominant axis, bit-identical across partitionings") {
    val vecs = (0 until 40).map { i =>
      val t = (i % 21 - 10).toFloat // variance concentrated on axis 1
      (i.toLong, Array(0.01f * (i % 3), t, 0.05f * (i % 5), 0.0f))
    }.toDF("vec_id", "embedding")
    val (mu, v, lambda) = Pca.topComponent(vecs, "embedding", dim = 4, iters = 5)
    assert(math.abs(v(1)) > 0.99)
    assert(lambda > 25.0) // ~uniform(-10..10) variance
    assert(math.abs(mu(3)) < 1e-12)
    val (mu2, v2, lambda2) = Pca.topComponent(vecs.repartition(7), "embedding", 4, 5)
    assert(mu2.sameElements(mu) && v2.sameElements(v) && lambda2 == lambda)
  }

  test("bpeMerges: frequency order, lexicographic ties, greedy merge application") {
    // "ab" x3, "abc" x2 -> pair (a,b) freq 5 wins round 1; round 2 merges
    // (ab, c) freq 2
    val docs = Seq("ab ab abc", "ab abc").toDF("text")
    val merges = Bpe.bpeMerges(docs, "text", rounds = 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "a", "b", 5L), (2, "ab", "c", 2L)))

    // overlapping run: the space-bounded replace consumes the shared
    // boundary, so 'aaaa' merges to (aa, a, a) — the documented
    // deviation from rescanning BPE, shared exactly by SQL `replace`
    val run = Seq("aaaa aaaa").toDF("text")
    val m1 = Bpe.bpeMerges(run, "text", rounds = 1)
      .as[(Int, String, String, Long)].head()
    assert(m1 == ((1, "a", "a", 6L))) // 3 adjacencies per word x 2 words
    val enc = Bpe.bpeEncode(run.withColumn("id", lit(1L)), "id", "text",
        Seq(("a", "a")))
      .select("word_pos", "sym_pos", "symbol").as[(Int, Int, String)].collect().toSet
    assert(enc == Set((0, 0, "aa"), (0, 1, "a"), (0, 2, "a"),
      (1, 0, "aa"), (1, 1, "a"), (1, 2, "a")))
  }

  test("driver-exact BPE == distributed sequential BPE (unicode, runs, re-pickable pairs)") {
    // corner inventory: astral-plane code points (surrogate pairs), a
    // same-symbol run ('aaaa' — the non-rescanning replace corner), and
    // ' a b a b ' words where the merged pair SURVIVES its own merge
    // (' ab a b ') and may be re-picked in a later round
    val tricky = Seq(
      "abab abab abab cd cd", "aaaa aaaa baaa", "x𝄞x x𝄞x y",
      "the quick brown fox", "the quick brown cat", "ababab cdcd",
      "mississippi banana bandana", "", "  spaced   out  ").toDF("text")
    val fast = Bpe.bpeMerges(tricky, "text", rounds = 30)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    spark.conf.set("graft.bpe.maxDriverVocab", "0") // force the distributed loop
    val slow =
      try Bpe.bpeMerges(tricky, "text", rounds = 30)
        .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
      finally spark.conf.unset("graft.bpe.maxDriverVocab")
    assert(fast == slow, s"driver path diverged:\n  fast=$fast\n  slow=$slow")
    assert(fast.nonEmpty)
  }

  test("driver-exact BPE: 256 merges at O(1) Spark jobs") {
    val chars = (0 until 512).map(i => (0x4E00 + i).toChar)
    val words = (0 until 256).map { i =>
      val a = chars(2 * i); val b = chars(2 * i + 1); s"$a$b$a$b$a$b"
    }
    val docs = words.grouped(16).map(_.mkString(" ")).toSeq.toDF("text")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val merges =
      try {
        val m = Bpe.bpeMerges(docs, "text", rounds = 256) // batchK=1: exact path
          .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
        val deadline = System.currentTimeMillis + 5000
        var last = -1
        while (System.currentTimeMillis < deadline && jobs != last) {
          last = jobs; Thread.sleep(200)
        }
        m
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(merges.length == 256)
    assert(merges.map(_._1) == (1 to 256), "merge numbering stays sequential")
    assert(jobs <= 6, s"driver-exact path used $jobs jobs; sequential needs 256")
  }

  test("WordPiece picks by likelihood, not frequency") {
    // 't h'/'h e' have freq 10 but common symbols (score 10/100);
    // 'q u' has freq 2 but q and u appear ONLY together (score 2/4) —
    // WordPiece must take 'q u' first where BPE takes 'h e'
    val docs = (Seq.fill(10)("the") ++ Seq.fill(2)("qu")).toDF("text")
    val wp = Bpe.wordPieceMerges(docs, "text", rounds = 1)
      .select("lhs", "rhs", "freq").as[(String, String, Long)].head()
    assert(wp == (("q", "u", 2L)))
    val bpe = Bpe.bpeMerges(docs, "text", rounds = 1)
      .select("lhs", "rhs", "freq").as[(String, String, Long)].head()
    assert(bpe == (("h", "e", 10L)))
  }

  test("driver-exact WordPiece == distributed sequential WordPiece") {
    val tricky = Seq(
      "abab abab abab cd cd", "aaaa aaaa baaa", "x𝄞x x𝄞x y",
      "the quick brown fox", "the quick brown cat", "ababab cdcd",
      "mississippi banana bandana", "", "  spaced   out  ").toDF("text")
    val fast = Bpe.wordPieceMerges(tricky, "text", rounds = 25)
      .orderBy("round").as[(Int, String, String, Long, Double)].collect().toSeq
    spark.conf.set("graft.bpe.maxDriverVocab", "0") // force the distributed loop
    val slow =
      try Bpe.wordPieceMerges(tricky, "text", rounds = 25)
        .orderBy("round").as[(Int, String, String, Long, Double)].collect().toSeq
      finally spark.conf.unset("graft.bpe.maxDriverVocab")
    // exact equality including the double score — both paths must do the
    // same IEEE division over the same integer counts
    assert(fast == slow, s"driver path diverged:\n  fast=$fast\n  slow=$slow")
    assert(fast.nonEmpty)
  }

  test("batched BPE: 256 merges in >=10x fewer driver rounds than sequential") {
    // 256 designed-disjoint pairs over 512 distinct symbols: every round's
    // greedy symbol-disjoint filter can take a full batch, so the loop
    // finishes in ~256/batchK rounds (sequential BPE is 1 job per merge
    // by construction — 256 jobs)
    val chars = (0 until 512).map(i => (0x4E00 + i).toChar)
    val words = (0 until 256).map { i =>
      val a = chars(2 * i); val b = chars(2 * i + 1); s"$a$b$a$b$a$b"
    }
    val docs = words.grouped(16).map(_.mkString(" ")).toSeq.toDF("text")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val merges =
      try {
        val m = Bpe.bpeMerges(docs, "text", rounds = 256, batchK = 64)
          .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
        // listener delivery is async: wait for the count to settle
        val deadline = System.currentTimeMillis + 5000
        var last = -1
        while (System.currentTimeMillis < deadline && jobs != last) {
          last = jobs; Thread.sleep(200)
        }
        m
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(merges.length == 256)
    assert(merges.map(_._1) == (1 to 256), "merge numbering stays sequential")
    // round 1 must pick the 256 designed (a,b) pairs first: freq 3 per word
    assert(merges.take(64).forall(_._4 == 3L))
    assert(jobs <= 25, s"batched path used $jobs jobs; sequential needs 256")
  }

  test("semanticDedup: keep-first within cells, cross-cell dups survive") {
    // two well-separated clusters on orthogonal axes; centroids pinned
    // on the axes so cell assignment is unambiguous
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),   // cell 0, kept (lowest id in cell)
      (2L, Array(0.98f, 0.05f)), // cell 0, dup of 1 -> dropped
      (3L, Array(0.0f, 1.0f)),   // cell 1, kept (no earlier cell-mate)
      (4L, Array(0.05f, 0.98f)), // cell 1, dup of 3 -> dropped
      (5L, Array(0.9f, 0.44f))   // cell 0 but cos to 1/2 < 0.95 -> kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding", cents, threshold = 0.95)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false, 5L -> true))
    // partitioning invariance: same kept set under a different layout
    val out8 = Dedup.semanticDedup(vecs.repartition(8), "vec_id", "embedding", cents, 0.95)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out8 == out)
  }

  test("connected components: chain, clique, and singleton clusters") {
    // chain 1-2-3-4 (transitive closure), pair 10-11, triangle 20-21-22
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (5L, 5L) // self-loop must be ignored
    ).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(labels(_) == 20L))
    assert(!labels.contains(5L)) // self-loop-only node never entered the graph
  }

  test("connected components: deep path converges (log-round contraction)") {
    // a 64-node path is the adversarial case for star contraction; force the
    // distributed loop (localThreshold=0) so the large-star/small-star
    // rounds — not the driver union-find — do the collapsing to min-id 0
    spark.conf.set("spark.graft.cc.localThreshold", "0")
    try {
      val path = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val labels = Dedup.connectedComponents(path, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 64 && labels.values.forall(_ == 0L))
    } finally spark.conf.unset("spark.graft.cc.localThreshold")
  }

  test("deterministic sampling: stable across reruns and repartitioning") {
    val ids = spark.range(1000).toDF("id")
    val a = Corpus.sampleDeterministic(ids, "id", 0.3)
      .select("id").as[Long].collect().toSet
    val b = Corpus.sampleDeterministic(ids.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b) // same rows regardless of physical layout
    assert(math.abs(a.size - 300) < 60) // rate holds statistically
    // monotone: a higher rate strictly contains a lower one
    val c = Corpus.sampleDeterministic(ids, "id", 0.6)
      .select("id").as[Long].collect().toSet
    assert(a.subsetOf(c))
  }

  test("mixture sampling: absent sources drop, weights apply per source") {
    val df = spark.range(600).selectExpr(
      "id", "CASE WHEN id % 3 = 0 THEN 'web' WHEN id % 3 = 1 THEN 'books' ELSE 'junk' END AS src")
    val out = Corpus.mixture(df, "id", "src", Map("web" -> 1.0, "books" -> 0.5))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out("web") == 200) // rate 1.0 keeps everything
    assert(out.get("junk").isEmpty) // unlisted source dropped entirely
    assert(out("books") > 50 && out("books") < 150)
  }

  test("corpus stats aggregates docs/tokens/chars per group") {
    val out = Corpus.stats(docs, "doc_id", "text")
      .filter($"doc_id" === 1L).head()
    assert(out.getAs[Long]("n_docs") == 1L)
    assert(out.getAs[Long]("n_tokens") == 9L)
    assert(out.getAs[Long]("n_chars") == 43L)
  }

  test("assignComponents labels isolated nodes as their own component") {
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.assignComponents(nodes, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L))
  }

  test("redactPii scrubs emails, IPs, and phones; counts audit the original") {
    val df = Seq(
      "write bob.smith+x@corp.example.com from 192.168.1.20 or +44 020-7946",
      "no pii here at all",
      "two mails a@b.io c@d.org").toDF("t")
    val out = df.select(
      Corpus.redactPii($"t").as("r"),
      Corpus.piiCounts($"t")._1.as("ne"),
      Corpus.piiCounts($"t")._2.as("ni"),
      Corpus.piiCounts($"t")._3.as("np")).as[(String, Long, Long, Long)].collect()
    assert(out(0)._1 == "write <EMAIL> from <IP> or <PHONE>")
    assert((out(0)._2, out(0)._3, out(0)._4) == (1L, 1L, 1L))
    assert(out(1)._1 == "no pii here at all" && out(1)._2 == 0L)
    assert(out(2)._1 == "two mails <EMAIL> <EMAIL>" && out(2)._2 == 2L)
  }

  test("stratifiedSampleN: exact n per stratum, prune matches unpruned window") {
    val df = spark.range(2000).selectExpr("id", "cast(id % 3 as string) AS s")
    val sampled = Corpus.stratifiedSampleN(df, "s", "id", 25)
      .select("s", "sample_rank", "id").as[(String, Int, Long)].collect()
    assert(sampled.groupBy(_._1).forall(_._2.length == 25))
    // oracle: plain global window, no prefilter
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"s").orderBy(md5($"id".cast("string")), $"id")
    val expect = df.withColumn("sample_rank", row_number().over(w))
      .filter($"sample_rank" <= 25)
      .select("s", "sample_rank", "id").as[(String, Int, Long)].collect()
    assert(sampled.sortBy(r => (r._1, r._2)).toSeq == expect.sortBy(r => (r._1, r._2)).toSeq)
    // under-filled strata (fewer rows than n) keep everything, ranked
    val tiny = spark.range(10).selectExpr("id", "'only' AS s")
    assert(Corpus.stratifiedSampleN(tiny, "s", "id", 25).count() == 10)
  }

  test("stripBoilerplate drops frequent lines, keeps order, empties all-chrome docs") {
    val df = Seq(
      (1L, "unique alpha\nCOOKIE BANNER\nunique beta"),
      (2L, "COOKIE BANNER\nunique gamma"),
      (3L, "unique delta\nCOOKIE BANNER"),
      (4L, "COOKIE BANNER"), // nothing but chrome
      (5L, "unique epsilon\n\nunique zeta") // blank line is never boilerplate
    ).toDF("doc_id", "t")
    val out = Corpus.stripBoilerplate(df, "doc_id", "t", 0.5)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out(0)._2 == "unique alpha\nunique beta")
    assert(out(1)._2 == "unique gamma")
    assert(out(2)._2 == "unique delta")
    assert(out(3)._2 == "") // present, empty — not dropped
    assert(out(4)._2 == "unique epsilon\n\nunique zeta")
    // under the threshold nothing is removed
    val loose = Corpus.stripBoilerplate(df, "doc_id", "t", 0.9)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(loose(0)._2 == "unique alpha\nCOOKIE BANNER\nunique beta")
  }

  test("dedupAgainstHistory keeps exactly the new distinct content") {
    val history = (1L to 200L).map(i => (i, s"old doc $i")).toDF("doc_id", "text")
    val incoming = (
      (1L to 50L).map(i => (1000 + i, s"old doc $i")) ++ // re-crawls
      (1L to 30L).map(i => (2000 + i, s"new doc $i")) ++ // new
      (1L to 30L).map(i => (3000 + i, s"new doc $i")) // within-batch dups
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstHistory(incoming, history, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._2).toSet == (1L to 30L).map(i => s"new doc $i").toSet)
    assert(out.map(_._1).toSeq == (1L to 30L).map(2000 + _), "smallest id wins")
    // null content is never "in history" (anti-join semantics): it must
    // survive into the batch dedup, not silently vanish in the bloom
    val withNull = incoming.unionAll(
      Seq((9000L, null.asInstanceOf[String]), (9001L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val outN = Dedup.dedupAgainstHistory(withNull, history, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(outN.contains(9000L), s"null-content row dropped: $outN")
  }

  test("nearDupStreaming drops same-fingerprint re-posts within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val input = MemoryStream[(Timestamp, Long, String)]
    val stream = input.toDF().toDF("ts", "id", "text")
    val out = Dedup.nearDupStreaming(stream, "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(
        (t(1), 1L, "the quick brown fox jumps over the lazy dog"),
        (t(2), 2L, "completely different content about spark plans"),
        // same token multiset as doc 1 (reordered) => same SimHash
        (t(3), 3L, "the lazy dog jumps over the quick brown fox"))
      q.processAllAvailable()
      val ids = spark.table("neardup_stream").select("id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L), s"expected near-dup 3 dropped, got $ids")
    } finally q.stop()
  }

  test("scrubRepeatedSpans masks cross-doc template spans, keeps unique text") {
    val slogan = "buy our product now it is great"  // 7 tokens
    val df = Seq(
      (1L, s"alpha beta gamma $slogan delta"),
      (2L, s"epsilon $slogan zeta eta"),
      (3L, s"theta iota $slogan"),
      (4L, "kappa lambda mu nu xi omicron pi rho")
    ).toDF("doc_id", "t")
    val out = Dedup.scrubRepeatedSpans(df, "doc_id", "t", 6, 3)
      .orderBy("doc_id")
      .select("doc_id", "scrubbed_text", "n_kept_tokens")
      .as[(Long, String, Long)].collect()
    // the 7-token slogan appears in 3 docs: its two 6-gram windows cover
    // all 7 tokens in each; unique surroundings survive in order
    assert(out(0)._2 == "alpha beta gamma delta")
    assert(out(1)._2 == "epsilon zeta eta")
    assert(out(2)._2 == "theta iota")
    assert(out(3)._2 == "kappa lambda mu nu xi omicron pi rho")
    assert(out.map(_._3).toSeq == Seq(4L, 3L, 2L, 8L))
    // below the doc threshold nothing is scrubbed
    val loose = Dedup.scrubRepeatedSpans(df, "doc_id", "t", 6, 4)
      .orderBy("doc_id").select("scrubbed_text").as[String].collect()
    assert(loose(0) == s"alpha beta gamma $slogan delta")
    // NULL / whitespace-only text follows the documented 'scrubbed to
    // nothing' contract: empty string + 0 kept tokens, never NULL
    val withNull = Seq((1L, Option(s"a b $slogan")), (2L, Option.empty[String]),
        (3L, Option("   "))).toDF("doc_id", "t")
    val nOut = Dedup.scrubRepeatedSpans(withNull, "doc_id", "t", 6, 2)
      .orderBy("doc_id")
      .select("scrubbed_text", "n_kept_tokens").as[(String, Long)].collect()
    assert(nOut(1) == (("", 0L)) && nOut(2) == (("", 0L)))
  }

  test("chunkTokens covers every token with the right overlap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc"), (3L, "   ")).toDF("doc_id", "text")
    val out = Corpus.chunkTokens(df, "text", 48, 8)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1: 100 tokens, stride 40 => chunks at 0, 40, 80
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2))
    assert(d1.map(_._4).toSeq == Seq(48L, 48L, 20L))
    assert(d1(0)._3.startsWith("t1 ") && d1(1)._3.startsWith("t41 "))
    assert(d1(0)._3.endsWith(" t48") && d1(1)._3.endsWith(" t88"))
    // consecutive chunks share the 8-token overlap
    assert(d1(0)._3.split(" ").takeRight(8).toSeq == d1(1)._3.split(" ").take(8).toSeq)
    // short doc => single partial chunk; whitespace-only doc => no chunks
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq(2L))
    assert(!out.exists(_._1 == 3L))
    // a tail shorter than the overlap must NOT produce a degenerate chunk
    // fully contained in the previous one (88 tokens: chunk 2 would be
    // tokens 81..88 = exactly chunk 1's overlap tail)
    val d88 = Corpus.chunkTokens(
        Seq((9L, (1 to 88).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
        "text", 48, 8)
      .select("chunk_id", "n_chunk_tokens").as[(Int, Long)].collect().sortBy(_._1)
    assert(d88.map(_._1).toSeq == Seq(0, 1), s"degenerate tail chunk: ${d88.toSeq}")
    assert(d88.map(_._2).toSeq == Seq(48L, 48L))
  }

  test("packSequences: offset sharding assigns docs to the shard they start in") {
    val df = (1L to 30L).map(i => (i, if (i % 2 == 0) "a" else "b",
      (1 to 50).map(j => s"w$j").mkString(" "))).toDF("doc_id", "source", "text")
    val out = Corpus.packSequences(df, "source", "doc_id", "text", 120)
      .select("source", "doc_id", "shard_id").as[(String, Long, Int)].collect()
    // 50 tokens/doc, budget 120, shard = floor(cumBefore/120):
    // cumBefore 0,50,100 -> 0; 150,200 -> 1; 250,300,350 -> 2; ...
    val expect = (0 until 15).map(i => (i * 50) / 120)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byDoc = rows.sortBy(_._2).map(_._3).toSeq
      assert(byDoc == expect, s"expected $expect, got $byDoc")
    }
  }

  test("oovRate: frequent tokens are in-vocab, rare ones out") {
    val df = Seq(
      (1L, "common common common rare1"),
      (2L, "common common rare2 rare3")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(df, "doc_id", "text", 1)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out(0) == ((1L, 4L, 1L, 0.25)))
    assert(out(1) == ((2L, 4L, 2L, 0.5)))
  }

  test("MMR: first pick is max-relevance, later picks trade off diversity") {
    val dim = 8
    // two tight clusters near the query + scattered tail
    def mk(seed: Int) = Array.tabulate(dim)(d => ((seed * 13 + d * 7) % 11 - 5) / 5.0)
    val a = Array.tabulate(dim)(d => if (d == 0) 1.0 else 0.01)
    val b = Array.tabulate(dim)(d => if (d == 1) 1.0 else 0.01)
    val rows = Seq(
      (1L, a), (2L, a.updated(2, 0.05)), (3L, a.updated(3, 0.08)),
      (4L, b), (5L, b.updated(2, 0.05))) ++
      (6L to 20L).map(i => (i, mk(i.toInt)))
    val df = rows.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
    val query = a.zip(b).map { case (x, y) => x + 0.5 * y }
    val out = Similarity.mmrTopK(df, "vec_id", "embedding", query, 4, lambda = 0.5)
      .orderBy("rank").as[(Int, Long, Double, Double)].collect()
    // rank 1 = plain max cosine
    assert(out(0)._2 == 1L, s"first pick ${out(0)._2}")
    // diversity: the b-cluster representative must appear before the
    // a-cluster near-duplicates exhaust the list
    val ids = out.map(_._2).toSeq
    assert(ids.take(2).contains(4L) || ids.take(2).contains(5L),
      s"no diverse pick in the top 2: $ids")
    // deterministic across reruns
    val again = Similarity.mmrTopK(df.repartition(5), "vec_id", "embedding", query, 4, lambda = 0.5)
      .orderBy("rank").as[(Int, Long, Double, Double)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("IVF-PQ with all cells probed equals plain PQ ADC; pruned probe keeps recall") {
    val dim = 16
    val vecs = (0L until 300L).map { i =>
      val c = (i % 6).toInt
      (i, Array.tabulate(dim)(d =>
        (if (d % 6 == c) 8f else 0f) + ((i * 11 + d) % 7).toFloat / 10f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val query = Array.tabulate(dim)(d => if (d % 6 == 2) 8.0 else 0.1)
    val coarse = Similarity.trainIvfCentroids(df, "vec_id", "embedding", k = 6)
    val books = Similarity.trainPqCodebooks(df, "vec_id", "embedding", m = 4, k = 8)
    val coded = df.select($"vec_id",
      graft.internal.exprColumn(NearestCentroid(
        graft.internal.columnExpr($"embedding"), coarse)).as("cell"),
      Similarity.pqEncodeCol($"embedding", books).as("pq_code"))
    val full = Similarity.ivfPqTopK(coded, "vec_id", "cell", "pq_code",
      coarse, books, query, 10, nProbe = 6).as[(Long, Double)].collect().toSeq
    val pq = Similarity.pqAdcTopK(coded, "vec_id", "pq_code", books, query, 10)
      .as[(Long, Double)].collect().toSeq
    assert(full == pq, "nProbe=all must equal unpruned PQ ADC")
    val pruned = Similarity.ivfPqTopK(coded, "vec_id", "cell", "pq_code",
      coarse, books, query, 10, nProbe = 2).select("vec_id").as[Long].collect().toSet
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(pruned.intersect(exact).size >= 5, s"IVF-PQ recall too low: ${pruned.intersect(exact).size}")
  }

  test("snapshotDiff labels added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newer = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val out = Corpus.snapshotDiff(old, newer, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("tokenDrift: identical snapshots give ~0 KL, real drift is larger") {
    val stable = Seq(("s1", "alpha beta gamma delta"), ("s1", "alpha beta epsilon"))
      .toDF("source", "text")
    val same = TextAnalysis.tokenDrift(stable, stable, "source", "text")
      .select("kl_divergence").as[Double].head()
    assert(same == 0.0, s"identical snapshots drifted: $same")
    val drifted = Seq(("s1", "zeta eta theta iota kappa lambda"))
      .toDF("source", "text")
    val kl = TextAnalysis.tokenDrift(stable, drifted, "source", "text")
      .select("kl_divergence").as[Double].head()
    assert(kl > 0.1, s"full vocabulary swap should drift hard: $kl")
    // partitioning-independent (decimal fold)
    val again = TextAnalysis.tokenDrift(stable.repartition(4), drifted, "source", "text")
      .select("kl_divergence").as[Double].head()
    assert(kl == again)
  }

  test("unigramLogProb ranks repetitive text above rare-token soup") {
    val df = Seq(
      (1L, "the the the the the the the the"), // all high-frequency
      (2L, "the the the xylophone quux"), // mixed
      (3L, "zzz9 qqq8 vvv7 kkk6") // all singletons
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(8L, 5L, 4L)) // token counts
    assert(out(0)._3 > out(1)._3 && out(1)._3 > out(2)._3,
      s"LM order wrong: ${out.map(_._3).toSeq}")
    // score is partitioning-independent (decimal fold)
    val again = TextAnalysis.unigramLogProb(df.repartition(5), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("PQ: ADC score equals cosine of the reconstructed vector") {
    val dim = 16
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(dim)(d => ((i * 31 + d * 17) % 23 - 11).toFloat / 7f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val query = Array.tabulate(dim)(d => ((d * 13) % 9 - 4) / 5.0)
    val books = Similarity.trainPqCodebooks(df, "vec_id", "embedding", m = 4, k = 8)
    val coded = df.select($"vec_id", Similarity.pqEncodeCol($"embedding", books).as("pq_code"))
    val top = Similarity.pqAdcTopK(coded, "vec_id", "pq_code", books, query, 200)
      .as[(Long, Double)].collect().toMap
    val codes = coded.as[(Long, Seq[Int])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    vecs.take(50).foreach { case (id, _) =>
      val recon = codes(id).zipWithIndex.flatMap { case (c, j) => books(j)(c) }.toArray
      assert(math.abs(top(id) - cos(query, recon)) < 1e-9,
        s"ADC ${top(id)} != reconstruction cosine ${cos(query, recon)} for $id")
    }
  }

  test("PQ: top-k recall against brute force is usable and encode is layout-stable") {
    val dim = 16
    // 8 well-separated cluster centers + small deterministic jitter
    val vecs = (0L until 400L).map { i =>
      val c = (i % 8).toInt
      (i, Array.tabulate(dim)(d =>
        (if (d % 8 == c) 10f else 0f) + ((i * 7 + d) % 5).toFloat / 10f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val query = Array.tabulate(dim)(d => if (d % 8 == 3) 10.0 else 0.1)
    val books = Similarity.trainPqCodebooks(df, "vec_id", "embedding", m = 4, k = 8)
    val coded = df.select($"vec_id", Similarity.pqEncodeCol($"embedding", books).as("pq_code"))
    val adc = Similarity.pqAdcTopK(coded, "vec_id", "pq_code", books, query, 20)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 20)
      .select("vec_id").as[Long].collect().toSet
    assert(adc.intersect(exact).size >= 10,
      s"PQ recall too low: ${adc.intersect(exact).size}/20")
    // codes don't depend on physical layout
    val again = df.repartition(7)
      .select($"vec_id", Similarity.pqEncodeCol($"embedding", books).as("pq_code"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(coded.as[(Long, Seq[Int])].collect().toMap == again)
  }

  test("SQ8: decode error bounded by half a step, top-k recall near-exact") {
    val dim = 16
    val vecs = (0L until 300L).map { i =>
      (i, Array.tabulate(dim)(d => ((i * 31 + d * 17) % 97).toFloat / 97f - 0.5f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.trainSqRange(df, "embedding", dim)
    assert(mins.length == dim && maxs.length == dim && mins.zip(maxs).forall { case (a, b) => a <= b })
    val coded = df.select($"vec_id",
      Similarity.sqEncodeCol($"embedding", mins, maxs).as("sq_code"))
    // codes are int8-range
    val codes = coded.select(explode($"sq_code")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c <= 127))
    // decode error <= step/2 per dimension
    val dec = df.select($"vec_id", $"embedding",
      Similarity.sqDecodeCol(Similarity.sqEncodeCol($"embedding", mins, maxs), mins, maxs).as("d"))
      .as[(Long, Seq[Float], Seq[Double])].collect()
    for ((_, orig, d) <- dec; i <- orig.indices) {
      val step = (maxs(i) - mins(i)) / 127.0
      assert(math.abs(orig(i) - d(i)) <= step / 2 + 1e-9)
    }
    val query = Array.tabulate(dim)(d => math.sin(d + 1.0))
    val sq = Similarity.sqTopK(coded, "vec_id", "sq_code", mins, maxs, query, 20)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 20)
      .select("vec_id").as[Long].collect().toSet
    assert(sq.intersect(exact).size >= 16, s"SQ8 recall too low: ${sq.intersect(exact).size}/20")
  }

  test("decontaminate flags only train docs sharing an n-gram with eval") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),        // shares 'alpha beta gamma' with eval
      (2L, "one two three four five six"),           // disjoint
      (3L, "the secret eval answer is forty two ok") // shares the long span
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma zeta"),
      (101L, "the secret eval answer is forty two")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // doc 1: exactly one shared 3-gram
    assert(out(0).getAs[Long]("n_shared") == 1L &&
      out(0).getAs[String]("sample_gram") == "alpha beta gamma")
    // doc 3: 'the secret eval answer is forty two' has 5 3-grams, all shared
    assert(out(1).getAs[Long]("n_shared") == 5L)
    // n larger than any shared span: nothing flagged
    assert(Dedup.decontaminate(train, eval, "doc_id", "text", n = 8).count() == 0)
  }

  test("upsample replicates by weight with exact expectation semantics") {
    val df = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b")).toDF("id", "src")
    val out = Corpus.upsample(df, "id", "src", Map("a" -> 2.5, "b" -> 0.25))
      .select("id", "copy").as[(Long, Int)].collect()
    val perId = out.groupBy(_._1).view.mapValues(_.length).toMap
    // every 'a' doc appears 2 or 3 times; copies are 1..n
    assert((1L to 100L).forall(i => perId.getOrElse(i, 0) == 2 || perId(i) == 3))
    // 'b' docs appear 0 or 1 times
    assert((101L to 200L).forall(i => perId.getOrElse(i, 0) <= 1))
    // deterministic across reruns
    val again = Corpus.upsample(df.repartition(9), "id", "src", Map("a" -> 2.5, "b" -> 0.25))
      .select("id", "copy").as[(Long, Int)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // unknown source drops
    assert(Corpus.upsample(df, "id", "src", Map("zzz" -> 1.0)).count() == 0)
  }

  test("buildVocab ranks deterministically; encodeIds maps OOV to -1 in order") {
    val docs = Seq(
      (1L, "b b a c"),
      (2L, "a b zebra")
    ).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", 3).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Int]("token_id")).toMap
    // counts: b=3, a=2, c=1, zebra=1 -> top3: b(1), a(2), c(3) (tie c < zebra)
    assert(vocab == Map("b" -> 1, "a" -> 2, "c" -> 3))
    val enc = TextAnalysis.encodeIds(docs, "doc_id", "text",
        TextAnalysis.buildVocab(docs, "text", 3))
      .orderBy("doc_id").select("ids").as[Seq[Int]].collect()
    assert(enc(0) == Seq(1, 1, 2, 3))
    assert(enc(1) == Seq(2, 1, -1)) // zebra is OOV
  }

  test("keepBestPerCluster keeps the top-score doc per component, singletons survive") {
    val scored = Seq(
      (1L, "a", 0.5), (2L, "b", 0.9), (3L, "c", 0.9), // cluster {1,2,3}: 2 wins (score tie, lower id)
      (4L, "d", 0.1),                                 // singleton
      (5L, "e", 0.3), (6L, "f", 0.2)                  // cluster {5,6}: 5 wins
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerCluster(scored, "doc_id", pairs, "score")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L, 5L))
    val sizes = out.map(r => r.getLong(0) -> r.getAs[Long]("cluster_size")).toMap
    assert(sizes == Map(2L -> 3L, 4L -> 1L, 5L -> 2L))
    // survivors keep their original columns
    assert(out.find(_.getLong(0) == 2L).get.getAs[String]("text") == "b")
  }

  test("weightedSampleN: deterministic, partitioning-invariant, weight-sensitive") {
    val df = (1L to 200L).map(i => (i, if (i <= 100) 1000L else 1L)).toDF("id", "w")
    val a = Corpus.weightedSampleN(df, "id", "w", 20).select("id").as[Long].collect().toSeq
    val b = Corpus.weightedSampleN(df.repartition(13), "id", "w", 20)
      .select("id").as[Long].collect().toSeq
    assert(a == b) // same winners in the same order regardless of layout
    // heavy weights dominate: u^(1/1000) ~ 1 beats u^(1/1) for nearly all u
    assert(a.count(_ <= 100) >= 18, s"heavy-weight rows underrepresented: $a")
    // non-positive weights are excluded, not inverted winners
    val mixed = Seq((1L, 10L), (2L, -5L), (3L, 0L), (4L, 10L)).toDF("id", "w")
    val winners = Corpus.weightedSampleN(mixed, "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(winners == Set(1L, 4L))
  }

  test("tokenEntropy: uniform text hits ln(vocab), repetition lowers it") {
    val df = Seq(
      (1L, "a b c d"),        // uniform: entropy = ln 4, ttr 1, hapax 4
      (2L, "x x x x"),        // degenerate: entropy 0
      (3L, "a a b"),          // 2/3·ln(3/2) + 1/3·ln 3
      (4L, "")                // no tokens -> no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("vocab") == 4 && out(0).getAs[Long]("hapax") == 4)
    assert(math.abs(out(0).getAs[Double]("entropy") - math.log(4)) < 1e-5)
    assert(out(0).getAs[Double]("ttr") == 1.0)
    assert(out(1).getAs[Double]("entropy") == 0.0 && out(1).getAs[Long]("hapax") == 0)
    val expected3 = math.log(3) - (2.0 * math.log(2.0)) / 3.0
    assert(math.abs(out(2).getAs[Double]("entropy") - expected3) < 1e-5)
    // order-independence: repartitioned input folds to identical bits
    val shuffled = TextAnalysis.tokenEntropy(df.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(shuffled.map(_.getAs[Double]("entropy")).toSeq ==
      out.map(_.getAs[Double]("entropy")).toSeq)
  }

  test("NearestCentroids kernel: ordered multi-probe equals sort-based brute force") {
    val rnd = new scala.util.Random(17)
    val cents = Array.fill(10)(Array.fill(6)(rnd.nextGaussian()))
    val vecs = (0 until 40).map(i => i.toLong -> Array.fill(6)(rnd.nextGaussian().toFloat))
    val df = vecs.map { case (i, v) => (i, v.toSeq) }.toDF("id", "v")
    import graft.internal.{columnExpr, exprColumn}
    val got = df.select($"id", exprColumn(graft.pipeline.NearestCentroids(
        columnExpr($"v"), cents, 3)).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    def cos(v: Array[Float], c: Array[Double]): Double = {
      var d = 0.0; var nv = 0.0; var nc = 0.0
      for (i <- 0 until 6) { d += v(i).toDouble * c(i); nv += v(i).toDouble * v(i); nc += c(i) * c(i) }
      d / (math.sqrt(nv) * math.sqrt(nc))
    }
    vecs.foreach { case (i, v) =>
      val expect = cents.indices.sortBy(c => (-cos(v, cents(c)), c)).take(3).toList
      assert(got(i) == expect, s"id=$i")
    }
  }

  test("ivfKnnJoin: self-match ranks first; full-probe run equals exact knnJoin") {
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" % 20 === 0)
    val approx = graft.pipeline.Similarity.ivfKnnJoin(
      queries, "vec_id", "embedding", df, "vec_id", "embedding",
      kCells = 4, nProbe = 4, k = 3) // nProbe = kCells => every cell probed
    val rows = approx.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // probing ALL cells recovers the exact result
    val exact = graft.pipeline.Similarity.knnJoin(
        df, queries.select($"vec_id".as("qid"), $"embedding".as("qv")),
        "vec_id", "embedding", "qid", "qv", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(rows.toSet == exact.toSet)
    // self row is its own nearest neighbor
    rows.filter(t => t._1 == t._2).foreach(t => assert(t._3 == 1))
    assert(rows.count(t => t._1 == t._2) == 3)
  }

  test("ivfTopKPartitioned: partition pruning in the plan, result equals expression-filtered IVF") {
    import graft.internal.{columnExpr, exprColumn}
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 120L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val cents = graft.pipeline.Similarity.trainIvfCentroids(df, "vec_id", "embedding", k = 4, iters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("ivf_part_spec").toFile
    try {
      val path = new java.io.File(tmp, "t").getAbsolutePath
      df.withColumn("cell", exprColumn(graft.pipeline.NearestCentroid(
          columnExpr($"embedding"), cents)))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
      val q = Array.fill(8)(rnd.nextGaussian())
      val part = graft.pipeline.Similarity.ivfTopKPartitioned(
        spark.read.parquet(path), "vec_id", "embedding", "cell", cents, q, k = 5, nProbe = 2)
      // the probe filter reaches the scan as a partition filter
      val plan = part.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(800))
      val expect = graft.pipeline.Similarity.ivfTopK(
        df, "vec_id", "embedding", cents, q, k = 5, nProbe = 2)
      assert(part.select("vec_id").as[Long].collect().toSeq ==
        expect.select("vec_id").as[Long].collect().toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("kCenterSelect matches brute-force greedy farthest-point; prefix property") {
    val rnd = new scala.util.Random(41)
    val vecs = (0L until 80L).map(i => i -> Array.fill(8)(rnd.nextGaussian().toFloat))
    val df = vecs.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")

    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var da = 0.0; var db = 0.0; var dab = 0.0
      var i = 0
      while (i < 8) { da += a(i).toDouble * a(i); db += b(i).toDouble * b(i); dab += a(i).toDouble * b(i); i += 1 }
      s = da - 2 * dab + db
      math.rint(s * 1e6) / 1e6
    }
    // brute-force greedy with identical rounding + tie-break
    val byId = vecs.toMap
    var sel = List(0L)
    var md = vecs.map { case (i, v) => i -> d2(v, byId(0L)) }.toMap
    var expect = List[(Int, Long, Option[Double])]((1, 0L, None))
    for (r <- 2 to 6) {
      val next = md.toSeq.minBy { case (i, d) => (-d, i) }
      expect ::= ((r, next._1, Some(next._2)))
      sel ::= next._1
      md = md.map { case (i, d) => i -> math.min(d, d2(byId(i), byId(next._1))) }
    }
    val got = graft.pipeline.Similarity.kCenterSelect(df, "vec_id", "embedding", 6)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
    assert(got == expect.reverse, s"got=$got expect=${expect.reverse}")
    // prefix property: k=4 run equals the first 4 rows of the k=6 run
    val got4 = graft.pipeline.Similarity.kCenterSelect(df, "vec_id", "embedding", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    assert(got4 == got.take(4).map(t => (t._1, t._2)))
    // k beyond the point count fails loud instead of repeating centers
    val tiny = vecs.take(3).map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.pipeline.Similarity.kCenterSelect(tiny, "vec_id", "embedding", 5)
    }
  }
}
