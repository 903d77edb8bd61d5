package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL estimate lands within the expected error band (p=8 => ~6.5% rse)") {
    // 20k rows, 5k distinct keys, one group
    val df = (1L to 20000L).map(i => ("g", i % 5000)).toDF("g", "k")
    val est = Sketch.hllDistinct(df, "k", Seq("g"))
      .select("hll_estimate").as[Double].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"estimate $est too far from 5000")
  }

  test("small cardinalities hit the linear-counting branch and stay tight") {
    val df = (1L to 1000L).map(i => ("g", i % 37)).toDF("g", "k")
    val row = Sketch.hllDistinct(df, "k", Seq("g"))
      .select("hll_estimate", "n_buckets_used").as[(Double, Int)].head()
    assert(math.abs(row._1 - 37.0) < 5.0, s"estimate ${row._1} too far from 37")
    assert(row._2 <= 37)
  }

  test("estimate is deterministic across recomputation") {
    val df = (1L to 5000L).map(i => ("g", i * 7 % 991)).toDF("g", "k")
    val a = Sketch.hllDistinct(df, "k", Seq("g")).select("hll_estimate").as[Double].head()
    val b = Sketch.hllDistinct(df, "k", Seq("g")).select("hll_estimate").as[Double].head()
    assert(a == b)
  }

  test("CMS estimate is one-sided and tight for skewed keys") {
    // zipf-ish: key i appears 2000/i times for i in 1..20, plus 2k noise keys
    val rows = (1 to 20).flatMap(i => Seq.fill(2000 / i)(i.toLong)) ++
      (1000L to 3000L)
    val df = rows.toDF("k")
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cands = (1L to 20L).toDF("k")
    val est = Sketch.cmsEstimate(cands, Sketch.cmsTable(df, "k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.size
    (1L to 20L).foreach { k =>
      assert(est(k) >= exact(k), s"CMS under-counted key $k: ${est(k)} < ${exact(k)}")
      // standard guarantee: overcount <= 2n/width with prob 1 - 2^-depth;
      // allow 3x slack for the fixed seedless layout
      assert(est(k) - exact(k) <= 3 * 2 * n / 256,
        s"CMS overcount for $k too large: ${est(k)} vs ${exact(k)}")
    }
  }

  test("histogram quantiles interpolate within one bin width of exact") {
    val vals = (1 to 10000).map(i => ("g", (i * 7919 % 10007).toDouble))
    val df = vals.toDF("g", "v")
    val row = Sketch.histQuantiles(df, "v", Seq("g"), Seq(0.5, 0.95))
      .select("est_q50", "est_q95").as[(Double, Double)].head()
    val sorted = vals.map(_._2).sorted
    val binW = (sorted.last - sorted.head) / 128
    def exact(q: Double) = sorted((q * (sorted.size - 1)).toInt)
    assert(math.abs(row._1 - exact(0.5)) <= binW, s"p50 ${row._1} vs ${exact(0.5)}")
    assert(math.abs(row._2 - exact(0.95)) <= binW, s"p95 ${row._2} vs ${exact(0.95)}")
  }

  test("histogram quantiles: constant column degenerates to the constant") {
    val df = Seq.fill(100)(("g", 42.0)).toDF("g", "v")
    val row = Sketch.histQuantiles(df, "v", Seq("g"), Seq(0.5))
      .select("est_q50").as[Double].head()
    assert(row == 42.0)
  }

  test("hll_distinct SQL aggregate is bit-identical to the DataFrame op") {
    graft.pipeline.TextRegistry.register(spark)
    val df = (1L to 20000L).map(i => (s"g${i % 3}", i % (700 + 100 * (i % 3)).max(1)))
      .toDF("g", "k")
    df.createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
        "SELECT g, hll_distinct(k) AS e FROM hll_in GROUP BY g ORDER BY g")
      .as[(String, Double)].collect().toSeq
    val viaDf = Sketch.hllDistinct(df, "k", Seq("g"))
      .select($"g", $"hll_estimate").orderBy("g")
      .as[(String, Double)].collect().toSeq
    assert(viaSql == viaDf, s"$viaSql != $viaDf")
    // estimate lands in the expected band
    viaSql.foreach { case (_, e) => assert(e > 300 && e < 1200) }
  }

  test("CMS probes for absent keys see empty counter cells as zero") {
    // sketch tiny data so most of the 4x256 cells stay empty; a key the
    // sketch never saw must estimate (near) zero via its empty cells,
    // not inherit a collision cell's count through an inner join
    val df = (1L to 10L).toDF("k")
    val cands = Seq(999999L, 888888L, 1L).toDF("k")
    val est = Sketch.cmsEstimate(cands, Sketch.cmsTable(df, "k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == Set(999999L, 888888L, 1L), "absent keys must not vanish")
    assert(est(999999L) == 0L && est(888888L) == 0L,
      s"absent keys should hit an empty cell: $est")
    assert(est(1L) >= 1L)
  }

  test("bloom filter: no false negatives, usable FP rate, layout-stable") {
    val keys = (0L until 500L).map(_ * 3 + 1).toDF("k")
    val words = Sketch.bloomBits(keys, "k")
    val probe = (0L until 4000L).toDF("k")
    val passed = probe.filter(Sketch.bloomContains($"k", words))
      .as[Long].collect().toSet
    val members = (0L until 500L).map(_ * 3 + 1).toSet
    assert(members.subsetOf(passed), "bloom dropped a true member")
    // 500 keys * 4 hashes in 16384 bits => FP rate ~ (1-e^-0.122)^4 ~ 1.7e-4;
    // allow a generous margin
    val fps = passed -- members
    assert(fps.size <= 40, s"FP rate too high: ${fps.size} of ${4000 - 500}")
    // physical layout must not change the filter
    val words2 = Sketch.bloomBits(keys.repartition(13), "k")
    assert(words.toSeq == words2.toSeq)
  }

  test("histogram quantiles: global (no group) path") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val est = Sketch.histQuantiles(df, "v", Nil, Seq(0.5))
      .select("est_q50").as[Double].head()
    assert(math.abs(est - 500.0) <= (999.0 / 128) + 1)
  }

  test("kmv_sketch: bottom-k parity with SQL hashes, layout invariance, estimates") {
    val spark2 = spark
    graft.functions.GeoRegistry.register(spark2)
    import spark2.implicits._
    val n = 10000
    val df = (1 to n).map(i => s"key$i").toDF("k")
    df.createOrReplaceTempView("kmv_in")
    // sketch == the k smallest distinct conv(md5) hashes, exactly
    val sketch = spark2.sql("SELECT kmv_sketch(k, 256) AS s FROM kmv_in")
      .head().getSeq[Long](0)
    val ref = spark2.sql(
      """SELECT cast(conv(substring(md5(k), 1, 15), 16, 10) as bigint) AS h
        |FROM (SELECT DISTINCT k FROM kmv_in) ORDER BY h LIMIT 256""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(sketch == ref)
    // physical layout must not change the sketch (map-side merge path)
    val sketch13 = df.repartition(13).createOrReplaceTempView("kmv_in13")
    val s13 = spark2.sql("SELECT kmv_sketch(k, 256) AS s FROM kmv_in13")
      .head().getSeq[Long](0)
    assert(s13 == sketch)
    // duplicates do not perturb the sketch (distinct semantics)
    val dup = ((1 to n) ++ (1 to n)).map(i => s"key$i").toDF("k")
    dup.createOrReplaceTempView("kmv_dup")
    assert(spark2.sql("SELECT kmv_sketch(k, 256) FROM kmv_dup")
      .head().getSeq[Long](0) == sketch)
    // estimator: (k-1)*2^60/h_k within ~5 sigma of the true cardinality
    val est = 255.0 * math.pow(2.0, 60) / sketch(255)
    assert(math.abs(est - n) < 5 * n / math.sqrt(254), s"est=$est")
    // sub-k set: the sketch IS the distinct hash set (exact)
    val small = (1 to 100).map(i => s"s$i").toDF("k")
    small.createOrReplaceTempView("kmv_small")
    assert(spark2.sql("SELECT kmv_sketch(k, 256) FROM kmv_small")
      .head().getSeq[Long](0).length == 100)
  }
}
