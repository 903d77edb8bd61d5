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
}
