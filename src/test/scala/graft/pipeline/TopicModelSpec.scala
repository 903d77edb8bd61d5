package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopicModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def factors(df: org.apache.spark.sql.DataFrame):
      (Map[(String, Int), Double], Map[(String, Int), Double]) = {
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    (rows.filter(_._1 == "w").map(t => (t._2, t._3) -> t._4).toMap,
      rows.filter(_._1 == "h").map(t => (t._2, t._3) -> t._4).toMap)
  }

  test("rank-1 matrix is reconstructed by k=1 NMF") {
    // V = outer([2,4], [1,3]) — exactly rank 1
    val v = Seq(("A", "x", 2.0), ("A", "y", 6.0), ("B", "x", 4.0), ("B", "y", 12.0))
      .toDF("doc", "term", "val")
    val (w, h) = factors(TopicModel.nmf(v, "doc", "term", "val", k = 1, iters = 40))
    def recon(d: String, t: String): Double = w((d, 0)) * h((t, 0))
    for ((d, t, x) <- Seq(("A", "x", 2.0), ("A", "y", 6.0), ("B", "x", 4.0), ("B", "y", 12.0)))
      assert(math.abs(recon(d, t) - x) / x < 0.01, s"($d,$t): ${recon(d, t)} vs $x")
  }

  test("factors stay nonnegative and the objective does not increase") {
    val v = (1 to 12).flatMap(d => (1 to 8).map(t =>
      (s"d$d", s"t$t", ((d * 3 + t * 5) % 7 + 1).toDouble))).toDF("doc", "term", "val")
    def frob(iters: Int): Double = {
      val (w, h) = factors(TopicModel.nmf(v, "doc", "term", "val", k = 2, iters = iters))
      v.collect().map { r =>
        val d = r.getString(0); val t = r.getString(1); val x = r.getDouble(2)
        val wh = (0 until 2).map(j => w((d, j)) * h((t, j))).sum
        (x - wh) * (x - wh)
      }.sum
    }
    val (w, h) = factors(TopicModel.nmf(v, "doc", "term", "val", k = 2, iters = 5))
    assert(w.values.forall(_ >= 0.0) && h.values.forall(_ >= 0.0))
    val e1 = frob(1); val e3 = frob(3); val e8 = frob(8)
    assert(e3 <= e1 + 1e-9 && e8 <= e3 + 1e-9, s"objective rose: $e1 -> $e3 -> $e8")
  }

  test("bit-identical across partitionings (decimal-folded sums)") {
    val v = (1 to 30).flatMap(d => (1 to 10).map(t =>
      (s"d$d", s"t$t", ((d * 7 + t * 11) % 5 + 1).toDouble))).toDF("doc", "term", "val")
    val a = factors(TopicModel.nmf(v.repartition(1), "doc", "term", "val", 3, 3))
    val b = factors(TopicModel.nmf(v.repartition(23), "doc", "term", "val", 3, 3))
    assert(a == b) // exact double equality
  }

  test("chainSql exposes the same init on both dialects (structure smoke)") {
    val s = TopicModel.chainSql("v", 2, 1)
    assert(s.contains("MATERIALIZED") && s.contains("w1") && s.contains("h1"))
    assert(s.contains("('0x' || substr(md5("))
  }
}
