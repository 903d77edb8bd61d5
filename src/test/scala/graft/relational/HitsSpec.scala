package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 4) =
    Graph.hits(edges.toDF("s", "d"), "s", "d", iters).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("pure hub and pure authority separate") {
    // 1 and 2 both point at 3 and 4: 1,2 are hubs; 3,4 are authorities
    val got = run(Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    assert(got(1L)._1 > 0.3 && got(1L)._2 == 0.0)
    assert(got(3L)._2 > 0.3 && got(3L)._1 == 0.0)
    assert(math.abs(got(1L)._1 - got(2L)._1) < 1e-9)
    assert(math.abs(got(3L)._2 - got(4L)._2) < 1e-9)
  }

  test("L1 normalization holds each round") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)))
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-5)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("the better-endorsed target gets the higher authority") {
    // 3 receives from two hubs, 4 from one
    val got = run(Seq((1L, 3L), (2L, 3L), (2L, 4L)))
    assert(got(3L)._2 > got(4L)._2)
  }

  test("deterministic under repartitioning") {
    val edges = (1 to 200).map(i => ((i % 30).toLong, ((i * 11 + 5) % 30).toLong))
    val a = Graph.hits(edges.toDF("s", "d").repartition(1), "s", "d", 3)
      .collect().map(_.toSeq).toSet
    val b = Graph.hits(edges.toDF("s", "d").repartition(17), "s", "d", 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
