package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KatzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], alpha: Double = 0.1, iters: Int = 4) =
    Graph.katz(edges.toDF("s", "d"), "s", "d", alpha, iters).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("matches the hand-unrolled recurrence on a 3-node path") {
    // 1 -> 2 -> 3; x0 = 1 everywhere, x_{k+1}(v) = 0.1 * in-sum + 1
    val got = run(Seq((1L, 2L), (2L, 3L)))
    def rnd(x: Double) = math.rint(x * 1e9) / 1e9
    var x = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    for (_ <- 1 to 4)
      x = Map(1L -> 1.0, 2L -> rnd(0.1 * x(1L) + 1.0), 3L -> rnd(0.1 * x(2L) + 1.0))
    for ((k, v) <- x)
      assert(math.abs(got(k) - math.rint(v * 1e6) / 1e6) < 1e-9, s"node $k")
  }

  test("more in-edges means higher centrality; sources sit at the base value") {
    val got = run(Seq((1L, 4L), (2L, 4L), (3L, 4L), (1L, 5L)))
    assert(got(4L) > got(5L))
    assert(got(1L) == 1.0 && got(2L) == 1.0 && got(3L) == 1.0)
  }

  test("deterministic under repartitioning") {
    val edges = (1 to 200).map(i => ((i % 30).toLong, ((i * 11 + 5) % 30).toLong))
    val a = Graph.katz(edges.toDF("s", "d").repartition(1), "s", "d", 0.1, 3)
      .collect().map(_.toSeq).toSet
    val b = Graph.katz(edges.toDF("s", "d").repartition(17), "s", "d", 0.1, 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("self-loops and duplicate edges are dropped") {
    val withNoise = Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 3L))
    val clean = Seq((1L, 2L), (2L, 3L))
    assert(run(withNoise) == run(clean))
  }
}
