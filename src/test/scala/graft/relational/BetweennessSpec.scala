package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], maxDepth: Int = 8): Map[Long, (Double, Boolean)] =
    Graph.betweenness(edges.toDF("src", "dst"), "src", "dst", maxDepth)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

  // sequential exact Brandes (unweighted, undirected) for cross-checking
  private def ref(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    val und = edges.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2).distinct
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = adj.keySet.toSeq.sorted
    val bc = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
    for (s <- nodes) {
      val stack = scala.collection.mutable.Stack[Long]()
      val preds = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
      val sigma = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      val dist = scala.collection.mutable.Map[Long, Int]().withDefaultValue(-1)
      sigma(s) = 1.0; dist(s) = 0
      val q = scala.collection.mutable.Queue(s)
      while (q.nonEmpty) {
        val v = q.dequeue(); stack.push(v)
        for (w <- adj.getOrElse(v, Nil)) {
          if (dist(w) < 0) { dist(w) = dist(v) + 1; q.enqueue(w) }
          if (dist(w) == dist(v) + 1) { sigma(w) += sigma(v); preds(w) ::= v }
        }
      }
      val delta = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      while (stack.nonEmpty) {
        val w = stack.pop()
        for (v <- preds(w)) delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        if (w != s) bc(w) += delta(w)
      }
    }
    bc.map { case (k, v) => k -> v / 2.0 }.toMap
  }

  test("path graph P4: interior nodes carry 2.0 each") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(out.forall(_._2._2), "P4 must explore completely")
    assert(out(1L)._1 == 0.0 && out(4L)._1 == 0.0)
    assert(out(2L)._1 == 2.0 && out(3L)._1 == 2.0)
  }

  test("star K1,4: center carries C(4,2), leaves 0") {
    val out = run(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(out(0L)._1 == 6.0)
    assert((1L to 4L).forall(out(_)._1 == 0.0))
  }

  test("matches sequential Brandes on an irregular graph (incl. multi-path sigma)") {
    // diamond + tail + a disconnected-ish appendix: multiple shortest
    // paths between 1 and 4 exercise fractional sigma ratios
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 3L), (6L, 7L), (7L, 8L), (8L, 5L), (1L, 9L))
    val out = run(edges)
    val expect = ref(edges)
    assert(out.keySet == expect.keySet)
    for ((n, e) <- expect)
      assert(math.abs(out(n)._1 - e) < 1e-6, s"node $n: got ${out(n)._1}, want $e")
  }

  test("maxDepth truncation is loud, exhaustive budget is complete") {
    val path = (1L to 9L).sliding(2).map(p => (p.head, p.last)).toSeq
    val full = run(path, maxDepth = 9)
    assert(full.forall(_._2._2))
    val cut = run(path, maxDepth = 3)
    assert(cut.forall(!_._2._2), "depth-3 budget on P9 must report incomplete")
  }

  test("closenessStats: P4 closed forms (reach/ecc/closeness/harmonic)") {
    val out = Graph.closenessStats(
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"), "src", "dst", 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out.forall(_._2._5))
    // endpoints: dists 1,2,3
    assert(out(1L)._1 == 3L && out(1L)._2 == 3)
    assert(math.abs(out(1L)._3 - 0.5) < 1e-12)
    assert(math.abs(out(1L)._4 - (1.0 + 0.5 + round9(1.0 / 3))) < 1e-9)
    // interior: dists 1,1,2
    assert(out(2L)._1 == 3L && out(2L)._2 == 2)
    assert(math.abs(out(2L)._3 - 0.75) < 1e-12)
    assert(math.abs(out(2L)._4 - 2.5) < 1e-12)
  }

  private def round9(x: Double): Double = math.rint(x * 1e9) / 1e9

  test("closenessStats: disconnected components stay component-local") {
    val out = Graph.closenessStats(
        Seq((1L, 2L), (10L, 11L), (11L, 12L)).toDF("src", "dst"), "src", "dst", 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1.0)        // one neighbor at d=1
    assert(out(11L)._1 == 2L && out(11L)._2 == 1.0)      // center of P3
    assert(out(10L)._1 == 2L && math.abs(out(10L)._2 - 2.0 / 3) < 1e-12)
  }

  test("sampled sources approximate and stay keyed (no cross-source bleed)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val roots = Seq(1L).toDF("node")
    // single source s=1 on P5: delta_1 = {2: 3, 3: 2, 4: 1}; halved
    val out = Graph.betweenness(edges.toDF("src", "dst"), "src", "dst", 8, Some(roots))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) == 1.5 && out(3L) == 1.0 && out(4L) == 0.5 && out(1L) == 0.0 && out(5L) == 0.0)
  }
}
