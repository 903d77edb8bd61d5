package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AdamicAdarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("path graph scores the endpoints through the middle vertex") {
    // 1-2-3 plus 3-4: non-adjacent pairs with common neighbors:
    // (1,3) via 2 [deg 2], (2,4) via 3 [deg 2], (1,4) none, (1,2)... adjacent
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.adamicAdar(edges, "s", "d").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val w = math.rint(1.0 / math.log(2.0) * 1e9) / 1e9 // round-9 term
    assert(got.keySet == Set((1L, 3L), (2L, 4L)))
    assert(math.abs(got((1L, 3L)) - math.rint(w * 1e6) / 1e6) < 1e-9)
  }

  test("higher-degree common neighbors contribute less") {
    // star center 0 with leaves 1..4 (deg(0)=4), plus 5-6-7 path (deg(6)=2)
    val edges = (1L to 4L).map(i => (0L, i)) ++ Seq((5L, 6L), (6L, 7L))
    val got = Graph.adamicAdar(edges.toDF("s", "d"), "s", "d").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // leaf pairs through the star center score 1/ln(4); (5,7) scores 1/ln(2)
    assert(got((5L, 7L)) > got((1L, 2L)))
    assert(got.keySet.size == 6 + 1) // C(4,2) leaf pairs + (5,7)
  }

  test("adjacent pairs are excluded even with common neighbors") {
    // triangle 1-2-3: every pair is adjacent -> empty result
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    assert(Graph.adamicAdar(edges, "s", "d").count() == 0)
  }

  test("deterministic under repartitioning") {
    val edges = (1 to 300).map(i => ((i % 50).toLong, ((i * 7 + 3) % 50).toLong))
    val a = Graph.adamicAdar(edges.toDF("s", "d").repartition(1), "s", "d")
      .collect().map(_.toSeq).toSeq
    val b = Graph.adamicAdar(edges.toDF("s", "d").repartition(13), "s", "d")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
