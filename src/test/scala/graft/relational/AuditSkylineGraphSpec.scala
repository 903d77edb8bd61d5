package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AuditSkylineGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ bellmanFord

  test("bellmanFord matches Dijkstra on a random graph within the hop bound") {
    val rnd = new scala.util.Random(7)
    val n = 30
    val edges = Seq.tabulate(120) { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (rnd.nextInt(50) + 1).toDouble)
    }
    val df = edges.toDF("s", "v", "w")
    val rounds = n // enough rounds to converge on 30 nodes
    val got = Graph.bellmanFord(df, "s", "v", "w", source = 0L, rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap

    // reference: classic Bellman-Ford over the min-collapsed edge list
    val minEdges = edges.filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((s, v), es) => (s, v, es.map(_._3).min) }.toSeq
    val dist = scala.collection.mutable.Map[Long, Double](0L -> 0.0)
    for (_ <- 1 to rounds; (s, v, w) <- minEdges)
      if (dist.contains(s) && dist(s) + w < dist.getOrElse(v, Double.MaxValue))
        dist(v) = dist(s) + w
    assert(got.keySet == dist.keySet)
    dist.foreach { case (k, d) => assert(math.abs(got(k) - d) < 1e-9, s"node $k") }
  }

  test("bellmanFord hop bound: round k only reaches k hops") {
    // path 0 -> 1 -> 2 -> 3, each weight 1
    val df = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("s", "v", "w")
    val d2 = Graph.bellmanFord(df, "s", "v", "w", 0L, rounds = 2)
      .collect().map(r => r.getLong(0)).toSet
    assert(d2 == Set(0L, 1L, 2L)) // node 3 is 3 hops away
  }

  // ------------------------------------------------------------ audit

  test("audit + uniqueness + referential emit one consistent report") {
    val t = Seq((1, "a", 10), (2, "b", -5), (3, null, 7), (3, "c", 8)).toDF("id", "name", "v")
    val parent = Seq(1, 2, 3).toDF("pid")
    val report = Profile.audit(t, Seq(
        "name_null" -> col("name").isNull,
        "v_negative" -> (col("v") < 0)))
      .unionByName(Profile.uniquenessCheck(t, Seq("id"), "id_unique"))
      .unionByName(Profile.referentialCheck(t, "id", parent, "pid", "id_fk"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(report("name_null") == ((1L, 4L, false)))
    assert(report("v_negative") == ((1L, 4L, false)))
    assert(report("id_unique") == ((1L, 4L, false))) // one duplicate id
    assert(report("id_fk") == ((0L, 4L, true)))
  }

  // ------------------------------------------------------------ skyline

  test("skyline2 matches the NOT EXISTS definition on random points") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(400)(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000) / 10.0))
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.skyline2(df, "x", "y", buckets = 8)
      .collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("skyline2 keeps duplicate frontier points and handles one-bucket degeneracy") {
    val df = Seq((1L, 5L, 5.0), (2L, 5L, 5.0), (3L, 4L, 9.0), (4L, 5L, 4.0), (5L, 3L, 9.0))
      .toDF("id", "x", "y")
    val got = Skyline.skyline2(df, "x", "y", buckets = 1)
      .collect().map(_.getLong(0)).toSet
    // (5,5) twice: equal points dominate neither, both stay; (4,9) stays;
    // (5,4) dominated by (5,5); (3,9) dominated by (4,9)
    assert(got == Set(1L, 2L, 3L))
  }

  test("skyline2 single-point and constant-x inputs") {
    val one = Seq((1L, 2L, 3.0)).toDF("id", "x", "y")
    assert(Skyline.skyline2(one, "x", "y").collect().map(_.getLong(0)).toSet == Set(1L))
    val const = Seq((1L, 2L, 3.0), (2L, 2L, 9.0), (3L, 2L, 9.0)).toDF("id", "x", "y")
    assert(Skyline.skyline2(const, "x", "y").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }
}
