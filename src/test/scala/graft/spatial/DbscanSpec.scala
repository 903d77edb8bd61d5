package graft.spatial

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("core/border/noise labeling with deterministic min-label clusters") {
    // cluster A: {1,2,3} mutually within eps=1.5 (all core at minPts=3)
    // border: 4 at (2.4, 0) — only neighbors {self, 2} => not core, adjacent to core 2
    // cluster B: {5,6,7} at x~100
    // noise: 8 far from everything
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0),
      (4L, 2.4, 0.0),
      (5L, 100.0, 0.0), (6L, 101.0, 0.0), (7L, 100.0, 1.0),
      (8L, 50.0, 50.0)
    ).toDF("id", "x", "y")
    val out = Dbscan.cluster(pts, "id", "x", "y", eps = 1.5, minPts = 3)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getBoolean(3), if (r.isNullAt(4)) null else r.getLong(4))).toMap
    assert(byId(1L) == (true, 1L) && byId(2L) == (true, 1L) && byId(3L) == (true, 1L))
    assert(byId(4L) == (false, 1L)) // border attaches to min adjacent cluster
    assert(byId(5L) == (true, 5L) && byId(6L) == (true, 5L) && byId(7L) == (true, 5L))
    assert(byId(8L) == (false, null)) // noise
  }

  test("cells are eps-sized: neighbors across cell boundaries are found") {
    // points straddling a cell edge at distance exactly eps (exact halves:
    // 3.5 - 1.5 == 2.0 in binary; a .9 spacing would land 1 ulp above eps)
    val pts = Seq((1L, 1.5, 0.0), (2L, 3.5, 0.0), (3L, 5.5, 0.0)).toDF("id", "x", "y")
    val out = Dbscan.cluster(pts, "id", "x", "y", eps = 2.0, minPts = 2)
      .orderBy("id").collect()
    // 1-2 and 2-3 are eps apart (closed ball): all core, one chain cluster
    assert(out.forall(_.getBoolean(3)))
    assert(out.map(_.getLong(4)).toSet == Set(1L))
  }

  test("duplicate coordinates count toward the neighborhood") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 0.0), (3L, 0.0, 0.0), (4L, 30.0, 0.0))
      .toDF("id", "x", "y")
    val out = Dbscan.cluster(pts, "id", "x", "y", eps = 1.0, minPts = 3)
      .orderBy("id").collect()
    assert(out.take(3).forall(r => r.getBoolean(3) && r.getLong(4) == 1L))
    assert(!out(3).getBoolean(3) && out(3).isNullAt(4))
  }

  test("partitioning-invariant") {
    val pts = (1L to 300L).map { i =>
      (i, (i * 37 % 83).toDouble, (i * 61 % 79).toDouble)
    }.toDF("id", "x", "y")
    val a = Dbscan.cluster(pts, "id", "x", "y", 2.0, 3)
      .select("id", "is_core", "cluster").orderBy("id").collect().toSeq
    val b = Dbscan.cluster(pts.repartition(11), "id", "x", "y", 2.0, 3)
      .select("id", "is_core", "cluster").orderBy("id").collect().toSeq
    assert(a == b)
  }
}
