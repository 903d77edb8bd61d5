package graft.spatial

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom._

/**
 * Join semantics transliterated from the reference's only executable golden
 * joins (geopolars/src/spatial_index.rs:432-556; FIXTURES.md §3):
 * 9 points x 1 polygon => inner shape (2,4), left shape (9,4), suffixes.
 */
class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pt(x: Double, y: Double) = WKB.write(Point(x, y))

  private lazy val pointsDf = Seq(
    (pt(0, 10), 1.0), (pt(1, 1), 2.0), (pt(10, 1), 3.0), (pt(1, -1), 4.0),
    (pt(0, -10), 5.0), (pt(-1, -1), 6.0), (pt(-10, 0), 7.0), (pt(-1, 1), 8.0),
    (pt(0, 10), 9.0)
  ).toDF("geometry", "point_values")

  private lazy val polygonDf = Seq(
    (WKB.write(Polygon(Array(Array(0.0, 0, 20, 0, 20, 20, 0, 20, 0, 0)))), "test")
  ).toDF("geometry", "string_col")

  test("STRtree envelope query matches indices {0,1,2,8} (spatial_index.rs:361-395)") {
    val pts = Array((0.0, 10.0), (1.0, 1.0), (10.0, 1.0), (1.0, -1.0), (0.0, -10.0),
      (-1.0, -1.0), (-10.0, 0.0), (-1.0, 1.0), (0.0, 10.0))
    val tree = STRtree.build(pts.map { case (x, y) => Envelope(x, y, x, y) })
    val hits = tree.queryToBuffer(Envelope(0, 0, 20, 20)).sorted
    assert(hits == Seq(0, 1, 2, 8))
  }

  test("STRtree polygon envelopes: box query matches only quadrant +x+y (spatial_index.rs:397-430)") {
    val tree = STRtree.build(Array(Envelope(0, 0, 10, 10), Envelope(-10, -10, 0, 0)))
    // strictly inside the +x+y polygon, away from the shared corner (0,0)
    assert(tree.queryToBuffer(Envelope(5, 5, 6, 6)).sorted == Seq(0))
  }

  test("inner join: shape (2,4) with _left/_right suffixes (spatial_index.rs:479-480)") {
    val out = SpatialJoin.join(pointsDf, polygonDf, SpatialJoin.Predicate.Intersects, "inner")
    assert(out.columns.toSeq ==
      Seq("geometry_left", "point_values_left", "geometry_right", "string_col_right"))
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getDouble(1)).sorted.toSeq == Seq(2.0, 3.0)) // (1,1), (10,1)
    assert(rows.forall(_.getString(3) == "test"))
  }

  test("left join: shape (9,4), unmatched rows null-completed (spatial_index.rs:535-552)") {
    val out = SpatialJoin.join(pointsDf, polygonDf, SpatialJoin.Predicate.Intersects, "left")
    val rows = out.collect()
    assert(rows.length == 9)
    assert(rows.count(!_.isNullAt(3)) == 2)
    assert(rows.count(_.isNullAt(3)) == 7)
  }

  test("gridJoin dynamic cell pruning: identical results with pruning on/off") {
    val rnd = new scala.util.Random(23)
    // global point cloud vs a REGIONAL polygon side (occupies few cells)
    val pts = (1 to 3000).map(i =>
      (i.toLong, pt(rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 160 - 80)))
      .toDF("pid", "geometry")
    val region = Seq(
      (1L, WKB.write(Polygon(Array(Array(10.0, 10, 30, 10, 30, 30, 10, 30, 10, 10))))),
      (2L, WKB.write(Polygon(Array(Array(25.0, 25, 45, 25, 45, 45, 25, 45, 25, 25))))))
      .toDF("rid", "geometry")
    def run(): Seq[(Long, Long)] =
      SpatialJoin.gridJoin(pts, region, cellSize = 15.0,
        SpatialJoin.Predicate.Intersects, "inner",
        leftIdCol = Some("pid"), rightIdCol = Some("rid"))
        .select("pid_left", "rid_right").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val pruned = run() // default: pruning on
    spark.conf.set("graft.gridjoin.pruneMaxCells", "0")
    val full = try run() finally spark.conf.unset("graft.gridjoin.pruneMaxCells")
    assert(pruned == full)
    assert(pruned.nonEmpty)
    // left join: pruned-away left rows still null-complete
    def runLeft(max: String): Long = {
      spark.conf.set("graft.gridjoin.pruneMaxCells", max)
      try SpatialJoin.gridJoin(pts, region, cellSize = 15.0,
        SpatialJoin.Predicate.Intersects, "left",
        leftIdCol = Some("pid"), rightIdCol = Some("rid")).count()
      finally spark.conf.unset("graft.gridjoin.pruneMaxCells")
    }
    assert(runLeft("4000000") == runLeft("0"))
  }

  test("semi/anti parity across the broadcast and grid paths (autoJoin contract)") {
    val rnd = new scala.util.Random(41)
    val pts = (1 to 500).map(i =>
      (i.toLong, pt(rnd.nextDouble() * 100, rnd.nextDouble() * 100)))
      .toDF("pid", "geometry")
    val boxes = Seq(
      (1L, WKB.write(Polygon(Array(Array(10.0, 10, 40, 10, 40, 40, 10, 40, 10, 10))))),
      (2L, WKB.write(Polygon(Array(Array(30.0, 30, 70, 30, 70, 70, 30, 70, 30, 30))))))
      .toDF("rid", "geometry")
    for (jt <- Seq("semi", "anti")) {
      val viaBroadcast = SpatialJoin.join(pts, boxes, SpatialJoin.Predicate.Intersects, jt)
        .select("pid").collect().map(_.getLong(0)).sorted.toSeq
      val viaGrid = SpatialJoin.gridJoin(pts, boxes, cellSize = 25.0,
        SpatialJoin.Predicate.Intersects, jt,
        leftIdCol = Some("pid"), rightIdCol = Some("rid"))
        .select("pid").collect().map(_.getLong(0)).sorted.toSeq
      assert(viaBroadcast == viaGrid, jt)
      assert(SpatialJoin.gridJoin(pts, boxes, 25.0, SpatialJoin.Predicate.Intersects, jt,
        leftIdCol = Some("pid"), rightIdCol = Some("rid")).columns.toSeq ==
        Seq("pid", "geometry"), s"$jt output contract")
    }
  }

  test("gridJoin hot-cell salting: forced-low threshold matches unsalted results") {
    val rnd = new scala.util.Random(31)
    // everything in ONE cell -> quadratic candidate count, salting engages
    val ptsA = (1 to 400).map(i => (i.toLong, pt(rnd.nextDouble() * 5, rnd.nextDouble() * 5)))
      .toDF("pid", "geometry")
    val boxes = (1 to 30).map { i =>
      val x = rnd.nextDouble() * 4; val y = rnd.nextDouble() * 4
      (i.toLong, WKB.write(Polygon(Array(Array(x, y, x + 1, y, x + 1, y + 1, x, y + 1, x, y)))))
    }.toDF("rid", "geometry")
    def run(thresh: String): Seq[(Long, Long)] = {
      spark.conf.set("graft.gridjoin.hotCellPairs", thresh)
      try SpatialJoin.gridJoin(ptsA, boxes, cellSize = 10.0,
        SpatialJoin.Predicate.Intersects, "inner",
        leftIdCol = Some("pid"), rightIdCol = Some("rid"))
        .select("pid_left", "rid_right").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      finally spark.conf.unset("graft.gridjoin.hotCellPairs")
    }
    val salted = run("100")   // 400*30 = 12000 pairs >> 100 -> k capped at 64
    val unsalted = run("0")
    assert(salted == unsalted)
    assert(salted.nonEmpty)
  }

  test("semi/anti join: left columns only, complement partitions, nulls to anti") {
    val withNull = pointsDf.union(Seq((null.asInstanceOf[Array[Byte]], 99.0))
      .toDF("geometry", "point_values"))
    val semi = SpatialJoin.join(withNull, polygonDf, SpatialJoin.Predicate.Intersects, "semi")
    val anti = SpatialJoin.join(withNull, polygonDf, SpatialJoin.Predicate.Intersects, "anti")
    assert(semi.columns.toSeq == Seq("geometry", "point_values")) // unsuffixed
    val sVals = semi.collect().map(_.getDouble(1)).sorted.toSeq
    val aVals = anti.collect().map(_.getDouble(1)).sorted.toSeq
    assert(sVals == Seq(2.0, 3.0)) // same matches as the inner join
    assert(aVals == Seq(1.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 99.0)) // null row -> NOT EXISTS
    // parity with inner-join-derived semi on a multi-match right side
    // (two overlapping polygons: semi must NOT duplicate left rows)
    val poly2 = polygonDf.union(Seq(
      (WKB.write(Polygon(Array(Array(-5.0, -5, 15, -5, 15, 15, -5, 15, -5, -5)))), "t2"))
      .toDF("geometry", "string_col"))
    val semi2 = SpatialJoin.join(pointsDf, poly2, SpatialJoin.Predicate.Intersects, "semi")
    assert(semi2.collect().map(_.getDouble(1)).sorted.toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 9.0))
  }

  test("contains: polygon side contains point side") {
    val out = SpatialJoin.join(polygonDf, pointsDf, SpatialJoin.Predicate.Contains, "inner",
      lSuffix = "_l", rSuffix = "_r")
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("geometry_l", "string_col_l", "geometry_r", "point_values_r"))
  }

  test("custom suffixes (spatial_index.rs suffix test)") {
    val out = SpatialJoin.join(pointsDf, polygonDf, SpatialJoin.Predicate.Intersects, "inner",
      lSuffix = "_a", rSuffix = "_b")
    assert(out.columns.toSeq == Seq("geometry_a", "point_values_a", "geometry_b", "string_col_b"))
  }

  test("gridJoin matches broadcast join results") {
    val bcast = SpatialJoin.join(pointsDf, polygonDf, SpatialJoin.Predicate.Intersects, "inner")
      .select("point_values_left").as[Double].collect().sorted.toSeq
    val grid = SpatialJoin.gridJoin(pointsDf, polygonDf, cellSize = 7.0,
      predicate = SpatialJoin.Predicate.Intersects, joinType = "inner")
      .select("point_values_left").as[Double].collect().sorted.toSeq
    assert(grid == bcast)
    // left-join parity too
    val gl = SpatialJoin.gridJoin(pointsDf, polygonDf, cellSize = 7.0,
      predicate = SpatialJoin.Predicate.Intersects, joinType = "left")
    assert(gl.count() == 9)
  }

  test("larger randomized parity: broadcast vs grid vs brute force") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 300).map(i => (WKB.write(Point(rnd.nextDouble() * 100, rnd.nextDouble() * 100)), i))
    val polys = (1 to 20).map { j =>
      val x = rnd.nextDouble() * 90; val y = rnd.nextDouble() * 90
      val w = rnd.nextDouble() * 10 + 1; val h = rnd.nextDouble() * 10 + 1
      (WKB.write(Polygon(Array(Array(x, y, x + w, y, x + w, y + h, x, y + h, x, y)))), j)
    }
    val pdf = pts.toDF("geometry", "pid")
    val gdf = polys.toDF("geometry", "gid")
    // brute force oracle
    val expected = (for {
      (pw, pid) <- pts
      (gw, gid) <- polys
      if SpatialJoin.refine(SpatialJoin.Predicate.Intersects, WKB.read(pw), WKB.read(gw))
    } yield (pid, gid)).sorted
    val bcast = SpatialJoin.join(pdf, gdf, SpatialJoin.Predicate.Intersects, "inner")
      .select("pid_left", "gid_right").as[(Int, Int)].collect().sorted.toSeq
    val grid = SpatialJoin.gridJoin(pdf, gdf, cellSize = 13.0)
      .select("pid_left", "gid_right").as[(Int, Int)].collect().sorted.toSeq
    assert(bcast == expected)
    assert(grid == expected)
  }

  test("STRtree.nearestK matches brute force with deterministic tie-break") {
    val rnd = new scala.util.Random(3)
    val envs = Array.fill(300) {
      val x = rnd.nextInt(100).toDouble; val y = rnd.nextInt(100).toDouble
      Envelope(x, y, x + rnd.nextInt(5), y + rnd.nextInt(5))
    }
    val tree = STRtree.build(envs)
    def envDistTo(e: Envelope, q: Envelope): Double = {
      val dx = math.max(0.0, math.max(e.minX - q.maxX, q.minX - e.maxX))
      val dy = math.max(0.0, math.max(e.minY - q.maxY, q.minY - e.maxY))
      math.sqrt(dx * dx + dy * dy)
    }
    for (_ <- 1 to 50) {
      val q = { val x = rnd.nextInt(120).toDouble - 10; val y = rnd.nextInt(120).toDouble - 10
        Envelope(x, y, x, y) }
      val got = tree.nearestK(q, 7)(j => envDistTo(envs(j), q)).toSeq
      val expected = envs.zipWithIndex
        .map { case (e, j) => (j, envDistTo(e, q)) }
        .sortBy { case (j, d) => (d, j) }.take(7).toSeq
      assert(got == expected, s"query $q")
    }
  }

  test("nearestK with exact distance ABOVE the envelope bound (diagonal segments)") {
    // entries are diagonal segments: envelope min-distance is a strict
    // lower bound of the true point-to-segment distance, exercising the
    // re-queue-at-exact branch of the best-first search
    val rnd = new scala.util.Random(11)
    val segs = Array.fill(200) {
      val x = rnd.nextInt(100).toDouble; val y = rnd.nextInt(100).toDouble
      (x, y, x + 1 + rnd.nextInt(8), y + 1 + rnd.nextInt(8))
    }
    val envs = segs.map { case (x0, y0, x1, y1) =>
      Envelope(math.min(x0, x1), math.min(y0, y1), math.max(x0, x1), math.max(y0, y1))
    }
    val tree = STRtree.build(envs)
    def segDist(j: Int, px: Double, py: Double): Double = {
      val (x0, y0, x1, y1) = segs(j)
      Algos.distance(Point(px, py), LineString(Array(x0, y0, x1, y1)))
    }
    for (_ <- 1 to 40) {
      val px = rnd.nextInt(110).toDouble - 5; val py = rnd.nextInt(110).toDouble - 5
      val got = tree.nearestK(Envelope(px, py, px, py), 5)(j => segDist(j, px, py)).toSeq
      val expected = segs.indices
        .map(j => (j, segDist(j, px, py)))
        .sortBy { case (j, d) => (d, j) }.take(5).toSeq
      assert(got == expected, s"query ($px,$py)")
    }
  }

  test("knnJoin emits k nearest with rank, ties toward smaller order col") {
    val cust = Seq((-72.0, 1L), (-150.0, 2L), (0.0, 3L)).map { case (x, id) =>
      (WKB.write(Point(x, 0.0)), id)
    }.toDF("geometry", "cid")
    val boxes = spark.range(5).selectExpr(
      "cast(id as int) AS box_id",
      "st_makeenvelope(cast(id * 72 - 180 as double), -80.0, cast(id * 72 - 108 as double), 80.0) AS geometry")
    val out = SpatialJoin.knnJoin(cust, boxes, 3, "box_id")
      .select("cid_left", "box_id_right", "knn_rank", "knn_dist")
      .as[(Long, Int, Int, Double)].collect()
      .groupBy(_._1).map { case (c, rs) => c -> rs.sortBy(_._3).map(r => (r._2, r._4)).toSeq }
    // cid 2 at x=-150 sits in box 0; next boxes 1 (dist 42), 2 (dist 114)
    assert(out(2L) == Seq((0, 0.0), (1, 42.0), (2, 114.0)))
    // cid 1 at x=-72 is in box 1, EQUIDISTANT (36) to boxes 0 and 2 -> id order
    assert(out(1L) == Seq((1, 0.0), (0, 36.0), (2, 36.0)))
    // cid 3 at x=0 is in box 2, equidistant (36) to boxes 1 and 3
    assert(out(3L) == Seq((2, 0.0), (1, 36.0), (3, 36.0)))
  }

  test("autoJoin dispatches on the broadcast threshold with identical results") {
    val inner = SpatialJoin.join(pointsDf, polygonDf, SpatialJoin.Predicate.Intersects, "inner")
      .select("point_values_left").as[Double].collect().toSet
    // default threshold: tiny right side => broadcast path
    val auto = SpatialJoin.autoJoin(pointsDf, polygonDf, cellSize = 30.0)
      .select("point_values_left").as[Double].collect().toSet
    assert(auto == inner)
    // threshold disabled => grid path, same rows
    val conf = spark.conf
    val old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gridded = SpatialJoin.autoJoin(pointsDf, polygonDf, cellSize = 30.0,
        leftIdCol = Some("point_values"))
      val plan = gridded.queryExecution.executedPlan // pin BEFORE conf restore
      val rows = gridded.select("point_values_left").as[Double].collect().toSet
      assert(rows == inner)
      assert(!plan.toString.contains("BroadcastNestedLoopJoin"))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("prebuilt broadcast index reuse matches direct join (spatial_index.rs:558-625)") {
    val idx = SpatialJoin.buildIndex(polygonDf, "geometry")
    try {
      val direct = SpatialJoin.join(pointsDf, polygonDf, SpatialJoin.Predicate.Intersects, "inner")
        .select("point_values_left").as[Double].collect().toSet
      val viaIndex = SpatialJoin.joinWithIndex(pointsDf, idx, SpatialJoin.Predicate.Intersects, "inner")
        .select("point_values_left").as[Double].collect().toSet
      assert(viaIndex == direct)
      // second reuse, different join type: left shape (9, 4)
      val leftJoin = SpatialJoin.joinWithIndex(pointsDf, idx, SpatialJoin.Predicate.Intersects, "left")
      assert(leftJoin.count() == 9 && leftJoin.columns.length == 4)
    } finally idx.unpersist()
  }
}
