package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GeoRegistry

/** Large-large spatial join rewrite (GridJoinRule): plan shape + parity
  * with the broadcast/BNLJ answer. */
class GridJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def setupViews(): Unit = {
    GeoRegistry.register(spark)
    // 2000 points spread over [-100, 100] x [-50, 50]
    spark.range(2000).selectExpr(
      "id AS pid",
      "st_point(cast(id % 200 - 100 as double), cast((id * 13) % 100 - 50 as double)) AS pgeom")
      .createOrReplaceTempView("pts")
    // 40 boxes, 9x9 => spans many unit cells
    spark.range(40).selectExpr(
      "id AS bid",
      "st_makeenvelope(cast(id * 5 - 100 as double), cast((id * 7) % 80 - 40 as double), " +
        "cast(id * 5 - 91 as double), cast((id * 7) % 80 - 31 as double)) AS bgeom")
      .createOrReplaceTempView("boxes")
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("both-sides-large st_contains join plans as grid equi-join, same answer") {
    setupViews()
    val sql =
      """SELECT cast(count(*) as bigint) AS n, cast(sum(pid * bid) as bigint) AS s
        |FROM pts JOIN boxes ON st_contains(bgeom, pgeom)""".stripMargin
    val reference = spark.sql(sql).collect().head // broadcast-size path
    val (plan, grid) = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.grid.cellSize" -> "4.0") {
      val df = spark.sql(sql)
      (df.queryExecution.executedPlan.toString, df.collect().head)
    }
    assert(!plan.contains("BroadcastNestedLoop"), s"BNLJ still present:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"no shuffled equi-join in:\n$plan")
    assert(grid == reference)
    assert(grid.getLong(0) > 0)
  }

  test("multi-cell replication dedups via reference point (tiny cells)") {
    setupViews()
    val sql =
      """SELECT cast(count(*) as bigint) AS n
        |FROM pts JOIN boxes ON st_intersects(pgeom, bgeom)""".stripMargin
    val reference = spark.sql(sql).collect().head.getLong(0)
    val grid = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.grid.cellSize" -> "2.5") { // 9x9 boxes cover ~16 cells each
      spark.sql(sql).collect().head.getLong(0)
    }
    assert(grid == reference)
  }

  test("st_dwithin pads the probe side; same answer as broadcast path") {
    setupViews()
    val sql =
      """SELECT cast(count(*) as bigint) AS n
        |FROM pts a JOIN boxes b ON st_dwithin(pgeom, bgeom, 3.0)""".stripMargin
    val reference = spark.sql(sql).collect().head.getLong(0)
    val grid = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.grid.cellSize" -> "5.0") {
      spark.sql(sql).collect().head.getLong(0)
    }
    assert(grid == reference && grid > 0)
  }

  test("null geometries drop from the inner join, matching BNLJ semantics") {
    setupViews()
    GeoRegistry.register(spark)
    spark.range(20).selectExpr(
      "id AS pid",
      "CASE WHEN id % 4 = 0 THEN cast(null as binary) " +
        "ELSE st_point(cast(id as double), cast(id as double)) END AS pgeom")
      .createOrReplaceTempView("pts_null")
    val sql =
      """SELECT cast(count(*) as bigint) AS n
        |FROM pts_null JOIN boxes ON st_intersects(pgeom, bgeom)""".stripMargin
    val reference = spark.sql(sql).collect().head.getLong(0)
    val grid = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.sql(sql).collect().head.getLong(0)
    }
    assert(grid == reference)
  }

  test("auto cell sizing: dense-core data gets a density-matched cell that beats the fixed 1.0") {
    setupViews()
    // dense core: 3000 points + 3000 tiny boxes all inside [0, 1] x [0, 1] —
    // the byte-light hot-cell shape AQE's byte-based skew split cannot fix
    spark.range(3000).selectExpr(
      "id AS pid",
      "st_point(cast(id % 97 as double) / 97.0, cast((id * 31) % 89 as double) / 89.0) AS pgeom")
      .createOrReplaceTempView("dense_pts")
    spark.range(3000).selectExpr(
      "id AS bid",
      "st_makeenvelope(cast(id % 101 as double) / 101.0, cast((id * 17) % 103 as double) / 103.0, " +
        "cast(id % 101 as double) / 101.0 + 0.02, cast((id * 17) % 103 as double) / 103.0 + 0.02) AS bgeom")
      .createOrReplaceTempView("dense_boxes")
    // heuristic picks the sampled scale, not the fixed 1.0 that would put
    // EVERY row in O(1) shared cells (quadratic candidate pairs)
    val boxEnvs = spark.table("dense_boxes").limit(1024).collect()
      .map(r => graft.geom.WKB.read(r.getAs[Array[Byte]]("bgeom")).envelope)
    val ptEnvs = spark.table("dense_pts").limit(1024).collect()
      .map(r => graft.geom.WKB.read(r.getAs[Array[Byte]]("pgeom")).envelope)
    val autoBox = GridJoinRule.autoCellSize(boxEnvs)
    val autoPt = GridJoinRule.autoCellSize(ptEnvs)
    assert(math.abs(autoBox - 0.02) < 1e-9, s"median box extent expected, got $autoBox")
    assert(autoPt > 0 && autoPt < 0.3, s"point spacing estimate out of range: $autoPt")
    // candidate-pair audit: pairs sharing a cell at the auto size vs at the
    // old fixed default — the quadratic-work reduction the rule targets
    def candidatePairs(cell: Double): Long = {
      val boxCells = boxEnvs.flatMap { e =>
        val c = GridJoinRule.cells(graft.geom.WKB.write(
          graft.geom.Polygon(Array(Array(e.minX, e.minY, e.maxX, e.minY,
            e.maxX, e.maxY, e.minX, e.maxY, e.minX, e.minY)))), cell, 0.0)
        c.toLongArray()
      }.groupBy(identity).view.mapValues(_.length.toLong)
      val ptCells = ptEnvs.map(e => graft.spatial.SpatialJoin.cellId(
        math.floor(e.minX / cell).toLong, math.floor(e.minY / cell).toLong))
        .groupBy(identity).view.mapValues(_.length.toLong)
      boxCells.map { case (c, nb) => nb * ptCells.getOrElse(c, 0L) }.sum
    }
    val cellAuto = math.max(autoBox, autoPt)
    assert(candidatePairs(cellAuto) * 10 < candidatePairs(1.0),
      s"auto cell $cellAuto should cut candidate pairs >=10x vs fixed 1.0: " +
        s"${candidatePairs(cellAuto)} vs ${candidatePairs(1.0)}")
    // end-to-end: default (auto) conf, forced large-large => same answer as
    // the broadcast reference
    val sql =
      """SELECT cast(count(*) as bigint) AS n
        |FROM dense_pts JOIN dense_boxes ON st_intersects(pgeom, bgeom)""".stripMargin
    val reference = spark.sql(sql).collect().head.getLong(0)
    val grid = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.sql(sql).collect().head.getLong(0)
    }
    assert(grid == reference && grid > 0)
  }

  test("residual conjuncts survive the rewrite") {
    setupViews()
    val sql =
      """SELECT cast(count(*) as bigint) AS n
        |FROM pts JOIN boxes ON st_contains(bgeom, pgeom) AND pid % 2 = 0 AND bid > 5""".stripMargin
    val reference = spark.sql(sql).collect().head.getLong(0)
    val grid = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.sql(sql).collect().head.getLong(0)
    }
    assert(grid == reference)
  }
}
