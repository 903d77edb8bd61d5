package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Planner strategy tests: `a JOIN b ON st_*(...)` must plan as
 * SpatialIndexJoinExec (not BNLJ) and produce BNLJ-identical results —
 * the strategy is a physical rewrite, never a semantics change.
 */
class SpatialStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference fixture: 9 points x 1 polygon (spatial_index.rs:432-556)
  private def pointsDf: DataFrame = Seq(
    (0.0, 10.0, 1.0), (1.0, 1.0, 2.0), (10.0, 1.0, 3.0), (1.0, -1.0, 4.0),
    (0.0, -10.0, 5.0), (-1.0, -1.0, 6.0), (-10.0, 0.0, 7.0), (-1.0, 1.0, 8.0),
    (0.0, 10.0, 9.0)
  ).toDF("x", "y", "point_values").selectExpr("st_point(x, y) AS geometry", "point_values")

  private def polyDf: DataFrame =
    Seq("test").toDF("string_col")
      .selectExpr("st_makeenvelope(0.0, 0.0, 20.0, 20.0) AS pgeom", "string_col")

  private def hasSpatialExec(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect { case _: SpatialIndexJoinExec => true }.nonEmpty

  private def hasBnlj(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect { case _: BroadcastNestedLoopJoinExec => true }.nonEmpty

  test("st_contains join plans as SpatialIndexJoinExec and matches reference inner shape (2,4)") {
    val joined = pointsDf.join(polyDf, org.apache.spark.sql.functions.expr("st_contains(pgeom, geometry)"))
    assert(hasSpatialExec(joined), joined.queryExecution.executedPlan.toString)
    val rows = joined.collect()
    assert(rows.length == 2)
    // strictly-inside points (boundary-excluding contains): (1,1) and (10,1)
    assert(rows.map(_.getAs[Double]("point_values")).sorted.toSeq == Seq(2.0, 3.0))
    assert(rows.forall(_.getAs[String]("string_col") == "test"))
  }

  test("left outer keeps all 9 left rows (reference left shape (9,4))") {
    val joined = pointsDf.join(polyDf,
      org.apache.spark.sql.functions.expr("st_contains(pgeom, geometry)"), "left")
    assert(hasSpatialExec(joined))
    val rows = joined.collect()
    assert(rows.length == 9)
    assert(rows.count(_.getAs[String]("string_col") == null) == 7)
  }

  test("left outer null-fills non-nullable right columns as NULL (not 0)") {
    // Seq[Long].toDF gives a non-nullable long: without nullability widening
    // in the projection, unmatched rows would read the null row as id 0
    val boxes = Seq(7L).toDF("box_id")
      .selectExpr("box_id", "st_makeenvelope(0.0, 0.0, 2.0, 2.0) AS pgeom")
    val joined = pointsDf.join(boxes,
      org.apache.spark.sql.functions.expr("st_contains(pgeom, geometry)"), "left")
    assert(hasSpatialExec(joined))
    val rows = joined.selectExpr("point_values", "box_id").collect()
    assert(rows.length == 9)
    assert(rows.count(r => r.isNullAt(1)) == 8, rows.mkString(";"))
    assert(rows.filter(!_.isNullAt(1)).map(_.getLong(1)).toSeq == Seq(7L))
  }

  test("st_within / argument flip normalizes correctly") {
    val j1 = pointsDf.join(polyDf, org.apache.spark.sql.functions.expr("st_within(geometry, pgeom)"))
    assert(hasSpatialExec(j1))
    assert(j1.count() == 2)
    val j2 = polyDf.join(pointsDf, org.apache.spark.sql.functions.expr("st_contains(pgeom, geometry)"))
    assert(hasSpatialExec(j2))
    assert(j2.count() == 2)
  }

  test("st_intersects join with residual conjunct") {
    val joined = pointsDf.join(polyDf,
      org.apache.spark.sql.functions.expr("st_intersects(geometry, pgeom) AND point_values > 2.0"))
    assert(hasSpatialExec(joined))
    // boundary-INclusive intersects hits (0,10)x2, (1,1), (10,1);
    // residual point_values > 2 keeps pv 3 and 9
    assert(joined.collect().map(_.getAs[Double]("point_values")).sorted.toSeq == Seq(3.0, 9.0))
  }

  test("st_dwithin join with literal distance") {
    val joined = pointsDf.join(polyDf,
      org.apache.spark.sql.functions.expr("st_dwithin(geometry, pgeom, 1.5)"))
    assert(hasSpatialExec(joined))
    // within 1.5 of the box: all but (0,-10) and (-10,0) at distance 10
    assert(joined.count() == 7)
  }

  test("strategy result equals BNLJ result (strategy disabled via threshold)") {
    val withStrategy = pointsDf.join(polyDf,
      org.apache.spark.sql.functions.expr("st_intersects(geometry, pgeom)")).collect().toSet
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bnlj = pointsDf.join(polyDf,
        org.apache.spark.sql.functions.expr("st_intersects(geometry, pgeom)"))
      // threshold off: strategy declines; Catalyst plans BNLJ or cartesian+filter
      assert(!hasSpatialExec(bnlj), "threshold off must fall back to built-in planning")
      assert(bnlj.collect().toSet == withStrategy)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("non-spatial joins are untouched") {
    val a = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val b = Seq((1, "x")).toDF("k", "w")
    val j = a.join(b, "k")
    assert(!hasSpatialExec(j))
    assert(j.count() == 1)
  }

  test("DE-9IM predicates plan through SpatialIndexJoinExec, not BNLJ") {
    val boxes = Seq((0.0, 0.0), (10.0, 0.0), (5.0, 5.0), (30.0, 30.0))
      .toDF("bx", "by")
      .selectExpr("st_makeenvelope(bx, by, bx + 10.0, by + 10.0) AS bgeom", "bx", "by")
    val probe = Seq("p").toDF("tag")
      .selectExpr("st_makeenvelope(0.0, 0.0, 10.0, 10.0) AS pgeom", "tag")

    val touches = boxes.join(probe,
      org.apache.spark.sql.functions.expr("st_touches(bgeom, pgeom)"))
    assert(hasSpatialExec(touches) && !hasBnlj(touches),
      touches.queryExecution.executedPlan.toString)
    // edge-adjacent box at (10,0) touches; the identical box and the
    // overlapping one share interior; (30,30) is disjoint
    assert(touches.select("bx").collect().map(_.getDouble(0)).toSeq == Seq(10.0))

    val overlaps = boxes.join(probe,
      org.apache.spark.sql.functions.expr("st_overlaps(pgeom, bgeom)"))
    assert(hasSpatialExec(overlaps) && !hasBnlj(overlaps))
    assert(overlaps.select("bx").collect().map(_.getDouble(0)).toSeq == Seq(5.0))

    val equalsJ = boxes.join(probe,
      org.apache.spark.sql.functions.expr("st_equals(bgeom, pgeom)"))
    assert(hasSpatialExec(equalsJ) && !hasBnlj(equalsJ))
    assert(equalsJ.select("bx").collect().map(_.getDouble(0)).toSeq == Seq(0.0))

    val covers = boxes.join(probe,
      org.apache.spark.sql.functions.expr("st_coveredby(pgeom, bgeom)"))
    assert(hasSpatialExec(covers) && !hasBnlj(covers))
    assert(covers.select("bx").collect().map(_.getDouble(0)).toSeq == Seq(0.0))
  }
}
