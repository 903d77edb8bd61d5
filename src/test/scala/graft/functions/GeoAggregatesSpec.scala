package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SQL-surface tests for st_envelope_agg / st_collect / st_union_agg. */
class GeoAggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("st_envelope_agg: bbox union per group") {
    val rows = spark.sql(
      """SELECT g, st_xmin(e) AS x0, st_ymin(e) AS y0, st_xmax(e) AS x1, st_ymax(e) AS y1
        |FROM (
        |  SELECT g, st_envelope_agg(pt) AS e FROM VALUES
        |    ('a', st_point(0.0, 0.0)), ('a', st_point(2.0, 5.0)),
        |    ('b', st_point(-1.0, -1.0))
        |  AS t(g, pt) GROUP BY g) ORDER BY g""".stripMargin).collect()
    assert(rows(0).getString(0) == "a")
    assert((1 to 4).map(rows(0).getDouble) == Seq(0.0, 0.0, 2.0, 5.0))
    assert((1 to 4).map(rows(1).getDouble) == Seq(-1.0, -1.0, -1.0, -1.0))
  }

  test("st_collect: points gather into MultiPoint, deterministic") {
    val rows = spark.sql(
      """SELECT st_geometrytype(c) AS t, st_numpoints(c) AS n, st_astext(c) AS wkt
        |FROM (SELECT st_collect(pt) AS c FROM VALUES
        |  (st_point(3.0, 4.0)), (st_point(1.0, 2.0)), (st_point(1.0, 2.0))
        |AS t(pt))""".stripMargin).collect()
    assert(rows(0).getString(0) == "MultiPoint")
    assert(rows(0).getInt(1) == 3) // collect keeps duplicates (gather, not dissolve)
    assert(rows(0).getString(2).startsWith("MULTIPOINT"))
  }

  test("st_union_agg: dissolves overlap, groups independent") {
    val rows = spark.sql(
      """SELECT g, st_area(u) AS a FROM (
        |  SELECT g, st_union_agg(box) AS u FROM VALUES
        |    ('x', st_makeenvelope(0.0, 0.0, 2.0, 2.0)),
        |    ('x', st_makeenvelope(1.0, 1.0, 3.0, 3.0)),
        |    ('y', st_makeenvelope(0.0, 0.0, 1.0, 1.0)),
        |    ('y', st_makeenvelope(5.0, 5.0, 6.0, 6.0))
        |  AS t(g, box) GROUP BY g) ORDER BY g""".stripMargin).collect()
    assert(math.abs(rows(0).getDouble(1) - 7.0) < 1e-9) // 4 + 4 - 1
    assert(math.abs(rows(1).getDouble(1) - 2.0) < 1e-9) // disjoint multipolygon
  }

  test("st_union_agg survives partial aggregation across many partitions") {
    import spark.implicits._
    // 100 unit boxes stepping 0.5 along x: union = rectangle [0, 50.5] x [0,1]
    val df = spark.range(101).repartition(7)
      .selectExpr("st_makeenvelope(cast(id * 0.5 as double), 0.0, cast(id * 0.5 + 1.0 as double), 1.0) AS b")
    val area = df.selectExpr("st_area(st_union_agg(b)) AS a").as[Double].head()
    assert(math.abs(area - 51.0) < 1e-9)
  }

  test("aggregates return null on empty/all-null input") {
    val r = spark.sql(
      "SELECT st_envelope_agg(g) IS NULL, st_collect(g) IS NULL, st_union_agg(g) IS NULL " +
      "FROM (SELECT cast(null as binary) AS g)").collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("st_makeline_agg orders by key, is partitioning-invariant, nulls under 2 points") {
    import spark.implicits._
    val pts = Seq(
      (1L, 3L, 30.0, 3.0), (1L, 1L, 10.0, 1.0), (1L, 2L, 20.0, 2.0),
      (2L, 1L, 0.0, 0.0),
      (3L, 2L, 5.0, 5.0), (3L, 1L, 4.0, 4.0)
    ).toDF("g", "k", "x", "y")
    pts.createOrReplaceTempView("mkline_pts")
    val out = spark.sql(
      """SELECT g, st_astext(st_makeline_agg(st_point(x, y), k)) AS wkt
        |FROM mkline_pts GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(out(0).getString(1) == "LINESTRING (10 1, 20 2, 30 3)")
    assert(out(1).isNullAt(1)) // single point -> null
    assert(out(2).getString(1) == "LINESTRING (4 4, 5 5)")
    // partitioning-invariant
    pts.repartition(7).createOrReplaceTempView("mkline_pts2")
    val out2 = spark.sql(
      """SELECT g, st_astext(st_makeline_agg(st_point(x, y), k)) AS wkt
        |FROM mkline_pts2 GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(out.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ==
      out2.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq)
    // line inputs contribute coords as a unit
    val lw = spark.sql(
      """SELECT st_astext(st_makeline_agg(g, k)) AS wkt FROM (
        |  SELECT st_geomfromtext('LINESTRING (0 0, 1 1)') AS g, 2 AS k
        |  UNION ALL SELECT st_point(9.0, 9.0), 1)""".stripMargin).head()
    assert(lw.getString(0) == "LINESTRING (9 9, 0 0, 1 1)")
  }
}
