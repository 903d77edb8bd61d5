package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** st_z / st_hasz (strictly-2D contract: NULL / false — the reference
  * reserves GeoSeries.z/has_z in docs but writes 2D-only WKB) and
  * st_almostequals (geopandas geom_almost_equals: equals-exact with
  * tolerance 0.5 * 10^-decimal, default decimal=6). */
class ZAlmostEqualsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(s"SELECT $sql").head()

  test("st_z is NULL and st_hasz false on the 2D model") {
    val r = one(
      """st_z(st_point(3.0, 4.0)) AS z,
        |st_hasz(st_point(3.0, 4.0)) AS hp,
        |st_hasz(st_geomfromtext('LINESTRING (0 0, 1 1)')) AS hl,
        |st_hasz(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))')) AS hpoly""".stripMargin)
    assert(r.isNullAt(0))
    assert(!r.getBoolean(1) && !r.getBoolean(2) && !r.getBoolean(3))
  }

  test("st_z/st_hasz propagate NULL input") {
    val r = one("st_z(cast(NULL as binary)) AS z, st_hasz(cast(NULL as binary)) AS h")
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("st_almostequals default decimal=6 (tol 5e-7)") {
    val r = one(
      """st_almostequals(st_point(1.0, 2.0), st_point(1.0 + 1.0E-7, 2.0)) AS near,
        |st_almostequals(st_point(1.0, 2.0), st_point(1.0 + 1.0E-6, 2.0)) AS far""".stripMargin)
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("st_almostequals explicit decimal scales the tolerance") {
    val r = one(
      """st_almostequals(st_point(1.0, 2.0), st_point(1.001, 2.0), 2) AS coarse,
        |st_almostequals(st_point(1.0, 2.0), st_point(1.001, 2.0), 6) AS fine,
        |st_almostequals(st_geomfromtext('LINESTRING (0 0, 1 1)'),
        |  st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)'), 0) AS diffcount""".stripMargin)
    assert(r.getBoolean(0) && !r.getBoolean(1) && !r.getBoolean(2))
  }
}
