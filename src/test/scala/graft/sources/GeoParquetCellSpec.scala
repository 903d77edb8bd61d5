package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GeoParquetCellSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("cell-partitioned write prunes directories on the cell predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cell_part").toString
    val df = spark.range(200).selectExpr(
      "id",
      "st_point(cast(id % 360 - 180 as double), cast((id * 7) % 160 - 80 as double)) AS geometry")
    GeoParquet.writeCellPartitioned(df, dir, "geometry", precision = 1)

    val cells = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(cells.nonEmpty && cells.forall(_.startsWith("geometry_cell=")))

    val back = GeoParquet.read(spark, dir)
    assert(back.count() == 200)

    // pick a cell that exists and filter on it
    val one = back.select("geometry_cell").distinct().orderBy("geometry_cell")
      .as[String].head()
    val filtered = back.filter(col("geometry_cell") === one)
    val expected = df.selectExpr("id", s"st_geohash(st_centroid(geometry), 1) AS c")
      .filter(col("c") === one).count()
    assert(filtered.count() == expected && expected > 0)

    // the plan must prune partitions, not filter post-scan
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("geometry_cell"))
  }
}
