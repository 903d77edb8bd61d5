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

  test("hilbertIndex is a proper Hilbert walk: distinct, and consecutive cells are adjacent") {
    // 32x32 coarse grid at cell centers; the order-16 index restricted to
    // this granularity must be the order-5 Hilbert curve: all distinct,
    // every consecutive pair of cells grid-adjacent (Manhattan distance 1)
    val k = 32
    val cells = for (i <- 0 until k; j <- 0 until k) yield {
      val lon = (i + 0.5) / k * 360.0 - 180.0
      val lat = (j + 0.5) / k * 180.0 - 90.0
      (i, j, GeoParquet.hilbertIndex(lon, lat))
    }
    assert(cells.map(_._3).distinct.size == k * k)
    val walk = cells.sortBy(_._3)
    walk.sliding(2).foreach { case Seq((i1, j1, _), (i2, j2, _)) =>
      assert(math.abs(i1 - i2) + math.abs(j1 - j2) == 1,
        s"non-adjacent step ($i1,$j1)->($i2,$j2)")
    }
  }
}
