package graft.api

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom._

class ReadFileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): java.io.File = {
    val d = Files.createTempDirectory(s"graft_readfile_$tag").toFile
    d.deleteOnExit()
    d
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("geometry", BinaryType)))

  private def writeFgb(dir: java.io.File): String = {
    val rows = (0 until 50).map(i =>
      Row(i.toLong, s"n$i", WKB.write(Point(i.toDouble, i.toDouble))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val p = new java.io.File(dir, "pts.fgb").getAbsolutePath
    graft.sources.FlatGeobuf.write(df, p)
    p
  }

  test("columns / where / skip / max compose") {
    val p = writeFgb(tmpDir("opts"))
    val g = GeoIO.readFile(spark, p, GeoIO.ReadOptions(
      columns = Seq("id"),
      where = Some("id % 2 = 0"),
      skipFeatures = 2,
      maxFeatures = 5))
    val out = g.df.orderBy("id").collect()
    assert(g.df.columns.toSeq == Seq("id", "geometry"))
    assert(out.length == 5)
  }

  test("fids select stored record numbers on fgb") {
    val dir = tmpDir("fids")
    val p = writeFgb(dir)
    // fid = stored (hilbert-sorted) record order; fetch them all with fids
    // disabled first to learn the mapping
    val all = graft.sources.FlatGeobuf.read(spark, p, withFid = true)
      .select("fid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Seq(0L, 3L, 7L)
    val got = GeoIO.readFile(spark, p, GeoIO.ReadOptions(fids = want))
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(got == want.map(all).toSet)
  }

  test("bbox on fgb prunes through the index; sql runs over the layer") {
    val p = writeFgb(tmpDir("bbox"))
    val g = GeoIO.readFile(spark, p, GeoIO.ReadOptions(
      bbox = Some((10.5, 10.5, 20.5, 20.5)),
      sql = Some("SELECT count(*) AS n FROM layer")))
    assert(g.df.collect()(0).getLong(0) == 10)
  }

  test("dispatches shapefile with fids") {
    val dir = tmpDir("shp")
    val rows = (0 until 10).map(i =>
      Row(i.toLong, s"n$i", WKB.write(Point(i.toDouble, -i.toDouble))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val base = new java.io.File(dir, "pts").getAbsolutePath
    graft.sources.Shapefile.write(df.orderBy("id"), base, "geometry")
    val g = GeoIO.readFile(spark, base + ".shp", GeoIO.ReadOptions(fids = Seq(2L, 4L)))
    // shapefile preserves write order, so fid == id here
    assert(g.df.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 4L))
  }
}
