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

  test("read_geometry=false nulls the column AFTER geometry filters; sql_dialect guard") {
    val p = writeFgb(tmpDir("nogeo"))
    val g = GeoIO.readFile(spark, p, GeoIO.ReadOptions(
      bbox = Some((10.5, 10.5, 20.5, 20.5)), // still filters on the real geometry
      readGeometry = false, sqlDialect = Some("spark")))
    val rows = g.df.collect()
    assert(rows.length == 10 && rows.forall(_.isNullAt(g.df.columns.indexOf("geometry"))))
    val err = intercept[IllegalArgumentException] {
      GeoIO.readFile(spark, p, GeoIO.ReadOptions(sqlDialect = Some("OGRSQL")))
    }
    assert(err.getMessage.contains("sql_dialect"))
  }

  test("force2d strips Z/M WKB (ISO offsets and EWKB flags) through readFile") {
    def zPoint(isoType: Int, x: Double, y: Double, z: Double): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).putInt(isoType).putDouble(x).putDouble(y).putDouble(z)
      b.array()
    }
    val rows = Seq(
      Row(1L, zPoint(1001, 3.0, 4.0, 99.0)),       // ISO Z point
      Row(2L, zPoint(0x80000001, 5.0, 6.0, -1.0)), // EWKB Z flag
      Row(3L, WKB.write(Point(7.0, 8.0))))          // plain 2D passes through
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType),
        StructField("geometry", BinaryType))))
    val dir = new java.io.File(tmpDir("force2d"), "z.parquet").getAbsolutePath
    df.write.parquet(dir)
    // without force2d the engine's 2D decode nulls the Z rows out
    graft.functions.GeoRegistry.register(spark)
    val raw = GeoIO.readFile(spark, dir).df
      .selectExpr("id", "st_x(geometry) AS x").orderBy("id").collect()
    assert(raw(0).isNullAt(1) && raw(1).isNullAt(1) && raw(2).getDouble(1) == 7.0)
    val f2d = GeoIO.readFile(spark, dir, GeoIO.ReadOptions(force2d = true)).df
      .selectExpr("id", "st_x(geometry) AS x", "st_y(geometry) AS y")
      .orderBy("id").collect()
    assert(f2d.map(r => (r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((3.0, 4.0), (5.0, 6.0), (7.0, 8.0)))
  }

  test("dbf encoding: explicit codepage and .cpg sibling both decode cp1252 bytes") {
    val dir = tmpDir("enc")
    val rows = Seq(Row(1L, "XXXXX", WKB.write(Point(1.0, 2.0))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val base = new java.io.File(dir, "pts").getAbsolutePath
    graft.sources.Shapefile.write(df, base, "geometry")
    // patch the placeholder with the windows-1252 bytes of "Grüße"
    val dbfPath = java.nio.file.Paths.get(base + ".dbf")
    val bytes = java.nio.file.Files.readAllBytes(dbfPath)
    val target = "Grüße".getBytes("windows-1252")
    val idx = bytes.indexOfSlice("XXXXX".getBytes("ascii"))
    assert(idx > 0 && target.length == 5)
    System.arraycopy(target, 0, bytes, idx, 5)
    java.nio.file.Files.write(dbfPath, bytes)

    def nameOf(opts: GeoIO.ReadOptions) =
      GeoIO.readFile(spark, base + ".shp", opts).df.select("name").collect()(0).getString(0)
    assert(nameOf(GeoIO.ReadOptions(encoding = Some("windows-1252"))) == "Grüße")
    // default ascii decode mangles the high bytes (U+FFFD replacements)
    assert(nameOf(GeoIO.ReadOptions()).contains('�'))
    // .cpg sibling supplies the codepage when no explicit encoding is given
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".cpg"),
      "windows-1252".getBytes("ascii"))
    assert(nameOf(GeoIO.ReadOptions()) == "Grüße")
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
