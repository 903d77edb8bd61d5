package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom.{LineString, MultiLineString, MultiPolygon, Point, Polygon, WKB}

/** Builds tiny .shp/.dbf files byte-by-byte per the public ESRI spec and
  * round-trips them through Shapefile.read. */
class ShapefileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shpFile(shapeType: Int, records: Seq[Array[Byte]]): Array[Byte] = {
    val contentLen = records.map(r => 8 + r.length).sum
    val total = 100 + contentLen
    val buf = ByteBuffer.allocate(total)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)
    buf.putInt(24, total / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(28, 1000)
    buf.putInt(32, shapeType)
    // bbox left zeroed (readers must not rely on it)
    var pos = 100
    records.zipWithIndex.foreach { case (r, i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(pos, i + 1)
      buf.putInt(pos + 4, r.length / 2)
      var j = 0
      while (j < r.length) { buf.put(pos + 8 + j, r(j)); j += 1 }
      pos += 8 + r.length
    }
    buf.array()
  }

  private def pointRecord(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(1); b.putDouble(x); b.putDouble(y)
    b.array()
  }

  private def polygonRecord(rings: Seq[Array[Double]]): Array[Byte] = {
    val numPoints = rings.map(_.length / 2).sum
    val b = ByteBuffer.allocate(4 + 32 + 8 + rings.length * 4 + numPoints * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(5)
    b.position(b.position() + 32)
    b.putInt(rings.length); b.putInt(numPoints)
    var start = 0
    rings.foreach { r => b.putInt(start); start += r.length / 2 }
    rings.foreach(r => r.foreach(b.putDouble))
    b.array()
  }

  private def dbfFile(names: Seq[(String, Char, Int, Int)], rows: Seq[Seq[String]]): Array[Byte] = {
    val headerSize = 32 + names.length * 32 + 1
    val recordSize = 1 + names.map(_._3).sum
    val total = headerSize + rows.length * recordSize + 1
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 3.toByte)
    buf.putInt(4, rows.length)
    buf.putShort(8, headerSize.toShort)
    buf.putShort(10, recordSize.toShort)
    names.zipWithIndex.foreach { case ((n, t, len, dec), i) =>
      val off = 32 + i * 32
      n.getBytes("ascii").take(10).zipWithIndex.foreach { case (c, j) => buf.put(off + j, c) }
      buf.put(off + 11, t.toByte)
      buf.put(off + 16, len.toByte)
      buf.put(off + 17, dec.toByte)
    }
    buf.put(32 + names.length * 32, 0x0d.toByte)
    rows.zipWithIndex.foreach { case (r, i) =>
      var off = headerSize + i * recordSize
      buf.put(off, ' '.toByte); off += 1
      r.zip(names).foreach { case (v, (_, _, len, _)) =>
        val padded = v.padTo(len, ' ').take(len)
        padded.getBytes("ascii").zipWithIndex.foreach { case (c, j) => buf.put(off + j, c) }
        off += len
      }
    }
    buf.put(total - 1, 0x1a.toByte)
    buf.array()
  }

  test("points + dbf attributes round-trip") {
    val dir = Files.createTempDirectory("graft_shp").toString
    Files.write(Paths.get(dir, "cities.shp"),
      shpFile(1, Seq(pointRecord(1.5, 2.5), pointRecord(-3.0, 4.0), pointRecord(0.0, 0.0))))
    Files.write(Paths.get(dir, "cities.dbf"),
      dbfFile(Seq(("NAME", 'C', 8, 0), ("POP", 'N', 8, 0), ("SCORE", 'N', 8, 2)),
        Seq(Seq("alpha", "100", "1.25"), Seq("beta", "200", "2.5"), Seq("gamma", "", "0.75"))))
    val df = Shapefile.read(spark, dir)
    assert(df.columns.toSeq == Seq("NAME", "POP", "SCORE", "geometry"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.length == 3)
    val alpha = rows(0)
    assert(alpha.getString(0) == "alpha" && alpha.getLong(1) == 100L && alpha.getDouble(2) == 1.25)
    assert(WKB.read(alpha.getAs[Array[Byte]](3)) == Point(1.5, 2.5))
    assert(rows(2).isNullAt(1)) // empty numeric -> null
  }

  test("polygon with hole: CW outer / CCW hole assembled correctly") {
    val dir = Files.createTempDirectory("graft_shp2").toString
    val outerCw = Array(0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0, 0.0, 0.0)
    val holeCcw = Array(2.0, 2.0, 4.0, 2.0, 4.0, 4.0, 2.0, 4.0, 2.0, 2.0)
    Files.write(Paths.get(dir, "poly.shp"), shpFile(5, Seq(polygonRecord(Seq(outerCw, holeCcw)))))
    Files.write(Paths.get(dir, "poly.dbf"),
      dbfFile(Seq(("ID", 'N', 4, 0)), Seq(Seq("7"))))
    val df = Shapefile.read(spark, dir)
    val g = WKB.read(df.collect().head.getAs[Array[Byte]]("geometry"))
    g match {
      case p: Polygon =>
        assert(p.rings.length == 2)
        assert(graft.geom.Algos.area(p) == 100.0 - 4.0)
      case other => fail(s"expected Polygon, got $other")
    }
  }

  test("two outer rings become a MultiPolygon") {
    val dir = Files.createTempDirectory("graft_shp3").toString
    val a = Array(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0)
    val b = Array(5.0, 5.0, 5.0, 6.0, 6.0, 6.0, 6.0, 5.0, 5.0, 5.0)
    Files.write(Paths.get(dir, "mp.shp"), shpFile(5, Seq(polygonRecord(Seq(a, b)))))
    Files.write(Paths.get(dir, "mp.dbf"), dbfFile(Seq(("ID", 'N', 4, 0)), Seq(Seq("1"))))
    val g = WKB.read(Shapefile.read(spark, dir).collect().head.getAs[Array[Byte]]("geometry"))
    g match {
      case mp: MultiPolygon => assert(mp.geoms.length == 2)
      case other            => fail(s"expected MultiPolygon, got $other")
    }
  }

  test("writer round-trip: points, lines, polygons-with-holes, attributes, nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_shp_w").toString

    // points + mixed attribute types (N long, N double, C string, L bool)
    val pts = Seq(
      (1L, 2.5, "alpha", true, graft.geom.WKB.write(Point(10.0, -5.25))),
      (2L, -0.125, "beta", false, graft.geom.WKB.write(Point(-180.0, 90.0))),
      (3L, 7.0, "gamma", true, null.asInstanceOf[Array[Byte]]) // null shape
    ).toDF("id", "score", "name", "flag", "geometry")
    Shapefile.write(pts, s"$dir/pts", "geometry")
    val back = Shapefile.read(spark, dir).orderBy("id")
      .select("id", "score", "name", "flag", "geometry").collect()
    assert(back.length == 3)
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back.map(_.getDouble(1)).toSeq == Seq(2.5, -0.125, 7.0))
    assert(back.map(_.getString(2)).toSeq == Seq("alpha", "beta", "gamma"))
    assert(back.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
    assert(WKB.read(back(0).getAs[Array[Byte]](4)) == Point(10.0, -5.25))
    assert(back(2).isNullAt(4)) // null shape survives as SQL NULL

    // polygon with hole: orientation re-derived by the reader
    val ring = Array(0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0, 0.0, 0.0)
    val hole = Array(2.0, 2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 2.0, 2.0, 2.0)
    val dir2 = Files.createTempDirectory("graft_shp_w2").toString
    val polys = Seq(
      (1L, graft.geom.WKB.write(Polygon(Array(ring, hole)))),
      (2L, graft.geom.WKB.write(MultiLineString(Array(
        LineString(Array(0.0, 0.0, 1.0, 1.0)),
        LineString(Array(5.0, 5.0, 6.0, 7.0))))))
    ).toDF("id", "geometry")
    // write polygons and lines as separate files (one shape type per file)
    Shapefile.write(polys.filter($"id" === 1L), s"$dir2/poly", "geometry")
    val backPoly = WKB.read(Shapefile.read(spark, s"$dir2/poly.shp")
      .collect().head.getAs[Array[Byte]]("geometry"))
    backPoly match {
      case p: Polygon =>
        assert(p.rings.length == 2)
        assert(graft.geom.Algos.area(p) == 100.0 - 4.0)
      case other => fail(s"expected Polygon, got $other")
    }
    val dir3 = Files.createTempDirectory("graft_shp_w3").toString
    Shapefile.write(polys.filter($"id" === 2L), s"$dir3/lines", "geometry")
    val backLines = WKB.read(Shapefile.read(spark, s"$dir3/lines.shp")
      .collect().head.getAs[Array[Byte]]("geometry"))
    backLines match {
      case ml: MultiLineString => assert(ml.geoms.length == 2)
      case other => fail(s"expected MultiLineString, got $other")
    }
  }
}
