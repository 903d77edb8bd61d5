package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.geom.{Geometry => Geom, _}

/**
 * ESRI Shapefile reader (public format spec: ESRI Shapefile Technical
 * Description, 1998): parses .shp geometry records and sibling .dbf
 * (dBase III) attribute records into a DataFrame with a WKB geometry
 * column — the §2.1 `read_file` slice the reference delegates to
 * GDAL/pyogrio for (reference: python/geopolars/io/file.py:15-119),
 * re-expressed without native dependencies.
 *
 * Distribution model: one task per .shp file (`binaryFile` source), the
 * same per-file parallelism the reference's single-process reader cannot
 * exceed; a directory of shapefiles fans out across executors. Shape types
 * supported: Null(0), Point(1), PolyLine(3), Polygon(5), MultiPoint(8)
 * — the 2D types the reference's WKB path round-trips.
 */
object Shapefile {

  // ------------------------------------------------------------------ .shp

  private def parseShp(bytes: Array[Byte]): Seq[Geom] = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.order(ByteOrder.BIG_ENDIAN).getInt(0) == 9994,
      "not a shapefile (bad magic)")
    // file length is in 16-bit words, header is 100 bytes
    val fileLen = buf.getInt(24).toLong * 2
    val out = scala.collection.mutable.ArrayBuffer.empty[Geom]
    var pos = 100
    while (pos + 8 <= fileLen) {
      val contentWords = buf.order(ByteOrder.BIG_ENDIAN).getInt(pos + 4)
      val rec = bytes.slice(pos + 8, pos + 8 + contentWords * 2)
      out += parseRecord(rec)
      pos += 8 + contentWords * 2
    }
    out.toSeq
  }

  private def parseRecord(rec: Array[Byte]): Geom = {
    val b = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
    b.getInt match {
      case 0 => null // Null Shape => SQL NULL geometry
      case 1 => Point(b.getDouble, b.getDouble)
      case 8 => // MultiPoint: bbox, numPoints, points
        b.position(b.position() + 32)
        val n = b.getInt
        MultiPoint(Array.fill(n)(Point(b.getDouble, b.getDouble)))
      case 3 => // PolyLine: bbox, numParts, numPoints, parts, points
        val (parts, pts) = partsAndPoints(b)
        val lines = parts.indices.map { i =>
          LineString(sliceCoords(pts, parts, i))
        }
        if (lines.length == 1) lines.head else MultiLineString(lines.toArray)
      case 5 => // Polygon: rings; CW = outer, CCW = hole (shapefile spec)
        val (parts, pts) = partsAndPoints(b)
        val rings = parts.indices.map(i => sliceCoords(pts, parts, i)).toArray
        assemblePolygons(rings)
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  private def partsAndPoints(b: ByteBuffer): (Array[Int], Array[Double]) = {
    b.position(b.position() + 32) // skip bbox
    val numParts = b.getInt
    val numPoints = b.getInt
    val parts = Array.fill(numParts)(b.getInt)
    val pts = new Array[Double](numPoints * 2)
    var i = 0
    while (i < pts.length) { pts(i) = b.getDouble; i += 1 }
    (parts, pts)
  }

  private def sliceCoords(pts: Array[Double], parts: Array[Int], i: Int): Array[Double] = {
    val start = parts(i) * 2
    val end = if (i + 1 < parts.length) parts(i + 1) * 2 else pts.length
    pts.slice(start, end)
  }

  /** Shapefile rings: clockwise = outer, counter-clockwise = hole; holes
    * attach to the first outer ring containing their first vertex. */
  private def assemblePolygons(rings: Array[Array[Double]]): Geom = {
    def signedArea(cs: Array[Double]): Double = {
      var a = 0.0
      var i = 0
      while (i + 3 < cs.length) {
        a += cs(i) * cs(i + 3) - cs(i + 2) * cs(i + 1)
        i += 2
      }
      a / 2
    }
    val (outers, holes) = rings.partition(signedArea(_) < 0) // CW => negative
    if (outers.isEmpty) return Polygon(rings) // degenerate: treat as-is
    if (outers.length == 1) return Polygon(outers ++ holes)
    val assigned = Array.fill(outers.length)(scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    holes.foreach { h =>
      val idx = outers.indexWhere(o => Algos.pointInRing(h(0), h(1), o) != 0)
      if (idx >= 0) assigned(idx) += h // orphan holes (malformed input) are dropped
    }
    MultiPolygon(outers.zipWithIndex.map { case (o, i) =>
      Polygon(Array(o) ++ assigned(i))
    })
  }

  // ------------------------------------------------------------------ .dbf

  private final case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def parseDbf(bytes: Array[Byte]): (Seq[DbfField], Seq[Array[String]]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = b.getInt(4)
    val headerSize = b.getShort(8) & 0xffff
    val recordSize = b.getShort(10) & 0xffff
    val fields = scala.collection.mutable.ArrayBuffer.empty[DbfField]
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0d) {
      val name = new String(bytes, off, 11, "ascii").takeWhile(_ != 0).trim
      val typ = bytes(off + 11).toChar
      val len = bytes(off + 16) & 0xff
      val dec = bytes(off + 17) & 0xff
      fields += DbfField(name, typ, len, dec)
      off += 32
    }
    val rows = (0 until numRecords).map { r =>
      val base = headerSize + r.toLong * recordSize
      var fo = base.toInt + 1 // skip deletion flag
      fields.map { f =>
        val v = new String(bytes, fo, f.len, "ascii").trim
        fo += f.len
        v
      }.toArray
    }
    (fields.toSeq, rows)
  }

  private def dbfDataType(f: DbfField): DataType = f.typ match {
    case 'N' | 'F' => if (f.dec > 0 || f.typ == 'F') DoubleType else LongType
    case 'L'       => BooleanType
    case _         => StringType // C, D, and anything exotic as text
  }

  private def dbfValue(f: DbfField, s: String): Any =
    if (s.isEmpty) null
    else f.typ match {
      case 'N' | 'F' =>
        try { if (f.dec > 0 || f.typ == 'F') s.toDouble else s.toLong }
        catch { case _: NumberFormatException => null }
      case 'L' => "YyTt".contains(s.head)
      case _   => s
    }

  // ------------------------------------------------------------------ read

  /**
   * Read `path` (a .shp file, or a directory/glob of them) into a
   * DataFrame of the .dbf attribute columns plus a WKB `geometry` column.
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val shpFiles = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.shp").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]

    // session Hadoop conf (spark.hadoop.* settings, credentials, schemes)
    // must also govern the executor-side .dbf sibling reads
    val hadoopConf = spark.sessionState.newHadoopConf()
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))

    // schema from the first file's .dbf (driver-side peek, one small file)
    val firstPath = shpFiles.select("path").as[String].head()
    val firstDbf = readSiblingBytes(firstPath, hadoopConf)
    val fields = firstDbf.map(d => parseDbf(d)._1).getOrElse(Seq.empty)
    val schema = StructType(
      fields.map(f => StructField(f.name, dbfDataType(f), nullable = true)) :+
        StructField("geometry", BinaryType, nullable = true))

    val fieldsBc = spark.sparkContext.broadcast(fields)
    val rows = shpFiles.flatMap { case (p, shpBytes) =>
      val geoms = parseShp(shpBytes)
      val attrs: Seq[Array[String]] =
        readSiblingBytes(p, confBc.value.value).map(d => parseDbf(d)._2).getOrElse(Seq.empty)
      val fs = fieldsBc.value
      geoms.zipWithIndex.map { case (g, i) =>
        val attrVals: Seq[Any] =
          if (i < attrs.length) fs.zip(attrs(i)).map { case (f, s) => dbfValue(f, s) }
          else fs.map(_ => null)
        Row.fromSeq(attrVals :+ (if (g == null) null else WKB.write(g)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    rows.toDF()
  }

  /** Load the .dbf next to a .shp through the Hadoop FS API with the
    * session's configuration. */
  private def readSiblingBytes(
      shpPath: String,
      conf: org.apache.hadoop.conf.Configuration): Option[Array[Byte]] = {
    val dbf = new org.apache.hadoop.fs.Path(shpPath.replaceAll("\\.shp$", ".dbf"))
    val fs = dbf.getFileSystem(conf)
    if (!fs.exists(dbf)) None
    else {
      val in = fs.open(dbf)
      try {
        val len = fs.getFileStatus(dbf).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        Some(buf)
      } finally in.close()
    }
  }
}
