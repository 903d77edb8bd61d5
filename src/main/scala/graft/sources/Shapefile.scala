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

  /** Shoelace signed area of a packed coordinate ring (y-up convention:
    * CCW positive, CW negative) — shared by ring assembly (read) and
    * ring orientation (write). */
  private def signedRingArea(cs: Array[Double]): Double = {
    var a = 0.0
    var i = 0
    while (i + 3 < cs.length) {
      a += cs(i) * cs(i + 3) - cs(i + 2) * cs(i + 1)
      i += 2
    }
    a / 2
  }

  /** Shapefile rings: clockwise = outer, counter-clockwise = hole; holes
    * attach to the first outer ring containing their first vertex. */
  private def assemblePolygons(rings: Array[Array[Double]]): Geom = {
    val (outers, holes) = rings.partition(signedRingArea(_) < 0) // CW => negative
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

  private def parseDbf(bytes: Array[Byte],
      charset: String = "ascii"): (Seq[DbfField], Seq[Array[String]]) = {
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
        // field widths are BYTE widths (dBase spec); decode the byte slice
        // with the requested codepage — names above stay ascii per spec
        val v = new String(bytes, fo, f.len, charset).trim
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
   *
   * `encoding` pins the DBF string codepage (read_file's `encoding`,
   * reference io/file.py:44-47); when absent, a sibling `.cpg` file is
   * honored per-file, falling back to ascii (the historical default).
   */
  def read(spark: SparkSession, path: String, withFid: Boolean = false,
      encoding: Option[String] = None): DataFrame = {
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
    val attrFields =
      fields.map(f => StructField(f.name, dbfDataType(f), nullable = true)) :+
        StructField("geometry", BinaryType, nullable = true)
    val schema = StructType(
      if (withFid) StructField("fid", LongType, nullable = false) +: attrFields
      else attrFields)

    val fieldsBc = spark.sparkContext.broadcast(fields)
    val emitFid = withFid
    val enc = encoding
    val rows = shpFiles.flatMap { case (p, shpBytes) =>
      val geoms = parseShp(shpBytes)
      val charset = enc.orElse(
        readSiblingBytes(p, confBc.value.value, ".cpg")
          .map(b => new String(b, "ascii").trim).filter(_.nonEmpty))
        .getOrElse("ascii")
      val attrs: Seq[Array[String]] =
        readSiblingBytes(p, confBc.value.value).map(d => parseDbf(d, charset)._2).getOrElse(Seq.empty)
      val fs = fieldsBc.value
      geoms.zipWithIndex.map { case (g, i) =>
        val attrVals: Seq[Any] =
          if (i < attrs.length) fs.zip(attrs(i)).map { case (f, s) => dbfValue(f, s) }
          else fs.map(_ => null)
        val base = attrVals :+ (if (g == null) null else WKB.write(g))
        // fid = record index in file order (the shapefile record number - 1)
        Row.fromSeq(if (emitFid) i.toLong +: base else base)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    rows.toDF()
  }

  // ----------------------------------------------------------------- write

  /**
   * Write the DataFrame as one ESRI shapefile (.shp + .shx + .dbf, the
   * 1998 spec) — driver-side export like the GeoPackage writer: a
   * shapefile is a single unsplittable file by construction (results,
   * not raw 100 TB inputs; those belong in GeoParquet). Geometry column
   * must be WKB; attribute columns become dBase fields (N for integral/
   * floating, L for boolean, C otherwise). Ring orientation follows the
   * spec: outer rings clockwise, holes counter-clockwise.
   */
  def write(df: DataFrame, basePath: String, geomCol: String = "geometry"): Unit = {
    val schema = df.schema
    require(schema.fieldNames.contains(geomCol), s"missing geometry column $geomCol")
    val geomIdx = schema.fieldIndex(geomCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    SingleFile.guard(df, "Shapefile")
    val rows = df.collect()

    // raw field text, locale-pinned (de_DE would emit "2,5" and the
    // reader would null it out) and measured in ASCII BYTES (unmappable
    // chars become '?' bytes; char-counted widths would misalign records)
    def rawText(dt: DataType, dec: Int, v: Any): Array[Byte] = {
      val s =
        if (v == null) ""
        else dt match {
          case DoubleType | FloatType =>
            String.format(java.util.Locale.ROOT, s"%.${dec}f",
              Double.box(v.asInstanceOf[Number].doubleValue()))
          case BooleanType => if (v == true) "T" else "F"
          case _ => v.toString
        }
      s.getBytes("ascii")
    }

    // dBase field descriptors: widths measured from the DATA. Strings
    // truncate at the dBase cap (254); numerics must FIT — truncating a
    // number silently writes a different value, so fail fast instead
    val fields = attrs.map { case (f, i) =>
      def maxW(dec: Int) = math.max(1,
        rows.iterator.map(r => rawText(f.dataType, dec,
          if (r.isNullAt(i)) null else r.get(i)).length).foldLeft(0)(math.max))
      def numW(floor: Int, dec: Int): Int = {
        val w = math.max(floor, maxW(dec))
        require(w <= 254,
          s"numeric column ${f.name} needs $w chars, over the dBase 254 cap")
        w
      }
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          DbfField(f.name.take(10), 'N', numW(18, 0), 0)
        case DoubleType | FloatType =>
          DbfField(f.name.take(10), 'N', numW(24, 6), 6)
        case BooleanType => DbfField(f.name.take(10), 'L', 1, 0)
        case _ => DbfField(f.name.take(10), 'C', math.min(254, maxW(0)), 0)
      }
    }

    def fmtBytes(fld: DbfField, dt: DataType, v: Any): Array[Byte] = {
      val raw = rawText(dt, fld.dec, v).take(fld.len)
      val out = new Array[Byte](fld.len)
      java.util.Arrays.fill(out, ' '.toByte)
      if (fld.typ == 'C') System.arraycopy(raw, 0, out, 0, raw.length)
      else System.arraycopy(raw, 0, out, fld.len - raw.length, raw.length)
      out
    }

    // --- geometry records
    def reverse(cs: Array[Double]): Array[Double] = {
      val out = new Array[Double](cs.length)
      var i = 0
      while (i < cs.length) {
        out(i) = cs(cs.length - 2 - i); out(i + 1) = cs(cs.length - 1 - i); i += 2
      }
      out
    }
    def bboxOf(coords: Seq[Array[Double]]): Array[Double] = {
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      coords.foreach { cs =>
        var i = 0
        while (i + 1 < cs.length) {
          xmin = math.min(xmin, cs(i)); xmax = math.max(xmax, cs(i))
          ymin = math.min(ymin, cs(i + 1)); ymax = math.max(ymax, cs(i + 1))
          i += 2
        }
      }
      Array(xmin, ymin, xmax, ymax)
    }
    def multiPartRecord(shapeType: Int, parts: Seq[Array[Double]]): Array[Byte] = {
      val numPoints = parts.map(_.length / 2).sum
      val bb = ByteBuffer.allocate(4 + 32 + 8 + 4 * parts.length + 16 * numPoints)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(shapeType)
      val box = bboxOf(parts)
      bb.putDouble(box(0)).putDouble(box(1)).putDouble(box(2)).putDouble(box(3))
      bb.putInt(parts.length).putInt(numPoints)
      var off = 0
      parts.foreach { p => bb.putInt(off); off += p.length / 2 }
      parts.foreach { p => p.foreach(bb.putDouble) }
      bb.array()
    }
    def record(g: Geom): Array[Byte] = g match {
      case null => ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(0).array()
      case Point(x, y) =>
        ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(1).putDouble(x).putDouble(y).array()
      case MultiPoint(ps) =>
        val bb = ByteBuffer.allocate(4 + 32 + 4 + 16 * ps.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(8)
        val box = bboxOf(ps.map(p => Array(p.x, p.y)).toSeq)
        bb.putDouble(box(0)).putDouble(box(1)).putDouble(box(2)).putDouble(box(3))
        bb.putInt(ps.length)
        ps.foreach(p => bb.putDouble(p.x).putDouble(p.y))
        bb.array()
      case LineString(cs) => multiPartRecord(3, Seq(cs))
      case MultiLineString(ls) => multiPartRecord(3, ls.map(_.coords).toSeq)
      case Polygon(rings) => multiPartRecord(5, orientRings(rings, reverse))
      case MultiPolygon(polys) =>
        multiPartRecord(5, polys.flatMap(p => orientRings(p.rings, reverse)).toSeq)
      case other => throw new IllegalArgumentException(
        s"shapefile cannot represent ${other.getClass.getSimpleName}")
    }

    val geoms = rows.map(r =>
      if (r.isNullAt(geomIdx)) null
      else WKB.readOrNull(r.getAs[Array[Byte]](geomIdx)))
    // ESRI spec: ONE shape type per file (plus Null shapes) — fail fast
    // instead of writing a header that lies about the records
    val types = geoms.filter(_ != null).map(shapeTypeOf).distinct
    require(types.length <= 1,
      s"shapefile allows one shape type per file, got types ${types.mkString(", ")}")
    val recs = geoms.map(record)

    // --- .shp / .shx assembly
    val totalShp = 100 + recs.map(8 + _.length).sum
    val shp = ByteBuffer.allocate(totalShp)
    val shx = ByteBuffer.allocate(100 + 8 * recs.length)
    def header(bb: ByteBuffer, fileLenBytes: Int): Unit = {
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(9994); bb.position(24); bb.putInt(fileLenBytes / 2)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000)
      bb.putInt(if (geoms.forall(_ == null)) 0
        else geoms.collectFirst { case g if g != null => shapeTypeOf(g) }.get)
      val present = geoms.filter(_ != null)
      val box =
        if (present.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
        else {
          val es = present.map(_.envelope)
          Array(es.map(_.minX).min, es.map(_.minY).min,
            es.map(_.maxX).max, es.map(_.maxY).max)
        }
      box.foreach(bb.putDouble)
      bb.position(100) // z/m ranges stay zero
    }
    header(shp, totalShp)
    header(shx, 100 + 8 * recs.length)
    var offWords = 50
    recs.zipWithIndex.foreach { case (rec, i) =>
      shx.order(ByteOrder.BIG_ENDIAN).putInt(offWords).putInt(rec.length / 2)
      shp.order(ByteOrder.BIG_ENDIAN).putInt(i + 1).putInt(rec.length / 2)
      shp.put(rec)
      offWords += 4 + rec.length / 2
    }

    // --- .dbf assembly
    val headerSize = 32 + 32 * fields.length + 1
    val recordSize = 1 + fields.map(_.len).sum
    val dbf = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0x03.toByte).put(Array[Byte](124, 1, 1)) // version, Y2K-era stamp
    dbf.putInt(rows.length)
    dbf.putShort(headerSize.toShort).putShort(recordSize.toShort)
    dbf.position(32)
    fields.foreach { f =>
      val name = f.name.getBytes("ascii").padTo(11, 0.toByte)
      dbf.put(name).put(f.typ.toByte)
      dbf.position(dbf.position() + 4)
      dbf.put(f.len.toByte).put(f.dec.toByte)
      dbf.position(dbf.position() + 14)
    }
    dbf.put(0x0d.toByte)
    rows.foreach { r =>
      dbf.put(' '.toByte)
      fields.zip(attrs).foreach { case (f, (sf, i)) =>
        dbf.put(fmtBytes(f, sf.dataType, if (r.isNullAt(i)) null else r.get(i)))
      }
    }
    dbf.put(0x1a.toByte)

    val base = basePath.replaceAll("\\.shp$", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".shp"), shp.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".shx"), shx.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".dbf"), dbf.array())
  }

  private def shapeTypeOf(g: Geom): Int = g match {
    case _: Point => 1
    case _: MultiPoint => 8
    case _: LineString | _: MultiLineString => 3
    case _: Polygon | _: MultiPolygon => 5
    case _ => 0
  }

  /** Outer rings clockwise (negative signed area in the y-up convention
    * used by the reader), holes counter-clockwise. */
  private def orientRings(
      rings: Array[Array[Double]],
      rev: Array[Double] => Array[Double]): Seq[Array[Double]] =
    rings.zipWithIndex.map { case (r, i) =>
      val a = signedRingArea(r)
      if (i == 0) { if (a < 0) r else rev(r) } // outer: CW
      else { if (a > 0) r else rev(r) } // hole: CCW
    }.toSeq

  /** Load the .dbf next to a .shp through the Hadoop FS API with the
    * session's configuration. */
  private def readSiblingBytes(
      shpPath: String,
      conf: org.apache.hadoop.conf.Configuration,
      ext: String = ".dbf"): Option[Array[Byte]] = {
    val dbf = new org.apache.hadoop.fs.Path(shpPath.replaceAll("\\.shp$", ext))
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
