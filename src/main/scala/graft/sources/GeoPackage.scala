package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * GeoPackage reader — the third `read_file` format family member the
 * reference reaches through GDAL/pyogrio (reference:
 * python/geopolars/io/file.py:15-119; GeoPackage is named in its docs as a
 * supported OGR source). Implemented as a read-only parser of the two
 * public specs involved: the SQLite 3 database file format (b-tree pages,
 * record serial types, overflow chains) and the OGC GeoPackage geometry
 * BLOB ('GP' header + envelope + WKB). No native libraries.
 *
 * Distribution model: one task per .gpkg file via `binaryFile` (same
 * per-file parallelism as the Shapefile reader; a single huge .gpkg is a
 * driver-side format choice problem — convert to parquet for scale).
 * Feature-table rows become DataFrame rows; the geometry column is
 * unwrapped to plain WKB `BinaryType`, so every st_* expression applies
 * unchanged.
 */
object GeoPackage {

  // ------------------------------------------------------------ sqlite core

  /** Minimal read-only SQLite image: pages, b-tree walk, record decode. */
  private final class Db(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bytes.length >= 100 &&
      new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
      "not a SQLite database")
    val pageSize: Int = {
      val raw = buf.getShort(16) & 0xffff
      if (raw == 1) 65536 else raw
    }
    private val reserved = bytes(20) & 0xff
    val usable: Int = pageSize - reserved
    require((bytes(56) == 0 && bytes(57) == 0 && bytes(58) == 0 && bytes(59) == 1),
      "only UTF-8 encoded SQLite databases are supported")

    private def pageStart(pno: Int): Int = (pno - 1) * pageSize

    /** Decode one varint; returns (value, bytesUsed). */
    private def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(off + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (bytes(off + 8) & 0xff), 9)
    }

    /** Full cell payload, following the overflow chain when present. */
    private def payload(cellOff: Int): (Array[Byte], Long) = {
      val (p, n1) = varint(cellOff)
      val (rowid, n2) = varint(cellOff + n1)
      val bodyOff = cellOff + n1 + n2
      val x = usable - 35
      if (p <= x) {
        (java.util.Arrays.copyOfRange(bytes, bodyOff, bodyOff + p.toInt), rowid)
      } else {
        val m = (usable - 12) * 32 / 255 - 23
        val k = m + ((p - m) % (usable - 4)).toInt
        val inline = if (k <= x) k else m
        val out = new Array[Byte](p.toInt)
        System.arraycopy(bytes, bodyOff, out, 0, inline)
        var written = inline
        var next = buf.getInt(bodyOff + inline)
        while (next != 0 && written < p) {
          val ps = pageStart(next)
          val take = math.min(usable - 4, p.toInt - written)
          System.arraycopy(bytes, ps + 4, out, written, take)
          written += take
          next = buf.getInt(ps)
        }
        require(written == p, s"truncated overflow chain ($written of $p bytes)")
        (out, rowid)
      }
    }

    /** Decode a record payload into column values (sqlite serial types). */
    private def record(payload: Array[Byte], rowid: Long): Array[Any] = {
      val pb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      def varintAt(off: Int): (Long, Int) = {
        var v = 0L; var i = 0
        while (i < 8) {
          val b = payload(off + i) & 0xff
          v = (v << 7) | (b & 0x7f)
          if ((b & 0x80) == 0) return (v, i + 1)
          i += 1
        }
        ((v << 8) | (payload(off + 8) & 0xff), 9)
      }
      val (hdrLen, n0) = varintAt(0)
      val types = scala.collection.mutable.ArrayBuffer.empty[Long]
      var off = n0
      while (off < hdrLen) {
        val (t, n) = varintAt(off)
        types += t
        off += n
      }
      var body = hdrLen.toInt
      types.map { t =>
        def int(n: Int): Long = {
          var v: Long = (payload(body).toLong << 56) >> 56 // sign-extend first byte
          var i = 1
          while (i < n) { v = (v << 8) | (payload(body + i) & 0xffL); i += 1 }
          body += n
          v
        }
        t match {
          case 0 => null
          case 1 => int(1)
          case 2 => int(2)
          case 3 => int(3)
          case 4 => int(4)
          case 5 => int(6)
          case 6 => int(8)
          case 7 => val v = pb.getDouble(body); body += 8; v
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new String(payload, body, len, StandardCharsets.UTF_8)
            body += len; s
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            val b = java.util.Arrays.copyOfRange(payload, body, body + len)
            body += len; b
          case other => throw new IllegalArgumentException(s"serial type $other")
        }
      }.toArray
    }

    /** Walk a table b-tree from `rootPage`, yielding (rowid, columnValues). */
    def scanTable(rootPage: Int): Seq[(Long, Array[Any])] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Any])]
      def walk(pno: Int): Unit = {
        val ps = pageStart(pno)
        val hdrOff = if (pno == 1) ps + 100 else ps
        val ptype = bytes(hdrOff) & 0xff
        val nCells = buf.getShort(hdrOff + 3) & 0xffff
        ptype match {
          case 13 => // leaf table
            val cellPtrBase = hdrOff + 8
            var i = 0
            while (i < nCells) {
              val cellOff = ps + (buf.getShort(cellPtrBase + 2 * i) & 0xffff)
              val (pl, rowid) = payload(cellOff)
              out += ((rowid, record(pl, rowid)))
              i += 1
            }
          case 5 => // interior table: left children + right-most pointer
            val cellPtrBase = hdrOff + 12
            var i = 0
            while (i < nCells) {
              val cellOff = ps + (buf.getShort(cellPtrBase + 2 * i) & 0xffff)
              walk(buf.getInt(cellOff))
              i += 1
            }
            walk(buf.getInt(hdrOff + 8))
          case other =>
            throw new IllegalArgumentException(s"unexpected b-tree page type $other")
        }
      }
      walk(rootPage)
      out.toSeq
    }
  }

  // ------------------------------------------------------- schema plumbing

  private final case class TableDef(name: String, rootPage: Int, sql: String)

  /** sqlite_master scan: (type, name, tbl_name, rootpage, sql). */
  private def masterTables(db: Db): Seq[TableDef] =
    db.scanTable(1).flatMap { case (_, vals) =>
      (vals(0), vals(1), vals(3), vals(4)) match {
        case ("table", name: String, root: Long, sql: String) =>
          Some(TableDef(name, root.toInt, sql))
        case _ => None
      }
    }

  /** Column (name, declaredType, isRowidAlias) from a CREATE TABLE statement. */
  private[sources] def parseCreate(sql: String): Seq[(String, String, Boolean)] = {
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    // split on commas at paren depth 0 (ignores CHECK(...) etc.)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    val constraintKw = Set("CONSTRAINT", "PRIMARY", "UNIQUE", "CHECK", "FOREIGN")
    parts.toSeq.map(_.trim).filter(_.nonEmpty).flatMap { colDef =>
      // identifier: quoted ("x y", `x`, [x]) or bare token
      val (bare, rest0, quoted) = colDef.head match {
        case q @ ('"' | '`') =>
          val end = colDef.indexOf(q, 1)
          (colDef.substring(1, end), colDef.substring(end + 1), true)
        case '[' =>
          val end = colDef.indexOf(']')
          (colDef.substring(1, end), colDef.substring(end + 1), true)
        case _ =>
          val first = colDef.takeWhile(!_.isWhitespace)
          (first, colDef.drop(first.length), false)
      }
      if (!quoted && constraintKw.contains(bare.toUpperCase)) None
      else {
        val rest = rest0.trim
        val declType = rest.takeWhile(c => !",(".contains(c)).trim
          .split("\\s+").takeWhile(w =>
            !Set("PRIMARY", "NOT", "UNIQUE", "DEFAULT", "REFERENCES", "CHECK",
              "COLLATE", "GENERATED", "AUTOINCREMENT").contains(w.toUpperCase))
          .mkString(" ")
        val isRowidAlias =
          "(?i)INTEGER\\s+PRIMARY\\s+KEY".r.findFirstIn(colDef).isDefined
        Some((bare, declType.toUpperCase, isRowidAlias))
      }
    }
  }

  /** SQLite/GeoPackage declared type -> Spark type (affinity-style). */
  private def sparkType(decl: String, isGeom: Boolean): DataType =
    if (isGeom) BinaryType
    else if (decl.contains("INT")) LongType
    else if (decl.contains("BOOL")) BooleanType
    else if (Seq("REAL", "FLOA", "DOUB").exists(decl.contains)) DoubleType
    else if (Seq("CHAR", "CLOB", "TEXT", "DATE", "TIME").exists(decl.contains)) StringType
    else if (decl.contains("BLOB") || decl.isEmpty) BinaryType
    else StringType

  /** Strip the GeoPackage binary header ('GP' + flags + srs + envelope) -> WKB. */
  private[sources] def gpkgBlobToWkb(blob: Array[Byte]): Array[Byte] = {
    if (blob == null || blob.length < 8 ||
        blob(0) != 'G'.toByte || blob(1) != 'P'.toByte)
      return blob // already bare WKB (lenient, like the WKB reader's null path)
    val flags = blob(3) & 0xff
    val envInd = (flags >> 1) & 0x7
    val envLen = envInd match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => throw new IllegalArgumentException(s"invalid envelope indicator $envInd")
    }
    val empty = (flags & 0x10) != 0
    val off = 8 + envLen
    if (empty && blob.length <= off) null
    else java.util.Arrays.copyOfRange(blob, off, blob.length)
  }

  // ----------------------------------------------------------------- read

  private final case class Layer(
      table: String, geomCol: String, colNames: Seq[String], colTypes: Seq[String],
      rootPage: Int, pkCol: Option[String])

  private def resolveLayer(bytes: Array[Byte], layer: Option[String]): Layer = {
    val db = new Db(bytes)
    val tables = masterTables(db)
    val byName = tables.map(t => t.name -> t).toMap
    val geomCols = byName.get("gpkg_geometry_columns").map { t =>
      db.scanTable(t.rootPage).map { case (_, v) =>
        (v(0).asInstanceOf[String], v(1).asInstanceOf[String]) // table_name, column_name
      }
    }.getOrElse(Seq.empty)
    require(geomCols.nonEmpty, "no gpkg_geometry_columns table — not a GeoPackage?")
    val (tname, gcol) = layer match {
      case Some(l) => geomCols.find(_._1 == l)
        .getOrElse(throw new IllegalArgumentException(
          s"layer '$l' not found; available: ${geomCols.map(_._1).mkString(", ")}"))
      case None => geomCols.head
    }
    val tdef = byName.getOrElse(tname,
      throw new IllegalArgumentException(s"feature table '$tname' missing"))
    val cols = parseCreate(tdef.sql)
    // INTEGER PRIMARY KEY column is the rowid alias: its record slot is NULL
    val pk = cols.find(_._3).map(_._1)
    Layer(tname, gcol, cols.map(_._1), cols.map(_._2), tdef.rootPage, pk)
  }

  private def layerSchema(l: Layer): StructType =
    StructType(l.colNames.zip(l.colTypes).map { case (n, d) =>
      val meta =
        if (n == l.geomCol)
          new MetadataBuilder().putBoolean("graft.geometry", true).build()
        else Metadata.empty
      StructField(n, sparkType(d, n == l.geomCol), nullable = true, meta)
    })

  private def layerRows(bytes: Array[Byte], l: Layer): Iterator[Row] = {
    val db = new Db(bytes)
    val geomIdx = l.colNames.indexOf(l.geomCol)
    val pkIdx = l.pkCol.map(l.colNames.indexOf).getOrElse(-1)
    val types = l.colNames.zip(l.colTypes)
      .map { case (n, d) => sparkType(d, n == l.geomCol) }.toArray
    db.scanTable(l.rootPage).iterator.map { case (rowid, vals) =>
      val out = new Array[Any](l.colNames.length)
      var i = 0
      while (i < out.length) {
        val raw = if (i < vals.length) vals(i) else null
        out(i) =
          if (i == pkIdx && raw == null) rowid // rowid-alias column
          else if (i == geomIdx) gpkgBlobToWkb(raw.asInstanceOf[Array[Byte]])
          else (types(i), raw) match {
            case (_, null) => null
            case (LongType, v: Long) => v
            case (DoubleType, v: Double) => v
            case (DoubleType, v: Long) => v.toDouble // int-stored reals
            case (BooleanType, v: Long) => v != 0
            case (StringType, v: String) => v
            case (StringType, v) => v.toString
            case (BinaryType, v: Array[Byte]) => v
            case (t, v) => throw new IllegalArgumentException(
              s"column ${l.colNames(i)}: cannot read ${v.getClass.getSimpleName} as $t")
          }
        i += 1
      }
      Row.fromSeq(out.toIndexedSeq)
    }
  }

  // ----------------------------------------------------------------- write

  /** Minimal SQLite image writer: table b-trees (multi-level), records,
    * overflow chains. Pages assemble in memory; SQLite is a single-file
    * format, so writing is inherently a driver-side EXPORT of (small)
    * results — the scale sink is parquet/GeoParquet. */
  private final class SqliteImage(val pageSize: Int) {
    private val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def addPage(): Int = { pages += new Array[Byte](pageSize); pages.length }
    def setPage(pno: Int, b: Array[Byte]): Unit = pages(pno - 1) = b

    def varint(v: Long): Array[Byte] =
      if (v >= 0 && v < 128) Array(v.toByte)
      else {
        val groups = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var x = v; var n = 0
        while ((x != 0 || n == 0) && n < 9) { groups += (x & 0x7f).toByte; x >>>= 7; n += 1 }
        val r = groups.reverse
        r.indices.dropRight(1).foreach(i => r(i) = (r(i) | 0x80).toByte)
        r.toArray
      }

    /** Record: serial-type header + body. Accepts null/Long/Double/String/Array[Byte]. */
    def record(vals: Seq[Any]): Array[Byte] = {
      val parts = vals.map {
        case null => (varint(0), Array.empty[Byte])
        case v: Long =>
          (varint(6), ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(v).array())
        case v: Double =>
          (varint(7), ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(v).array())
        case v: String =>
          val b = v.getBytes(StandardCharsets.UTF_8)
          (varint(13 + 2L * b.length), b)
        case v: Array[Byte] => (varint(12 + 2L * v.length), v)
        case other => throw new IllegalArgumentException(
          s"unsupported record value ${other.getClass.getSimpleName}")
      }
      val typesLen = parts.map(_._1.length).sum
      // header length varint is self-inclusive: solve the fixpoint
      var hdrLen = typesLen + 1
      while (typesLen + varint(hdrLen).length != hdrLen)
        hdrLen = typesLen + varint(hdrLen).length
      val hdr = varint(hdrLen)
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      out ++= hdr
      parts.foreach(out ++= _._1)
      parts.foreach(out ++= _._2)
      out.toArray
    }

    /** Leaf cell bytes; allocates overflow pages for big payloads. */
    def tableLeafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
      val u = pageSize
      val x = u - 35
      if (payload.length <= x) varint(payload.length) ++ varint(rowid) ++ payload
      else {
        val m = (u - 12) * 32 / 255 - 23
        val k = m + ((payload.length - m) % (u - 4))
        val inline = if (k <= x) k else m
        var rest = payload.drop(inline)
        val chain = scala.collection.mutable.ArrayBuffer.empty[Int]
        var need = rest.length
        while (need > 0) { chain += addPage(); need -= math.min(u - 4, need) }
        chain.zipWithIndex.foreach { case (pno, i) =>
          val page = new Array[Byte](pageSize)
          val next = if (i + 1 < chain.length) chain(i + 1) else 0
          ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN).putInt(next)
          val take = math.min(u - 4, rest.length)
          System.arraycopy(rest, 0, page, 4, take)
          rest = rest.drop(take)
          setPage(pno, page)
        }
        varint(payload.length) ++ varint(rowid) ++ payload.take(inline) ++
          ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(chain.head).array()
      }
    }

    /** Fill a reserved page with a b-tree node. */
    def fillBtreePage(pno: Int, cells: Seq[Array[Byte]], isPage1: Boolean,
        rightMost: Option[Int]): Unit = {
      val page = new Array[Byte](pageSize)
      val base = if (isPage1) 100 else 0
      val buf = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
      val hdrSize = if (rightMost.isDefined) 12 else 8
      page(base) = if (rightMost.isDefined) 5 else 13
      buf.putShort(base + 3, cells.length.toShort)
      rightMost.foreach(rm => buf.putInt(base + 8, rm))
      var contentOff = pageSize
      cells.zipWithIndex.foreach { case (cell, i) =>
        contentOff -= cell.length
        require(contentOff >= base + hdrSize + 2 * cells.length, "page overflow")
        System.arraycopy(cell, 0, page, contentOff, cell.length)
        buf.putShort(base + hdrSize + 2 * i, contentOff.toShort)
      }
      buf.putShort(base + 5, contentOff.toShort)
      setPage(pno, page)
    }

    /** Build a table b-tree from (rowid, payload) rows; returns root page. */
    def buildTable(rows: Iterator[(Long, Array[Byte])]): Int = {
      val leafBudget = pageSize - 8
      var leaves = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)] // (page, maxRowid)
      val cur = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var curBytes = 0
      var lastRowid = 0L
      def flushLeaf(): Unit = if (cur.nonEmpty) {
        val pno = addPage()
        fillBtreePage(pno, cur.toSeq, isPage1 = false, rightMost = None)
        leaves += ((pno, lastRowid))
        cur.clear(); curBytes = 0
      }
      rows.foreach { case (rowid, payload) =>
        val cell = tableLeafCell(rowid, payload)
        if (curBytes + cell.length + 2 > leafBudget && cur.nonEmpty) flushLeaf()
        cur += cell; curBytes += cell.length + 2
        lastRowid = rowid
      }
      flushLeaf()
      if (leaves.isEmpty) { // empty table: a single empty leaf as root
        val pno = addPage()
        fillBtreePage(pno, Seq.empty, isPage1 = false, rightMost = None)
        return pno
      }
      // interior levels until one root remains
      var level = leaves
      while (level.length > 1) {
        val nextLevel = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        val fanBudget = pageSize - 12
        var group = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var groupBytes = 0
        def flushInterior(): Unit = if (group.nonEmpty) {
          val pno = addPage()
          val cells = group.init.map { case (child, key) =>
            ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(child).array() ++ varint(key)
          }
          fillBtreePage(pno, cells.toSeq, isPage1 = false, rightMost = Some(group.last._1))
          nextLevel += ((pno, group.last._2))
          group.clear(); groupBytes = 0
        }
        level.foreach { child =>
          if (groupBytes + 15 > fanBudget && group.length > 1) flushInterior()
          group += child; groupBytes += 15
        }
        flushInterior()
        level = nextLevel
      }
      level.head._1
    }

    def toBytes: Array[Byte] = {
      val out = pages.flatten.toArray
      val magic = "SQLite format 3\u0000".getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(magic, 0, out, 0, 16)
      val buf = ByteBuffer.wrap(out).order(ByteOrder.BIG_ENDIAN)
      buf.putShort(16, (if (pageSize == 65536) 1 else pageSize).toShort)
      out(18) = 1; out(19) = 1
      out(21) = 64; out(22) = 32; out(23) = 32
      buf.putInt(28, pages.length)
      buf.putInt(56, 1) // UTF-8
      out
    }
  }

  private def declType(dt: DataType, isGeom: Boolean): String =
    if (isGeom) "GEOMETRY"
    else dt match {
      case LongType | IntegerType | ShortType | ByteType => "INTEGER"
      case DoubleType | FloatType => "DOUBLE"
      case StringType => "TEXT"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BLOB"
      case other => throw new IllegalArgumentException(
        s"unsupported GeoPackage column type $other")
    }

  /** Wrap bare WKB in the GeoPackage binary header (LE, no envelope). */
  private[sources] def wkbToGpkgBlob(wkb: Array[Byte], srid: Int): Array[Byte] = {
    if (wkb == null) return null
    val b = ByteBuffer.allocate(8 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put('G'.toByte); b.put('P'.toByte); b.put(0.toByte)
    b.put(0x01.toByte) // LE header, no envelope
    b.putInt(srid)
    b.put(wkb)
    b.array()
  }

  /**
   * Write the DataFrame as a single-file GeoPackage (driver-side export —
   * SQLite is one file by construction; results, not raw 100 TB inputs).
   * Emits gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns
   * metadata plus the feature table with a synthetic `fid INTEGER PRIMARY
   * KEY` rowid alias (the same convention GDAL uses on write).
   */
  def write(
      df: DataFrame,
      path: String,
      geomCol: String = "geometry",
      tableName: String = "features",
      srid: Int = 4326,
      pageSize: Int = 4096): Unit = {
    val schema = df.schema
    require(schema.fieldNames.contains(geomCol), s"missing geometry column $geomCol")
    val img = new SqliteImage(pageSize)
    val page1 = img.addPage() // reserve page 1 for sqlite_master

    val colDefs = schema.fields.map(f =>
      s""""${f.name}" ${declType(f.dataType, f.name == geomCol)}""")
    val featSql = s"""CREATE TABLE "$tableName" (fid INTEGER PRIMARY KEY, ${colDefs.mkString(", ")})"""

    // feature rows stream through the driver; geometry wrapped as GP blob
    var n = 0L
    SingleFile.guard(df, "GeoPackage")
    val featRows = df.toLocalIterator()
    val geomIdx = schema.fieldIndex(geomCol)
    val featRoot = img.buildTable(new Iterator[(Long, Array[Byte])] {
      def hasNext: Boolean = featRows.hasNext
      def next(): (Long, Array[Byte]) = {
        val row = featRows.next()
        n += 1
        val vals: Seq[Any] = Seq(null) ++ schema.fields.indices.map { i =>
          val v = row.get(i)
          if (v == null) null
          else if (i == geomIdx) wkbToGpkgBlob(v.asInstanceOf[Array[Byte]], srid)
          else v match {
            case x: Long => x
            case x: Int => x.toLong
            case x: Short => x.toLong
            case x: Byte => x.toLong
            case x: Double => x
            case x: Float => x.toDouble
            case x: String => x
            case x: Boolean => if (x) 1L else 0L
            case x: Array[Byte] => x
            case other => throw new IllegalArgumentException(
              s"unsupported value type ${other.getClass.getSimpleName}")
          }
        }
        (n, img.record(vals))
      }
    })

    val srsSql = "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT, srs_id INTEGER, " +
      "organization TEXT, organization_coordsys_id INTEGER, definition TEXT, description TEXT)"
    val srsRoot = img.buildTable(Iterator(
      (1L, img.record(Seq("WGS 84", srid.toLong, "EPSG", srid.toLong, "GEOGCS[\"WGS 84\"]", null)))))

    val contentsSql = "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT, " +
      "identifier TEXT, description TEXT, last_change TEXT, min_x DOUBLE, min_y DOUBLE, " +
      "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
    val contentsRoot = img.buildTable(Iterator(
      (1L, img.record(Seq(tableName, "features", tableName, "", "", null, null, null, null, srid.toLong)))))

    val ggcSql = "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, " +
      "geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)"
    val ggcRoot = img.buildTable(Iterator(
      (1L, img.record(Seq(tableName, geomCol, "GEOMETRY", srid.toLong, 0L, 0L)))))

    val master = Seq(
      ("gpkg_spatial_ref_sys", srsRoot, srsSql),
      ("gpkg_contents", contentsRoot, contentsSql),
      ("gpkg_geometry_columns", ggcRoot, ggcSql),
      (tableName, featRoot, featSql)
    ).zipWithIndex.map { case ((name, root, sql), i) =>
      img.tableLeafCell(i + 1L, img.record(Seq("table", name, name, root.toLong, sql)))
    }
    img.fillBtreePage(page1, master, isPage1 = true, rightMost = None)

    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(img.toBytes) finally out.close()
  }

  /**
   * Read the first (or named) feature layer of .gpkg file(s) into a
   * DataFrame with a WKB geometry column. Schema comes from the first
   * file; each file parses in its own task.
   */
  def read(spark: SparkSession, path: String, layer: Option[String] = None): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.gpkg")
      .load(path)
      .select("content")
    val first = bin.head().getAs[Array[Byte]](0)
    val l = resolveLayer(first, layer)
    val schema = layerSchema(l)
    val rows = bin.rdd.flatMap(r => layerRows(r.getAs[Array[Byte]](0), l))
    spark.createDataFrame(rows, schema)
  }
}
