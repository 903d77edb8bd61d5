package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Byte-level SQLite image builder — just enough of the file format to
  * exercise the GeoPackage reader: leaf/interior table b-trees, record
  * serial types, and payload overflow chains. */
class SqliteFixtureBuilder(pageSize: Int) {
  private val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
  def addPage(): Int = { pages += new Array[Byte](pageSize); pages.length }
  def setPage(pno: Int, bytes: Array[Byte]): Unit = pages(pno - 1) = bytes
  def usable: Int = pageSize

  def varint(v: Long): Array[Byte] = {
    require(v >= 0)
    if (v < 128) Array(v.toByte)
    else {
      val groups = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v
      while (x > 0) { groups += (x & 0x7f).toByte; x >>= 7 }
      val r = groups.reverse
      r.indices.dropRight(1).foreach(i => r(i) = (r(i) | 0x80).toByte)
      r.toArray
    }
  }

  /** SQLite record: header of serial types + body. */
  def record(vals: Seq[Any]): Array[Byte] = {
    val parts = vals.map {
      case null => (varint(0), Array.empty[Byte])
      case v: Long =>
        val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(v).array()
        (varint(6), b)
      case v: Double =>
        val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(v).array()
        (varint(7), b)
      case v: String =>
        val b = v.getBytes(StandardCharsets.UTF_8)
        (varint(13 + 2L * b.length), b)
      case v: Array[Byte] => (varint(12 + 2L * v.length), v)
      case other => throw new IllegalArgumentException(other.getClass.getName)
    }
    val typesLen = parts.map(_._1.length).sum
    // header length varint includes itself; sizes here stay < 128
    val hdrLen = typesLen + 1
    require(hdrLen < 128)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out += hdrLen.toByte
    parts.foreach(p => out ++= p._1)
    parts.foreach(p => out ++= p._2)
    out.toArray
  }

  /** Table-leaf cell; spills to fresh overflow pages when needed. */
  def tableLeafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val u = usable
    val x = u - 35
    if (payload.length <= x)
      varint(payload.length) ++ varint(rowid) ++ payload
    else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + ((payload.length - m) % (u - 4))
      val inline = if (k <= x) k else m
      var rest = payload.drop(inline)
      val chain = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (rest.nonEmpty) {
        val pno = addPage()
        chain += pno
        rest = rest.drop(u - 4)
      }
      var restData = payload.drop(inline)
      chain.zipWithIndex.foreach { case (pno, i) =>
        val page = new Array[Byte](pageSize)
        val next = if (i + 1 < chain.length) chain(i + 1) else 0
        ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN).putInt(next)
        val take = math.min(u - 4, restData.length)
        System.arraycopy(restData, 0, page, 4, take)
        restData = restData.drop(take)
        setPage(pno, page)
      }
      varint(payload.length) ++ varint(rowid) ++ payload.take(inline) ++
        ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(chain.head).array()
    }
  }

  /** Assemble a b-tree page from prebuilt cells (leaf 13 / interior 5). */
  def btreePage(pno: Int, cells: Seq[Array[Byte]], isPage1: Boolean = false,
      interior: Option[Int] = None): Unit = {
    val page = new Array[Byte](pageSize)
    val base = if (isPage1) 100 else 0
    val buf = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
    val hdrSize = if (interior.isDefined) 12 else 8
    page(base) = if (interior.isDefined) 5 else 13
    buf.putShort(base + 3, cells.length.toShort)
    interior.foreach(rm => buf.putInt(base + 8, rm))
    var contentOff = pageSize
    cells.zipWithIndex.foreach { case (cell, i) =>
      contentOff -= cell.length
      System.arraycopy(cell, 0, page, contentOff, cell.length)
      buf.putShort(base + hdrSize + 2 * i, contentOff.toShort)
    }
    buf.putShort(base + 5, contentOff.toShort)
    setPage(pno, page)
  }

  /** Interior-table cell: 4-byte left child + varint rowid key. */
  def interiorCell(child: Int, key: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(child).array() ++ varint(key)

  def toBytes: Array[Byte] = {
    val out = pages.flatten.toArray
    // 100-byte header overlays the start of page 1
    val magic = "SQLite format 3\u0000".getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(magic, 0, out, 0, 16)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.BIG_ENDIAN)
    buf.putShort(16, (if (pageSize == 65536) 1 else pageSize).toShort)
    out(18) = 1; out(19) = 1 // rollback-journal versions
    out(21) = 64; out(22) = 32; out(23) = 32
    buf.putInt(28, pages.length)
    buf.putInt(56, 1) // UTF-8
    out
  }
}

object GpkgFixture {
  def wkbPoint(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(1); b.putDouble(x); b.putDouble(y)
    b.array()
  }

  /** Standard GeoPackage geometry blob: GP header + XY envelope + WKB. */
  def gpBlob(x: Double, y: Double): Array[Byte] = {
    val wkb = wkbPoint(x, y)
    val b = ByteBuffer.allocate(8 + 32 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put('G'.toByte); b.put('P'.toByte); b.put(0.toByte)
    b.put(0x03.toByte) // envelope indicator 1 (XY), little-endian header
    b.putInt(4326)
    Seq(x, x, y, y).foreach(b.putDouble)
    b.put(wkb)
    b.array()
  }

  val masterSqlFeat =
    "CREATE TABLE feat (fid INTEGER PRIMARY KEY AUTOINCREMENT, \"name\" TEXT NOT NULL, value DOUBLE, geom GEOMETRY)"
  val masterSqlGgc =
    "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)"

  def masterRow(b: SqliteFixtureBuilder, rowid: Long, name: String, root: Long, sql: String): Array[Byte] =
    b.tableLeafCell(rowid, b.record(Seq("table", name, name, root, sql)))

  def ggcRow(b: SqliteFixtureBuilder, rowid: Long, table: String, col: String): Array[Byte] =
    b.tableLeafCell(rowid, b.record(Seq(table, col, "POINT", 4326L, 0L, 0L)))
}

class GeoPackageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import GpkgFixture._

  private def writeGpkg(bytes: Array[Byte], tag: String): String = {
    val d = Files.createTempDirectory(s"graft_gpkg_$tag").toFile
    d.deleteOnExit()
    Files.write(new java.io.File(d, "data.gpkg").toPath, bytes)
    d.getAbsolutePath
  }

  test("reads a point layer: schema, rowid alias, GP blob -> WKB, nulls") {
    val b = new SqliteFixtureBuilder(1024)
    (1 to 3).foreach(_ => b.addPage())
    b.btreePage(1, Seq(
      masterRow(b, 1, "feat", 2, masterSqlFeat),
      masterRow(b, 2, "gpkg_geometry_columns", 3, masterSqlGgc)), isPage1 = true)
    b.btreePage(2, Seq(
      b.tableLeafCell(1, b.record(Seq(null, "amsterdam", 1.5, gpBlob(4.9, 52.37)))),
      b.tableLeafCell(7, b.record(Seq(null, "null-geom", -2.0, null))),
      b.tableLeafCell(9, b.record(Seq(null, "bare-wkb", 0.25, wkbPoint(-1.5, 8.0))))))
    b.btreePage(3, Seq(ggcRow(b, 1, "feat", "geom")))

    val df = GeoPackage.read(spark, writeGpkg(b.toBytes, "basic"))
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      ("fid", "long"), ("name", "string"), ("value", "double"), ("geom", "binary")))
    graft.functions.GeoRegistry.register(spark)
    val rows = df.selectExpr("fid", "name", "value", "st_x(geom) AS x")
      .orderBy("fid").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 7L, 9L)) // rowid alias
    assert(rows(0).getString(1) == "amsterdam" && math.abs(rows(0).getDouble(3) - 4.9) < 1e-12)
    assert(rows(1).isNullAt(3)) // null geometry survives
    assert(math.abs(rows(2).getDouble(3) - (-1.5)) < 1e-12) // bare WKB fallback
  }

  test("overflow chains: payload larger than a page reads back intact") {
    val b = new SqliteFixtureBuilder(512)
    (1 to 3).foreach(_ => b.addPage())
    val longName = "x" * 900 // > usable-35 => spills across two overflow pages
    b.btreePage(2, Seq(
      b.tableLeafCell(1, b.record(Seq(null, longName, 3.5, gpBlob(1.0, 2.0))))))
    b.btreePage(3, Seq(ggcRow(b, 1, "feat", "geom")))
    b.btreePage(1, Seq(
      masterRow(b, 1, "feat", 2, masterSqlFeat),
      masterRow(b, 2, "gpkg_geometry_columns", 3, masterSqlGgc)), isPage1 = true)

    val row = GeoPackage.read(spark, writeGpkg(b.toBytes, "ovf")).head()
    assert(row.getAs[String]("name") == longName)
    assert(row.getAs[Double]("value") == 3.5)
  }

  test("interior b-tree pages: multi-page tables walk in order") {
    val b = new SqliteFixtureBuilder(1024)
    (1 to 5).foreach(_ => b.addPage()) // 1 master, 2 root(interior), 3 ggc, 4+5 leaves
    b.btreePage(4, (1L to 3L).map(i =>
      b.tableLeafCell(i, b.record(Seq(null, s"row$i", i.toDouble, gpBlob(i, i))))))
    b.btreePage(5, (4L to 6L).map(i =>
      b.tableLeafCell(i, b.record(Seq(null, s"row$i", i.toDouble, gpBlob(i, i))))))
    b.btreePage(2, Seq(b.interiorCell(4, 3L)), interior = Some(5))
    b.btreePage(3, Seq(ggcRow(b, 1, "feat", "geom")))
    b.btreePage(1, Seq(
      masterRow(b, 1, "feat", 2, masterSqlFeat),
      masterRow(b, 2, "gpkg_geometry_columns", 3, masterSqlGgc)), isPage1 = true)

    val df = GeoPackage.read(spark, writeGpkg(b.toBytes, "tree"))
    assert(df.select("fid").as[Long].collect().sorted.toSeq == (1L to 6L))
  }

  test("parseCreate: quoted identifiers, constraints, rowid alias flag") {
    val cols = GeoPackage.parseCreate(
      """CREATE TABLE "t" (id INTEGER PRIMARY KEY, "quoted name" TEXT,
        | v REAL DEFAULT 1.5, b BLOB, flag BOOLEAN,
        | CONSTRAINT c CHECK (v > 0), PRIMARY KEY (id))""".stripMargin)
    assert(cols.map(_._1) == Seq("id", "quoted name", "v", "b", "flag"))
    assert(cols.map(_._2) == Seq("INTEGER", "TEXT", "REAL", "BLOB", "BOOLEAN"))
    assert(cols.map(_._3) == Seq(true, false, false, false, false))
  }

  test("write -> read round-trip with multi-page b-tree (2000 rows)") {
    graft.functions.GeoRegistry.register(spark)
    val df = spark.range(2000).selectExpr(
      "id AS k",
      "concat('name_', id) AS label",
      "cast(id as double) / 4 AS score",
      "id % 2 = 0 AS even",
      "st_point(cast(id % 360 - 180 as double), cast(id % 160 - 80 as double)) AS geometry")
    val d = Files.createTempDirectory("graft_gpkg_rt").toFile
    d.deleteOnExit()
    val file = new java.io.File(d, "out.gpkg").getAbsolutePath
    GeoPackage.write(df, file, "geometry", tableName = "pts")

    val back = GeoPackage.read(spark, d.getAbsolutePath)
    assert(back.count() == 2000)
    assert(back.schema.fieldNames.toSeq ==
      Seq("fid", "k", "label", "score", "even", "geometry"))
    val r = back.filter($"k" === 1234L)
      .selectExpr("fid", "label", "score", "even", "st_x(geometry) AS x").head()
    assert(r.getAs[String]("label") == "name_1234")
    assert(r.getAs[Double]("score") == 308.5)
    assert(r.getAs[Boolean]("even"))
    assert(r.getAs[Double]("x") == (1234 % 360 - 180).toDouble)
    // fids are the write-order rowids 1..2000
    assert(back.agg(org.apache.spark.sql.functions.sum("fid")).head().getLong(0) ==
      2000L * 2001 / 2)
  }

  test("randomized round-trip: mixed geometry types, UTF-8 attrs, nulls") {
    graft.functions.GeoRegistry.register(spark)
    import graft.geom._
    val rnd = new scala.util.Random(31337L)
    def randGeom(): graft.geom.Geometry = rnd.nextInt(4) match {
      case 0 => Point(rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85)
      case 1 => LineString(Array.fill((2 + rnd.nextInt(5)) * 2)(rnd.nextDouble() * 50))
      case 2 =>
        val x = rnd.nextDouble() * 50; val y = rnd.nextDouble() * 50
        Polygon(Array(Array(x, y, x + 1, y, x + 1, y + 1, x, y + 1, x, y)))
      case _ => MultiPoint(Array.fill(1 + rnd.nextInt(3))(
        Point(rnd.nextDouble() * 9, rnd.nextDouble() * 9)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("geometry", org.apache.spark.sql.types.BinaryType)))
    val rows = (0 until 250).map { i =>
      org.apache.spark.sql.Row(i.toLong,
        if (i % 6 == 0) null else s"étiquette_中_${rnd.nextInt(100)}",
        if (i % 9 == 0) null else WKB.write(randGeom()))
    }
    val src = (0 until 250).map(i => rows(i))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(src, 1), schema)
    val d = Files.createTempDirectory("graft_gpkg_fuzz").toFile
    d.deleteOnExit()
    GeoPackage.write(df, new java.io.File(d, "fz.gpkg").getAbsolutePath, "geometry", "fz")
    val back = GeoPackage.read(spark, d.getAbsolutePath).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(back.size == 250)
    rows.foreach { r =>
      val k = r.getLong(0)
      val b = back(k)
      assert(b.getAs[String]("label") == r.getString(1), s"label @$k")
      val g0 = Option(r.getAs[Array[Byte]](2)).map(WKB.readOrNull).orNull
      val g1 = Option(b.getAs[Array[Byte]]("geometry")).map(WKB.readOrNull).orNull
      assert(g0 == g1, s"geometry @$k")
    }
  }

  test("named layer selection and missing-layer error") {
    val b = new SqliteFixtureBuilder(1024)
    (1 to 3).foreach(_ => b.addPage())
    b.btreePage(1, Seq(
      masterRow(b, 1, "feat", 2, masterSqlFeat),
      masterRow(b, 2, "gpkg_geometry_columns", 3, masterSqlGgc)), isPage1 = true)
    b.btreePage(2, Seq(b.tableLeafCell(1, b.record(Seq(null, "a", 1.0, gpBlob(0, 0))))))
    b.btreePage(3, Seq(ggcRow(b, 1, "feat", "geom")))
    val dir = writeGpkg(b.toBytes, "layer")
    assert(GeoPackage.read(spark, dir, Some("feat")).count() == 1)
    val err = intercept[IllegalArgumentException] {
      GeoPackage.read(spark, dir, Some("nope")).count()
    }
    assert(err.getMessage.contains("available: feat"))
  }
}
