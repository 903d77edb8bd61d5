package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/**
 * WKB reader/writer — 2D (xy) ISO WKB, both byte orders read, little-endian
 * written. This is the engine's on-disk / in-plan geometry encoding, matching
 * the reference's primary encoding (WKB in an Arrow Binary column —
 * reference: geopolars-geo/src/util.rs:11-37, CoordDimensions::xy at util.rs:15).
 *
 * Geometry columns in Spark are `BinaryType` holding these bytes; they are
 * shuffle-, sort-, and parquet-safe, and equality on bytes is the intended
 * dedup/set-op semantics (same as the reference).
 */
object WKB {
  private final val PointT = 1
  private final val LineT = 2
  private final val PolyT = 3
  private final val MPointT = 4
  private final val MLineT = 5
  private final val MPolyT = 6
  private final val CollT = 7

  // ---------------------------------------------------------------- read

  /** Decode one WKB blob. Throws IllegalArgumentException on malformed input. */
  def read(bytes: Array[Byte]): Geometry = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf)
  }

  /** Decode, returning null on malformed input (expression layer maps to SQL NULL). */
  def readOrNull(bytes: Array[Byte]): Geometry =
    try read(bytes) catch { case _: Exception => null }

  /** A declared element count may not exceed what the remaining bytes could
    * possibly hold (`perElem` = minimum bytes per element) — otherwise a
    * corrupt blob's count (e.g. 2^31-1) would drive a giant allocation
    * BEFORE the buffer underflows, OOMing the executor instead of decoding
    * to SQL NULL. */
  @inline private def checkedCount(buf: ByteBuffer, perElem: Int): Int = {
    val n = buf.getInt()
    if (n < 0 || n.toLong * perElem > buf.remaining())
      throw new IllegalArgumentException(s"WKB count $n exceeds remaining ${buf.remaining()} bytes")
    n
  }

  // Nesting is depth-bounded: each nested header costs only ~9 bytes, so a
  // crafted blob of stacked GeometryCollection headers would otherwise drive
  // readGeom into StackOverflowError — an Error, which escapes readOrNull's
  // Exception catch and kills the task instead of yielding SQL NULL.
  private final val MaxDepth = 32

  private def readGeom(buf: ByteBuffer, depth: Int = 0): Geometry = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(s"WKB nesting deeper than $MaxDepth")
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = buf.getInt()
    // Accept EWKB flags (SRID bit 0x20000000) and ISO 1000-offsets (Z/M) by
    // reducing to the base 2D type; Z/M coordinates are not supported here.
    val hasSrid = (rawType & 0x20000000) != 0
    if (hasSrid) buf.getInt() // skip SRID
    val base = rawType & 0xFFFF
    val t = base % 1000
    // reject BOTH Z/M spellings: ISO 1000-offsets and the EWKB dimension
    // flags (0x80000000 Z, 0x40000000 M) — masking the flags away and
    // parsing 2D would interleave the extra ordinates into the coordinate
    // stream (silent corruption for lines/polygons). st_force2d is the
    // sanctioned path for salvaging such input.
    if (base >= 1000 || (rawType & 0xC0000000) != 0)
      throw new IllegalArgumentException(s"Z/M WKB not supported: type $rawType")
    t match {
      case PointT => Point(buf.getDouble(), buf.getDouble())
      case LineT  => LineString(readCoords(buf))
      case PolyT  => readPolygonBody(buf)
      case MPointT =>
        val n = checkedCount(buf, 21) // 1 + 4 + 16 bytes per point
        MultiPoint(Array.fill(n)(readGeom(buf, depth + 1).asInstanceOf[Point]))
      case MLineT =>
        val n = checkedCount(buf, 9) // header + count of an empty line
        MultiLineString(Array.fill(n)(readGeom(buf, depth + 1).asInstanceOf[LineString]))
      case MPolyT =>
        val n = checkedCount(buf, 9)
        MultiPolygon(Array.fill(n)(readGeom(buf, depth + 1).asInstanceOf[Polygon]))
      case CollT =>
        val n = checkedCount(buf, 9)
        GeometryCollection(Array.fill(n)(readGeom(buf, depth + 1)))
      case other => throw new IllegalArgumentException(s"unknown WKB type $other")
    }
  }

  private def readCoords(buf: ByteBuffer): Array[Double] = {
    val n = checkedCount(buf, 16) // two doubles per vertex
    val out = new Array[Double](n * 2)
    var i = 0
    while (i < out.length) { out(i) = buf.getDouble(); i += 1 }
    out
  }

  // ------------------------------------------------------------ force_2d

  /** [[readForce2D]] + 2D re-encode with SQL NULL-on-invalid semantics —
    * the st_force2d kernel. */
  def force2dOrNull(bytes: Array[Byte]): Array[Byte] =
    try {
      if (bytes == null || bytes.length < 5) null
      else write(readGeomF(ByteBuffer.wrap(bytes)))
    } catch { case _: Throwable => null }

  /** Parse WKB ACCEPTING Z/M ordinates — ISO 1000-offset types AND EWKB
    * dimension flags (0x80000000 Z, 0x40000000 M) — and DROP the extra
    * ordinates: the read_file force_2d path (reference io/file.py:55-58;
    * this engine's geometry model is strictly 2D, so Z/M input otherwise
    * evaluates to NULL). Plain 2D input parses exactly as [[read]]. */
  def readForce2D(bytes: Array[Byte]): Geometry = {
    require(bytes != null && bytes.length >= 5, "WKB too short")
    readGeomF(ByteBuffer.wrap(bytes))
  }

  private def readGeomF(buf: ByteBuffer, depth: Int = 0): Geometry = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(s"WKB nesting deeper than $MaxDepth")
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = buf.getInt()
    if ((rawType & 0x20000000) != 0) buf.getInt() // skip EWKB SRID
    val base = rawType & 0xFFFF
    val extra = (if ((rawType & 0x80000000) != 0) 1 else 0) +
      (if ((rawType & 0x40000000) != 0) 1 else 0) +
      (base / 1000 match { case 1 | 2 => 1; case 3 => 2; case _ => 0 })
    def coords(): Array[Double] = {
      val n = checkedCount(buf, 16 + 8 * extra)
      val out = new Array[Double](n * 2)
      var j = 0
      while (j < n) {
        out(2 * j) = buf.getDouble(); out(2 * j + 1) = buf.getDouble()
        var k = 0
        while (k < extra) { buf.getDouble(); k += 1 }
        j += 1
      }
      out
    }
    base % 1000 match {
      case PointT =>
        val p = Point(buf.getDouble(), buf.getDouble())
        var k = 0
        while (k < extra) { buf.getDouble(); k += 1 }
        p
      case LineT => LineString(coords())
      case PolyT =>
        val nRings = checkedCount(buf, 4)
        Polygon(Array.fill(nRings)(coords()))
      case MPointT =>
        val n = checkedCount(buf, 21)
        MultiPoint(Array.fill(n)(readGeomF(buf, depth + 1).asInstanceOf[Point]))
      case MLineT =>
        val n = checkedCount(buf, 9)
        MultiLineString(Array.fill(n)(readGeomF(buf, depth + 1).asInstanceOf[LineString]))
      case MPolyT =>
        val n = checkedCount(buf, 9)
        MultiPolygon(Array.fill(n)(readGeomF(buf, depth + 1).asInstanceOf[Polygon]))
      case CollT =>
        val n = checkedCount(buf, 9)
        GeometryCollection(Array.fill(n)(readGeomF(buf, depth + 1)))
      case other => throw new IllegalArgumentException(s"unknown WKB type $other")
    }
  }

  private def readPolygonBody(buf: ByteBuffer): Polygon = {
    val nRings = checkedCount(buf, 4) // ring count header per ring
    Polygon(Array.fill(nRings)(readCoords(buf)))
  }

  // ---------------------------------------------------------------- write

  def write(g: Geometry): Array[Byte] = {
    val buf = ByteBuffer.allocate(sizeOf(g)).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(buf, g)
    buf.array()
  }

  def sizeOf(g: Geometry): Int = g match {
    case _: Point         => 5 + 16
    case l: LineString    => 5 + 4 + l.coords.length * 8
    case p: Polygon       => 5 + 4 + p.rings.map(r => 4 + r.length * 8).sum
    case c: GeometryCollectionLike => 5 + 4 + c.geoms.map(sizeOf).sum
  }

  private def writeGeom(buf: ByteBuffer, g: Geometry): Unit = {
    buf.put(1.toByte) // little-endian
    g match {
      case p: Point =>
        buf.putInt(PointT)
        // Empty point: WKB convention is NaN coordinates.
        buf.putDouble(p.x); buf.putDouble(p.y)
      case l: LineString =>
        buf.putInt(LineT); putCoords(buf, l.coords)
      case p: Polygon =>
        buf.putInt(PolyT); buf.putInt(p.rings.length)
        p.rings.foreach(r => putCoords(buf, r))
      case m: MultiPoint =>
        buf.putInt(MPointT); buf.putInt(m.geoms.length); m.geoms.foreach(writeGeom(buf, _))
      case m: MultiLineString =>
        buf.putInt(MLineT); buf.putInt(m.geoms.length); m.geoms.foreach(writeGeom(buf, _))
      case m: MultiPolygon =>
        buf.putInt(MPolyT); buf.putInt(m.geoms.length); m.geoms.foreach(writeGeom(buf, _))
      case c: GeometryCollection =>
        buf.putInt(CollT); buf.putInt(c.geoms.length); c.geoms.foreach(writeGeom(buf, _))
    }
  }

  private def putCoords(buf: ByteBuffer, cs: Array[Double]): Unit = {
    buf.putInt(cs.length / 2)
    var i = 0
    while (i < cs.length) { buf.putDouble(cs(i)); i += 1 }
  }

  // ------------------------------------------------- cheap header peeks
  // These let expressions answer type/envelope questions without a full
  // decode — important in hot filter paths at scale.

  /** GEOS-style type id (0..7) straight from the WKB header; -2 if malformed. */
  def peekTypeId(bytes: Array[Byte]): Int = {
    if (bytes == null || bytes.length < 5) return -2
    val order = bytes(0)
    val raw =
      if (order == 0)
        ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) | ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
      else
        ((bytes(4) & 0xFF) << 24) | ((bytes(3) & 0xFF) << 16) | ((bytes(2) & 0xFF) << 8) | (bytes(1) & 0xFF)
    val t = (raw & 0xFFFF) % 1000
    wkbToGeosId(t)
  }

  /** WKB type code (1..7) → GEOS enum id (0..7, LINEARRING=2 unused). */
  private def wkbToGeosId(t: Int): Int = t match {
    case 1 => 0 // Point
    case 2 => 1 // LineString
    case 3 => 3 // Polygon
    case 4 => 4 // MultiPoint
    case 5 => 5 // MultiLineString
    case 6 => 6 // MultiPolygon
    case 7 => 7 // GeometryCollection
    case _ => -2
  }
}
