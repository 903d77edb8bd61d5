package graft.geom

import java.io.ByteArrayOutputStream

/**
 * TWKB ("Tiny WKB") codec — the compact varint geometry encoding PostGIS
 * ships as ST_AsTWKB / ST_GeomFromTWKB (public spec:
 * github.com/TWKB/Specification). Coordinates quantize to 10^precision,
 * then encode as zigzag-varint DELTAS from the previous vertex
 * (continuing across rings and parts), so small geometries shrink 5-10x
 * vs WKB — the wire format for shipping tiles or geometry columns where
 * bytes dominate (a 100 TB geometry table is mostly coordinate bytes).
 *
 * Writer emits the minimal layout (no bbox/size/idlist, empty bit for
 * empty geometries); reader additionally tolerates bbox and size headers
 * (skipped) so external TWKB with those flags still parses. Z/M
 * (extended-dims) input is rejected as null, matching the 2-D engine.
 *
 * Reference capability parity: GeoPolars exposes WKB/WKT only; TWKB is a
 * capability extension in the same codec family (geom/WKB.scala,
 * geom/WKT.scala — fuzz-hardened invalid-input => null discipline).
 */
object TWKB {

  // ------------------------------------------------------------ varints

  // shared with sources/MVT (same LEB128 wire primitive; GeoPackage's
  // SQLite varint is a DIFFERENT format and keeps its own)
  private[graft] def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[graft] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private[graft] def writeUvarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeSvarint(out: ByteArrayOutputStream, v: Long): Unit =
    writeUvarint(out, zigzag(v))

  private final class Reader(val bytes: Array[Byte]) {
    var pos = 0
    def uvarint(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do {
        if (pos >= bytes.length || shift > 63) throw new IllegalArgumentException("truncated varint")
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def svarint(): Long = unzigzag(uvarint())
  }

  // ------------------------------------------------------------- writer

  /** Encode to TWKB at 10^precision quantization (precision in [-7, 7]). */
  def write(g: Geometry, precision: Int = 5): Array[Byte] = {
    require(precision >= -7 && precision <= 7, s"precision in [-7,7], got $precision")
    val out = new ByteArrayOutputStream()
    val scale = math.pow(10.0, precision)
    val typeId = g match {
      case _: Point => 1
      case _: LineString => 2
      case _: Polygon => 3
      case _: MultiPoint => 4
      case _: MultiLineString => 5
      case _: MultiPolygon => 6
      case _: GeometryCollection => 7
    }
    out.write((zigzag(precision.toLong).toInt << 4) | typeId)
    if (g.isEmpty) { out.write(0x10); return out.toByteArray } // empty bit
    out.write(0x00) // metadata: no bbox, no size, no ids, no ext dims

    // delta state continues across the whole geometry (spec §4)
    var px = 0L; var py = 0L
    def coord(x: Double, y: Double): Unit = {
      val qx = Math.round(x * scale); val qy = Math.round(y * scale)
      writeSvarint(out, qx - px); writeSvarint(out, qy - py)
      px = qx; py = qy
    }
    def coords(cs: Array[Double], skipLast: Boolean): Unit = {
      val n = cs.length / 2 - (if (skipLast) 1 else 0)
      writeUvarint(out, n.toLong)
      var i = 0
      while (i < n) { coord(cs(2 * i), cs(2 * i + 1)); i += 1 }
    }
    def body(geom: Geometry): Unit = geom match {
      case Point(x, y) => coord(x, y)
      case LineString(cs) => coords(cs, skipLast = false)
      case Polygon(rings) =>
        writeUvarint(out, rings.length.toLong)
        // TWKB rings drop the closing (repeated) vertex
        rings.foreach(r => coords(r, skipLast = true))
      case MultiPoint(pts) =>
        writeUvarint(out, pts.length.toLong)
        pts.foreach(p => coord(p.x, p.y))
      case MultiLineString(ls) =>
        writeUvarint(out, ls.length.toLong)
        ls.foreach(l => coords(l.coords, skipLast = false))
      case MultiPolygon(ps) =>
        writeUvarint(out, ps.length.toLong)
        ps.foreach { p =>
          writeUvarint(out, p.rings.length.toLong)
          p.rings.foreach(r => coords(r, skipLast = true))
        }
      case _: GeometryCollection =>
        throw new IllegalStateException("collections handled by the outer match")
    }
    g match {
      case GeometryCollection(gs) =>
        writeUvarint(out, gs.length.toLong)
        gs.foreach { sub =>
          val b = write(sub, precision); out.write(b, 0, b.length)
        }
      case other => body(other)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- reader

  def readOrNull(bytes: Array[Byte]): Geometry =
    try { if (bytes == null || bytes.length < 2) null else read(new Reader(bytes)) }
    catch { case _: Exception => null }

  // Collection nesting is explicitly depth-bounded: each nested collection
  // header costs ~2 bytes, so an unbounded recursion would let a crafted
  // blob throw StackOverflowError — an Error, which escapes readOrNull's
  // Exception catch and fails the task instead of yielding SQL NULL.
  private val MaxDepth = 32

  private def read(in: Reader, depth: Int = 0): Geometry = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(s"TWKB collection nesting > $MaxDepth")
    val h = in.bytes(in.pos) & 0xff; in.pos += 1
    val typeId = h & 0x0f
    val precision = unzigzag((h >> 4).toLong).toInt
    val scale = math.pow(10.0, precision)
    val meta = in.bytes(in.pos) & 0xff; in.pos += 1
    val hasBbox = (meta & 0x01) != 0
    val hasSize = (meta & 0x02) != 0
    val hasIds = (meta & 0x04) != 0
    val hasExt = (meta & 0x08) != 0
    val isEmpty = (meta & 0x10) != 0
    if (hasExt) throw new IllegalArgumentException("Z/M TWKB unsupported")
    if (hasSize) in.uvarint() // remaining-size, not needed for sequential parse
    if (hasBbox) { var i = 0; while (i < 4) { in.svarint(); i += 1 } } // 2 dims x (min, delta)

    if (isEmpty) return typeId match {
      case 1 => Point(Double.NaN, Double.NaN)
      case 2 => LineString(Array.empty)
      case 3 => Polygon(Array.empty)
      case 4 => MultiPoint(Array.empty)
      case 5 => MultiLineString(Array.empty)
      case 6 => MultiPolygon(Array.empty)
      case 7 => GeometryCollection(Array.empty)
      case t => throw new IllegalArgumentException(s"bad TWKB type $t")
    }

    var px = 0L; var py = 0L
    def coord(): (Double, Double) = {
      px += in.svarint(); py += in.svarint()
      (px / scale, py / scale)
    }
    // every count is bounded by the remaining bytes (a vertex needs >= 2
    // bytes, a nested item >= 1) BEFORE any allocation — corrupt counts
    // must fail the cheap require, never reach Array.fill (an OOM would
    // escape readOrNull's Exception catch)
    def bounded(raw: Long, perItem: Int): Int = {
      // divide, don't multiply — raw is attacker-controlled up to 2^63
      require(raw >= 0 && raw <= (in.bytes.length - in.pos).toLong / perItem,
        s"implausible count $raw")
      raw.toInt
    }
    def line(close: Boolean): Array[Double] = {
      val n = bounded(in.uvarint(), 2)
      val cs = new Array[Double](2 * n + (if (close) 2 else 0))
      var i = 0
      while (i < n) { val (x, y) = coord(); cs(2 * i) = x; cs(2 * i + 1) = y; i += 1 }
      if (close && n > 0) { cs(2 * n) = cs(0); cs(2 * n + 1) = cs(1) }
      cs
    }
    def polyBody(): Polygon = {
      val nr = bounded(in.uvarint(), 1)
      Polygon(Array.fill(nr)(line(close = true)))
    }
    typeId match {
      case 1 => val (x, y) = coord(); Point(x, y)
      case 2 => LineString(line(close = false))
      case 3 => polyBody()
      case 4 =>
        val n = bounded(in.uvarint(), 1)
        if (hasIds) { var i = 0; while (i < n) { in.svarint(); i += 1 } }
        MultiPoint(Array.fill(n) { val (x, y) = coord(); Point(x, y) })
      case 5 =>
        val n = bounded(in.uvarint(), 1)
        if (hasIds) { var i = 0; while (i < n) { in.svarint(); i += 1 } }
        MultiLineString(Array.fill(n)(LineString(line(close = false))))
      case 6 =>
        val n = bounded(in.uvarint(), 1)
        if (hasIds) { var i = 0; while (i < n) { in.svarint(); i += 1 } }
        MultiPolygon(Array.fill(n)(polyBody()))
      case 7 =>
        val n = bounded(in.uvarint(), 1)
        if (hasIds) { var i = 0; while (i < n) { in.svarint(); i += 1 } }
        GeometryCollection(Array.fill(n)(read(in, depth + 1)))
      case t => throw new IllegalArgumentException(s"bad TWKB type $t")
    }
  }
}
