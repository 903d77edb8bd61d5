package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal FlatBuffers codec (public wire format: google/flatbuffers
 * internals docs) — just enough of the format for FlatGeobuf's Header /
 * Feature / Geometry tables, with no code-gen dependency.
 *
 * Wire format recap (all little-endian):
 *  - root: uint32 offset from buffer start to the root table
 *  - table: int32 soffset at table start; vtable_pos = table_pos - soffset
 *  - vtable: uint16 vtable_size, uint16 table_size, then uint16 field
 *    offsets (relative to table start; 0 = field absent), one per field id
 *  - indirect fields (string/vector/table): uint32 offset relative to the
 *    field position
 *  - string: uint32 length + bytes (+ NUL); vector: uint32 length + elems
 *
 * The builder grows back-to-front like the reference builders (children at
 * higher addresses, parents before them), so all indirect offsets are
 * positive; scalars are size-aligned.
 */
object FlatBuf {

  // ------------------------------------------------------------- reading

  final class Reader(val bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    def rootTable: Int = bb.getInt(0)

    /** Absolute position of field `id` within table at `tablePos`, or -1. */
    def fieldPos(tablePos: Int, id: Int): Int = {
      val vtPos = tablePos - bb.getInt(tablePos)
      val vtSize = bb.getShort(vtPos) & 0xffff
      val slot = 4 + 2 * id
      if (slot >= vtSize) return -1
      val off = bb.getShort(vtPos + slot) & 0xffff
      if (off == 0) -1 else tablePos + off
    }

    def getByte(tablePos: Int, id: Int, dflt: Int): Int = {
      val p = fieldPos(tablePos, id); if (p < 0) dflt else bb.get(p) & 0xff
    }
    def getBool(tablePos: Int, id: Int, dflt: Boolean): Boolean = {
      val p = fieldPos(tablePos, id); if (p < 0) dflt else bb.get(p) != 0
    }
    def getShort(tablePos: Int, id: Int, dflt: Int): Int = {
      val p = fieldPos(tablePos, id); if (p < 0) dflt else bb.getShort(p) & 0xffff
    }
    def getInt(tablePos: Int, id: Int, dflt: Int): Int = {
      val p = fieldPos(tablePos, id); if (p < 0) dflt else bb.getInt(p)
    }
    def getLong(tablePos: Int, id: Int, dflt: Long): Long = {
      val p = fieldPos(tablePos, id); if (p < 0) dflt else bb.getLong(p)
    }

    /** Absolute position of the referenced object (string/vector/table). */
    def indirect(tablePos: Int, id: Int): Int = {
      val p = fieldPos(tablePos, id)
      if (p < 0) -1 else p + bb.getInt(p)
    }

    def getString(tablePos: Int, id: Int): String = {
      val t = indirect(tablePos, id)
      if (t < 0) null
      else {
        val len = bb.getInt(t)
        new String(bytes, t + 4, len, "UTF-8")
      }
    }

    def vectorLen(vecPos: Int): Int = bb.getInt(vecPos)
    def vectorElems(vecPos: Int): Int = vecPos + 4

    def getDoubleVector(tablePos: Int, id: Int): Array[Double] = {
      val v = indirect(tablePos, id)
      if (v < 0) return null
      val n = vectorLen(v)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = bb.getDouble(v + 4 + 8 * i); i += 1 }
      out
    }

    def getIntVector(tablePos: Int, id: Int): Array[Int] = {
      val v = indirect(tablePos, id)
      if (v < 0) return null
      val n = vectorLen(v)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = bb.getInt(v + 4 + 4 * i); i += 1 }
      out
    }

    def getByteVector(tablePos: Int, id: Int): Array[Byte] = {
      val v = indirect(tablePos, id)
      if (v < 0) return null
      val n = vectorLen(v)
      val out = new Array[Byte](n)
      System.arraycopy(bytes, v + 4, out, 0, n)
      out
    }

    /** Absolute table positions for a vector-of-tables field. */
    def getTableVector(tablePos: Int, id: Int): Array[Int] = {
      val v = indirect(tablePos, id)
      if (v < 0) return null
      val n = vectorLen(v)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val ep = v + 4 + 4 * i
        out(i) = ep + bb.getInt(ep)
        i += 1
      }
      out
    }
  }

  // ------------------------------------------------------------- building

  /** Field staged for a table under construction. */
  sealed trait Field { def id: Int }
  final case class ScalarField(id: Int, width: Int, value: Long) extends Field
  final case class DoubleField(id: Int, value: Double) extends Field
  final case class RefField(id: Int, offset: Int) extends Field

  final class Builder {
    private var buf = new Array[Byte](1024)
    private var used = 0 // bytes occupied at the END of buf

    private def ensure(n: Int): Unit =
      if (used + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, used + n))
        System.arraycopy(buf, buf.length - used, nb, nb.length - used, used)
        buf = nb
      }

    private def push(b: Byte): Unit = { ensure(1); used += 1; buf(buf.length - used) = b }

    /** Little-endian prepend: push high byte first so the low byte lands at
      * the lowest address. */
    private def pushN(v: Long, width: Int): Unit = {
      ensure(width)
      var i = width - 1
      while (i >= 0) { push(((v >>> (8 * i)) & 0xff).toByte); i -= 1 }
    }

    /** Zero-pad so the NEXT `additional` bytes end size-aligned. */
    private def pad(align: Int, additional: Int): Unit = {
      val misalign = (used + additional) % align
      if (misalign != 0) {
        var i = 0
        val n = align - misalign
        while (i < n) { push(0); i += 1 }
      }
    }

    /** Offset-from-end handle of the most recently completed object. */
    private def handle: Int = used

    private def refValue(fieldEndOffset: Int, target: Int): Int = fieldEndOffset - target

    // NOTE: padding must ALWAYS be pushed before an object's contents (it
    // then sits after the object in memory) — zeros between a length prefix
    // and its payload would shift the payload the reader expects at +4.

    def createString(s: String): Int = {
      val b = s.getBytes("UTF-8")
      pad(4, 4 + b.length + 1)
      push(0) // NUL terminator
      var i = b.length - 1
      while (i >= 0) { push(b(i)); i -= 1 }
      pushN(b.length.toLong, 4)
      handle
    }

    def createDoubleVector(xs: Array[Double]): Int = {
      pad(8, 4 + 8 * xs.length)
      var i = xs.length - 1
      while (i >= 0) { pushN(java.lang.Double.doubleToLongBits(xs(i)), 8); i -= 1 }
      pushN(xs.length.toLong, 4)
      handle
    }

    def createIntVector(xs: Array[Int]): Int = {
      pad(4, 4 + 4 * xs.length)
      var i = xs.length - 1
      while (i >= 0) { pushN(xs(i).toLong & 0xffffffffL, 4); i -= 1 }
      pushN(xs.length.toLong, 4)
      handle
    }

    def createByteVector(xs: Array[Byte]): Int = {
      pad(4, 4 + xs.length)
      var i = xs.length - 1
      while (i >= 0) { push(xs(i)); i -= 1 }
      pushN(xs.length.toLong, 4)
      handle
    }

    /** Vector whose elements reference previously built objects. */
    def createRefVector(offsets: Array[Int]): Int = {
      pad(4, 4 + 4 * offsets.length)
      var i = offsets.length - 1
      while (i >= 0) {
        // element position after this push = used + 4
        pushN(refValue(used + 4, offsets(i)).toLong, 4)
        i -= 1
      }
      pushN(offsets.length.toLong, 4)
      handle
    }

    /**
     * Write a table from staged fields (any order; absent = default).
     * Returns the table handle.
     */
    def createTable(fields: Seq[Field]): Int = {
      val maxId = if (fields.isEmpty) -1 else fields.map(_.id).max
      val slots = new Array[Int](maxId + 1) // table-relative field offsets
      val start = used // everything pushed from here belongs to the table
      // push fields in reverse id order so low ids sit near the table head
      fields.sortBy(-_.id).foreach {
        case ScalarField(id, w, v) =>
          pad(w, w); pushN(v, w); slots(id) = used
        case DoubleField(id, v) =>
          pad(8, 8); pushN(java.lang.Double.doubleToLongBits(v), 8); slots(id) = used
        case RefField(id, target) =>
          pad(4, 4); pushN(refValue(used + 4, target).toLong, 4); slots(id) = used
      }
      pad(4, 4)
      pushN(0L, 4) // soffset placeholder (patched below)
      val tableStart = used
      val tableSize = tableStart - start
      // vtable
      val vtSize = 4 + 2 * (maxId + 1)
      var id = maxId
      while (id >= 0) {
        val rel = if (slots(id) == 0) 0 else tableStart - slots(id)
        pushN(rel.toLong, 2)
        id -= 1
      }
      pushN(tableSize.toLong, 2)
      pushN(vtSize.toLong, 2)
      val vtStart = used
      // patch soffset = table_pos - vtable_pos = vtStart - tableStart (> 0)
      val so = vtStart - tableStart
      val pos = buf.length - tableStart
      buf(pos) = (so & 0xff).toByte
      buf(pos + 1) = ((so >> 8) & 0xff).toByte
      buf(pos + 2) = ((so >> 16) & 0xff).toByte
      buf(pos + 3) = ((so >> 24) & 0xff).toByte
      tableStart
    }

    /** Finish with `root` as the root table; returns the final buffer. */
    def finish(root: Int): Array[Byte] = {
      pad(4, 4)
      pushN(refValue(used + 4, root).toLong, 4)
      val out = new Array[Byte](used)
      System.arraycopy(buf, buf.length - used, out, 0, used)
      out
    }
  }
}
