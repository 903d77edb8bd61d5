package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.geom.{Geometry => Geom, _}

/**
 * Geometry aggregates (SURVEY §2.5): the reference reserves geometry
 * aggregation in its docs but implements none (reference:
 * py-geopolars/docs/source/reference/geoseries.rst:104-112, commented out);
 * attribute aggregations are inherited from Polars. Here the geometry
 * aggregates are first-class Catalyst `TypedImperativeAggregate`s, so they
 * run as standard two-phase hash aggregation: per-partition partial buffers
 * (map-side combine), shuffle of the small serialized buffers only, final
 * merge — the shape that scales to 100 TB inputs because the full geometry
 * column never converges on one node unless the result itself does.
 *
 *  - st_envelope_agg: bbox union — buffer is 4 doubles regardless of input
 *    size; associative + commutative.
 *  - st_collect: gather into MultiPoint/MultiLineString/MultiPolygon or
 *    GeometryCollection (mixed). Parts are sorted canonically at eval so the
 *    result is deterministic under Spark's nondeterministic merge order.
 *  - st_union_agg: cascaded dissolve (graft.geom.Union). Partial buffers
 *    pre-dissolve per partition, so overlapping geometry collapses early and
 *    the shuffled state stays proportional to the dissolved boundary, not
 *    the input row count.
 */
object GeomAggregates {

  private def writeBlobList(gs: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(gs.length)
    gs.foreach { b => out.writeInt(b.length); out.write(b) }
    out.flush(); bos.toByteArray
  }

  private def readBlobList(bytes: Array[Byte]): mutable.ArrayBuffer[Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len)
      in.readFully(b); buf += b; i += 1
    }
    buf
  }

  /** Lexicographic byte order — canonical sort for deterministic output. */
  private val blobOrdering: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  def names: Seq[String] = Seq("st_envelope_agg", "st_collect", "st_union_agg", "st_makeline_agg")

  def builderFor(name: String): Seq[Expression] => Expression = name match {
    case "st_envelope_agg" => exprs => EnvelopeAgg(exprs.head)
    case "st_collect"      => exprs => CollectAgg(exprs.head)
    case "st_union_agg"    => exprs => UnionAgg(exprs.head)
    case "st_makeline_agg" => exprs => {
      require(exprs.length == 2, "st_makeline_agg expects (geometry, sortKey)")
      MakeLineAgg(exprs.head, exprs(1))
    }
  }

  private[functions] def combineParts(parts: Seq[Geom]): Geom = {
    val flat = parts.flatMap(Geom.parts(_)).filterNot(_.isEmpty)
    if (flat.isEmpty) GeometryCollection(Array.empty)
    else if (flat.forall(_.isInstanceOf[Point])) MultiPoint(flat.map(_.asInstanceOf[Point]).toArray)
    else if (flat.forall(_.isInstanceOf[LineString])) MultiLineString(flat.map(_.asInstanceOf[LineString]).toArray)
    else if (flat.forall(_.isInstanceOf[Polygon])) MultiPolygon(flat.map(_.asInstanceOf[Polygon]).toArray)
    else GeometryCollection(flat.toArray)
  }

  /** Shared frame for WKB-in/WKB-out typed aggregates. */
  abstract class WkbAgg[B] extends TypedImperativeAggregate[B] {
    def child: Expression
    override def children: Seq[Expression] = child :: Nil
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType || child.dataType == org.apache.spark.sql.types.NullType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects WKB BinaryType, got ${child.dataType}")
    protected def geomOf(input: InternalRow): Geom = {
      val v = child.eval(input)
      if (v == null) null else WKB.readOrNull(v.asInstanceOf[Array[Byte]])
    }
  }

  case class EnvelopeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends WkbAgg[Array[Double]] {
    override def prettyName: String = "st_envelope_agg"
    override def createAggregationBuffer(): Array[Double] =
      Array(Double.PositiveInfinity, Double.PositiveInfinity,
            Double.NegativeInfinity, Double.NegativeInfinity)
    override def update(b: Array[Double], input: InternalRow): Array[Double] = {
      val g = geomOf(input)
      if (g != null) {
        val e = g.envelope
        if (!e.isEmpty) {
          b(0) = math.min(b(0), e.minX); b(1) = math.min(b(1), e.minY)
          b(2) = math.max(b(2), e.maxX); b(3) = math.max(b(3), e.maxY)
        }
      }
      b
    }
    override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
      b(0) = math.min(b(0), o(0)); b(1) = math.min(b(1), o(1))
      b(2) = math.max(b(2), o(2)); b(3) = math.max(b(3), o(3))
      b
    }
    override def eval(b: Array[Double]): Any =
      if (b(0) > b(2)) null
      else WKB.write(Algos.envelopeGeom(Polygon(Array(Array(b(0), b(1), b(2), b(1), b(2), b(3), b(0), b(3), b(0), b(1))))))
    override def serialize(b: Array[Double]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(32)
      b.foreach(bb.putDouble); bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Double] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(4)(bb.getDouble)
    }
    override def withNewMutableAggBufferOffset(o: Int): EnvelopeAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): EnvelopeAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): EnvelopeAgg =
      copy(child = cs.head)
  }

  case class CollectAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends WkbAgg[mutable.ArrayBuffer[Array[Byte]]] {
    override def prettyName: String = "st_collect"
    override def createAggregationBuffer(): mutable.ArrayBuffer[Array[Byte]] = mutable.ArrayBuffer()
    override def update(b: mutable.ArrayBuffer[Array[Byte]], input: InternalRow): mutable.ArrayBuffer[Array[Byte]] = {
      val v = child.eval(input)
      if (v != null) b += v.asInstanceOf[Array[Byte]].clone()
      b
    }
    override def merge(b: mutable.ArrayBuffer[Array[Byte]], o: mutable.ArrayBuffer[Array[Byte]]): mutable.ArrayBuffer[Array[Byte]] = {
      b ++= o; b
    }
    override def eval(b: mutable.ArrayBuffer[Array[Byte]]): Any = {
      val geoms = b.sorted(blobOrdering).flatMap(bytes => Option(WKB.readOrNull(bytes)))
      if (geoms.isEmpty) null else WKB.write(combineParts(geoms.toSeq))
    }
    override def serialize(b: mutable.ArrayBuffer[Array[Byte]]): Array[Byte] = writeBlobList(b.toSeq)
    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Array[Byte]] = readBlobList(bytes)
    override def withNewMutableAggBufferOffset(o: Int): CollectAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CollectAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CollectAgg =
      copy(child = cs.head)
  }

  /**
   * Ordered path-building aggregate (PostGIS ST_MakeLine(geom ORDER BY k),
   * the trajectory constructor GPS/event pipelines need): point and line
   * inputs contribute their coordinates as a unit, units ordered by the
   * numeric sort key — so the result is deterministic under Spark's
   * nondeterministic partial-merge order (key ties break on coordinates).
   * Fewer than 2 total vertices => null. Buffer ships (key, coords) pairs,
   * merge is concatenation; sorting happens once at final eval.
   */
  case class MakeLineAgg(
      child: Expression,
      keyChild: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Array[Double])]] {
    override def children: Seq[Expression] = child :: keyChild :: Nil
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_makeline_agg"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType != BinaryType && child.dataType != org.apache.spark.sql.types.NullType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects WKB BinaryType geometry, got ${child.dataType}")
      else if (!keyChild.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a numeric sort key, got ${keyChild.dataType}")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Array[Double])] =
      mutable.ArrayBuffer()
    override def update(
        b: mutable.ArrayBuffer[(Double, Array[Double])],
        input: InternalRow): mutable.ArrayBuffer[(Double, Array[Double])] = {
      val gv = child.eval(input)
      val kv = keyChild.eval(input)
      if (gv != null && kv != null) {
        WKB.readOrNull(gv.asInstanceOf[Array[Byte]]) match {
          case p: Point if !p.isEmpty => b += ((kv.asInstanceOf[Number].doubleValue(), Array(p.x, p.y)))
          case l: LineString if !l.isEmpty => b += ((kv.asInstanceOf[Number].doubleValue(), l.coords))
          case _ =>
        }
      }
      b
    }
    override def merge(
        b: mutable.ArrayBuffer[(Double, Array[Double])],
        o: mutable.ArrayBuffer[(Double, Array[Double])]): mutable.ArrayBuffer[(Double, Array[Double])] = {
      b ++= o; b
    }
    @transient private lazy val entryOrdering: Ordering[(Double, Array[Double])] =
      new Ordering[(Double, Array[Double])] {
        def compare(a: (Double, Array[Double]), b: (Double, Array[Double])): Int = {
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) return c
          val n = math.min(a._2.length, b._2.length)
          var i = 0
          while (i < n) {
            val cc = java.lang.Double.compare(a._2(i), b._2(i))
            if (cc != 0) return cc
            i += 1
          }
          a._2.length - b._2.length
        }
      }
    override def eval(b: mutable.ArrayBuffer[(Double, Array[Double])]): Any = {
      if (b.isEmpty) return null
      val coords = b.sorted(entryOrdering).toArray.flatMap(_._2)
      if (coords.length < 4) null else WKB.write(LineString(coords))
    }
    override def serialize(b: mutable.ArrayBuffer[(Double, Array[Double])]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(b.length)
      b.foreach { case (k, cs) =>
        out.writeDouble(k); out.writeInt(cs.length)
        cs.foreach(out.writeDouble)
      }
      out.flush(); bos.toByteArray
    }
    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Array[Double])] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new mutable.ArrayBuffer[(Double, Array[Double])](n)
      var i = 0
      while (i < n) {
        val k = in.readDouble()
        val len = in.readInt()
        val cs = new Array[Double](len)
        var j = 0
        while (j < len) { cs(j) = in.readDouble(); j += 1 }
        buf += ((k, cs)); i += 1
      }
      buf
    }
    override def withNewMutableAggBufferOffset(o: Int): MakeLineAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MakeLineAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MakeLineAgg =
      copy(child = cs.head, keyChild = cs(1))
  }

  case class UnionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends WkbAgg[mutable.ArrayBuffer[Geom]] {
    // dissolve the buffer whenever it accumulates this many raw geometries —
    // keeps partial state bounded by the dissolved result, not the input
    private val dissolveEvery = 64
    override def prettyName: String = "st_union_agg"
    override def createAggregationBuffer(): mutable.ArrayBuffer[Geom] = mutable.ArrayBuffer()
    private def compact(b: mutable.ArrayBuffer[Geom]): mutable.ArrayBuffer[Geom] =
      if (b.length < dissolveEvery) b
      else {
        val u = Union.union(b.toSeq)
        b.clear(); b += u; b
      }
    override def update(b: mutable.ArrayBuffer[Geom], input: InternalRow): mutable.ArrayBuffer[Geom] = {
      val g = geomOf(input)
      if (g != null && !g.isEmpty) { b += g; compact(b) } else b
    }
    override def merge(b: mutable.ArrayBuffer[Geom], o: mutable.ArrayBuffer[Geom]): mutable.ArrayBuffer[Geom] = {
      b ++= o; compact(b)
    }
    override def eval(b: mutable.ArrayBuffer[Geom]): Any =
      if (b.isEmpty) null else WKB.write(Union.union(b.toSeq))
    override def serialize(b: mutable.ArrayBuffer[Geom]): Array[Byte] =
      writeBlobList(b.map(WKB.write).toSeq)
    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Geom] =
      readBlobList(bytes).flatMap(b => Option(WKB.readOrNull(b)))
    override def withNewMutableAggBufferOffset(o: Int): UnionAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): UnionAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): UnionAgg =
      copy(child = cs.head)
  }
}
