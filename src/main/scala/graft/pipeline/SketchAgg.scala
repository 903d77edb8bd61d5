package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `hll_distinct(key)` — the Sketch.hllDistinct estimate as a SQL
 * aggregate function (TypedImperativeAggregate): two-phase hash
 * aggregation with a fixed 256-byte buffer per group (max rank per
 * bucket), map-side combined, merged by bytewise max. Same deterministic
 * md5 layout as Sketch.hllDistinct / hllSql (p=8, chunk = next 60 bits),
 * so the SQL-surface estimate is bit-identical to the DataFrame op and
 * the DuckDB oracle.
 */
case class HllDistinctAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val M = 256
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  override def prettyName: String = "hll_distinct"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string key (cast at the call site), got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md5.get().digest(v.asInstanceOf[UTF8String].getBytes)
      val bucket = d(0) & 0xff
      // hex digits 3..17 = low nibble of byte1? No: digits 2..16 (0-based)
      // = bytes 1..7 in full plus the HIGH nibble of byte 8 — 60 bits,
      // exactly substr(hex, 3, 15) in the SQL layout
      var chunk = 0L
      var i = 1
      while (i <= 7) { chunk = (chunk << 8) | (d(i) & 0xffL); i += 1 }
      chunk = (chunk << 4) | ((d(8) & 0xf0L) >> 4)
      val rank =
        if (chunk == 0L) 61
        else java.lang.Long.numberOfLeadingZeros(chunk) - 3
      if (rank > (b(bucket) & 0xff)) b(bucket) = rank.toByte
    }
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if ((o(i) & 0xff) > (b(i) & 0xff)) b(i) = o(i)
      i += 1
    }
    b
  }

  override def eval(b: Array[Byte]): Any = {
    var hsum = 0.0
    var used = 0
    var i = 0
    while (i < M) {
      val r = b(i) & 0xff
      if (r > 0) { hsum += math.pow(2.0, -r); used += 1 }
      i += 1
    }
    val raw = Alpha * M * M / (hsum + (M - used))
    val est =
      if (raw <= 2.5 * M && used < M) M.toDouble * math.log(M.toDouble / (M - used))
      else raw
    // HALF_UP to match Spark's round() (and DuckDB's round) exactly —
    // math.rint would round half-to-even and diverge on .5 boundaries
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
  }

  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllDistinctAgg =
    copy(child = cs.head)
}

object HllDistinctAgg {
  /** Builder used by the registry: casts any key type to string first,
    * matching Sketch.hllDistinct's `key.cast("string")`. */
  def builder(exprs: Seq[Expression]): Expression =
    HllDistinctAgg(Cast(exprs.head, StringType)).toAggregateExpression()
}

/**
 * `kmv_sketch(key, k)` — bottom-k (KMV / theta family, the Apache
 * DataSketches theta analogue) distinct-value sketch as a SQL aggregate:
 * the k SMALLEST distinct md5-derived 60-bit hashes of the keys,
 * returned as a sorted array<bigint>. Unlike HLL the sketch supports SET
 * OPERATIONS downstream as plain array expressions (union = k smallest
 * of the concatenation; intersection = theta retention below
 * min(theta_a, theta_b)), and the whole pipeline — hash, sketch, and
 * estimators — is DETERMINISTIC and order-independent, so a DuckDB
 * oracle replays it exactly (`('0x'||substr(md5(x),1,15))::BIGINT` =
 * Spark's `conv(substring(md5(x),1,15),16,10)`).
 *
 * State: a TreeSet of <= k longs (bounded, mergeable, map-side
 * combined); serialized as 8k bytes. Estimator (applied at the call
 * site as arithmetic, not here): distinct ~= (k-1) * 2^60 / h_k when
 * the sketch is full, exact |sketch| otherwise. Standard error
 * ~ 1/sqrt(k-2) (~6% at k=256).
 */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def prettyName: String = "kmv_sketch"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && k >= 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string key, k >= 2), got (${child.dataType}, $k)")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5 as a positive 60-bit long — the same
    * derivation as conv(substring(md5(x),1,15),16,10). */
  private def hash60(s: UTF8String): Long = {
    val d = md5.get().digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  private def add(b: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (b.size < k) { b.add(h); () }
    else if (h < b.last()) {
      if (b.add(h)) { b.remove(b.last()); () }
    }
  }

  override def update(b: java.util.TreeSet[java.lang.Long], input: InternalRow):
      java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(b, hash60(v.asInstanceOf[UTF8String]))
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long], o: java.util.TreeSet[java.lang.Long]):
      java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) add(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 * b.size)
    val it = b.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val s = new java.util.TreeSet[java.lang.Long]()
    val in = java.nio.ByteBuffer.wrap(bytes)
    while (in.remaining() >= 8) s.add(in.getLong)
    s
  }
  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = cs.head)
}

object KmvSketchAgg {
  /** Registry builder: kmv_sketch(key, k) — key cast to string, k a
    * foldable int literal. */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "kmv_sketch(key, k)")
    val k = exprs(1) match {
      case e if e.foldable => e.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
      }
      case _ => throw new IllegalArgumentException("k must be a literal")
    }
    KmvSketchAgg(Cast(exprs.head, StringType), k).toAggregateExpression()
  }
}
