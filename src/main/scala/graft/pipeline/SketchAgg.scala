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
