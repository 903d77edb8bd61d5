package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen kernels over the GeoArrow nested-native encodings
 * (array<struct<x,y>> chains from st_coorddump, array<array<struct<x,y>>>
 * rings from st_ringdump) — the fix for the measured HOF weakness
 * (tools/EncodingBench: Spark's higher-order functions are CodegenFallback,
 * so aggregate/transform vertex loops ran ~10x slower than the WKB
 * doGenCode kernels). These expressions read ArrayData directly inside
 * whole-stage codegen: no WKB decode AND no interpreted lambda machinery.
 *
 * Numeric contract: identical term order to geom.Algos / GeoArrow's HOF
 * forms (sequential folds), so encoding-switched queries stay hash-exact.
 */
object NestedKernels {

  /** Chain length of an array<struct<x,y>> vertex sequence. */
  def chainLength(chain: ArrayData): Double = {
    val n = chain.numElements()
    if (n < 2) return 0.0
    var s = 0.0
    var prev = chain.getStruct(0, 2)
    var px = prev.getDouble(0); var py = prev.getDouble(1)
    var i = 1
    while (i < n) {
      val cur = chain.getStruct(i, 2)
      val cx = cur.getDouble(0); val cy = cur.getDouble(1)
      val dx = cx - px; val dy = cy - py
      s += math.sqrt(dx * dx + dy * dy)
      px = cx; py = cy
      i += 1
    }
    s + 0.0
  }

  /** Signed shoelace area of one closed ring (array<struct<x,y>>). */
  def ringSignedArea(ring: ArrayData): Double = {
    val n = ring.numElements()
    if (n < 4) return 0.0
    var s = 0.0
    var prev = ring.getStruct(0, 2)
    var px = prev.getDouble(0); var py = prev.getDouble(1)
    var i = 1
    while (i < n) {
      val cur = ring.getStruct(i, 2)
      val cx = cur.getDouble(0); val cy = cur.getDouble(1)
      s += px * cy - cx * py
      px = cx; py = cy
      i += 1
    }
    (s + 0.0) / 2.0
  }

  /** Area from a ringdump: |exterior| minus hole areas. Assumes the
    * single-polygon ring contract of st_ringdump (ring 0 exterior, rest
    * holes) — st_ringdump enforces it by dumping MultiPolygon to null. */
  def ringsArea(rings: ArrayData): Double = {
    val n = rings.numElements()
    if (n == 0) return 0.0
    var a = math.abs(ringSignedArea(rings.getArray(0)))
    var i = 1
    while (i < n) { a -= math.abs(ringSignedArea(rings.getArray(i))); i += 1 }
    a
  }

  /** Perimeter over all rings of a ringdump. */
  def ringsPerimeter(rings: ArrayData): Double = {
    val n = rings.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += chainLength(rings.getArray(i)); i += 1 }
    s
  }

  /** Total length over an array of chains — the MultiLineString level
    * (List<List<Struct>> with chain semantics instead of ring semantics). */
  def chainsLength(chains: ArrayData): Double = {
    val n = chains.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += chainLength(chains.getArray(i)); i += 1 }
    s
  }

  /** Area over the GeoArrow MultiPolygon level List<List<List<Struct>>>:
    * each part is a ringdump (exterior first), parts sum. Keeping the
    * part boundary explicit is exactly why this fourth list level exists —
    * a flattened ringdump would subtract other parts' exteriors as holes. */
  def partsArea(parts: ArrayData): Double = {
    val n = parts.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += ringsArea(parts.getArray(i)); i += 1 }
    s
  }

  /** Perimeter over all parts of a MultiPolygon dump. */
  def partsPerimeter(parts: ArrayData): Double = {
    val n = parts.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += ringsPerimeter(parts.getArray(i)); i += 1 }
    s
  }

  val xyStruct: DataType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  val chainType: DataType = ArrayType(xyStruct, containsNull = false)
  val ringsType: DataType = ArrayType(ArrayType(xyStruct, containsNull = false),
    containsNull = false)
  val partsType: DataType = ArrayType(
    ArrayType(ArrayType(xyStruct, containsNull = false), containsNull = false),
    containsNull = false)

  /** name -> (expected input type, kernel). */
  val kernels: Map[String, (DataType, ArrayData => Double)] = Map(
    "st_chain_length" -> ((chainType, chainLength _)),
    "st_ring_signed_area" -> ((chainType, ringSignedArea _)),
    "st_rings_area" -> ((ringsType, ringsArea _)),
    "st_rings_perimeter" -> ((ringsType, ringsPerimeter _)),
    "st_chains_length" -> ((ringsType, chainsLength _)),
    "st_parts_area" -> ((partsType, partsArea _)),
    "st_parts_perimeter" -> ((partsType, partsPerimeter _))
  )
  def names: Seq[String] = kernels.keys.toSeq
}

/** Double-valued kernel over a nested-encoding column; stays inside
  * whole-stage codegen via a direct static-call doGenCode. */
case class NestedGeomExpr(name: String, child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = name

  private def compatible(dt: DataType, want: DataType): Boolean = (dt, want) match {
    case (ArrayType(e1, _), ArrayType(e2, _)) => compatible(e1, e2)
    case (s1: StructType, s2: StructType) =>
      s1.length == s2.length && s1.fields.zip(s2.fields).forall {
        case (a, b) => a.dataType == b.dataType
      }
    case (a, b) => a == b
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val want = NestedKernels.kernels(name)._1
    if (child.dataType == NullType || compatible(child.dataType, want))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects $want, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NestedKernels.kernels(name)._2(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val fn = name match {
      case "st_chain_length" => "chainLength"
      case "st_ring_signed_area" => "ringSignedArea"
      case "st_rings_area" => "ringsArea"
      case "st_rings_perimeter" => "ringsPerimeter"
      case "st_chains_length" => "chainsLength"
      case "st_parts_area" => "partsArea"
      case "st_parts_perimeter" => "partsPerimeter"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NestedKernels.$fn($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NestedGeomExpr =
    copy(child = newChild)
}
