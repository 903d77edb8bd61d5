package graft.pipeline

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Embedding-vector kernels as codegen'd Catalyst expressions.
 *
 * The similarity operators originally used `aggregate(zip_with(...))`
 * higher-order functions for the dot product; HOFs evaluate their lambda
 * per element with interpreted LambdaVariables and allocate the zipped
 * array per row. These expressions compute dot/norms in one allocation-free
 * loop over the ArrayData and stay inside whole-stage codegen — the
 * difference is ~10-50x per row at 64 dims, which is what makes a 100 TB
 * brute-force scan viable.
 */
object VectorKernels {

  /** cosine(a, b) with zero-norm guard (0.0, matching Dedup semantics).
    * Accumulates dot/norms sequentially in doubles; float inputs widen per
    * element — identical arithmetic to the previous zip_with/aggregate
    * formulation, so oracle hashes are unchanged. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain dot product (same widening rules as cosine). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y
      i += 1
    }
    d
  }

  /** Random-hyperplane LSH bucket: bit p = sign of dot(vec, planes(p)). */
  def lshBucket(v: ArrayData, planes: Array[Array[Double]], vFloat: Boolean): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        d += (if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)) * plane(i)
        i += 1
      }
      if (d >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Argmax-cosine centroid index (ties -> lowest index). */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]], vFloat: Boolean): Int = {
    var best = 0
    var bestCos = -2.0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      while (i < n) {
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * cent(i); nv += x * x; nc += cent(i) * cent(i)
        i += 1
      }
      val cos = if (nv == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(nv) * math.sqrt(nc))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** Indices of the `n` nearest centroids by cosine, best first, ties by
    * smaller index — the multi-probe generalization of [[nearestCentroid]]
    * (identical per-cell cosine arithmetic; insertion keeps earlier equal
    * scores ahead, matching ORDER BY cos DESC, c). */
  def nearestCentroids(v: ArrayData, cents: Array[Array[Double]], n: Int,
                       vFloat: Boolean): ArrayData = {
    val nn = math.min(n, cents.length)
    val bestC = new Array[Int](nn)
    val bestS = Array.fill(nn)(-2.0)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(v.numElements(), cent.length)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      while (i < m) {
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * cent(i); nv += x * x; nc += cent(i) * cent(i)
        i += 1
      }
      val cos = if (nv == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(nv) * math.sqrt(nc))
      var p = 0
      while (p < filled && bestS(p) >= cos) p += 1
      if (p < nn) {
        var q = math.min(filled, nn - 1)
        while (q > p) { bestS(q) = bestS(q - 1); bestC(q) = bestC(q - 1); q -= 1 }
        bestS(p) = cos; bestC(p) = c
        if (filled < nn) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestC, filled).map(Int.box))
  }

  /** Dynamic-time-warping distance (classic O(n·m) DP, |a_i - b_j| local
    * cost, unit steps) over two fixed-length numeric series packed as
    * arrays. Rolling two-row buffer — no n×m allocation — so the
    * expression is safe per-row over millions of rows (profile-vs-reference
    * comparisons at corpus scale). Row-major accumulation order is the
    * canonical one (row 0 left-to-right, then each row i from j=0), which
    * the unrolled SQL oracle replays term-for-term — doubles stay
    * bit-equal across engines. An empty input on either side has no
    * alignment; we define the distance as 0.0 (documented degenerate
    * case — callers gate on non-empty profiles). */
  def dtw(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0.0
    def av(i: Int): Double = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
    def bv(j: Int): Double = if (bFloat) b.getFloat(j).toDouble else b.getDouble(j)
    var prev = new Array[Double](m)
    var cur = new Array[Double](m)
    // row 0: cumulative cost along b
    prev(0) = math.abs(av(0) - bv(0))
    var j = 1
    while (j < m) { prev(j) = prev(j - 1) + math.abs(av(0) - bv(j)); j += 1 }
    var i = 1
    while (i < n) {
      val ai = av(i)
      cur(0) = prev(0) + math.abs(ai - bv(0))
      j = 1
      while (j < m) {
        val c = math.abs(ai - bv(j))
        val best = math.min(math.min(prev(j), prev(j - 1)), cur(j - 1))
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - 1)
  }

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkVec(name: String, dt: DataType): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name expects array<float|double>, got $other")
    }
}

/** cosine_sim(a, b) -> double. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = VectorKernels.checkVec(prettyName, left.dataType)
    if (l.isFailure) l else VectorKernels.checkVec(prettyName, right.dataType)
  }
  private def aF = VectorKernels.isFloatArray(left.dataType)
  private def bF = VectorKernels.isFloatArray(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.VectorKernels.cosine($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(l, r)
}

/** dtw_distance(a, b) -> double: dynamic-time-warping alignment cost
  * between two numeric series (arrays), |x-y| local cost, unit steps.
  * Codegen'd via the rolling-buffer kernel — one call per row keeps DTW
  * usable as a distributed per-row comparator (every entity's profile vs
  * a broadcast reference series) instead of a driver loop. */
case class DtwDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dtw_distance"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = VectorKernels.checkVec(prettyName, left.dataType)
    if (l.isFailure) l else VectorKernels.checkVec(prettyName, right.dataType)
  }
  private def aF = VectorKernels.isFloatArray(left.dataType)
  private def bF = VectorKernels.isFloatArray(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dtw(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.VectorKernels.dtw($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DtwDistance =
    copy(l, r)
}

/** vec_dot(a, b) -> double. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = VectorKernels.checkVec(prettyName, left.dataType)
    if (l.isFailure) l else VectorKernels.checkVec(prettyName, right.dataType)
  }
  private def aF = VectorKernels.isFloatArray(left.dataType)
  private def bF = VectorKernels.isFloatArray(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.VectorKernels.dot($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
}

/** nearest_centroid(vec) -> int: IVF coarse-quantizer cell id; the centroid
  * matrix is baked into the expression (plan-shipped constant). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorKernels.checkVec(prettyName, child.dataType)
  private def vF = VectorKernels.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData], centroids, vF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.pipeline.VectorKernels.nearestCentroid($v, $cRef, $vF);")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
}

/** Top-`n` nearest centroid indices (cosine, best first, smaller index on
  * ties) — the multi-probe cell assignment for IVF joins; same baked-in
  * centroid constant discipline as [[NearestCentroid]]. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorKernels.checkVec(prettyName, child.dataType)
  private def vF = VectorKernels.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroids(v.asInstanceOf[ArrayData], centroids, n, vF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.pipeline.VectorKernels.nearestCentroids($v, $cRef, $n, $vF);")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroids = copy(child = c)
}

/** Hyperplane-LSH bucket of a vector column; the plane matrix is baked into
  * the expression (driver-side constant, shipped with the serialized plan —
  * the codegen references it as a global, no per-row cost). */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorKernels.checkVec(prettyName, child.dataType)
  private def vF = VectorKernels.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.lshBucket(v.asInstanceOf[ArrayData], planes, vF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.pipeline.VectorKernels.lshBucket($v, $pRef, $vF);")
  }
  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
}
