package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * String-similarity kernels for record linkage and fuzzy dedup.
 *
 * All metrics operate on UTF-8 BYTES (not codepoints) so results are
 * bit-identical to SQL engines whose string distances are byte-based
 * (queries that need codepoint semantics should sanitize to ASCII first,
 * where the two coincide). Reference surface: the host-inherited string
 * namespace of the reference frame (SURVEY §2.7) — these are the
 * engine-side additions a linkage/dedup pipeline needs beyond Spark's
 * built-in levenshtein.
 *
 * - damerauLevenshtein: UNRESTRICTED Damerau-Levenshtein (adjacent
 *   transposition as one edit, transposed chars may be edited further —
 *   dl("ca","abc") == 2, where the restricted OSA variant gives 3).
 * - hamming: differing-byte count; defined only for equal lengths (null
 *   otherwise at the expression layer).
 * - charJaccard: |bytes(a) ∩ bytes(b)| / |bytes(a) ∪ bytes(b)| over
 *   DISTINCT bytes; a single int/int division, so the double is exactly
 *   rounded and engine-independent.
 * - jaroWinkler: Jaro similarity (match window floor(max/2)-1,
 *   transpositions as the TRUNCATED half of the mismatched
 *   matched-position count — the DuckDB/rapidfuzz convention) with
 *   the standard Winkler prefix boost (p=0.1, prefix<=4) applied only
 *   when jaro > 0.7; empty strings yield 0.0 (either side).
 */
object StringSimEval {

  def damerau(a: UTF8String, b: UTF8String): Int = {
    val s = a.getBytes; val t = b.getBytes
    val n = s.length; val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2); da maps byte -> last row index seen in s
    val d = Array.ofDim[Int](n + 2, m + 2)
    val da = new Array[Int](256)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da(t(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        d(i + 1)(j + 1) = best
        j += 1
      }
      da(s(i - 1) & 0xff) = i
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Differing-byte count; -1 signals unequal lengths (expression maps to null). */
  def hamming(a: UTF8String, b: UTF8String): Int = {
    val s = a.getBytes; val t = b.getBytes
    if (s.length != t.length) return -1
    var c = 0; var i = 0
    while (i < s.length) { if (s(i) != t(i)) c += 1; i += 1 }
    c
  }

  def charJaccard(a: UTF8String, b: UTF8String): Double = {
    val ina = new Array[Boolean](256); val inb = new Array[Boolean](256)
    val s = a.getBytes; val t = b.getBytes
    var i = 0
    while (i < s.length) { ina(s(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < t.length) { inb(t(i) & 0xff) = true; i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 256) {
      if (ina(i) && inb(i)) inter += 1
      if (ina(i) || inb(i)) union += 1
      i += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes; val t = b.getBytes
    val n = s.length; val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sm = new Array[Boolean](n); val tm = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s(i) == t(j)) { sm(i) = true; tm(j) = true; matches += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0; var mismatched = 0
    i = 0
    while (i < n) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s(i) != t(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // transpositions truncate to an integer (mismatched-pair count),
    // matching DuckDB/rapidfuzz — NOT the fractional mismatched/2.0 some
    // references use (differs when the mismatch count is odd)
    val trans = (mismatched / 2).toDouble
    (mm / n + mm / m + (mm - trans) / mm) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s = a.getBytes; val t = b.getBytes
    val max = math.min(4, math.min(s.length, t.length))
    var l = 0
    while (l < max && s(l) == t(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** LCS length between two string arrays: classic DP with a rolling
    * one-row int buffer (O(min-side) memory). Null elements never match
    * anything (SQL null semantics). Empty either side -> 0. */
  def lcsLen(a: org.apache.spark.sql.catalyst.util.ArrayData,
             b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val as = new Array[UTF8String](n)
    var i = 0
    while (i < n) { as(i) = if (a.isNullAt(i)) null else a.getUTF8String(i); i += 1 }
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    val row = new Array[Int](m + 1)
    i = 1
    while (i <= n) {
      var diag = 0 // L[i-1][j-1]
      j = 1
      while (j <= m) {
        val up = row(j) // L[i-1][j]
        row(j) =
          if (as(i - 1) != null && as(i - 1).equals(bs(j - 1))) diag + 1
          else math.max(up, row(j - 1))
        diag = up
        j += 1
      }
      i += 1
    }
    row(m)
  }

  /** Needleman-Wunsch global alignment score (match +1, mismatch -1,
    * gap -1), rolling one-row DP like lcsLen. Null elements never match. */
  def nwScore(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0) return -m
    if (m == 0) return -n
    val as = new Array[UTF8String](n)
    var i = 0
    while (i < n) { as(i) = if (a.isNullAt(i)) null else a.getUTF8String(i); i += 1 }
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    val row = new Array[Int](m + 1)
    j = 0
    while (j <= m) { row(j) = -j; j += 1 }
    i = 1
    while (i <= n) {
      var diag = row(0) // D[i-1][0]
      row(0) = -i
      j = 1
      while (j <= m) {
        val up = row(j) // D[i-1][j]
        val sub =
          if (as(i - 1) != null && as(i - 1).equals(bs(j - 1))) diag + 1
          else diag - 1
        row(j) = math.max(sub, math.max(up - 1, row(j - 1) - 1))
        diag = up
        j += 1
      }
      i += 1
    }
    row(m)
  }
}

/** lcs_length(a, b) -> int: longest-common-subsequence length between two
  * string arrays (classic DP, rolling one-row buffer — no n×m matrix), a
  * per-row sequence comparator for event/type sequences at corpus scale.
  * Row-major accumulation replayed exactly by the unrolled SQL oracle. */
case class LcsLength(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_length"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lcs_length expects (array<string>, array<string>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimEval.lcsLen(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.StringSimEval.lcsLen($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LcsLength =
    copy(l, r)
}

/** nw_score(a, b) -> int: Needleman-Wunsch global alignment score between
  * two string arrays (match +1, mismatch -1, gap -1) — the gap-penalized
  * sibling of lcs_length, same rolling-row DP, same codegen shape. */
case class NwScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nw_score"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nw_score expects (array<string>, array<string>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimEval.nwScore(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.StringSimEval.nwScore($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NwScore =
    copy(l, r)
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimEval.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.StringSimEval.damerau($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(l, r)
}

/** hamming_dist(a, b) -> int; null when the byte lengths differ. */
case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_dist"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val h = StringSimEval.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (h < 0) null else h
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.pipeline.StringSimEval.hamming($a, $b);
         |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = -1; }""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
    copy(l, r)
}

case class CharJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimEval.charJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.StringSimEval.charJaccard($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharJaccard =
    copy(l, r)
}

case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimEval.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.StringSimEval.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(l, r)
}
