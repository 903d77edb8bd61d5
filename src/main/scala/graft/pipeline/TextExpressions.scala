package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Training-data-pipeline text kernels as Catalyst expressions.
 *
 * These are the capability extension mandated by BASELINE.json (LLM-pipeline
 * operators at 100 TB scale) — no counterpart in the reference, which is a
 * geospatial library; they reuse the same Expression pattern as the st_*
 * family so they are codegen-adjacent (CodegenFallback today), null-safe,
 * SQL-visible, and streaming-safe.
 */
object TextKernels {

  /** xxhash-style 64-bit avalanche over a string with a seed (stable across JVMs). */
  @inline def hash64(s: String, seed: Long): Long = {
    // FNV-1a 64 core + murmur finalizer: deterministic, allocation-free.
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def whitespaceTokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.split("\\s+").filter(_.nonEmpty)

  /** Word n-gram shingles ("w1 w2 ... wn"). */
  def wordShingles(text: String, n: Int): Array[String] = {
    val toks = whitespaceTokens(text)
    if (toks.length < n) { if (toks.isEmpty) Array.empty else Array(toks.mkString(" ")) }
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
  }

  /** Character n-gram shingles over the normalized text. */
  def charShingles(text: String, n: Int): Array[String] = {
    val t = text.toLowerCase
    if (t.length < n) { if (t.isEmpty) Array.empty else Array(t) }
    else Array.tabulate(t.length - n + 1)(i => t.substring(i, i + n))
  }

  /** MinHash signature: k independent min-hashes over the shingle set. */
  def minHash(shingles: Array[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val s = shingles(i)
      var j = 0
      while (j < k) {
        val h = hash64(s, j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over tokens. */
  def simHash(tokens: Array[String]): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = hash64(tokens(i), 0)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing document fingerprint: min rolling hash over windows of w shingles. */
  def fingerprint(text: String, shingleSize: Int): Long = {
    val sh = charShingles(text, shingleSize)
    if (sh.isEmpty) return 0L
    var min = Long.MaxValue
    var i = 0
    while (i < sh.length) { val h = hash64(sh(i), 1); if (h < min) min = h; i += 1 }
    min
  }

  /** Exact n-gram Jaccard between two texts (word n-grams). */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    val sa = wordShingles(a, n).toSet
    val sb = wordShingles(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      val union = sa.size + sb.size - inter
      if (union == 0) 1.0 else inter.toDouble / union
    }
  }

  // --- language-ID: tiny trigram-profile heuristic over common function words.
  // Public-knowledge stopword lists; scores by hit ratio per language.
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "del", "se", "las", "por"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "que", "est"),
    "de" -> Set("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des", "im", "ein"),
    "pt" -> Set("o", "a", "de", "que", "e", "do", "da", "em", "um", "para", "com", "os"),
    "it" -> Set("il", "di", "che", "la", "e", "un", "per", "in", "una", "del", "con", "non")
  )

  /** Heuristic language id: highest stopword hit-ratio; "und" (undetermined) below floor. */
  def langId(text: String): String = {
    val toks = whitespaceTokens(text.toLowerCase)
    if (toks.isEmpty) return "und"
    // CJK quick check: any han characters => zh
    if (text.exists(c => Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN)) return "zh"
    var best = "und"; var bestScore = 0.0
    profiles.foreach { case (lang, words) =>
      var hits = 0
      var i = 0
      while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
      val score = hits.toDouble / toks.length
      if (score > bestScore) { best = lang; bestScore = score }
    }
    if (bestScore < 0.02) "und" else best
  }
}

/** minhash_sig(text, numHashes, shingleSize) -> array<bigint>. */
case class MinHashSig(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def eval(input: InternalRow): Any = {
    val t = children.head.eval(input)
    if (t == null) return null
    val k = children(1).eval(input).asInstanceOf[Number].intValue()
    val n = children(2).eval(input).asInstanceOf[Number].intValue()
    val sig = TextKernels.minHash(TextKernels.wordShingles(t.toString, n), k)
    new GenericArrayData(sig)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashSig = copy(cs)
}

/** simhash64(text) -> bigint. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.simHash(TextKernels.whitespaceTokens(t.toString))
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** ngram_jaccard(a, b, n) -> double. */
case class NgramJaccard(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_jaccard"
  override def eval(input: InternalRow): Any = {
    val a = children.head.eval(input); val b = children(1).eval(input)
    if (a == null || b == null) return null
    val n = children(2).eval(input).asInstanceOf[Number].intValue()
    TextKernels.ngramJaccard(a.toString, b.toString, n)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): NgramJaccard = copy(cs)
}

/** lang_id(text) -> string. */
case class LangId(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(t: Any): Any =
    UTF8String.fromString(TextKernels.langId(t.toString))
  override protected def withNewChildInternal(c: Expression): LangId = copy(c)
}

/** doc_fingerprint(text, shingleSize) -> bigint. */
case class DocFingerprint(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    TextKernels.fingerprint(t.toString, n.asInstanceOf[Number].intValue())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DocFingerprint =
    copy(l, r)
}

/** hash64(text, seed) -> bigint — the pipeline's stable string hash. */
case class Hash64(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash64"
  override protected def nullSafeEval(t: Any, s: Any): Any =
    TextKernels.hash64(t.toString, s.asInstanceOf[Number].longValue())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hash64 =
    copy(l, r)
}

object TextRegistry {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("minhash_sig", exprs => MinHashSig(exprs), "built-in")
    r.createOrReplaceTempFunction("simhash64", exprs => SimHash64(exprs.head), "built-in")
    r.createOrReplaceTempFunction("ngram_jaccard", exprs => NgramJaccard(exprs), "built-in")
    r.createOrReplaceTempFunction("lang_id", exprs => LangId(exprs.head), "built-in")
    r.createOrReplaceTempFunction("doc_fingerprint", exprs => DocFingerprint(exprs.head, exprs(1)), "built-in")
    r.createOrReplaceTempFunction("hash64", exprs => Hash64(exprs.head, exprs(1)), "built-in")
  }
}
