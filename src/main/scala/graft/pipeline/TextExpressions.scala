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

  /**
   * Curation text normalization, one pass: strip control characters (C0
   * minus \t\n\r, plus DEL — including \x0B/\x0C, the characters where
   * Java's and RE2's \s classes disagree), collapse whitespace runs to one
   * space, trim, then Unicode NFC composition. SQL-oracle equivalent:
   * nfc_normalize(trim(regexp_replace(regexp_replace(text,
   * '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g'))).
   */
  def normalizeText(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isCtl = (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7F
      if (!isCtl) {
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
          if (started) pendingSpace = true
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
          started = true
        }
      }
      i += 1
    }
    java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
  }

  /** Java-regex \s (the ASCII set) — the class all SQL-side counts use. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAl(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDg(c: Char): Boolean = c >= '0' && c <= '9'

  /**
   * One-pass replacement for the regex-count stack
   * (`size(regexp_extract_all(...))` built each metric from its own full
   * regex scan; five scans per document dominated the text-analysis
   * queries). Semantics are pinned to the original patterns:
   *   tokens   = runs of \S+
   *   subwords = matches of [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]
   *   punct    = matches of [.,;:!?]
   *   upper    = matches of [A-Z]
   * Returns {tokens, subwords, punct, upper}.
   */
  def textCounts(s: String): Array[Int] = {
    var tokens = 0; var subwords = 0; var punct = 0; var upper = 0
    var i = 0
    var prev = 0 // 0 = ws, 1 = letter-run, 2 = digit-run, 3 = other
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) prev = 0
      else {
        if (prev == 0) tokens += 1
        if (isAl(c)) {
          if (prev != 1) subwords += 1
          prev = 1
          if (c <= 'Z' && c >= 'A') upper += 1
        } else if (isDg(c)) {
          if (prev != 2) subwords += 1
          prev = 2
        } else {
          subwords += 1 // each non-alnum-non-ws CODE POINT is its own match
          prev = 3
          if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punct += 1
          // a supplementary code point (surrogate pair) is ONE regex match:
          // consume the low surrogate so it isn't counted again
          if (Character.isHighSurrogate(c) && i + 1 < n &&
              Character.isLowSurrogate(s.charAt(i + 1))) i += 1
        }
      }
      i += 1
    }
    Array(tokens, subwords, punct, upper)
  }

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

  /** splitmix64 finalizer — full-avalanche mix of a 64-bit state. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /**
   * MinHash signature: k min-hashes over the shingle set. Each shingle is
   * string-hashed ONCE; the k "permutations" are splitmix64 mixes of that
   * base value (h_j = mix(base + j·golden)) — the standard one-hash +
   * k-derived-permutations construction, k× cheaper than hashing the string
   * k times while keeping the per-permutation independence the LSH S-curve
   * needs.
   */
  def minHash(shingles: Array[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val base = hash64(shingles(i), 0)
      var j = 0
      while (j < k) {
        val h = mix64(base + j * 0x9e3779b97f4a7c15L)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 (= the value DuckDB parses from
    * `'0x' || substr(md5(s), 1, 15)`), the cross-engine token hash that makes
    * md5-simhash oracle-checkable. */
  def md5Hash60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /**
   * Tiled average-hash of a payload string (the aHash image-fingerprint
   * shape over a stubbed decode): split into 60 contiguous tiles
   * (integer i*L/60 boundaries), "luma" per tile = md5Hash60(tile) % 256,
   * bit i set iff tile i's luma >= the mean. Locality: editing a span
   * perturbs only the tiles it covers (plus mean-adjacent flips), so
   * near-identical payloads land at small Hamming distance. 60 bits keeps
   * every shift unsigned-safe in SQL engines (same layout discipline as
   * simHashMd5); every step is md5/integer arithmetic => reproducible.
   */
  def aHash60(s: String): Long = {
    val lum = new Array[Long](60)
    val L = s.length
    var sum = 0L
    var i = 0
    while (i < 60) {
      val lo = i * L / 60
      val hi = (i + 1) * L / 60
      lum(i) = md5Hash60(s.substring(lo, hi)) % 256
      sum += lum(i)
      i += 1
    }
    val mean = sum / 60.0
    var bits = 0L
    i = 0
    while (i < 60) {
      if (lum(i) >= mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** 60-bit SimHash over tokens with the cross-engine md5 token hash. */
  def simHashMd5(tokens: Array[String]): Long = {
    val acc = new Array[Int](60)
    var i = 0
    while (i < tokens.length) {
      val h = md5Hash60(tokens(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
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

  /** Winnowing document fingerprint: min hash over all char shingles.
    * Hashes each window in place over the lowercased chars — no per-shingle
    * substring allocation (same values as hash64(substring, 1)). */
  def fingerprint(text: String, shingleSize: Int): Long = {
    val t = text.toLowerCase
    if (t.isEmpty) return 0L
    val n = t.length
    val w = if (n < shingleSize) n else shingleSize
    var min = Long.MaxValue
    var i = 0
    val last = n - w
    while (i <= last) {
      // inline hash64(t.substring(i, i+w), 1)
      var h = 0xcbf29ce484222325L ^ (1L * 0x9e3779b97f4a7c15L)
      var j = i
      val end = i + w
      while (j < end) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      if (h < min) min = h
      i += 1
    }
    min
  }

  /**
   * Cross-engine winnowing fingerprint: min md5Hash60 over lowercased char
   * shingles — the oracle-checkable twin of [[fingerprint]] (same winnowing
   * shape, md5 window hash instead of the FNV/murmur fold so a SQL engine
   * recomputes it exactly: `list_min(list_transform(range(L-w+1), i ->
   * ('0x'||substr(md5(substr(t,i+1,w)),1,15))::BIGINT))` in DuckDB).
   */
  def fingerprintMd5(text: String, shingleSize: Int): Long = {
    val t = text.toLowerCase
    val n = t.length
    if (n == 0) return 0L
    val w = if (n < shingleSize) n else shingleSize
    var min = Long.MaxValue
    var i = 0
    val last = n - w
    while (i <= last) {
      val h = md5Hash60(t.substring(i, i + w))
      if (h < min) min = h
      i += 1
    }
    min
  }

  /**
   * Full winnowing fingerprint SET (Schleimer et al. 2003): md5Hash60 over
   * every lowercased k-char gram, rightmost-min selection in each window of
   * `w` consecutive gram hashes, distinct selected hash values. One tight
   * pass with a reused digest — the codegen-friendly kernel behind
   * pipeline.Winnow (the HOF spelling of the same selection pays ~50x in
   * interpreted lambda dispatch + per-window array allocation).
   * Oracle twin: the list-algebra CTE chain in SparkEntry.winnowOracleSql.
   */
  def winnowFingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val t = text.toLowerCase
    val n = t.length - (k - 1)
    if (n < w) return Array.emptyLongArray
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = md5Hash60(t.substring(i, i + k)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var q = w - 1
    while (q < n) {
      // rightmost min of h[q-w+1 .. q] (<= keeps the later position on ties
      // — the oracle's max-p-with-h[p]=min)
      var m = Long.MaxValue
      var sel = -1
      var p = q - (w - 1)
      while (p <= q) { if (h(p) <= m) { m = h(p); sel = p }; p += 1 }
      seen.add(h(sel))
      q += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /**
   * Sliding-window distinct counts: out(i) = |distinct(toks[i..i+w-1])|
   * for every full window, via ONE pass with an incremental count map —
   * O(n) instead of the O(n*w) per-window array_distinct(slice(...))
   * spelling (which also allocates a slice per window). Backs the MATTR
   * lexical-diversity operator; counts are exact integers, so any
   * implementation agrees with the oracle's list-algebra spelling.
   */
  def windowDistinctCounts(toks: Array[String], w: Int): Array[Int] = {
    val n = toks.length
    if (w <= 0 || n < w) return Array.emptyIntArray
    val counts = new java.util.HashMap[String, Integer]()
    val out = new Array[Int](n - w + 1)
    var i = 0
    while (i < n) {
      counts.merge(toks(i), 1, (a, b) => a + b)
      if (i >= w) {
        val old = toks(i - w)
        val c = counts.get(old)
        if (c == 1) counts.remove(old) else counts.put(old, c - 1)
      }
      if (i >= w - 1) out(i - w + 1) = counts.size
      i += 1
    }
    out
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

  // fixed evaluation order (argmax tie-break must not depend on Map order)
  private val profileOrder: Array[(String, Set[String])] =
    Array("en", "es", "fr", "de", "pt", "it").map(l => l -> profiles(l))

  /** BMP Han ranges (URO + ext-A + compatibility) — covers the script check
    * without a per-char UnicodeScript binary search. */
  @inline private def isHan(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF) ||
    (c >= 0xF900 && c <= 0xFAFF)

  /** Heuristic language id: highest stopword hit-ratio; "und" (undetermined) below floor. */
  def langId(text: String): String = {
    // CJK quick check: any han characters => zh
    var ci = 0
    while (ci < text.length) { if (isHan(text.charAt(ci))) return "zh"; ci += 1 }
    val toks = whitespaceTokens(text.toLowerCase)
    if (toks.isEmpty) return "und"
    var best = "und"; var bestScore = 0.0
    var p = 0
    while (p < profileOrder.length) {
      val words = profileOrder(p)._2
      var hits = 0
      var i = 0
      while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
      val score = hits.toDouble / toks.length
      if (score > bestScore) { best = profileOrder(p)._1; bestScore = score }
      p += 1
    }
    if (bestScore < 0.02) "und" else best
  }
}

/**
 * Static per-row entry points for codegen: every text expression's generated
 * code is one call here, so the expressions stay inside whole-stage codegen
 * (CodegenFallback would evict the whole enclosing Project from WSCG).
 */
object TextRowEval {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def minhashSig(t: UTF8String, k: Int, n: Int): ArrayData =
    new GenericArrayData(TextKernels.minHash(TextKernels.wordShingles(t.toString, n), k))
  def simhash(t: UTF8String): Long =
    TextKernels.simHash(TextKernels.whitespaceTokens(t.toString))
  def simhashMd5(t: UTF8String): Long =
    TextKernels.simHashMd5(TextKernels.whitespaceTokens(t.toString))
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double =
    TextKernels.ngramJaccard(a.toString, b.toString, n)
  def langId(t: UTF8String): UTF8String =
    UTF8String.fromString(TextKernels.langId(t.toString))
  def fingerprint(t: UTF8String, n: Int): Long =
    TextKernels.fingerprint(t.toString, n)
  def hash64(t: UTF8String, seed: Long): Long =
    TextKernels.hash64(t.toString, seed)
  def textStats(t: UTF8String): InternalRow =
    new GenericInternalRow(TextKernels.textCounts(t.toString).map(_.asInstanceOf[Any]))
  def normalizeText(t: UTF8String): UTF8String =
    UTF8String.fromString(TextKernels.normalizeText(t.toString))
  def md5Hash60(t: UTF8String): Long =
    TextKernels.md5Hash60(t.toString)
  def wordShingles(t: UTF8String, n: Int): ArrayData =
    new GenericArrayData(TextKernels.wordShingles(t.toString, n)
      .map(s => UTF8String.fromString(s): Any))
  def imageAhash(bytes: Array[Byte]): Long =
    TextKernels.aHash60(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  def fingerprintMd5(t: UTF8String, n: Int): Long =
    TextKernels.fingerprintMd5(t.toString, n)
  def winnowFingerprints(t: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(TextKernels.winnowFingerprints(t.toString, k, w))
  def windowDistinctCounts(arr: ArrayData, w: Int): ArrayData = {
    val toks = new Array[String](arr.numElements())
    var i = 0
    while (i < toks.length) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    new GenericArrayData(TextKernels.windowDistinctCounts(toks, w))
  }
  /** Kept tokens (positions not in the SORTED covered-index array) joined
    * with single spaces — one merge walk, O(tokens + covered). */
  def scrubPositions(tokens: ArrayData, covered: ArrayData): UTF8String = {
    val n = tokens.numElements()
    val m = covered.numElements()
    val sb = new java.lang.StringBuilder
    var ci = 0
    var first = true
    var i = 0
    while (i < n) {
      while (ci < m && covered.getInt(ci) < i) ci += 1
      if (!(ci < m && covered.getInt(ci) == i)) {
        if (!first) sb.append(' ')
        sb.append(tokens.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** minhash_sig(text, numHashes, shingleSize) -> array<bigint>. */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(t: Any, k: Any, n: Any): Any =
    TextRowEval.minhashSig(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Number].intValue(), n.asInstanceOf[Number].intValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, k, n) =>
      s"${ev.value} = graft.pipeline.TextRowEval.minhashSig($t, (int)$k, (int)$n);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinHashSig = copy(f, s, t)
}
object MinHashSig {
  def apply(children: Seq[Expression]): MinHashSig =
    MinHashSig(children(0), children(1), children(2))
}

/** simhash64(text) -> bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(t: Any): Any =
    TextRowEval.simhash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = graft.pipeline.TextRowEval.simhash($t);")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** ngram_jaccard(a, b, n) -> double. */
case class NgramJaccard(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_jaccard"
  override protected def nullSafeEval(a: Any, b: Any, n: Any): Any =
    TextRowEval.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      n.asInstanceOf[Number].intValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b, n) =>
      s"${ev.value} = graft.pipeline.TextRowEval.ngramJaccard($a, $b, (int)$n);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NgramJaccard = copy(f, s, t)
}
object NgramJaccard {
  def apply(children: Seq[Expression]): NgramJaccard =
    NgramJaccard(children(0), children(1), children(2))
}

/** simhash_md5(text) -> bigint: 60-bit simhash over the md5-derived token
  * hash shared bit-for-bit with SQL engines (DuckDB-oracle-checkable). */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"
  override protected def nullSafeEval(t: Any): Any =
    TextRowEval.simhashMd5(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = graft.pipeline.TextRowEval.simhashMd5($t);")
  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(c)
}

/** lang_id(text) -> string. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(t: Any): Any =
    TextRowEval.langId(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = graft.pipeline.TextRowEval.langId($t);")
  override protected def withNewChildInternal(c: Expression): LangId = copy(c)
}

/** doc_fingerprint(text, shingleSize) -> bigint. */
case class DocFingerprint(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    TextRowEval.fingerprint(t.asInstanceOf[UTF8String], n.asInstanceOf[Number].intValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.pipeline.TextRowEval.fingerprint($t, (int)$n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DocFingerprint =
    copy(l, r)
}

/** fingerprint_md5(text, shingleSize) -> bigint: cross-engine winnowing
  * fingerprint (min md5_hash60 over lowercased char shingles) — the
  * oracle-checkable twin of doc_fingerprint. */
case class FingerprintMd5(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint_md5"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    TextRowEval.fingerprintMd5(t.asInstanceOf[UTF8String], n.asInstanceOf[Number].intValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.pipeline.TextRowEval.fingerprintMd5($t, (int)$n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FingerprintMd5 =
    copy(l, r)
}

/** winnow_fingerprints(text, k, w) -> array<bigint>: distinct winnowing-
  * selected md5Hash60 gram hashes (see TextKernels.winnowFingerprints). */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any =
    TextRowEval.winnowFingerprints(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Number].intValue(), w.asInstanceOf[Number].intValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, k, w) =>
      s"${ev.value} = graft.pipeline.TextRowEval.winnowFingerprints($t, (int)$k, (int)$w);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFingerprints = copy(f, s, t)
}

/** window_distinct_counts(tokens, w) -> array<int>: per-full-window
  * distinct counts, one incremental pass (TextKernels). */
case class WindowDistinctCounts(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "window_distinct_counts"
  override protected def nullSafeEval(a: Any, w: Any): Any =
    TextRowEval.windowDistinctCounts(a.asInstanceOf[ArrayData],
      w.asInstanceOf[Number].intValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, w) =>
      s"${ev.value} = graft.pipeline.TextRowEval.windowDistinctCounts($a, (int)$w);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WindowDistinctCounts = copy(l, r)
}

/** hash64(text, seed) -> bigint — the pipeline's stable string hash. */
case class Hash64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash64"
  override protected def nullSafeEval(t: Any, s: Any): Any =
    TextRowEval.hash64(t.asInstanceOf[UTF8String], s.asInstanceOf[Number].longValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.pipeline.TextRowEval.hash64($t, (long)$s);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hash64 =
    copy(l, r)
}

/** text_stats(text) -> struct<n_tokens:int, n_subwords:int, n_punct:int,
  * n_upper:int> — all regex-equivalent counts in one pass (see
  * TextKernels.textCounts). */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false)))
  override def prettyName: String = "text_stats"
  override protected def nullSafeEval(t: Any): Any =
    TextRowEval.textStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = graft.pipeline.TextRowEval.textStats($t);")
  override protected def withNewChildInternal(c: Expression): TextStats = copy(c)
}

/** md5_hash60(text) -> bigint: first 60 bits of md5 — the cross-engine
  * string hash (`('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB), for
  * hashed-feature bucketing that must reproduce outside the JVM. */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"
  override protected def nullSafeEval(t: Any): Any =
    TextRowEval.md5Hash60(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = graft.pipeline.TextRowEval.md5Hash60($t);")
  override protected def withNewChildInternal(c: Expression): Md5Hash60 = copy(c)
}

/** image_ahash(payload binary) -> bigint: tiled average-hash fingerprint of
  * an (UTF-8-decodable) payload — see TextKernels.aHash64. */
case class ImageAhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "image_ahash"
  override protected def nullSafeEval(t: Any): Any =
    TextRowEval.imageAhash(t.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = graft.pipeline.TextRowEval.imageAhash($t);")
  override protected def withNewChildInternal(c: Expression): ImageAhash = copy(c)
}

/** word_shingles(text, n) -> array<string>: space-joined word n-grams in one
  * tokenizer pass (the set-construction front end of minhash/jaccard dedup;
  * a split+transform SQL formulation re-tokenizes per shingle element). */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    TextRowEval.wordShingles(t.asInstanceOf[UTF8String], n.asInstanceOf[Number].intValue())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.pipeline.TextRowEval.wordShingles($t, (int)$n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordShingles =
    copy(l, r)
}

/** normalize_text(text) -> string: control-strip + whitespace collapse + NFC
  * (see TextKernels.normalizeText). */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override protected def nullSafeEval(t: Any): Any =
    TextRowEval.normalizeText(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = graft.pipeline.TextRowEval.normalizeText($t);")
  override protected def withNewChildInternal(c: Expression): NormalizeText = copy(c)
}

/** scrub_positions(tokens array<string>, covered array<int> SORTED asc) ->
  * string: tokens at uncovered positions joined by single spaces (the
  * reassembly step of span scrubbing as one codegen merge walk — no
  * token-level shuffle, no interpreted HOF). */
case class ScrubPositions(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "scrub_positions"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, array<int>), got (${left.dataType}, ${right.dataType})")
  }
  override protected def nullSafeEval(t: Any, c: Any): Any =
    TextRowEval.scrubPositions(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.pipeline.TextRowEval.scrubPositions($t, $c);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ScrubPositions =
    copy(l, r)
}

object TextRegistry {
  /** Idempotent per session (avoids a WARN per function per re-register). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    // arity = -1: variable (the expression validates its own children).
    // A fixed-arity mismatch raises a named analysis-time error instead of
    // the registration lambda's raw IndexOutOfBoundsException.
    def reg(name: String, arity: Int, b: Seq[Expression] => Expression): Unit =
      if (!r.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        r.createOrReplaceTempFunction(name, exprs => {
          if (arity >= 0 && exprs.length != arity)
            throw new IllegalArgumentException(
              s"function $name expects $arity argument(s), got ${exprs.length}")
          b(exprs)
        }, "built-in")
    reg("minhash_sig", -1, exprs => MinHashSig(exprs))
    reg("simhash64", 1, exprs => SimHash64(exprs.head))
    reg("simhash_md5", 1, exprs => SimHashMd5(exprs.head))
    reg("ngram_jaccard", -1, exprs => NgramJaccard(exprs))
    reg("lang_id", 1, exprs => LangId(exprs.head))
    reg("doc_fingerprint", 2, exprs => DocFingerprint(exprs.head, exprs(1)))
    reg("hash64", 2, exprs => Hash64(exprs.head, exprs(1)))
    reg("text_stats", 1, exprs => TextStats(exprs.head))
    reg("normalize_text", 1, exprs => NormalizeText(exprs.head))
    reg("md5_hash60", 1, exprs => Md5Hash60(exprs.head))
    reg("word_shingles", 2, exprs => WordShingles(exprs.head, exprs(1)))
    reg("scrub_positions", 2, exprs => ScrubPositions(exprs.head, exprs(1)))
    reg("image_ahash", 1, exprs => ImageAhash(exprs.head))
    reg("fingerprint_md5", 2, exprs => FingerprintMd5(exprs.head, exprs(1)))
    reg("winnow_fingerprints", 3,
      exprs => WinnowFingerprints(exprs.head, exprs(1), exprs(2)))
    reg("window_distinct_counts", 2,
      exprs => WindowDistinctCounts(exprs.head, exprs(1)))
    // §2.9 version export (reference api.rs:8-11): engine + Spark version
    reg("graft_version", 0, _ => org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(graft.BuildInfo.versionString),
      StringType))
    reg("cosine_sim", 2, exprs => CosineSim(exprs.head, exprs(1)))
    reg("dtw_distance", 2, exprs => DtwDistance(exprs.head, exprs(1)))
    reg("vec_dot", 2, exprs => VecDot(exprs.head, exprs(1)))
    reg("hll_distinct", -1, HllDistinctAgg.builder)
    reg("kmv_sketch", -1, KmvSketchAgg.builder)
    reg("damerau_levenshtein", 2, exprs => DamerauLevenshtein(exprs.head, exprs(1)))
    reg("hamming_dist", 2, exprs => HammingDist(exprs.head, exprs(1)))
    reg("char_jaccard", 2, exprs => CharJaccard(exprs.head, exprs(1)))
    reg("jaro_winkler", 2, exprs => JaroWinkler(exprs.head, exprs(1)))
    reg("lcs_length", 2, exprs => LcsLength(exprs.head, exprs(1)))
    reg("nw_score", 2, exprs => NwScore(exprs.head, exprs(1)))
  }
}
