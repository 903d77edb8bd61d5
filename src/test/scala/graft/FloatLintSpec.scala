package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 float-output discipline lint (the r07 verdict's item 2).
  *
  * The recurring driver-only hash-FAIL class (q606 r06, q383/q676 r07) is
  * `round(<double>, k)` applied to quantities derived from exact integers
  * or decimals: such ratios/sums land EXACTLY on k-decimal boundaries
  * (381/60000 = 0.00635), where round(double) implementations can differ
  * per engine build. Genuinely continuous quantities (libm-valued sums,
  * trig, logistic outputs) land mid-interval with probability ~1 and are
  * out of scope.
  *
  * This spec statically scans every oracle SQL text — the engine-portable
  * mirror of each query (Spark-side queries share these fragments, and
  * the few DataFrame-API twins mirror them term for term) — and fails on
  * new occurrences of the risky shapes:
  *
  *  1. `round(cast(X as double) / Y, k)` and
  *     `round(X / cast(Y as double), k)` — single-term ratio emissions
  *     (the q676 class). Round 8 converted ~70 of these to exact half-up
  *     scaled-integer arithmetic; the allowlist names the reviewed
  *     continuous leftovers.
  *  2. `round(cast(count(..)|sum(CASE..1..0 END) as double) / ..., k)` —
  *     count-ratio aggregate emissions (same class, aggregate form).
  *  3. rank keys through round(): `OVER (... ORDER BY round(...)` — a
  *     1-ulp engine difference at a rounding boundary flips a rank (the
  *     q606 class). Final `ORDER BY round(...) ... LIMIT k` top-k picks
  *     of continuous scores are reviewed separately and allowlisted.
  */
class FloatLintSpec extends AnyFunSuite {

  private def findBalanced(s: String, open: Int): Int = {
    var d = 0; var i = open
    while (i < s.length) {
      s(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  private val case01 =
    """(?s)^\s*CASE\s+WHEN.*THEN\s+1\s+(ELSE\s+0\s+)?END\s*$""".r

  /** (queryName, matched snippet) for every risky occurrence. */
  private def scan(sqls: Map[String, String]): Seq[(String, String)] = {
    val r1 = """round\(cast\([A-Za-z_0-9.]+ as double\)\s*/\s*[A-Za-z_0-9.]+\s*,\s*[0-9]\)""".r
    val r2 = """round\([A-Za-z_0-9.]+\s*/\s*cast\([A-Za-z_0-9.]+ as double\)\s*,\s*[0-9]\)""".r
    // capture past "round(" so named allowlist entries can match the
    // ranked expression itself (a snippet ending at "round(" made every
    // window-rank hit look alike — and a wildcard allowlist on that
    // common prefix silently disabled this rule in the first cut)
    val r3 = """OVER\s*\([^)]{0,200}ORDER BY round\([^,)]{0,80}""".r
    // plain re-round of a cast identifier: for DECIMAL sources this
    // re-rounds through a double (the boundary-flip class); round the
    // decimal itself and cast after — cast(round(x, k) as double)
    val r5 = """round\(cast\([A-Za-z_0-9.]+ as double\)\s*,\s*[0-9]\)""".r
    // window/aggregate denominators: round(cast(n as double) / sum(n)
    // OVER (..), k) — the q676 integer-ratio class with a denominator the
    // simple-identifier r1 pattern cannot see
    val r6 = """round\(cast\([A-Za-z_0-9.]+ as double\)\s*/\s*(sum|count|min|max|avg)\(""".r
    // ratio of two window aggregates: round(min(x) OVER () / max(x) OVER (), k)
    val r7 = """round\((min|max|sum|count)\([A-Za-z_0-9.]+\)\s*OVER\s*\(\)\s*/""".r
    // windowed-sum re-round through double: round(cast(sum(x) OVER (..) as
    // double) / .., k) — decimal/integer window sums are exact; the double
    // cast before the divide re-introduces the boundary class
    val r8 = """round\(cast\(sum\([A-Za-z_0-9.]+\)\s*OVER\s*""".r
    // avg() emissions: avg over integer/decimal/indicator columns is a
    // small-denominator rational — the boundary class in aggregate form.
    // (avg over genuinely continuous inputs gets a named allowlist entry.)
    val r9 = """round\(avg\(""".r
    // rank-ratio emissions: cume_dist = k/n, percent_rank = (r-1)/(n-1) —
    // integer ratios; emit via the exact half-up count macro instead
    val r10 = """round\((cume_dist|percent_rank)\(\)""".r
    val aggStart = """round\(cast\((sum|count)\(""".r
    sqls.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val hits = Seq.newBuilder[(String, String)]
      r1.findAllIn(sql).foreach(m => hits += ((name, m)))
      r2.findAllIn(sql).foreach(m => hits += ((name, m)))
      r3.findAllIn(sql).foreach(m => hits += ((name, m.takeRight(60))))
      r5.findAllIn(sql).foreach(m => hits += ((name, m)))
      r6.findAllIn(sql).foreach(m => hits += ((name, m)))
      r7.findAllIn(sql).foreach(m => hits += ((name, m)))
      r8.findAllIn(sql).foreach(m => hits += ((name, m)))
      r9.findAllIn(sql).foreach(m => hits += ((name, m)))
      r10.findAllIn(sql).foreach(m => hits += ((name, m)))
      // aggregate-ratio shape with provably-integer numerator
      for (m <- aggStart.findAllMatchIn(sql)) {
        val aggOpen = sql.indexOf('(', m.start(1))
        val aggEnd = findBalanced(sql, aggOpen)
        if (aggEnd > 0) {
          val agg = sql.substring(m.start(1), aggEnd)
          val intLike = agg.startsWith("count(") ||
            (agg.startsWith("sum(") &&
              case01.findFirstIn(agg.substring(4, agg.length - 1)).isDefined)
          val tail = sql.substring(aggEnd).take(40)
          if (intLike && tail.matches("""(?s)\s*as double\)\s*/.*"""))
            hits += ((name, (agg.take(50) + " .. " + tail.trim.take(20))
              .replaceAll("\\s+", " ")))
        }
      }
      hits.result()
    }
  }

  // Reviewed sites: continuous (libm/double-valued) numerators where a
  // k-decimal boundary landing is measure-zero, or top-k picks of
  // continuous scores with deterministic tie-breaks. Each entry is
  // (query name, snippet fragment that the match must contain).
  private val allowlist: Seq[(String, String)] = Seq(
    // 1/HHI: hhi is a double Herfindahl index (sum of squared shares of
    // continuous revenue) — boundary landings are measure-zero
    ("q402_hhi", "hhi"),
    // top_share: topr = max(round(r, 4)) of a continuous revenue ratio
    ("q540_herfindahl", "topr"),
    // periodogram rank key: c, s are cos/sin-folded sums — continuous
    // (trig irrationality), boundary landings measure-zero
    ("q428_periodogram", "ORDER BY round(c * c + s * s"),
    // ewma rank key: lim has a sqrt factor — continuous denominator
    ("q537_ewma_chart", "ORDER BY round(abs(e - mu")
  )

  private def allowed(name: String, snippet: String): Boolean =
    allowlist.exists { case (q, frag) =>
      (q == "*" || name.startsWith(q)) && snippet.contains(frag)
    }

  test("no integer/decimal-derived round(double) outputs or rank keys") {
    val hits = scan(SparkEntry.oracleSql).filterNot { case (n, s) => allowed(n, s) }
    assert(hits.isEmpty,
      s"${hits.size} risky float surfaces (convert to exact scaled-integer " +
        "arithmetic or allowlist after review):\n" +
        hits.map { case (n, s) => s"  $n: $s" }.mkString("\n"))
  }
}
