package graft.pipeline

import graft.TestSpark
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel pins for the string-similarity family. Expected values for the
  * non-trivial cases were cross-checked against DuckDB's byte-based
  * levenshtein/damerau_levenshtein/hamming/jaccard/jaro_winkler_similarity
  * (the catalog oracle for q231). */
class StringSimSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  test("damerau_levenshtein is the unrestricted variant") {
    assert(StringSimEval.damerau(u("ca"), u("abc")) == 2) // OSA would say 3
    assert(StringSimEval.damerau(u("ab"), u("ba")) == 1)
    assert(StringSimEval.damerau(u("abcdef"), u("abcfad")) == 3)
    assert(StringSimEval.damerau(u("kitten"), u("sitting")) == 3)
    assert(StringSimEval.damerau(u(""), u("abc")) == 3)
    assert(StringSimEval.damerau(u("abc"), u("")) == 3)
    assert(StringSimEval.damerau(u("same"), u("same")) == 0)
  }

  test("hamming counts differing bytes, unequal lengths -> sentinel") {
    assert(StringSimEval.hamming(u("abcde"), u("abcdx")) == 1)
    assert(StringSimEval.hamming(u("abc"), u("abcd")) == -1)
    assert(StringSimEval.hamming(u(""), u("")) == 0)
  }

  test("char_jaccard over distinct byte sets") {
    assert(StringSimEval.charJaccard(u("duck"), u("luck")) == 0.6)
    assert(StringSimEval.charJaccard(u("aab"), u("ab")) == 1.0)
    // byte (not codepoint) semantics: 'é' is two UTF-8 bytes
    assert(StringSimEval.charJaccard(u("héllo"), u("hello")) == 0.5)
    assert(StringSimEval.charJaccard(u(""), u("")) == 0.0)
  }

  test("jaro / jaro-winkler reference values") {
    assert(math.abs(StringSimEval.jaro(u("MARTHA"), u("MARHTA")) - 0.9444444444444445) < 1e-15)
    assert(math.abs(
      StringSimEval.jaroWinkler(u("MARTHA"), u("MARHTA")) - 0.9611111111111111) < 1e-15)
    assert(math.abs(StringSimEval.jaro(u("aaaa"), u("aaa")) - 0.9166666666666666) < 1e-15)
    assert(math.abs(StringSimEval.jaroWinkler(u("aaaa"), u("aaa")) - 0.9416666666666667) < 1e-15)
    // window floor(max/2)-1 = 0: adjacent transposition has no matches
    assert(StringSimEval.jaro(u("ab"), u("ba")) == 0.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    val j = StringSimEval.jaro(u("abcdxxxx"), u("abcdyyyy"))
    assert(math.abs(j - 2.0 / 3.0) < 1e-15)
    assert(StringSimEval.jaroWinkler(u("abcdxxxx"), u("abcdyyyy")) == j)
    assert(StringSimEval.jaro(u(""), u("")) == 0.0)
    assert(StringSimEval.jaro(u("a"), u("")) == 0.0)
    assert(StringSimEval.jaroWinkler(u("abcdef"), u("abcdef")) == 1.0)
    // DuckDB-pinned: transpositions truncate (mismatched/2 integer div)
    assert(math.abs(StringSimEval.jaro(u("abcdef"), u("badcfe")) - 0.8333333333333334) < 1e-15)
    assert(math.abs(StringSimEval.jaro(u("information"), u("informant")) - 0.9023569023569024) < 1e-15)
    assert(math.abs(
      StringSimEval.jaroWinkler(u("information"), u("informant")) - 0.9414141414141414) < 1e-15)
  }

  test("nw_score: Needleman-Wunsch global alignment") {
    def arr(xs: String*): org.apache.spark.sql.catalyst.util.ArrayData =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        xs.map(x => if (x == null) null else u(x)).toArray)
    // identical sequences: all matches
    assert(StringSimEval.nwScore(arr("a", "b", "c"), arr("a", "b", "c")) == 3)
    // empty vs non-empty: pure gaps
    assert(StringSimEval.nwScore(arr(), arr("a", "b")) == -2)
    assert(StringSimEval.nwScore(arr("a"), arr()) == -1)
    // classic: align (a,b,c) vs (a,c) -> match, gap, match = 1
    assert(StringSimEval.nwScore(arr("a", "b", "c"), arr("a", "c")) == 1)
    // all-mismatch same length: substitution (-1 each) beats double gaps
    assert(StringSimEval.nwScore(arr("a", "b"), arr("x", "y")) == -2)
    // null elements never match (mismatch, not crash)
    assert(StringSimEval.nwScore(arr(null, "b"), arr(null, "b")) == 0)
    // SQL + codegen path
    val s = TestSpark.spark
    val r = s.sql(
      """SELECT nw_score(array('a','b','c','d'), array('a','c','d')) AS s1,
        |       nw_score(array('x'), array('y')) AS s2""".stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == -1)
  }

  test("SQL registration and codegen path") {
    val s = TestSpark.spark
    val r = s.sql(
      """SELECT damerau_levenshtein('ca', 'abc') AS dl,
        |       hamming_dist('abcde', 'abcdx') AS h,
        |       hamming_dist('abc', 'abcd') AS hnull,
        |       char_jaccard('duck', 'luck') AS cj,
        |       round(jaro_winkler('MARTHA', 'MARHTA'), 4) AS jw""".stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 1)
    assert(r.isNullAt(2))
    assert(r.getDouble(3) == 0.6)
    assert(r.getDouble(4) == 0.9611)
  }
}
