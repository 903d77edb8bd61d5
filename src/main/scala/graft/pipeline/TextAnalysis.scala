package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.internal.{columnExpr, exprColumn}

/**
 * Text-analysis operators for training-data pipelines (BASELINE.json
 * capability extension): token counting, quality scoring, language id,
 * fingerprinting. Everything that plain SQL can express is built from
 * codegen'd built-ins (oracle-checkable in DuckDB); heuristics that need
 * imperative kernels are Catalyst expressions from TextExpressions.
 */
object TextAnalysis {

  /** All regex-equivalent counts in one scan (struct<n_tokens, n_subwords,
    * n_punct, n_upper>); repeated field reads collapse via codegen
    * common-subexpression elimination, so a projection using several counts
    * still scans each document once. */
  def stats(text: Column): Column = exprColumn(TextStats(columnExpr(text)))

  /** Whitespace token count — count of \S+ runs (codegen'd, SQL-parity). */
  def tokenCount(text: Column): Column = stats(text).getField("n_tokens")

  /** BPE-ish subword count: splits on whitespace AND punctuation/letter-digit
    * boundaries; proxy for tokenizer load without a vocab. */
  def subwordCount(text: Column): Column = stats(text).getField("n_subwords")

  /**
   * Heuristic quality score in [0,1] from public-knowledge signals
   * (C4/Gopher-style filters): word count band, mean word length band,
   * punctuation density, uppercase ratio. Deterministic closed-form —
   * SQL-expressible on both engines.
   */
  def qualityScore(text: Column): Column = {
    val st = stats(text)
    val nChars = length(text).cast("double")
    val words = st.getField("n_tokens").cast("double")
    val meanWordLen = when(words > 0, nChars / words).otherwise(lit(0.0))
    val punct = st.getField("n_punct").cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val upper = st.getField("n_upper").cast("double")
    val upperRatio = when(nChars > 0, upper / nChars).otherwise(lit(0.0))

    val wordScore = when(words >= 50 && words <= 100000, lit(1.0))
      .when(words >= 10, lit(0.5)).otherwise(lit(0.0))
    val lenScore = when(meanWordLen >= 3 && meanWordLen <= 10, lit(1.0)).otherwise(lit(0.5))
    val punctScore = when(punctRatio <= 0.1, lit(1.0)).otherwise(lit(0.5))
    val upperScore = when(upperRatio <= 0.3, lit(1.0)).otherwise(lit(0.5))
    (wordScore * 0.4 + lenScore * 0.2 + punctScore * 0.2 + upperScore * 0.2)
  }

  /** Heuristic language id (stopword-profile Catalyst expression). */
  def langId(text: Column): Column = exprColumn(LangId(columnExpr(text)))

  /** Winnowing-style document fingerprint (rolling min-hash of char shingles). */
  def fingerprint(text: Column, shingleSize: Int = 8): Column =
    exprColumn(DocFingerprint(columnExpr(text), columnExpr(lit(shingleSize))))

  /** Per-document analysis frame: one call producing all text metrics. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      subwordCount(col(textCol)).as("n_subwords"),
      length(col(textCol)).as("n_chars"),
      qualityScore(col(textCol)).as("quality"),
      langId(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fingerprint"))
}
