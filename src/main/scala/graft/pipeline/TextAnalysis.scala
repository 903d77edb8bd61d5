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

  /** Whitespace token count — count of \S+ runs (codegen'd, SQL-parity). */
  def tokenCount(text: Column): Column = size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword count: splits on whitespace AND punctuation/letter-digit
    * boundaries; proxy for tokenizer load without a vocab. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /**
   * Heuristic quality score in [0,1] from public-knowledge signals
   * (C4/Gopher-style filters): word count band, mean word length band,
   * punctuation density, uppercase ratio. Deterministic closed-form —
   * SQL-expressible on both engines.
   */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val words = tokenCount(text).cast("double")
    val meanWordLen = when(words > 0, nChars / words).otherwise(lit(0.0))
    val punct = size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val upper = size(regexp_extract_all(text, lit("[A-Z]"), lit(0))).cast("double")
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
