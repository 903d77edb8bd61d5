package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Composed corpus-preparation pipeline for training-data curation
 * (BASELINE.json capability extension): quality floor → language allowlist
 * → exact dedup. One declarative plan — the quality/lang scoring is a
 * single codegen'd scan (text_stats + lang_id kernels), the dedup is one
 * shuffle on the content, so the whole prepare step is scan + 1 shuffle at
 * any corpus size.
 */
object Corpus {

  /** Clean a document corpus: keep rows with qualityScore >= minQuality and
    * language in `langs`, then drop exact duplicates keeping the smallest
    * id per distinct text. */
  def clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double,
      langs: Seq[String]): DataFrame = {
    val filtered = df.filter(
      TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.langId(col(textCol)).isin(langs: _*))
    Dedup.exact(filtered, idCol, textCol)
  }

  /** md5-derived bucket 0..999 of a key — the reproducibility primitive
    * for sampling: stable across runs, partitionings, and engines (DuckDB:
    * ('0x'||substr(md5(k),1,15))::BIGINT % 1000). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 1000

  /**
   * Deterministic corpus sample: keeps a row iff its key's hash bucket
   * falls below rate*1000. A pure codegen filter — no shuffle, no RNG
   * state, no driver coordination — so sampling 100 TB costs one scan, and
   * the SAME rows are kept on every rerun (the reproducibility contract
   * dataset curation needs; `df.sample` gives neither determinism under
   * re-partitioning nor cross-engine agreement).
   */
  def sampleDeterministic(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < math.round(rate * 1000).toInt)

  /**
   * Source-weighted mixture sampling: per-source keep rates (absent
   * sources drop to rate 0) — how a training mixture ("20% web, 80%
   * curated") is assembled from a mixed corpus in one pass.
   */
  def mixture(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    val rate = weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < round(rate * 1000).cast("long"))
  }

  /** Corpus composition report per group: doc/token/char totals and mean
    * quality — one partial-aggregating scan (the kernels are codegen
    * expressions, the agg is map-side-combined). */
  def stats(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"),
      sum(length(col(textCol)).cast("long")).as("n_chars"),
      avg(TextAnalysis.qualityScore(col(textCol))).as("avg_quality"))
}
