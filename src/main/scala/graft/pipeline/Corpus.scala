package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
