package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
 * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
 * selection rule): hash every k-char gram, then in every window of `w`
 * consecutive gram hashes record the RIGHTMOST minimum. The selection is
 * position-local, guarantees at least one fingerprint per window (so any
 * shared substring of length >= k + w - 1 shares a fingerprint), and keeps
 * the fingerprint density at ~2/(w+1) — the standard local fingerprinting
 * scheme for copy detection.
 *
 * Scale/planner notes — why this is NOT a pure-SQL pipeline:
 * the k-gram hash array `h` and the per-document selection are plain array
 * algebra (one linear scan, no shuffle), but if `h` stays a projected
 * EXPRESSION the optimizer works against us twice: CollapseProject inlines
 * the whole md5 transform into every nested-lambda reference, and — much
 * worse — the downstream self-join's inferred `isnotnull(fingerprint)`
 * predicate is pushed back below any exchange, rewriting the attribute to
 * its defining expression and turning the filter into O(n^2 * w) md5
 * evaluations per document, re-run once per CTE reference. The
 * `localCheckpoint` after the hash/selection step is therefore
 * load-bearing: it materializes fingerprints exactly once and is a hard
 * optimizer barrier (nothing is pushed into, or inlined out of, a
 * LogicalRDD). At 100 TB that is also the plan you want — fingerprints are
 * the reusable artifact (like persisted LSH bands), computed in one linear
 * pass and shared by the bucket-count and pair-join consumers.
 *
 * The md5-low-60-bit gram hash is the engine-portable spelling the DuckDB
 * oracle replays exactly (same contract as MinHash/Dedup).
 */
object Winnow {

  /** (id, fph) distinct winnowing fingerprints per document. */
  def fingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4): DataFrame = {
    val md5i = (e: String) =>
      s"cast(conv(substring(md5($e), 1, 15), 16, 10) as bigint)"
    val base = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= k + w - 1)
      .select(col(idCol), lower(col(textCol)).as("s"),
        (length(col(textCol)) - (k - 1)).as("n"))
    val hs = base.selectExpr(idCol, "n",
      s"transform(sequence(1, n), i -> ${md5i(s"substring(s, i, $k)")}) AS h")
    // Materialize h + cut lineage: see the planner note in the scaladoc.
    val cut = hs.localCheckpoint()
    cut
      .selectExpr(idCol, "h",
        s"""explode(array_distinct(transform(sequence($w, n), q ->
           |  array_max(filter(sequence(q - ${w - 1}, q), p ->
           |    element_at(h, p) = array_min(slice(h, q - ${w - 1}, $w))))))) AS p"""
          .stripMargin)
      .select(col(idCol), expr("element_at(h, p)").as("fph"))
      .distinct()
  }

  /**
   * Near-duplicate pairs by shared fingerprint count. Buckets outside
   * [minBucket, maxBucket] are dropped before the pair join — the same
   * hot-bucket cap as the LSH band join (a fingerprint shared by every
   * boilerplate page pairs quadratically and ranks nothing useful).
   */
  def sharedPairs(
      fp: DataFrame,
      idCol: String,
      minBucket: Int = 2,
      maxBucket: Int = 50): DataFrame = {
    // One materialization feeds all three references (bucket counts +
    // both join sides); without it each reference recomputes the scan.
    val f = fp.localCheckpoint()
    val bkt = f.groupBy("fph").count()
      .filter(col("count").between(minBucket, maxBucket))
      .select("fph")
    val a = f.select(col(idCol).as("da"), col("fph"))
    val b = f.select(col(idCol).as("db"), col("fph").as("fphb"))
    a.join(bkt, Seq("fph"))
      .join(b, col("fph") === col("fphb") && col("db") > col("da"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("shared"))
  }
}
