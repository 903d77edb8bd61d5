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
 * Execution notes. The per-document hash+selection runs as ONE native
 * Catalyst expression (`winnow_fingerprints`, TextKernels) — a tight
 * single-pass kernel with a reused md5 digest. The equivalent SQL
 * higher-order-function spelling is not just slower (~50x interpreted
 * lambda dispatch): it is a planner hazard — CollapseProject inlines the
 * gram-hash transform into every nested-lambda reference, and the
 * downstream self-join's inferred `isnotnull(fingerprint)` predicate gets
 * pushed below any exchange and rewritten back to the defining expression,
 * turning a filter into O(n^2 * w) md5 evaluations per document per CTE
 * reference. An opaque expression has neither failure mode.
 *
 * The localCheckpoint in [[sharedPairs]] is still load-bearing: the
 * fingerprint relation feeds three consumers (bucket counts + both join
 * sides), and materializing it once is also the right 100-TB plan —
 * fingerprints are the reusable artifact, like persisted LSH bands.
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
    TextRegistry.register(docs.sparkSession)
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= k + w - 1)
      .select(col(idCol),
        explode(expr(s"winnow_fingerprints($textCol, $k, $w)")).as("fph"))
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
    // widenIfNarrow: the bucket self-join fans out quadratically per
    // bucket — never run it above a 1-partition checkpoint.
    val f = PlanUtil.widenIfNarrow(fp.localCheckpoint())
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
