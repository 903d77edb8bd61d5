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

  /**
   * Deterministic weighted sampling without replacement (Efraimidis &
   * Spirakis 2006 A-ES): each row gets key u^(1/w) with u an md5-derived
   * uniform of the id — the top-n keys ARE a weighted sample, computed
   * without RNG state so the same rows win on every engine, run, and
   * partitioning. The top-n is a TakeOrdered (per-partition heaps + driver
   * merge of n·P candidates), not a global sort — at 100 TB the cost is
   * one scan. Rows with null or non-positive weights are excluded (A-ES
   * requires w > 0; a negative w would flip the exponent and always win).
   */
  def weightedSampleN(df: DataFrame, idCol: String, weightCol: String, n: Int): DataFrame = {
    // 2^60 is exactly representable; u = first 60 md5 bits / 2^60 in [0,1)
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976L).cast("double")
    df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("sample_key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(n)
  }

  /**
   * Deterministic mixture UPSAMPLING: per-source weights may exceed 1 —
   * a document with weight w appears floor(w) times plus one more for the
   * md5-bucket fraction of docs (so expectation is exactly w, and the SAME
   * docs get the extra epoch on every engine/run). The multi-epoch
   * counterpart of [[mixture]] (which only downsamples): "2.5 epochs of
   * curated, 0.5 of web" in one pass. Output = input rows replicated with
   * a `copy` index (1-based); weight <= 0 or absent source drops the doc.
   */
  def upsample(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    val w = weights.foldLeft(lit(0.0)) { case (acc, (s, wt)) =>
      when(col(sourceCol) === s, lit(wt)).otherwise(acc)
    }
    val reps = (floor(w) +
      when(hashBucket(col(keyCol)) < round((w - floor(w)) * 1000).cast("long"), 1L)
        .otherwise(0L)).cast("int")
    df.withColumn("__reps", reps)
      .filter(col("__reps") >= 1) // sequence(1, 0) would generate DESCENDING
      .withColumn("copy", explode(sequence(lit(1), col("__reps"))))
      .drop("__reps")
  }

  /** Corpus composition report per group: doc/token/char totals and mean
    * quality — one partial-aggregating scan (the kernels are codegen
    * expressions, the agg is map-side-combined). */
  def stats(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    // avg_quality is the exact half-up 6-decimal mean of the integer
    // deciscore (= mean qualityScore): no double on the emission path
    df.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        sum(TextAnalysis.qualityDeciscore(col(textCol))).as("__sd"))
      .withColumn("avg_quality", TextAnalysis.exactRatio6("__sd", "10 * n_docs"))
      .drop("__sd")

  // ------------------------------------------------------------ PII scrub

  /** Shared Java/RE2 regex subset (Spark and DuckDB agree on these). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{1,3}[ -]\\d{3}[ -]\\d{4}"

  /**
   * Redact PII spans (emails, then IPv4s, then phone-shaped numbers) with
   * typed placeholders — the standard scrub step before a corpus is
   * trainable. Pure codegen regexp_replace chain: no shuffle, no UDF; at
   * 100 TB this is one scan fused into whatever else the pass projects.
   */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-kind PII hit counts on the ORIGINAL text (audit columns). */
  def piiCounts(text: Column): (Column, Column, Column) = (
    regexp_count(text, lit(EmailRe)).cast("long"),
    regexp_count(text, lit(Ipv4Re)).cast("long"),
    regexp_count(text, lit(PhoneRe)).cast("long"))

  // ------------------------------------------------- boilerplate removal

  /**
   * Remove boilerplate lines (CCNet-style curation): a line that appears
   * in more than `maxDocFrac` of documents is template chrome (footers,
   * nav, cookie banners), not content — drop it everywhere and reassemble
   * the documents in original line order. Blank lines are never counted
   * as boilerplate (they carry structure, not duplication).
   *
   * Scale shape: explode once; the line document-frequency aggregation
   * map-side combines; the boilerplate set is inherently small (at most
   * totalLines/(maxDocFrac*nDocs) distinct lines qualify) so the removal
   * join broadcasts; one final shuffle on the doc id rebuilds the text.
   * Docs whose every line was boilerplate come back as empty strings,
   * not dropped rows.
   */
  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFrac: Double,
      outCol: String = "clean_text"): DataFrame = {
    val id = col(idCol)
    val lines = df.select(id,
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val boiler = lines.filter(trim(col("__line")) =!= "")
      .groupBy(col("__line")).agg(countDistinct(id).as("__df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__df") > col("__n") * maxDocFrac)
      .select(col("__line"))
    val kept = lines.join(broadcast(boiler), Seq("__line"), "left_anti")
    val rebuilt = kept.groupBy(id).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")),
        "\n").as(outCol))
    df.select(id).join(rebuilt, Seq(idCol), "left").na.fill("", Seq(outCol))
  }

  /**
   * C4-style line filtering (Raffel et al. 2020 §2.2, public heuristics):
   * keep only lines that end in terminal punctuation, have at least
   * `minWords` words, and contain none of the chrome markers ("lorem
   * ipsum", "javascript", "{"). A pure per-row expression — split, lambda
   * filter, rejoin — so it runs inside one codegen'd scan with no shuffle
   * and is streaming-safe.
   */
  def c4CleanText(text: Column, minWords: Int = 3): Column = {
    val kept = filter(split(text, "\n"), l => {
      val t = trim(l)
      size(filter(split(t, "\\s+"), w => w =!= "")) >= minWords &&
        t.rlike("[.!?\"]$") &&
        !lower(t).contains("lorem ipsum") &&
        !lower(t).contains("javascript") &&
        !t.contains("{")
    })
    array_join(kept, "\n")
  }

  /**
   * Cross-document paragraph-level exact dedup, keep-first: a paragraph
   * survives only at its earliest occurrence (min (id, position) over the
   * whole corpus — also dedups repeats within a document); surviving
   * paragraphs reassemble in original order, fully-deduped docs come back
   * as empty strings, not dropped rows.
   *
   * Scale shape: one explode; one shuffle grouping on the paragraph text
   * (map-side combinable min); winners join back on the same key (no
   * second shuffle of the big side under AQE); one final shuffle on the
   * doc id to rebuild. The quadratic all-pairs comparison a naive dedup
   * implies never materializes.
   */
  def paragraphDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n\n",
      outCol: String = "dedup_text"): DataFrame = {
    val id = col(idCol)
    val paras = df.select(id,
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
      .filter(trim(col("__para")) =!= "")
    val winners = paras.groupBy(col("__para"))
      .agg(min(struct(id.as("__wid"), col("__pos").as("__wpos"))).as("__w"))
    val kept = paras.join(winners, Seq("__para"))
      .filter(id === col("__w.__wid") && col("__pos") === col("__w.__wpos"))
    val rebuilt = kept.groupBy(id).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__para")))),
          x => x.getField("__para")),
        sep).as(outCol),
      count(lit(1)).as("n_kept"))
    df.select(id).join(rebuilt, Seq(idCol), "left")
      .na.fill("", Seq(outCol)).na.fill(0L, Seq("n_kept"))
  }

  // ------------------------------------------- chunking & sequence packing

  /**
   * Split documents into fixed-size token chunks with overlap (the
   * context-window sharding step before tokenization/training): chunk k
   * covers tokens [k*(size-overlap), k*(size-overlap)+size). One explode,
   * no shuffle — each task chunks its own rows; emits (.., chunk_id,
   * chunk_text, n_chunk_tokens).
   */
  def chunkTokens(
      df: DataFrame,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"bad overlap $overlap for chunk size $chunkSize")
    val stride = chunkSize - overlap
    // chunk k contributes new tokens iff k*stride+overlap < n (otherwise
    // it lies entirely inside chunk k-1 and would duplicate training
    // text); chunk 0 always exists => maxK = max(0, ceil((n-overlap)/stride)-1)
    df.withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .filter(trim(col(textCol)) =!= "")
      .withColumn("chunk_id",
        explode(sequence(lit(0),
          greatest(lit(0),
            floor((size(col("__toks")) - overlap - 1).cast("double") / stride)
              .cast("int")))))
      .withColumn("__slice",
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize)))
      .withColumn("chunk_text", array_join(col("__slice"), " "))
      .withColumn("n_chunk_tokens", size(col("__slice")).cast("bigint"))
      .drop("__toks", "__slice")
  }

  /**
   * Contiguous token-offset sharding: documents (in deterministic id
   * order within each group) are laid out on a token axis and assigned
   * to the shard where they START — shard = floor(cumTokensBefore /
   * budget). This is the concatenate-then-split assignment a sequence-
   * packing pipeline uses: a shard can run over the budget by less than
   * one document (the straddler belongs to the shard it starts in), so
   * budget is a target, not a hard cap. The window partitions by
   * `groupCol`, so packing parallelizes across groups (at 100 TB: pack
   * per source/date partition, never a global sort).
   */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      budget: Int): DataFrame = {
    val nTok = size(split(trim(col(textCol)), "\\s+")).cast("bigint")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
    df.withColumn("n_tokens", nTok)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        floor((col("__cum") - col("n_tokens")).cast("double") / budget).cast("int"))
      .drop("__cum")
  }

  // ------------------------------------------------------ shard assignment

  /**
   * Deterministic training-shard assignment: shard = md5 bucket of the
   * id mod `nShards`. A pure codegen projection — no sort, no shuffle,
   * no RNG state — yet statistically uniform and decorrelated from ingest
   * order (the "global shuffle" a training run needs). Reproducible:
   * the same doc lands in the same shard on every engine and rerun; at
   * write time the column becomes `partitionBy("shard")`.
   */
  def assignShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    df.withColumn("shard",
      (conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
        .cast("long") % nShards).cast("int"))

  // ------------------------------------------------------ snapshot diff

  /**
   * Corpus snapshot diff by content hash — the bookkeeping step of
   * incremental ingestion (what changed between yesterday's crawl and
   * today's): full outer join on the id, rows labeled added / removed /
   * changed / unchanged. One shuffle on the id (or zero with both
   * snapshots bucketed by id, the layout an incremental pipeline would
   * persist anyway); hashes compare constant-size digests, not texts.
   */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("__oldh"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("__newh"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__oldh").isNull, lit("added"))
          .when(col("__newh").isNull, lit("removed"))
          .when(col("__oldh") =!= col("__newh"), lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__oldh", "__newh")
  }

  // --------------------------------------------------- stratified sampling

  /**
   * Exact-n deterministic stratified sample: the n rows with the smallest
   * md5(key) per stratum (ties impossible in practice, pinned by key
   * anyway). Reproducible across runs/partitionings/engines like
   * sampleDeterministic, but with an exact per-stratum count.
   *
   * Scale shape: the numeric value of the first 15 md5 hex digits is
   * MONOTONE in the rank key (hex chars sort lexicographically like their
   * digits), so rows above the `slack*n/cnt` quantile of that prefix can
   * never rank in the top n — each stratum's window sorts only ~slack*n
   * survivor rows instead of the whole stratum. Strata whose prune
   * retained fewer than n rows (possible only for tiny or wildly skewed
   * strata) fall back to ranking all their rows, so the result is
   * identical to the unpruned window in every case.
   */
  def stratifiedSampleN(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      n: Int,
      slack: Int = 8): DataFrame = {
    val outCols = df.columns.map(col).toSeq
    val PrefixMax = 1152921504606846976L // 16^15
    val b = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
    val thr = least(lit(PrefixMax),
      ceil(lit(PrefixMax.toDouble) * slack * n / col("__cnt")).cast("long"))
    // pruned is ~slack*n rows per stratum and feeds both the per-stratum
    // feasibility count and the kept branch — inlined, each reference
    // re-ran the corpus scan + join. Materialize the small survivor set.
    val pruned = df.join(broadcast(counts), Seq(strataCol)).filter(b < thr)
      .localCheckpoint()
    val ok = pruned.groupBy(col(strataCol)).agg(count(lit(1)).as("__c2"))
      .filter(col("__c2") >= n).select(col(strataCol))
    val safe = pruned.join(broadcast(ok), Seq(strataCol)).select(outCols: _*)
    val rest = df.join(broadcast(ok), Seq(strataCol), "left_anti").select(outCols: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    safe.unionAll(rest)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /**
   * Blocklist-word density (the C4 "bad words" filter step): per document,
   * token count, blocklisted-token count, density, and the keep flag.
   *
   * Distributed shape: one tokenizing explode, then a LEFT join against
   * the BROADCAST word list on the token — never a regexp alternation over
   * the list (which would defeat codegen and scale linearly in list size
   * per row) and never a shuffle of the corpus on the token. Documents
   * with zero tokens are dropped by the tokenizer (no denominator).
   * Tokenization matches the q230 retrieval family: lowercase, split on
   * non-letters, empties discarded.
   */
  def blocklistStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      words: Seq[String],
      maxRatio: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bl = broadcast(words.toDF("tok").withColumn("__flag", lit(1L)))
    df.select(col(idCol), explode(split(lower(col(textCol)), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "")
      .join(bl, Seq("tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__flag"), lit(0L))).as("n_flagged"))
      .withColumn("flag_ratio",
        round(col("n_flagged").cast("double") / col("n_tokens"), 6) + lit(0.0))
      .withColumn("keep", col("flag_ratio") <= maxRatio)
  }
}
