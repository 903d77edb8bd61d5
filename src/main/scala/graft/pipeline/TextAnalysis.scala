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

  /**
   * Integer deci-unit quality score (qualityScore * 10, 0..10): every
   * weight is a whole deci-unit, so aggregate means over this column can
   * use exact integer arithmetic end to end — no float on the emission
   * path (the round(avg(double)) boundary-flip class). Band comparisons
   * are on correctly-rounded double ratios, identical in every IEEE
   * engine.
   */
  def qualityDeciscore(text: Column): Column = {
    val st = stats(text)
    val nChars = length(text).cast("double")
    val words = st.getField("n_tokens").cast("double")
    val meanWordLen = when(words > 0, nChars / words).otherwise(lit(0.0))
    val punct = st.getField("n_punct").cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val upper = st.getField("n_upper").cast("double")
    val upperRatio = when(nChars > 0, upper / nChars).otherwise(lit(0.0))

    val wordScore = when(words >= 50 && words <= 100000, lit(4L))
      .when(words >= 10, lit(2L)).otherwise(lit(0L))
    val lenScore = when(meanWordLen >= 3 && meanWordLen <= 10, lit(2L)).otherwise(lit(1L))
    val punctScore = when(punctRatio <= 0.1, lit(2L)).otherwise(lit(1L))
    val upperScore = when(upperRatio <= 0.3, lit(2L)).otherwise(lit(1L))
    wordScore + lenScore + punctScore + upperScore
  }

  /** Exact half-up 6-decimal ratio of two non-negative integer SQL
    * expressions, emitted as double, for DataFrame-side emissions.
    *
    * The single-shot macro `(2n*10^6 + d) div (2d)` is exact only while
    * its dividend stays under 2^53 (the `/` is a double division in every
    * engine) — n < ~4.5e9, violated by corpus-scale counts/sums at 100 TB.
    * This form peels the x10^6 scaling into three x100 steps with exact
    * integer remainders (the q390_lorenz fix pattern): every dividend is
    * an exact multiple q*d with q <= 100*max(1, n/d), so for ratios <= 1
    * it is exact while d < 2^53/100 (~9e13) — 4 orders of magnitude more
    * headroom, enough for 10^12-document corpora. */
  private[pipeline] def exactRatio6(n: String, d: String): Column = {
    val dd = s"($d)"
    val t1 = s"(($n) * 100)"
    val r1 = s"($t1 % $dd)"
    val q1 = s"cast(($t1 - $r1) / $dd as bigint)"
    val t2 = s"($r1 * 100)"
    val r2 = s"($t2 % $dd)"
    val q2 = s"cast(($t2 - $r2) / $dd as bigint)"
    val t3 = s"($r2 * 100)"
    val r3 = s"($t3 % $dd)"
    val q3 = s"cast(($t3 - $r3) / $dd as bigint)"
    expr(s"(cast($q1 * 10000 + $q2 * 100 + $q3" +
      s" + (CASE WHEN 2 * $r3 >= $dd THEN 1 ELSE 0 END) as bigint)" +
      s" / cast(1000000 as double)) + 0.0")
  }

  /** Heuristic language id (stopword-profile Catalyst expression). */
  def langId(text: Column): Column = exprColumn(LangId(columnExpr(text)))

  /** Winnowing-style document fingerprint (rolling min-hash of char shingles). */
  def fingerprint(text: Column, shingleSize: Int = 8): Column =
    exprColumn(DocFingerprint(columnExpr(text), columnExpr(lit(shingleSize))))

  /**
   * Unigram language-model quality signal (the CCNet/Gopher "perplexity
   * filter" shape): train unigram counts on the corpus itself, then score
   * each document by its mean token log-probability
   * `mean_t ln(cnt(t)/N)`. Low scores = improbable token soup (spam,
   * encoding noise); high = fluent-for-this-corpus text.
   *
   * Scale shape: one explode, two aggregations (token counts map-side
   * combine; the per-doc fold shuffles on the doc id) and one join on the
   * token — the vocabulary is Zipf-bounded so at 100 TB it broadcasts.
   * Per-term contributions are rounded to 6 decimals and summed as
   * decimal(20,6), so the fold is ORDER-INDEPENDENT — the same score on
   * any partitioning or engine (oracle-exact despite the ln()).
   *
   * Output: (id, n_tokens, lp_mean).
   */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val terms = df.select(id,
        explode(split(trim(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
    val tc = terms.groupBy(id, col("__tok")).agg(count(lit(1)).as("__occ"))
    val vocab = tc.groupBy(col("__tok")).agg(sum(col("__occ")).as("__cnt"))
    val total = vocab.agg(sum(col("__cnt")).as("__n"))
    tc.join(vocab, "__tok")
      .groupBy(id)
      .agg(
        sum(round(col("__occ") * log(col("__cnt")), 6).cast("decimal(20,6)"))
          .as("__s"),
        sum(col("__occ")).as("n_tokens"))
      .crossJoin(broadcast(total))
      .withColumn("lp_mean",
        round(col("__s").cast("double") / col("n_tokens") - log(col("__n")), 4)
          + lit(0.0))
      .select(id, col("n_tokens"), col("lp_mean"))
  }

  /**
   * Interpolated bigram language-model scoring (Jelinek-Mercer smoothing,
   * the KenLM-lite quality signal): train bigram + unigram counts on the
   * corpus, then score each document by its mean bigram log-probability
   * `mean_i ln(lambda * c(w_{i-1} w_i)/c(w_{i-1}) + (1-lambda) * c(w_i)/N)`.
   * Catches word-salad text the unigram model ([[unigramLogProb]]) cannot:
   * plausible tokens in implausible order.
   *
   * Bigrams come from slicing the per-row token ARRAY and zipping adjacent
   * slices — one explode per document, no position window, no shuffle to
   * form pairs. Edge separators are trimmed before the split so the array
   * has no empty tokens and adjacency is exact. Both interpolation
   * divisions and the final sum are engine-pinned: int/int divisions and
   * the fixed `a*(x) + b*(y)` association are exactly-rounded IEEE ops,
   * ln() is rounded to 6 decimals and folded as decimal(20,6) — the score
   * is order-independent and cross-engine exact.
   *
   * Scale shape: one explode into (doc, w1, w2); count tables aggregate
   * with map-side partials; the scoring joins shuffle on the bigram/token
   * keys (Zipf-bounded tables — broadcastable at scale). Documents with
   * fewer than 2 tokens have no bigrams and are dropped.
   *
   * Output: (id, n_bigrams, lp2_mean).
   */
  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7): DataFrame = {
    val id = col(idCol)
    val arr = split(
      regexp_replace(lower(col(textCol)), "^[^a-z]+|[^a-z]+$", ""), "[^a-z]+")
    // docs feeds both the bigram explode and the unigram counts, and
    // bigrams feeds both the count table and the scoring join — inlined,
    // each reference re-ran the corpus scan + tokenize (census: 10
    // inlined scans). One tokenize pass, one zip-explode pass; uni is
    // Zipf-bounded and read three times (total + two key joins).
    val docs = df.select(id, arr.as("__arr"))
      .filter(size(col("__arr")) >= 2 && col("__arr").getItem(0) =!= "")
      .localCheckpoint()
    val bigrams = docs
      .withColumn("__a1", slice(col("__arr"), lit(1), size(col("__arr")) - 1))
      .withColumn("__a2", slice(col("__arr"), lit(2), size(col("__arr")) - 1))
      .select(id, explode(arrays_zip(col("__a1"), col("__a2"))).as("__z"))
      .select(id, col("__z.__a1").as("__w1"), col("__z.__a2").as("__w2"))
      .localCheckpoint()
    val uni = docs.select(explode(col("__arr")).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__cu"))
      .localCheckpoint()
    val total = uni.agg(sum(col("__cu")).as("__nn"))
    val big = bigrams.groupBy("__w1", "__w2").agg(count(lit(1)).as("__cb"))
    bigrams
      .join(big, Seq("__w1", "__w2"))
      .join(uni.select(col("__tok").as("__w1"), col("__cu").as("__c1")), Seq("__w1"))
      .join(uni.select(col("__tok").as("__w2"), col("__cu").as("__c2")), Seq("__w2"))
      .crossJoin(broadcast(total))
      .select(id,
        round(log(
          lit(lambda) * (col("__cb").cast("double") / col("__c1")) +
          lit(1.0 - lambda) * (col("__c2").cast("double") / col("__nn"))), 6)
          .cast("decimal(20,6)").as("__lp"))
      .groupBy(id)
      .agg(sum(col("__lp")).as("__s"), count(lit(1)).as("n_bigrams"))
      .withColumn("lp2_mean",
        round(col("__s").cast("double") / col("n_bigrams"), 4) + lit(0.0))
      .select(id, col("n_bigrams"), col("lp2_mean"))
  }

  /**
   * Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
   * Goodman 1999 — the smoothing KenLM defaults to): absolute-discount
   * the bigram MLE and back off to the CONTINUATION unigram — how many
   * distinct contexts a word follows, not how often it occurs — so
   * high-count-but-fixed-context words ("francisco") stop inflating
   * unseen-bigram mass the way Jelinek-Mercer ([[bigramLogProb]]) lets
   * them:
   *
   *   p(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
   *            + (D * N1+(w1,.)/c(w1)) * (N1+(.,w2)/N1+(.,.))
   *
   * All three N1+ tables fall out of the bigram-TYPE table `big` (one
   * groupBy each, Zipf-bounded, broadcastable); the same decimal-fold
   * discipline as [[bigramLogProb]] keeps the score order-independent
   * and cross-engine exact. Output: (id, n_bigrams, lpkn_mean).
   */
  def kneserNeyLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    val id = col(idCol)
    val arr = split(
      regexp_replace(lower(col(textCol)), "^[^a-z]+|[^a-z]+$", ""), "[^a-z]+")
    // same staging as bigramLogProb; big additionally feeds all three
    // continuation tables plus the scoring join (4 references).
    val docs = df.select(id, arr.as("__arr"))
      .filter(size(col("__arr")) >= 2 && col("__arr").getItem(0) =!= "")
      .localCheckpoint()
    val bigrams = docs
      .withColumn("__a1", slice(col("__arr"), lit(1), size(col("__arr")) - 1))
      .withColumn("__a2", slice(col("__arr"), lit(2), size(col("__arr")) - 1))
      .select(id, explode(arrays_zip(col("__a1"), col("__a2"))).as("__z"))
      .select(id, col("__z.__a1").as("__w1"), col("__z.__a2").as("__w2"))
      .localCheckpoint()
    val uni = docs.select(explode(col("__arr")).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__cu"))
    val big = bigrams.groupBy("__w1", "__w2").agg(count(lit(1)).as("__cb"))
      .localCheckpoint()
    // continuation statistics: each `big` row is one bigram TYPE
    val fert = big.groupBy("__w1").agg(count(lit(1)).as("__n1f"))   // N1+(w1,.)
    val cont = big.groupBy("__w2").agg(count(lit(1)).as("__n1p"))   // N1+(.,w2)
    val types = big.agg(count(lit(1)).as("__npp"))                  // N1+(.,.)
    bigrams
      .join(big, Seq("__w1", "__w2"))
      .join(uni.select(col("__tok").as("__w1"), col("__cu").as("__c1")), Seq("__w1"))
      .join(fert, Seq("__w1"))
      .join(cont, Seq("__w2"))
      .crossJoin(broadcast(types))
      .select(id,
        round(log(
          greatest(col("__cb").cast("double") - lit(discount), lit(0.0)) / col("__c1") +
          (lit(discount) * col("__n1f").cast("double") / col("__c1")) *
            (col("__n1p").cast("double") / col("__npp"))), 6)
          .cast("decimal(20,6)").as("__lp"))
      .groupBy(id)
      .agg(sum(col("__lp")).as("__s"), count(lit(1)).as("n_bigrams"))
      .withColumn("lpkn_mean",
        round(col("__s").cast("double") / col("n_bigrams"), 4) + lit(0.0))
      .select(id, col("n_bigrams"), col("lpkn_mean"))
  }

  /**
   * Gopher quality-filter signals (Rae et al. 2021, Table A1 — public
   * heuristics): word-count band, mean-word-length band, symbol-to-word
   * ratio, bullet-line / ellipsis-line fractions, stopword presence,
   * alphabetic-word fraction, and the combined pass flag. One pure
   * expression tree over the text column — single codegen'd scan, no
   * shuffle, streaming-safe, closed-form (DuckDB-reproducible). Ratios
   * round to 6 decimals.
   */
  def gopherFlags(text: Column): Column = {
    val words = filter(split(trim(text), "\\s+"), w => w =!= "")
    val nWords = size(words).cast("long")
    val totalLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val meanLen = round(totalLen.cast("double") / nWords, 6)
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses = (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val symbolRatio = round((hashes + ellipses).cast("double") / nWords, 6)
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("\\.\\.\\.$")))
    val bulletFrac = round(bulletLines.cast("double") / nLines, 6)
    val ellipsisFrac = round(ellipsisLines.cast("double") / nLines, 6)
    val lower_ = transform(words, w => lower(w))
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = stops.map(s => when(array_contains(lower_, s), 1).otherwise(0))
      .reduce(_ + _).cast("int")
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]")))
    val alphaFrac = round(alphaWords.cast("double") / nWords, 6)
    val pass = nWords.between(50L, 100000L) && meanLen.between(3.0, 10.0) &&
      symbolRatio < 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      stopHits >= 2 && alphaFrac > 0.8
    struct(
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), stopHits.as("stopword_hits"),
      alphaFrac.as("alpha_frac"), pass.as("pass"))
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, public formulation):
   * per-document mean log-likelihood ratio of a target-corpus unigram LM
   * over the raw-pool LM, with hashed-feature buckets (md5-derived, so
   * the weights are engine-reproducible) and add-one smoothing. Documents
   * that "look like" the target distribution score high — the importance-
   * resampling signal for domain-targeted pretraining data selection.
   *
   * Scale shape: tokenize once; both LMs come from ONE aggregation over
   * the bucketed tokens (target counts via a conditional sum) —
   * `buckets` rows, broadcast back; per-doc contributions round to 6
   * decimals and sum as decimal (order-independent, hash-exact).
   */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    val id = col(idCol)
    val toks = df.select(id, isTarget.as("__tgt"),
        explode(split(trim(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(id, col("__tgt"),
        pmod(exprColumn(Md5Hash60(columnExpr(col("__tok")))), lit(buckets.toLong)).as("__b"))
    val perDoc = toks.groupBy(id, col("__b")).agg(count(lit(1)).as("__occ"))
    val lm = toks.groupBy(col("__b")).agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"),
      count(lit(1)).as("__rc"))
    val totals = lm.agg(sum(col("__tc")).as("__nt"), sum(col("__rc")).as("__nr"))
    perDoc.join(broadcast(lm), Seq("__b"))
      .crossJoin(broadcast(totals))
      .groupBy(id)
      .agg(
        sum(round(col("__occ") *
            (log(col("__tc") + 1) - log(col("__nt") + buckets) -
             log(col("__rc") + 1) + log(col("__nr") + buckets)), 6)
          .cast("decimal(24,6)")).as("__s"),
        sum(col("__occ")).as("n_tokens"))
      // exact half-up scaled-integer ratio (round-8 float discipline,
      // sign-split for negative log-ratio sums) — mirrors the oracle SQL
      // term for term so no round(double) sits on the emitted value
      .withColumn("__si",
        when(col("__s") >= 0, (col("__s") * 1000000).cast("long"))
          .otherwise(((-col("__s")) * 1000000).cast("long")))
      .withColumn("__d", col("n_tokens") * 100L)
      .withColumn("__q",
        (((col("__si") * 2 + col("__d")) -
          ((col("__si") * 2 + col("__d")) % (col("__d") * 2))) /
          (col("__d") * 2)).cast("long"))
      .withColumn("dsir_weight",
        (when(col("__s") >= 0, col("__q")).otherwise(-col("__q"))
          .cast("double") / 10000.0) + lit(0.0))
      .select(id, col("n_tokens"), col("dsir_weight"))
  }

  /**
   * Out-of-vocabulary rate against the corpus' own top-`vocabSize`
   * tokens (ties broken by token text, so the vocabulary is
   * deterministic): the tokenizer-fit signal — docs with high OOV under
   * the working vocabulary are encoding noise or the wrong language.
   * The vocabulary is top-k-bounded, so the membership join broadcasts.
   * Output: (id, n_tokens, n_oov, oov_rate).
   */
  def oovRate(df: DataFrame, idCol: String, textCol: String, vocabSize: Int): DataFrame = {
    val id = col(idCol)
    val terms = df.select(id,
        explode(split(trim(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
    val vocab = terms.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
      .orderBy(desc("__cnt"), col("__tok")).limit(vocabSize)
      .select(col("__tok"), lit(1).as("__in"))
    terms.join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(id)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6) + lit(0.0))
  }

  /**
   * Token-distribution drift between two corpus snapshots, per group:
   * KL(new || old) with add-one smoothing over the joint vocabulary —
   * the monitoring signal that a source's content shifted between
   * crawls. p(t) = (cnt(t)+1)/(N+V); per-term contributions round to 8
   * decimals and sum as decimal(24,8) (order-independent, hash-exact
   * cross-engine). Shuffles on (group, token) with map-side combine;
   * output one row per group: (group, n_old_tokens, n_new_tokens,
   * joint_vocab, kl_divergence).
   */
  def tokenDrift(
      oldDf: DataFrame,
      newDf: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    def counts(df: DataFrame, cName: String) =
      df.select(col(groupCol), explode(split(trim(col(textCol)), "\\s+")).as("__tok"))
        .filter(col("__tok") =!= "")
        .groupBy(col(groupCol), col("__tok"))
        .agg(count(lit(1)).as(cName))
    val joint = counts(oldDf, "__co").join(counts(newDf, "__cn"),
        Seq(groupCol, "__tok"), "full_outer")
      .na.fill(0L, Seq("__co", "__cn"))
    val totals = joint.groupBy(col(groupCol)).agg(
      sum(col("__co")).as("n_old_tokens"),
      sum(col("__cn")).as("n_new_tokens"),
      count(lit(1)).as("joint_vocab"))
    joint.join(broadcast(totals), Seq(groupCol))
      .withColumn("__po",
        (col("__co") + 1).cast("double") / (col("n_old_tokens") + col("joint_vocab")))
      .withColumn("__pn",
        (col("__cn") + 1).cast("double") / (col("n_new_tokens") + col("joint_vocab")))
      .withColumn("__term",
        round(col("__pn") * log(col("__pn") / col("__po")), 8).cast("decimal(24,8)"))
      .groupBy(col(groupCol))
      .agg(first(col("n_old_tokens")).as("n_old_tokens"),
        first(col("n_new_tokens")).as("n_new_tokens"),
        first(col("joint_vocab")).as("joint_vocab"),
        (round(sum(col("__term")).cast("double"), 6) + lit(0.0)).as("kl_divergence"))
  }

  /**
   * Per-source corpus health report — the monitoring dashboard a
   * curation pipeline publishes after every ingest: volume, mean quality
   * score, majority language (deterministic tie-break), and exact-dup
   * fraction, in two aggregations + one tiny argmax window. Every signal
   * is an already-oracled kernel, so the whole report is hash-exact.
   */
  def healthReport(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val src = col(sourceCol)
    // avg_quality and dup_frac are small-denominator integer ratios —
    // emitted via the exact half-up scaled-integer macro, never through
    // round(<double>) (the q676 boundary-flip class)
    val base = df.groupBy(src).agg(
        count(lit(1)).as("n_docs"),
        sum(qualityDeciscore(col(textCol))).as("__sd"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
      .withColumn("avg_quality", exactRatio6("__sd", "10 * n_docs"))
      .select(src, col("n_docs"), col("avg_quality"), col("n_tokens"))
    val topLang = df.groupBy(src, langId(col(textCol)).as("top_lang"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(src)
          .orderBy(desc("__c"), col("top_lang"))))
      .filter(col("__rn") === 1).select(src, col("top_lang"))
    val dupFrac = df.groupBy(src).agg(
        count(lit(1)).as("__n"),
        countDistinct(col(textCol)).as("__nd"))
      .withColumn("dup_frac", exactRatio6("__n - __nd", "__n"))
      .select(src, col("dup_frac"))
    base.join(topLang, Seq(sourceCol)).join(dupFrac, Seq(sourceCol))
  }

  /** The same computation as portable SQL (shared by tests/oracles). */
  def unigramLogProbSql(table: String, idCol: String, textCol: String): String =
    s"""SELECT $idCol, n_tokens,
       |  round(cast(s as double) / n_tokens -
       |        ln((SELECT cast(sum(__cnt) as double) FROM (
       |              SELECT count(*) AS __cnt FROM (
       |                SELECT unnest(regexp_extract_all(trim($textCol), '\\S+')) AS tok
       |                FROM $table) GROUP BY tok))), 4) + 0.0 AS lp_mean
       |FROM (
       |  SELECT $idCol,
       |    sum(cast(round(occ * ln(cnt), 6) as decimal(20,6))) AS s,
       |    cast(sum(occ) as bigint) AS n_tokens
       |  FROM (
       |    SELECT tc.$idCol, tc.occ, v.cnt
       |    FROM (SELECT $idCol, tok, count(*) AS occ FROM (
       |            SELECT $idCol, unnest(regexp_extract_all(trim($textCol), '\\S+')) AS tok
       |            FROM $table) GROUP BY $idCol, tok) tc
       |    JOIN (SELECT tok, count(*) AS cnt FROM (
       |            SELECT unnest(regexp_extract_all(trim($textCol), '\\S+')) AS tok
       |            FROM $table) GROUP BY tok) v USING (tok))
       |  GROUP BY $idCol)""".stripMargin

  /** Per-document analysis frame: one call producing all text metrics. */
  /**
   * Per-document top-k terms by TF-IDF.
   *
   * tf = term occurrences / document token count; idf = ln(N / df) with
   * N = corpus size and df = number of documents containing the term.
   * Ranking happens on the score ROUNDED to 6 decimals (ties broken by
   * term) so the ordering is reproducible across engines and libm
   * implementations.
   *
   * Distributed shape: one explode; (doc, term) counts with map-side
   * partials; document frequency via a second aggregation over the
   * deduped (doc, term) set joined back (a count-over-term window would
   * funnel a stopword-like hot term into ONE unsplittable task — a join
   * partition AQE can skew-split); doc length via a window over the doc
   * (document size is bounded); then one top-k window. No driver
   * materialization — the corpus size N enters the plan as a broadcast
   * scalar, not an eager count. Tokenization matches
   * [[Dedup.ngramDupStats]] (trim, whitespace split, case-sensitive).
   */
  def tfIdfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = broadcast(df.select(count(lit(1)).cast("double").as("__N")))
    val terms = df.select(
        col(idCol).as("doc_id"),
        explode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("occ"))
    val termDf = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val withStats = terms.join(termDf, Seq("term"))
      .withColumn("doc_len", sum(col("occ")).over(Window.partitionBy(col("doc_id"))))
      .crossJoin(nDocs)
    val scored = withStats.withColumn("tfidf",
      round((col("occ").cast("double") / col("doc_len")) *
        log(col("__N") / col("df")), 6) + lit(0.0))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term").asc)).cast("int"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
  }

  /**
   * Per-document lexical-diversity profile: token Shannon entropy (nats),
   * vocabulary size, type-token ratio, hapax-legomenon count — the standard
   * repetitiveness signals a curation pipeline thresholds on (low entropy =
   * boilerplate/spam, TTR near 0 = keyword stuffing).
   *
   * Exactness: entropy = ln(m) - (Σ c·ln c)/m over per-token counts c.
   * The Σ folds ROUNDED decimal terms (round(c·ln c, 9) as decimal) so the
   * sum is order-independent and bit-identical across engines regardless of
   * aggregation order — the same trick as [[unigramLogProb]].
   *
   * Scale shape: explode to (doc, token) with map-side combine into
   * (doc, token, c), then one aggregation per doc; no window, no driver
   * state. Docs with zero tokens produce no row (same on the SQL oracle).
   */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")).as("__t"))
    val counts = toks.groupBy(col("doc_id"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col("doc_id"))
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(round(col("__c").cast("double") * log(col("__c").cast("double")), 9)
          .cast("decimal(38,9)")).as("__fold"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("vocab"),
        col("hapax"),
        (round(col("vocab").cast("double") / col("n_tokens"), 6) + lit(0.0)).as("ttr"),
        (round(log(col("n_tokens").cast("double")) -
          col("__fold").cast("double") / col("n_tokens"), 6) + lit(0.0)).as("entropy"))
  }

  /**
   * Deterministic top-`size` vocabulary: tokens ranked by (count DESC,
   * token ASC), ids 1-based; the numericalization table every tokenizer
   * pipeline needs. The heavy part (token counting) map-side combines;
   * the final rank runs on the `size`-bounded survivor set.
   */
  def buildVocab(df: DataFrame, textCol: String, size: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // top-size via TakeOrdered, then rank the tiny survivor set
    counts.orderBy(col("cnt").desc, col("token")).limit(size)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("int"))
  }

  /**
   * Encode documents as token-id sequences against a vocabulary
   * (OOV => -1): explode to (doc, pos, token), broadcast-join the vocab,
   * reassemble in position order. Returns (doc_id, ids array<int>).
   * Docs with zero tokens produce no row.
   */
  def encodeIds(df: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""))
          .as(Seq("pos", "token")))
    toks.join(broadcast(vocab.select(col("token"), col("token_id"))), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), coalesce(col("token_id"), lit(-1)).as("tid")))),
        x => x.getField("tid")).as("ids"))
  }

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
