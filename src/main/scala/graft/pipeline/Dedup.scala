package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.internal.{columnExpr, exprColumn}

/**
 * Distributed deduplication operators for training-data pipelines
 * (BASELINE.json capability extension; no reference counterpart).
 *
 * Every operator is a declarative DataFrame pipeline — shuffles happen only
 * on the grouping keys Catalyst sees (hash of content, LSH band buckets),
 * map-side partial aggregation applies, and nothing is collected to the
 * driver, so each scales to 100 TB inputs given enough executors:
 *  - exact: one shuffle on the content hash.
 *  - minhashLsh: explode to (band, bucket) keys — self-join happens only
 *    WITHIN tiny buckets (the LSH guarantee), never a cross join.
 *  - simhashDup: 4x16-bit chunk bucketing => candidate pairs at Hamming
 *    distance <= 3 are guaranteed to share >= 1 chunk (pigeonhole).
 */
object Dedup {

  /**
   * Exact dedup on a content column: keeps the row with the smallest `idCol`
   * per distinct content (deterministic representative).
   */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(contentCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Streaming exact dedup for ingest pipelines: drops rows whose content
   * was already seen, with state BOUNDED by the event-time watermark
   * (dropDuplicatesWithinWatermark). Keys on the content itself — same
   * exactness as batch [[exact]]; a hash key would make a 64-bit collision
   * silently drop a distinct document. State holds one content copy per
   * distinct document inside the watermark horizon.
   */
  def exactStreaming(
      df: DataFrame,
      contentCol: String,
      eventTimeCol: String,
      delay: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(contentCol)

  /**
   * Streaming near-dup ingest filter: drops documents whose SimHash
   * fingerprint was already seen inside the watermark horizon — catches
   * lightly-edited re-posts that exact dedup misses (same 64-bit
   * fingerprint <=> near-identical token multiset), with
   * watermark-bounded state of 8 bytes + key per distinct fingerprint.
   * Approximate by construction: a fingerprint collision drops a
   * distinct doc with probability ~2^-64 per pair.
   */
  def nearDupStreaming(
      df: DataFrame,
      textCol: String,
      eventTimeCol: String,
      delay: String): DataFrame =
    df.withColumn("__fp", exprColumn(SimHash64(columnExpr(col(textCol)))))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /**
   * Streaming MinHash-LSH near-dup ALARMS: the banded S-curve detector on
   * an unbounded document stream — catches Jaccard-similar documents with
   * moderate edits, which [[nearDupStreaming]]'s whole-fingerprint
   * equality cannot (SimHash equality ~ near-identical only). Emits one
   * row per (incoming doc, colliding band) naming the bucket's first-seen
   * doc; a doc absent from the alarm stream collided in NO band. Alarms
   * are CANDIDATES at the LSH S-curve's precision (1-(1-s^r)^b over true
   * Jaccard s) — route them to exact verification against the corpus;
   * clean docs pass with zero extra cost.
   *
   * State: (first id, last-seen ms) per occupied (band, bucket) — bytes
   * per bucket, map-side bounded, evicted by EventTimeTimeout once the
   * watermark passes last-seen + `horizonSecs` (the same bounded-horizon
   * contract as the watermarked exact dedup). Within a micro-batch,
   * first-seen is deterministic: rows order by (event time, id).
   */
  def lshStreamingAlarms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      eventTimeCol: String,
      delay: String,
      horizonSecs: Long,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val numHashes = bands * rowsPerBand
    val banded = df.withWatermark(eventTimeCol, delay)
      .select(
        col(idCol).cast("long").as("id"),
        col(eventTimeCol).as("ts"),
        exprColumn(MinHashSig(Seq(columnExpr(col(textCol)), columnExpr(lit(numHashes)),
          columnExpr(lit(shingleSize))))).as("sig"))
      .select(col("id"), col("ts"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
          .as(Seq("band", "bucket")))
      .select(col("bucket"), col("id"), col("ts"), col("band").cast("int").as("band"))
      .as[(Long, Long, java.sql.Timestamp, Int)]
    val horizonMs = horizonSecs * 1000L
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Int, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, rows, state: GroupState[(Long, Long)]) =>
          if (!rows.hasNext) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._2))
            var cur: Option[(Long, Long)] = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long)]
            sorted.foreach { case (_, id, ts, band) =>
              cur match {
                case None => cur = Some((id, ts.getTime))
                case Some((firstId, lastMs)) =>
                  if (id != firstId) out += ((id, firstId, band, ts.getTime / 1000))
                  cur = Some((firstId, math.max(lastMs, ts.getTime)))
              }
            }
            state.update(cur.get)
            state.setTimeoutTimestamp(
              math.max(cur.get._2 + horizonMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
      .toDF("id", "first_id", "band", "ts_sec")
  }

  /**
   * Streaming WINNOWING alarms: substring-overlap detection on an
   * unbounded stream — a doc sharing any >= k + w - 1-char passage with
   * an earlier doc collides on a winnowing fingerprint (the selection's
   * density guarantee, TextKernels.winnowFingerprints), which Jaccard-
   * style detectors miss when the shared passage is a small fraction of
   * both docs (copy-paste chunks, quoted boilerplate). Same state
   * contract as [[lshStreamingAlarms]]: (first id, last-seen ms) per
   * occupied fingerprint bucket, EventTimeTimeout-evicted once the
   * watermark passes last-seen + `horizonSecs`; emits one row per
   * (incoming doc, colliding fingerprint) naming the first-seen doc.
   */
  def winnowStreamingAlarms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      eventTimeCol: String,
      delay: String,
      horizonSecs: Long,
      k: Int = 8,
      w: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val keyed = df.withWatermark(eventTimeCol, delay)
      .select(
        col(idCol).cast("long").as("id"),
        col(eventTimeCol).as("ts"),
        explode(exprColumn(WinnowFingerprints(columnExpr(col(textCol)),
          columnExpr(lit(k)), columnExpr(lit(w))))).as("fph"))
      .select(col("fph"), col("id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    val horizonMs = horizonSecs * 1000L
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (fph, rows, state: GroupState[(Long, Long)]) =>
          if (!rows.hasNext) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._2))
            var cur: Option[(Long, Long)] = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
            sorted.foreach { case (_, id, ts) =>
              cur match {
                case None => cur = Some((id, ts.getTime))
                case Some((firstId, lastMs)) =>
                  if (id != firstId) out += ((id, firstId, fph, ts.getTime / 1000))
                  cur = Some((firstId, math.max(lastMs, ts.getTime)))
              }
            }
            state.update(cur.get)
            state.setTimeoutTimestamp(
              math.max(cur.get._2 + horizonMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
      .toDF("id", "first_id", "fph", "ts_sec")
  }

  /**
   * Incremental ingest dedup: keep only incoming docs whose content was
   * NOT in the historical corpus, then exact-dedup within the batch.
   * The bloom filter of historical digests prunes the probe scan BEFORE
   * the anti-join shuffles anything (q85's pattern in its real role);
   * false positives survive the prune and are removed by the exact
   * anti-join on the digest, so the result is exactly
   * "new distinct content".
   */
  def dedupAgainstHistory(
      incoming: DataFrame,
      history: DataFrame,
      idCol: String,
      contentCol: String): DataFrame = {
    // hist feeds both the bloom build and the exact anti-join, and withH
    // feeds both the miss and hit branches — inlined, each reference
    // re-ran its corpus scan (+ the md5/bloom probe for withH). One
    // materialized pass each (census q97: 12 -> 4 inlined scans).
    val hist = history.select(md5(col(contentCol)).as("__h")).distinct()
      .localCheckpoint()
    val words = Sketch.bloomBits(hist, "__h")
    val inCols = incoming.columns.map(col).toSeq
    // materialize ONE bloom verdict column (not two predicate copies);
    // null content hashes to null => verdict false => the row is
    // "not in history" and flows straight to the exact-dedup stage,
    // matching anti-join semantics (NULL never matches history)
    val withH = incoming.withColumn("__h", md5(col(contentCol)))
      .withColumn("__in_bloom",
        coalesce(Sketch.bloomContains(col("__h"), words), lit(false)))
      .localCheckpoint()
    // definitely-new rows (bloom miss) skip the join entirely; only
    // possible-members join against the historical digest set. Project
    // both branches back to the incoming schema — the using-join would
    // otherwise reorder columns under the positional union.
    val misses = withH.filter(!col("__in_bloom")).select(inCols: _*)
    val hits = withH.filter(col("__in_bloom"))
      .join(hist, Seq("__h"), "left_anti").select(inCols: _*)
    exact(misses.unionAll(hits), idCol, contentCol)
  }

  /** Group-by summary of exact duplicates: content hash -> group size + representative. */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(xxhash64(col(contentCol)).as("content_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("representative"))

  /**
   * MinHash + LSH near-duplicate pairs.
   *
   * numHashes = bands * rowsPerBand. Two docs collide in a band iff their
   * signatures agree on all rowsPerBand hashes of that band; collision
   * probability is the classic S-curve 1-(1-s^r)^b over true Jaccard s.
   * Candidates are verified with exact n-gram Jaccard >= `threshold`.
   *
   * Returns (id_a, id_b, jaccard) with id_a < id_b, one row per near-dup pair.
   */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand

    val sig = df.select(
      col(idCol).cast("long").as("id"),
      col(textCol).as("text"),
      exprColumn(MinHashSig(Seq(columnExpr(col(textCol)), columnExpr(lit(numHashes)),
        columnExpr(lit(shingleSize))))).as("sig"))

    // band bucket = hash of the band's slice of the signature. Only (id,
    // band, bucket) rides the LSH shuffle — replicating document text
    // x bands through the explode would make text bytes the dominant
    // shuffle cost at scale; text joins back once per side, candidates only.
    val banded = sig.select(
      col("id"),
      posexplode(
        // array of band-slices: transform over band indices
        expr(s"transform(sequence(0, ${bands - 1}), b -> " +
             s"xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "bucket")))

    // self-join within (band, bucket) — LSH keeps buckets tiny
    val a = banded.select($"band", $"bucket", $"id".as("id_a"))
    val b = banded.select($"band", $"bucket", $"id".as("id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct()

    val texts = sig.select($"id", $"text")
    candidates
      .join(texts.select($"id".as("id_a"), $"text".as("text_a")), "id_a")
      .join(texts.select($"id".as("id_b"), $"text".as("text_b")), "id_b")
      .withColumn("jaccard",
        exprColumn(NgramJaccard(Seq(columnExpr($"text_a"), columnExpr($"text_b"),
          columnExpr(lit(shingleSize))))))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /**
   * SimHash near-dup pairs: 64-bit simhash, bucketed by each of four 16-bit
   * chunks; pairs sharing a chunk are verified by exact Hamming distance.
   */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsImpl(df, idCol, textCol, maxHamming,
      c => SimHash64(c), chunkBits = 16)

  /** simhashPairs over the 60-bit md5 token hash (DuckDB-reproducible:
    * four 15-bit chunk buckets; same pigeonhole guarantee for hamming <= 3). */
  def simhashPairsMd5(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsImpl(df, idCol, textCol, maxHamming,
      c => SimHashMd5(c), chunkBits = 15)

  private def simhashPairsImpl(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      mkSim: org.apache.spark.sql.catalyst.expressions.Expression =>
        org.apache.spark.sql.catalyst.expressions.Expression,
      chunkBits: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mask = (1 << chunkBits) - 1
    val sim = df.select(
      col(idCol).cast("long").as("id"),
      exprColumn(mkSim(columnExpr(col(textCol)))).as("sim"))

    val chunked = sim.select(
      $"id", $"sim",
      posexplode(expr(
        s"transform(sequence(0, 3), c -> (shiftright(sim, c * $chunkBits) & $mask))"))
        .as(Seq("chunk", "bucket")))

    val a = chunked.select($"chunk", $"bucket", $"id".as("id_a"), $"sim".as("sim_a"))
    val b = chunked.select($"chunk", $"bucket", $"id".as("id_b"), $"sim".as("sim_b"))
    a.join(b, Seq("chunk", "bucket"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sim_a", $"sim_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
  }

  /**
   * Connected components over a near-duplicate pair list, via alternating
   * large-star / small-star (Kiveris et al., "Connected Components in
   * MapReduce and Beyond", SoCC '14). Each round is two shuffles (a
   * min-per-key aggregate and a distinct) over the shrinking edge set;
   * convergence is O(log n) rounds, so a 100 TB pair list needs ~a dozen
   * passes with no driver-side graph state. Lineage is truncated per round
   * with an eager localCheckpoint (swap for a reliable checkpoint dir on a
   * real cluster — the loop shape is unchanged).
   *
   * Returns one row per node that appears in `pairs`: (id, component),
   * where component is the smallest node id in the node's component.
   * Nodes absent from every pair are their own component — callers join
   * the full node list (see [[assignComponents]]).
   */
  def connectedComponents(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // canonical undirected edge set: lo < hi, no self-loops, no dups
    var edges = pairs
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter($"a" =!= $"b" && $"a".isNotNull && $"b".isNotNull)
      .select(least($"a", $"b").as("lo"), greatest($"a", $"b").as("hi"))
      .distinct()
      .localCheckpoint(true)

    // Once the (shrinking) edge set fits in the driver, a path-compressed
    // union-find finishes in one collect — star contraction halves the
    // graph per round, so this always triggers after O(log n) rounds, and
    // for post-LSH dedup graphs (small cliques) usually immediately.
    val localThreshold = spark.conf.getOption("spark.graft.cc.localThreshold")
      .map(_.toLong).getOrElse(4000000L)

    var result: Option[DataFrame] = None
    var it = 0
    while (result.isEmpty && it < maxIter) {
      val n = edges.count() // cheap: edges is materialized by the checkpoint
      if (n <= localThreshold) {
        result = Some(localUnionFind(edges))
      } else {
        // large-star: every node attaches its strictly-larger neighbors to
        // the min of its closed neighborhood (m <= ctr < nbr keeps lo < hi)
        val sym = edges.select($"lo".as("ctr"), $"hi".as("nbr"))
          .union(edges.select($"hi".as("ctr"), $"lo".as("nbr")))
        val mins = sym.groupBy("ctr").agg(min($"nbr").as("mn"))
          .select($"ctr", least($"ctr", $"mn").as("m"))
        val large = sym.join(mins, "ctr")
          .filter($"nbr" > $"ctr")
          .select($"m".as("lo"), $"nbr".as("hi"))
          .distinct()

        // small-star: every node attaches its smaller neighbors (and
        // itself) to the minimum of those neighbors
        val minsS = large.groupBy("hi").agg(min($"lo").as("m"))
        val joined = large.join(minsS, "hi")
        val next = joined.filter($"lo" =!= $"m")
          .select($"m".as("lo"), $"lo".as("hi"))
          .union(joined.select($"m".as("lo"), $"hi".as("hi")))
          .distinct()
          .localCheckpoint(true)

        // fixpoint (star form reached): labels read straight off the edges
        val same = next.count() == n &&
          next.exceptAll(edges).isEmpty
        if (same) {
          result = Some(
            edges.select($"hi".as("id"), $"lo".as("component"))
              .union(edges.select($"lo".as("id"), $"lo".as("component")))
              .distinct())
        }
        edges = next
      }
      it += 1
    }
    // Large-star/small-star alternation provably reaches the star fixpoint in
    // O(log^2 n) rounds (Kiveris et al., "Connected Components in MapReduce
    // and Beyond"), so maxIter=50 cannot be exhausted for any graph that fits
    // on a cluster. Fail loudly rather than collect an unbounded edge set to
    // the driver — at 100 TB a silent driver-side fallback is an OOM.
    result.getOrElse(throw new IllegalStateException(
      s"connectedComponents: no star fixpoint after $maxIter rounds " +
        s"(${edges.count()} edges remain) — raise maxIter"))
  }

  /** Driver-local DSU over a collected canonical edge list; component = min
    * id. Only invoked once the shrinking edge set is <= localThreshold rows
    * (default 4M canonical edges ~= 64 MB) — a bounded shortcut, not a
    * scale fallback. */
  private def localUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("lo"), col("hi")).as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by min keeps the root = smallest id
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val labels = parent.keysIterator.map(id => (id, find(id))).toSeq
    spark.createDataset(labels).toDF("id", "component")
  }

  /**
   * Component id for EVERY node in `df` (nodes untouched by any pair are
   * their own component) — the canonical-document assignment step of a
   * near-dup pipeline: generate pairs (minhash/simhash/token-jaccard),
   * cluster them, keep `id === component` as the representatives.
   */
  def assignComponents(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      srcCol: String = "id_a",
      dstCol: String = "id_b"): DataFrame = {
    val labels = connectedComponents(pairs, srcCol, dstCol)
    df.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("component"))
  }

  /**
   * Near-dup cluster collapse — the step AFTER pair generation in every
   * dedup pipeline: connected components over the pair graph, then keep ONE
   * representative per cluster — the row maximizing `scoreCol` (ties to the
   * smallest id). Singletons survive as their own cluster. Returns the
   * surviving rows of `df` plus (component, cluster_size).
   *
   * Scale shape: components come from [[connectedComponents]] (alternating
   * star contraction, driver DSU only under a threshold); the rank-1 pick
   * is a window over the component key — one shuffle, and near-dup
   * components are tiny by construction so no skewed window partition.
   */
  def keepBestPerCluster(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      scoreCol: String,
      srcCol: String = "id_a",
      dstCol: String = "id_b"): DataFrame = {
    val comp = assignComponents(df.select(col(idCol)), idCol, pairs, srcCol, dstCol)
    val w = Window.partitionBy(col("component"))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.join(comp, Seq(idCol))
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy(col("component"))))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /**
   * Word-set Jaccard similarity of all pairs above a threshold, via a
   * shared-token inverted index (no cross join): rare tokens key the
   * candidate generation. `maxDf` drops tokens appearing in more than that
   * many docs (stop-token guard — without it the index degenerates).
   * Built entirely from codegen'd built-ins.
   */
  def tokenJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      maxDf: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val docs = df.select(
      col(idCol).cast("long").as("id"),
      array_distinct(split(trim(col(textCol)), "\\s+")).as("tokens"))

    val posting = docs.select($"id", explode($"tokens").as("token"))
    val rare = posting.groupBy("token").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDf && $"df" >= 2)
    val filtered = posting.join(broadcast(rare), "token")

    val cand = filtered.as("x").join(filtered.as("y"), "token")
      .filter($"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"))
      .distinct()

    cand.join(docs.select($"id".as("id_a"), $"tokens".as("tok_a")), "id_a")
      .join(docs.select($"id".as("id_b"), $"tokens".as("tok_b")), "id_b")
      .withColumn("inter", size(array_intersect($"tok_a", $"tok_b")))
      .withColumn("uni", size($"tok_a") + size($"tok_b") - $"inter")
      .withColumn("jaccard", $"inter" / $"uni")
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /**
   * EXACT set-similarity join via ppjoin-style prefix filtering (Xiao et
   * al. 2008, public formulation): all pairs with Jaccard(setA, setB) >=
   * threshold, guaranteed complete — unlike [[tokenJaccardPairs]], whose
   * maxDf stop-token guard can drop pairs whose shared tokens are all
   * frequent. Tokens order globally by ascending document frequency (ties
   * by token text); a set of size s keeps only its first
   * s - ceil(t*s) + 1 tokens as join keys — any pair at Jaccard >= t
   * provably shares a prefix token, and because prefixes hold the RAREST
   * tokens, candidate fan-out stays near the true-pair count instead of
   * the posting-list square a naive shared-token join pays on hot tokens.
   *
   * Scale shape: one shuffle to count df; one windowed rank per set (keyed
   * by the set id); the candidate equi-join shuffles only prefix tokens;
   * exact vérification joins the two bounded set arrays back by id.
   *
   * @param setCol array column (the set; deduped internally)
   * @return (id_a, id_b, jaccard) with id_a < id_b
   */
  def jaccardSetJoin(
      df: DataFrame,
      idCol: String,
      setCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // The set column feeds three plan branches (posting + both verify
    // sides); checkpoint so an expensive upstream set construction (e.g.
    // shingling) evaluates once, not three times.
    val docs = PlanUtil.widenIfNarrow(
      df.select(col(idCol).cast("long").as("id"),
          array_distinct(col(setCol)).as("toks"))
        .filter(size($"toks") > 0)
        .localCheckpoint())

    // Candidate generation runs entirely on 8-byte token hashes: df
    // counting, the global order, and the prefix equi-join never shuffle
    // the token strings. A hash collision can only ADD a candidate (equal
    // tokens always hash equal), so completeness is preserved and the
    // exact string-array verification below removes any extras.
    val posting = docs.select($"id", size($"toks").as("sz"),
      explode(transform($"toks", t => xxhash64(t))).as("h"))
    val dfreq = posting.groupBy("h").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"id").orderBy($"df", $"h")
    val prefix = posting.join(dfreq, "h")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"sz" - ceil($"sz" * threshold) + 1)
      .select($"h", $"id")

    val cand = prefix.as("x").join(prefix.as("y"), "h")
      .filter($"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"))
      .distinct()

    cand.join(docs.select($"id".as("id_a"), $"toks".as("tok_a")), "id_a")
      .join(docs.select($"id".as("id_b"), $"toks".as("tok_b")), "id_b")
      .withColumn("inter", size(array_intersect($"tok_a", $"tok_b")))
      .withColumn("jaccard", $"inter" / (size($"tok_a") + size($"tok_b") - $"inter"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /**
   * Exact embedding near-duplicate pairs: all-pairs cosine >= threshold.
   * O(n²) refine — the small-side/verification path (one side is broadcast;
   * Spark plans the non-equi join as a broadcast nested-loop). For corpora
   * where both sides are huge use embeddingNearDupPairs (LSH-bucketed, one
   * shuffle on the bucket key) and accept its recall trade.
   */
  def embeddingNearDupExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    // The inequality join is a BroadcastNestedLoopJoin; its parallelism is
    // the STREAMED side's partition count, and a small parquet input is one
    // partition => one task computing all O(n^2) pairs. Repartition the
    // streamed side so every core gets a slice of the pair matrix.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val a = df.select(col(idCol).cast("long").as("id_a"), col(vecCol).as("__va"))
      .repartition(parts)
    val b = df.select(col(idCol).cast("long").as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", exprColumn(CosineSim(columnExpr(col("__va")), columnExpr(col("__vb")))))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /**
   * Embedding near-duplicate pairs: random-hyperplane LSH buckets (sign bits
   * of `planes` fixed pseudo-random projections), verify cosine >= threshold
   * inside buckets. Deterministic planes from a seeded hash so results are
   * reproducible.
   */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int = 12,
      threshold: Double = 0.95,
      md5Planes: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // deterministic pseudo-uniform planes from a stable hash; md5Planes
    // switches the derivation to the cross-engine md5 hash, centered to
    // [-1, 1) — `(('0x'||substr(md5(p||':'||d),1,15))::BIGINT - 2^59)
    // / 2^59` in DuckDB — so an external engine reproduces the buckets
    // (and therefore the emitted pair set) bit-exactly
    val planeMat: Array[Array[Double]] = Array.tabulate(planes, dim) { (p, d) =>
      if (md5Planes)
        (TextKernels.md5Hash60(s"$p:$d") - (1L << 59)).toDouble / (1L << 59).toDouble
      else TextKernels.hash64(s"$p:$d", 42).toDouble / Long.MaxValue
    }
    val withSig = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", exprColumn(LshBucket(columnExpr($"vec"), planeMat)))

    val a = withSig.select($"bucket", $"id".as("id_a"), $"vec".as("vec_a"))
    val b = withSig.select($"bucket", $"id".as("id_b"), $"vec".as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter($"id_a" < $"id_b")
      .withColumn("cosine", exprColumn(CosineSim(columnExpr($"vec_a"), columnExpr($"vec_b"))))
      .filter($"cosine" >= threshold)
      .select($"id_a", $"id_b", $"cosine")
  }

  /**
   * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication"): partition the corpus into
   * k-means cells over the embedding space, then inside each cell drop
   * every row that has an EARLIER (lower-id) cell-mate with cosine >=
   * `threshold` — the paper's upper-triangular keep-first rule. Output is
   * length-preserving: (id, cell, kept).
   *
   * Pass centroids from [[Similarity.trainIvfCentroids]] (deterministic
   * decimal-fold Lloyd) so the cell assignment — and therefore the kept
   * set — is bit-reproducible across runs, partitionings, and engines.
   *
   * Distributed shape: one shuffle on the cell id for the within-cell
   * self-join, one broadcast-able distinct dup-id set, no driver
   * materialization. At 100 TB the cell count grows with the corpus
   * (k ~ n/target_cell_size), which keeps per-cell pair work bounded —
   * the same discipline as the grid spatial joins; the pair stage is the
   * quadratic-in-cell-size part, exactly as in the reference algorithm.
   */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withCell = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("cell", exprColumn(NearestCentroid(columnExpr($"vec"), centroids)))
    val a = withCell.select($"cell", $"id".as("id_a"), $"vec".as("vec_a"))
    val b = withCell.select($"cell", $"id".as("id_b"), $"vec".as("vec_b"))
    val dups = a.join(b, Seq("cell"))
      .filter($"id_a" < $"id_b")
      .filter(exprColumn(CosineSim(columnExpr($"vec_a"), columnExpr($"vec_b"))) >= threshold)
      .select($"id_b".as("dup_id")).distinct()
    withCell.join(dups, withCell("id") === dups("dup_id"), "left_outer")
      .select($"id", $"cell", $"dup_id".isNull.as("kept"))
  }

  /**
   * Per-document repeated-n-gram statistics — the corpus-level duplicated
   * text measure used by large-scale training-data curation (the word-level
   * approximation of substring dedup a la "Deduplicating Training Data
   * Makes Language Models Better", Lee et al. 2021): a word n-gram is
   * "duplicated" when it occurs in >= `minDocs` distinct documents; each
   * document reports what fraction of its n-gram occurrences are
   * duplicated.
   *
   * Tokenization: trim, split on whitespace runs (empty tokens dropped,
   * case-sensitive — same convention as [[tokenJaccardPairs]]); documents
   * with fewer than n tokens produce no row.
   *
   * Distributed shape: explode to (doc, gram) once, aggregate to
   * (gram, doc, occurrences) — map-side partials shrink repeated grams
   * before the shuffle — then the distinct-doc count per gram comes from
   * a second aggregation over that DEDUPED set joined back to it (NOT a
   * count-over-gram window: a window funnels every row of a hot gram
   * into one unsplittable task, while AQE can skew-split a join
   * partition), and one final shuffle re-aggregates per doc. No driver
   * materialization; gram cardinality scales out across executors.
   */
  def ngramDupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2, "need n >= 1 and minDocs >= 2")
    val toks = df.select(
        col(idCol).as("doc_id"),
        filter(split(trim(col(textCol)), "\\s+"), t => t =!= "").as("w"))
      .filter(size(col("w")) >= n)
    // grams ride as 64-bit xxhash keys through both aggregations and the
    // join (8 bytes vs the n-token string; collisions ~windows^2/2^65 — a
    // collision could only merge two gram counts, never lose a doc)
    val grams = toks.select(col("doc_id"),
      explode(transform(sequence(lit(0), size(col("w")) - n),
        i => xxhash64(array_join(slice(col("w"), i + 1, lit(n)), " ")))).as("gram"))
    val perDoc = grams.groupBy("gram", "doc_id").agg(count(lit(1)).as("occ"))
    // rows per gram == distinct docs containing it (post-aggregation);
    // only grams reaching minDocs matter downstream, and that set is a
    // small fraction of the vocabulary in a real corpus — filtering
    // BEFORE the join keeps the build side broadcast-small
    val dupGrams = perDoc.groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("gram")
    val withNd = perDoc.join(dupGrams.withColumn("__dup", lit(1)), Seq("gram"), "left")
    withNd.groupBy("doc_id")
      .agg(sum(col("occ")).as("n_grams"),
        sum(when(col("__dup").isNotNull, col("occ")).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 6) + lit(0.0))
  }

  /**
   * Repeated-span scrubbing (the substring-dedup curation step, Lee et
   * al. 2022 "Deduplicating Training Data Makes Language Models Better",
   * at token granularity): every `n`-token window whose exact text
   * appears in at least `minDocs` distinct documents is masked out of ALL
   * of them, and the surviving tokens are reassembled in order. Unlike
   * whole-doc dedup this removes the template paragraph pasted into a
   * thousand otherwise-distinct pages.
   *
   * Scale shape: windows explode once AS 64-BIT HASHES; the gram
   * document-frequency aggregation map-side combines and the frequent-gram
   * set (a tiny fraction of the vocabulary) broadcasts into the hit join;
   * covered positions aggregate to one sorted array per HIT doc (the only
   * doc-keyed shuffle — hit positions, never the token set); the rebuild
   * is a per-doc codegen merge walk (scrub_positions) over the original
   * token array. Docs scrubbed to nothing come back as empty strings.
   */
  def scrubRepeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2,
      outCol: String = "scrubbed_text"): DataFrame = {
    require(n >= 1 && minDocs >= 2, "need n >= 1 and minDocs >= 2")
    val id = col(idCol)
    // NULL text folds to an empty token array up front so the rebuild emits
    // the documented ''/0 (size(null)/ScrubPositions(null) would otherwise
    // propagate NULL into outCol and n_kept_tokens)
    val toks = df.select(id,
      coalesce(filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""),
        array().cast("array<string>")).as("__w"))
    // windows ride as 64-bit xxhash keys, not 6-token strings: the
    // distinct/aggregate/join shuffles carry 8 bytes per window instead of
    // ~40+ chars (collision odds ~(windows^2)/2^65 — vanishing; a collision
    // could only ever OVER-mask one extra span)
    val grams = toks.filter(size(col("__w")) >= n)
      .select(id, posexplode(
        transform(sequence(lit(0), size(col("__w")) - n),
          i => xxhash64(array_join(slice(col("__w"), i + 1, lit(n)), " "))))
        .as(Seq("__pos", "__gram")))
    val freq = grams.select(id, col("__gram")).distinct()
      .groupBy(col("__gram")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__gram"))
    // covered positions aggregate to ONE sorted array per hit doc (shuffle
    // = hit positions only); the rebuild is then a per-doc codegen merge
    // walk (scrub_positions) over the original token array — the full
    // token set never rides a shuffle
    val covByDoc = grams.join(broadcast(freq), Seq("__gram"))
      .select(id.as("__cid"),
        explode(sequence(col("__pos"), col("__pos") + (n - 1))).as("__cov"))
      .groupBy(col("__cid"))
      .agg(sort_array(collect_set(col("__cov"))).as("__covArr"))
    toks.join(covByDoc, id === col("__cid"), "left")
      .select(id,
        graft.internal.exprColumn(ScrubPositions(
          graft.internal.columnExpr(col("__w")),
          graft.internal.columnExpr(coalesce(col("__covArr"),
            array().cast("array<int>"))))).as(outCol),
        (size(col("__w")) - coalesce(size(col("__covArr")), lit(0)))
          .cast("long").as("n_kept_tokens"))
  }

  /**
   * Benchmark decontamination — the eval-overlap filter run before shipping
   * a training corpus (GPT-3 appendix C / PaLM / Llama style): flag every
   * training document that shares at least one exact `n`-token n-gram with
   * any document of the evaluation set. Returns one row per contaminated
   * train doc: (doc_id, n_shared distinct overlapping grams, the
   * lexicographically-first such gram for auditability).
   *
   * Tokenization: trim + whitespace-run split, case-sensitive — the same
   * convention as [[tokenJaccardPairs]]/[[ngramDupStats]].
   *
   * Scale shape: both sides explode to DISTINCT (doc, gram) once with
   * map-side combine; the eval gram set — a benchmark, orders of magnitude
   * smaller than the corpus — is distinct'd and BROADCAST into an inner
   * join against train grams, so the 100-TB side never shuffles on the
   * gram. One final aggregation per train doc. If the benchmark outgrows
   * broadcast, swap the join for the bloom-prune shape of
   * [[dedupAgainstHistory]] (same output, probabilistic prefilter).
   */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "need n >= 1")
    def grams(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        filter(split(trim(col(textCol)), "\\s+"), t => t =!= "").as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("__w")) - n),
          i => array_join(slice(col("__w"), i + 1, lit(n)), " "))).as("gram"))
    val trainGrams = grams(train).distinct()
    val evalGrams = grams(eval).select(col("gram")).distinct()
    trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"), min(col("gram")).as("sample_gram"))
  }

  /** The n-token grams of a text column as an array (same tokenization as
    * [[decontaminate]]); fewer than n tokens => empty array. */
  def gramsCol(text: Column, n: Int): Column = {
    val w = filter(split(trim(text), "\\s+"), t => t =!= "")
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i => array_join(slice(w, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Stateless contamination flag for INGEST streams: true when the text
   * shares any n-token gram with the eval gram set (a driver-collected
   * literal — benchmarks are small; the executor sees it once per task via
   * the plan). Being a pure projection it runs unchanged in a Structured
   * Streaming select/filter with no state store, unlike the aggregating
   * batch [[decontaminate]]. Eval sets beyond literal size: swap in the
   * Bloom prefilter shape of [[dedupAgainstHistory]] (approximate) and
   * refine offline.
   */
  def contaminatedFlag(text: Column, evalGrams: Seq[String], n: Int): Column =
    arrays_overlap(gramsCol(text, n), typedLit(evalGrams.toArray))
}
