package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.internal.{columnExpr, exprColumn}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), BASELINE.json capability extension.
 *
 * Two paths:
 *  - bruteForceTopK: exact cosine top-k. The dot product is the codegen'd
 *    CosineSim expression (one allocation-free loop per row) — no UDF, no
 *    shuffle until the final k-row TakeOrdered. Scan-dominated: at 100 TB
 *    this is one pass.
 *  - lshTopK: random-hyperplane bucket index; probes only rows whose bucket
 *    is within `maxProbeHamming` of the query bucket — trades recall for a
 *    large scan reduction. At scale, combine with bucket-partitioned storage
 *    so probing prunes files (the bucket column becomes a partition key).
 */
object Similarity {

  /** Driver-side cosine over the shorter common prefix (shared by the
    * probe-selection and re-ranking paths). */
  private def cosVec(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The nProbe centroid ids nearest the query (cosine, id tie-break). */
  private def selectProbes(
      centroids: Array[Array[Double]], query: Array[Double], nProbe: Int): Seq[Int] =
    centroids.indices.sortBy(c => (-cosVec(query, centroids(c)), c)).take(nProbe)

  /** Cosine similarity column between an array<float/double> col and a literal query vector. */
  def cosineCol(vecCol: String, query: Array[Double]): Column =
    cosineCols(col(vecCol), typedLit(query))

  /** Cosine similarity between two array<float/double> columns (codegen'd kernel). */
  def cosineCols(a: Column, b: Column): Column =
    exprColumn(CosineSim(columnExpr(a), columnExpr(b)))

  /** Exact cosine top-k against one query vector. Output: (id, cosine) desc. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int): DataFrame =
    df.select(col(idCol), cosineCol(vecCol, query).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)

  /** Deterministic hyperplanes shared with Dedup.embeddingNearDupPairs. */
  private[pipeline] def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (p, d) =>
      TextKernels.hash64(s"$p:$d", 42).toDouble / Long.MaxValue
    }

  private def bucketOf(v: Array[Double], ps: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < ps.length) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * ps(p)(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /**
   * LSH-bucketed ANN top-k: restrict the exact scoring to rows whose
   * hyperplane bucket is within `maxProbeHamming` bits of the query's.
   */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int,
      numPlanes: Int = 12,
      maxProbeHamming: Int = 2): DataFrame = {
    val ps = planes(numPlanes, df.selectExpr(s"size($vecCol)").head.getInt(0))
    val qBucket = bucketOf(query, ps)

    df.withColumn("__bucket", exprColumn(LshBucket(columnExpr(col(vecCol)), ps)))
      .filter(expr(s"bit_count(__bucket ^ ${qBucket}L) <= $maxProbeHamming"))
      .select(col(idCol), cosineCol(vecCol, query).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /**
   * Johnson-Lindenstrauss random-projection retrieval: project vectors to
   * `proj` dimensions with md5-derived uniform planes (the cross-engine
   * derivation shared with [[Dedup.embeddingNearDupPairs]]), shortlist by
   * cosine in the PROJECTED space, then re-rank the shortlist at full
   * dimension. The JL lemma bounds the distortion, so the shortlist almost
   * always contains the true top-k — and the final ranking is exact over
   * whatever the shortlist holds.
   *
   * Scale shape: the projection is a per-row codegen expression tree
   * (`proj` VecDot kernels into one array) — the full-dim vectors are read
   * once and only `proj` doubles per row flow into the TakeOrdered
   * shortlist; the full-dim re-rank touches `shortlist` rows. With
   * persisted projections this is the classic "narrow index column"
   * pattern: query-time scans read 4x-16x fewer bytes than the raw
   * vectors.
   */
  def jlTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      query: Array[Double],
      proj: Int = 16,
      shortlist: Int = 50,
      k: Int = 10): DataFrame = {
    val pm: Array[Array[Double]] = Array.tabulate(proj, dim) { (p, d) =>
      (TextKernels.md5Hash60(s"$p:$d") - (1L << 59)).toDouble / (1L << 59).toDouble
    }
    // project the query with the same d-ordered fold the kernels use
    val projQ: Array[Double] = pm.map { pl =>
      var s = 0.0; var i = 0
      while (i < dim) { s += pl(i) * query(i); i += 1 }
      s
    }
    val projArr = array(pm.toSeq.map { pl =>
      exprColumn(VecDot(columnExpr(col(vecCol)), columnExpr(typedLit(pl.toSeq))))
    }: _*)
    val short = df
      .select(col(idCol), col(vecCol), projArr.as("__proj"))
      .withColumn("__pcos", cosineCols(col("__proj"), typedLit(projQ.toSeq)))
      .orderBy(desc("__pcos"), col(idCol))
      .limit(shortlist)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cosine"), col(idCol))
    short
      .withColumn("cosine", cosineCol(vecCol, query))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col(idCol), col("cosine"))
  }

  /**
   * Deterministic Lloyd k-means coarse quantizer for IVF: init = the k
   * vectors with the smallest ids (stable across runs), then `iters`
   * assign/average rounds. Each round is one distributed pass: assignment is
   * the codegen'd NearestCentroid expression, the new centroids come from a
   * posexplode + groupBy((cluster, dim)) average — only k*dim doubles ever
   * reach the driver, so training scales to any corpus size.
   */
  def trainIvfCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2): Array[Array[Double]] = {
    // persist the (id, vec) projection for the training loop: every Lloyd
    // round is one pass over it, and without this each round re-scans the
    // source (MEMORY_AND_DISK — the MLlib KMeans discipline; disk-backed
    // when the corpus outgrows executor memory)
    val data = df.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Array[Double]] = data
        .orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
      var it = 0
      while (it < iters) {
        val assigned = data.select(
          exprColumn(NearestCentroid(columnExpr(col(vecCol)), cents)).as("__cluster"),
          posexplode(col(vecCol)).as(Seq("__dim", "__v")))
        // decimal fold => the mean is independent of partial-aggregate
        // combine order, so training is bit-reproducible across runs and
        // partitionings (matching the determinism contract elsewhere)
        val rows = assigned.groupBy("__cluster", "__dim")
          .agg((sum(col("__v").cast("decimal(28,10)")).cast("double") /
            count(lit(1))).as("__m"))
          .collect()
        val next = cents.map(_.clone())
        rows.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        cents = next
        it += 1
      }
      cents
    } finally data.unpersist(blocking = false)
  }

  /**
   * IVF top-k: score only rows whose coarse cell is one of the `nProbe`
   * cells nearest the query. At scale the cell id becomes a storage
   * partition key, so probing prunes files instead of filtering a full scan.
   */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      query: Array[Double],
      k: Int,
      nProbe: Int): DataFrame = {
    val probes = selectProbes(centroids, query, nProbe)
    df.filter(exprColumn(NearestCentroid(columnExpr(col(vecCol)), centroids))
        .isin(probes: _*))
      .select(col(idCol), cosineCol(vecCol, query).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /**
   * [[ivfTopK]] over a table STORED partitioned by its cell id (the
   * "bucket-partitioned storage" scale path: `write.partitionBy(cell)`
   * turns the probe filter into directory-level partition pruning — files
   * of unprobed cells are never listed, the at-scale difference between
   * scanning 100% and nProbe/k of the corpus). The filter hits the stored
   * partition COLUMN, so no per-row assignment runs at query time; q283
   * demonstrates the pruned plan (`PartitionFilters: [cell IN ...]`).
   */
  def ivfTopKPartitioned(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cellCol: String,
      centroids: Array[Array[Double]],
      query: Array[Double],
      k: Int,
      nProbe: Int): DataFrame = {
    val probes = selectProbes(centroids, query, nProbe)
    df.filter(col(cellCol).isin(probes: _*))
      .select(col(idCol), cosineCol(vecCol, query).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  // -------------------------------------------------- product quantization

  /**
   * Train PQ codebooks (Jégou et al. 2011): split the vector into `m`
   * contiguous subspaces and run the deterministic Lloyd quantizer
   * (trainIvfCentroids) independently in each. Returns m x k x (dim/m)
   * centroids; only m*k*(dim/m) = dim*k doubles ever reach the driver.
   */
  def trainPqCodebooks(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iters: Int = 2): Array[Array[Array[Double]]] = {
    // same training-loop persist discipline as trainIvfCentroids
    val data = df.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = data.selectExpr(s"size($vecCol)").head.getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val sub = dim / m
      // deterministic init: the k smallest-id vectors, sliced per subspace
      var books: Array[Array[Array[Double]]] = {
        val seed = data.orderBy(col(idCol)).limit(k)
          .select(col(vecCol)).collect()
          .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
        Array.tabulate(m)(j => seed.map(_.slice(j * sub, (j + 1) * sub)))
      }
      // ONE distributed pass per iteration for ALL subspaces: compute the m
      // per-subspace assignments in a single projection, explode the vector
      // once, and aggregate (dim, cluster-of-that-dim's-subspace) means —
      // dim*k doubles to the driver per round, independent of m.
      var it = 0
      while (it < iters) {
        val assigns = array((0 until m).map { j =>
          exprColumn(NearestCentroid(
            columnExpr(slice(col(vecCol), j * sub + 1, sub)), books(j)))
        }: _*)
        val rows = data.select(assigns.as("__a"),
            posexplode(col(vecCol)).as(Seq("__dim", "__v")))
          .select(col("__dim"),
            element_at(col("__a"), (col("__dim") / sub).cast("int") + 1).as("__cl"),
            col("__v"))
          // decimal fold: order-independent means => reproducible codebooks
          .groupBy("__dim", "__cl")
          .agg((sum(col("__v").cast("decimal(28,10)")).cast("double") /
            count(lit(1))).as("__mean"))
          .collect()
        val next = books.map(_.map(_.clone()))
        rows.foreach { r =>
          val d = r.getInt(0)
          next(d / sub)(r.getInt(1))(d % sub) = r.getDouble(2)
        }
        books = next
        it += 1
      }
      books
    } finally data.unpersist(blocking = false)
  }

  /** Per-row PQ code: array<int> of the nearest centroid id per subspace.
    * This is the column you PERSIST at scale — 64 floats become m bytes
    * (32x smaller at m=8/dim=64), so candidate scans read codes, not
    * vectors. */
  def pqEncodeCol(vecCol: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val codes = (0 until m).map { j =>
      exprColumn(NearestCentroid(columnExpr(slice(vecCol, j * sub + 1, sub)), codebooks(j)))
    }
    array(codes: _*)
  }

  /**
   * Asymmetric-distance top-k over PQ codes alone: the query's per-
   * subspace dot/norm lookup tables (m x k doubles, computed on the
   * driver) turn scoring into m array lookups + adds per row — the
   * original vector column is never read. approx_cosine =
   * sum_j dot(q_j, cent_j[code_j]) / (|q| * sqrt(sum_j |cent_j[code_j]|^2)).
   */
  def pqAdcTopK(
      coded: DataFrame,
      idCol: String,
      codeCol: String,
      codebooks: Array[Array[Array[Double]]],
      query: Array[Double],
      k: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    def dotLut(j: Int): Array[Double] = codebooks(j).map { c =>
      var d = 0.0; var i = 0
      while (i < sub) { d += c(i) * query(j * sub + i); i += 1 }
      d
    }
    def normLut(j: Int): Array[Double] = codebooks(j).map { c =>
      var d = 0.0; var i = 0
      while (i < sub) { d += c(i) * c(i); i += 1 }
      d
    }
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val dotSum = (0 until m).map { j =>
      element_at(typedLit(dotLut(j)), col(codeCol).getItem(j) + 1)
    }.reduce(_ + _)
    val normSum = (0 until m).map { j =>
      element_at(typedLit(normLut(j)), col(codeCol).getItem(j) + 1)
    }.reduce(_ + _)
    val score = when(normSum > 0 && lit(qNorm) > 0,
      dotSum / (lit(qNorm) * sqrt(normSum))).otherwise(lit(0.0))
    coded.select(col(idCol), score.as("adc_cosine"))
      .orderBy(desc("adc_cosine"), col(idCol))
      .limit(k)
  }

  // --------------------------------------------------- scalar quantization

  /**
   * Per-dimension (min, max) ranges for int8 scalar quantization: one
   * map-side-combined min/max aggregation scan (exact — no sampling, no
   * summation-order sensitivity). 2·dim tiny doubles land on the driver.
   */
  def trainSqRange(df: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Double]) = {
    val aggs = (0 until dim).flatMap { i =>
      Seq(min(element_at(col(vecCol), i + 1).cast("double")),
          max(element_at(col(vecCol), i + 1).cast("double")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.anyNull,
      s"trainSqRange: empty input or vectors shorter than dim=$dim (null min/max)")
    (Array.tabulate(dim)(i => row.getDouble(2 * i)),
     Array.tabulate(dim)(i => row.getDouble(2 * i + 1)))
  }

  /**
   * SQ8 encode: per dimension, round((v - min) · 127 / (max - min)) — an
   * int in [0, 127] (4-8x smaller than raw floats). Constant dimensions
   * code to 0. Pure codegen HOF over the array — no UDF.
   */
  def sqEncodeCol(vecCol: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mnL = typedLit(mins); val mxL = typedLit(maxs)
    transform(vecCol, (v, i) => {
      val mn = element_at(mnL, i + 1)
      val mx = element_at(mxL, i + 1)
      when(mx === mn, lit(0))
        .otherwise(round((v.cast("double") - mn) * 127.0 / (mx - mn), 0).cast("int"))
    })
  }

  /** SQ8 decode: min + code · (max - min) / 127, per dimension. */
  def sqDecodeCol(codeCol: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mnL = typedLit(mins); val mxL = typedLit(maxs)
    transform(codeCol, (c, i) => {
      val mn = element_at(mnL, i + 1)
      val mx = element_at(mxL, i + 1)
      mn + c.cast("double") * (mx - mn) / 127.0
    })
  }

  /**
   * Top-k by cosine of the DECODED codes against a query — the SQ-ADC
   * search: the raw vector column is never read at query time; a scan of
   * int8 codes plus a TakeOrdered. Completes the quantization family
   * (SQ8 here, PQ/IVF/IVF-PQ above) with the highest-recall cheapest-train
   * member.
   */
  def sqTopK(
      coded: DataFrame,
      idCol: String,
      codeCol: String,
      mins: Array[Double],
      maxs: Array[Double],
      query: Array[Double],
      k: Int): DataFrame =
    coded.select(col(idCol),
        cosineCols(sqDecodeCol(col(codeCol), mins, maxs), typedLit(query)).as("sq_cosine"))
      .orderBy(desc("sq_cosine"), col(idCol))
      .limit(k)

  /**
   * IVF-PQ composed ANN (the standard FAISS shape, non-residual): the
   * coarse quantizer prunes the scan to `nProbe` cells, and within them
   * asymmetric distance scores the PQ CODES — at scale both the cell id
   * and the code column are precomputed/persisted, so a query touches
   * nProbe partitions of m-byte codes and never reads a raw vector.
   */
  def ivfPqTopK(
      coded: DataFrame,
      idCol: String,
      cellCol: String,
      codeCol: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      query: Array[Double],
      k: Int,
      nProbe: Int): DataFrame = {
    val probes = selectProbes(coarse, query, nProbe)
    pqAdcTopK(coded.filter(col(cellCol).isin(probes: _*)),
      idCol, codeCol, codebooks, query, k)
  }

  /**
   * Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
   * two-stage retrieval — a DISTRIBUTED exact top-`candidates` prune,
   * then the greedy diversity re-rank over that k-bounded set on the
   * driver (candidates*dim doubles; the standard rerank shape — the
   * iterative argmax is inherently sequential, so distributing it buys
   * nothing). pick_{t} = argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s),
   * ties by smaller id. Returns (rank, id, mmr_score, cosine).
   */
  def mmrTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int,
      lambda: Double = 0.7,
      candidates: Int = 50): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cand = df
      .select(col(idCol).cast("long").as("id"),
        cosineCol(vecCol, query).as("rel"), col(vecCol).as("v"))
      .orderBy(desc("rel"), col("id"))
      .limit(candidates)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Number](2).map(_.doubleValue()).toArray))
    val selected = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
    val picked = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, rel, v) =>
        val maxSim = if (picked.isEmpty) 0.0 else picked.map(p => cosVec(v, p)).max
        (lambda * rel - (1 - lambda) * maxSim, id, rel, v)
      }
      val best = scored.minBy { case (s, id, _, _) => (-s, id) }
      selected += ((rank, best._2, best._1, best._3))
      picked += best._4
      remaining.remove(remaining.indexWhere(_._1 == best._2))
      rank += 1
    }
    selected.toSeq
      .toDF("rank", idCol, "mmr_score", "cosine")
      .withColumn("mmr_score", round(col("mmr_score"), 6) + lit(0.0))
      .withColumn("cosine", round(col("cosine"), 6) + lit(0.0))
  }

  /**
   * Sign-bit binary quantization of one 32-dim half of a vector: bit i set
   * iff v[off+i] >= 0, packed little-endian into a BIGINT via the
   * Horner fold (no variable shifts — pure codegen'd HOF arithmetic,
   * reproducible as `list_sum(list_transform(range(32), ...))` in SQL
   * engines). Two halves cover the standard 64-dim embedding in 8 bytes —
   * a 32x compression that turns similarity into XOR+popcount.
   */
  def binaryHalfCol(vecCol: Column, off: Int): Column =
    aggregate(
      reverse(transform(sequence(lit(0), lit(31)),
        i => when(element_at(vecCol, i + lit(off + 1)) >= 0, 1L).otherwise(0L))),
      lit(0L), (acc, b) => acc * 2 + b)

  /** Driver-side packing of a query vector for [[binaryHalfCol]] parity. */
  def binaryHalf(v: Array[Double], off: Int): Long = {
    var acc = 0L
    var i = 31
    while (i >= 0) { acc = acc * 2 + (if (v(off + i) >= 0) 1L else 0L); i -= 1 }
    acc
  }

  /**
   * Hamming-distance top-k over binary-quantized 64-dim vectors: the
   * scoring loop is two XORs and two popcounts per row (codegen bitops,
   * no arrays touched), then a TakeOrdered — the cheapest member of the
   * quantized-search family (vs PQ/SQ8/IVF above). Ties break on id.
   */
  def hammingTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int): DataFrame = {
    require(query.length >= 64, "hammingTopK packs 64 dims")
    val qLo = binaryHalf(query, 0)
    val qHi = binaryHalf(query, 32)
    df.select(col(idCol),
        binaryHalfCol(col(vecCol), 0).as("__lo"),
        binaryHalfCol(col(vecCol), 32).as("__hi"))
      .withColumn("hamming",
        (bit_count(col("__lo").bitwiseXOR(lit(qLo))) +
         bit_count(col("__hi").bitwiseXOR(lit(qHi)))).cast("int"))
      .drop("__lo", "__hi")
      .orderBy(col("hamming"), col(idCol))
      .limit(k)
  }

  /**
   * All-pairs top-k per probe row against a broadcast-sized query set
   * (k-NN join): crossJoin(broadcast(queries)) + windowed rank. The big side
   * streams; the query side must be small (it is broadcast).
   */
  def knnJoin(
      data: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("cosine"), col(idCol))
    data.crossJoin(broadcast(queries))
      .withColumn("cosine", cosineCols(col(vecCol), col(qVecCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("cosine"), col("rank"))
  }

  /**
   * Large-large approximate k-NN JOIN via shared IVF cells — the vector
   * analog of the grid spatial join: train coarse centroids on the corpus
   * side (the [[trainIvfCentroids]] codebook discipline), assign every
   * corpus row to its ONE nearest cell (codegen [[NearestCentroid]]), give
   * every probe row its `nProbe` nearest cells (codegen
   * [[NearestCentroids]]), and equi-join on the cell id — candidate
   * generation is ONE shuffle per side on the cell key, nProbe-bounded
   * probe replication, and never a cross join. Scoring is the codegen
   * cosine; top-k per probe is a window over the probed cells' candidates
   * (cells-bounded, not corpus-bounded). Recall follows the IVF contract
   * (raise nProbe/kCells to trade scan for recall — q267 measures it);
   * [[knnJoin]] remains the exact path for broadcast-sized query sets.
   *
   * Fully deterministic (cosine ties break on the corpus id, cell ties on
   * the smaller cell index), so the oracle replays training, assignment,
   * probing, and ranking exactly (q52's unrolled-Lloyd idiom).
   */
  def ivfKnnJoin(
      left: DataFrame, lId: String, lVec: String,
      right: DataFrame, rId: String, rVec: String,
      kCells: Int, nProbe: Int, k: Int, iters: Int = 2,
      centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    // precomputed centroids let several joins share ONE cell space (e.g.
    // the reciprocal pair of joins in mutual-best matching, q304)
    val cents = centroids.getOrElse(trainIvfCentroids(right, rId, rVec, kCells, iters))
    val corpus = right.select(col(rId).as("rid"), col(rVec).as("rv"),
        exprColumn(NearestCentroid(columnExpr(col(rVec)), cents)).as("cell"))
      .repartition(col("cell"))
    val probes = left.select(col(lId).as("lid"), col(lVec).as("lv"),
        explode(exprColumn(NearestCentroids(columnExpr(col(lVec)), cents, nProbe)))
          .as("cell"))
    val w = Window.partitionBy(col("lid")).orderBy(desc("cos"), col("rid"))
    probes.join(corpus, Seq("cell"))
      .withColumn("cos", cosineCols(col("lv"), col("rv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lid"), col("rid"), col("cos"), col("rank"))
  }

  /**
   * Recall-targeted probe-budget CALIBRATION for the IVF family — the
   * missing guardrail around nProbe: a tight default silently buys speed
   * with recall (measured ~0.5 single-direction at nProbe=2/kCells=8,
   * q267). This measures recall@k on a deterministic query sample and
   * reports every candidate budget so callers pick the smallest nProbe
   * meeting a target instead of guessing.
   *
   * Deterministic and cheap by construction: the sample is the `nQueries`
   * smallest ids (collected bounded, codebook discipline); ONE corpus
   * scan scores every (sample query, row) pair — queries ride along as a
   * broadcast literal table — and a per-query window takes the exact
   * brute-force top-k. A top-k row is retrieved at budget n iff the rank
   * of its cell in the query's centroid preference order is <= n, so the
   * recall of ALL kCells candidate budgets reads off that one scan: no
   * per-budget re-search. At 100 TB this costs one pass over the corpus —
   * the price of ONE brute-force query batch — amortized over the life of
   * the index.
   *
   * @return one row per candidate budget: (n_probe, hits, recall,
   *         chosen) — `chosen` marks the smallest budget whose sample
   *         recall reaches `targetRecall` (the full sweep if none does,
   *         i.e. n_probe = kCells: exact search over all cells).
   */
  def calibrateNProbe(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      k: Int,
      targetRecall: Double,
      nQueries: Int = 8): DataFrame = {
    require(nQueries >= 1 && k >= 1 && centroids.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val kCells = centroids.length
    val qs: Seq[(Long, Array[Double])] = df
      .select(col(idCol).cast("long").as("id"), col(vecCol))
      .orderBy("id").limit(nQueries).collect()
      .map(r => (r.getLong(0), r.getSeq[Number](1).map(_.doubleValue()).toArray)).toSeq
    // (qid, cell, crank): the query's centroid preference order (cos desc,
    // cell asc — exactly selectProbes), 1-based
    val rankDf = broadcast(qs.flatMap { case (qid, qv) =>
      centroids.indices.sortBy(c => (-cosVec(qv, centroids(c)), c)).zipWithIndex
        .map { case (cell, r) => (qid, cell, r + 1) }
    }.toDF("qid", "cell", "crank"))
    val qdf = broadcast(qs.map { case (qid, qv) => (qid, qv.toSeq) }.toDF("qid", "qv"))
    // the query row itself is dropped (id != qid): sample queries come
    // from the corpus, and the guaranteed self-hit (cos 1.0, crank 1)
    // would inflate every budget's recall — held-out-query semantics
    val scored = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        exprColumn(NearestCentroid(columnExpr(col(vecCol)), centroids)).as("cell"))
      .crossJoin(qdf)
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("cell"),
        cosineCols(col("v"), col("qv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("id"))
    val topk = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .join(rankDf, Seq("qid", "cell"))
    val byRank = topk.groupBy("crank").agg(count(lit(1)).as("c"))
    val denom = (qs.length.toLong * k).toDouble
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    spark.range(1, kCells + 1).toDF("n_probe")
      .join(byRank, col("crank") <= col("n_probe"), "left")
      .groupBy("n_probe").agg(coalesce(sum("c"), lit(0L)).as("hits"))
      .withColumn("recall", round(col("hits").cast("double") / denom, 6) + lit(0.0))
      .withColumn("chosen", col("n_probe") === coalesce(
        min(when(col("recall") >= targetRecall, col("n_probe"))).over(wAll),
        lit(kCells.toLong)))
      .select(col("n_probe").cast("int").as("n_probe"), col("hits"),
        col("recall"), col("chosen"))
  }

  /**
   * Greedy k-center diverse-subset selection (Gonzalez 2-approximation) —
   * the coreset/curation primitive for "pick k maximally-spread exemplars"
   * over an embedding column. Seed = smallest id; each round picks the
   * point FARTHEST from the selected set (squared L2, rounded to 6 before
   * every comparison; ties by smallest id — fully deterministic, so the
   * rounds replay as unrolled SQL CTEs in the oracle).
   *
   * Distributed shape: k rounds, each ONE codegen scan updating the
   * running min-distance column (VecDot against the new center as a
   * literal) + a TakeOrderedAndProject(1) — per-partition heaps, no global
   * sort; only k·dim doubles ever reach the driver (the codebook
   * discipline). The embedding projection is localCheckpointed once so
   * the k scans never re-read the source.
   *
   * @return (rank 1..k, id, sel_dist) — sel_dist is the min squared L2 to
   *         the prior selection at pick time (null for the seed); the
   *         classic farthest-point ordering makes any prefix a k'-center
   *         solution for k' <= k.
   */
  def kCenterSelect(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val spark = df.sparkSession
    val work = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint()
    // fail loud instead of emitting repeated centers once the point set is
    // exhausted (every remaining min-distance is 0 from then on)
    require(work.limit(k).count() == k,
      s"kCenterSelect: fewer than k=$k non-null vectors")

    def d2To(center: Seq[Double]): Column = {
      val c = typedLit(center)
      round(exprColumn(VecDot(columnExpr(col("v")), columnExpr(col("v"))))
        - lit(2.0) * exprColumn(VecDot(columnExpr(col("v")), columnExpr(c)))
        + exprColumn(VecDot(columnExpr(c), columnExpr(c))), 6)
    }
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] = r.get(1) match {
      case s: scala.collection.Seq[_] => s.map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toSeq
    }

    val seed = work.orderBy("id").limit(1).collect().head
    var selected = List[(Int, Long, Option[Double])]((1, seed.getLong(0), None))
    var cur = work.withColumn("md", d2To(vecOf(seed)))
    var r = 2
    while (r <= k) {
      val next = cur.orderBy(desc("md"), col("id")).limit(1).collect().head
      selected ::= ((r, next.getLong(0), Some(next.getDouble(2))))
      if (r < k) {
        cur = cur.withColumn("md", least(col("md"), d2To(vecOf(next))))
        // keep the per-round plan flat: each round otherwise stacks one
        // more projection over the last
        if (r % 4 == 0) cur = cur.localCheckpoint()
      }
      r += 1
    }
    import spark.implicits._
    selected.reverse
      .map { case (rk, id, sd) =>
        (rk, id, sd.map(x => java.lang.Double.valueOf(x + 0.0)).orNull)
      }
      .toDF("rank", "id", "sel_dist")
  }
}
