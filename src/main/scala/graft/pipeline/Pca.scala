package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Principal-component analysis over an embedding column — the spectral
 * member of the embedding toolbox (decorrelation, drift directions,
 * whitening diagnostics for training corpora).
 *
 * Shape: ONE distributed pass builds the raw second-moment matrix and the
 * per-dimension means through an order-independent TRUNCATED SCALED-LONG
 * fold — each product is scaled by 1e10 and truncated toward zero
 * ((x*1e10).cast(long) in Spark == cast(trunc(x*1e10) as bigint) in SQL:
 * identical doubles truncate identically, so unlike a rounding fold there
 * is no half-boundary sensitivity AT ALL), then summed as exact longs.
 * This runs at plain long-sum speed (the decimal(28,10) fold it replaces
 * benched 13 s vs 1.8 s at sf0.1 — Spark's overflow-checked decimal sum
 * is ~8x slower than its long sum); the <=1e-10 truncation bias per
 * product is far below any spectral quantity of interest. dim x dim
 * doubles land on the driver, where the power iteration runs in plain
 * sequential double arithmetic — deterministic, and exactly replayable
 * by an external SQL engine (the q52/q221 codebook pattern: driver math
 * = unrolled CTE math).
 *
 * Bounds: the scaled sums need n * max|x_i x_j| * 1e10 < 2^63 — ~1e8
 * unit-scale rows per matrix cell. Beyond that (the 100 TB regime),
 * either shard the fold (sum per shard as long, combine shards as
 * BigInt/decimal — still order-independent) or fall back to a
 * decimal(28,10) fold.
 *
 * The moment pass runs as per-partition Gram partials (mapPartitions:
 * dim^2 truncated-long accumulators per partition, reduced element-wise)
 * rather than an (i, j) posexplode: because truncation happens PER
 * PRODUCT before any summing, long partials commute exactly — the
 * partial-sum-of-truncations equals the global sum-of-truncations bit
 * for bit, so the Gram shape costs #partitions * dim^2 longs instead of
 * n * dim^2 shuffled rows with NO exactness tradeoff.
 */
object Pca {

  /** Raw moments: (n, mean vector, E[x_i * x_j] matrix). */
  def moments(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    require(dim >= 1, "need dim >= 1")
    val D = dim
    // element-wise cast to double matches the old per-element $"xi".cast
    val vecs = df
      .select(col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)).as("v"))
      .where(col("v").isNotNull)
      .as[Seq[Double]]
    // partial: (rows, sum_i, cnt_i, sum_ij, cnt_ij) — counts kept per cell
    // so ragged (shorter-than-dim) vectors divide exactly like the old
    // groupBy("i"[, "j"]) counts did
    val (n, s1, c1, s2, c2) = vecs.rdd.mapPartitions { it =>
      var rows = 0L
      val s1 = new Array[Long](D); val c1 = new Array[Long](D)
      val s2 = new Array[Long](D * D); val c2 = new Array[Long](D * D)
      it.foreach { v =>
        rows += 1
        val len = math.min(v.length, D)
        var i = 0
        while (i < len) {
          val xi = v(i)
          s1(i) += (xi * 1.0e10).toLong; c1(i) += 1
          var j = 0
          while (j < len) {
            s2(i * D + j) += ((xi * v(j)) * 1.0e10).toLong; c2(i * D + j) += 1
            j += 1
          }
          i += 1
        }
      }
      Iterator.single((rows, s1, c1, s2, c2))
    }.reduce { (a, b) =>
      var i = 0
      while (i < D) { a._2(i) += b._2(i); a._3(i) += b._3(i); i += 1 }
      var k = 0
      while (k < D * D) { a._4(k) += b._4(k); a._5(k) += b._5(k); k += 1 }
      (a._1 + b._1, a._2, a._3, a._4, a._5)
    }
    // same division order as the old aggregate: (longSum.toDouble / 1e10) / cnt
    val mu = Array.tabulate(D)(i =>
      if (c1(i) == 0) 0.0 else s1(i).toDouble / 1.0e10 / c1(i))
    val sxy = Array.tabulate(D, D)((i, j) =>
      if (c2(i * D + j) == 0) 0.0 else s2(i * D + j).toDouble / 1.0e10 / c2(i * D + j))
    (n, mu, sxy)
  }

  /**
   * Leading eigenvector of the covariance by `iters` power-iteration
   * rounds from the uniform unit start 1/sqrt(dim). Every double op is
   * sequential (row-major dots, i-ordered norm) so an external engine
   * replays it exactly. Returns (eigvec, ||C v|| of the last round —
   * the eigenvalue estimate).
   */
  def topComponent(df: DataFrame, vecCol: String, dim: Int, iters: Int): (Array[Double], Array[Double], Double) = {
    val (_, mu, sxy) = moments(df, vecCol, dim)
    val c = Array.tabulate(dim, dim)((i, j) => sxy(i)(j) - mu(i) * mu(j))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += c(i)(j) * v(j); j += 1 }
        s
      }
      var n2 = 0.0
      var i = 0
      while (i < dim) { n2 += w(i) * w(i); i += 1 }
      lambda = math.sqrt(n2)
      v = w.map(_ / lambda)
      it += 1
    }
    (mu, v, lambda)
  }

  /** Projection of (x - mu) onto `v` as a sequential zip-multiply fold —
    * the same accumulation order as a SQL list_dot_product. */
  def projectCol(vecCol: Column, mu: Array[Double], v: Array[Double]): Column = {
    val centered = zip_with(vecCol, typedLit(mu), (x, m) => x.cast("double") - m)
    aggregate(zip_with(centered, typedLit(v), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
  }
}
