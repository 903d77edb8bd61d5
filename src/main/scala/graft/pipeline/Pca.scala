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
 * decimal(28,10) fold. The moment pass explodes each vector to its
 * (i, j) products; at extreme scale swap the explode for per-partition
 * Gram partials (#partitions * dim^2 rows) at the cost of FP-order
 * exactness.
 */
object Pca {

  /** Raw moments: (n, mean vector, E[x_i * x_j] matrix). */
  def moments(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    require(dim >= 1, "need dim >= 1")
    val muRows = df.select(posexplode(col(vecCol)).as(Seq("i", "xi")))
      .groupBy("i")
      .agg((sum(($"xi".cast("double") * lit(1.0e10)).cast("long")).cast("double") /
        lit(1.0e10) / count(lit(1))).as("mu"), count(lit(1)).as("n"))
      .collect()
    val n = muRows.head.getLong(2)
    val mu = new Array[Double](dim)
    muRows.foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    val e1 = df.select(posexplode(col(vecCol)).as(Seq("i", "xi")), col(vecCol).as("__v"))
    val sRows = e1.select($"i", $"xi", posexplode($"__v").as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg((sum((($"xi".cast("double") * $"xj".cast("double")) * lit(1.0e10)).cast("long"))
        .cast("double") / lit(1.0e10) / count(lit(1))).as("sxy"))
      .collect()
    val sxy = Array.ofDim[Double](dim, dim)
    sRows.foreach(r => sxy(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
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
