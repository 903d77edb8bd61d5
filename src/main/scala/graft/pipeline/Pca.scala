package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Principal-component analysis over an embedding column — the spectral
 * member of the embedding toolbox (decorrelation, drift directions,
 * whitening diagnostics for training corpora).
 *
 * Shape: ONE distributed pass builds the raw second-moment matrix and the
 * per-dimension means through the order-independent decimal(28,10) fold
 * (so the matrix is bit-identical across runs/partitionings/engines);
 * dim x dim doubles land on the driver, where the power iteration runs in
 * plain sequential double arithmetic — deterministic, and exactly
 * replayable by an external SQL engine (the q52/q221 codebook pattern:
 * driver math = unrolled CTE math).
 *
 * The moment pass explodes each vector to its (i, j, xi*xj) products to
 * keep the fold exact. At 100 TB you would trade that exactness for
 * per-partition Gram partials (mapPartitions accumulating a local
 * dim x dim matrix, then one reduce) — same result modulo FP summation
 * order, corpus-sized shuffle replaced by #partitions * dim^2 rows.
 */
object Pca {

  /** Raw moments: (n, mean vector, E[x_i * x_j] matrix). */
  def moments(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    require(dim >= 1, "need dim >= 1")
    val muRows = df.select(posexplode(col(vecCol)).as(Seq("i", "xi")))
      .groupBy("i")
      .agg((sum($"xi".cast("double").cast("decimal(28,10)")).cast("double") /
        count(lit(1))).as("mu"), count(lit(1)).as("n"))
      .collect()
    val n = muRows.head.getLong(2)
    val mu = new Array[Double](dim)
    muRows.foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    val e1 = df.select(posexplode(col(vecCol)).as(Seq("i", "xi")), col(vecCol).as("__v"))
    val sRows = e1.select($"i", $"xi", posexplode($"__v").as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg((sum(($"xi".cast("double") * $"xj".cast("double")).cast("decimal(28,10)"))
        .cast("double") / count(lit(1))).as("sxy"))
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
