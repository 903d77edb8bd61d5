package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}

/**
 * Ordinary least squares — the continuous-response sibling of
 * [[Classifier]] (logistic) and [[TopicModel]] (factorization).
 *
 * Two paths, same scale shape (ONE map-side-combined aggregation over
 * the data, then metadata-sized algebra):
 *
 *  - `olsSql` builds PORTABLE SQL (runs verbatim on Spark and DuckDB)
 *    for the 2-feature + intercept model: the normal-equation sums are
 *    decimal(30,12) folds of round-12 products (order-independent, so
 *    any partitioning and either engine produce the same matrix), and
 *    the 3x3 solve is Cramer's rule written out as scalar arithmetic —
 *    identical expression trees evaluate to identical doubles. This is
 *    the cross-engine-exact catalog path.
 *
 *  - `fit` is the general-p engine API: one aggregation computes the
 *    (p+1)x(p+1) Gram X'X and X'y (p^2 doubles to the driver — the
 *    codebook discipline), Gaussian elimination with partial pivoting
 *    solves it. Works for any p that fits a driver matrix; at 100 TB
 *    the scan dominates and the solve is free.
 */
object Regression {

  private val dec = "decimal(30,12)"
  private def fold(e: String) = s"sum(cast(round($e, 12) as $dec))"

  /**
   * Portable OLS SQL for y ~ b0 + b1*x1 + b2*x2 over `rel`.
   * Emits a complete SELECT (CTEs included) with columns
   * (n, beta0, beta1, beta2, r2) — betas/r2 rounded to 6.
   * `x1`/`x2`/`y` are SQL expressions valid on both engines.
   */
  def olsSql(rel: String, x1: String, x2: String, y: String,
      where: String = "true"): String = {
    // cast the decimal sums to double ONCE in a CTE so every reuse is
    // the same double on both engines
    s"""WITH sums AS (
       |  SELECT cast(count(*) as double) AS n,
       |    cast(${fold(x1)} as double) AS s1,
       |    cast(${fold(x2)} as double) AS s2,
       |    cast(${fold(s"($x1) * ($x1)")} as double) AS s11,
       |    cast(${fold(s"($x1) * ($x2)")} as double) AS s12,
       |    cast(${fold(s"($x2) * ($x2)")} as double) AS s22,
       |    cast(${fold(y)} as double) AS sy,
       |    cast(${fold(s"($x1) * ($y)")} as double) AS s1y,
       |    cast(${fold(s"($x2) * ($y)")} as double) AS s2y,
       |    cast(${fold(s"($y) * ($y)")} as double) AS syy
       |  FROM $rel WHERE $where),
       |det AS (
       |  SELECT *,
       |    n * (s11 * s22 - s12 * s12)
       |      - s1 * (s1 * s22 - s12 * s2)
       |      + s2 * (s1 * s12 - s11 * s2) AS d,
       |    sy * (s11 * s22 - s12 * s12)
       |      - s1 * (s1y * s22 - s12 * s2y)
       |      + s2 * (s1y * s12 - s11 * s2y) AS d0,
       |    n * (s1y * s22 - s12 * s2y)
       |      - sy * (s1 * s22 - s12 * s2)
       |      + s2 * (s1 * s2y - s1y * s2) AS d1,
       |    n * (s11 * s2y - s1y * s12)
       |      - s1 * (s1 * s2y - s1y * s2)
       |      + sy * (s1 * s12 - s11 * s2) AS d2
       |  FROM sums),
       |beta AS (SELECT *, d0 / d AS b0, d1 / d AS b1, d2 / d AS b2 FROM det)
       |SELECT cast(n as bigint) AS n,
       |  round(b0, 6) + 0.0 AS beta0,
       |  round(b1, 6) + 0.0 AS beta1,
       |  round(b2, 6) + 0.0 AS beta2,
       |  round(1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
       |            / (syy - sy * sy / n), 6) + 0.0 AS r2
       |FROM beta""".stripMargin
  }

  /** Fitted model: coefficients aligned with (1 +: features). */
  final case class OlsModel(beta: Array[Double], n: Long, r2: Double)

  /**
   * General-p OLS: intercept + `features`. One aggregation builds the
   * augmented Gram; the driver solves (p+1) equations by Gaussian
   * elimination with partial pivoting. Driver state: O(p^2) doubles.
   */
  def fit(df: DataFrame, features: Seq[Column], label: Column): OlsModel = {
    import org.apache.spark.sql.functions._
    val xs = lit(1.0) +: features.map(_.cast("double"))
    val yv = label.cast("double")
    val p = xs.length
    // upper triangle of X'X, then X'y, then y'y, then n
    val aggs =
      (for (i <- 0 until p; j <- i until p) yield sum(xs(i) * xs(j))) ++
        (0 until p).map(i => sum(xs(i) * yv)) :+ sum(yv * yv) :+ count(lit(1))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    var k = 0
    val a = Array.ofDim[Double](p, p + 1)
    for (i <- 0 until p; j <- i until p) {
      a(i)(j) = row.getDouble(k); a(j)(i) = a(i)(j); k += 1
    }
    for (i <- 0 until p) { a(i)(p) = row.getDouble(k); k += 1 }
    val syy = row.getDouble(k); val n = row.getLong(k + 1)
    // Gaussian elimination, partial pivot
    for (col <- 0 until p) {
      val piv = (col until p).maxBy(r => math.abs(a(r)(col)))
      require(math.abs(a(piv)(col)) > 1e-12, "singular design matrix")
      val t = a(col); a(col) = a(piv); a(piv) = t
      for (r <- col + 1 until p) {
        val f = a(r)(col) / a(col)(col)
        for (c <- col to p) a(r)(c) -= f * a(col)(c)
      }
    }
    val beta = new Array[Double](p)
    for (i <- p - 1 to 0 by -1) {
      var s = a(i)(p)
      for (j <- i + 1 until p) s -= a(i)(j) * beta(j)
      beta(i) = s / a(i)(i)
    }
    // SSE = y'y - beta' X'y ; SST = y'y - (sum y)^2 / n  (X'y[0] = sum y)
    val sy = row.getDouble((p * (p + 1)) / 2) // first X'y entry (x0 = 1)
    var bxty = 0.0
    for (i <- 0 until p) bxty += beta(i) * row.getDouble((p * (p + 1)) / 2 + i)
    val sse = syy - bxty
    val sst = syy - sy * sy / n
    OlsModel(beta, n, if (sst > 0) 1.0 - sse / sst else 0.0)
  }
}
