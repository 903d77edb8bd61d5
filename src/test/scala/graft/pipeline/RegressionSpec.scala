package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fit recovers exact coefficients on noiseless data") {
    // y = 3 + 2*x1 - 0.5*x2, exactly
    val df = (1 to 50).map { i =>
      val x1 = i * 0.1; val x2 = (i % 7).toDouble
      (x1, x2, 3.0 + 2.0 * x1 - 0.5 * x2)
    }.toDF("x1", "x2", "y")
    val m = Regression.fit(df, Seq(col("x1"), col("x2")), col("y"))
    assert(math.abs(m.beta(0) - 3.0) < 1e-8)
    assert(math.abs(m.beta(1) - 2.0) < 1e-8)
    assert(math.abs(m.beta(2) + 0.5) < 1e-8)
    assert(m.r2 > 1.0 - 1e-9 && m.n == 50)
  }

  test("olsSql matches fit on the same data (round-6)") {
    val df = (1 to 80).map { i =>
      val x1 = (i % 11).toDouble; val x2 = (i % 5).toDouble
      (x1, x2, 1.5 + 0.75 * x1 + 0.25 * x2 + ((i * 13) % 9 - 4) * 0.05)
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("ols_t")
    val sql = spark.sql(Regression.olsSql("ols_t", "x1", "x2", "y")).head()
    val m = Regression.fit(df, Seq(col("x1"), col("x2")), col("y"))
    assert(sql.getLong(0) == m.n)
    assert(math.abs(sql.getDouble(1) - m.beta(0)) < 1e-5)
    assert(math.abs(sql.getDouble(2) - m.beta(1)) < 1e-5)
    assert(math.abs(sql.getDouble(3) - m.beta(2)) < 1e-5)
    assert(math.abs(sql.getDouble(4) - m.r2) < 1e-5)
  }

  test("olsSql is partition-invariant (decimal-folded sums)") {
    val rows = (1 to 200).map { i =>
      ((i % 13).toDouble, (i % 4).toDouble, (i % 23).toDouble * 0.7)
    }
    rows.toDF("x1", "x2", "y").repartition(1).createOrReplaceTempView("ols_a")
    rows.toDF("x1", "x2", "y").repartition(17).createOrReplaceTempView("ols_b")
    val a = spark.sql(Regression.olsSql("ols_a", "x1", "x2", "y")).head()
    val b = spark.sql(Regression.olsSql("ols_b", "x1", "x2", "y")).head()
    assert(a == b)
  }

  test("fit rejects a singular design") {
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i, i * 3.0)).toDF("x1", "x2", "y")
    intercept[IllegalArgumentException] {
      Regression.fit(df, Seq(col("x1"), col("x2")), col("y"))
    }
  }
}
