package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ps = Seq(0.0, 0.25, 0.5, 0.77, 0.95, 1.0)

  /** Pin the range-sort path (builtin dispatch off) for the duration of `f`. */
  private def sortPath[A](f: => A): A = {
    spark.conf.set(Quantiles.BuiltinMaxRowsKey, "0")
    try f finally spark.conf.unset(Quantiles.BuiltinMaxRowsKey)
  }

  private def differential(rows: Seq[(String, Double)]): Unit = {
    val df = rows.toDF("k", "v")
    val mine = sortPath(Quantiles.exactPercentiles(df, Seq("k"), "v", ps)
      .collect()).map(r => r.getString(0) -> ps.indices.map(j => r.getDouble(1 + j))).toMap
    val builtin = df.groupBy("k")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(mine.keySet == builtin.keySet)
    for (k <- mine.keySet; j <- ps.indices)
      assert(mine(k)(j) == builtin(k)(j), // exact double equality
        s"k=$k p=${ps(j)} mine=${mine(k)(j)} builtin=${builtin(k)(j)}")
  }

  test("matches the built-in percentile bit-for-bit on random data") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 4000).map { i =>
      (s"g${i % 7}", math.floor(rnd.nextDouble() * 1000) / 8.0) // duplicates likely
    }
    differential(rows)
  }

  test("matches on skewed group sizes, negatives, and singleton groups") {
    val rnd = new scala.util.Random(7)
    val rows =
      (1 to 1000).map(_ => ("big", rnd.nextGaussian() * 100)) ++
        Seq(("single", 3.25), ("pair", -1.5), ("pair", 2.5)) ++
        (1 to 10).map(i => ("tiny", -i.toDouble))
    differential(rows)
  }

  test("nulls are ignored like the built-in") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None), ("b", Some(5.0)))
      .toDF("k", "v")
    for (pin <- Seq(true, false)) {
      def run = Quantiles.exactPercentile(df, Seq("k"), "v", 0.5, "med")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val mine = if (pin) sortPath(run) else run
      assert(mine == Map("a" -> 2.0, "b" -> 5.0))
    }
  }

  test("dispatch threshold flip: builtin path and sort path agree exactly") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 3000).map(i => (s"g${i % 5}", rnd.nextDouble() * 500 - 250))
    val df = rows.toDF("k", "v")
    def run = Quantiles.exactPercentiles(df, Seq("k"), "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(j => r.getDouble(1 + j))).toMap
    val viaSort = sortPath(run)
    val viaBuiltin = run // default threshold >> 3000 rows -> builtin path
    assert(viaSort == viaBuiltin)
  }

  test("constant column and two-key grouping") {
    val rows = for (a <- 1 to 3; b <- 1 to 2; i <- 1 to 50)
      yield (s"a$a", s"b$b", if (a == 1) 42.0 else i.toDouble * a)
    val df = rows.toDF("ka", "kb", "v")
    val mine = Quantiles.exactPercentiles(df, Seq("ka", "kb"), "v", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val builtin = df.groupBy("ka", "kb")
      .agg(expr("percentile(v, 0.5)").as("m"), expr("percentile(v, 0.9)").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(mine == builtin)
  }
}
