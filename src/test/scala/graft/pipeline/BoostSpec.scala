package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BoostSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one round finds the obvious step split") {
    // y jumps from 0 to 10 at x = 5; bins are equal-width over [0, 10)
    val df = (0 until 200).map { i =>
      val x = i % 10 + 0.25
      (x, 0.0, if (x > 5) 10.0 else 0.0)
    }.toDF("x1", "x2", "y")
    val st = Boost.trainStumps(df, Seq("x1", "x2"), "y", rounds = 1, lr = 1.0)
      .collect()
    assert(st.length == 1)
    val r = st.head
    assert(r.getInt(1) == 0) // splits on x1
    val thr = r.getDouble(2)
    assert(thr > 4.0 && thr <= 6.0, s"thr=$thr")
    assert(math.abs(r.getDouble(3) - 0.0) < 1e-6) // left leaf
    assert(math.abs(r.getDouble(4) - 10.0) < 1e-6) // right leaf
  }

  test("residuals shrink round over round (shrinkage 0.5)") {
    val df = (0 until 300).map { i =>
      val x1 = (i % 12).toDouble; val x2 = (i % 5).toDouble
      (x1, x2, 2.0 * (if (x1 > 6) 1 else 0) + 3.0 * (if (x2 > 2) 1 else 0))
    }.toDF("x1", "x2", "y")
    val st = Boost.trainStumps(df, Seq("x1", "x2"), "y", rounds = 4, lr = 0.5)
      .collect()
    assert(st.length == 4)
    val gains = st.map(_.getDouble(5))
    assert(gains.head >= gains.last, s"gains not shrinking: ${gains.mkString(",")}")
    // both features get used across rounds
    assert(st.map(_.getInt(1)).toSet == Set(0, 1))
  }

  test("bit-identical across partitionings (decimal folds)") {
    val rows = (0 until 400).map { i =>
      ((i % 17).toDouble, (i % 7).toDouble, ((i * 13) % 23).toDouble)
    }
    val a = Boost.trainStumps(rows.toDF("x1", "x2", "y").repartition(1),
      Seq("x1", "x2"), "y", rounds = 3).collect().map(_.toSeq).toSeq
    val b = Boost.trainStumps(rows.toDF("x1", "x2", "y").repartition(29),
      Seq("x1", "x2"), "y", rounds = 3).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("chainSql structure exposes per-round stump relations") {
    val s = Boost.chainSql("v", Seq("x1", "x2"), "y", rounds = 2)
    assert(s.contains("MATERIALIZED") && s.contains("st1") && s.contains("st2"))
    assert(s.contains("ORDER BY round"))
  }
}
