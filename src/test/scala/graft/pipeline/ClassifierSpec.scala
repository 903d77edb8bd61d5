package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // linearly separable toy set: y = 1 iff f0 > 0.5
  private lazy val toy = (1 to 400).map { i =>
    val f0 = (i % 100) / 100.0
    val f1 = ((i * 7) % 100) / 100.0
    (i.toLong, f0, f1, if (f0 > 0.5) 1.0 else 0.0)
  }.toDF("id", "f0", "f1", "y")

  test("training separates a separable set (accuracy > 0.9)") {
    val w = Classifier.trainLogistic(toy, Seq($"f0", $"f1"), $"y", lr = 2.0, iters = 50)
    assert(w.length == 3)
    val sc = Classifier.score(w, Seq($"f0", $"f1"))
    val acc = toy.select(
        when((sc > 0.5).cast("int") === $"y".cast("int"), 1.0).otherwise(0.0).as("ok"))
      .agg(avg($"ok")).head().getDouble(0)
    assert(acc > 0.9, s"accuracy $acc")
    // weight on the informative feature dominates the uninformative one
    assert(math.abs(w(0)) > math.abs(w(1)))
  }

  test("weights are bit-identical across partitionings") {
    val a = Classifier.trainLogistic(toy.repartition(1), Seq($"f0", $"f1"), $"y", 0.5, 5)
    val b = Classifier.trainLogistic(toy.repartition(13), Seq($"f0", $"f1"), $"y", 0.5, 5)
    assert(a.toSeq == b.toSeq) // exact double equality, not approx
  }

  test("null features/labels are dropped, not poisoned") {
    val withNulls = toy.union(Seq((9901L, Double.NaN, 0.0, 1.0)).toDF("id", "f0", "f1", "y")
      .withColumn("f0", lit(null).cast("double")))
    val w0 = Classifier.trainLogistic(toy, Seq($"f0", $"f1"), $"y", 0.5, 3)
    val w1 = Classifier.trainLogistic(withNulls, Seq($"f0", $"f1"), $"y", 0.5, 3)
    assert(w0.toSeq == w1.toSeq)
  }

  test("zero iterations returns zero weights and score 0.5 everywhere") {
    val w = Classifier.trainLogistic(toy, Seq($"f0"), $"y", 0.5, 0)
    assert(w.toSeq == Seq(0.0, 0.0))
    val s = toy.select(Classifier.score(w, Seq($"f0")).as("s"))
      .agg(min($"s"), max($"s")).head()
    assert(s.getDouble(0) == 0.5 && s.getDouble(1) == 0.5)
  }

  test("oracle CTE text replays the trainer exactly (Spark-executed)") {
    // run the generated oracle SQL in Spark itself against a temp view:
    // same parse-tree discipline the DuckDB gate relies on.
    val df = toy.select($"id", $"f0", $"f1", $"y")
    df.createOrReplaceTempView("clf_toy")
    val sql = Classifier.oracleSql(
      table = "clf_toy", idCol = "id",
      featureSqls = Seq("f0", "f1"), labelSql = "y",
      where = "f0 IS NOT NULL", lr = 0.5, iters = 3)
    val viaSql = spark.sql(sql).collect()
    val w = Classifier.trainLogistic(df, Seq($"f0", $"f1"), $"y", 0.5, 3)
    val sc = Classifier.score(w, Seq($"f0", $"f1"))
    val direct = df.select($"id", round(sc, 6).as("score"),
        when(sc > lit(0.5), 1).otherwise(0).as("pred"))
      .orderBy("id").collect()
    assert(viaSql.length == direct.length)
    viaSql.zip(direct).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getDouble(1) == b.getDouble(1), s"score mismatch at id ${a.getLong(0)}")
      assert(a.getInt(2) == b.getInt(2))
    }
  }

  test("evalSelectSql: hand-computed AUC with ties, confusion, Brier") {
    import spark.implicits._
    // P=2, N=3; pairwise wins 3 + 1 + tie 0.5 = 4.5 -> AUC 0.75
    Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.7, 0.0), (0.2, 0.0))
      .toDF("score", "y").createOrReplaceTempView("scored")
    val r = spark.sql(Classifier.evalSelectSql).head()
    assert(r.getDouble(0) == 0.75, s"auc=${r.getDouble(0)}")
    // threshold 0.5: tp=2 (0.9, 0.7+), fp=2 (0.8, 0.7-), tn=1 (0.2), fn=0
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((2L, 2L, 1L, 0L)))
    assert(r.getDouble(5) == 0.6) // accuracy 3/5
    val brier = (math.pow(0.9 - 1, 2) + math.pow(0.8, 2) + math.pow(0.7 - 1, 2) +
      math.pow(0.7, 2) + math.pow(0.2, 2)) / 5
    assert(math.abs(r.getDouble(6) - brier) < 1e-6, s"brier=${r.getDouble(6)}")
  }

  test("binnedAuc converges to the exact rank AUC (no global sort)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // separable-ish: positives score higher on average
    val rows = (1 to 20000).map { _ =>
      val y = if (rnd.nextDouble() < 0.4) 1.0 else 0.0
      val s = math.min(1.0, math.max(0.0,
        rnd.nextGaussian() * 0.18 + (if (y == 1.0) 0.62 else 0.38)))
      (s, y)
    }
    val df = rows.toDF("score", "y")
    df.createOrReplaceTempView("scored")
    val exact = spark.sql(Classifier.evalSelectSql).head().getDouble(0)
    val binned = Classifier.binnedAuc(df, "score", "y", bins = 4096)
      .head().getDouble(0)
    assert(math.abs(binned - exact) < 2e-3, s"binned=$binned exact=$exact")
    // coarse bins still in the right neighborhood
    val coarse = Classifier.binnedAuc(df, "score", "y", bins = 64).head().getDouble(0)
    assert(math.abs(coarse - exact) < 0.03, s"coarse=$coarse exact=$exact")
  }

  test("cvEvalSelectSql: per-fold metrics equal single-fold evalSelectSql run fold by fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3000).map { i =>
      val y = if (rnd.nextDouble() < 0.5) 1.0 else 0.0
      val s = math.rint(math.min(1, math.max(0,
        rnd.nextGaussian() * 0.2 + (if (y == 1.0) 0.6 else 0.4))) * 1e6) / 1e6
      (i % 3L, s, y)
    }
    rows.toDF("fold", "score", "y").createOrReplaceTempView("scored_all")
    val cv = spark.sql("WITH " + Classifier.cvEvalSelectSql).collect()
    assert(cv.length == 3)
    for (f <- 0 until 3) {
      rows.filter(_._1 == f).map(t => (t._2, t._3)).toDF("score", "y")
        .createOrReplaceTempView("scored")
      val single = spark.sql(Classifier.evalSelectSql).head()
      val row = cv.find(_.getLong(0) == f).get
      assert(row.getDouble(1) == single.getDouble(0), s"fold $f auc")
      assert(row.getDouble(7) == single.getDouble(6), s"fold $f brier")
    }
  }

  test("calibration fix: overconfident scores -> ECE collapses, Brier improves on held-out fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // true P(y=1) = 0.5 + (score-0.5)/4 but the model reports `score`
    // (overconfident); binning recovers the empirical rate
    val rows = (1 to 6000).map { i =>
      val s = math.rint(rnd.nextDouble() * 1e6) / 1e6
      val py = 0.5 + (s - 0.5) / 4
      (i % 2L, s, if (rnd.nextDouble() < py) 1.0 else 0.0)
    }
    rows.toDF("fold", "score", "y").createOrReplaceTempView("cal_scored")
    val r = spark.sql("WITH " + Classifier.calibrationFixSelectSql("percentile")).head()
    val (eceRaw, eceCal) = (r.getDouble(1), r.getDouble(2))
    val (brRaw, brCal) = (r.getDouble(3), r.getDouble(4))
    assert(eceRaw > 0.1, s"raw miscalibration should be visible: $eceRaw")
    assert(eceCal < eceRaw / 3, s"calibrated ECE should collapse: $eceCal vs $eceRaw")
    assert(brCal < brRaw, s"Brier should improve: $brCal vs $brRaw")
  }

  test("reliability curve: decile bins partition the set; ECE is the weighted mean gap") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // well-calibrated by construction: P(y=1 | score=s) = s
    val rows = (1 to 8000).map { _ =>
      val s = rnd.nextDouble()
      (math.rint(s * 1e6) / 1e6, if (rnd.nextDouble() < s) 1.0 else 0.0)
    }
    rows.toDF("score", "y").createOrReplaceTempView("scored")
    val out = spark.sql("WITH " +
        Classifier.reliabilitySelectSql(Classifier.sparkCutsSelect))
      .collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).sum == 8000L) // bins partition the rows
    // equal-frequency: every decile within a tie-slack band of n/10
    out.foreach(r => assert(math.abs(r.getLong(1) - 800L) <= 80, r.toString))
    // calibrated data: per-bin |mean_score - pos_rate| is small, so is ECE
    val ece = out.head.getDouble(5)
    assert(ece < 0.05, s"ece=$ece")
    val wavg = out.map(r => r.getDouble(4) * r.getLong(1)).sum / 8000.0
    assert(math.abs(ece - math.rint(wavg * 1e6) / 1e6) < 2e-6, s"ece=$ece wavg=$wavg")
    // badly calibrated twin: constant over-confident score -> large ECE
    rows.map { case (_, y) => (0.95, y) }.toDF("score", "y")
      .createOrReplaceTempView("scored")
    val bad = spark.sql("WITH " +
        Classifier.reliabilitySelectSql(Classifier.sparkCutsSelect))
      .collect()
    assert(bad.head.getDouble(5) > 0.3, s"ece=${bad.head.getDouble(5)}")
  }
}
