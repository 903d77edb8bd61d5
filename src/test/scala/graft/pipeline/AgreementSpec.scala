package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AgreementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Wikipedia's worked Cohen example: 2 raters, 50 items,
  // a=20 yes/yes, b=5 yes/no, c=10 no/yes, d=15 no/no -> kappa = 0.4
  private lazy val cohenToy = {
    val rows =
      (1 to 20).map(i => Seq((i, "r1", "Y"), (i, "r2", "Y"))) ++
      (21 to 25).map(i => Seq((i, "r1", "Y"), (i, "r2", "N"))) ++
      (26 to 35).map(i => Seq((i, "r1", "N"), (i, "r2", "Y"))) ++
      (36 to 50).map(i => Seq((i, "r1", "N"), (i, "r2", "N")))
    rows.flatten.toDF("item", "rater", "label")
  }

  test("Cohen's kappa matches the closed-form worked example") {
    val out = Agreement.cohenKappa(cohenToy, "item", "rater", "label").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("r1") == "r1" && r.getAs[String]("r2") == "r2")
    assert(r.getAs[Long]("n_items") == 50L)
    assert(math.abs(r.getAs[Double]("po") - 0.70) < 1e-12)
    assert(math.abs(r.getAs[Double]("pe") - 0.50) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - 0.40) < 1e-12)
  }

  test("pairwise marginals use only jointly rated items") {
    // r3 rates a disjoint item range from r1: no (r1,r3) row at all;
    // (r1,r2) unchanged by r3's presence
    val extra = (51 to 60).flatMap(i => Seq((i, "r2", "Y"), (i, "r3", "Y"))).toDF("item", "rater", "label")
    val out = Agreement.cohenKappa(cohenToy.unionAll(extra), "item", "rater", "label")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out.keySet == Set(("r1", "r2"), ("r2", "r3")))
    assert(out(("r1", "r2")) == 50L)
    assert(out(("r2", "r3")) == 10L)
  }

  test("Fleiss' kappa matches the classic 10-item psychiatric example") {
    // Fleiss (1971)-style worked example used across texts: 10 items,
    // 14 raters, 5 categories; expected kappa ~= 0.20993
    val counts = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val rows = counts.zipWithIndex.flatMap { case (cs, item) =>
      cs.zipWithIndex.flatMap { case (c, cat) => Seq.fill(c)((item, s"c$cat")) }
    }
    val out = Agreement.fleissKappa(rows.toDF("item", "label"), "item", "label").head()
    assert(out.getAs[Long]("n_items") == 10L && out.getAs[Long]("n_raters") == 14L)
    assert(math.abs(out.getAs[Double]("kappa") - 0.20993) < 5e-5)
  }

  test("Fleiss fails loudly on ragged rating counts") {
    val ragged = Seq((1, "a"), (1, "b"), (2, "a")).toDF("item", "label")
    val e = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(ragged, "item", "label")
    }
    assert(e.getMessage.contains("constant"))
  }

  test("results are partitioning-invariant (exact)") {
    val a = Agreement.cohenKappa(cohenToy.repartition(1), "item", "rater", "label")
      .collect().map(_.toSeq).toSet
    val b = Agreement.cohenKappa(cohenToy.repartition(17), "item", "rater", "label")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
