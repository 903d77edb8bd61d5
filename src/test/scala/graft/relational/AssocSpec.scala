package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pairwise association rules + the mega-basket cap (one pathological
  * basket must not square the self-join shuffle). */
class AssocSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 small baskets: {a,b} x3, {a,c}; pair (a,b) support 3, (a,c) support 1
  private def smallBaskets = Seq(
    (1L, "a"), (1L, "b"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"),
    (4L, "a"), (4L, "c")
  ).toDF("basket", "item")

  test("support/confidence/lift on a hand-checked basket set") {
    val rules = Assoc.pairRules(smallBaskets, "basket", "item", minSupport = 2L)
      .orderBy("ante", "cons")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    // (a,b): sup 3; conf(a->b) = 3/4, lift = (3/4)/(3/4) = 1
    //        conf(b->a) = 3/3 = 1, lift = 1/(4/4) = 1
    assert(rules == Seq(
      ("a", "b", 3L, 0.75, 1.0),
      ("b", "a", 3L, 1.0, 1.0)))
  }

  test("maxBasketSize excludes mega-baskets from mining and reports them") {
    // one 50-item mega-basket on top of the small set: uncapped, it alone
    // contributes 50*49/2 pairs; capped, mining must see only the small set
    val mega = (0 until 50).map(i => (99L, s"m$i")).toDF("basket", "item")
    val df = smallBaskets.unionByName(mega)
    val uncapped = Assoc.pairRules(df, "basket", "item", minSupport = 1L)
    assert(uncapped.count() == 2 * (2 + 50 * 49 / 2)) // directed pairs

    val (rules, audit) = Assoc.pairRulesWithAudit(df, "basket", "item",
      minSupport = 1L, maxBasketSize = 10)
    val capped = rules.orderBy("ante", "cons")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    // identical to mining the small set alone (metrics consistent over the
    // kept corpus: N baskets = 4, supports unchanged)
    val alone = Assoc.pairRules(smallBaskets, "basket", "item", minSupport = 1L)
      .orderBy("ante", "cons")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(capped == alone)
    assert(audit.as[(Long, Long)].collect().toSeq == Seq((99L, 50L)))

    // cap that nothing exceeds: identical output, empty audit
    val (same, none) = Assoc.pairRulesWithAudit(smallBaskets, "basket", "item", 1L, 10)
    assert(same.orderBy("ante", "cons").collect().toSeq ==
      alone.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5)))
    assert(none.count() == 0)
    // default (0) audit is empty and rules match the uncapped path
    val (dflt, dAudit) = Assoc.pairRulesWithAudit(df, "basket", "item", 1L)
    assert(dflt.count() == uncapped.count() && dAudit.count() == 0)
  }
}
