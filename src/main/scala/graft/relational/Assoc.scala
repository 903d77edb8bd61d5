package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise association-rule mining (the market-basket slice of Apriori:
 * 2-itemsets, which in practice carries most of the value of the full
 * lattice): for every ordered item pair (a -> c) co-occurring in at least
 * `minSupport` baskets, emit support, confidence = sup(a,c)/sup(a) and
 * lift = confidence / (sup(c)/N).
 *
 * Distributed shape: (basket, item) dedup, then ONE self-equi-join on the
 * basket key — pair fan-out is bounded by basket size squared, never by
 * the table — with map-side-combined pair counts; item supports and the
 * basket count join back as broadcastable aggregates. All metrics are
 * int/int divisions (exactly-rounded IEEE doubles), so results are
 * engine-exact.
 */
object Assoc {

  /** `maxBasketSize > 0` caps the pair fan-out: baskets with more distinct
    * items are excluded from mining entirely (all metrics stay consistent
    * over the kept corpus), so one pathological mega-basket cannot square
    * the self-join shuffle. Use [[pairRulesWithAudit]] to also get the
    * excluded baskets. 0 (default) = uncapped. */
  def pairRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketSize: Int = 0): DataFrame =
    pairRulesWithAudit(df, basketCol, itemCol, minSupport, maxBasketSize)._1

  /** [[pairRules]] plus the audit side: one row per excluded basket
    * (basketCol, n_items). Empty when maxBasketSize <= 0 or nothing
    * exceeds the cap. */
  def pairRulesWithAudit(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketSize: Int = 0): (DataFrame, DataFrame) = {
    val items0 = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val sizes = items0.groupBy("__b").agg(count(lit(1)).as("n_items"))
    val (items1, audit) =
      if (maxBasketSize <= 0)
        (items0, sizes.filter(lit(false)).select(col("__b").as(basketCol), col("n_items")))
      else {
        val over = sizes.filter(col("n_items") > maxBasketSize)
        // left_anti on the basket key — the same key the pair join hashes
        // on, and the oversized set is by definition the rare tail
        (items0.join(over.select("__b"), Seq("__b"), "left_anti"),
          over.select(col("__b").as(basketCol), col("n_items")))
      }
    // items feeds nb, itemCnt and BOTH self-join sides — inlined, each
    // reference re-ran the source scan + distinct (4 corpus passes).
    // One materialized pass; the self-join then reads checkpoint blocks.
    val items = items1.localCheckpoint()
    val nb = broadcast(items.agg(countDistinct(col("__b")).as("__nb")))
    val itemCnt = items.groupBy("__i").agg(count(lit(1)).as("__ci"))
    val a = items.select(col("__b"), col("__i").as("__x"))
    val c = items.select(col("__b"), col("__i").as("__y"))
    val pairs = a.join(c, Seq("__b"))
      .filter(col("__x") < col("__y"))
      .groupBy("__x", "__y").agg(count(lit(1)).as("__cxy"))
      .filter(col("__cxy") >= minSupport)
    val directed = pairs.select(col("__x").as("ante"), col("__y").as("cons"), col("__cxy"))
      .unionByName(pairs.select(col("__y").as("ante"), col("__x").as("cons"), col("__cxy")))
    val rules = directed
      .join(itemCnt.select(col("__i").as("ante"), col("__ci").as("__ca")), Seq("ante"))
      .join(itemCnt.select(col("__i").as("cons"), col("__ci").as("__cc")), Seq("cons"))
      .crossJoin(nb)
      .select(col("ante"), col("cons"), col("__cxy").as("support"),
        (round(col("__cxy").cast("double") / col("__ca"), 6) + lit(0.0)).as("confidence"),
        (round((col("__cxy").cast("double") / col("__ca")) /
               (col("__cc").cast("double") / col("__nb")), 6) + lit(0.0)).as("lift"))
    (rules, audit)
  }
}
