package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salting for skewed equi-joins.
 *
 * A shuffle equi-join hashes rows by join key, so ONE hot key (a
 * power-law user, a default/sentinel value) lands on one reducer and
 * serializes the stage — the classic 100 TB failure mode. AQE's runtime
 * skew splitting handles sort-merge joins it can measure; explicit
 * salting remains the deterministic, planner-independent fix and also
 * covers aggregation-feeding joins AQE won't split.
 *
 * [[saltedJoin]] appends a salt in [0, salt) to the join key on both
 * sides: the skewed side derives it deterministically from a caller-named
 * stable column (hash mod salt — NO rand(), so retries/speculative tasks
 * see the same salt), the other side replicates each row across ALL salt
 * values. Each skewed-side row then meets exactly one replica of each
 * matching row, so the result multiset is IDENTICAL to the plain join
 * while the hot key's rows spread across `salt` reducers. Cost: the
 * non-skewed side shuffles `salt` times its size — pick the smaller side
 * to replicate.
 */
object SkewJoin {

  /**
   * Inner equi-join of `skewed` (hot keys) with `other` (replicated).
   *
   * @param skewedKeys / otherKeys  positional equi keys
   * @param saltCol  stable skewed-side column the salt is hashed from
   * @param salt     fan-out factor (number of replicas of `other`)
   */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      skewedKeys: Seq[String],
      otherKeys: Seq[String],
      saltCol: String,
      salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    require(skewedKeys.length == otherKeys.length && skewedKeys.nonEmpty,
      "saltedJoin needs at least one equi key")
    val s = skewed.withColumn("__salt", pmod(xxhash64(col(saltCol)), lit(salt)).cast("int"))
    val o = other.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    val cond = skewedKeys.zip(otherKeys)
      .map { case (a, b) => s(a) === o(b) }
      .reduce(_ && _) && (s("__salt") === o("__salt"))
    s.join(o, cond).drop("__salt")
  }
}
