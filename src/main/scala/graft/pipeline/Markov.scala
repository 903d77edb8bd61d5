package graft.pipeline

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Absorbing-Markov-chain kernels for the catalog's attribution /
 * expected-steps / reachability queries.
 *
 * These used to be expressed as `rounds`-deep chained CTEs inlined into ONE
 * SQL statement. Catalyst inlines the whole chain (5 scenarios x 24 rounds =
 * 120 dependent CTE steps for attribution), producing a plan whose task
 * binaries alone were 16 MiB and whose optimization dominated wall-clock
 * (690 s at sf0.1, data-INDEPENDENT — an optimizer blow-up, not an execution
 * cost).
 *
 * The scale-correct shape: ONE windowed scan over `events` builds the
 * transition matrix (a shuffle keyed by user), after which the state space is
 * the distinct event-type set — metadata-sized at ANY corpus scale (the
 * `Dedup.connectedComponents` driver-DSU precedent: bounded driver state,
 * fail-loud if violated). The fixed-point rounds then run on the driver with
 * arithmetic that replicates the SQL step EXACTLY — Spark's round(double, s)
 * is toString-based BigDecimal HALF_UP, the decimal(24,12) sum is an exact
 * scale-12 BigDecimal sum, SQL sum() skips NULLs (absent states) — so the
 * result is bit-identical to the DuckDB oracle's unrolled MATERIALIZED chain.
 */
object Markov {

  /** Hard bound on driver-held state: these chains are over event-TYPE
    * alphabets (single digits in practice); anything larger is a misuse. */
  private val MaxStates = 10000

  /** Spark `round(x, s)` for DoubleType: toString-based BigDecimal HALF_UP
    * (RoundBase.nullSafeEval). */
  private def rnd(x: Double, s: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else new JBigDecimal(java.lang.Double.toString(x))
      .setScale(s, RoundingMode.HALF_UP).doubleValue

  /** Spark `cast(x as decimal(24,12))`: toString-based BigDecimal rescaled
    * HALF_UP to scale 12 (Decimal.toPrecision). */
  private def dec12(x: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(x))
      .setScale(12, RoundingMode.HALF_UP)

  /** SQL `cast(coalesce(sum(cast(round(p * t, 12) as decimal(24,12))), 0) as
    * double)` over the (p, maybe-t) terms: NULL t rows are skipped (SQL sum
    * ignores NULLs), empty/all-NULL sums coalesce to 0. */
  private def sumTerms(terms: Iterable[(Double, Option[Double])]): Double = {
    var acc = JBigDecimal.ZERO
    terms.foreach { case (p, t) =>
      t.foreach { tv =>
        val r = rnd(p * tv, 12)
        // Spark cast(NaN/Inf as decimal) is NULL (non-ANSI) and sum skips
        // NULLs — mirror that instead of letting BigDecimal throw
        if (!r.isNaN && !r.isInfinite) acc = acc.add(dec12(r))
      }
    }
    acc.doubleValue
  }

  private def result(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  /** Transition matrix rows (cur, nxt, p) for the events chain. `dropCoalesce`
    * adds the synthetic 'drop' absorber for users' final events (q489); q441
    * instead filters NULL-next rows out. */
  private def transitions(spark: SparkSession, dropCoalesce: Boolean): Seq[(String, String, Double)] = {
    val nxtExpr =
      if (dropCoalesce)
        "coalesce(lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id), 'drop')"
      else "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    val nxtFilt = if (dropCoalesce) "" else "nxt IS NOT NULL AND "
    val rows = spark.sql(
      s"""WITH seq AS (
         |  SELECT user_id, event_type AS cur, $nxtExpr AS nxt FROM events),
         |tr AS (SELECT cur, nxt FROM seq WHERE ${nxtFilt}cur <> 'purchase'),
         |tot AS (SELECT cur, cast(count(*) as bigint) AS n FROM tr GROUP BY cur)
         |SELECT t.cur, t.nxt, round(cast(count(*) as double) / tot.n, 9) AS p
         |FROM tr t JOIN tot ON tot.cur = t.cur
         |GROUP BY t.cur, t.nxt, tot.n""".stripMargin).collect()
    require(rows.length <= MaxStates,
      s"Markov state space ${rows.length} exceeds driver bound $MaxStates")
    rows.toSeq.map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
  }

  /**
   * Markov data-driven attribution (q489): first-order chain with
   * purchase/drop absorbing states; per-channel removal effect
   * 1 - conv(without channel)/conv(full); absorption probabilities by
   * `rounds` pinned iterations per scenario. Requires an `events` temp view.
   */
  def attribution(spark: SparkSession, rounds: Int): DataFrame = {
    val channels = Seq("view", "click", "signup", "error")
    val q = transitions(spark, dropCoalesce = true)
    // first-event share: the second (and last) distributed pass
    val pi: Seq[(String, Double)] = spark.sql(
      """WITH fe AS (
        |  SELECT user_id, event_type AS s,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |  FROM events)
        |SELECT s, round(cast(count(*) as double)
        |  / (SELECT count(DISTINCT user_id) FROM events), 9) AS share
        |FROM fe WHERE rk = 1 GROUP BY s""".stripMargin)
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))
    val pabs: Map[String, Double] =
      q.collect { case (cur, "purchase", p) => cur -> p }.toMap
    val states: Seq[String] = q.map(_._1).distinct.sorted

    // conv(scenario): absorption probability after `rounds` steps, weighted
    // by first-event share; ch = None is the full chain
    def conv(ch: Option[String]): Double = {
      val st = states.filterNot(ch.contains)
      val qq = q.filter { case (cur, nxt, _) =>
        nxt != "purchase" && nxt != "drop" &&
          !ch.contains(cur) && !ch.contains(nxt)
      }.groupBy(_._1)
      var a: Map[String, Double] = st.map(_ -> 0.0).toMap
      for (_ <- 1 to rounds) {
        a = st.map { s =>
          val base = pabs.getOrElse(s, 0.0)
          val terms = qq.getOrElse(s, Nil).map { case (_, nxt, p) => (p, a.get(nxt)) }
          s -> rnd(base + sumTerms(terms), 9)
        }.toMap
      }
      var acc = JBigDecimal.ZERO
      pi.foreach { case (s, share) =>
        val v =
          if (s == "purchase") 1.0
          else if (ch.contains(s)) 0.0
          else a.getOrElse(s, 0.0)
        val r = rnd(share * v, 12)
        if (!r.isNaN && !r.isInfinite) acc = acc.add(dec12(r))
      }
      acc.doubleValue
    }

    val convN = conv(None)
    val res = channels.map(c => (c, rnd(1 - conv(Some(c)) / convN, 6) + 0.0))
    val sumRe = res.map(_._2).sum
    val rows = res.sortBy(_._1).map { case (c, re) =>
      Row(c, re, rnd(re / sumRe, 6) + 0.0)
    }
    result(spark, StructType(Seq(
      StructField("channel", StringType),
      StructField("removal_effect", DoubleType),
      StructField("attribution_share", DoubleType))), rows)
  }

  /**
   * Expected steps to 'purchase' from each transient state (q441):
   * t_{k+1} = 1 + Q t_k, `rounds` pinned iterations over the round-9-pinned
   * transient transition matrix. Requires an `events` temp view.
   */
  def absorbingSteps(spark: SparkSession, rounds: Int): DataFrame = {
    val q = transitions(spark, dropCoalesce = false)
    val states = q.map(_._1).distinct.sorted
    val qq = q.filter(_._2 != "purchase").groupBy(_._1)
    var t: Map[String, Double] = states.map(_ -> 0.0).toMap
    for (_ <- 1 to rounds) {
      t = states.map { s =>
        val terms = qq.getOrElse(s, Nil).map { case (_, nxt, p) => (p, t.get(nxt)) }
        s -> rnd(1.0 + sumTerms(terms), 9)
      }.toMap
    }
    val rows = states.map(s => Row(s, rnd(t(s), 6) + 0.0))
    result(spark, StructType(Seq(
      StructField("state", StringType),
      StructField("expected_steps", DoubleType))), rows)
  }

  /**
   * Bow-tie decomposition of the synthetic %60 directed graph (q649):
   * forward/backward `rounds`-step reachability from the max-degree pivot.
   * The node domain is 60 by construction (collected once, fail-loud bound);
   * frontier expansion is exact integer set algebra on the driver.
   * Requires a `customer` temp view.
   */
  def bowtie(spark: SparkSession, rounds: Int): DataFrame = {
    val e: Seq[(Long, Long)] = spark.sql(
      """WITH eraw AS (
        |  SELECT c_custkey % 60 AS s, (c_custkey * 7 + 3) % 60 AS v FROM customer
        |  UNION ALL
        |  SELECT (c_custkey * 3) % 60 AS s, (c_custkey * 11 + 5) % 60 AS v FROM customer)
        |SELECT DISTINCT cast(s as bigint) AS s, cast(v as bigint) AS v
        |FROM eraw WHERE s <> v""".stripMargin)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    require(e.length <= MaxStates, s"bowtie edge set ${e.length} exceeds $MaxStates")
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).view.mapValues(_.size)
    val pivot = nodes.map(n => (n, deg(n))).minBy { case (n, d) => (-d, n) }._1
    val fwd = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bwd = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def reach(adj: Map[Long, Seq[Long]]): Set[Long] = {
      var r = Set(pivot)
      for (_ <- 1 to rounds)
        r = r ++ r.flatMap(n => adj.getOrElse(n, Nil))
      r
    }
    val f = reach(fwd)
    val b = reach(bwd)
    val rows = Seq(Row(nodes.size.toLong, (f & b).size.toLong,
      (b -- f).size.toLong, (f -- b).size.toLong,
      nodes.count(n => !f(n) && !b(n)).toLong))
    result(spark, StructType(Seq(
      StructField("n_nodes", LongType),
      StructField("core", LongType),
      StructField("in_", LongType),
      StructField("out_", LongType),
      StructField("disconnected", LongType))), rows)
  }
}
