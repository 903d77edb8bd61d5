package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-2 relational operators vs brute-force formulations on
  * deterministic LCG data: interval-overlap join, SCD2, triangle count. */
class GraphCdcIntervalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("intervalOverlap matches brute-force inequality join, exactly once per pair") {
    val r = lcg(11).map(x => math.floorMod(x, 500L))
    val left = (1L to 120L).map { i => val lo = r.next(); (i, lo, lo + r.next() % 60) }
    val right = (1L to 150L).map { i => val lo = r.next(); (i, lo, lo + r.next() % 40) }
    val got = RangeJoin.intervalOverlap(
        left.toDF("lid", "llo", "lhi"), col("llo"), col("lhi"),
        right.toDF("rid", "rlo", "rhi"), col("rlo"), col("rhi"),
        binSize = 50L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expected = for {
      (lid, llo, lhi) <- left
      (rid, rlo, rhi) <- right
      if llo <= rhi && rlo <= lhi
    } yield (lid, rid)
    assert(got.sorted == expected.sorted) // duplicates would fail here too
  }

  test("intervalOverlap with bin size far from interval lengths stays exact") {
    val r = lcg(23).map(x => math.floorMod(x, 300L))
    val left = (1L to 60L).map { i => val lo = r.next(); (i, lo, lo + r.next() % 100) }
    val right = (1L to 60L).map { i => val lo = r.next(); (i, lo, lo + r.next() % 5) }
    for (bin <- Seq(7L, 1000L)) {
      val got = RangeJoin.intervalOverlap(
          left.toDF("lid", "llo", "lhi"), col("llo"), col("lhi"),
          right.toDF("rid", "rlo", "rhi"), col("rlo"), col("rhi"), bin)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      val expected = for {
        (lid, llo, lhi) <- left; (rid, rlo, rhi) <- right
        if llo <= rhi && rlo <= lhi
      } yield (lid, rid)
      assert(got.sorted == expected.sorted, s"bin=$bin")
    }
  }

  test("scd2 versions tile each key's timeline with one open current row") {
    val r = lcg(37)
    val changes = (1L to 200L).map(i =>
      (math.floorMod(r.next(), 8L), i, math.floorMod(r.next(), 1000L)))
    val out = Cdc.scd2(changes.toDF("k", "cid", "ts"), "k", "ts", Seq("ts", "cid"))
      .select("k", "cid", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, Long, Long, Option[Long], Int, Boolean)].collect()

    val byKey = out.groupBy(_._1)
    for ((k, rows) <- byKey) {
      val sorted = rows.sortBy(_._5)
      // versions are 1..n dense
      assert(sorted.map(_._5).toSeq == (1 to sorted.length))
      // exactly one current row, and it is the last version
      assert(sorted.count(_._6) == 1 && sorted.last._6)
      // valid_to of version i == valid_from of version i+1
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      // ordering matches (ts, cid)
      val expectedOrder = changes.filter(_._1 == k).sortBy(c => (c._3, c._2)).map(_._2)
      assert(sorted.map(_._2).toSeq == expectedOrder)
    }
  }

  test("pageRank: mass conservation on a regular graph, hubs rank higher on a star") {
    // 2-regular ring: every node identical by symmetry -> uniform ranks
    val ring = (0L until 20L).flatMap(i => Seq((i, (i + 1) % 20), (i, (i + 2) % 20)))
    val pr = Graph.pageRank(ring.toDF("s", "d"), "s", "d", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(pr.values.toSet.size == 1) // exactly uniform (decimal-pinned arithmetic)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    // star + return edges: the hub collects 0.85 of the leaves' mass
    val star = (1L to 10L).flatMap(i => Seq((i, 0L), (0L, i)))
    val pr2 = Graph.pageRank(star.toDF("s", "d"), "s", "d", iters = 8)
      .as[(Long, Double)].collect().toMap
    assert(pr2(0L) > 5 * pr2(1L))
    assert((1L to 10L).map(pr2).toSet.size == 1) // leaves symmetric
  }

  test("labelPropagation: planted communities converge to one label each; brute-force round parity") {
    // two disjoint dense blocks (cliques of 6) + no cross edges
    val blockA = for (i <- 0L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val blockB = for (i <- 10L to 15L; j <- (i + 1) to 15L) yield (i, j)
    val lp = Graph.labelPropagation((blockA ++ blockB).toDF("s", "d"), "s", "d", rounds = 4)
      .as[(Long, Long)].collect().toMap
    // within a clique, neighbor-majority is all-ties -> min neighbor label;
    // after round 2 every member of a clique agrees
    assert((0L to 5L).map(lp).toSet.size == 1)
    assert((10L to 15L).map(lp).toSet.size == 1)
    assert(lp.filterKeys(_ <= 5L).values.toSet != lp.filterKeys(_ >= 10L).values.toSet)

    // brute-force synchronous replay on a random graph: identical labels
    val r = lcg(97).map(x => math.floorMod(x, 20L))
    val raw = (1 to 120).map(_ => (r.next(), r.next())).filter(e => e._1 != e._2)
    val und = (raw ++ raw.map(_.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size).toSeq
        n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Graph.labelPropagation(raw.toDF("s", "d"), "s", "d", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == lab)
  }

  test("triangleCount matches brute force on random graph, ignores dup/reversed/self edges") {
    val r = lcg(53).map(x => math.floorMod(x, 30L))
    val raw = (1 to 400).map(_ => (r.next(), r.next()))
    // include reversed duplicates explicitly
    val edges = (raw ++ raw.map(_.swap)).toDF("s", "d")
    val row = Graph.triangleCount(edges, "s", "d")
      .as[(Long, Long, Long)].collect().head

    val und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    val ns = nodes.toSeq.sorted
    var tri = 0L
    for {
      i <- ns.indices; j <- (i + 1) until ns.length
      if und(( ns(i), ns(j) ))
      k <- (j + 1) until ns.length
      if und((ns(i), ns(k))) && und((ns(j), ns(k)))
    } tri += 1
    assert(row == ((nodes.size.toLong, und.size.toLong, tri)))
  }

  test("kCore matches the sequential peeling fixpoint and reports convergence") {
    // LCG graph on 40 nodes, plus a planted K6 clique so the 5-core is
    // non-trivially smaller than the graph
    val clique = for { i <- 100L to 105L; j <- 100L to 105L if i < j } yield (i, j)
    val rand = lcg(7).take(120).toSeq.map(x =>
      (math.floorMod(x, 40L), math.floorMod(x >> 13, 40L))).filter(p => p._1 != p._2)
    val edges = (clique ++ rand).toDF("src", "dst")
    val out = Graph.kCore(edges, "src", "dst", k = 5, rounds = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.forall(_._3), "must converge within 12 rounds on 46 nodes")
    // sequential reference peeling
    var und = (clique ++ rand).map(p => (p._1 min p._2, p._1 max p._2)).distinct.toSet
    var changed = true
    while (changed) {
      val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= 5).keySet
      val next = und.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != und.size
      und = next
    }
    val refDeg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => (n, xs.size.toLong) }
    assert(out.map(t => (t._1, t._2)).toMap == refDeg)
    // the planted clique survives (every K6 vertex has degree >= 5)
    assert((100L to 105L).forall(n => refDeg.contains(n)))
    // a 1-round budget on a graph needing more peels reports non-convergence
    val shallow = Graph.kCore(edges, "src", "dst", k = 5, rounds = 1).collect()
    if (shallow.nonEmpty && refDeg.size != shallow.length)
      assert(shallow.forall(!_.getBoolean(2)), "partial peel must be loud")
  }
}
