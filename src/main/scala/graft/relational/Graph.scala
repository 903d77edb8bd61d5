package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph analytics over edge-list DataFrames (the relational
 * representation a lakehouse actually stores). Companion of the iterative
 * BFS join loop (SparkEntry q178); these are the one-shot algorithms that
 * need no driver-side iteration.
 */
object Graph {

  /**
   * Exact triangle count via degree-ordered edge orientation
   * (node-iterator++ / the standard MapReduce formulation): orient every
   * undirected edge from the lower-(degree, id) endpoint to the higher one,
   * build wedges at each node from its out-neighbors, close them against
   * the oriented edge list. Every triangle is counted EXACTLY once (at its
   * lowest-order vertex), and the wedge fan-out is bounded by out-degree,
   * which orientation caps at O(sqrt(|E|)) for any degree distribution —
   * the property that keeps skewed (power-law) graphs from exploding the
   * shuffle, where a naive neighbor join would square the hub degrees.
   *
   * @param edges edge list; direction and duplicates are ignored
   *              (canonicalized internally), self-loops dropped
   * @return single row: (n_nodes, n_edges, n_triangles)
   */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"), greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orientation key: (degree, id) — total order
    val withKeys = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val oriented = withKeys.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("a"), col("v").as("b"),
          struct(col("dv").as("d"), col("v").as("n")).as("kb")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"),
          struct(col("du").as("d"), col("u").as("n")).as("kb")))
        .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"), col("e.kb").as("kb"))
    // wedges at the lowest-order vertex; the closing edge is oriented
    // x -> y exactly when kb(x) < kb(y), which the wedge ordering matches
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.kb") < col("e2.kb"))
      .select(col("e1.b").as("x"), col("e2.b").as("y"))
    val closing = oriented.select(col("a").as("x"), col("b").as("y"))
    // distinct wedges can close through the same edge (different apex) —
    // each is its own triangle, so inner join (not semi) then count
    val tri = wedges.join(closing, Seq("x", "y")).agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val es = und.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(es).crossJoin(tri)
  }

  /**
   * PageRank by power iteration over the edge list, with every arithmetic
   * step pinned for cross-engine reproducibility: per-edge contributions
   * round to 9 decimals and sum as decimal (order-independent regardless
   * of partitioning), and each iteration's rank is itself re-rounded —
   * so the same graph gives bit-identical ranks on ANY engine that
   * implements the same recurrence (the distributed analog of the q87/q198
   * decimal-fold convention).
   *
   * Per iteration: one shuffle (the contribution aggregation on dst) plus
   * a broadcast-sized join of ranks to edges keyed by src; ranks are
   * localCheckpointed each round so the lineage stays flat (the same
   * eager-iteration shape as the BFS loop, q178). Dangling nodes (no
   * out-edges) leak their mass — callers wanting strict stochastic
   * semantics should add self-loops.
   *
   * r_{t+1}(v) = round9((1-damping) * r0 + damping * S(v)),
   * S(v) = Sigma_{u->v} round9(r_t(u) / outdeg(u)).
   */
  /**
   * Bellman-Ford single-source shortest paths, bounded to `rounds`
   * relaxation rounds (= shortest distance using at most `rounds` hops).
   *
   * Weights are pinned to decimal(12,2) and distances to decimal(20,2), so
   * every `dist + w` and `min` is exact integer arithmetic — the result is
   * bit-identical across engines, partitionings, and retry schedules.
   *
   * Distributed shape: parallel edges collapse to their min weight once
   * up front; each round is ONE equi-join of the current distance frontier
   * against the edge list (shuffle on the node key) plus a min-aggregation
   * with map-side partials. `localCheckpoint` cuts the growing lineage so
   * round k does not replay rounds 1..k-1 (the q178 BFS discipline). The
   * distance table is bounded by |V|; nothing lands on the driver.
   */
  /**
   * Adamic-Adar link prediction: for each non-adjacent pair (u, v),
   * score = sum over common neighbors z of 1/ln(deg(z)). Wedge
   * enumeration at each common neighbor — the shuffle fan-out is
   * sum(deg^2), the standard wedge bound (cap degrees upstream for
   * power-law graphs). Scores fold round-9 decimal terms, so any
   * partitioning produces identical scores; ties rank (score DESC, u, v).
   */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int = 20): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"), greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val adj = und.select(col("u").as("n"), col("v").as("nb"))
      .unionAll(und.select(col("v").as("n"), col("u").as("nb")))
    val deg = adj.groupBy(col("n").as("z")).agg(count(lit(1)).as("d"))
    val wedges = adj.as("a").join(adj.as("b"),
        col("a.nb") === col("b.nb") && col("a.n") < col("b.n"))
      .select(col("a.n").as("wu"), col("b.n").as("wv"), col("a.nb").as("z"))
    val scored = wedges.join(deg, Seq("z"))
      .filter(col("d") > 1)
      .groupBy(col("wu"), col("wv"))
      .agg(sum(expr("cast(round(1.0 / ln(cast(d as double)), 9) as decimal(20,9))"))
        .as("s"))
    scored
      .join(und, scored("wu") === und("u") && scored("wv") === und("v"), "left_anti")
      .select(col("wu").as("u"), col("wv").as("v"),
        expr("round(cast(s as double), 6) + 0.0").as("aa_score"))
      .orderBy(col("aa_score").desc, col("u"), col("v"))
      .limit(topK)
  }

  def bellmanFord(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      source: Long,
      rounds: Int): DataFrame = {
    // edges pre-partitioned on the relax key s: the checkpointed RDD keeps
    // its partitioning, so per-round joins re-exchange only the (small)
    // frontier side, never the edge set
    val e = edges.select(
        col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("v"),
        col(weightCol).cast("decimal(12,2)").as("w"))
      .filter(col("s").isNotNull && col("v").isNotNull && col("w").isNotNull &&
        col("s") =!= col("v"))
      .groupBy("s", "v").agg(min("w").as("w"))
      .repartition(col("s"))
      .localCheckpoint()
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0).cast("decimal(20,2)").as("dist"))
    var it = 0
    while (it < rounds) {
      val relaxed = dist.join(e, dist("node") === e("s"))
        .select(col("v").as("node"),
          (col("dist") + col("w")).cast("decimal(20,2)").as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
      it += 1
      // lineage cut every other round: each uncut round doubles plan depth
      // by one join+agg, so an interval of 2 keeps plans shallow while
      // halving the materialization jobs that dominate small-graph rounds
      if (it % 2 == 0 || it == rounds) dist = dist.localCheckpoint()
    }
    dist.select(col("node"), col("dist"))
  }

  /**
   * Synchronous label propagation (community detection, Raghavan et al.
   * 2007) made DETERMINISTIC: every node simultaneously adopts the most
   * frequent label among its neighbors, ties broken by the smallest label —
   * no RNG, no asynchronous update order, so the result is a pure function
   * of the edge set and replays identically in any engine (q271 unrolls the
   * rounds as SQL CTEs the way q218 does for PageRank).
   *
   * Distributed shape per round: one map-side-combined (node, label) count
   * aggregation + a per-node argmax window over at most degree-many rows —
   * both bounded by the adjacency size, never the graph squared. The
   * undirected edge set is deduped, pre-partitioned on the probe key once,
   * and the label frontier localCheckpoints every other round (same
   * lineage discipline as [[bellmanFord]]/[[pageRank]]).
   *
   * @param rounds fixed synchronous rounds (LPA oscillates on bipartite
   *               structures; a fixed budget is the deterministic contract)
   * @return (node, label) — nodes sharing a label form a community
   */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    // undirected adjacency, deduped, partitioned once on the probe key
    val und = dir.unionAll(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("b"))
      .localCheckpoint()
    var lab = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    val byNode = Window.partitionBy("node")
      .orderBy(col("c").desc, col("label").asc)
    var it = 0
    while (it < rounds) {
      lab = und.join(lab.select(col("node").as("b"), col("label")), Seq("b"))
        .groupBy(col("a").as("node"), col("label")).agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(byNode))
        .filter(col("rk") === 1)
        .select(col("node"), col("label"))
      it += 1
      if (it % 2 == 0 || it == rounds) lab = lab.localCheckpoint()
    }
    lab
  }

  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    // static sides partitioned on the contribution key s ONCE and
    // materialized — per-iteration joins then re-exchange only the rank
    // frontier, and outDeg is not recomputed every round
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("v"))
      .filter(col("s").isNotNull && col("v").isNotNull && col("s") =!= col("v"))
      .distinct()
      .repartition(col("s"))
      .localCheckpoint()
    val outDeg = e.groupBy("s").agg(count(lit(1)).as("deg")).localCheckpoint()
    val nodes = e.select(col("s").as("node")).unionAll(e.select(col("v").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    // pinned 9-decimal constants as EXACT decimals (never double literals
    // re-rounded downstream — the round-8 float discipline)
    val r0Dec = java.math.BigDecimal.valueOf(math.rint(1.0 / n * 1e9).toLong, 9)
    val baseDec = java.math.BigDecimal.valueOf(
      math.rint((1.0 - damping) * r0Dec.doubleValue * 1e9).toLong, 9)
    val dampDec = java.math.BigDecimal.valueOf(damping)
    var rank = nodes.withColumn("r", lit(r0Dec).cast("decimal(28,9)"))
    var it = 0
    while (it < iters) {
      val contribs = e.join(rank.select(col("node").as("s"), col("r")), Seq("s"))
        .join(outDeg, Seq("s"))
        .select(col("v").as("node"),
          // exact half-up nano-unit ratio r/deg — mirrors the unrolled
          // SQL oracle term for term (round-8 float discipline)
          expr("cast((cast(((2 * cast(r * 1000000000 as bigint) + deg)" +
            " - ((2 * cast(r * 1000000000 as bigint) + deg) % (2 * deg)))" +
            " / (2 * deg) as bigint)) * 0.000000001 as decimal(28,9))").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(baseDec) + lit(dampDec)
              * coalesce(col("in_mass"), lit(0)).cast("decimal(18,9)"), 9)
            .cast("decimal(28,9)").as("r"))
      it += 1
      // lineage cut every other iteration (same rationale as bellmanFord)
      if (it % 2 == 0 || it == iters) rank = rank.localCheckpoint()
    }
    rank.select(col("node"), col("r").cast("double").as("pagerank"))
  }

  /**
   * HITS hubs-and-authorities (Kleinberg) as fixed parallel rounds, the
   * directed-endorsement sibling of [[pageRank]]: each round is two
   * edge-joins (authority pull, hub push) + two L1 normalizations whose
   * totals are tiny aggregation outputs joined back. Scores fold
   * round-9 decimals (order-independent, oracle-replayable); static
   * edge sides are partitioned once and materialized, so per-round
   * shuffles move only the score frontier.
   */
  /**
   * Katz centrality, fixed rounds: x_{k+1}(v) = alpha * sum_{(s,v)} x_k(s)
   * + 1, with decimal(28,9) state and a round-9 pin per round so the
   * iteration is bit-exact against an unrolled SQL oracle. Same scale
   * shape as [[hits]]: static edges partitioned once on the join key,
   * per round one frontier equi-join + aggregation; the node-state
   * relation is the only thing that re-shuffles.
   */
  def katz(edges: DataFrame, srcCol: String, dstCol: String,
      alpha: Double, iters: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("v"))
      .filter(col("s").isNotNull && col("v").isNotNull && col("s") =!= col("v"))
      .distinct()
      .repartition(col("s"))
      .localCheckpoint()
    val nodes = e.select(col("s").as("node")).unionAll(e.select(col("v").as("node")))
      .distinct()
      .localCheckpoint()
    val dec = "decimal(28,9)"
    var x = nodes.withColumn("x", expr(s"cast(1.0 as $dec)"))
    var it = 0
    while (it < iters) {
      val m = e.join(x.select(col("node").as("s"), col("x")), Seq("s"))
        .groupBy(col("v").as("node"))
        .agg(sum(col("x")).as("m"))
      x = nodes.join(m, Seq("node"), "left")
        .select(col("node"),
          expr(s"cast(round(cast($alpha as double) * cast(coalesce(m, 0) as double) " +
            s"+ cast(1.0 as double), 9) as $dec)").as("x"))
        .localCheckpoint()
      it += 1
    }
    x.select(col("node"), expr("round(cast(x as double), 6) + 0.0").as("katz"))
  }

  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("v"))
      .filter(col("s").isNotNull && col("v").isNotNull && col("s") =!= col("v"))
      .distinct()
      .repartition(col("s"))
      .localCheckpoint()
    val nodes = e.select(col("s").as("node")).unionAll(e.select(col("v").as("node")))
      .distinct()
      .localCheckpoint()
    val dec = "decimal(28,9)"
    def l1norm(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(sum(col(c)).as("tot"))
      df.crossJoin(tot).select(col("node"),
        expr(s"cast(round(cast($c as double) / cast(tot as double), 9) as $dec)").as(c))
    }
    var hub = nodes.withColumn("h", expr(s"cast(1.0 as $dec)"))
    var auth = nodes.withColumn("a", expr(s"cast(1.0 as $dec)"))
    var it = 0
    while (it < iters) {
      val aRaw = e.join(hub.select(col("node").as("s"), col("h")), Seq("s"))
        .groupBy(col("v").as("node"))
        .agg(sum(col("h")).as("am"))
      auth = l1norm(nodes.join(aRaw, Seq("node"), "left")
        .select(col("node"), expr(s"cast(coalesce(am, 0) as $dec)").as("a")), "a")
        .localCheckpoint()
      val hRaw = e.join(auth.select(col("node").as("v"), col("a")), Seq("v"))
        .groupBy(col("s").as("node"))
        .agg(sum(col("a")).as("hm"))
      hub = l1norm(nodes.join(hRaw, Seq("node"), "left")
        .select(col("node"), expr(s"cast(coalesce(hm, 0) as $dec)").as("h")), "h")
        .localCheckpoint()
      it += 1
    }
    nodes.join(hub, Seq("node")).join(auth, Seq("node"))
      .select(col("node"),
        expr("round(cast(h as double), 6) + 0.0").as("hub"),
        expr("round(cast(a as double), 6) + 0.0").as("authority"))
  }

  /**
   * k-CORE membership by iterated degree peeling (Matula-Beck re-expressed
   * as parallel rounds): each round computes current degrees (one
   * map-side-combined aggregation) and drops every vertex below `k` with
   * two semi-joins on the edge list — a vertex whose neighbors all peel
   * away disappears with its last edge, exactly the k-core recurrence.
   * `rounds` is FIXED so the replay is engine-portable (the oracle unrolls
   * the same rounds); the `converged` column (no edge dropped in the last
   * round) makes a non-fixpoint result loud instead of silently partial —
   * raise `rounds` when it reads false. Peeling removes at least one
   * vertex per non-converged round, so `rounds` >= the peel depth (far
   * below the vertex count in practice) reaches the true k-core.
   *
   * At scale: per round one degree aggregation + two semi-joins, edges
   * localCheckpointed every other round (flat lineage, the
   * bellmanFord/labelPropagation discipline); no vertex state on the
   * driver.
   *
   * @return (node, core_deg, converged): surviving vertices with their
   *         degree inside the core.
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, "k >= 1, rounds >= 1")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    var e = und.localCheckpoint()
    var prevEdges = -1L
    var lastEdges = -1L
    var it = 0
    while (it < rounds) {
      val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("n"))
      val e2 = e
        .join(keep.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("n").as("v")), Seq("v"), "left_semi")
      it += 1
      e = if (it % 2 == 0 || it == rounds) e2.localCheckpoint() else e2
      if (it == rounds - 1) prevEdges = e.count()
      if (it == rounds) lastEdges = e.count()
    }
    // rounds == 1: convergence means the single peel dropped nothing
    if (prevEdges < 0) prevEdges = und.count()
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
    deg.withColumn("converged", lit(prevEdges == lastEdges))
  }

  /**
   * Betweenness centrality (Brandes 2001) re-expressed as level-
   * synchronous parallel rounds keyed by BFS source, so ALL sources run
   * concurrently through the same joins — the multi-source formulation
   * that distributes (per round: one frontier⋈adjacency join + one
   * not-yet-seen anti-join + one sum; never per-source driver loops).
   *
   * Forward: path counts sigma are exact BIGINT sums. Backward: the
   * dependency delta(v) = Σ_w sigma(v)/sigma(w)·(1+delta(w)) over
   * level-(d+1) successors, accumulated with the pageRank decimal
   * discipline — each term rounded to 9 decimals in double, summed as
   * decimal(28,9) so the fold is order-independent and engine-portable.
   *
   * Truncation is explicit: exploration stops at `maxDepth` levels and
   * the `complete` flag reports whether every BFS exhausted first (an
   * empty frontier before the budget). With `complete=true` the result
   * is EXACT Brandes; otherwise paths longer than maxDepth are ignored
   * — raise the budget when it reads false.
   *
   * `sources` (optional) restricts the BFS roots — the standard
   * sampled-approximation path at scale (pass a deterministic hash-mod
   * sample; centrality then estimates rather than counts). Undirected:
   * each geodesic is seen from both endpoints, so the final sum halves.
   *
   * @return (node, bc, complete) for every non-isolated vertex.
   */
  def betweenness(edges: DataFrame, srcCol: String, dstCol: String,
      maxDepth: Int, sources: Option[DataFrame] = None): DataFrame = {
    require(maxDepth >= 2, "maxDepth >= 2")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val adj = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .localCheckpoint()
    val nodes = adj.select(col("u").as("node")).distinct().localCheckpoint()
    val roots = sources.map(_.select(col("node"))).getOrElse(nodes)
    // forward sweep: levels(d) = (src, node, sigma) at distance d
    val f0 = roots.select(col("node").as("src"))
      .withColumn("node", col("src")).withColumn("sigma", lit(1L))
      .localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(f0)
    var seen = f0.select(col("src"), col("node")).localCheckpoint()
    var exhausted = false
    while (levels.size <= maxDepth && !exhausted) {
      val cur = levels.last
      val nxt = cur.join(adj, cur("node") === adj("u"))
        .select(col("src"), adj("v").as("node"), col("sigma"))
        .join(seen, Seq("src", "node"), "left_anti")
        .groupBy("src", "node").agg(sum(col("sigma")).as("sigma"))
        .localCheckpoint()
      if (nxt.isEmpty) exhausted = true
      else {
        levels += nxt
        seen = seen.unionAll(nxt.select(col("src"), col("node"))).localCheckpoint()
      }
    }
    val maxD = levels.size - 1
    // backward sweep: deltas(d) for nodes at level d, deepest first
    val dec = "decimal(28,9)"
    var deltaAbove: Option[DataFrame] = None
    val perLevel = (maxD - 1 to 1 by -1).map { d =>
      val fv = levels(d).select(col("src"), col("node").as("vn"), col("sigma").as("sv"))
      val fw = levels(d + 1).select(col("src"), col("node").as("wn"), col("sigma").as("sw"))
      val wd = (deltaAbove match {
        case Some(dd) => fw.join(dd.select(col("src"), col("vn").as("wn"),
            col("delta").as("dw")), Seq("src", "wn"), "left")
          .select(col("src"), col("wn"), col("sw"),
            coalesce(col("dw"), lit(0).cast(dec)).as("dw"))
        case None => fw.select(col("src"), col("wn"), col("sw"),
          lit(0).cast(dec).as("dw"))
      }).withColumnRenamed("src", "wsrc")
      val g = fv.join(adj, fv("vn") === adj("u"))
        .join(wd, col("wsrc") === fv("src") && col("wn") === adj("v"))
        .select(fv("src"), col("vn"),
          round(col("sv").cast("double") / col("sw").cast("double") *
            (lit(1.0) + col("dw").cast("double")), 9).cast(dec).as("t"))
        .groupBy("src", "vn").agg(sum(col("t")).cast(dec).as("delta"))
        .localCheckpoint()
      deltaAbove = Some(g)
      g
    }
    val allDelta =
      if (perLevel.isEmpty) f0.select(col("src"), col("node").as("vn"),
        lit(0).cast(dec).as("delta")).limit(0)
      else perLevel.reduce(_ unionAll _)
    val bc = allDelta.filter(col("vn") =!= col("src"))
      .groupBy(col("vn").as("node")).agg(sum(col("delta")).as("sd"))
    nodes.join(bc, Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("sd"), lit(0).cast(dec)).cast("double") / 2.0).as("bc"),
        lit(exhausted).as("complete"))
  }

  /**
   * Distance-based centralities from ONE multi-source BFS: per node the
   * reachable-source count, eccentricity (max geodesic), classic
   * closeness reach/Σd (the component-local normalization that stays
   * meaningful on disconnected graphs) and harmonic centrality Σ 1/d
   * (Boldi-Vigna's robust variant). Level-synchronous like
   * [[betweenness]]'s forward sweep — per round one frontier⋈adjacency
   * join + one seen anti-join; distances are exact INTs, the harmonic
   * fold is round-9 decimal terms (order-independent, engine-portable).
   *
   * `maxDepth` truncates exploration; `complete` reports whether every
   * BFS exhausted inside the budget (true = exact values). `sources`
   * optionally restricts roots (sampled estimation at scale); the
   * per-node stats then aggregate over the sampled sources only.
   *
   * @return (node, reach, ecc, closeness, harmonic, complete).
   */
  def closenessStats(edges: DataFrame, srcCol: String, dstCol: String,
      maxDepth: Int, sources: Option[DataFrame] = None): DataFrame = {
    require(maxDepth >= 1, "maxDepth >= 1")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val adj = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .localCheckpoint()
    val nodes = adj.select(col("u").as("node")).distinct().localCheckpoint()
    val roots = sources.map(_.select(col("node"))).getOrElse(nodes)
    var frontier = roots.select(col("node").as("src"))
      .withColumn("node", col("src")).withColumn("dist", lit(0))
      .localCheckpoint()
    var bfs = frontier
    var d = 0
    var exhausted = false
    while (d < maxDepth && !exhausted) {
      val cur = frontier
      val nxt = cur.join(adj, cur("node") === adj("u"))
        .select(col("src"), adj("v").as("node")).distinct()
        .join(bfs.select(col("src"), col("node")), Seq("src", "node"), "left_anti")
        .withColumn("dist", lit(d + 1))
        .localCheckpoint()
      if (nxt.isEmpty) exhausted = true
      else {
        frontier = nxt
        bfs = bfs.unionAll(nxt).localCheckpoint()
      }
      d += 1
    }
    val dec = "decimal(28,9)"
    val stats = bfs.filter(col("dist") > 0)
      .groupBy("node").agg(
        count(lit(1)).as("reach"),
        max(col("dist")).as("ecc"),
        sum(col("dist").cast("long")).as("td"),
        sum(round(lit(1.0) / col("dist").cast("double"), 9).cast(dec)).cast(dec).as("hm"))
    nodes.join(stats, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("reach"), lit(0L)).as("reach"),
        coalesce(col("ecc"), lit(0)).as("ecc"),
        when(col("td").isNotNull,
          col("reach").cast("double") / col("td").cast("double"))
          .otherwise(lit(0.0)).as("closeness"),
        coalesce(col("hm"), lit(0).cast(dec)).cast("double").as("harmonic"),
        lit(exhausted).as("complete"))
  }
}
