package graft.spatial

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Density-based spatial clustering (the PostGIS ST_ClusterDBSCAN analog;
 * the reference has no clustering surface — this extends the engine's
 * spatial analytics the way the dedup/sketch ops extend its text surface).
 *
 * Semantics (classic DBSCAN, sklearn/PostGIS convention):
 *  - a point is CORE iff its eps-neighborhood (closed ball, SELF INCLUDED)
 *    holds >= minPts points;
 *  - clusters are connected components of the core-core eps-adjacency graph,
 *    labeled by their minimum core id;
 *  - a non-core point adjacent to >= 1 core is a BORDER point. PostGIS
 *    assigns it an arbitrary adjacent cluster; we pin the MINIMUM adjacent
 *    cluster label so results are deterministic and engine-reproducible;
 *  - everything else is noise: cluster = null.
 *
 * Scale shape: each point replicates to its 3x3 eps-grid neighborhood — the
 * grid-partitioned neighbor join (same layout as SpatialJoin.gridJoin):
 * candidate pairs exist only inside adjacent cells, one shuffle on the cell
 * key, no O(n^2) stage. Neighbor counts map-side combine. Core-core edges
 * run through Dedup.connectedComponents (alternating star contraction,
 * driver DSU only below a threshold). Border resolution is one aggregation
 * over the pair list. Degenerate dense data (everything duplicated) costs
 * pairs-within-a-cell, the same bound as any DBSCAN grid scheme.
 */
object Dbscan {

  def cluster(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      eps: Double,
      minPts: Int): DataFrame = {
    require(eps > 0, "eps must be positive")
    require(minPts >= 1, "minPts must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._

    val pts = df.select(
      col(idCol).cast("long").as("id"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))

    val home = pts
      .withColumn("cx", floor($"x" / eps).cast("long"))
      .withColumn("cy", floor($"y" / eps).cast("long"))

    // every point probes its 3x3 cell neighborhood; a neighbor pair (a, b)
    // materializes exactly once — when a's replica lands in b's home cell
    val probes = home
      .select($"id".as("ia"), $"x".as("xa"), $"y".as("ya"), $"cx", $"cy")
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select($"ia", $"xa", $"ya", ($"cx" + $"dx").as("cx"), ($"cy" + $"dy").as("cy"))
    val targets = home.select($"id".as("ib"), $"x".as("xb"), $"y".as("yb"), $"cx", $"cy")
    // materialize once: neigh, coreEdges, and border all re-read the pair
    // list, and re-deriving it would redo the 9x-replica join per branch
    // (same eager-checkpoint pattern as Dedup.connectedComponents)
    val pairs = probes.join(targets, Seq("cx", "cy"))
      .filter(($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb")
        <= eps * eps)
      .select($"ia", $"ib")
      .localCheckpoint(true)

    val neigh = pairs.groupBy($"ia").agg(count(lit(1)).as("__nc"))
    val core = neigh.filter($"__nc" >= minPts).select($"ia".as("id"))

    val coreEdges = pairs
      .join(core.select($"id".as("ia")), Seq("ia"))
      .join(core.select($"id".as("ib")), Seq("ib"))
      .filter($"ia" < $"ib")
      .select($"ia".as("id_a"), $"ib".as("id_b"))
    val coreComp = graft.pipeline.Dedup.assignComponents(core, "id", coreEdges)

    val border = pairs
      .filter($"ia" =!= $"ib")
      .join(core.select($"id".as("ia")), Seq("ia"), "left_anti")
      .join(coreComp.select($"id".as("ib"), $"component"), Seq("ib"))
      .groupBy($"ia")
      .agg(min($"component").as("component"))

    val labels = coreComp.select($"id", $"component", lit(true).as("is_core"))
      .union(border.select($"ia".as("id"), $"component", lit(false).as("is_core")))

    pts.join(labels, Seq("id"), "left")
      .select($"id", $"x", $"y",
        coalesce($"is_core", lit(false)).as("is_core"),
        $"component".as("cluster"))
  }
}
