package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LocalLimit, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.geom.WKB
import graft.spatial.SpatialJoin

/**
 * Large-large spatial join planning (SURVEY §2.4 "100 TB design point").
 *
 * [[SpatialJoinStrategy]] handles `JOIN ON st_intersects/contains/within/
 * dwithin` when one side is broadcast-sized; with BOTH sides over the
 * broadcast threshold Catalyst's only native plan is
 * BroadcastNestedLoopJoin — O(|L|·|R|). This optimizer rule instead
 * rewrites the logical join into a grid-cell equi-join:
 *
 *   Join(L, R, st_pred(lg, rg) [AND residual])
 *   => Project(L.out ++ R.out,
 *        Join(Generate(explode(grid_cells(lg)), L) with cell cl,
 *             Generate(explode(grid_cells(rg)), R) with cell cr,
 *             cl = cr AND grid_ref_cell(lg, rg) = cl AND <original cond>))
 *
 * Catalyst extracts `cl = cr` as the equi key => shuffle co-partitioned
 * SortMergeJoin/ShuffledHashJoin; rows replicate only to the cells their
 * envelope touches; `grid_ref_cell = cl` keeps exactly one copy of each
 * matched pair (the cell holding the min corner of the two envelopes'
 * intersection — reference-point dedup, no distinct shuffle); the original
 * condition stays as the exact refinement, so results equal the BNLJ plan
 * for Inner joins. st_dwithin pads the left side's cells and the reference
 * point by the distance.
 *
 * Cell size: `spark.graft.grid.cellSize` (coordinate units) when set to a
 * number; the default "auto" derives it at plan time from a bounded sample
 * of each side's envelopes — median geometry extent when the data has
 * extended geometries (so most rows land in O(1) cells), the sample's
 * uniform-spacing estimate 4*sqrt(bbox_area/n) for (near-)point data, and
 * never below a dwithin pad. AQE's skew-join split handles residual
 * BYTE-heavy hot cells (measured: tools/SkewBench, split fires and the
 * straggler spreads). Caveat proven by the same harness: AQE's skew
 * detection is byte-based, so a byte-LIGHT cell with quadratic candidate
 * work (both sides dense in one cell) will not split — the auto default
 * exists exactly for that dense-core case: sizing to the sampled density
 * shrinks candidate pairs quadratically (BASELINE.md round-4 skew proof:
 * 2.7x at 20x finer cells).
 */
class GridJoinRule extends Rule[LogicalPlan] {

  import SpatialJoinStrategy.{extractSpatial, splitConjuncts, SpatialPred}

  /** Explicit numeric override; "auto" (default) => sampled derivation. */
  private def configuredCellSize: Option[Double] =
    SQLConf.get.getConfString("spark.graft.grid.cellSize", "auto") match {
      case "auto" => None
      case v      => Some(v.toDouble)
    }

  private def sampleSize: Int =
    SQLConf.get.getConfString("spark.graft.grid.autoSampleSize", "1024").toInt

  /** Up to n envelopes of `key` over a LocalLimit'd slice of `child` —
    * one bounded driver-side probe per grid-join plan (executeTake stops
    * after the first partitions that fill the limit). */
  private def sampleEnvs(child: LogicalPlan, key: Expression, n: Int): Array[graft.geom.Envelope] = {
    val spark = SparkSession.active
    val plan = LocalLimit(Literal(n),
      Project(Seq(Alias(key, "__graft_sample_geom")()), child))
    spark.sessionState.executePlan(plan).executedPlan.executeTake(n).flatMap { r =>
      if (r.isNullAt(0)) None
      else Option(WKB.readOrNull(r.getBinary(0))).map(_.envelope).filterNot(_.isEmpty)
    }
  }

  private def cellSizeFor(left: LogicalPlan, right: LogicalPlan,
      lKey: Expression, rKey: Expression, pad: Double): Double =
    configuredCellSize.getOrElse {
      try {
        // keyed by the canonicalized plan/key shapes: re-planning the same
        // join (best-of-N bench runs, explain(), AQE re-optimization) must
        // not re-run the sampling probe — for a join over subquery inputs
        // the probe executes those inputs' shuffle stages
        val key = (left.canonicalized.hashCode(), right.canonicalized.hashCode(),
          lKey.semanticHash(), rKey.semanticHash(), pad)
        GridJoinRule.autoCellCache.computeIfAbsent(key, _ => {
          val n = sampleSize
          val envsL = sampleEnvs(left, lKey, n)
          val envsR = sampleEnvs(right, rKey, n)
          val base = math.max(
            GridJoinRule.autoCellSize(envsL), GridJoinRule.autoCellSize(envsR))
          // lower bound: the LARGEST sampled extent may not be the largest in
          // the data (executeTake reads leading partitions); keep it to <=256
          // cells per axis so even a 16x-bigger unsampled outlier stays far
          // inside the 2^24 cells() guard that a point-dominant sample would
          // otherwise trip (old fixed-1.0 behavior never failed this way)
          val maxExt = (envsL ++ envsR)
            .map(e => math.max(e.maxX - e.minX, e.maxY - e.minY))
            .foldLeft(0.0)(math.max)
          val cell = math.min(math.max(math.max(math.max(base, maxExt / 256), pad), 1e-9), 1e9)
          logInfo(s"graft grid join: auto cellSize=$cell (pad=$pad)")
          java.lang.Double.valueOf(cell)
        }).doubleValue()
      } catch {
        case e: Exception =>
          logWarning(s"graft grid join: auto cell sizing failed (${e.getMessage}); using 1.0")
          1.0
      }
    }

  private def bothLarge(j: Join): Boolean = {
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    threshold <= 0 ||
      (j.left.stats.sizeInBytes > threshold && j.right.stats.sizeInBytes > threshold)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith("__graft_cell")) && bothLarge(j) =>
      val spatial = splitConjuncts(cond).iterator
        .map(c => extractSpatial(c, left, right)).collectFirst { case Some(s) => s }
      spatial match {
        case Some((lKey, rKey, pred)) =>
          val pad = pred match {
            case SpatialPred.DWithin(d) => math.abs(d)
            case _                      => 0.0
          }
          val cs = cellSizeFor(left, right, lKey, rKey, pad)
          val cellL = AttributeReference("__graft_cell_l", LongType, nullable = false)()
          val cellR = AttributeReference("__graft_cell_r", LongType, nullable = false)()
          val lGen = Generate(Explode(GridCells(lKey, cs, pad)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(cellL), child = left)
          val rGen = Generate(Explode(GridCells(rKey, cs, 0.0)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(cellR), child = right)
          val newCond = And(
            And(EqualTo(cellL, cellR), EqualTo(GridRefCell(lKey, rKey, cs, pad), cellL)),
            cond)
          Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
        case None => j
      }
  }
}

object GridJoinRule {

  /** Auto cell per canonicalized (left, right, keys, pad) shape — bounded;
    * cleared wholesale if it ever grows past a sanity cap. */
  private[plans] val autoCellCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Int, Double), java.lang.Double]() {
      override def computeIfAbsent(k: (Int, Int, Int, Int, Double),
          f: java.util.function.Function[_ >: (Int, Int, Int, Int, Double), _ <: java.lang.Double]): java.lang.Double = {
        if (size() > 1024) clear()
        super.computeIfAbsent(k, f)
      }
    }

  /**
   * Cell-size heuristic from one side's sampled envelopes: the median
   * max-extent when at least half the sample has positive extent (each
   * geometry then touches O(1) cells); otherwise — (near-)point data —
   * the uniform-spacing estimate 4 * sqrt(sample_bbox_area / n), so a cell
   * holds a handful of points even when the data is densely clustered far
   * below the old fixed 1.0 default. Empty sample => 1.0.
   */
  def autoCellSize(envs: Array[graft.geom.Envelope]): Double = {
    if (envs.isEmpty) return 1.0
    val exts = envs.map(e => math.max(e.maxX - e.minX, e.maxY - e.minY))
      .filter(_ > 0).sorted
    if (exts.length * 2 >= envs.length) exts(exts.length / 2)
    else {
      val w = math.max(envs.map(_.maxX).max - envs.map(_.minX).min, 1e-12)
      val h = math.max(envs.map(_.maxY).max - envs.map(_.minY).min, 1e-12)
      4.0 * math.sqrt(w * h / envs.length)
    }
  }

  /** Cells covered by the (padded) envelope; null for null/invalid/empty
    * geometry — explode(null) then drops the row, matching the false
    * predicate a BNLJ would evaluate. */
  def cells(wkb: Array[Byte], cellSize: Double, pad: Double): ArrayData = {
    val g = WKB.readOrNull(wkb)
    if (g == null) return null
    val e = g.envelope
    if (e.isEmpty) return null
    val x0 = math.floor((e.minX - pad) / cellSize).toLong
    val x1 = math.floor((e.maxX + pad) / cellSize).toLong
    val y0 = math.floor((e.minY - pad) / cellSize).toLong
    val y1 = math.floor((e.maxY + pad) / cellSize).toLong
    // a geometry covering this many cells means the configured cell size is
    // far below the data's extent — fail with the knob to turn rather than
    // exploding one row into millions (each span is checked BEFORE the
    // product so extreme envelopes can't overflow Long past the guard)
    val xs = x1 - x0 + 1
    val ys = y1 - y0 + 1
    require(xs <= (1L << 24) && ys <= (1L << 24) && xs * ys <= (1L << 24),
      s"geometry envelope covers ${xs}x$ys grid cells at cellSize=$cellSize; " +
        "raise spark.graft.grid.cellSize")
    val out = new Array[Long]((xs * ys).toInt)
    var i = 0
    var cx = x0
    while (cx <= x1) {
      var cy = y0
      while (cy <= y1) { out(i) = SpatialJoin.cellId(cx, cy); i += 1; cy += 1 }
      cx += 1
    }
    new GenericArrayData(out)
  }

  /** Cell of the min corner of the two (left-padded) envelopes'
    * intersection; null when either geometry is null/invalid/empty. */
  def refCell(a: Array[Byte], b: Array[Byte], cellSize: Double, pad: Double): java.lang.Long = {
    val ga = WKB.readOrNull(a)
    val gb = WKB.readOrNull(b)
    if (ga == null || gb == null) return null
    val ea = ga.envelope
    val eb = gb.envelope
    if (ea.isEmpty || eb.isEmpty) return null
    val rx = math.max(ea.minX - pad, eb.minX)
    val ry = math.max(ea.minY - pad, eb.minY)
    java.lang.Long.valueOf(SpatialJoin.cellId(
      math.floor(rx / cellSize).toLong, math.floor(ry / cellSize).toLong))
  }
}

/** grid_cells(geom) -> array<bigint> of covered cell ids (internal to
  * GridJoinRule's rewrite). */
case class GridCells(child: Expression, cellSize: Double, pad: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "grid_cells"
  override protected def nullSafeEval(v: Any): Any =
    GridJoinRule.cells(v.asInstanceOf[Array[Byte]], cellSize, pad)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.GridJoinRule.cells($c, ${cellSize}D, ${pad}D);
       |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  override protected def withNewChildInternal(c: Expression): GridCells = copy(child = c)
}

/** grid_ref_cell(a, b) -> bigint dedup reference cell (internal to
  * GridJoinRule's rewrite). */
case class GridRefCell(left: Expression, right: Expression, cellSize: Double, pad: Double)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "grid_ref_cell"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GridJoinRule.refCell(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      cellSize, pad)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("refCell")
      s"""
         |java.lang.Long $tmp = graft.plans.GridJoinRule.refCell($a, $b, ${cellSize}D, ${pad}D);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GridRefCell =
    copy(l, r)
}
