package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

import graft.functions.GeomBinaryExpr
import graft.geom.{Geometry => Geom, _}
import graft.spatial.STRtree

/**
 * Planner strategy for spatial joins (SURVEY §2.4 / §4).
 *
 * Catalyst has no equi-join keys to extract from `a JOIN b ON
 * st_intersects(a.g, b.g)`, so its own planning bottoms out in
 * BroadcastNestedLoopJoin — correct, O(|L|·|R|) refine calls. This strategy
 * recognizes the spatial conjunct and plans [[SpatialIndexJoinExec]]: the
 * (broadcast-sized) right side is collected once, an STR-packed R-tree over
 * its envelopes is broadcast, and the streamed left side probes
 * O(log |R| + k) candidates per row before exact refinement — the same
 * filter-and-refine shape as the reference's in-process spatial join
 * (reference: geopolars/src/spatial_index.rs:37-204) distributed across
 * executors.
 *
 * Falls through (returns Nil) unless the right side's stats are under the
 * broadcast threshold, so Catalyst's BNLJ remains the always-correct
 * fallback plan and semantics never depend on this strategy firing
 * (SURVEY §4 design rule).
 */
class SpatialJoinStrategy(spark: SparkSession) extends SparkStrategy {

  import SpatialJoinStrategy._

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, joinType @ (Inner | LeftOuter), Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      val spatialIdx = conjuncts.indexWhere(c => extractSpatial(c, left, right).isDefined)
      if (spatialIdx < 0) Nil
      else {
        val Some((lKey, rKey, pred)) = extractSpatial(conjuncts(spatialIdx), left, right)
        val residual = conjuncts.patch(spatialIdx, Nil, 1).reduceOption(And)
        val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
        val rightSmall = threshold > 0 && right.stats.sizeInBytes <= threshold
        if (!rightSmall) Nil // BNLJ / user must use SpatialJoin.gridJoin for large-large
        else SpatialIndexJoinExec(
          planLater(left), planLater(right), lKey, rKey, pred, joinType, residual) :: Nil
      }
    case _ => Nil
  }
}

object SpatialJoinStrategy {

  /** Supported spatial conjunct shapes, normalized to (leftKey, rightKey, pred). */
  sealed trait SpatialPred extends Serializable
  object SpatialPred {
    /** st_intersects — symmetric. */
    case object Intersects extends SpatialPred
    /** containerIsLeft: st_contains(L, R) / st_within(R, L) vs the flip. */
    final case class Contains(containerIsLeft: Boolean) extends SpatialPred
    /** st_dwithin(a, b, d) with literal d. */
    final case class DWithin(dist: Double) extends SpatialPred
    /** symmetric DE-9IM refinements: st_touches/st_overlaps/st_crosses/st_equals. */
    final case class Symmetric(name: String) extends SpatialPred
    /** st_covers(L, R) / st_coveredby(R, L) vs the flip (closure containment). */
    final case class Covers(containerIsLeft: Boolean) extends SpatialPred
  }

  private val symmetricNames =
    Set("st_touches", "st_overlaps", "st_crosses", "st_equals")

  private[plans] def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** Normalize a conjunct to (leftSideKey, rightSideKey, predicate). */
  private[plans] def extractSpatial(
      c: Expression, left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, SpatialPred)] =
    c match {
      case GeomBinaryExpr(name, a, b)
          if name == "st_intersects" || name == "st_contains" || name == "st_within" ||
             name == "st_covers" || name == "st_coveredby" || symmetricNames(name) =>
        (sideOf(a, left, right), sideOf(b, left, right)) match {
          case (Some(true), Some(false)) =>
            Some((a, b, name match {
              case "st_intersects" => SpatialPred.Intersects
              case "st_contains"   => SpatialPred.Contains(containerIsLeft = true)
              case "st_within"     => SpatialPred.Contains(containerIsLeft = false)
              case "st_covers"     => SpatialPred.Covers(containerIsLeft = true)
              case "st_coveredby"  => SpatialPred.Covers(containerIsLeft = false)
              case sym             => SpatialPred.Symmetric(sym)
            }))
          case (Some(false), Some(true)) =>
            Some((b, a, name match {
              case "st_intersects" => SpatialPred.Intersects
              case "st_contains"   => SpatialPred.Contains(containerIsLeft = false)
              case "st_within"     => SpatialPred.Contains(containerIsLeft = true)
              case "st_covers"     => SpatialPred.Covers(containerIsLeft = false)
              case "st_coveredby"  => SpatialPred.Covers(containerIsLeft = true)
              case sym             => SpatialPred.Symmetric(sym)
            }))
          case _ => None
        }
      case graft.functions.GeomArgsExpr("st_dwithin", Seq(a, b, d)) if d.foldable =>
        val dist = d.eval(null) match {
          case n: java.lang.Number                      => n.doubleValue()
          case dec: org.apache.spark.sql.types.Decimal  => dec.toDouble
          case _                                        => return None
        }
        (sideOf(a, left, right), sideOf(b, left, right)) match {
          case (Some(true), Some(false)) => Some((a, b, SpatialPred.DWithin(dist)))
          case (Some(false), Some(true)) => Some((b, a, SpatialPred.DWithin(dist)))
          case _                         => None
        }
      case _ => None
    }
}

/**
 * Broadcast spatial index join: builds one R-tree over the collected right
 * side, probes it from the streamed left partitions.
 */
case class SpatialIndexJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    pred: SpatialJoinStrategy.SpatialPred,
    joinType: JoinType,
    residual: Option[Expression]) extends BinaryExecNode {

  import SpatialJoinStrategy.SpatialPred

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _         => left.output ++ right.output
  }

  override def nodeName: String = "SpatialIndexJoin"

  override protected def doExecute(): RDD[InternalRow] = {
    val rightRows: Array[InternalRow] = right.executeCollect().map(_.copy())
    val boundRightKey = BindReferences.bindReference(rightKey, right.output)
    val rGeoms = new Array[Geom](rightRows.length)
    val rEnvs = new Array[Envelope](rightRows.length)
    var i = 0
    while (i < rightRows.length) {
      val v = boundRightKey.eval(rightRows(i))
      rGeoms(i) = if (v == null) null else WKB.readOrNull(v.asInstanceOf[Array[Byte]])
      rEnvs(i) = if (rGeoms(i) == null) Envelope.empty else rGeoms(i).envelope
      i += 1
    }
    val bcast = sparkContext.broadcast((STRtree.build(rEnvs), rGeoms, rightRows))

    val boundLeftKey = BindReferences.bindReference(leftKey, left.output)
    val boundResidual = residual.map(BindReferences.bindReference(_, output))
    val p = pred
    val jt = joinType
    val leftOut = left.output
    // LeftOuter null-fills the right side, so the projection must treat the
    // right attributes as nullable even when the child declares them not-null
    // (a non-nullable projection reads the all-null row as 0/garbage).
    val rightOut = joinType match {
      case LeftOuter => right.output.map(_.withNullability(true))
      case _         => right.output
    }
    val outAttrs = output

    left.execute().mapPartitions ({ iter =>
      val (tree, geoms, rows) = bcast.value
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      val proj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)

      iter.flatMap { lRow =>
        val v = boundLeftKey.eval(lRow)
        val g = if (v == null) null else WKB.readOrNull(v.asInstanceOf[Array[Byte]])
        val matches = scala.collection.mutable.ArrayBuffer[InternalRow]()
        if (g != null) {
          val probeEnv = p match {
            case SpatialPred.DWithin(d) =>
              val e = g.envelope
              if (e.isEmpty) e else Envelope(e.minX - d, e.minY - d, e.maxX + d, e.maxY + d)
            case _ => g.envelope
          }
          tree.query(probeEnv) { j =>
            val rg = geoms(j)
            if (rg != null) {
              val hit = p match {
                case SpatialPred.Intersects        => Algos.intersects(g, rg)
                case SpatialPred.Contains(true)    => Algos.contains(g, rg)
                case SpatialPred.Contains(false)   => Algos.contains(rg, g)
                case SpatialPred.DWithin(d)        => Algos.distance(g, rg) <= d
                case SpatialPred.Covers(true)      => Algos.coversX(g, rg)
                case SpatialPred.Covers(false)     => Algos.coversX(rg, g)
                case SpatialPred.Symmetric(n)      => n match {
                  case "st_touches"  => Algos.touches(g, rg)
                  case "st_overlaps" => Algos.overlapsPred(g, rg)
                  case "st_crosses"  => Algos.crosses(g, rg)
                  case _             => Algos.equalsTop(g, rg)
                }
              }
              if (hit) {
                joined(lRow, rows(j))
                if (boundResidual.forall(r => java.lang.Boolean.TRUE == r.eval(joined)))
                  matches += proj(joined).copy()
              }
            }
          }
        }
        if (matches.nonEmpty) matches.iterator
        else if (jt == LeftOuter) Iterator(proj(joined(lRow, nullRight)).copy())
        else Iterator.empty
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SpatialIndexJoinExec =
    copy(left = l, right = r)
}
