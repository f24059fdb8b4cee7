package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst optimizer rule: rewrite a bare point-in-interval non-equi
  * join into [[graft.ops.RangeJoin]]'s bin-to-equi-key form — the
  * whole-plan version of the manual API, so ANY query written as the
  * naive `fact.join(intervals, v >= lo && v < hi)` (DataFrame or SQL
  * text) gets a shuffle-partitionable hash join instead of a
  * broadcast-nested-loop scan.
  *
  * Fires only when ALL of:
  *  - `spark.graft.binnedRangeJoin.width` is a positive double
  *    (opt-in: the bin width is a data property the user must choose —
  *    Databricks' RANGE_JOIN hint makes the same demand);
  *  - the join is INNER and its condition is exactly
  *    `(v >= lo) AND (v < hi)` in any conjunct order/written
  *    direction, with `v` referencing one side only and `lo`/`hi` the
  *    other — no extra conjuncts (an equi conjunct would already give
  *    Catalyst a hash key).
  *
  * The rewrite tags the point side with `floor(v/w)`, explodes the
  * interval side to `sequence(floor(lo/w), floor(hi/w))`, joins on the
  * bin ids AND the original predicate, and projects the bins away so
  * the subtree exposes exactly the original output attributes. Bin
  * equality is a pure candidate generator — the exact predicate is
  * re-applied — so semantics are unchanged (RangeJoinSpec's property
  * test pins this for the manual API; BinnedRangeJoinRuleSpec pins
  * plan shape + result equality for the rule).
  *
  * After one application the condition has three conjuncts, so the
  * pattern can never match its own output (fixed-point safe).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.binnedRangeJoin.width"

  private def widthConf: Option[Double] =
    conf.getConfString(WidthKey, "").toDoubleOption.filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = widthConf match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) if j.resolved =>
          rewrite(j, w).getOrElse(j)
      }
  }

  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(j.condition.get)
    if (conjuncts.size != 2) return None
    val parsed =
      (lowerBound(conjuncts(0)), upperBound(conjuncts(1))) match {
        case (Some((v1, lo)), Some((v2, hi))) if v1.semanticEquals(v2) =>
          Some((v1, lo, hi))
        case _ =>
          (lowerBound(conjuncts(1)), upperBound(conjuncts(0))) match {
            case (Some((v1, lo)), Some((v2, hi))) if v1.semanticEquals(v2) =>
              Some((v1, lo, hi))
            case _ => None
          }
      }
    parsed.flatMap { case (v, lo, hi) =>
      if (!Seq(v, lo, hi).forall(e => e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]))
        None
      else build(j, v, lo, hi, w)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** `v >= lo` in either written direction → (v, lo). */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(v, lo) => Some((v, lo))
    case LessThanOrEqual(lo, v) => Some((v, lo))
    case _ => None
  }

  /** `v < hi` in either written direction → (v, hi). */
  private def upperBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(v, hi) => Some((v, hi))
    case GreaterThan(hi, v) => Some((v, hi))
    case _ => None
  }

  private def binOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  private def build(j: Join, v: Expression, lo: Expression, hi: Expression,
      w: Double): Option[LogicalPlan] = {
    val oneSide = (e: Expression, side: LogicalPlan) =>
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    val pointIsLeft =
      if (oneSide(v, j.left) && oneSide(lo, j.right) && oneSide(hi, j.right)) Some(true)
      else if (oneSide(v, j.right) && oneSide(lo, j.left) && oneSide(hi, j.left)) Some(false)
      else None
    pointIsLeft.map { vLeft =>
      val (pointSide, ivlSide) = if (vLeft) (j.left, j.right) else (j.right, j.left)
      val pointBin = Alias(binOf(v, w), "__bin_p")()
      val pointPlan = Project(pointSide.output :+ pointBin, pointSide)
      val seqExpr = Sequence(binOf(lo, w), binOf(hi, w),
        Some(Literal(1L)), Option(conf.sessionLocalTimeZone))
      val ivlBinAttr = AttributeReference("__bin_i", LongType, nullable = false)()
      val ivlPlan = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(ivlBinAttr), child = ivlSide)
      val newCond = And(EqualTo(pointBin.toAttribute, ivlBinAttr), j.condition.get)
      val (newLeft, newRight) = if (vLeft) (pointPlan, ivlPlan) else (ivlPlan, pointPlan)
      // expose exactly the original join's attributes to the parent
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
