package graft.plans

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: the set-similarity LENGTH FILTER (the
  * size-bound prefilter of the AllPairs/PPJoin family).
  *
  * `jaccard(A, B) >= t` implies `|A| >= t·|B|` and `|B| >= t·|A|`
  * (since |A∩B| <= min(|A|,|B|) and |A∪B| >= max(|A|,|B|), Jaccard is
  * at most min/max). Whenever a predicate of the exact shape
  *
  * {{{ cast(sorted_intersect_count(a, b) as double)
  *       / (size(a) + size(b) - sorted_intersect_count(a, b)) >= t }}}
  *
  * appears in a Filter or Join condition, the rule prepends the two
  * size bounds as conjuncts. `And` short-circuits left-to-right in
  * both interpreted and codegen evaluation, so candidate pairs that
  * fail the O(1) size test never pay the O(|a|+|b|) two-pointer
  * intersect — the standard verify-stage prune of a set-similarity
  * join, applied by the OPTIMIZER so every query written in the
  * natural "intersect / union >= t" form gets it for free.
  *
  * Soundness requires the denominator to be EXACTLY the union size of
  * the same two arrays (a containment ratio `n/|A| >= t` admits no
  * such bound — the rule verifies the full union shape before
  * firing). The rewrite is idempotent under the optimizer's fixpoint
  * batches: a condition that already contains the size bound is left
  * alone. Registered via [[graft.GraftExtensions]]
  * (`SparkSessionExtensions.injectOptimizerRule` — SURVEY §2.9
  * custom-plan path (c)).
  */
object JaccardLengthFilter extends Rule[LogicalPlan] {

  /** Matches `size(x) + size(y) - sic` (possibly cast to double) and
    * returns the two Size expressions when `sic` is the given
    * intersect count over the same pair of arrays.
    */
  private def unionSize(den: Expression,
      sic: SortedIntersectCount): Option[(Size, Size)] = {
    val stripped = den match {
      case Cast(inner, DoubleType, _, _) => inner
      case other => other
    }
    stripped match {
      case Subtract(Add(sa @ Size(a, _), sb @ Size(b, _), _), s2, _)
          if s2.semanticEquals(sic) &&
            ((a.semanticEquals(sic.left) && b.semanticEquals(sic.right)) ||
             (a.semanticEquals(sic.right) && b.semanticEquals(sic.left))) =>
        Some((sa, sb))
      case _ => None
    }
  }

  private def bounds(sa: Size, sb: Size, t: Double): (Expression, Expression) = (
    GreaterThanOrEqual(Cast(sa, DoubleType),
      Multiply(Literal(t, DoubleType), Cast(sb, DoubleType))),
    GreaterThanOrEqual(Cast(sb, DoubleType),
      Multiply(Literal(t, DoubleType), Cast(sa, DoubleType))))

  private def rewrite(cond: Expression): Expression =
    cond.transformUp {
      case geq @ GreaterThanOrEqual(
          Divide(Cast(sic: SortedIntersectCount, DoubleType, _, _), den, _),
          Literal(t: Double, DoubleType)) if t > 0.0 && t <= 1.0 =>
        unionSize(den, sic) match {
          case Some((sa, sb)) =>
            val (pA, pB) = bounds(sa, sb, t)
            // idempotency under the fixpoint batch: skip if this exact
            // bound is already a conjunct anywhere in the condition
            if (cond.exists(_.semanticEquals(pA))) geq
            else And(And(pA, pB), geq)
          case None => geq
        }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val r = rewrite(cond)
      if (r.fastEquals(cond)) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(cond), _) =>
      val r = rewrite(cond)
      if (r.fastEquals(cond)) j else j.copy(condition = Some(r))
  }
}
