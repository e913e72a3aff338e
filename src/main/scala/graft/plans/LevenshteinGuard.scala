package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the (c)-tier `Rule[LogicalPlan]` extension path): any
  * conjunct of the form `levenshtein(a, b) <= k` (or `< k`, or the mirrored
  * `k >= lev` / `k > lev`) with a foldable bound gets the FREE lower-bound
  * gate `abs(length(a) - length(b)) <= k` conjoined next to it.
  *
  * Edit distance is bounded below by the length difference, so the rewrite
  * never changes results — but the O(1) gate short-circuits the O(n·k) DP
  * for the vast majority of candidate pairs in a near-dup join (exactly the
  * guard hand-written in `TextOps.editDistancePairs`, promoted from a query
  * idiom to an engine rewrite). Injected via
  * `GraftExtensions.injectOptimizerRule`, it runs inside the operator-
  * optimization fixpoint batch: gates are only added when not already
  * semantically present, so the rule is idempotent.
  *
  * The thresholded `levenshtein(a, b, t)` form is left untouched — it
  * returns −1 above t, so `<= k` comparisons against it have different
  * semantics and its internal DP is already banded.
  */
object LevenshteinGuard extends Rule[LogicalPlan] with PredicateHelper {

  private def gateFor(e: Expression): Option[Expression] = {
    def gate(lev: Levenshtein, k: Expression, strict: Boolean): Expression = {
      val diff = Abs(Subtract(Length(lev.left), Length(lev.right)))
      if (strict) LessThan(diff, k) else LessThanOrEqual(diff, k)
    }
    e match {
      case LessThanOrEqual(lev @ Levenshtein(_, _, None), k) if k.foldable =>
        Some(gate(lev, k, strict = false))
      case LessThan(lev @ Levenshtein(_, _, None), k) if k.foldable =>
        Some(gate(lev, k, strict = true))
      case GreaterThanOrEqual(k, lev @ Levenshtein(_, _, None)) if k.foldable =>
        Some(gate(lev, k, strict = false))
      case GreaterThan(k, lev @ Levenshtein(_, _, None)) if k.foldable =>
        Some(gate(lev, k, strict = true))
      case _ => None
    }
  }

  private def addGates(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val gates = conjuncts.flatMap(gateFor)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      .distinct
    if (gates.isEmpty) cond
    // gates FIRST so boolean short-circuit skips the DP per row
    else (gates ++ conjuncts).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val c2 = addGates(cond)
      if (c2 fastEquals cond) f else f.copy(condition = c2)
    case j @ Join(_, _, _, Some(cond), _) =>
      val c2 = addGates(cond)
      if (c2 fastEquals cond) j else j.copy(condition = Some(c2))
  }
}
