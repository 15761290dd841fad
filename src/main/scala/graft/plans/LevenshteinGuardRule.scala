package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: bound-aware rewrite of `levenshtein(a, b) <= k`
  * predicates (the fuzzy-dedup filter shape).
  *
  * Two compounding wins, both from k being known at plan time:
  *   - **length guard**: |len(a) − len(b)| ≤ dist always, so
  *     `abs(length(a) − length(b)) <= k` is a free O(1) prefilter in
  *     front of the O(|a|·|b|) dynamic program — on blocked candidate
  *     pairs most comparisons die here without touching the DP;
  *   - **banded DP**: the survivors run `levenshtein(a, b, k)` —
  *     Spark's thresholded form, which only fills the |k|-band of the
  *     DP matrix and early-exits, O(k·min(|a|,|b|)) instead of
  *     O(|a|·|b|). It returns −1 when the distance exceeds k, so
  *     "dist ≤ k" becomes "thresholded result ≥ 0".
  *
  * Equivalence: if either input is null both forms are null (length
  * propagates null through the conjunction exactly like the DP does);
  * if the guard fails, dist > k on both forms; if it holds, the banded
  * DP returns the true distance iff ≤ k. Inputs must be deterministic
  * (they are referenced twice; codegen's subexpression elimination
  * collapses the re-evaluation). Matches the bare comparison and the
  * long-cast form Spark plants when the distance was projected as
  * BIGINT; `<` with a positive literal normalizes to `<= k−1` first.
  * Injected by [[graft.GraftExtensions]] next to [[DotRewriteRule]].
  */
object LevenshteinGuardRule extends Rule[LogicalPlan] {

  /** Unwraps `levenshtein(a,b)` possibly under a widening int→long cast
    * — only the UN-thresholded form (a user-set threshold already has
    * the banding, and re-threshold-ing could change the −1 domain).
    */
  private def unwrapLev(e: Expression): Option[Levenshtein] = e match {
    case l @ Levenshtein(_, _, None) => Some(l)
    case Cast(l @ Levenshtein(_, _, None), LongType, _, _) => Some(l)
    case _ => None
  }

  private def intOf(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  private def guarded(l: Levenshtein, k: Int): Expression = {
    val lenDiff = Abs(Subtract(Length(l.left), Length(l.right)))
    And(
      LessThanOrEqual(lenDiff, Literal(k)),
      GreaterThanOrEqual(
        Levenshtein(l.left, l.right, Some(Literal(k))), Literal(0)))
  }

  private def rewrite(lev: Expression, k: Expression,
      strict: Boolean): Option[Expression] =
    (unwrapLev(lev), intOf(k)) match {
      case (Some(l), Some(kv)) if l.left.deterministic &&
          l.right.deterministic =>
        val bound = if (strict) kv - 1 else kv
        if (bound >= 0) Some(guarded(l, bound)) else None
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cmp @ LessThanOrEqual(lev, k) =>
        rewrite(lev, k, strict = false).getOrElse(cmp)
      case cmp @ LessThan(lev, k) =>
        rewrite(lev, k, strict = true).getOrElse(cmp)
      case cmp @ GreaterThanOrEqual(k, lev) =>
        rewrite(lev, k, strict = false).getOrElse(cmp)
      case cmp @ GreaterThan(k, lev) =>
        rewrite(lev, k, strict = true).getOrElse(cmp)
    }
}
