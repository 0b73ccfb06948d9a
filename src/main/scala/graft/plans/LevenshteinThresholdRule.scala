package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: push a literal bound INTO Levenshtein comparisons.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) dynamic program
  * for every row and then throws away everything but one bit. Spark's
  * Levenshtein expression has a threshold form (returns −1 once the
  * distance provably exceeds the threshold) that runs the BANDED dynamic
  * program — O(k·max(|a|,|b|)) — but users writing the natural comparison
  * never get it. This rule rewrites, inside any expression tree,
  *
  * {{{
  *   levenshtein(a, b) <= k   ~~>   abs(length(a) - length(b)) <= k
  *                                  AND levenshtein(a, b, k) BETWEEN 0 AND k
  * }}}
  *
  * (and the strict `<` form with k−1). The length guard is free (string
  * lengths are already materialized) and short-circuits the conjunction
  * (codegen `&&` is lazy), so rows whose lengths differ by more than k —
  * the vast majority in a blocked near-dup join — never run the DP at
  * all; survivors run the banded DP instead of the full one.
  *
  * The rewrite is VALUE-equivalent for every input, so it is safe under
  * `transformAllExpressions` (projections included, not just filters):
  *  - distance <= k: guard holds (|Δlen| <= distance), threshold form
  *    returns the distance in [0, k] — true, as before;
  *  - distance > k: either the guard fails or the threshold form yields
  *    −1 — false, as before;
  *  - null input: length/abs/comparison propagate null, and
  *    `null AND null = null` — same tri-state result as the original.
  *
  * Idempotent by construction: the rewritten tree only contains the
  * threshold (3-arg) Levenshtein, which the matcher ignores.
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule` —
  * the same conf-only path as the SQL function surface.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  /** Bare 2-arg levenshtein, possibly under an integral cast (queries
    * often cast the distance for cross-engine schema parity). */
  private object UnboundedLev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case Cast(Levenshtein(a, b, None), LongType | IntegerType, _, _) =>
        Some((a, b))
      case _ => None
    }
  }

  /** Non-negative int-representable literal bound. */
  private object Bound {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
      case Literal(v: Long, LongType) if v >= 0 && v <= Int.MaxValue =>
        Some(v.toInt)
      case _ => None
    }
  }

  private def guarded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k)
    val lev = Levenshtein(a, b, Some(kLit))
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit),
      And(GreaterThanOrEqual(lev, Literal(0)), LessThanOrEqual(lev, kLit)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(UnboundedLev(a, b), Bound(k)) => guarded(a, b, k)
      case LessThan(UnboundedLev(a, b), Bound(k)) if k >= 1 =>
        guarded(a, b, k - 1)
      case GreaterThanOrEqual(Bound(k), UnboundedLev(a, b)) =>
        guarded(a, b, k)
      case GreaterThan(Bound(k), UnboundedLev(a, b)) if k >= 1 =>
        guarded(a, b, k - 1)
    }
}
