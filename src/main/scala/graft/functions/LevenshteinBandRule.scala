package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: thresholded edit-distance comparisons rewrite to the
  * BANDED Levenshtein kernel.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) dynamic
  * program and then throws the number away. Spark's three-argument
  * `Levenshtein(a, b, threshold)` computes the banded O(k·min(|a|,|b|))
  * variant that early-exits to −1 the moment the distance provably
  * exceeds `k` (length gap included). The predicates are equivalent:
  *
  *   lev(a,b) <= k  ⟺  lev(a,b,k) >= 0        (distance capped at k)
  *   lev(a,b) >  k  ⟺  lev(a,b,k) <  0        (−1 = "exceeds k")
  *
  * and null inputs propagate null through both forms identically, so
  * the rewrite is semantics-preserving wherever the comparison appears
  * (filters, join conditions, projected booleans). Strict and flipped
  * comparison shapes normalize via k±1. Already-banded calls no longer
  * match the pattern, so the rule is naturally idempotent under the
  * optimizer's fixpoint loop.
  *
  * This is the fuzzy-join enabler at scale: a blocked candidate join at
  * 100 TB evaluates the predicate billions of times, and the band turns
  * each evaluation from quadratic to O(k·n). Inject via
  * [[GraftExtensions]] (`spark.sql.extensions`) or
  * `GraftExtensions.registerAll` on a running session.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def within(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  private def beyond(a: Expression, b: Expression, k: Int): Expression =
    LessThan(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev <= k / k >= lev
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 => within(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 => within(a, b, k)
      // lev < k / k > lev  (⟺ lev <= k−1)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 => within(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 1 => within(a, b, k - 1)
      // lev > k / k < lev
      case GreaterThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 => beyond(a, b, k)
      case LessThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 => beyond(a, b, k)
      // lev >= k / k <= lev  (⟺ lev > k−1)
      case GreaterThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 => beyond(a, b, k - 1)
      case LessThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 1 => beyond(a, b, k - 1)
    }
}
