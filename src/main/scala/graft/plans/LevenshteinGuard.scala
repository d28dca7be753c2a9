package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: an UN-thresholded `levenshtein(a, b) <= k`
  * comparison runs the full O(|a|·|b|) DP on every row; Spark's
  * three-argument form `levenshtein(a, b, k)` runs the banded O(k·|a|)
  * DP with early abandon (returning -1 past the threshold). Users and
  * generated SQL routinely write the plain form — this rule rewrites it
  * inside Filter and Join conditions to
  *
  *   abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * — the O(1) length pre-guard prunes a pair before any DP runs (edit
  * distance is bounded below by the length gap), and the `>= 0` test is
  * exactly `dist <= k` under the -1 sentinel. Scoped to Filter/Join
  * conditions deliberately: there NULL ≡ false, so collapsing the
  * original's NULL result to the guard's false is semantics-preserving —
  * in a projection it would not be (reference for the pattern:
  * Linkage.fuzzyPairs hand-writes this guard; the rule gives it to plain
  * SQL for free). Matches only threshold-free Levenshtein, so it is
  * idempotent. Registered via `GraftExtensions` (injectOptimizerRule) or
  * `graftbridge.addOptimization` for a live session.
  */
object LevenshteinGuardRule extends Rule[LogicalPlan] {

  private def guarded(a: Expression, b: Expression, k: Int): Expression =
    And(
      LessThanOrEqual(
        Abs(Subtract(Length(a), Length(b)), failOnError = false),
        Literal(k)),
      GreaterThanOrEqual(
        Levenshtein(a, b, Some(Literal(k))), Literal(0)))

  private def rewrite(e: Expression): Expression = e.transform {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 => guarded(a, b, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 => guarded(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 => guarded(a, b, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 1 => guarded(a, b, k - 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter => f.copy(condition = rewrite(f.condition))
    case j: Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(rewrite))
  }
}
