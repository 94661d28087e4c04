package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a thresholded comparison against the FULL Levenshtein DP
  * — `levenshtein(a, b) <= k` and its mirrored/strict variants — is rewritten
  * to the banded `levenshtein_bounded(a, b, k) <= k`, which runs in
  * O(k·n) with early exit instead of O(n·m). The predicate's value is
  * unchanged: `bounded` returns the exact distance whenever it is ≤ k and
  * k+1 (> k) otherwise, so the comparison decides identically.
  *
  * Only fires when the bound is a non-negative int literal and the user
  * didn't already pass Spark's own threshold argument. Injected via
  * `graft.GraftExtensions` (spark.sql.extensions) — the standard way a
  * library teaches Catalyst a domain rewrite without forking Spark. */
object BoundedLevenshteinRewrite extends Rule[LogicalPlan] {
  import NativeExpressions.LevenshteinBounded

  private def bounded(l: Levenshtein, k: Int) =
    LevenshteinBounded(l.left, l.right, Literal(k, IntegerType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // d <= k  ⇔  bounded(k) <= k ; d < k ⇔ bounded(k-1) <= k-1
    case LessThanOrEqual(l: Levenshtein, Literal(k: Int, IntegerType))
        if l.threshold.isEmpty && k >= 0 =>
      LessThanOrEqual(bounded(l, k), Literal(k, IntegerType))
    case LessThan(l: Levenshtein, Literal(k: Int, IntegerType))
        if l.threshold.isEmpty && k >= 1 =>
      LessThanOrEqual(bounded(l, k - 1), Literal(k - 1, IntegerType))
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), l: Levenshtein)
        if l.threshold.isEmpty && k >= 0 =>
      LessThanOrEqual(bounded(l, k), Literal(k, IntegerType))
    case GreaterThan(Literal(k: Int, IntegerType), l: Levenshtein)
        if l.threshold.isEmpty && k >= 1 =>
      LessThanOrEqual(bounded(l, k - 1), Literal(k - 1, IntegerType))
  }
}
