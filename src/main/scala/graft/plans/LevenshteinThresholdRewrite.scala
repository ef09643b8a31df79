package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded edit-distance predicates use the banded
  * algorithm.
  *
  * `levenshtein(a, b) <= k` evaluates the full O(|a|·|b|) dynamic
  * program per row, even though the predicate only needs to know whether
  * the distance stays within k. Spark's three-argument
  * `levenshtein(a, b, k)` runs the banded O(k·min(|a|,|b|)) variant and
  * early-exits (returning -1) as soon as the bound is exceeded — for the
  * dedup verify layer, where k is small and candidate strings are long,
  * that is the difference between per-pair cost ∝ len² and ∝ k·len.
  *
  * The rewrite maps
  * `lev(a,b) <= k`  →  `lev(a,b,k) >= 0 AND lev(a,b,k) <= k`
  * (and the symmetric/strict comparison forms): with threshold k the
  * result is the exact distance whenever it is ≤ k and -1 otherwise, so
  * the conjunction reproduces the original predicate exactly — including
  * null semantics, since all three forms are null-intolerant in the same
  * inputs. Fires only on `threshold = None` with a non-negative integer
  * literal bound, so the rewrite is idempotent (the produced comparisons
  * contain a `Some(k)` threshold and can never re-match) and the
  * optimizer's fixed-point loop terminates.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; also
  * usable standalone through `spark.experimental.extraOptimizations`.
  */
object LevenshteinThresholdRewrite extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Literal,
      strict: Boolean): Expression = {
    val lev = Levenshtein(a, b, Some(k))
    val upper: Expression =
      if (strict) LessThan(lev, k) else LessThanOrEqual(lev, k)
    And(GreaterThanOrEqual(lev, Literal(0)), upper)
  }

  private object NonNegIntLit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l @ Literal(v: Int, IntegerType) if v >= 0 => Some(l)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), NonNegIntLit(k)) =>
        bounded(a, b, k, strict = false)
      case GreaterThanOrEqual(NonNegIntLit(k), Levenshtein(a, b, None)) =>
        bounded(a, b, k, strict = false)
      case LessThan(Levenshtein(a, b, None), NonNegIntLit(k)) =>
        bounded(a, b, k, strict = true)
      case GreaterThan(NonNegIntLit(k), Levenshtein(a, b, None)) =>
        bounded(a, b, k, strict = true)
    }
}
