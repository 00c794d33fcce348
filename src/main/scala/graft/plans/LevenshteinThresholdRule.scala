package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: push a comparison threshold INTO Levenshtein.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) DP matrix per
  * row and then compares; Spark's three-argument form
  * `levenshtein(a, b, k)` runs a banded DP in O(k·min(|a|,|b|)) and
  * returns -1 when the distance exceeds k — so the predicate is
  * equivalent to `levenshtein(a, b, k) >= 0`. On a blocked near-dup
  * verify stage (millions of candidate pairs, small k) this turns the
  * hottest loop from quadratic to linear in string length.
  *
  * The rewrite only fires on the threshold-less form, so it is
  * idempotent under the optimizer's fixed-point batches. Null
  * semantics are unchanged (both forms are null-intolerant), and a
  * negative k — always false for a distance — is left untouched.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None),
          k @ Literal(kv: Int, IntegerType)) if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
      case GreaterThanOrEqual(k @ Literal(kv: Int, IntegerType),
          Levenshtein(a, b, None)) if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
      case LessThan(Levenshtein(a, b, None),
          Literal(kv: Int, IntegerType)) if kv >= 1 =>
        GreaterThanOrEqual(
          Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
    }
}
