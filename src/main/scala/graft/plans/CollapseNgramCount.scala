package graft.plans

import graft.functions.StringNgrams
import org.apache.spark.sql.catalyst.expressions.{Greatest, If, IsNull, Literal, Size, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `size(ngrams_ws(w, n))` ⇒ `greatest(0, size(w) − (n−1))`.
  *
  * A document's n-gram count is pure arithmetic on its word count —
  * materializing the n-gram array (one string join per element) just to
  * measure its length wastes the whole construction. The rewrite preserves
  * null semantics explicitly (`greatest` would swallow the null that
  * `size(null)` must produce under non-legacy semantics).
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule` — the
  * `Rule[LogicalPlan]` leg of the extension machinery, next to the
  * expression ([[graft.functions.FloatVectorDot]]) and strategy
  * ([[AsOfJoinStrategy]]) legs.
  */
object CollapseNgramCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(StringNgrams(w, n), legacy) if !legacy =>
      If(IsNull(w), Literal(null, IntegerType),
        Greatest(Seq(Literal(0), Subtract(Size(w, legacySizeOfNull = false), Literal(n - 1)))))
  }
}
