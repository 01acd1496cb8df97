package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.expressions.{FloatVecDot, FloatVecNorm2}

/** Optimizer rule: `graft_fdot(x, x)` ≡ ‖x‖² → `graft_fnorm2(x)` — halves
  * the per-lane work (one multiply-accumulate instead of two array reads
  * feeding a multiply) wherever user code spells a self-dot-product, e.g.
  * `cosine(a, a)` sub-expressions or hand-written norms (SURVEY §4.1).
  *
  * Semantics-preserving by construction: FloatVecNorm2 is defined as the
  * same sequential double fold with b := a, so the rewrite cannot move a
  * rounded result.
  */
object DotSelfToNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatVecDot(a, b) if a.semanticEquals(b) => FloatVecNorm2(a)
    }
}

/** Session-extension entry point (SURVEY §2.13/§4.1): registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)` — the standard mechanism
  * a library user enables custom rules with; no Spark fork, no session
  * subclass.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => DotSelfToNorm)
}
