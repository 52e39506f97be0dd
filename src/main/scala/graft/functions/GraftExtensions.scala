package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.VectorFunctions.{FloatVectorDot, FloatVectorNormSq}

/** The engine's `SparkSessionExtensions` hook (SURVEY §4.3): installs the
  * native vector functions at session build time and one optimizer rule.
  * Usage:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *
  * The driver harness builds its own plain session, so the query builders
  * also self-register via VectorFunctions.register — the extension is the
  * deployment-grade path (cluster-wide via config, no code changes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.builtins.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteSelfDotToNormSq)
  }
}

/** `vec_dot(x, x)` ≡ `vec_norm_sq(x)` — one array traversal instead of a
  * two-operand loop, and it documents the optimizer extension point: a
  * Rule[LogicalPlan] over expressions, registered per session. Semantic
  * equality of children (not reference equality) so aliased/resolved
  * duplicates rewrite too.
  */
object RewriteSelfDotToNormSq extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatVectorDot(a, b) if a.semanticEquals(b) && a.deterministic =>
        FloatVectorNormSq(a)
    }
}
