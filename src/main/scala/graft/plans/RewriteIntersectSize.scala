package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.IntersectSize

/** Optimizer rule: `size(array_intersect(a, b))` over string arrays →
  * the native [[IntersectSize]] — same value (distinct common elements,
  * null matches null; null-in → null-out), but one hash-probe pass with no
  * intersection-array allocation. Fires only on the exact pattern, so any
  * plan that consumes the intersection ARRAY itself is untouched.
  *
  * Installed via `spark.sql.extensions=graft.GraftExtensions`. The Jaccard
  * verification path (Dedup.jaccardVerified) hits this on every candidate
  * pair — at corpus scale the rewrite removes a per-pair array
  * materialization from the verify shuffle.
  */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  private def isStringArray(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=false only: legacy mode returns -1 for a null
      // array where IntersectSize (a null-safe BinaryExpression) gives null.
      case Size(ArrayIntersect(a, b), false) if isStringArray(a) && isStringArray(b) =>
        IntersectSize(a, b)
    }
}
