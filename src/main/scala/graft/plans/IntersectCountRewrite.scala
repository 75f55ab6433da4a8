package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArraySort, Cast, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

import graft.functions.IntersectCountSorted

/** Optimizer rule: `size(array_intersect(a, b))` over two PROVABLY sorted
  * distinct `array<long>` inputs rewrites to the allocation-free
  * two-pointer merge kernel ([[IntersectCountSorted]]).
  *
  * `array_intersect` builds a per-row hash set; when only the cardinality
  * is consumed — the shape of every set-similarity join — the merge kernel
  * does the same work with zero allocation inside whole-stage codegen.
  *
  * Sortedness must be provable syntactically: both operands are direct
  * `array_sort(...)` calls with the default comparator. (`array_sort`
  * also moves nulls last and `array_intersect` treats null as a value —
  * restricting to non-null-element long arrays keeps the rewrite exact;
  * the sort itself is left in place, only the intersect is replaced.)
  *
  * Injected via `graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def sortedNonNullLongArray(e: Expression): Boolean = e match {
    case s: ArraySort => s.dataType match {
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), _)
          if sortedNonNullLongArray(a) && sortedNonNullLongArray(b) =>
        // Size returns int; the kernel returns long — cast to preserve the
        // original expression type.
        Cast(IntersectCountSorted(a, b), IntegerType)
    }
}
