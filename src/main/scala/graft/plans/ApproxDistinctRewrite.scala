package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` into
  * HyperLogLog++ (`approx_count_distinct`, default 5% rsd).
  *
  * Why an engine would want this: an exact distinct count over one grouping
  * key plans as TWO exchanges (expand/partial on (group, x), then regroup),
  * and over high-cardinality x the intermediate state is O(distinct x).
  * The sketch form is one ordinary hash aggregate with fixed ~kilobyte
  * state per group — at 100 TB the difference between a re-shuffle of the
  * table and a map-side-combinable pass. DLT-style pipelines use distinct
  * counts almost exclusively for quality metrics/freshness dashboards
  * (SURVEY §2.10 C6), where a 2% error is free speed.
  *
  * Guarded by `spark.graft.approxDistinct.enabled` (default false): exact
  * semantics unless the session explicitly trades accuracy for the plan
  * shape. Injected via [[graft.GraftExtensions]]; multi-argument
  * `COUNT(DISTINCT a, b)` and filtered aggregates are left untouched.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, None, _) if c.children.size == 1 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(c.children.head),
              isDistinct = false)
        }
    }
}
