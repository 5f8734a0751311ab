package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer-stage (post-hoc resolution) twin of [[AggRollupRewrite]] for
  * aggregates that combine FILTER and DISTINCT — the one materialized-view
  * routing shape an injected OPTIMIZER rule can never see, because Spark's
  * `RewriteDistinctAggregates` expands filtered-distinct aggregates before
  * any custom optimizer batch runs. The freshly-analyzed plan still
  * carries the original `COUNT(DISTINCT m) FILTER (WHERE p)` expression,
  * so this rule routes it there, with the exact same matching and
  * refusal discipline as the optimizer rule (shared body:
  * [[AggRollupRewrite.applyFilteredDistinct]]).
  *
  * Scope discipline: fires ONLY on Aggregates carrying at least one
  * filtered-distinct aggregate expression; everything else keeps the
  * optimizer-stage path, which sees post-pushdown plan shapes. The
  * rewritten plan preserves output names/exprIds/types, so downstream
  * analysis batches and checkAnalysis are untouched. */
object FilteredDistinctRollupRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    AggRollupRewrite.applyFilteredDistinct(plan)
}
