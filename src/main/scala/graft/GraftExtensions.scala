package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point — the idiomatic way to ship the engine's
  * Catalyst surface into any SparkSession without code changes:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects:
  *  - [[graft.sql.GraftSqlParser]] — `OPTIMIZE` / `VACUUM` /
  *    `DESCRIBE HISTORY` maintenance DDL over [[graft.tables.SnapshotTable]]
  *    roots (delegating parser — all other SQL is Spark's);
  *  - [[graft.plans.AsOfJoinStrategy]] — plans [[graft.plans.AsOfJoinPlan]]
  *    nodes (point-in-time join) into the sorted-merge physical operator;
  *  - `vec_dot(a, b)` — the codegen'd double inner product
  *    ([[graft.functions.DotProduct]]) as a SQL function;
  *  - [[graft.plans.ApproxDistinctRewrite]] — opt-in COUNT(DISTINCT) →
  *    HyperLogLog++ rewrite (`spark.graft.approxDistinct.enabled`).
  *
  * [[graft.plans.AsOfJoin.asofJoin]] and
  * [[graft.functions.VectorFunctions.register]] remain the per-session
  * programmatic equivalents (they use `spark.experimental.extraStrategies`
  * / the session function registry — same hooks, applied late).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // OPTIMIZE / VACUUM / DESCRIBE HISTORY maintenance DDL over
    // SnapshotTable roots; everything else delegates to Spark's parser
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => graft.plans.AggRollupRewrite)
    // FILTER + DISTINCT combined aggregates route at ANALYSIS time:
    // Spark's RewriteDistinctAggregates expands them before any injected
    // optimizer rule runs, so the optimizer-stage AggRollupRewrite never
    // sees the shape (see FilteredDistinctRollupRewrite)
    ext.injectPostHocResolutionRule(_ => graft.plans.FilteredDistinctRollupRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JoinEliminationRewrite)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(exprs(0), exprs(1))))
    // topk_pairs(value, payload, k) — k must be a literal integer
    ext.injectFunction((
      FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[graft.functions.TopKPairs].getName, "topk_pairs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_pairs: k must be an integer literal, got $other")
        }
        graft.functions.TopKPairs(exprs(0), exprs(1), k).toAggregateExpression()
      }))
  }
}
