package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters (Spark
  * 4 moved `Column.expr` behind `classic.ExpressionUtils`). Lives in the
  * `org.apache.spark.sql` package solely to satisfy the access modifier —
  * the standard pattern for Catalyst-level extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree into concrete Catalyst
    * expressions ([[expression]] wraps them lazily in a
    * `ColumnNodeExpression`, whose children are not walkable) — what a
    * driver-side predicate analysis (stats pruning) needs. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The session's parser (`sessionState` is `private[sql]`) — lets a
    * caller stack [[graft.sql.GraftSqlParser]] on a LIVE session's
    * delegate and execute its plans via [[ofRows]], the same text→plan→run
    * path `injectParser` wires at session build time. */
  def sessionParser(spark: SparkSession): org.apache.spark.sql.catalyst.parser.ParserInterface =
    spark.sessionState.sqlParser

  /** Parse `sqlText` with graft's maintenance-DDL parser (delegating to
    * the session parser) and execute it. */
  def graftSql(spark: SparkSession, sqlText: String): DataFrame =
    ofRows(spark,
      new graft.sql.GraftSqlParser(sessionParser(spark)).parsePlan(sqlText))

  /** Re-tag a BATCH DataFrame's physical result as a STREAMING relation
    * (`internalCreateDataFrame(_, _, isStreaming = true)` is
    * `private[sql]`) — the contract a V1 streaming `Source.getBatch` must
    * meet: MicroBatchExecution splices the returned plan into the
    * streaming query, and only streaming-tagged relations pass its
    * checks. Lazy: the wrapped `toRdd` plan executes when the sink runs
    * the micro-batch, not here. */
  def streamingDataFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Derive a NEW session on the same SparkContext + SharedState with
    * `ext` applied at BUILD time — what [[applyExtensions]]' late adoption
    * cannot provide for ANALYZER rules: a live session's sessionState (and
    * its analyzer, including the post-hoc resolution batch) is constructed
    * once, and `spark.experimental` only exposes optimizer/planner seams.
    * The graft FILTER+DISTINCT routing is an analyzer-stage rule
    * ([[graft.plans.FilteredDistinctRollupRewrite]]), so a session that
    * adopted the extensions late derives a sibling here to run such
    * queries; sessions built with `spark.sql.extensions=graft.GraftExtensions`
    * need none of this. Fresh session state: set session-level confs
    * (shuffle partitions etc.) on the returned session as needed. */
  def sessionWithExtensions(spark: SparkSession,
      ext: SparkSessionExtensions): SparkSession = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    // the 6-arg constructor is Scala-private (bytecode-public): reflection
    // is the narrowest seam that still SHARES the SharedState — a fresh
    // builder-made session would spin up a second catalog
    val ctor = classOf[classic.SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(throw new IllegalStateException(
        "classic.SparkSession: no 6-arg constructor (Spark upgrade?)"))
    ctor.newInstance(cs.sparkContext, Some(cs.sharedState), None, ext,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[classic.SparkSession]
  }

  /** `SparkSessionExtensions.buildPlannerStrategies` / `registerFunctions`
    * are `private[sql]` (normally called once during session bootstrap) —
    * exposed so specs can assert what `graft.GraftExtensions` injects, and
    * so an already-running session can adopt the extensions late. */
  def applyExtensions(ext: SparkSessionExtensions, spark: SparkSession): Unit = {
    val strategies = ext.buildPlannerStrategies(spark)
    val existing = spark.experimental.extraStrategies
    spark.experimental.extraStrategies =
      existing ++ strategies.filterNot(existing.contains)
    ext.registerFunctions(spark.sessionState.functionRegistry)
    val rules = ext.buildOptimizerRules(spark)
    val existingRules = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      existingRules ++ rules.filterNot(existingRules.contains)
  }
}
