package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters so
  * graft's native Catalyst expressions can be exposed as Columns. Spark 4
  * made Column opaque (columnNodeSupport); this is the standard extension
  * seam used by Spark packages.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Force-create the driver's StateStoreCoordinator RPC endpoint
    * (`StreamingQueryManager.stateStoreCoordinator` is private[sql]).
    * BATCH transformWithState still loads a state store whose executor
    * side resolves this endpoint; in a session that never ran a
    * streaming query it would not exist yet.
    */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.streams match {
      case m: classic.StreamingQueryManager => m.stateStoreCoordinator
      case _ => // non-classic session: coordinator managed elsewhere
    }

  /** Apply an extensions object's injected functions to a live session's
    * registry (SparkSessionExtensions.registerFunctions is private[sql]).
    */
  def registerFunctions(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)

  /** The analyzed logical plan behind a DataFrame — the child a custom
    * logical node wraps.
    */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame (Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until the shared LiveListenerBus has delivered every queued
    * event (`SparkContext.listenerBus` is private[spark]). Needed by
    * plan-capture tooling: QueryExecutionListener events are delivered
    * asynchronously, so a capture read immediately after an action can
    * miss the action's own plan.
    */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Whether `strategy` is among this session's injected planner
    * strategies — lets operators that build custom logical nodes
    * (e.g. [[graft.operators.AsOf]] → CarryForwardNode) auto-detect a
    * plain session (GraftExtensions not installed) and fall back to a
    * built-in spelling instead of failing at planning time.
    */
  def hasStrategy(spark: SparkSession,
                  strategy: org.apache.spark.sql.execution.SparkStrategy): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.planner.strategies
      .contains(strategy)
}
