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

  /** Apply an extensions object's injected functions to a live session's
    * registry (SparkSessionExtensions.registerFunctions is private[sql]).
    */
  def registerFunctions(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
