package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for Spark internals that are `private[sql]`: converting
  * between public `Column`s and Catalyst `Expression`s, which any library
  * registering custom expressions needs. Lives under org.apache.spark.sql
  * solely to satisfy the package-private qualifier — the standard pattern
  * for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the shared listener bus (`private[spark]`) — lets tests that
    * capture executed plans via a QueryExecutionListener assert after all
    * in-flight events have been delivered, without sleeps.
    */
  def waitForListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a function into a live session's registry (the registry is
    * `private[sql]`; SparkSessionExtensions covers the at-startup path).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
