package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Spark 4 moved Column onto ColumnNode and made the Expression bridge
  * private[sql]; this shim (in the sql package by necessity) exposes the
  * one conversion custom Catalyst expressions need. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = new Column(ExpressionColumnNode(e))

  /** Inverse direction (Column → Expression), for custom aggregates that
    * take computed columns as children. */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Register a function on an ALREADY-RUNNING session (builder-time
    * `withExtensions` only applies to new sessions; `sessionState` is
    * private[sql]). */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
