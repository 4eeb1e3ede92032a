package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Spark 4 moved Column onto ColumnNode and made the Expression bridge
  * private[sql]; this shim (in the sql package by necessity) exposes the
  * one conversion custom Catalyst expressions need. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = new Column(ExpressionColumnNode(e))
}
