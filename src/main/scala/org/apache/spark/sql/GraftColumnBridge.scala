package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between the Spark 4 Column (ColumnNode) API and raw Catalyst
  * expressions, for registering graft's native expressions as Columns.
  * Lives in org.apache.spark.sql only to reach `Column.node`
  * (private[sql]); contains no Spark-internal logic. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = Column(ExpressionColumnNode(e))
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
