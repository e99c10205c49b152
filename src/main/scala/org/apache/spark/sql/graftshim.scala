package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark 4's classic Column↔Expression converters,
  * which are `private[sql]`. This is the standard pattern for libraries
  * that author native Catalyst expressions against Spark 4.x.
  */
object graftshim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
