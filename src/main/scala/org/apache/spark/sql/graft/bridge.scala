package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4.x made the conversion
  * `private[sql]` (columnNodeSupport.scala); libraries adding custom
  * Catalyst expressions conventionally expose it via an
  * `org.apache.spark.sql.*` shim package. */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
