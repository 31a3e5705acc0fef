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

  /** `SparkSessionExtensions.buildOptimizerRules` is `private[sql]`; the
    * extension spec uses this to assert a rule actually registered. */
  def optimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
                     session: org.apache.spark.sql.SparkSession) =
    ext.buildOptimizerRules(session)

  /** `SparkContext.listenerBus` is `private[spark]`; specs that count
    * Spark jobs around an action need a flushed bus for an exact count. */
  def flushListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** `SparkContext.conf` is `private[spark]`; the extensions-activation
    * spec plants the static `spark.sql.extensions` conf where session
    * creation reads it (the spark-submit --conf path). */
  def setContextConf(sc: org.apache.spark.SparkContext, k: String, v: String): Unit =
    sc.conf.set(k, v)
  def removeContextConf(sc: org.apache.spark.SparkContext, k: String): Unit =
    sc.conf.remove(k)
}
