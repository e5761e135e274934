package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * conversion (Spark 4 decoupled the public Column API from Catalyst).
  * Lives under `org.apache.spark.sql` solely for access; contains no
  * logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the async listener bus so stage metrics registered by a
    * just-finished action are visible (`listenerBus` is
    * private[spark]). */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
                       timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
