package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4.x's `private[sql]` Column↔Expression conversion
  * (the public `new Column(Expression)` constructor was removed in the
  * Spark Connect refactor; classic sessions expose
  * `org.apache.spark.sql.classic.ExpressionUtils`).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Bridge into `private[spark]` scheduler internals used by the
  * measurement tools (graft.tools.SkewCurve): the listener bus drains
  * asynchronously, so per-task metrics read right after an action must
  * wait for delivery.
  */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
