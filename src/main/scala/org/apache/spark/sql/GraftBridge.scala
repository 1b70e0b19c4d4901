package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made `Column.expr` and
  * `ExpressionUtils` private[sql]; custom Catalyst expressions still need the
  * conversion to expose a Column API, so this accessor lives in the sql
  * package (bytecode-public API, standard extension-library technique).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Non-blocking observed-metric read (`Observation.getOrEmpty` is
    * private[sql] in Spark 4): empty map when the observed plan's action has
    * not completed — lets snapshot counters degrade to a re-read instead of
    * blocking forever if CollectMetrics ever fails to fire on a write.
    */
  def observedOrEmpty(obs: Observation): Map[String, Any] = obs.getOrEmpty

  /** Block until the async SparkListenerBus has delivered every queued
    * event (`listenerBus` is private[spark]; bridged so the measurement
    * tools can read listener-fed counters deterministically instead of
    * sleeping and hoping the bus drained).
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000L)
}
