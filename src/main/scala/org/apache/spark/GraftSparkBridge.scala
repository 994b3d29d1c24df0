package org.apache.spark

/** Bridge to `private[spark]` SparkContext internals — the supported
  * pattern for an external library needing one internal call (same
  * role as `org.apache.spark.sql.GraftColumnBridge` on the SQL side).
  */
object GraftSparkBridge {

  /** Drain the async listener bus: wait until every queued event has
    * been delivered. A profiler toggling a recording flag around an
    * action would otherwise drop the action's tail events (delivered
    * after the action returns) and absorb the previous action's
    * stragglers.
    */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
