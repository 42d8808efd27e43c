package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge to the private[spark] listener bus: deterministic
  * event drain for listener-based metrics (see graft.TestMetrics).
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
