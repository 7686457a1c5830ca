package org.apache.spark

/** private[spark] access for graft's tests: deterministic SparkListener
  * accounting needs to drain the listener bus before reading counters. */
object GraftSparkShims {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
