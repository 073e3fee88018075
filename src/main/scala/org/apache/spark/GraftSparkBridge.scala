package org.apache.spark

/** Bridge into `private[spark]` SparkContext internals for the profiler:
  * listener events are delivered asynchronously, so per-query metric
  * attribution needs an explicit bus drain between queries — without it a
  * query's trailing task-end events would be credited to the next query.
  */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
