package org.apache.spark

/** Bridge into `private[spark] SparkContext.listenerBus`: listener
  * events (task metrics included) post asynchronously, so a reader
  * that aggregates task-end metrics (e.g. graft.SpillProbe's spill
  * counter) must drain the bus before trusting its total. This is the
  * same call Spark's own test utilities use; the timeout guards a
  * wedged bus from hanging the probe forever.
  */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
