package org.apache.spark

/** Interop shim: the listener bus drain (`listenerBus.waitUntilEmpty`) is
  * `private[spark]`; metric capture around a single action needs it so the
  * asynchronously-posted task-end events are all counted before reading.
  */
object GraftListenerBridge {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
