package org.apache.spark

/** Bridge into the `private[spark]` listener bus: metric audits
  * (graft.tools.ShuffleAudit) must drain queued task-end events
  * deterministically between measured runs — `SparkContext.listenerBus`
  * is package-private, and sleeping instead would race stragglers.
  */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
