package org.apache.spark

/** Test-only bridge to `private[spark]` surfaces: deterministic listener
  * synchronization, so job-count assertions never race the async bus
  * (the round-4 fixed-sleep version was timing-dependent under load).
  */
object GraftTestAccess {
  /** Block until every event queued so far has been delivered to all
    * registered listeners (LiveListenerBus.waitUntilEmpty is public but
    * the `sc.listenerBus` accessor is package-private).
    */
  def waitListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
