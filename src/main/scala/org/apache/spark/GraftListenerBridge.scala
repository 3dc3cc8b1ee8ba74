package org.apache.spark

/** Bridge to the `private[spark]` listener bus drain — measurement
  * tooling ([[graft.Profile]]) must drain async listener events before
  * resetting its counters between the warmup and measured runs, or late
  * warmup events contaminate the measured job/task accounting. */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
