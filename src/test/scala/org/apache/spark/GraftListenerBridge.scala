package org.apache.spark

/** Test-only bridge to the `private[spark]` listener bus so specs can
  * flush pending SparkListener events before reading task metrics
  * (same package-placement trick as GraftColumnBridge, but kept in the
  * TEST tree — production code has no business draining the bus). */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
