package org.apache.spark

/** Test-only bridge into the private listener bus: specs that count
  * per-execution plan facts via QueryExecutionListener must drain the
  * async bus before asserting. */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
