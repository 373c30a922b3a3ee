package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Listener-bus flush bridge.
  *
  * `SparkContext.listenerBus` is `private[spark]`; a measurement
  * harness that reads listener-accumulated task metrics right after an
  * action needs `waitUntilEmpty()` or it races the async bus. Same
  * package-namespace technique as [[org.apache.spark.sql.graft.bridge]]
  * (and the pattern Spark's own test utilities use).
  */
object listeners {
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
