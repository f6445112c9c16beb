package org.apache.spark

/** Bridge into `private[spark]` SparkContext internals needed by the bench
  * tools (same confined-bridge technique as sql.GraftColumnBridge). */
object GraftListenerBridge {

  /** Drain the async listener bus, so TaskEnd metrics read after an action
    * has returned include every task of that action. */
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
