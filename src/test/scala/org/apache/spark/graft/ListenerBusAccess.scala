package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the `private[spark]` listener bus: the
  * metric-counting specs (job-count / shuffle-record probes) must
  * drain asynchronously-posted scheduler events before reading their
  * counters. `waitUntilEmpty()` is deterministic and returns as soon
  * as the bus drains — unlike a fixed `Thread.sleep`, which both
  * wastes wall-clock on a fast bus and races a slow one.
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
