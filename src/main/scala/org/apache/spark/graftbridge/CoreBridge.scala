package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Core-side shim (the sql-side sibling is
  * org.apache.spark.sql.graftbridge.Bridge): SparkContext.listenerBus
  * is private[spark], but benchmark listeners must DRAIN it before
  * reading task metrics — TaskEnd events are delivered on the bus
  * thread after the job's action returns, so an undrained read can
  * miss precisely the straggler task a skew benchmark exists to
  * observe (review finding r05). */
object CoreBridge {
  /** Block until all queued listener events are delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
