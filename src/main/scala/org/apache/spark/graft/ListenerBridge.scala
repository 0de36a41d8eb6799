package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; certification mains
  * (SpillCheck) need to drain it deterministically before reading
  * listener-accumulated task metrics — a fixed sleep is a race on a loaded
  * box. Same in-namespace shim pattern as
  * [[org.apache.spark.sql.graft.ColumnBridge]].
  */
object ListenerBridge {
  /** Block until every posted listener event has been delivered. */
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
