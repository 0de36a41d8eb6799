package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; certification mains
  * (SpillCheck) need to drain it deterministically before reading
  * listener-accumulated task metrics — a fixed sleep is a race on a loaded
  * box. Same in-namespace shim pattern as
  * [[org.apache.spark.sql.graft.ColumnBridge]].
  */
object ListenerBridge {
  /** Block until every posted listener event has been delivered, or throw
    * `java.util.concurrent.TimeoutException` after `timeoutMillis`. The
    * bound is EXPLICIT on purpose: the no-arg `waitUntilEmpty()` hides a
    * ~10 s default, and a certification main that aborts on a loaded box
    * should state the wait it was willing to pay (ADVICE r17). Callers
    * that prefer to proceed with possibly-incomplete counters catch the
    * TimeoutException themselves — silently swallowing it here would turn
    * the deterministic drain back into the race it replaced.
    */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
