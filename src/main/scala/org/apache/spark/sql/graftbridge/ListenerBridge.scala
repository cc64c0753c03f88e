package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus` (private[spark]): lets the
  * bench harness drain pending listener events synchronously so
  * task-metric deltas snapshotted around a query run are exact —
  * without the drain, `onTaskEnd` events for the last tasks of a job
  * can still be in flight when the action returns, and per-query
  * shuffle/spill attribution would bleed into the next query. Same
  * keep-it-logic-free rule as [[ColumnBridge]].
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
