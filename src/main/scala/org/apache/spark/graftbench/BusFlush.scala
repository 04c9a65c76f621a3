package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Drains the async listener bus so per-query metric snapshots taken by
  * `graft.Bench` attribute task-end events to the query that ran them,
  * not to whichever query reads the counter next. `SparkContext
  * .listenerBus` is `private[spark]`, hence this one-object subpackage
  * of `org.apache.spark`; nothing else in the repo reaches into Spark
  * internals.
  */
object BusFlush {
  def flush(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
