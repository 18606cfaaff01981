package org.apache.spark

/** Test-only bridge: `LiveListenerBus.waitUntilEmpty` is private[spark],
  * but the WindowExec plan gate needs a synchronous flush so each
  * QueryExecutionListener event is attributed to the query that was
  * running when it fired (the listener bus is async). Test classpath
  * only — never shipped in the library jar. */
object GraftTestBridge {
  def flushListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
