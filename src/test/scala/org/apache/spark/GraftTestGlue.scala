package org.apache.spark

/** Test-only access to the live SparkContext conf — spark.sql.extensions
  * is a static conf resolved from it at session construction, and the
  * shared test JVM's context may have been created by another suite. */
object GraftTestGlue {
  def setContextConf(sc: SparkContext, key: String, value: String): Unit =
    sc.conf.set(key, value)

  /** Block until queued listener events are delivered — required before
    * reading accumulated task metrics from a test SparkListener. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
