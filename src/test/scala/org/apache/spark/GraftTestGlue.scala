package org.apache.spark

/** Test-only access to the live SparkContext conf — spark.sql.extensions
  * is a static conf resolved from it at session construction, and the
  * shared test JVM's context may have been created by another suite. */
object GraftTestGlue {
  def setContextConf(sc: SparkContext, key: String, value: String): Unit =
    sc.conf.set(key, value)
}
