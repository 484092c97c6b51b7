package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config-only integration: a session built with
  * spark.sql.extensions=graft.GraftExtensions has the native function
  * surface without any code-level registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session exposes native functions in SQL") {
    // getOrCreate would return another suite's session (without the
    // extensions), so clear the defaults to force a fresh SparkSession;
    // it still shares the JVM's SparkContext, so we must NOT stop() it —
    // just restore the previous default/active afterwards.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val row = s.sql(
        """SELECT size(minhash_sig(shingle_hashes('a b c d e f g'))) AS k,
          |  simhash64('a b c') AS fp,
          |  dot_product(ARRAY(1.0D, 2.0D), ARRAY(3.0D, 4.0D)) AS dp,
          |  size(char_shingle_hashes('abcdefgh')) AS cg
          |""".stripMargin).collect().head
      assert(row.getInt(0) === 128)
      assert(row.getDouble(2) === 11.0)
      assert(row.getInt(3) === 4) // 8 chars → 4 distinct 5-grams
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
