package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pins the bounded-/tmp-footprint contract of the self-contained
  * registered entries that materialize state through parquet (c12's
  * curation state, s17/s18's IVF index): a long-lived session invoking
  * them repeatedly must keep a FIFO-capped window of live dirs (8),
  * evicting the oldest — not accumulate one dump per invocation until
  * JVM exit (round-11 advice; the shutdown hook remains the backstop
  * for whatever the cap leaves live). */
class TempStateSpec extends SparkSpec {

  private def tmpDirs(prefix: String): Set[String] = {
    val s = Files.list(Paths.get(System.getProperty("java.io.tmpdir")))
    try s.iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(prefix)).toSet
    finally s.close()
  }

  private def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
    df.queryExecution.toRdd.count(); ()
  }

  test("c12 curation-state dirs are FIFO-capped across repeated invocations") {
    val before = tmpDirs("graft-c12-state")
    (1 to 10).foreach { _ =>
      materialize(operators.Curation.c12IncrementalCuration(spark, sf0001))
    }
    // evictions are deferred to the consumer's drain boundary (r17:
    // an inline rmTree of a retired dir billed into whichever timed
    // invocation crossed the cap) — the cap contract is "≤ cap live
    // dirs after the consumer drains", so drain before counting
    Scratch.drain()
    val alive = tmpDirs("graft-c12-state") -- before
    assert(alive.size <= 8,
      s"${alive.size} c12 state dirs alive after 10 invocations — cap not enforced")
    assert(alive.nonEmpty, "expected at least the newest state dirs to be live")
  }

  test("s17/s18 index dirs are FIFO-capped across repeated invocations") {
    val before = tmpDirs("graft-s17-index") ++ tmpDirs("graft-s18-index")
    (1 to 5).foreach { _ =>
      materialize(operators.Similarity.s17IvfPersistedTopK(spark, sf0001))
      materialize(operators.Similarity.s18IvfAppendServe(spark, sf0001))
    }
    Scratch.drain() // deferred evictions reclaim at the drain boundary
    val alive =
      (tmpDirs("graft-s17-index") ++ tmpDirs("graft-s18-index")) -- before
    assert(alive.size <= 8,
      s"${alive.size} index dirs alive after 10 invocations — cap not enforced")
    assert(alive.nonEmpty, "expected at least the newest index dirs to be live")
  }
}
