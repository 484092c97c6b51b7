package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-attempt resource telemetry for the self-degrading-ramp question
  * (round-17, VERDICT r16 weak #1): WHAT resource grows across settled
  * back-to-back attempts of one query in a fresh JVM? DRIFT.md proved
  * the ramp exists (r16 c12 fresh-session [8.4, 6.6, 6.3, 6.3, 7.9,
  * 8.0]) and attributed it to "localCheckpoint-heavy lineage debt" —
  * but c12's path contains NO checkpoint, so round 17 measures instead
  * of guessing. Each attempt logs: wall, GC ms, storage RDD count +
  * bytes, tracked scratch, spark-local-dir file count + bytes (shuffle
  * + broadcast debris the async ContextCleaner hasn't reclaimed), and
  * the /tmp state-dump footprint (the c12 FIFO's retained dirs).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.RampProbe c12_incremental_curation 8"
  */
object RampProbe {
  private def timeSec[T](f: => T): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def materialize(df: DataFrame): Long =
    df.queryExecution.toRdd.count()

  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** (files, bytes) under a directory tree; (0,0) when absent. */
  private def du(dir: String): (Long, Long) = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) (0L, 0L)
    else {
      var files = 0L; var bytes = 0L
      val st = java.nio.file.Files.walk(p)
      try st.forEach { q =>
        if (java.nio.file.Files.isRegularFile(q)) {
          files += 1
          bytes += (try java.nio.file.Files.size(q) catch { case _: Throwable => 0L })
        }
      } catch { case _: Throwable => () } finally st.close()
      (files, bytes)
    }
  }

  /** Sum of du over /tmp entries whose name matches `prefix`. */
  private def duTmp(prefix: String): (Long, Long) = {
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    var files = 0L; var bytes = 0L
    val st = java.nio.file.Files.list(root)
    try st.forEach { p =>
      if (p.getFileName.toString.startsWith(prefix)) {
        val (f, b) = du(p.toString); files += f; bytes += b
      }
    } finally st.close()
    (files, bytes)
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("c12_incremental_curation")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    def line(tag: String, sec: Double, gc0: Long): Unit = {
      val rdds = spark.sparkContext.getRDDStorageInfo
      val (lf, lb) = duTmp("spark-")
      val (bf, bb) = duTmp("blockmgr-")
      val (sf2, sb2) = duTmp("graft-")
      println(f"RAMP $name $tag wall=${sec}%6.2fs gc=${gcMs() - gc0}%5dms " +
        f"storage_rdds=${rdds.length}%3d storage_mb=${rdds.map(_.memSize).sum / (1024 * 1024)}%5d " +
        f"scratch=${Scratch.liveCount}%3d " +
        f"sparklocal=${lf + bf}%6d files ${(lb + bb) / (1024 * 1024)}%6d MB " +
        f"tmpstate=${sf2}%6d files ${sb2 / (1024 * 1024)}%6d MB")
    }

    val g0 = gcMs()
    line("warmup", timeSec(materialize(fn(spark, sfDir))), g0)
    System.gc(); Thread.sleep(3000)
    (1 to n).foreach { i =>
      Scratch.drain()
      System.gc(); Thread.sleep(1000)
      val g = gcMs()
      val s = timeSec(materialize(fn(spark, sfDir)))
      line(s"a$i", s, g)
    }
    spark.stop()
  }
}
