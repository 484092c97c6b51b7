package graft

/** Timing/cleanup helpers shared by the benchmark mains ([[Bench]],
  * [[SinkBench]]) — one definition, so a behavior fix reaches both. */
private[graft] object BenchUtil {

  def timeSec[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Recursive delete (children before parents); missing dir is a no-op. */
  def rmTree(dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val w = Files.walk(root)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }
}
