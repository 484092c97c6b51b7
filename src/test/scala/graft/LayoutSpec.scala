package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** The Z-order layout claim, measured: after a range-clustered write on
  * the interleaved key, per-file min/max envelopes are narrow on BOTH
  * clustered columns, so a narrow filter on EITHER column overlaps only
  * a small fraction of files — while a linear sort prunes on its one
  * sort column and degenerates to a full scan on the other. This is the
  * exact mechanism parquet row-group / file skipping uses at 100 TB. */
class LayoutSpec extends SparkSpec {

  /** Files whose [min, max] envelope on `c` overlaps [lo, hi] — the
    * files a min/max-pruning scan must read for that predicate. */
  private def filesOverlapping(dir: String, c: String, lo: Double, hi: Double): Long = {
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c).cast("double")).as("mn"), max(col(c).cast("double")).as("mx"))
    perFile.filter(col("mx") >= lo && col("mn") <= hi).count()
  }

  test("z-order layout prunes files on both dimensions; linear sort only on one") {
    import spark.implicits._
    val o = Tables.orders(spark, sf001).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val files = 16
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    try {
      Layout.zorderLayout(o, "o_custkey", "o_totalprice", zDir, files)
      o.repartitionByRange(files, $"o_custkey")
        .sortWithinPartitions($"o_custkey")
        .write.mode("overwrite").parquet(linDir)

      // a ~5%-of-domain band on each dimension
      val r = o.agg(
        min($"o_custkey").cast("double"), max($"o_custkey").cast("double"),
        min($"o_totalprice"), max($"o_totalprice")).head
      val (cLo, cHi) = (r.getDouble(0), r.getDouble(1))
      val (pLo, pHi) = (r.getDouble(2), r.getDouble(3))
      val cBand = (cLo + (cHi - cLo) * 0.40, cLo + (cHi - cLo) * 0.45)
      val pBand = (pLo + (pHi - pLo) * 0.40, pLo + (pHi - pLo) * 0.45)

      val zCust = filesOverlapping(zDir, "o_custkey", cBand._1, cBand._2)
      val zPrice = filesOverlapping(zDir, "o_totalprice", pBand._1, pBand._2)
      val linCust = filesOverlapping(linDir, "o_custkey", cBand._1, cBand._2)
      val linPrice = filesOverlapping(linDir, "o_totalprice", pBand._1, pBand._2)

      // linear layout: perfect on its sort column, useless on the other
      assert(linCust <= 2, s"linear custkey band hit $linCust files")
      assert(linPrice >= files - 1, s"linear price band hit only $linPrice files")
      // z-order: strictly better than full scan on BOTH dimensions —
      // the half-way bit split means a 5% band touches ~half the files
      // at worst, far fewer as file count grows
      assert(zCust <= files / 2, s"z-order custkey band hit $zCust of $files files")
      assert(zPrice <= files / 2, s"z-order price band hit $zPrice of $files files")
      assert(zPrice < linPrice, "z-order must beat linear on the non-sort dimension")
    } finally {
      Seq(zDir, linDir).foreach { d =>
        val p = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.delete)
        }
      }
    }
  }

  test("zkey is deterministic and within the 32-bit Morton range") {
    val z = Layout.q68Zorder(spark, sf001).cache()
    try {
      val r = z.agg(min(col("zkey")), max(col("zkey")), count(lit(1))).head
      assert(r.getLong(0) >= 0L)
      assert(r.getLong(1) < (1L << 32))
      val again = Layout.q68Zorder(spark, sf001)
      assert(z.exceptAll(again).isEmpty && again.exceptAll(z).isEmpty)
    } finally { z.unpersist(); () }
  }
}
