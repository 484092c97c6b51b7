package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** Regenerates the committed golden-result parquet files under
  * `expected/` for the deterministic engine-specific queries that have
  * no SQL oracle (d05 simhash banding, t08 mod-p fingerprint, m01
  * stub-decoded metadata — all pure functions of fixed-seed hashes over
  * the fixed sf0.01 corpus, so a snapshot is a sound regression check).
  *
  * The driver's DuckDB gate then hash-compares them like any oracle via
  * `SELECT * FROM read_parquet('<repo>/expected/<name>.parquet')` —
  * upgrading these entries from rows-only to hard checks. Run after an
  * INTENDED change to their semantics:
  *
  * {{{ sbt "runMain graft.GoldenGen /root/testdata/sf0.01" }}}
  */
object GoldenGen {
  val goldenQueries: Seq[String] =
    Seq("d05_simhash", "t08_modp_fingerprint", "m01_multimodal_meta")

  def goldenDir: Path = Paths.get(sys.props.getOrElse("graft.repo.dir", "/root/repo"), "expected")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(goldenDir)
    goldenQueries.foreach { name =>
      val tmp = Files.createTempDirectory(s"golden-$name").resolve("out")
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      Files.move(part, goldenDir.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      println(s"[golden] wrote expected/$name.parquet")
    }
    spark.stop()
  }

  /** Oracle SQL for a golden-snapshot query: DuckDB reads the committed
    * parquet directly, making the driver's compare a hard hash check. */
  def oracle(name: String): String =
    s"SELECT * FROM read_parquet('${goldenDir.resolve(s"$name.parquet")}')"
}
