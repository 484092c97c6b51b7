package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest._

/** File-transport publish-path attribution bench (round-5 VERDICT #1).
  *
  * The copy/streaming bench numbers drifted two rounds running
  * (streaming 441→576→937 ms, copy 220k→150k docs/s) while the bulk
  * publish sequence grew from one `Files.write` to sidecar + tmp +
  * ATOMIC_MOVE per 64-doc file. This main measures the same copy
  * workload Bench uses under each publish variant so the slowdown is
  * attributed to a specific operation, not guessed at:
  *
  *   base64       sidecar + atomic publish, maxActions 64 (production)
  *   nosidecar64  atomic publish only
  *   noatomic64   sidecar only, direct body write
  *   bare64       neither (the round-2 publish path)
  *   base1024     full durability, 1024-doc files
  *   base5000     full durability, 5000-doc files (EsSimCompact size)
  *
  * Methodology: one unrecorded warmup pass over all variants, then 3
  * recorded rounds with the variants INTERLEAVED, reporting the MIN per
  * variant — tmpfs/page-cache/GC interference between adjacent runs is
  * larger than some effects under measurement, and sequential
  * per-variant timing produced ordering artifacts (a no-op variant
  * "slower" than the full path). Also reports the per-doc cost of the
  * sidecar's Jackson ts-extraction in isolation, since it is the only
  * per-DOC (not per-file) cost the sidecar added.
  */
object SinkBench {

  import BenchUtil.{timeSec, rmTree}

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the exact copy workload Bench times
    val events = ingest.Emit.ing01EmitEvents(spark, sfDir)
    val lines = Tables.lineitem(spark, sfDir).select(
      lit("lineitem").as("index_id"),
      concat_ws("-", $"l_orderkey", $"l_linenumber").as("doc_id"),
      to_json(struct($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice")).as("source"))
    val records = events.unionByName(lines)
      .withColumnRenamed("index_id", "indexId").withColumnRenamed("doc_id", "docId")
      .as[IngestRecord].cache()
    val nDocs = records.count()

    val variants: Seq[(String, Int, Boolean, Boolean)] = Seq(
      ("base64",      64,   true,  true),
      ("nosidecar64", 64,   false, true),
      ("noatomic64",  64,   true,  false),
      ("bare64",      64,   false, false),
      ("base1024",    1024, true,  true),
      ("base5000",    5000, true,  true))

    // round-robin the variants across repetitions and keep the MIN:
    // tmpfs/page-cache/GC interference between adjacent runs is larger
    // than the effects under measurement, so sequential per-variant
    // timing produced ordering artifacts (a no-op variant "slower" than
    // the full path). The min over interleaved runs is the standard
    // low-noise statistic for attribution.
    def runOnce(maxActions: Int, sc: Boolean, at: Boolean): Double = {
      val dir = java.nio.file.Files.createTempDirectory("sinkbench").toString
      val sec = timeSec(EsBulkSink.writeWith(records,
        () => new FileEsBulkClient(dir, "ts", sidecars = sc, atomicPublish = at),
        maxActions = maxActions))
      rmTree(dir)
      sec
    }
    variants.foreach { case (_, ma, sc, at) => runOnce(ma, sc, at) } // warmup
    val timings = scala.collection.mutable.Map.empty[String, List[Double]]
    (0 until 3).foreach { _ =>
      variants.foreach { case (name, ma, sc, at) =>
        timings(name) = runOnce(ma, sc, at) :: timings.getOrElse(name, Nil)
      }
    }
    val results = variants.map { case (name, _, _, _) => name -> timings(name).min }

    // per-doc Jackson ts-extraction cost, measured in isolation on the
    // driver (the only per-doc work the sidecar added to the hot loop)
    val sample = records.limit(100000).collect()
    BulkStats.tsOf(sample.head.source, "ts") // classload/JIT warmup
    val tsSec = timeSec(sample.foreach(r => BulkStats.tsOf(r.source, "ts")))

    records.unpersist()
    val vs = results.map { case (k, v) =>
      "\"" + k + "\":{\"sec\":" + v + ",\"docs_per_s\":" + (nDocs / v) + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"sink_publish","docs":$nDocs,"variants":$vs,""" +
      s""""tsof_sec_per_100k":$tsSec}""")
    spark.stop()
  }
}
