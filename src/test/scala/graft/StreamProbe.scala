package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Isolation probe for the bench's streaming-latency section: replays
  * the same copy → DSv2-stream drain and prints the per-phase
  * durationMs breakdown of every non-empty micro-batch, so a trigger
  * overshoot can be attributed (source planning vs WAL vs execution)
  * instead of guessed at.
  *
  *   sbt "Test/runMain graft.StreamProbe"      (SPARK_GRAFT_SF_DIR)
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val copyDir = java.nio.file.Files.createTempDirectory("stream-probe-sink").toString
    val events = ingest.Emit.ing01EmitEvents(spark, sfDir)
    val lines = Tables.lineitem(spark, sfDir).select(
      lit("lineitem").as("index_id"),
      concat_ws("-", $"l_orderkey", $"l_linenumber").as("doc_id"),
      to_json(struct($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice",
        $"l_shipdate".cast("string").as("ts"))).as("source"))
    val recs = events.unionByName(lines)
      .withColumn("sort_ts", get_json_object($"source", "$.ts"))
      .repartitionByRange(cpus.toInt, $"sort_ts")
      .sortWithinPartitions($"sort_ts")
      .withColumnRenamed("index_id", "indexId").withColumnRenamed("doc_id", "docId")
      .select($"indexId", $"docId", $"source")
      .as[ingest.IngestRecord]
    val n = recs.count()
    val t0 = System.nanoTime()
    ingest.EsBulkSink.write(recs, copyDir)
    println(f"COPY $n docs in ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"files=${sources.EsSimStats.list(copyDir).size}")

    sources.EsSimSource.filesOpened.set(0)
    val ckpt = java.nio.file.Files.createTempDirectory("stream-probe-ckpt").toString
    val q = spark.readStream
      .format("graft.sources.EsSimSourceProvider")
      .option("path", copyDir).option("tsField", "ts").option("batchSize", "10000")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(1000))
      .foreachBatch { (b: DataFrame, _: Long) => b.queryExecution.toRdd.count(); () }
      .start()
    val deadline = System.currentTimeMillis() + 60000
    while (System.currentTimeMillis() < deadline &&
           q.recentProgress.count(_.numInputRows > 0) < 10)
      Thread.sleep(500)
    q.stop()
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val d = p.durationMs
      println(s"BATCH rows=${p.numInputRows} trigger=${d.get("triggerExecution")} " +
        s"addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")} " +
        s"latestOffset=${d.get("latestOffset")} queryPlanning=${d.get("queryPlanning")} " +
        s"walCommit=${d.get("walCommit")} commitOffsets=${d.get("commitOffsets")}")
    }
    println(s"FILES opened=${sources.EsSimSource.filesOpened.get()} " +
      s"inStore=${sources.EsSimStats.list(copyDir).size}")
    BenchUtil.rmTree(copyDir); BenchUtil.rmTree(ckpt)
    spark.stop()
  }
}
