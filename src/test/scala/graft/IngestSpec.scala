package graft

import org.apache.spark.sql.functions._
import graft.ingest._

class IngestSpec extends SparkSpec {

  test("config: CLI args merge over defaults (reference A9 bug fixed)") {
    val c = IngestionConfig.fromArgs(Seq(
      "source.elasticsearch-url=es1:9201,es2",
      "sink.bulk.max-actions=128"))
    assert(c.sourceUrls === Seq(HostPort("es1", 9201, "http"), HostPort("es2", 9200, "http")))
    assert(c.bulkMaxActions === 128)
    assert(c.bulkFlushIntervalMs === 5000)
    assert(c.bulkMaxRetries === 10)
    assert(c.bulkBackoffInitialMs === 2000)
    intercept[IllegalArgumentException](IngestionConfig.fromArgs(Seq("nope=1")))
  }

  test("config: url parser defaults port 9200 and scheme http (not the 9092 typo)") {
    assert(IngestionConfig.parseUrls("https://secure:443") ===
      Seq(HostPort("secure", 443, "https")))
    assert(IngestionConfig.defaults("source.elasticsearch-url").endsWith("9200"))
  }

  test("bulk buffer: flushes at 64 actions, null-safe skip, final flush on close") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val client = new EsBulkClient {
      def bulk(as: Seq[BulkAction]): Unit = seen += as.size
    }
    val buf = new BulkBuffer(client, maxActions = 64, flushIntervalMs = Long.MaxValue)
    (1 to 150).foreach(i => buf.add(BulkAction("i", i.toString, s"""{"v":$i}""")))
    buf.add(BulkAction("i", "x", null)) // nil body skipped (core.clj:59-60)
    buf.add(BulkAction("i", null, "{}")) // no doc id skipped
    buf.flush()
    assert(seen.toSeq === Seq(64, 64, 22))
  }

  test("bulk buffer: exponential backoff 2s,4s,8s... max 10 retries") {
    val target = new FileEsBulkClient(java.nio.file.Files.createTempDirectory("es").toString)
    val flaky = new FlakyEsBulkClient(target, failures = 3)
    val buf = new BulkBuffer(flaky, sleeper = _ => (), backoffInitialMs = 2000)
    buf.add(BulkAction("i", "1", "{}"))
    buf.flush()
    assert(buf.backoffsSeen.toSeq === Seq(2000L, 4000L, 8000L))
    assert(flaky.attempts.get === 4)

    val alwaysFail = new FlakyEsBulkClient(target, failures = 100)
    val buf2 = new BulkBuffer(alwaysFail, sleeper = _ => ())
    buf2.add(BulkAction("i", "1", "{}"))
    intercept[java.io.IOException](buf2.flush())
    assert(alwaysFail.attempts.get === 11) // 1 initial + 10 retries (core.clj:75)
  }

  test("sink end-to-end: write events, read back, upsert on re-run (B4 idempotence)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("essim").toString
    val records = Emit.ing01EmitEvents(spark, sf0001)
      .withColumnRenamed("index_id", "indexId")
      .withColumnRenamed("doc_id", "docId")
      .as[IngestRecord]
    EsBulkSink.write(records, dir)
    val first = EsSimStore.read(spark, dir)
    val n = Tables.events(spark, sf0001).count()
    assert(first.count() === n)
    // re-run the same copy: counts stable (upsert, not append)
    EsBulkSink.write(records, dir)
    val second = EsSimStore.read(spark, dir)
    assert(second.count() === n)
    // byte-faithful: source bodies match the emitter output exactly
    val emitted = records.select($"docId", $"source").as[(String, String)].collect().toMap
    val readBack = second.select($"docId", $"source").as[(String, String)].collect().toMap
    assert(readBack === emitted)
  }
}
