package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest._

/** A6/A7 over a live wire: the java.net.http `_bulk` transport against
  * an in-process HTTP stub — proves the "production swap is config-only"
  * claim (SURVEY §7.3): the same BulkBuffer policy drives either the
  * file-simulated client or this one, and the stub sees the exact
  * `_bulk` ndjson + auth headers a real ES node would. */
class HttpIngestSpec extends AnyFunSuite {

  /** Minimal ES `_bulk` stub: records requests, serves a scripted
    * status sequence (then 200 {"errors":false} forever). */
  private class BulkStub(statuses: Int*) {
    val requests = mutable.ArrayBuffer.empty[(String, Map[String, String], String)]
    private val calls = new AtomicInteger(0)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val headers = ex.getRequestHeaders.entrySet().iterator()
      val h = mutable.Map.empty[String, String]
      while (headers.hasNext) { val e = headers.next(); h(e.getKey) = e.getValue.get(0) }
      synchronized { requests += ((ex.getRequestURI.getPath, h.toMap, body)) }
      val n = calls.getAndIncrement()
      val (code, resp) =
        if (n < statuses.length && statuses(n) != 200) (statuses(n), s"""{"error":"scripted ${statuses(n)}"}""")
        else (200, """{"took":1,"errors":false,"items":[]}""")
      val bytes = resp.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("bulk POST: wire-faithful ndjson body, _bulk path, auth + content-type headers") {
    val stub = new BulkStub()
    try {
      val headers = Map("Content-Type" -> "application/x-ndjson") ++
        EsRestAuth.basicAuthHeader("elastic", "s3cret")
      val client = new HttpEsBulkClient(Seq(stub.base), headers)
      client.bulk(Seq(
        BulkAction("idx", "1", """{"v":1}"""),
        BulkAction("idx", "2", """{"v":2}""")))
      assert(stub.requests.size === 1)
      val (path, h, body) = stub.requests.head
      assert(path === "/_bulk")
      assert(h("Content-type") === "application/x-ndjson")
      val expectedAuth = "Basic " + java.util.Base64.getEncoder
        .encodeToString("elastic:s3cret".getBytes(UTF_8))
      assert(h("Authorization") === expectedAuth)
      assert(body ===
        "{\"index\":{\"_index\":\"idx\",\"_id\":\"1\"}}\n{\"v\":1}\n" +
        "{\"index\":{\"_index\":\"idx\",\"_id\":\"2\"}}\n{\"v\":2}\n")
    } finally stub.stop()
  }

  test("429/5xx: BulkBuffer retries through exponential backoff until accepted") {
    val stub = new BulkStub(429, 503)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val slept = mutable.ArrayBuffer.empty[Long]
      val buffer = new BulkBuffer(client, maxActions = 64, sleeper = (d: Long) => slept += d)
      buffer.add(BulkAction("idx", "1", """{"v":1}"""))
      buffer.flush()
      // two scripted failures -> two backoff sleeps (2s, 4s), third wins
      assert(stub.requests.size === 3)
      assert(slept.toSeq === Seq(2000L, 4000L))
    } finally stub.stop()
  }

  test("2xx envelope with errors:true is a retryable failure") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val resp = """{"took":1,"errors":true,"items":[{"index":{"status":429}}]}""".getBytes(UTF_8)
      ex.getRequestBody.readAllBytes()
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val client = new HttpEsBulkClient(
        Seq(s"http://127.0.0.1:${server.getAddress.getPort}"), Map.empty)
      val e = intercept[java.io.IOException](client.bulk(Seq(BulkAction("i", "1", "{}"))))
      assert(e.getMessage.contains("item errors"))
    } finally server.stop(0)
  }

  /** Item-level `_bulk` stub: parses the request ndjson and answers a
    * per-item status from `script(callIndex, docId)` — the aligned
    * `items` array a real ES node returns. */
  private class ItemStub(script: (Int, String) => Int) {
    val requests = mutable.ArrayBuffer.empty[Seq[String]] // doc ids per call
    private val calls = new AtomicInteger(0)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val ids = body.linesIterator.filter(_.startsWith("{\"index\""))
        .map(l => l.split("\"_id\":\"")(1).takeWhile(_ != '"')).toSeq
      val n = synchronized { requests += ids; calls.getAndIncrement() }
      val items = ids.map { id =>
        val s = script(n, id)
        val err = if (s >= 200 && s < 300) ""
          else s""","error":{"type":"stub","reason":"scripted $s for $id"}"""
        s"""{"index":{"_id":"$id","status":$s$err}}"""
      }.mkString(",")
      val errors = ids.exists(id => { val s = script(n, id); s < 200 || s >= 300 })
      val resp = s"""{"took":1,"errors":$errors,"items":[$items]}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("poison doc: permanent 400 item is dead-lettered once, 63 good docs index with zero retries") {
    // doc "13" always fails with a mapping-style 400; everything else indexes
    val stub = new ItemStub((_, id) => if (id == "13") 400 else 201)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val slept = mutable.ArrayBuffer.empty[Long]
      val dead = mutable.ArrayBuffer.empty[BulkItemFailure]
      val buffer = new BulkBuffer(client, maxActions = 64,
        sleeper = (d: Long) => slept += d, deadLetter = (f: BulkItemFailure) => dead += f)
      (1 to 64).foreach(i => buffer.add(BulkAction("idx", i.toString, s"""{"v":$i}""")))
      // 64th add triggers the flush; no exception, ONE request, no backoff
      assert(stub.requests.size === 1)
      assert(slept.isEmpty, "a permanent reject must not burn the retry budget")
      assert(dead.map(_.action.docId).toSeq === Seq("13"))
      assert(dead.head.status === 400)
      assert(dead.head.reason.contains("scripted 400"))
    } finally stub.stop()
  }

  test("429 subset: only the throttled items are re-sent, then succeed") {
    // first call: odd ids throttled with 429; second call: all accepted
    val stub = new ItemStub((call, id) => if (call == 0 && id.toInt % 2 == 1) 429 else 201)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val slept = mutable.ArrayBuffer.empty[Long]
      val dead = mutable.ArrayBuffer.empty[BulkItemFailure]
      val buffer = new BulkBuffer(client, maxActions = 64,
        sleeper = (d: Long) => slept += d, deadLetter = (f: BulkItemFailure) => dead += f)
      (1 to 10).foreach(i => buffer.add(BulkAction("idx", i.toString, s"""{"v":$i}""")))
      buffer.flush()
      assert(stub.requests.size === 2)
      assert(stub.requests(0) === (1 to 10).map(_.toString))
      // retry carries ONLY the five throttled docs, after one backoff step
      assert(stub.requests(1) === Seq("1", "3", "5", "7", "9"))
      assert(slept.toSeq === Seq(2000L))
      assert(dead.isEmpty)
    } finally stub.stop()
  }

  test("items that keep failing retryably exhaust maxRetries and throw") {
    val stub = new ItemStub((_, id) => if (id == "2") 503 else 201)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val buffer = new BulkBuffer(client, maxActions = 64, maxRetries = 3,
        sleeper = (_: Long) => ())
      (1 to 4).foreach(i => buffer.add(BulkAction("idx", i.toString, s"""{"v":$i}""")))
      val e = intercept[java.io.IOException](buffer.flush())
      assert(e.getMessage.contains("still failing after 3 retries"))
      // initial call + 3 retries, each retry only the failing doc
      assert(stub.requests.size === 4)
      assert(stub.requests.drop(1).forall(_ == Seq("2")))
    } finally stub.stop()
  }

  test("retry round turning permanent: 429 item that 400s on re-send is dead-lettered, not looped") {
    // call 0: doc "5" throttled (429); call 1 (the retry): same doc now
    // permanently rejected (400) — the pending set must go empty via the
    // dead-letter route, not spin against the retry budget
    val stub = new ItemStub((call, id) =>
      if (id == "5") { if (call == 0) 429 else 400 } else 201)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val slept = mutable.ArrayBuffer.empty[Long]
      val dead = mutable.ArrayBuffer.empty[BulkItemFailure]
      val buffer = new BulkBuffer(client, maxActions = 64,
        sleeper = (d: Long) => slept += d, deadLetter = (f: BulkItemFailure) => dead += f)
      (1 to 10).foreach(i => buffer.add(BulkAction("idx", i.toString, s"""{"v":$i}""")))
      buffer.flush()
      // initial call + exactly one retry of just doc 5, then done
      assert(stub.requests.size === 2)
      assert(stub.requests(1) === Seq("5"))
      assert(slept.toSeq === Seq(2000L))
      assert(dead.map(f => (f.action.docId, f.status)).toSeq === Seq(("5", 400)))
    } finally stub.stop()
  }

  test("rejects are observable with the default no-op dead-letter (counter + no throw)") {
    val stub = new ItemStub((_, id) => if (id == "3") 400 else 201)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val before = BulkBuffer.rejectedTotal.get()
      val buffer = new BulkBuffer(client, maxActions = 64, sleeper = (_: Long) => ())
      (1 to 8).foreach(i => buffer.add(BulkAction("idx", i.toString, s"""{"v":$i}""")))
      buffer.flush() // default deadLetter drops — but never silently
      assert(BulkBuffer.rejectedTotal.get() - before === 1)
    } finally stub.stop()
  }

  test("dead-letter round trip: reject -> FileDeadLetter -> read back, at-least-once deduped") {
    val spark = SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("dlq-rt").toString
    val dl = new FileDeadLetter(dir)
    val f = BulkItemFailure(BulkAction("idx", "7", """{"v":7,"s":"a\"b"}"""), 400, "mapper_parsing_exception")
    dl(f)
    dl(BulkItemFailure(BulkAction("idx", "9", """{"v":9}"""), 404, "index_not_found"))
    dl(f) // the Spark-batch-retry double delivery (at-least-once contract)
    val raw = FileDeadLetter.read(spark, dir, dedup = false).collect()
    assert(raw.length === 3)
    val rows = FileDeadLetter.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3), r.getString(4)))
      .sortBy(_._2)
    assert(rows.toSeq === Seq(
      ("idx", "7", 400, "mapper_parsing_exception", """{"v":7,"s":"a\"b"}"""),
      ("idx", "9", 404, "index_not_found", """{"v":9}""")))
  }

  test("FileDeadLetter: rejected items land as readable ndjson with status + reason") {
    val dir = java.nio.file.Files.createTempDirectory("dlq").toString
    val dl = new FileDeadLetter(dir)
    dl(BulkItemFailure(BulkAction("idx", "7", """{"v":7}"""), 400, "mapper_parsing_exception"))
    dl(BulkItemFailure(BulkAction("idx", "9", """{"v":9}"""), 404, "index_not_found"))
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val files = try listing.iterator().asScala.toSeq finally listing.close()
    assert(files.size === 1) // one instance = one file
    val lines = java.nio.file.Files.readAllLines(files.head).asScala
    assert(lines.size === 2)
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(lines.head)
    assert(n.path("docId").asText() === "7")
    assert(n.path("status").asInt() === 400)
    assert(n.path("reason").asText() === "mapper_parsing_exception")
    assert(n.path("source").asText() === """{"v":7}""")
  }

  test("distributed sink over HTTP: per-partition buffers bulk to the live endpoint") {
    val stub = new BulkStub()
    try {
      val spark = SparkSpec.session
      import spark.implicits._
      val records = (1 to 150).map(i => IngestRecord("idx", i.toString, s"""{"v":$i}"""))
        .toDS().repartition(4)
      val base = stub.base
      EsBulkSink.writeWith(records, () => new HttpEsBulkClient(Seq(base), Map.empty))
      // 4 partitions x (64-action flushes + final flush) — every doc arrives once
      val ids = stub.requests.flatMap(_._3.linesIterator
        .filter(_.startsWith("{\"index\"")).map(l => l.split("\"_id\":\"")(1).takeWhile(_ != '"')))
      assert(ids.sorted.toSeq === (1 to 150).map(_.toString).sorted)
      assert(stub.requests.forall(_._3.linesIterator.count(_.startsWith("{\"index\"")) <= 64))
    } finally stub.stop()
  }

  /** Stub enforcing a byte cap like a real node's http.max_content_length:
    * any request whose body exceeds `limit` bytes is refused with 413
    * before parsing; accepted requests index all items (201). */
  private class SizeCappedStub(limit: Int) {
    val requests = mutable.ArrayBuffer.empty[(Int, Seq[String])] // (bytes, doc ids)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val ids = body.linesIterator.filter(_.startsWith("{\"index\""))
        .map(l => l.split("\"_id\":\"")(1).takeWhile(_ != '"')).toSeq
      synchronized { requests += ((body.getBytes(UTF_8).length, ids)) }
      val (code, resp) =
        if (body.getBytes(UTF_8).length > limit)
          (413, """{"error":"Request Entity Too Large"}""")
        else {
          val items = ids.map(id => s"""{"index":{"_id":"$id","status":201}}""").mkString(",")
          (200, s"""{"took":1,"errors":false,"items":[$items]}""")
        }
      val bytes = resp.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("413: oversized batch is bisected until accepted — no retry budget burned, every doc indexed once") {
    // 16 modest docs whose combined body exceeds the cap; any half fits
    val stub = new SizeCappedStub(limit = 1200)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val slept = mutable.ArrayBuffer.empty[Long]
      val dead = mutable.ArrayBuffer.empty[BulkItemFailure]
      val buffer = new BulkBuffer(client, maxActions = 64,
        sleeper = (d: Long) => slept += d, deadLetter = (f: BulkItemFailure) => dead += f)
      (1 to 16).foreach(i => buffer.add(BulkAction("idx", i.toString, s"""{"v":$i,"pad":"${"x" * 64}"}""")))
      buffer.flush()
      // deterministic failure handled by splitting, not backoff
      assert(slept.isEmpty, "413 must not enter the exponential-backoff loop")
      assert(dead.isEmpty)
      val accepted = stub.requests.filter(_._1 <= 1200).flatMap(_._2)
      assert(accepted.sorted === (1 to 16).map(_.toString).sorted, "every doc indexed exactly once")
    } finally stub.stop()
  }

  test("413: a single action bigger than the cap dead-letters; its neighbors still index") {
    val stub = new SizeCappedStub(limit = 2000)
    try {
      val client = new HttpEsBulkClient(Seq(stub.base), Map.empty)
      val slept = mutable.ArrayBuffer.empty[Long]
      val dead = mutable.ArrayBuffer.empty[BulkItemFailure]
      val buffer = new BulkBuffer(client, maxActions = 64,
        sleeper = (d: Long) => slept += d, deadLetter = (f: BulkItemFailure) => dead += f)
      (1 to 9).foreach(i => buffer.add(BulkAction("idx", i.toString, s"""{"v":$i}""")))
      buffer.add(BulkAction("idx", "giant", s"""{"v":0,"blob":"${"x" * 4000}"}"""))
      buffer.flush()
      assert(slept.isEmpty)
      // the uncappable doc is a permanent per-item reject with status 413
      assert(dead.map(f => (f.action.docId, f.status)).toSeq === Seq(("giant", 413)))
      assert(dead.head.reason.contains("http.max_content_length"))
      val accepted = stub.requests.filter(_._1 <= 2000).flatMap(_._2)
      assert(accepted.sorted === (1 to 9).map(_.toString).sorted)
    } finally stub.stop()
  }

  test("config-only swap: client built from IngestionConfig carries the configured auth") {
    val stub = new BulkStub()
    try {
      val cfg = IngestionConfig.fromArgs(Seq(
        s"sink.elasticsearch-urls=${stub.base}",
        "sink.username=svc", "sink.password=pw"))
      val client = HttpEsBulkClient.forConfig(cfg)
      client.bulk(Seq(BulkAction("idx", "1", """{"v":1}""")))
      val (_, h, _) = stub.requests.head
      val expectedAuth = "Basic " + java.util.Base64.getEncoder
        .encodeToString("svc:pw".getBytes(UTF_8))
      assert(h("Authorization") === expectedAuth)
    } finally stub.stop()
  }
}
