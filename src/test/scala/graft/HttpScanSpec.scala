package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest._

/** B1/B2 over the PRODUCTION scan protocol: point-in-time +
  * `search_after` (the modern replacement for the scroll API the
  * reference deferred at core.clj:131-132), against an in-process ES
  * stub that implements PIT snapshot semantics, composite-sort paging,
  * and server-side slicing. Proves the config-only swap story for the
  * source side, like HttpIngestSpec does for the sink. */
class HttpScanSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Minimal ES search stub: `POST /{index}/_pit` freezes a snapshot,
    * `POST /_search` pages it with (ts, _id) sort + search_after +
    * slice, `DELETE /_pit` releases. Mirrors the documented REST
    * behavior this client codes against. */
  private class SearchStub(initial: Seq[(String, Long, String)]) {
    /** live corpus — mutable so tests can write DURING an open PIT */
    val corpus = mutable.ArrayBuffer.empty[(String, Long, String)] ++ initial
    val pits = mutable.Map.empty[String, Seq[(String, Long, String)]]
    val closedPits = mutable.ArrayBuffer.empty[String]
    val searchBodies = mutable.ArrayBuffer.empty[String]
    val searchHeaders = mutable.ArrayBuffer.empty[Map[String, String]]
    private val pitSeq = new AtomicInteger(0)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val (code, resp) = synchronized {
        (method, path) match {
          case ("POST", p) if p.endsWith("/_pit") =>
            val id = s"pit-${pitSeq.getAndIncrement()}"
            pits(id) = corpus.toSeq // the frozen snapshot
            (200, s"""{"id":"$id"}""")
          case ("DELETE", "/_pit") =>
            val id = mapper.readTree(body).path("id").asText()
            closedPits += id
            pits.remove(id)
            (200, """{"succeeded":true,"num_freed":1}""")
          case ("POST", "/_search") =>
            searchBodies += body
            val h = mutable.Map.empty[String, String]
            val it = ex.getRequestHeaders.entrySet().iterator()
            while (it.hasNext) { val e = it.next(); h(e.getKey) = e.getValue.get(0) }
            searchHeaders += h.toMap
            val req = mapper.readTree(body)
            val pitId = req.path("pit").path("id").asText()
            pits.get(pitId) match {
              case None => (404, s"""{"error":"no such point in time [$pitId]"}""")
              case Some(snapshot) =>
                val size = req.path("size").asInt(10)
                val gte = if (req.path("query").isMissingNode) Long.MinValue
                  else req.path("query").path("range").path("ts").path("gte").asLong(Long.MinValue)
                val slice = req.path("slice")
                val afterN = req.path("search_after")
                val after: Option[(Long, String)] =
                  if (afterN.isMissingNode) None
                  else Some((afterN.get(0).asLong(), afterN.get(1).asText()))
                val sorted = snapshot
                  .filter(_._2 >= gte)
                  .filter { case (id, _, _) =>
                    slice.isMissingNode ||
                      math.floorMod(id.hashCode, slice.path("max").asInt()) == slice.path("id").asInt() }
                  .sortBy { case (id, ts, _) => (ts, id) }
                val page = after match {
                  case None => sorted.take(size)
                  case Some((aTs, aId)) =>
                    sorted.dropWhile { case (id, ts, _) =>
                      ts < aTs || (ts == aTs && id <= aId) }.take(size)
                }
                val hits = page.map { case (id, ts, src) =>
                  s"""{"_id":"$id","_source":$src,"sort":[$ts,"$id"]}""" }.mkString(",")
                (200, s"""{"pit_id":"$pitId","hits":{"hits":[$hits]}}""")
            }
          case _ => (400, s"""{"error":"unexpected $method $path"}""")
        }
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

  private def docs(n: Int): Seq[(String, Long, String)] =
    // ids deliberately NOT in ts order, with ts ties, to exercise the
    // composite (ts, _id) sort the cursor depends on; 19 is coprime to
    // every fixture size here, so i*19 mod n is a permutation (unique ids)
    (1 to n).map(i => (f"doc-${(i * 19) % n}%04d", 1000L + i / 3, s"""{"v":$i}"""))

  test("PIT + search_after: full scan pages the snapshot exactly once, requests carry pit + sort") {
    val corpus = docs(37)
    val stub = new SearchStub(corpus)
    try {
      val client = new HttpEsScanClient(Seq(stub.base),
        Map("Content-Type" -> "application/json") ++ EsRestAuth.basicAuthHeader("svc", "pw"))
      val got = client.withPit("events") { pit =>
        client.pages(pit, "ts", size = 10).toVector
      }
      // every doc exactly once, in composite (ts, _id) order
      val want = corpus.sortBy { case (id, ts, _) => (ts, id) }
      assert(got.map(_.id) === want.map(_._1))
      assert(got.map(_.source) === want.map(_._3))
      // short-page termination: ceil(37/10) = 4 round trips, no 5th
      assert(stub.searchBodies.size === 4)
      assert(stub.searchBodies.forall(_.contains(""""pit":{"id":"pit-0"""")))
      assert(stub.searchBodies.forall(_.contains(""""sort":[{"ts":"asc"},{"_id":"asc"}]""")))
      // pages 2..4 carry the previous page's cursor verbatim
      assert(stub.searchBodies.drop(1).forall(_.contains(""""search_after":[""")))
      assert(stub.searchHeaders.forall(_.get("Authorization").exists(_.startsWith("Basic "))))
      // the PIT was released at the end of withPit
      assert(stub.closedPits.toSeq === Seq("pit-0"))
    } finally stub.stop()
  }

  test("sliced scan: slices are pairwise disjoint and their union is the snapshot") {
    val corpus = docs(137)
    val stub = new SearchStub(corpus)
    try {
      val client = new HttpEsScanClient(Seq(stub.base), Map.empty)
      val perSlice = client.withPit("events") { pit =>
        (0 until 3).map(i => client.pages(pit, "ts", 10, Some((i, 3))).map(_.id).toSet)
      }
      val union = perSlice.reduce(_ ++ _)
      assert(union === corpus.map(_._1).toSet)
      for (i <- 0 until 3; j <- (i + 1) until 3)
        assert(perSlice(i).intersect(perSlice(j)).isEmpty, s"slices $i and $j overlap")
    } finally stub.stop()
  }

  test("checkpointed cursor: a restarted scan resumes mid-slice with no loss or duplication") {
    val corpus = docs(37)
    val stub = new SearchStub(corpus)
    try {
      val client = new HttpEsScanClient(Seq(stub.base), Map.empty)
      val pit = client.openPit("events")
      val p1 = client.searchPage(pit, "ts", 10)
      val p2 = client.searchPage(pit, "ts", 10, p1.nextAfter)
      val checkpoint = p2.nextAfter // the durable cursor a restart reads back
      // "restart": a NEW client (fresh connection state) continues from it
      val resumed = new HttpEsScanClient(Seq(stub.base), Map.empty)
        .pages(pit, "ts", 10, startAfter = checkpoint).toVector
      client.closePit(pit)
      val want = corpus.sortBy { case (id, ts, _) => (ts, id) }.map(_._1)
      assert((p1.hits ++ p2.hits).map(_.id) === want.take(20))
      assert(resumed.map(_.id) === want.drop(20))
    } finally stub.stop()
  }

  test("PIT snapshot isolation: writes during the scan are invisible; a closed PIT 404s") {
    val stub = new SearchStub(docs(15))
    try {
      val client = new HttpEsScanClient(Seq(stub.base), Map.empty)
      val pit = client.openPit("events")
      stub.synchronized { stub.corpus += (("doc-new", 9999L, """{"v":-1}""")) }
      val got = client.pages(pit, "ts", 10).map(_.id).toSet
      assert(!got.contains("doc-new"), "a PIT scan must read its frozen snapshot")
      assert(got.size === 15)
      client.closePit(pit)
      val e = intercept[java.io.IOException](client.searchPage(pit, "ts", 10))
      assert(e.getMessage.contains("404"))
    } finally stub.stop()
  }

  test("incremental poll: the ts lower bound from a B2-style checkpoint prunes server-side") {
    val corpus = docs(30)
    val stub = new SearchStub(corpus)
    try {
      val client = new HttpEsScanClient(Seq(stub.base), Map.empty)
      val watermark = 1005L
      val got = client.withPit("events") { pit =>
        client.pages(pit, "ts", 10, tsGteMicros = Some(watermark)).map(_.id).toVector
      }
      val want = corpus.filter(_._2 >= watermark)
        .sortBy { case (id, ts, _) => (ts, id) }.map(_._1)
      assert(got === want)
      assert(want.size < corpus.size, "fixture must actually prune something")
    } finally stub.stop()
  }

  test("distributed scan: EsHttpScan.read maps slices onto Spark partitions, exactly-once union") {
    val corpus = docs(137)
    val stub = new SearchStub(corpus)
    try {
      val spark = SparkSpec.session
      val client = new HttpEsScanClient(Seq(stub.base), Map.empty)
      val (rows, parts) = client.withPit("events") { pit =>
        val df = EsHttpScan.read(spark, Seq(stub.base), Map.empty, pit,
          slices = 3, pageSize = 16)
        (df.collect().map(r => (r.getString(0), r.getString(1))), df.rdd.getNumPartitions)
      }
      assert(parts === 3, "one Spark partition per server-side slice")
      assert(rows.length === corpus.size)
      assert(rows.map(_._1).toSet === corpus.map(_._1).toSet)
      val srcOf = corpus.map(d => d._1 -> d._3).toMap
      rows.foreach { case (id, src) => assert(src === srcOf(id)) }
    } finally stub.stop()
  }
}
