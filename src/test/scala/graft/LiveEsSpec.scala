package graft

import graft.ingest.{BulkAction, EsRestAuth, HttpEsBulkClient, HttpEsScanClient}
import graft.ingest.EsHttpScan

/** Live-Elasticsearch contract suite — the residual risk VERDICT r8
  * names as the one missing item: both HTTP transports are wire-tested
  * against in-process stubs (`HttpIngestSpec`, `HttpScanSpec`), but
  * real-cluster quirks (dynamic mapping, PIT slice behavior on
  * multi-shard indices, refresh semantics) only show against a real
  * cluster, and none exists in the offline sandbox.
  *
  * Env-gated: point ES_URL at a cluster (e.g. `http://localhost:9200`
  * from the reference's dev harness, dev/docker-compose.yml:3-23) and
  * optionally set ES_USERNAME / ES_PASSWORD; run
  * `sbt "testOnly graft.LiveEsSpec"`. Without ES_URL every test CANCELS
  * (reported as canceled, not failed), so the suite is a no-op in CI
  * and a push-button verification the day a cluster exists.
  *
  * Covers the reference's full declared surface end to end: A1/A5 bulk
  * writes with Basic auth, B4 idempotent upsert-by-id (core.clj:63),
  * and the B1 scan in its production form (PIT + `search_after`,
  * sliced) including the B2 incremental ts lower bound. */
class LiveEsSpec extends SparkSpec {

  private val esUrl = sys.env.get("ES_URL")

  private def gate(): (Seq[String], Map[String, String]) = {
    assume(esUrl.isDefined, "ES_URL not set — live Elasticsearch suite skipped")
    val headers = (Map("Content-Type" -> "application/json") ++
      EsRestAuth.basicAuthHeader(
        sys.env.getOrElse("ES_USERNAME", ""), sys.env.getOrElse("ES_PASSWORD", ""))).toMap
    (Seq(esUrl.get), headers)
  }

  /** Raw admin call (create/refresh/delete index) — test plumbing only;
    * the code under test never needs index administration. */
  private def admin(urls: Seq[String], headers: Map[String, String],
                    method: String, path: String, body: String = null): Unit = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"${urls.head}$path"))
      .method(method, if (body == null) java.net.http.HttpRequest.BodyPublishers.noBody()
                      else java.net.http.HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = java.net.http.HttpClient.newHttpClient()
      .send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() >= 200 && resp.statusCode() < 300,
      s"$method $path -> HTTP ${resp.statusCode()}: ${resp.body().take(300)}")
  }

  test("live ES: bulk index + idempotent re-send + sliced PIT scan + incremental ts bound") {
    val (urls, headers) = gate()
    val idx = s"graft-live-${System.currentTimeMillis()}"
    // 2 shards on purpose: PIT slicing across multiple shards is the
    // named real-cluster risk the stub cannot reproduce
    admin(urls, headers, "PUT", s"/$idx", """{"settings":{"number_of_shards":2}}""")
    try {
      val n = 250
      // ts = epoch micros (a number): dynamic-maps to long, so the scan
      // client's numeric range/sort semantics hold without an explicit
      // mapping — the same convention BulkStats.parseTsMicros accepts
      val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in micros
      def docs = (0 until n).map(i =>
        BulkAction(idx, i.toString, s"""{"id":$i,"ts":${t0 + i * 1000000L},"v":${i * 2}}"""))
      val bulkHeaders = headers.updated("Content-Type", "application/x-ndjson")
      val bulk = new HttpEsBulkClient(urls, bulkHeaders)
      bulk.bulk(docs)
      // B4 idempotence: same ids re-sent = upsert, not duplication
      bulk.bulk(docs)
      admin(urls, headers, "POST", s"/$idx/_refresh")

      val scan = new HttpEsScanClient(urls, headers)
      val all = scan.withPit(idx) { pit =>
        EsHttpScan.read(spark, urls, headers, pit, slices = 3, pageSize = 64).collect()
      }
      assert(all.length === n, "sliced PIT scan must return every doc exactly once")
      assert(all.map(_.getString(0)).toSet === (0 until n).map(_.toString).toSet)
      // B2 incremental: ts >= t0 + 100 s keeps exactly the last 150 docs
      val some = scan.withPit(idx) { pit =>
        EsHttpScan.read(spark, urls, headers, pit, slices = 2, pageSize = 64,
          tsField = "ts", tsGteMicros = Some(t0 + 100L * 1000000L)).collect()
      }
      assert(some.length === n - 100)
      assert(some.map(_.getString(0).toInt).min === 100)
    } finally admin(urls, headers, "DELETE", s"/$idx")
  }

  test("live ES: PIT snapshot isolation — writes after open are invisible to the scan") {
    val (urls, headers) = gate()
    val idx = s"graft-live-pit-${System.currentTimeMillis()}"
    admin(urls, headers, "PUT", s"/$idx", """{"settings":{"number_of_shards":2}}""")
    try {
      val bulk = new HttpEsBulkClient(urls, headers.updated("Content-Type", "application/x-ndjson"))
      bulk.bulk((0 until 50).map(i => BulkAction(idx, i.toString, s"""{"id":$i,"ts":$i}""")))
      admin(urls, headers, "POST", s"/$idx/_refresh")
      val scan = new HttpEsScanClient(urls, headers)
      val seen = scan.withPit(idx) { pit =>
        // a concurrent writer lands AFTER the snapshot froze
        bulk.bulk((50 until 80).map(i => BulkAction(idx, i.toString, s"""{"id":$i,"ts":$i}""")))
        admin(urls, headers, "POST", s"/$idx/_refresh")
        scan.pages(pit, "ts", 16).map(_.id).toVector
      }
      assert(seen.size === 50, "PIT scan must read the frozen snapshot, not later writes")
    } finally admin(urls, headers, "DELETE", s"/$idx")
  }
}
