package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import java.util.concurrent.atomic.AtomicLong

/** Production ES `_bulk` transport over `java.net.http` — the live-HTTP
  * implementation of [[EsBulkClient]] the reference's whole job exists
  * to drive (RestHighLevelClient bulk at core.clj:48-53, Elasticsearch7
  * SinkFunction at core.clj:68-79, Basic-auth CredentialsProvider at
  * core.clj:19-26).
  *
  * Behavior contract:
  *  - POSTs the wire-faithful ndjson body to `{base}/_bulk` with the
  *    [[EsRestAuth]] header set (Content-Type: application/x-ndjson +
  *    RFC 7617 Basic auth when credentials are configured);
  *  - multiple hosts round-robin per call (the reference passes the
  *    full HttpHost list to the client, core.clj:36-46);
  *  - any transport error, non-2xx status (429 throttling, 5xx), or a
  *    2xx body with `"errors":true` throws — which is exactly the
  *    retryable-failure signal [[BulkBuffer]] converts into the
  *    reference's 10-step exponential backoff (core.clj:75-78).
  *
  * The client object is per-executor-task (created inside
  * `foreachPartition`, like [[FileEsBulkClient]]); `HttpClient` itself
  * is cheap and connection-pooling, so no extra sharing layer is
  * needed. Serialization note: the class is constructed on executors,
  * never shipped — only the config strings cross the wire.
  */
final class HttpEsBulkClient(
    baseUrls: Seq[String],
    headers: Map[String, String],
    requestTimeoutMs: Long = 30000) extends EsBulkClient {
  require(baseUrls.nonEmpty, "at least one ES base URL required")

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(requestTimeoutMs)).build()
  private val next = new AtomicLong(0)

  override def bulk(actions: Seq[BulkAction]): Unit = {
    if (actions.isEmpty) return
    val sb = new java.lang.StringBuilder(actions.size * 128)
    actions.foreach { a =>
      sb.append("""{"index":{"_index":""").append(JsonStr.quote(a.indexId))
        .append(""","_id":""").append(JsonStr.quote(a.docId)).append("}}\n")
      sb.append(a.source).append('\n')
    }
    val base = baseUrls(((next.getAndIncrement() % baseUrls.size) + baseUrls.size).toInt % baseUrls.size)
    val builder = HttpRequest.newBuilder(URI.create(s"$base/_bulk"))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .POST(HttpRequest.BodyPublishers.ofString(sb.toString, UTF_8))
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = http.send(builder.build(), HttpResponse.BodyHandlers.ofString(UTF_8))
    val code = resp.statusCode()
    if (code < 200 || code >= 300)
      throw new java.io.IOException(s"bulk request failed: HTTP $code ${resp.body().take(200)}")
    // ES returns 200 even when individual items failed; the envelope's
    // errors flag is the authoritative signal (same check the reference
    // client performs internally before its failure handler fires)
    if (resp.body().contains("\"errors\":true"))
      throw new java.io.IOException(s"bulk response has item errors: ${resp.body().take(200)}")
  }
}

object HttpEsBulkClient {
  /** The "production swap is config-only" constructor (SURVEY §7.3):
    * build the live client for a sink config's URL list + credentials. */
  def forConfig(config: IngestionConfig): HttpEsBulkClient =
    new HttpEsBulkClient(EsRestAuth.baseUrls(config.sinkUrls), EsRestAuth.bulkHeaders(config))
}
