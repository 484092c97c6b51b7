package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import java.util.concurrent.atomic.AtomicLong

/** One hit of a paged scan. `sort` is the hit's sort-value array EXACTLY
  * as the server returned it (raw JSON) — the `search_after` cursor is
  * defined as "echo these values back verbatim", and round-tripping the
  * raw array sidesteps every numeric-precision pitfall of re-encoding. */
final case class ScanHit(id: String, source: String, sort: String)

/** One page plus the cursor that continues it. `nextAfter` is the last
  * hit's sort array; None on an empty page (scan drained). */
final case class ScanPage(hits: Seq[ScanHit], nextAfter: Option[String])

/** Production ES scan transport: point-in-time + `search_after` paging,
  * sliced for parallelism — the scan protocol the reference deferred
  * ("use scrolling api", core.clj:131-132) in its MODERN form: the
  * scroll API is deprecated for new use since ES 7.10 in favor of PIT +
  * `search_after`, which this client implements (public ES REST docs:
  * paginate-search-results).
  *
  * Protocol per scan:
  *  1. `openPit(index)` — freeze a consistent snapshot of the index
  *     (`POST /{index}/_pit?keep_alive=…`); all pages read that
  *     snapshot, so a concurrent writer cannot tear the scan;
  *  2. N parallel slices (`"slice":{"id":i,"max":N}` — server-side
  *     disjoint partition of the snapshot by doc id), each paging
  *     independently with `sort: [(tsField asc), (_id asc)]` +
  *     `search_after` = the previous page's last sort values;
  *  3. `closePit` when done (snapshots hold segment references —
  *     leaking them on a 100 TB cluster pins merged-away segments).
  *
  * The (tsField, _id) sort is EXACTLY the composite cursor the
  * simulated source checkpoints ([[graft.sources.EsSimSource]] B2): an
  * incremental poll resumes by passing the checkpointed pair as
  * `tsGteMicros` + discarding already-seen (ts, id) rows, or verbatim
  * as `after` if the checkpoint stores the raw sort array. Slices map
  * 1:1 onto Spark partitions in [[EsHttpScan.read]].
  *
  * Like [[HttpEsBulkClient]]: constructed per executor task, only
  * config strings cross the wire; any transport error or non-2xx
  * throws (Spark task retry is the retry policy for scans — reads are
  * idempotent, unlike bulk writes which need the in-task backoff). */
final class HttpEsScanClient(
    baseUrls: Seq[String],
    headers: Map[String, String],
    requestTimeoutMs: Long = 30000) extends Serializable {
  require(baseUrls.nonEmpty, "at least one ES base URL required")

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(requestTimeoutMs)).build()
  private val next = new AtomicLong(0)

  /** Open a point-in-time snapshot of `index`; returns the PIT id. */
  def openPit(index: String, keepAlive: String = "2m"): String = {
    val body = call("POST", s"/$index/_pit?keep_alive=$keepAlive", null)
    HttpEsScanClient.mapper.readTree(body).path("id").asText()
  }

  /** Release the snapshot (`DELETE /_pit`). Idempotent on the server. */
  def closePit(pitId: String): Unit = {
    call("DELETE", "/_pit", s"""{"id":${JsonStr.quote(pitId)}}""")
    ()
  }

  /** Driver-side scope helper: open a PIT, run `f`, always close. */
  def withPit[T](index: String, keepAlive: String = "2m")(f: String => T): T = {
    val pit = openPit(index, keepAlive)
    try f(pit) finally closePit(pit)
  }

  /** One page of one slice: `POST /_search` against the PIT (a PIT
    * search addresses no index — the snapshot pins it) with the
    * composite (tsField, _id) sort, optional slice, optional
    * `search_after` cursor, optional incremental lower bound. */
  def searchPage(pitId: String, tsField: String, size: Int,
                 after: Option[String] = None,
                 slice: Option[(Int, Int)] = None,
                 tsGteMicros: Option[Long] = None,
                 keepAlive: String = "2m"): ScanPage = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("{\"size\":").append(size)
      .append(",\"pit\":{\"id\":").append(JsonStr.quote(pitId))
      .append(",\"keep_alive\":").append(JsonStr.quote(keepAlive)).append('}')
      .append(",\"sort\":[{").append(JsonStr.quote(tsField))
      .append(":\"asc\"},{\"_id\":\"asc\"}]")
    slice.foreach { case (i, m) =>
      sb.append(",\"slice\":{\"id\":").append(i).append(",\"max\":").append(m).append('}') }
    after.foreach(a => sb.append(",\"search_after\":").append(a))
    tsGteMicros.foreach(t => sb.append(",\"query\":{\"range\":{")
      .append(JsonStr.quote(tsField)).append(":{\"gte\":").append(t).append("}}}"))
    sb.append('}')
    val body = call("POST", "/_search", sb.toString)
    val hitsNode = HttpEsScanClient.mapper.readTree(body).path("hits").path("hits")
    val hits = (0 until hitsNode.size()).map { i =>
      val h = hitsNode.get(i)
      ScanHit(h.path("_id").asText(),
        h.path("_source").toString,
        h.path("sort").toString)
    }
    ScanPage(hits, hits.lastOption.map(_.sort))
  }

  /** Lazily page one slice to exhaustion — the per-partition iterator
    * [[EsHttpScan.read]] runs on executors. A short page (< size)
    * terminates without the extra empty round trip. */
  def pages(pitId: String, tsField: String, size: Int,
            slice: Option[(Int, Int)] = None,
            tsGteMicros: Option[Long] = None,
            startAfter: Option[String] = None): Iterator[ScanHit] =
    Iterator.unfold((startAfter, false)) { case (after, done) =>
      if (done) None
      else {
        val p = searchPage(pitId, tsField, size, after, slice, tsGteMicros)
        if (p.hits.isEmpty) None
        else Some((p.hits, (p.nextAfter, p.hits.size < size)))
      }
    }.flatten

  private def call(method: String, path: String, body: String): String = {
    val base = baseUrls(((next.getAndIncrement() % baseUrls.size) + baseUrls.size).toInt % baseUrls.size)
    val builder = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .method(method, if (body == null) HttpRequest.BodyPublishers.noBody()
                      else HttpRequest.BodyPublishers.ofString(body, UTF_8))
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = http.send(builder.build(), HttpResponse.BodyHandlers.ofString(UTF_8))
    val code = resp.statusCode()
    if (code < 200 || code >= 300)
      throw new java.io.IOException(s"$method $path failed: HTTP $code ${resp.body().take(200)}")
    resp.body()
  }
}

object HttpEsScanClient {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Config-only production swap for the SOURCE side (same contract as
    * [[HttpEsBulkClient.forConfig]] for the sink): URL list +
    * credentials from `source.elasticsearch-url`/`source.username`/
    * `source.password`. */
  def forConfig(config: IngestionConfig): HttpEsScanClient =
    new HttpEsScanClient(EsRestAuth.baseUrls(config.sourceUrls),
      (Map("Content-Type" -> "application/json") ++
        EsRestAuth.basicAuthHeader(config.sourceUsername, config.sourcePassword)).toMap)
}

/** Distributed PIT scan: slices → Spark partitions, each executor
  * partition paging its own slice of the frozen snapshot. This is the
  * production form of B1's full-index scan — the DSv2 sim source
  * ([[graft.sources.EsSimSource]]) keeps the same public shape (docId,
  * source) so downstream plans are transport-agnostic. */
object EsHttpScan {

  /** Read the whole PIT snapshot as a DataFrame of (docId, source),
    * `slices` partitions, each paged with `search_after` at `pageSize`.
    * Open/close the PIT around the ACTION consuming this frame
    * (`HttpEsScanClient.withPit`) — the snapshot must outlive every
    * task, which is exactly the keep_alive each page refreshes. */
  def read(spark: org.apache.spark.sql.SparkSession,
           baseUrls: Seq[String], headers: Map[String, String],
           pitId: String, slices: Int, pageSize: Int,
           tsField: String = "ts",
           tsGteMicros: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    require(slices >= 1, "at least one slice")
    val (urls, hs, pit, n) = (baseUrls, headers, pitId, slices)
    spark.range(0, n, 1, n).as[Long].mapPartitions { it =>
      val client = new HttpEsScanClient(urls, hs)
      it.flatMap { sliceId =>
        val slice = if (n == 1) None else Some((sliceId.toInt, n))
        client.pages(pit, tsField, pageSize, slice, tsGteMicros)
          .map(h => (h.id, h.source))
      }
    }.toDF("docId", "source")
  }
}
