package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

/** Authenticated ES HTTP transport config — the Spark-native face of the
  * reference's A5/A6 (Basic-auth CredentialsProvider at core.clj:19-26,
  * RestClientFactory wrapper at core.clj:28-34). In this offline
  * environment no network client exists; the production path is: build
  * these headers once per executor and attach them to every `_bulk` /
  * `_search` request of an HTTP-backed [[EsBulkClient]].
  */
object EsRestAuth {

  /** RFC 7617 Basic auth header value; None when no credentials are
    * configured (matching the reference's empty-string defaults at
    * core.clj:92-93,99-100). */
  def basicAuthHeader(username: String, password: String): Option[(String, String)] =
    if (username == null || username.isEmpty) None
    else {
      val token = java.util.Base64.getEncoder
        .encodeToString(s"$username:$password".getBytes(UTF_8))
      Some("Authorization" -> s"Basic $token")
    }

  /** Endpoint base URLs from parsed host/port/scheme triples (A4). */
  def baseUrls(hosts: Seq[HostPort]): Seq[String] =
    hosts.map(h => s"${h.scheme}://${h.host}:${h.port}")

  /** Full request-header set for a bulk call. */
  def bulkHeaders(config: IngestionConfig): Map[String, String] =
    (Map("Content-Type" -> "application/x-ndjson") ++
      basicAuthHeader(config.sinkUsername, config.sinkPassword)).toMap
}
