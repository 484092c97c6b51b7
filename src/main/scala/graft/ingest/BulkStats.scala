package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.LocalDateTime
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Per-bulk-file cursor statistics — written by the SINK as a
  * `<bulk-file>.stats.json` sidecar at file-creation time and read back
  * by the source's planning index ([[graft.sources.EsSimStats]]).
  *
  * Rationale (100 TB): the sink already holds every document in memory
  * as it serializes the bulk body, so min/max/count over the cursor key
  * cost nothing extra at write time. Computing the same stats at first
  * READ forced the driver into an O(corpus) single-threaded JSON parse
  * on cold start over an existing index — the ES analogue is that shard
  * metadata is maintained at index time, never rebuilt by scanning
  * segment bodies. Legacy files without a sidecar still fall back to a
  * parse (parallelized in [[graft.sources.EsSimStats]]).
  *
  * The stat record mirrors the composite (tsMicros, docId) cursor
  * ordering of [[graft.sources.TsOffset]]: null/unparsable timestamps
  * map to [[NullTs]] so such docs sort first and are never lost to a
  * range prune.
  */
object BulkStats {

  /** Cursor position for docs with no parsable ts: they sort first. */
  val NullTs: Long = Long.MinValue + 1

  /** min/max are over the composite (tsMicros, docId) cursor ordering.
    * `indexIds = None` means "more than 32 distinct indices" — the
    * per-file index set stays O(1) and the indexId prune just declines. */
  final case class Stat(tsField: String, minTs: Long, minId: String,
      maxTs: Long, maxId: String, count: Long, indexIds: Option[Set[String]])

  /** ObjectMapper is thread-safe for reads; one per JVM. */
  private val mapper = new ObjectMapper()

  /** Accepts any fraction width 0-9 — Spark's timestamp→string cast
    * trims trailing zeros (".179575" but also ".1"), and a fixed
    * [.SSSSSS] pattern silently nulled every trimmed-fraction ts. */
  private val TsFmt = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart()
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
    .optionalEnd()
    .toFormatter()

  /** Parse the cursor field out of a JSON body: epoch-micros number or
    * "yyyy-MM-dd HH:mm:ss[.ffffff]" string; null if absent/unparsable. */
  def parseTsMicros(node: JsonNode): java.lang.Long =
    if (node == null || node.isNull) null
    else if (node.isNumber) java.lang.Long.valueOf(node.asLong())
    else {
      try {
        val ldt = LocalDateTime.parse(node.asText(), TsFmt)
        java.lang.Long.valueOf(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
      } catch { case _: Exception => null }
    }

  /** Cursor micros of one source body, or null. */
  def tsOf(sourceJson: String, tsField: String): java.lang.Long =
    try parseTsMicros(mapper.readTree(sourceJson).get(tsField))
    catch { case _: Exception => null }

  /** Fold (indexId, docId, tsMicros) triples into a Stat — the one
    * definition of the file-stat semantics, shared by the sink (sidecar
    * write) and the source's legacy-file parse fallback. */
  def compute(tsField: String, docs: Iterator[(String, String, java.lang.Long)]): Stat = {
    var minTs = Long.MaxValue; var minId = ""
    var maxTs = Long.MinValue; var maxId = ""
    var count = 0L
    val indices = scala.collection.mutable.Set.empty[String]
    docs.foreach { case (indexId, docId, tsM) =>
      val ts = if (tsM == null) NullTs else tsM.longValue()
      if (ts < minTs || (ts == minTs && docId < minId)) { minTs = ts; minId = docId }
      if (ts > maxTs || (ts == maxTs && docId > maxId)) { maxTs = ts; maxId = docId }
      if (indices.size <= 32) indices += indexId
      count += 1
    }
    if (count == 0) Stat(tsField, NullTs, "", NullTs, "", 0, Some(Set.empty))
    else Stat(tsField, minTs, minId, maxTs, maxId, count,
      if (indices.size > 32) None else Some(indices.toSet))
  }

  def sidecar(bulkFile: Path): Path =
    bulkFile.resolveSibling(bulkFile.getFileName.toString + ".stats.json")

  /** Write the sidecar. Called BEFORE the bulk file itself is created,
    * so any reader that can list the bulk file finds its stats present. */
  def write(bulkFile: Path, st: Stat): Unit = {
    val ids = st.indexIds.fold("null")(
      s => s.toSeq.sorted.map(JsonStr.quote).mkString("[", ",", "]"))
    val json =
      s"""{"tsField":${JsonStr.quote(st.tsField)},"minTs":${st.minTs},""" +
      s""""minId":${JsonStr.quote(st.minId)},"maxTs":${st.maxTs},""" +
      s""""maxId":${JsonStr.quote(st.maxId)},"count":${st.count},"indexIds":$ids}"""
    Files.write(sidecar(bulkFile), json.getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** Count of PRESENT sidecars a reader declined (tsField mismatch,
    * missing fields, parse error) — a silent decline would regress cold
    * start to the full body parse with no signal; this makes it visible
    * to tests and ops. */
  val sidecarsDeclined = new java.util.concurrent.atomic.AtomicLong(0)

  /** Read a sidecar if present, well-formed, and computed over the same
    * tsField; None → caller falls back to parsing the bulk body. */
  def read(bulkFile: Path, tsField: String): Option[Stat] = {
    val sc = sidecar(bulkFile)
    if (!Files.exists(sc)) None
    else {
      val st = try {
        val n = mapper.readTree(new String(Files.readAllBytes(sc), UTF_8))
        // require every numeric/id field to be PRESENT: a schema-skewed
        // or hand-edited sidecar must fall back to the body parse, not
        // silently parse absent fields as zeros/empty strings and feed
        // wrong prune/admission stats to the planner
        val fieldsOk = n.hasNonNull("minTs") && n.hasNonNull("maxTs") &&
          n.hasNonNull("count") &&
          (n.path("count").asLong() == 0L ||
            (n.hasNonNull("minId") && n.hasNonNull("maxId")))
        if (n.path("tsField").asText() != tsField || !fieldsOk) None
        else {
          val idsNode = n.get("indexIds")
          val ids =
            if (idsNode == null || idsNode.isNull) None
            else Some(idsNode.elements().asScala.map(_.asText()).toSet)
          Some(Stat(tsField, n.path("minTs").asLong(), n.path("minId").asText(),
            n.path("maxTs").asLong(), n.path("maxId").asText(),
            n.path("count").asLong(), ids))
        }
      } catch { case _: Exception => None }
      if (st.isEmpty) sidecarsDeclined.incrementAndGet()
      st
    }
  }
}
