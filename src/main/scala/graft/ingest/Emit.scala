package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** The record→index-request emitter (reference A2/A3, core.clj:55-66):
  * a stateless Catalyst projection — extract index routing + doc id,
  * serialize the body to JSON. The whole "physical operator" of the
  * reference engine is this Project node; everything else Spark gives
  * us (SURVEY §2 Tier A note).
  */
object Emit {

  /** events → IngestRecord projection. Timestamp is carried as a cast
    * string inside the body (engine-neutral format) — the body is the
    * schemaless pass-through lane, so downstream re-parses with
    * from_json as needed. */
  def ing01EmitEvents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).select(
      lit("events").as("index_id"),
      $"event_id".cast("string").as("doc_id"),
      to_json(struct(
        $"event_id", $"event_type", $"value",
        $"ts".cast("string").as("ts"),
        get_json_object($"props", "$.k").cast("int").as("k"))).as("source"))
  }

  val ing01Sql: String =
    """SELECT 'events' AS index_id,
      |  CAST(event_id AS VARCHAR) AS doc_id,
      |  to_json(struct_pack(
      |    event_id := event_id,
      |    event_type := event_type,
      |    value := value,
      |    ts := CAST(ts AS VARCHAR),
      |    k := CAST(json_extract_string(props, '$.k') AS INTEGER))) AS source
      |FROM events""".stripMargin

  /** B4 1:1 copy lane (core.clj:139): documents → IngestRecord with the
    * doc id preserved, so re-runs upsert instead of duplicating. */
  def ing02CopyDocuments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(
      lit("documents").as("index_id"),
      $"doc_id".cast("string").as("doc_id"),
      to_json(struct($"doc_id", $"text", $"lang", $"source", $"n_chars")).as("source"))
  }

  val ing02Sql: String =
    """SELECT 'documents' AS index_id,
      |  CAST(doc_id AS VARCHAR) AS doc_id,
      |  to_json(struct_pack(
      |    doc_id := doc_id, text := text, lang := lang,
      |    source := source, n_chars := n_chars)) AS source
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ing01_emit_events"    -> (ing01EmitEvents _),
    "ing02_copy_documents" -> (ing02CopyDocuments _),
  )

  val oracles: Map[String, String] = Map(
    "ing01_emit_events"    -> ing01Sql,
    "ing02_copy_documents" -> ing02Sql,
  )
}
