package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** Online byte-exact payload admission — the PAYLOAD leg of the
  * streaming curation family, completing the matrix: text near-dup
  * ([[StreamingCuration]]), vectors ([[StreamingVectorCuration]]),
  * whole pipeline (`pipelineAdmission`), and now binary payloads (the
  * streaming form of m08's batch admission). A crawl's media stream
  * drops re-crawled bytes the moment they arrive, BEFORE any decode /
  * feature / perceptual stage spends compute on them.
  *
  * Contract (the family's): a payload is REJECTED iff some payload
  * with a smaller doc_id — seed corpus or anywhere earlier in the
  * stream, including smaller ids of the same micro-batch and payloads
  * that were themselves rejected — has identical bytes (sha-256).
  * The predicate depends only on the global payload SET, so the
  * admitted set equals the one-shot keep-first dedup (m05's min-id
  * per sha) for ANY batch slicing, asserted across slicings by
  * [[graft.StreamingPayloadCurationSpec]]. Requires doc_ids
  * non-decreasing across batches (ingestion order).
  *
  * Mechanics per micro-batch: hash payloads in-plan (one narrow
  * pass), keep-first within the batch (window on the 256-bit hash),
  * one broadcast-friendly anti-join against the history's sha column
  * — ~50 B/payload of standing state, payload BYTES never reread,
  * never shuffled — then append under `batch=<id>` (replay overwrites
  * exactly that subdir; the history read excludes it, so a replay can
  * never race its own overwrite — the family's idempotence design). */
object StreamingPayloadCuration {

  /** Start the admission query over a streaming (doc_id, payload)
    * frame — `payload` a binary column. */
  def exactDedupAdmission(payloads: DataFrame, historyDir: String,
                          checkpointDir: String): StreamingQuery =
    payloads.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, historyDir, batchId)
        ()
      }
      .start()

  /** One admission step — exposed for bounded deltas and tests. */
  def admitBatch(batch0: DataFrame, historyDir: String, batchId: Long): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val batch = batch0
      .select($"doc_id", sha2($"payload", 256).as("payload_sha256"))
      .persist()
    try {
      val hist = StreamingCuration.readHistory(spark, historyDir,
        HistorySchema, excludeBatch = Some(batchId))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"payload_sha256").orderBy($"doc_id")
      val firstInBatch = batch
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .join(hist.select($"payload_sha256"), Seq("payload_sha256"), "left_anti")
        .select($"doc_id")
      batch
        .join(firstInBatch.withColumn("adm", lit(true)), Seq("doc_id"), "left_outer")
        .select($"doc_id", $"payload_sha256",
          coalesce($"adm", lit(false)).as("admitted"))
        .write.mode("overwrite").parquet(s"$historyDir/batch=$batchId")
    } finally { batch.unpersist(); () }
  }

  /** Pre-load a standing corpus (already deduped, all admitted). */
  def seedHistory(payloads: DataFrame, historyDir: String): Unit = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select($"doc_id", sha2($"payload", 256).as("payload_sha256"),
        lit(true).as("admitted"))
      .write.mode("overwrite").parquet(s"$historyDir/batch=-1")
  }

  private val HistorySchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload_sha256", StringType),
    StructField("admitted", BooleanType)))

  /** The curated output: admitted doc ids across seed + stream. */
  def admittedDocs(spark: SparkSession, historyDir: String): DataFrame = {
    import spark.implicits._
    StreamingCuration.readHistory(spark, historyDir, HistorySchema,
        excludeBatch = None)
      .filter($"admitted")
      .select($"doc_id", $"payload_sha256")
  }
}
