package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

import graft.operators.Dedup

/** Online near-dup curation: admit or reject each document of a stream
  * against everything that came before it.
  *
  * Contract (batching-invariant by construction): a document is
  * REJECTED iff some document with a smaller `doc_id` — in the seed
  * corpus or anywhere earlier in the stream, including rejected docs
  * and smaller-id docs of the same micro-batch — has word-3-gram
  * Jaccard ≥ τ with it. The predicate depends only on the global
  * document SET, never on how the stream was sliced into batches, so
  * the admitted set equals the one-shot batch computation (keep-first
  * dedup: drop `d2` of every [[Dedup.ngramJaccardPairs]] pair) — the
  * equivalence [[graft.StreamingCurationSpec]] asserts. Rejected docs
  * stay in the history because they still suppress their own later
  * near-copies; dropping them would make admission depend on batch
  * boundaries. Requires doc_ids non-decreasing across batches (stream
  * order — a monotonic ingest id; within a batch any order).
  *
  * Mechanics per micro-batch: one [[Dedup.deltaPairsFromShingled]] of
  * the batch against the history — cost |batch| · overlap, never
  * |corpus|² — then append the batch (with its sorted shingle arrays,
  * so the corpus is never re-shingled) under `batch=<id>`. The
  * per-batch-id subdirectory makes replays after a failure idempotent:
  * a re-run of batch N overwrites exactly `batch=N`. At 100 TB the
  * history IS the standing curated corpus; the obvious further step —
  * maintaining the prefix-token index incrementally instead of
  * re-deriving it from `sh` per delta — changes constants, not
  * complexity, and keeps the same admission semantics.
  */
object StreamingCuration {

  /** Start the admission query over a streaming (doc_id, text) frame.
    * History accumulates under `historyDir` (seed it with
    * [[seedHistory]]); admitted docs are the `admitted = true` rows
    * ([[admittedDocs]]). */
  def nearDupAdmission(docs: DataFrame, historyDir: String, tau: Double,
                       checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, historyDir, tau, batchId)
        ()
      }
      .start()

  /** One admission step — exposed so batch pipelines can run the same
    * policy over a bounded delta, and for tests. */
  def admitBatch(batch0: DataFrame, historyDir: String, tau: Double,
                 batchId: Long): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val batch = batch0
      .select($"doc_id", $"text", array_sort(Dedup.shingleHashes($"text")).as("sh"))
      .persist()
    try {
      // exclude batch=<batchId> itself: on a replay the final overwrite
      // of that subdir would otherwise race the lazy read of it (the
      // write job can still be recomputing lineage from files the
      // overwrite is deleting). Partition pruning makes the exclusion
      // free, and semantics are unchanged — a replayed batch must see
      // exactly the history the original run saw.
      val hist = readHistory(spark, historyDir,
        StructType(batch.schema.fields :+ StructField("admitted", BooleanType)),
        excludeBatch = Some(batchId))
      // shingle-less docs can't pair (the join drops them) — they admit
      val pairs = Dedup.deltaPairsFromShingled(
          hist.filter(size($"sh") > 0).select($"doc_id", $"sh"),
          batch.filter(size($"sh") > 0).select($"doc_id", $"sh"), tau)
        .persist() // two consumers below; the frame is threshold-small
      // monotonic ids put every pair's d2 in the batch; the semi-join
      // keeps the flag honest if a caller violates that, and the
      // orphan count makes the violation VISIBLE — an out-of-order id
      // stream silently loses batch-invariance otherwise
      val rejected = pairs
        .select($"d2".as("doc_id")).distinct()
        .join(batch.select($"doc_id"), Seq("doc_id"), "left_semi")
      val orphans = pairs
        .join(batch.select($"doc_id".as("d2")), Seq("d2"), "left_anti").count()
      if (orphans > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"admitBatch(batch=$batchId): $orphans near-dup pair(s) point at " +
          "an already-written history doc — doc_ids are not monotonic " +
          "across batches, so the admitted set is batch-slicing-dependent")
      try batch
        .join(rejected.withColumn("rej", lit(true)), Seq("doc_id"), "left_outer")
        .select($"doc_id", $"text", $"sh", coalesce(!$"rej", lit(true)).as("admitted"))
        .write.mode("overwrite").parquet(s"$historyDir/batch=$batchId")
      finally { pairs.unpersist(); () }
    } finally { batch.unpersist(); () }
  }

  // ---- full-pipeline streaming admission (the streaming twin of c12) ----

  /** ALL FIVE c01 stages online — language, quality, exact keep-first,
    * near-dup keep-first, decontamination — against everything that
    * came before: the streaming form of [[graft.operators.Curation
    * .admitDelta]], and the operational shape of continuous corpus
    * curation (a crawler feeds documents; the curated set is always
    * current; nothing is ever recomputed).
    *
    * Batch-slicing invariance holds by the same argument as c12's
    * boundary sweep, iterated: each doc's verdict depends only on the
    * SET of smaller-id docs (monotonic ingest ids), never on where
    * batch boundaries fall — so the curated set equals a one-shot
    * [[graft.operators.Curation.c01CurationPipeline]] over seed ∪
    * stream, the equivalence [[graft.StreamingCurationSpec]] asserts
    * across slicings. State is [[graft.operators.Curation
    * .curationState]] rows partitioned by batch id (~100 B per KEPT
    * doc — rejected non-f2 docs leave no state at all, unlike the
    * near-dup-only history which must retain every doc); replays
    * overwrite exactly their own `batch=<id>` subdir, same idempotence
    * contract as [[nearDupAdmission]]. The benchmark frame is tiny by
    * d07's premise and broadcast into each batch's decontamination. */
  def pipelineAdmission(docs: DataFrame, bench: DataFrame, stateDir: String,
                        checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitPipelineBatch(batch, bench, stateDir, batchId)
        ()
      }
      .start()

  /** One full-pipeline admission step — exposed for bounded deltas and
    * tests. Reads state excluding this batch id (replay safety), writes
    * the batch's f2-level state rows under `batch=<batchId>`. */
  def admitPipelineBatch(batch0: DataFrame, bench: DataFrame, stateDir: String,
                         batchId: Long): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val state = readHistory(spark, stateDir, StateSchema,
      excludeBatch = Some(batchId))
    graft.operators.Curation.admitDeltaState(
        state, batch0.select($"doc_id", $"text"), bench)
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
  }

  /** Seed the state with an already-curated standing corpus (the
    * previous batch run's [[graft.operators.Curation.curationState]]). */
  def seedPipelineState(standing: DataFrame, bench: DataFrame,
                        stateDir: String): Unit =
    graft.operators.Curation.curationState(standing, bench)
      .write.mode("overwrite").parquet(s"$stateDir/batch=-1")

  /** The curated corpus as of now: (doc_id, quality) of survivors
    * across seed + stream — c01's output shape. */
  def curatedDocs(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    readHistory(spark, stateDir, StateSchema, excludeBatch = None)
      .filter($"m_surv")
      .select($"doc_id", $"quality")
  }

  /** [[graft.operators.Curation.curationState]]'s row shape. */
  private val StateSchema = StructType(Seq(
    StructField("doc_id", org.apache.spark.sql.types.LongType),
    StructField("quality", org.apache.spark.sql.types.DoubleType),
    StructField("th", org.apache.spark.sql.types.StringType),
    StructField("sh", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)),
    StructField("m_surv", BooleanType)))

  /** Pre-load a standing corpus (all admitted) before streaming. */
  def seedHistory(docs: DataFrame, historyDir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id", $"text",
        array_sort(Dedup.shingleHashes($"text")).as("sh"),
        lit(true).as("admitted"))
      .write.mode("overwrite").parquet(s"$historyDir/batch=-1")
  }

  /** Canonical history row shape, used when an empty frame must be
    * conjured before any batch has defined one. */
  private val HistorySchema = StructType(Seq(
    StructField("doc_id", org.apache.spark.sql.types.LongType),
    StructField("text", org.apache.spark.sql.types.StringType),
    StructField("sh", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)),
    StructField("admitted", BooleanType)))

  /** The curated output: admitted documents across seed + stream.
    * A fresh (or still-empty) history dir yields an empty frame. */
  def admittedDocs(spark: SparkSession, historyDir: String): DataFrame = {
    import spark.implicits._
    readHistory(spark, historyDir, HistorySchema, excludeBatch = None)
      .filter($"admitted")
      .select($"doc_id", $"text")
  }

  /** Per-batch admission funnel — the streaming twin of c02's
    * observability: docs seen / admitted / rejected per micro-batch
    * (batch −1 = the seeded corpus, admitted by definition). A
    * rejection-rate spike in this table is the first symptom of a dup
    * storm or a mis-sliced upstream producer. One narrow aggregate
    * over the partitioned history the admission loop already writes —
    * no extra state, readable while the stream runs: the read
    * tolerates files deleted mid-scan (a replayed batch's overwrite —
    * the same race admitBatch itself avoids by excluding the in-flight
    * batch), so a concurrent replay yields a transiently partial count
    * for THAT batch rather than a failed job; idempotent replay
    * converges it on the next read. */
  def admissionStats(spark: SparkSession, historyDir: String): DataFrame = {
    import spark.implicits._
    readHistory(spark, historyDir, HistorySchema, excludeBatch = None,
        keepBatch = true, tolerant = true)
      .groupBy($"batch".cast("long").as("batch"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"admitted".cast("long")).as("n_admitted"),
        (count(lit(1)) - sum($"admitted".cast("long"))).as("n_rejected"))
      .orderBy($"batch")
  }

  /** History as one frame; empty with the given (full, admitted-
    * included) schema when nothing was written yet — same contract as
    * FileDeadLetter.read: a fresh dir is not an error. */
  private[streaming] def readHistory(spark: SparkSession, dir: String,
                          emptySchema: StructType,
                          excludeBatch: Option[Long],
                          keepBatch: Boolean = false,
                          tolerant: Boolean = false): DataFrame = {
    val path = java.nio.file.Paths.get(dir)
    val hasData = java.nio.file.Files.isDirectory(path) && {
      val s = java.nio.file.Files.list(path)
      try s.anyMatch { p =>
        val n = p.getFileName.toString
        n.startsWith("batch=") && !excludeBatch.exists(b => n == s"batch=$b")
      }
      finally s.close()
    }
    if (hasData) {
      val reader =
        if (tolerant) spark.read.option("ignoreMissingFiles", "true")
        else spark.read
      val all = reader.parquet(dir)
      val scoped = excludeBatch.fold(all)(b => all.filter(col("batch") =!= b))
      if (keepBatch) scoped else scoped.drop("batch")
    } else {
      val schema =
        if (keepBatch)
          StructType(emptySchema.fields :+
            StructField("batch", org.apache.spark.sql.types.LongType))
        else emptySchema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }
}
