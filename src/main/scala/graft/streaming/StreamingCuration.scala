package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StructField, StructType}

import graft.operators.Dedup

/** Online near-dup curation: admit or reject each document of a stream
  * against everything that came before it.
  *
  * Contract (batching-invariant by construction): a document is
  * REJECTED iff some document with a smaller `doc_id` — in the seed
  * corpus or anywhere earlier in the stream, including rejected docs
  * and smaller-id docs of the same micro-batch — shares an LSH band
  * key with it (the d04/d21 16-band × 8-row banding over the 128-perm
  * minhash signature) AND has exact word-3-gram Jaccard ≥ τ with it.
  * Relative to the all-pairs-exact predicate this can only differ by a
  * banding miss, P = (1 − J^8)^16 — vanishing except within a few
  * percent above τ (< 1e-6 at J ≥ 0.95) — the same same-answer
  * precedent as the registered d04≡d03 and d21≡d11 entries, and
  * [[graft.StreamingCurationSpec]] still asserts equality with the
  * EXACT one-shot keep-first computation on its near-dup-chain
  * fixture. Both legs of the predicate are per-document-deterministic
  * functions of the document SET, never of how the stream was sliced
  * into batches, so the admitted set is batch-slicing-invariant
  * (asserted across slicings). Deliberately NO bucket cap here (the
  * probe runs with the cap disabled): a cap's drop set depends on WHEN
  * a bucket filled, which would break slicing invariance; dup-storm
  * hardening belongs in an exact pre-collapse upstream (the d10/s26
  * discipline). Rejected docs stay in the history because they still
  * suppress their own later near-copies. Requires doc_ids
  * non-decreasing across batches (stream order — a monotonic ingest
  * id; within a batch any order).
  *
  * Mechanics per micro-batch (round-15 — the delta-cost rework): the
  * standing corpus is carried as the d21 index lanes — per-batch
  * banded rows + bucket counts under `_lanes/`, folded generations
  * under `_folded/` ([[StreamingHistory]]) — so admission is one
  * [[Dedup.probeLshFromShingled]]: the batch's signatures compute
  * in-plan (delta-sized), the standing banded lane STREAMS past the
  * broadcast batch bands (no standing-side shuffle, no window, no
  * re-derivation of any standing structure), and exact verification
  * reads only candidate-pruned shingle rows. Per-batch admission cost
  * is delta-proportional in everything but a columnar textless scan —
  * the shape d21's LshProbeScale measured ~flat in standing size —
  * where the previous form re-derived the prefix-token index from ALL
  * standing `sh` arrays every micro-batch (O(B·corpus) cumulative).
  * The batch then lands under `batch=<id>` (rows + its own lane
  * files), making replays after a failure idempotent: a re-run of
  * batch N overwrites exactly batch N's dirs. [[compactHistory]]
  * (auto-run every `compactEvery` batches) folds retired batch dirs
  * into few large generation files, bounding history file count at
  * production cadence.
  */
object StreamingCuration {

  /** d21's banding geometry is fixed by the shared native expressions;
    * the probe's bucket cap is disabled for admission (see contract). */
  private val NoBucketCap = Int.MaxValue

  /** Start the admission query over a streaming (doc_id, text) frame.
    * History accumulates under `historyDir` (seed it with
    * [[seedHistory]]); admitted docs are the `admitted = true` rows
    * ([[admittedDocs]]). `compactEvery` > 0 folds the history every
    * that-many batches ([[compactHistory]]) so file count stays
    * bounded; 0 keeps the flat layout (tests, short streams). */
  def nearDupAdmission(docs: DataFrame, historyDir: String, tau: Double,
                       checkpointDir: String,
                       compactEvery: Int = 0,
                       clusterMapDir: Option[String] = None,
                       clusterMapCompactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, historyDir, tau, batchId,
          clusterMapDir, clusterMapCompactEvery)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactHistory(batch.sparkSession, historyDir, uptoExclusive = batchId)
        ()
      }
      .start()

  /** One admission step — exposed so batch pipelines can run the same
    * policy over a bounded delta, and for tests.
    *
    * `clusterMapDir` (r17, VERDICT r16 #5) keeps the d25 cluster-map
    * artifact CURRENT per micro-batch: admission already computes the
    * exact verified delta pairs the merge needs, so each batch folds
    * its pairs into the persisted map through
    * [[graft.operators.Dedup.mergeIntoClusterMap]] — without this an
    * online corpus's cluster map goes stale between batch runs.
    * Streamed slicing ≡ one-shot merge ≡ d08's CC over all pairs
    * (spec-pinned), and a REPLAYED batch re-merges the same pairs into
    * a map that already holds them, which the union-find merge
    * no-ops (its endpoints are all members, the projected graph
    * collapses to reps) — replay-idempotent with no extra history,
    * the StreamingTakedown discipline. `clusterMapCompactEvery` passes
    * the map's own path-compression cadence through. */
  def admitBatch(batch0: DataFrame, historyDir: String, tau: Double,
                 batchId: Long,
                 clusterMapDir: Option[String] = None,
                 clusterMapCompactEvery: Int = 0): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val batch = batch0
      .select($"doc_id", $"text", array_sort(Dedup.shingleHashes($"text")).as("sh"))
      .persist()
    try {
      // exclude batch=<batchId> itself everywhere: on a replay the final
      // overwrite of that subdir would otherwise race the lazy read of
      // it, and a replayed batch must see exactly the history the
      // original run saw. (If an eager external fold already captured
      // this batch id, the probe's own delta-id anti-join keeps the
      // folded copy from self-pairing.)
      val dSh = batch.select($"doc_id", $"sh").filter(size($"sh") > 0)
      val (sBanded, sCounts) = standingLshLanes(spark, historyDir,
        excludeBatch = batchId)
      val sSh = readHistory(spark, historyDir,
          StructType(batch.schema.fields :+ StructField("admitted", BooleanType)),
          excludeBatch = Some(batchId))
        .select($"doc_id", $"sh").filter(size($"sh") > 0)
      // shingle-less docs can't pair (the probe drops them) — they admit
      val pairs = Dedup.probeLshFromShingled(sBanded, sCounts, sSh, dSh,
          tau, NoBucketCap)
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
      try {
        batch
          .join(rejected.withColumn("rej", lit(true)), Seq("doc_id"), "left_outer")
          .select($"doc_id", $"text", $"sh", coalesce(!$"rej", lit(true)).as("admitted"))
          .write.mode("overwrite").parquet(s"$historyDir/batch=$batchId")
        writeLshLanes(dSh, historyDir, batchId)
        // the cluster-map fold consumes the SAME verified pair frame
        // the admission verdict used — no recompute, delta cost
        clusterMapDir.foreach(d => graft.operators.Dedup.mergeIntoClusterMap(
          pairs.select($"d1", $"d2"), d, clusterMapCompactEvery))
      } finally { pairs.unpersist(); () }
    } finally {
      batch.unpersist()
      // the probe's tracked checkpoint intermediates (delta shingle /
      // banded frames) are dead once this batch's writes completed —
      // a long-running stream must not stack one set per micro-batch
      graft.Scratch.drain()
    }
  }

  /** Fold retired `batch=` dirs (ids < `uptoExclusive` — pass the
    * in-flight batch id so the one replayable batch stays hot) into an
    * [[graft.operators.IndexStore]] generation: rows + the LSH banded
    * lane coalesced to few large files, the counts lane MERGED (one
    * row per bucket — readers sum per key, so merged sums are
    * semantics-identical). Probe answers are unchanged by
    * construction; [[graft.StreamingCurationSpec]] pins it. */
  def compactHistory(spark: SparkSession, dir: String,
                     uptoExclusive: Long): Unit =
    StreamingHistory.compact(spark, dir, uptoExclusive, lshLaneFold(spark, dir),
      rowsSchema = Some(HistorySchema))

  // ---- the LSH lanes (shared by the near-dup and pipeline legs) ----

  private val BandedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band_id", IntegerType),
    StructField("band_hash", LongType)))
  private val CountsSchema = StructType(Seq(
    StructField("band_id", IntegerType),
    StructField("band_hash", LongType),
    StructField("n", LongType)))

  /** The two columns the legacy-batch fallbacks read — passed as an
    * explicit (subset) schema so a laneless legacy batch dir with NO
    * part files (an empty batch, or a crash between the rows and lane
    * writes of one) reads as the correct empty frame instead of hitting
    * schema inference's "Unable to infer schema" throw. A subset schema
    * is valid for both the history and pipeline-state row shapes (both
    * carry doc_id + sh). */
  private val ShLegacySchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sh", org.apache.spark.sql.types.ArrayType(
      LongType, containsNull = false))))

  private def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Write the batch's own banded + counts lane dirs (delta-sized;
    * replay-overwritten together with the rows). */
  private def writeLshLanes(dSh: DataFrame, dir: String, batchId: Long): Unit = {
    val banded = Dedup.bandedOf(dSh).persist()
    try {
      banded.write.mode("overwrite")
        .parquet(StreamingHistory.lanePath(dir, "banded", batchId))
      Dedup.bandedOf_counts(banded).write.mode("overwrite")
        .parquet(StreamingHistory.lanePath(dir, "counts", batchId))
    } finally { banded.unpersist(); () }
  }

  /** Assemble the standing banded + counts lanes over the folded
    * generation plus every hot batch except `excludeBatch`. Hot
    * batches written before the lanes existed (round-14 histories, or
    * a crash between the rows write and the lane write) fall back to
    * in-plan banding of THEIR rows only — cost proportional to the
    * laneless batches, never the corpus. */
  private def standingLshLanes(spark: SparkSession, dir: String,
      excludeBatch: Long): (DataFrame, DataFrame) = {
    import spark.implicits._
    val hotIds = StreamingHistory.hotBatchIds(dir).filterNot(_ == excludeBatch)
    val (laned, legacy) = hotIds.partition(id =>
      Files.isDirectory(Paths.get(StreamingHistory.lanePath(dir, "banded", id))))
    // schema-explicit reads everywhere: an all-shingle-less (or empty)
    // batch writes FILE-LESS lane dirs, where schema inference throws
    // and an explicit schema yields the correct empty frame
    def readLane(lane: String, schema: StructType): Option[DataFrame] =
      if (laned.isEmpty) None
      else Some(spark.read
        .schema(StructType(schema.fields :+ StructField("batch", LongType)))
        .option("basePath", s"$dir/_lanes/$lane")
        .parquet(laned.map(id => StreamingHistory.lanePath(dir, lane, id)): _*)
        .drop("batch"))
    val legacySh = StreamingHistory.readHotBatches(spark, dir, legacy,
        schema = Some(ShLegacySchema))
      .map(_.select($"doc_id", $"sh").filter(size($"sh") > 0))
    val legacyBanded = legacySh.map(Dedup.bandedOf)
    val banded = (StreamingHistory.foldedLane(spark, dir, "banded",
          Some(BandedSchema)).toSeq ++
        readLane("banded", BandedSchema).toSeq ++ legacyBanded.toSeq)
      .reduceOption(_.unionByName(_))
      .getOrElse(emptyFrame(spark, BandedSchema))
    val counts = (StreamingHistory.foldedLane(spark, dir, "counts",
          Some(CountsSchema)).toSeq ++
        readLane("counts", CountsSchema).toSeq ++
        legacyBanded.map(Dedup.bandedOf_counts).toSeq)
      .reduceOption(_.unionByName(_))
      .getOrElse(emptyFrame(spark, CountsSchema))
    (banded, counts)
  }

  /** The generation fold for the LSH lanes: previous generation ∪ the
    * folded batches' lane dirs (laneless legacy batches banded in-plan
    * from their rows), counts merged per bucket. */
  private def lshLaneFold(spark: SparkSession, dir: String)
      : (String, Seq[Long]) => Unit = { (dst, foldIds) =>
    import spark.implicits._
    val (laned, legacy) = foldIds.partition(id =>
      Files.isDirectory(Paths.get(StreamingHistory.lanePath(dir, "banded", id))))
    def readLane(lane: String, schema: StructType): Option[DataFrame] =
      if (laned.isEmpty) None
      else Some(spark.read
        .schema(StructType(schema.fields :+ StructField("batch", LongType)))
        .option("basePath", s"$dir/_lanes/$lane")
        .parquet(laned.map(id => StreamingHistory.lanePath(dir, lane, id)): _*)
        .drop("batch"))
    val legacySh = StreamingHistory.readHotBatches(spark, dir, legacy,
        schema = Some(ShLegacySchema))
      .map(_.select($"doc_id", $"sh").filter(size($"sh") > 0))
    val legacyBanded = legacySh.map(Dedup.bandedOf)
    val bandedParts = StreamingHistory.foldedLane(spark, dir, "banded",
        Some(BandedSchema)).toSeq ++
      readLane("banded", BandedSchema).toSeq ++ legacyBanded.toSeq
    val banded = bandedParts.reduceOption(_.unionByName(_))
      .getOrElse(emptyFrame(spark, BandedSchema))
    val nFiles = math.max(1,
      bandedParts.map(p => scala.util.Try(p.inputFiles.length).getOrElse(1)).sum / 16)
    banded.coalesce(nFiles).write.mode("overwrite").parquet(s"$dst/banded")
    val counts = (StreamingHistory.foldedLane(spark, dir, "counts",
        Some(CountsSchema)).toSeq ++
        readLane("counts", CountsSchema).toSeq ++
        legacyBanded.map(Dedup.bandedOf_counts).toSeq)
      .reduceOption(_.unionByName(_))
      .getOrElse(emptyFrame(spark, CountsSchema))
    counts.groupBy($"band_id", $"band_hash").agg(sum($"n").as("n"))
      .coalesce(nFiles).write.mode("overwrite").parquet(s"$dst/counts")
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
    * across slicings (the near-dup stage rides the same banded probe
    * as [[admitBatch]] — see the object contract for the banding
    * caveat). State is [[graft.operators.Curation.curationState]]
    * rows partitioned by batch id (~100 B per KEPT doc — rejected
    * non-f2 docs leave no state at all, unlike the near-dup-only
    * history which must retain every doc) plus the state rows' own
    * LSH lanes; replays overwrite exactly their own `batch=<id>`
    * dirs, same idempotence contract as [[nearDupAdmission]]; the
    * standing exact-hash and shingle structures are never re-derived
    * (hash membership is a broadcast-semi SCAN of the state's `th`
    * column; near-dup candidates stream the standing banded lane past
    * the broadcast batch). The benchmark frame is tiny by d07's
    * premise and broadcast into each batch's decontamination. */
  def pipelineAdmission(docs: DataFrame, bench: DataFrame, stateDir: String,
                        checkpointDir: String,
                        compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitPipelineBatch(batch, bench, stateDir, batchId)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactPipelineState(batch.sparkSession, stateDir,
            uptoExclusive = batchId)
        ()
      }
      .start()

  /** One full-pipeline admission step — exposed for bounded deltas and
    * tests. Reads state excluding this batch id (replay safety), writes
    * the batch's f2-level state rows + LSH lanes under `batch=<batchId>`. */
  def admitPipelineBatch(batch0: DataFrame, bench: DataFrame, stateDir: String,
                         batchId: Long): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val state = readHistory(spark, stateDir, StateSchema,
      excludeBatch = Some(batchId))
    val (sBanded, sCounts) = standingLshLanes(spark, stateDir,
      excludeBatch = batchId)
    graft.operators.Curation.admitDeltaStateWith(
        state, batch0.select($"doc_id", $"text"), bench,
        (stSh, dSh) => Dedup.probeLshFromShingled(
          sBanded, sCounts, stSh, dSh, 0.8, NoBucketCap))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val outSh = spark.read.schema(StateSchema)
      .parquet(s"$stateDir/batch=$batchId")
      .select($"doc_id", $"sh").filter(size($"sh") > 0)
    writeLshLanes(outSh, stateDir, batchId)
    // this batch's writes consumed the probe's tracked checkpoints
    graft.Scratch.drain()
  }

  /** Fold retired pipeline-state `batch=` dirs (rows + LSH lanes) —
    * the pipeline leg's [[compactHistory]]. */
  def compactPipelineState(spark: SparkSession, stateDir: String,
                           uptoExclusive: Long): Unit =
    StreamingHistory.compact(spark, stateDir, uptoExclusive,
      lshLaneFold(spark, stateDir), rowsSchema = Some(StateSchema))

  /** Seed the state with an already-curated standing corpus (the
    * previous batch run's [[graft.operators.Curation.curationState]]). */
  def seedPipelineState(standing: DataFrame, bench: DataFrame,
                        stateDir: String): Unit = {
    val spark = standing.sparkSession
    import spark.implicits._
    graft.operators.Curation.curationState(standing, bench)
      .write.mode("overwrite").parquet(s"$stateDir/batch=-1")
    val sh = spark.read.parquet(s"$stateDir/batch=-1")
      .select($"doc_id", $"sh").filter(size($"sh") > 0)
    writeLshLanes(sh, stateDir, -1L)
  }

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
    StructField("doc_id", LongType),
    StructField("quality", org.apache.spark.sql.types.DoubleType),
    StructField("th", org.apache.spark.sql.types.StringType),
    StructField("sh", org.apache.spark.sql.types.ArrayType(
      LongType, containsNull = false)),
    StructField("m_surv", BooleanType)))

  /** Pre-load a standing corpus (all admitted) before streaming. */
  def seedHistory(docs: DataFrame, historyDir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id", $"text",
        array_sort(Dedup.shingleHashes($"text")).as("sh"),
        lit(true).as("admitted"))
      .write.mode("overwrite").parquet(s"$historyDir/batch=-1")
    val sh = spark.read.parquet(s"$historyDir/batch=-1")
      .select($"doc_id", $"sh").filter(size($"sh") > 0)
    writeLshLanes(sh, historyDir, -1L)
  }

  /** Canonical history row shape, used when an empty frame must be
    * conjured before any batch has defined one. */
  private val HistorySchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", org.apache.spark.sql.types.StringType),
    StructField("sh", org.apache.spark.sql.types.ArrayType(
      LongType, containsNull = false)),
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
    * tolerates files deleted mid-scan (a replayed batch's overwrite,
    * or a concurrent [[compactHistory]] retiring hot dirs), so a
    * concurrent maintainer yields a transiently partial count for THAT
    * batch rather than a failed job; idempotent replay / the folded
    * generation converges it on the next read. Batch ids survive
    * folding — the folded rows carry `batch` as a data column. */
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
    * FileDeadLetter.read: a fresh dir is not an error. Delegates to
    * [[StreamingHistory]] (folded generation ∪ hot batch dirs). */
  private[streaming] def readHistory(spark: SparkSession, dir: String,
                          emptySchema: StructType,
                          excludeBatch: Option[Long],
                          keepBatch: Boolean = false,
                          tolerant: Boolean = false): DataFrame =
    StreamingHistory.readRows(spark, dir, emptySchema, excludeBatch,
      keepBatch, tolerant)
}
