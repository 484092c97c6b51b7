package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.IndexStore

/** Shared history layout for the streaming-admission family
  * ([[StreamingCuration]], [[StreamingVectorCuration]],
  * [[StreamingPayloadCuration]]) — per-batch hot dirs that stay
  * replay-idempotent, plus generation-based folding so the file count
  * is BOUNDED at production cadence.
  *
  * Why (round-14 verdict #1): the original layout accumulated one
  * `batch=<id>` subdir per micro-batch forever — at a 1-minute trigger
  * a year is ~500k directories of small parquet footers per history
  * listing, the exact small-files disease the persisted index
  * artifacts were cured of with [[IndexStore]]. This object gives the
  * admission loops the same cure without giving up their idempotence
  * contract (a replayed batch overwrites exactly its own hot subdir).
  *
  * Layout under a history dir:
  * {{{
  *   batch=<id>/          hot rows, one dir per not-yet-folded batch;
  *                        a replay of batch N overwrites batch=N
  *   _lanes/<lane>/batch=<id>/
  *                        optional per-batch side lanes (the text leg
  *                        persists LSH banded rows + bucket counts so
  *                        the per-batch probe never re-derives them
  *                        from the standing corpus) — written and
  *                        replay-overwritten together with the rows
  *   _folded/             an [[IndexStore]] generation tree:
  *     _current
  *     gen=N/rows/        all folded batches' rows, few large files,
  *                        `batch` materialized as a data column
  *     gen=N/<lane>/      the folded side lanes
  *     gen=N/_folded_through
  *                        max batch id folded into this generation
  * }}}
  * The `_`-prefixed names are invisible to Spark's file listing, so a
  * plain `spark.read.parquet(historyDir)` over a never-compacted
  * history keeps reading exactly the hot `batch=` tree (the layout
  * all round-14 histories had).
  *
  * Crash-safety: folding writes generation N+1 completely (including
  * the `_folded_through` watermark), atomically flips `_current`, and
  * only then deletes the folded hot dirs. Readers treat any hot dir
  * with id ≤ the published watermark as debris (excluded), so a crash
  * between flip and delete double-stores but never double-COUNTS; the
  * next [[compact]] sweeps the leftovers. A batch id is only ever
  * folded once it is strictly below the in-flight id, so the one batch
  * Structured Streaming can replay after a failure is never inside a
  * generation's rows... and even if a caller folds more eagerly, the
  * watermark keeps the replayed hot dir invisible rather than
  * double-counted.
  *
  * Concurrency contract: single maintainer — the admission loop itself
  * runs [[compact]] between batches (foreachBatch is sequential).
  * Concurrent EXTERNAL readers of the rows get [[IndexStore]]'s
  * two-generation grace on the folded side; the hot-dir deletion is
  * raw, so monitoring readers should pass `tolerant = true` (the
  * admissionStats discipline) or quiesce the loop first.
  */
object StreamingHistory {

  private val FoldedName = "_folded"
  private val LanesName = "_lanes"
  private val ThroughFile = "_folded_through"

  def foldedDir(dir: String): String = s"$dir/$FoldedName"

  def lanePath(dir: String, lane: String, batchId: Long): String =
    s"$dir/$LanesName/$lane/batch=$batchId"

  /** Highest batch id folded into the published generation, if any. */
  def foldedThrough(dir: String): Option[Long] =
    IndexStore.currentGen(foldedDir(dir)).flatMap { g =>
      val f = Paths.get(IndexStore.genPath(foldedDir(dir), g), ThroughFile)
      if (Files.exists(f))
        Some(new String(Files.readAllBytes(f), "UTF-8").trim.toLong)
      else None
    }

  /** Hot (not-yet-folded) batch ids: top-level `batch=` dirs above the
    * folded watermark. Dirs at or below the watermark are fold debris
    * (crash between publish and delete, or a replay of an already-
    * folded batch) — invisible to reads, swept by the next compact. */
  def hotBatchIds(dir: String): Seq[Long] = {
    val p = Paths.get(dir)
    val ids =
      if (!Files.isDirectory(p)) Seq.empty[Long]
      else {
        val st = Files.list(p)
        try {
          val b = scala.collection.mutable.ArrayBuffer[Long]()
          st.forEach { q =>
            val n = q.getFileName.toString
            if (n.startsWith("batch="))
              scala.util.Try(n.stripPrefix("batch=").toLong).toOption
                .foreach(b += _)
          }
          b.toSeq
        } finally st.close()
      }
    val ft = foldedThrough(dir)
    ids.filter(id => ft.forall(id > _)).sorted
  }

  /** The published generation's rows lane, if a fold has happened.
    * `schema` = data columns + the long `batch` column the fold
    * materialized (see [[readHotBatches]] for why explicit schemas
    * matter: a fold of only-empty batches is a file-less lane). */
  def foldedRows(spark: SparkSession, dir: String,
                 schema: Option[StructType] = None): Option[DataFrame] =
    foldedLane(spark, dir, "rows",
      schema.map(sc => StructType(sc.fields :+ StructField("batch", LongType))))

  /** A lane of the published generation, if present. */
  def foldedLane(spark: SparkSession, dir: String, lane: String,
                 schema: Option[StructType] = None): Option[DataFrame] =
    IndexStore.currentGen(foldedDir(dir)).flatMap { g =>
      val p = s"${IndexStore.genPath(foldedDir(dir), g)}/$lane"
      if (Files.isDirectory(Paths.get(p)))
        Some(schema.fold(spark.read)(spark.read.schema(_)).parquet(p))
      else None
    }

  /** Read selected hot batch dirs as one frame with a long `batch`
    * column (basePath keeps partition discovery scoped to the given
    * dirs, so the `_`-prefixed siblings never confuse it).
    *
    * Pass `schema` (the DATA columns; `batch` is appended here) whenever
    * the caller knows it — an EMPTY micro-batch writes a dir with no
    * part files (Spark skips file creation for row-less tasks), and
    * schema INFERENCE over a file-less path set throws where an
    * explicit schema yields the correct empty frame. It also skips the
    * per-batch footer reads inference costs. */
  def readHotBatches(spark: SparkSession, dir: String, ids: Seq[Long],
                     tolerant: Boolean = false,
                     schema: Option[StructType] = None): Option[DataFrame] =
    if (ids.isEmpty) None
    else {
      val reader0 =
        if (tolerant) spark.read.option("ignoreMissingFiles", "true")
        else spark.read
      val reader = schema.fold(reader0)(sc => reader0.schema(
        StructType(sc.fields :+ StructField("batch", LongType))))
      Some(reader.option("basePath", dir)
        .parquet(ids.map(id => s"$dir/batch=$id"): _*)
        .withColumn("batch", col("batch").cast(LongType)))
    }

  /** The full history rows as one frame — folded generation ∪ hot
    * dirs, `excludeBatch` removed from BOTH sides (the in-flight-batch
    * exclusion that makes replays race-free: a replayed batch must see
    * exactly the history the original run saw, even if an eager fold
    * already captured its rows). Empty dirs yield an empty frame with
    * the given schema, not an error. */
  def readRows(spark: SparkSession, dir: String, emptySchema: StructType,
               excludeBatch: Option[Long], keepBatch: Boolean = false,
               tolerant: Boolean = false): DataFrame = {
    val hotIds = hotBatchIds(dir).filterNot(id => excludeBatch.contains(id))
    val hot = readHotBatches(spark, dir, hotIds, tolerant, Some(emptySchema))
    val folded = foldedRows(spark, dir, Some(emptySchema))
      .map(df => excludeBatch.fold(df)(b => df.filter(col("batch") =!= b)))
    val frames = hot.toSeq ++ folded.toSeq
    if (frames.isEmpty) {
      val schema =
        if (keepBatch) StructType(emptySchema.fields :+ StructField("batch", LongType))
        else emptySchema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      val cols = emptySchema.fieldNames.map(col) :+ col("batch").cast(LongType).as("batch")
      val u = frames.map(_.select(cols: _*)).reduce(_.unionByName(_))
      if (keepBatch) u else u.drop("batch")
    }
  }

  /** Fold every hot batch dir with id < `uptoExclusive` (together with
    * the previous generation) into a new [[IndexStore]] generation:
    * rows coalesced to few large files with `batch` as a data column,
    * the watermark advanced, `_current` flipped atomically, retired
    * generations and the folded hot dirs (plus any of their `_lanes`
    * entries) removed. `extraLanes(dstGenPath, foldIds)` lets a leg
    * fold its side lanes into the same generation before publish (the
    * text leg's banded/counts). No-op when nothing is foldable. */
  def compact(spark: SparkSession, dir: String, uptoExclusive: Long,
              extraLanes: (String, Seq[Long]) => Unit = (_, _) => (),
              rowsSchema: Option[StructType] = None): Unit = {
    val fd = foldedDir(dir)
    val foldIds = hotBatchIds(dir).filter(_ < uptoExclusive)
    if (foldIds.isEmpty) { sweepDebris(dir); return }
    val g = IndexStore.nextGen(fd)
    val dst = IndexStore.genPath(fd, g)
    val prev = foldedRows(spark, dir, rowsSchema)
    val hot = readHotBatches(spark, dir, foldIds, schema = rowsSchema)
    val frames = prev.toSeq ++ hot.toSeq
    val head = frames.head
    val rows = frames.map(_.select(head.columns.map(col): _*))
      .reduce(_.unionByName(_))
    rows.coalesce(math.max(1, frames.map(_.inputFiles.length).sum / 16))
      .write.mode("overwrite").parquet(s"$dst/rows")
    extraLanes(dst, foldIds)
    val through = (foldedThrough(dir).toSeq ++ foldIds).max
    Files.write(Paths.get(dst, ThroughFile), through.toString.getBytes("UTF-8"))
    IndexStore.publish(fd, g)
    IndexStore.sweep(fd)
    sweepDebris(dir)
  }

  /** Delete hot `batch=` dirs (and their lane dirs) at or below the
    * published watermark — folded content whose hot copy is already
    * invisible to every reader. */
  private def sweepDebris(dir: String): Unit =
    foldedThrough(dir).foreach { ft =>
      val p = Paths.get(dir)
      if (Files.isDirectory(p)) {
        val doomed = {
          val st = Files.list(p)
          try {
            val b = scala.collection.mutable.ArrayBuffer[Long]()
            st.forEach { q =>
              val n = q.getFileName.toString
              if (n.startsWith("batch="))
                scala.util.Try(n.stripPrefix("batch=").toLong).toOption
                  .filter(_ <= ft).foreach(b += _)
            }
            b.toSeq
          } finally st.close()
        }
        doomed.foreach { id =>
          graft.BenchUtil.rmTree(s"$dir/batch=$id")
          val lanes = Paths.get(dir, LanesName)
          if (Files.isDirectory(lanes)) {
            val st = Files.list(lanes)
            try st.forEach { lane =>
              graft.BenchUtil.rmTree(lane.resolve(s"batch=$id").toString)
            } finally st.close()
          }
        }
      }
    }

  /** Total parquet data files under the history dir (hot + lanes +
    * published generation) — the boundedness telemetry the compaction
    * specs and AdmissionProbe assert on. */
  def dataFileCount(dir: String): Long = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return 0L
    val cur = IndexStore.currentGen(foldedDir(dir))
    var n = 0L
    val st = Files.walk(root)
    try st.forEach { p =>
      val s = p.toString
      val inFolded = s.contains(s"/$FoldedName/")
      val inCurrentGen = cur.exists(g => s.contains(s"/$FoldedName/gen=$g/"))
      if (Files.isRegularFile(p) && s.endsWith(".parquet") &&
          (!inFolded || inCurrentGen))
        n += 1
    } finally st.close()
    n
  }
}
