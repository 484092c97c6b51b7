package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Generation-based layout + live-reader-safe compaction plumbing for
  * the persisted index artifacts (d21's LSH lanes, m10's payload
  * bands, s17/s18's IVF lists).
  *
  * Why: every delta append lands NEW parquet files beside the standing
  * ones (the append-only discipline that keeps standing bytes
  * untouched). At production batch cadence the FILE COUNT, not the
  * byte mass, becomes the probe bottleneck — thousands of small
  * footers to open per scan (the same lesson the ES-sim store learned,
  * [[graft.ingest.EsSimCompact]]). Plain parquet directories cannot be
  * compacted in place safely: a reader that planned the old file list
  * fails when those names vanish, and a reader listing mid-swap could
  * see both sides of the fold.
  *
  * Layout: `<dir>/_current` (the published generation number) +
  * `<dir>/gen=<N>/<lanes…>`. Writers bootstrap gen 0; appends land
  * inside the CURRENT generation (append-only, standing files
  * untouched); compaction writes the folded lanes as generation N+1
  * and atomically flips `_current` (tmp file + ATOMIC_MOVE — readers
  * see the old or the new generation, never neither, never both).
  *
  * Live-reader grace: [[sweep]] deletes only generations older than
  * current−1, so a reader that resolved gen G keeps every file it
  * planned until TWO further generations publish — one full
  * compaction cycle of grace, and the probe APIs materialize their
  * results per call anyway (the s17 localCheckpoint discipline).
  * Crash-safety: a crash before publish leaves a dangling unpublished
  * gen directory that the next sweep removes; `_current` itself only
  * ever changes by atomic rename.
  *
  * Legacy flat directories (no `_current`) read as themselves, so
  * externally-built index dirs stay valid.
  */
object IndexStore {

  private def currentFile(dir: String): Path = Paths.get(dir, "_current")

  def currentGen(dir: String): Option[Long] = {
    val f = currentFile(dir)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), "UTF-8").trim.toLong)
    else None
  }

  def genPath(dir: String, g: Long): String = s"$dir/gen=$g"

  /** The root READERS resolve: the published generation (a legacy flat
    * dir without `_current` reads as itself). */
  def currentPath(dir: String): String =
    currentGen(dir).map(genPath(dir, _)).getOrElse(dir)

  /** The generation the next full write / compaction should build. */
  def nextGen(dir: String): Long = currentGen(dir).map(_ + 1).getOrElse(0L)

  /** Atomically flip readers to generation `g`. */
  def publish(dir: String, g: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Files.createTempFile(Paths.get(dir), "._current.", ".tmp")
    Files.write(tmp, g.toString.getBytes("UTF-8"))
    Files.move(tmp, currentFile(dir), StandardCopyOption.ATOMIC_MOVE)
  }

  /** How stale a dangling unpublished generation (gen > current) must
    * be before [[sweep]] treats it as crash debris. A generation NEWER
    * than `_current` is either a crashed compaction's leftovers or a
    * compaction MID-BUILD: deleting it unconditionally would let a
    * sweep (or an accidental second maintainer) destroy a build in
    * progress — the documented single-writer contract made that
    * "acceptable", but an mtime grace makes the failure mode impossible
    * to hit by accident at the cost of debris lingering one window. */
  val DanglingGraceMs: Long = 15L * 60 * 1000

  /** Delete retired generations older than current−1 (the live-reader
    * grace window) plus any dangling unpublished generation NEWER than
    * current (a crashed compaction's debris) whose tree has been
    * untouched for [[DanglingGraceMs]] — a gen still being written has
    * recent file mtimes and survives. */
  def sweep(dir: String, danglingGraceMs: Long = DanglingGraceMs): Unit =
    currentGen(dir).foreach { cur =>
      val d = Paths.get(dir)
      if (Files.isDirectory(d)) {
        val doomed = {
          val st = Files.list(d)
          try {
            val b = scala.collection.mutable.ArrayBuffer[Path]()
            st.forEach { p =>
              val n = p.getFileName.toString
              if (n.startsWith("gen="))
                scala.util.Try(n.stripPrefix("gen=").toLong).toOption
                  .filter(g => g < cur - 1 ||
                    (g > cur && ageMs(p) > danglingGraceMs))
                  .foreach(_ => b += p)
            }
            b.toSeq
          } finally st.close()
        }
        doomed.foreach(p => graft.BenchUtil.rmTree(p.toString))
      }
    }

  /** Milliseconds since the newest mtime anywhere under `p` — the
    * "is anyone still writing here" signal for the dangling-gen grace. */
  private def ageMs(p: Path): Long = {
    var newest = 0L
    val st = Files.walk(p)
    try st.forEach { q =>
      val t = Files.getLastModifiedTime(q).toMillis
      if (t > newest) newest = t
    } finally st.close()
    System.currentTimeMillis() - newest
  }

  /** Bump the artifact's append counter and return the new total — the
    * cadence source for the every-K-appends auto-compaction knob each
    * append API takes. A plain text file under the dir root (invisible
    * to Spark's listing), read-modify-write under the artifact's
    * existing single-writer contract; it survives compactions (it
    * lives beside `_current`, not inside a generation). */
  def bumpAppends(dir: String): Long = {
    val f = Paths.get(dir, "_appends")
    Files.createDirectories(Paths.get(dir))
    // tolerant parse + atomic publish (the _current discipline): a crash
    // mid-write must not leave a truncated counter that turns every
    // later append into a NumberFormatException — a corrupt counter
    // resets the compaction cadence, it never wedges appends
    val n = (if (Files.exists(f))
               scala.util.Try(
                 new String(Files.readAllBytes(f), "UTF-8").trim.toLong
               ).getOrElse(0L)
             else 0L) + 1
    val tmp = Files.createTempFile(Paths.get(dir), "._appends.", ".tmp")
    Files.write(tmp, n.toString.getBytes("UTF-8"))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE)
    n
  }

  // ---- tombstones: the deletion path of the artifact family ----

  /** The tombstone lane of a generation root. `_`-prefixed so Spark's
    * file listing never sees it — lanes laid out as bare parquet
    * datasets at the generation root (the IVF lists) are unaffected
    * by its presence. */
  def tombstoneLane(root: String): String = s"$root/_tombstones"

  /** Record deletions: append the ids' single key column as tombstone
    * rows under the CURRENT generation's `_tombstones` lane. Living
    * INSIDE the generation gives deletes exactly the crash/reader
    * semantics appends already have: a reader that resolved gen G sees
    * G's lanes masked by G's tombstones (old or new generation, never
    * a torn mix), and the compaction that builds gen G+1 folds the
    * tombstones in — dead rows physically dropped, no tombstone lane
    * carried forward — so reclaim IS the atomic generation flip.
    * Append-only like every lane (standing files byte-untouched);
    * double-deleting an id just appends another row, which every
    * consumer tolerates (reads are distinct-ed, masks are semi/anti
    * joins). Ids are assumed never reused (the corpus family's
    * monotonic-id contract): a tombstoned id stays dead to APPENDS and
    * probes; the sanctioned revival path is the r17 update/sync verb
    * family (`updateIn*` / `sync*Index`), whose one-generation fold
    * explicitly re-inserts a tombstoned id's new revision and reclaims
    * the lane (IndexUpdateSpec pins revival). Normalizes legacy flat
    * dirs first ([[adoptLegacy]]) so the lane always lives inside a
    * generation. */
  def appendTombstones(ids: DataFrame, dir: String, idCol: String): Unit = {
    adoptLegacy(dir)
    if (currentGen(dir).isEmpty) publish(dir, 0L) // empty artifact: still record
    ids.select(col(idCol).cast(LongType).as(idCol)).distinct()
      .write.mode("append").parquet(tombstoneLane(currentPath(dir)))
  }

  /** The current generation's tombstoned ids, distinct, as a one-long-
    * column frame (empty when no deletion ever happened — a missing
    * lane is not an error). Schema-explicit: an all-duplicate delete
    * batch can leave a file-less lane dir where inference would throw.
    * Removals are delta-sized by premise, so callers broadcast this
    * frame into anti-joins against standing lanes — the standing side
    * streams, preserving every probe's delta-cost contract. */
  def readTombstones(s: SparkSession, dir: String, idCol: String): DataFrame =
    readTombstonesAt(s, currentPath(dir), idCol)

  /** [[readTombstones]] against an ALREADY-RESOLVED generation root —
    * for serve paths that resolved [[currentPath]] once and must read
    * that same generation's lanes AND tombstones (resolving the
    * generation independently per lane opens a window where a
    * concurrent maintainer flip pairs gen G's lanes with gen G+1's
    * folded-away tombstone state, serving deleted rows unmasked). */
  def readTombstonesAt(s: SparkSession, root: String, idCol: String): DataFrame = {
    val lane = tombstoneLane(root)
    val schema = StructType(Seq(StructField(idCol, LongType)))
    if (Files.isDirectory(Paths.get(lane)))
      s.read.schema(schema).parquet(lane).distinct()
    else s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
  }

  /** Whether any deletion was ever recorded against the artifact — one
    * filesystem stat, no Spark job. The mask fast path: an artifact
    * that never saw a delete must serve through the exact same plan it
    * served before deletes existed (r16 regression: every probe/serve
    * path paid a broadcast-empty-frame anti-join — an extra job, an
    * exchange, and a codegen stage — on indexes with no tombstone lane
    * at all). */
  def hasTombstones(dir: String): Boolean = hasTombstonesAt(currentPath(dir))

  /** [[hasTombstones]] against an already-resolved generation root
    * (the [[readTombstonesAt]] single-resolution discipline). */
  def hasTombstonesAt(root: String): Boolean =
    Files.isDirectory(Paths.get(tombstoneLane(root)))

  /** Mask `df` by the artifact's tombstones on `idCol` — the standard
    * serve-time guard: broadcast anti-join when deletions exist
    * (removals are delta-sized by premise; the standing side streams),
    * and the IDENTITY — plan-identical to the pre-deletion path, no
    * anti-join stage, no `_tombstones` scan — when none were ever
    * recorded ([[hasTombstones]]). Prefer [[maskTombstonesAt]] in
    * serve paths that already resolved the generation root. */
  def maskTombstones(df: DataFrame, dir: String, idCol: String): DataFrame =
    maskTombstonesAt(df, currentPath(dir), idCol)

  /** [[maskTombstones]] against an already-resolved generation root:
    * one probe reads ONE generation's lanes and tombstones even under
    * a concurrent maintainer flip. */
  def maskTombstonesAt(df: DataFrame, root: String, idCol: String): DataFrame =
    if (hasTombstonesAt(root))
      df.join(org.apache.spark.sql.functions.broadcast(
          readTombstonesAt(df.sparkSession, root, idCol)),
        Seq(idCol), "left_anti")
    else df

  /** Resolve SAME-ID upserts within one diff batch to exactly one row
    * per id — the precondition every `sync*Index` generation fold
    * needs: two revisions of one id landing in the lanes would both
    * probe/serve, silently diverging from the sync ≡
    * rebuild-with-one-revision contract (r17 advice). CDC feeds
    * routinely carry multiple updates per key per micro-batch; a
    * DataFrame carries no arrival order, so feeds that know their
    * ordering should pre-resolve (the streaming wrapper's `seq`
    * column does). For feeds that don't, this keeps a DETERMINISTIC
    * representative — the row ranking first over all non-id columns
    * descending — so replays and re-runs of the same batch fold the
    * same revision (an arbitrary `dropDuplicates` pick would not).
    * In the common case (true duplicate rows — replay) this is the
    * identity choice. Cost: one window over the DIFF-sized batch. */
  def latestRevision(df: DataFrame, idCol: String): DataFrame = {
    val content = df.columns.filter(_ != idCol)
    if (content.isEmpty) df.distinct()
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol))
        .orderBy(content.map(c => col(c).desc_nulls_last): _*)
      df.withColumn("__rev_rn",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rev_rn") === 1).drop("__rev_rn")
    }
  }

  /** One-time migration of a legacy FLAT index dir (written before the
    * generation layout existed: lanes at top level, no `_current`)
    * into the generation layout: MOVE every top-level entry into
    * `gen=0` and publish it. Without this, the first compaction of a
    * legacy dir would write `gen=1` BESIDE the flat files — the flat
    * lanes would never be swept (sweep only removes `gen=*`), and any
    * external reader of the flat path would hit Spark
    * partition-discovery conflicts on the mixed layout (round-14
    * advice). Renames are same-filesystem moves (no data copy);
    * single-maintainer, like the compactions that call it — external
    * readers of the dir should resolve through [[currentPath]] from
    * then on, as every probe API here does. No-op when `_current`
    * exists or the dir is empty/missing. */
  def adoptLegacy(dir: String): Unit = {
    val d = Paths.get(dir)
    if (currentGen(dir).isEmpty && Files.isDirectory(d)) {
      val entries = {
        val st = Files.list(d)
        try {
          val b = scala.collection.mutable.ArrayBuffer[Path]()
          st.forEach { p =>
            val n = p.getFileName.toString
            // `_`/`.`-prefixed root entries stay put: they are layout
            // metadata (_appends, a stale _SUCCESS marker), invisible
            // to Spark's listing either way
            if (!n.startsWith("gen=") && !n.startsWith("_") &&
                !n.startsWith(".")) b += p
          }
          b.toSeq
        } finally st.close()
      }
      if (entries.nonEmpty) {
        val g0 = Paths.get(genPath(dir, 0L))
        Files.createDirectories(g0)
        entries.foreach(p => Files.move(p, g0.resolve(p.getFileName)))
        publish(dir, 0L)
      }
    }
  }
}
