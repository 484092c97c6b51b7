package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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

  /** Delete retired generations older than current−1 (the grace
    * window) plus any dangling unpublished generation NEWER than
    * current (a crashed compaction's debris). */
  def sweep(dir: String): Unit =
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
                  .filter(g => g < cur - 1 || g > cur)
                  .foreach(_ => b += p)
            }
            b.toSeq
          } finally st.close()
        }
        doomed.foreach(p => graft.BenchUtil.rmTree(p.toString))
      }
    }
}
