package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, TextAnalysis}

/** Online corpus synchronization — the streaming face of the composed
  * lifecycle verb (r17): a CDC-shaped stream of (doc_id, text, op)
  * events, `op ∈ {upsert, delete}`, kept current against the persisted
  * text artifacts. This is the reference's OWN production shape — its
  * cursor sketch (core.clj:133-137) polls a source for new/updated
  * docs precisely because corpora get re-written in place — composed
  * over the artifact family: adds and revisions arrive as upserts
  * (`syncLshIndex`/`syncBm25Index` fold them in one generation; an
  * absent id inserts, a present id replaces), takedowns as deletes.
  *
  * Per micro-batch each configured artifact folds exactly ONE
  * generation carrying the whole batch's diff — atomically published,
  * so a reader never sees a partially-applied batch on any single
  * artifact. foreachBatch is sequential (single-maintainer contract
  * holds); a REPLAYED batch re-applies the same diff onto a corpus
  * that already reflects it, and the fold is answer-idempotent by
  * construction (the same ids mask out, the same revisions land) —
  * replay-safe with NO per-batch history of its own, the
  * StreamingTakedown discipline.
  *
  * If one id carries BOTH ops in one batch (a malformed feed — c07's
  * diff emits disjoint sets), DELETE WINS: takedowns are the
  * legally-loaded verb, so the conservative resolution is to drop the
  * doc; the next honest upsert re-inserts it. */
object StreamingCorpusSync {

  /** Start the sync query over a streaming (doc_id, text, op) frame. */
  def sync(events: DataFrame, checkpointDir: String,
           lshDir: Option[String] = None,
           bm25Dir: Option[String] = None): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        syncBatch(batch, lshDir, bm25Dir)
        ()
      }
      .start()

  /** One sync step — exposed for bounded feeds and tests. */
  def syncBatch(batch0: DataFrame, lshDir: Option[String],
                bm25Dir: Option[String]): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val batch = batch0.localCheckpoint() // ≤ |batch|; 2 ops × N artifacts
    val removed = batch.filter($"op" === "delete").select($"doc_id")
    val upserts = batch.filter($"op" =!= "delete")
      .select($"doc_id", $"text")
      // delete wins on a same-id conflict (see object scaladoc)
      .join(broadcast(removed), Seq("doc_id"), "left_anti")
    lshDir.foreach(Dedup.syncLshIndex(upserts, removed, _))
    bm25Dir.foreach(TextAnalysis.syncBm25Index(upserts, removed, _))
    graft.Scratch.releaseNow(batch)
    graft.Scratch.drain() // the folds' tracked lane checkpoints are dead
  }
}
