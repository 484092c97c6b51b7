package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, IndexStore, Multimodal, Similarity, TextAnalysis}

/** Online corpus synchronization — the streaming face of the composed
  * lifecycle verb (r17, widened to every artifact lane in r18): a
  * CDC-shaped stream of per-document events kept current against ALL
  * the persisted artifacts a curation stack serves from. This is the
  * reference's OWN production shape — its cursor sketch
  * (core.clj:133-137) polls a source for new/updated docs precisely
  * because corpora get re-written in place — composed over the
  * artifact family: adds and revisions arrive as upserts (the
  * `sync*Index` verbs fold them in one generation; an absent id
  * inserts, a present id replaces), takedowns as deletes.
  *
  * Event schema: `doc_id` + `op ∈ {upsert, delete}` always; plus
  * whichever content columns the configured lanes consume — `text`
  * (LSH / BM25 / cluster map), `v: array<double>` (IVF / IVFADC /
  * labeled IVF), `label` (labeled IVF), `payload: binary` (payload
  * index) — and optionally `seq`, a monotone per-feed ordering. A
  * real CDC feed carries embeddings and payload bytes alongside the
  * text, so one stream keeps every artifact current; lanes are
  * opt-in via [[SyncTargets]].
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
  * Conflict resolution (r18, shared with the sync verbs themselves —
  * direct verb callers get the SAME semantics, closing the r17
  * wrapper/verb divergence):
  *  - an unknown or null `op` REJECTS the batch loudly — a silent
  *    `=!=` drop would make a malformed feed look synced;
  *  - with a `seq` column, the LAST event per id wins outright (true
  *    CDC order — a delete followed by an upsert revives the doc);
  *  - without one, a DataFrame carries no arrival order, so same-id
  *    duplicate upserts resolve to one deterministic revision
  *    ([[IndexStore.latestRevision]]) and a same-id upsert+delete
  *    resolves DELETE-WINS: takedowns are the legally-loaded verb, so
  *    the conservative resolution is to drop the doc; the next honest
  *    upsert re-inserts it. */
object StreamingCorpusSync {

  /** A frozen-model IVF lane: the list directory + the centroids every
    * lifecycle verb assigns against (frozen by the s18 contract). */
  final case class IvfTarget(dir: String, centroids: DataFrame)

  /** A frozen-quantizer IVFADC lane: the artifact dir + the residual
    * PQ subvector width (`dsub`) and the coarse-stage split width
    * (`coarseWidth` — the [[Similarity.pqSubvectors]] width the
    * artifact was built with; one coarse subspace of the full
    * embedding dim in every fixture). The quantizers themselves are
    * read from the artifact's own model lanes. */
  final case class IvfAdcTarget(dir: String, dsub: Int, coarseWidth: Int = 64)

  /** Labeled-IVF lane — needs the `label` column on upsert events. */
  final case class LabeledIvfTarget(dir: String, centroids: DataFrame)

  /** Cluster-map lane: the map dir + the d21 LSH index its pair
    * derivation reads. If [[SyncTargets.lshDir]] names the same index,
    * the wrapper folds it once (inside the map sync), not twice. */
  final case class ClusterMapTarget(cmapDir: String, lshDir: String,
                                    threshold: Double = 0.8)

  /** The artifact lanes one CDC stream keeps current — all optional,
    * any combination. */
  final case class SyncTargets(
      lshDir: Option[String] = None,
      bm25Dir: Option[String] = None,
      payloadDir: Option[String] = None,
      ivf: Option[IvfTarget] = None,
      ivfAdc: Option[IvfAdcTarget] = None,
      labeledIvf: Option[LabeledIvfTarget] = None,
      clusterMap: Option[ClusterMapTarget] = None)

  /** Start the sync query over a streaming CDC event frame. */
  def sync(events: DataFrame, checkpointDir: String,
           targets: SyncTargets): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        syncBatch(batch, targets)
        ()
      }
      .start()

  /** One sync step — exposed for bounded feeds and tests. */
  def syncBatch(batch0: DataFrame, targets: SyncTargets): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val hasSeq = batch0.columns.contains("seq")
    val raw = batch0.localCheckpoint() // ≤ |batch|; 2 ops × N artifacts
    // validate BEFORE resolving: null/unknown ops reject the batch —
    // one diff-sized job, vs silently dropping rows from both sides
    val bad = raw.filter($"op".isNull || !$"op".isin("upsert", "delete"))
    if (!bad.isEmpty) {
      val sample = bad.select($"doc_id", $"op").take(3).mkString(", ")
      graft.Scratch.releaseNow(raw)
      throw new IllegalArgumentException(
        s"StreamingCorpusSync: op must be 'upsert' or 'delete'; got $sample")
    }
    // seq-ordered feeds: the LAST event per id wins outright (cross-op
    // too); orderless feeds defer to the sync verbs' shared resolution
    // (deterministic same-id dedup + delete-wins)
    val batch =
      if (hasSeq) {
        val tiebreak = raw.columns.filter(c => c != "doc_id" && c != "seq")
          .map(col(_).desc_nulls_last)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id")
          .orderBy($"seq".desc_nulls_last +: tiebreak: _*)
        raw.withColumn("__seq_rn", row_number().over(w))
          .filter($"__seq_rn" === 1).drop("__seq_rn", "seq")
      } else raw
    val removed = batch.filter($"op" === "delete").select($"doc_id")
    val upserts = batch.filter($"op" === "upsert").drop("op")
    // delete-wins once here for the orderless case (see scaladoc) so
    // each lane's verb sees a pre-resolved diff; with seq the winner
    // already decided and this anti-join is a no-op by construction
    val ups = upserts.join(broadcast(removed), Seq("doc_id"), "left_anti")

    def needs(col: String, lane: String): Unit =
      require(ups.columns.contains(col),
        s"StreamingCorpusSync: the $lane lane needs an event column '$col'")

    // the text lanes
    val textUps = if (targets.lshDir.isDefined || targets.bm25Dir.isDefined ||
        targets.clusterMap.isDefined) {
      needs("text", "text")
      ups.select($"doc_id", $"text")
    } else null
    // the cluster-map sync folds its own LSH index; skip the
    // standalone fold when both point at the same artifact
    val lshViaMap = targets.clusterMap.exists(cm => targets.lshDir.contains(cm.lshDir))
    targets.lshDir.filterNot(_ => lshViaMap)
      .foreach(Dedup.syncLshIndex(textUps, removed, _))
    targets.clusterMap.foreach(cm => Dedup.syncClusterMapViaLshIndex(
      textUps, removed, cm.cmapDir, cm.lshDir, cm.threshold))
    targets.bm25Dir.foreach(TextAnalysis.syncBm25Index(textUps, removed, _))

    // the vector lanes (doc identity rides as vec_id)
    val removedVec = removed.select($"doc_id".as("vec_id"))
    def vecUps: DataFrame = { needs("v", "vector"); ups }
    targets.ivf.foreach(t => Similarity.syncIvfIndex(
      vecUps.select($"doc_id".as("vec_id"), $"v"), removedVec,
      t.centroids, t.dir))
    targets.ivfAdc.foreach { t =>
      // revisions resolve at the RAW vector layer — the subvector
      // layout cannot pick one revision consistently across subspaces
      // (syncIvfAdcIndex fails loudly on duplicates by design)
      val oneRev = IndexStore.latestRevision(
        vecUps.select($"doc_id".as("vec_id"), $"v"), "vec_id")
      Similarity.syncIvfAdcIndex(
        Similarity.pqSubvectors(oneRev, t.coarseWidth), removedVec,
        t.dsub, t.dir)
    }
    targets.labeledIvf.foreach { t =>
      needs("label", "labeled IVF")
      Similarity.syncLabeledIvfIndex(
        vecUps.select($"doc_id".as("vec_id"), $"label", $"v"), removedVec,
        t.centroids, t.dir)
    }

    // the payload lane
    targets.payloadDir.foreach { d =>
      needs("payload", "payload")
      Multimodal.syncPayloadIndex(ups.select($"doc_id", $"payload"), removed, d)
    }
    graft.Scratch.releaseNow(raw)
    graft.Scratch.drain() // the folds' tracked lane checkpoints are dead
  }

  /** Back-compat text-only form (the r17 signature). */
  def syncBatch(batch0: DataFrame, lshDir: Option[String],
                bm25Dir: Option[String]): Unit =
    syncBatch(batch0, SyncTargets(lshDir = lshDir, bm25Dir = bm25Dir))
}
