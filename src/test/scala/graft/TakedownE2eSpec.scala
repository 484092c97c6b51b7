package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IndexStore, Multimodal, Similarity, TextAnalysis}

/** The round-16 story end to end: ONE takedown set (the `removed` ids
  * a c07 snapshot diff emits) propagated through EVERY persisted
  * artifact family in a single pass, then every probe/serve verified
  * clean — no removed doc may surface as a pair endpoint, a neighbor,
  * a ranked result, or a cluster member anywhere. This is the
  * compliance sweep a real corpus operator runs on takedown day; the
  * per-family rebuild equivalences live in IndexDeletionSpec /
  * ClusterMaintenanceSpec / Bm25IndexSpec — this spec pins that the
  * verbs COMPOSE over one shared removal set. */
class TakedownE2eSpec extends SparkSpec {

  test("one removed set propagates through LSH, IVF, payload, postings and cluster artifacts") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    // the takedown set: the c07 convention — ids leave the corpus
    val removedDocs = docs.filter($"doc_id" % 7 === 0).select($"doc_id")
      .localCheckpoint()
    val removedVecs = vecs.filter($"vec_id" % 7 === 0).select($"vec_id")
      .localCheckpoint()
    val removedDocSet = removedDocs.as[Long].collect().toSet
    val removedVecSet = removedVecs.as[Long].collect().toSet
    assert(removedDocSet.nonEmpty && removedVecSet.nonEmpty)

    val root = java.nio.file.Files.createTempDirectory("takedown-e2e").toString
    try {
      val lsh = s"$root/lsh"; val ivf = s"$root/ivf"
      val pay = s"$root/pay"; val bm = s"$root/bm25"; val cmap = s"$root/cmap"
      // build all five artifacts over the full corpus
      Dedup.writeLshIndex(docs, lsh)
      val centroids = Similarity.trainedCentroids(spark, sf0001, k = 5, iters = 2)
      Similarity.writeIvfIndex(vecs, centroids, ivf)
      val payloads = docs.select($"doc_id", encode($"text", "utf-8").as("payload"))
      Multimodal.writePayloadIndex(payloads, pay)
      TextAnalysis.writeBm25Index(docs, bm)
      Dedup.writeClusterMap(
        Dedup.ngramJaccardPairs(docs, 0.8).select($"d1", $"d2"), cmap)

      // propagate the ONE removal set
      Dedup.deleteFromLshIndex(removedDocs, lsh)
      Similarity.deleteFromIvfIndex(removedVecs, ivf)
      Multimodal.deleteFromPayloadIndex(removedDocs, pay)
      TextAnalysis.deleteFromBm25Index(removedDocs, bm)
      Dedup.deleteFromClusterMap(removedDocs, cmap,
        aff => Dedup.ngramJaccardPairs(
          docs.join(removedDocs, Seq("doc_id"), "left_anti")
            .join(aff, Seq("doc_id"), "left_semi"), 0.8))

      // every surface is clean
      val probeDelta = docs.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 10 === 0)
      val lshPairs = Dedup.probeLshIndex(spark, lsh, probeDelta, 0.8)
        .as[(Long, Long, Double)].collect()
      assert(lshPairs.nonEmpty)
      assert(lshPairs.forall(p => !removedDocSet(p._1) && !removedDocSet(p._2)),
        "a removed doc surfaced as an LSH pair endpoint")

      val q = vecs.withColumn("nrm", Similarity.norm($"v"))
        .filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
      val neighbors = Similarity
        .ivfTopKFromIndex(spark, ivf, centroids, q, nprobe = 2, k = 3)
        .as[(Long, Long, Int, Double)].collect()
      assert(neighbors.nonEmpty)
      assert(neighbors.forall(n => !removedVecSet(n._2)),
        "a removed vector surfaced as an IVF neighbor")

      val payPairs = Multimodal.probePayloadIndex(spark, pay,
          payloads.join(removedDocs, Seq("doc_id"), "left_anti")
            .filter($"doc_id" % 10 === 0), 7)
        .as[(Long, Long, Int)].collect()
      assert(payPairs.forall(p => !removedDocSet(p._1) && !removedDocSet(p._2)),
        "a removed payload surfaced as a band pair endpoint")

      val ranked = TextAnalysis.bm25TopKFromIndex(spark, bm,
          docs.filter($"doc_id" < 20 && $"doc_id" % 7 =!= 0), 3)
        .as[(Long, Long, Int, Double)].collect()
      assert(ranked.nonEmpty)
      assert(ranked.forall(r => !removedDocSet(r._2)),
        "a removed doc surfaced in a BM25 ranking")

      val clusters = Dedup.readClusterMap(spark, cmap)
        .as[(Long, Long)].collect()
      assert(clusters.nonEmpty)
      assert(clusters.forall { case (d, rep) =>
        !removedDocSet(d) && !removedDocSet(rep) },
        "a removed doc survived in the cluster map (as member or rep)")

      // and compaction reclaims every tombstone lane in one sweep
      Dedup.compactLshIndex(spark, lsh)
      Similarity.compactIvfIndex(spark, ivf)
      Multimodal.compactPayloadIndex(spark, pay)
      TextAnalysis.compactBm25Index(spark, bm)
      Seq(lsh, ivf, pay, bm).foreach { d =>
        assert(!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
          IndexStore.tombstoneLane(IndexStore.currentPath(d)))),
          s"tombstone lane not reclaimed under $d")
      }
    } finally graft.BenchUtil.rmTree(root)
  }
}
