package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamingTakedown

/** The streaming face of the deletion verb: a takedown stream, sliced
  * arbitrarily into micro-batches, must leave every artifact in the
  * same state as one batch delete of the union — and every serve
  * surface clean. */
class StreamingTakedownSpec extends SparkSpec {

  test("streamed takedowns ≡ one-shot batch delete across artifacts; replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val removedIds = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    val root = java.nio.file.Files.createTempDirectory("stream-td").toString
    try {
      val lsh = s"$root/lsh"; val bm = s"$root/bm"; val ivf = s"$root/ivf"
      val lshRef = s"$root/lsh-ref"; val bmRef = s"$root/bm-ref"
      Dedup.writeLshIndex(docs, lsh)
      Dedup.writeLshIndex(docs, lshRef)
      TextAnalysis.writeBm25Index(docs, bm)
      TextAnalysis.writeBm25Index(docs, bmRef)
      val centroids = Similarity.trainedCentroids(spark, sf0001, k = 5, iters = 2)
      Similarity.writeIvfIndex(vecs, centroids, ivf)

      // reference: one batch delete of the union
      Dedup.deleteFromLshIndex(removedIds.toDF("doc_id"), lshRef)
      TextAnalysis.deleteFromBm25Index(removedIds.toDF("doc_id"), bmRef)

      // stream the same set in 3 uneven batches, carrying vec_id too
      val input = MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("std-ckpt").toString
      val q = StreamingTakedown.propagate(
        input.toDF().toDF("doc_id", "vec_id"), ckpt,
        lshDir = Some(lsh), bm25Dir = Some(bm), ivfDir = Some(ivf))
      try {
        removedIds.grouped(math.max(1, removedIds.size / 3 + 1)).foreach { b =>
          input.addData(b.map(id => (id, id)): _*)
          q.processAllAvailable()
        }
        // replay shape: the last batch again — all no-ops
        input.addData(removedIds.takeRight(3).map(id => (id, id)): _*)
        q.processAllAvailable()
      } finally q.stop()

      val delta = docs.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 10 === 0)
      def pairs(d: String) = Dedup.probeLshIndex(spark, d, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(pairs(lsh) === pairs(lshRef),
        "streamed LSH takedowns diverged from the one-shot delete")
      def ranked(d: String) = TextAnalysis.bm25TopKFromIndex(spark, d,
          docs.filter($"doc_id" < 20 && $"doc_id" % 7 =!= 0), 3)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(ranked(bm) === ranked(bmRef),
        "streamed BM25 takedowns diverged from the one-shot delete")
      val removedSet = removedIds.toSet
      val q20 = vecs.withColumn("nrm", Similarity.norm($"v"))
        .filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
      val neigh = Similarity.ivfTopKFromIndex(spark, ivf, centroids, q20,
          nprobe = 2, k = 3)
        .as[(Long, Long, Int, Double)].collect()
      assert(neigh.nonEmpty && neigh.forall(n => !removedSet(n._2)),
        "a streamed-removed vector surfaced as a neighbor")
    } finally graft.BenchUtil.rmTree(root)
  }
}
