package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexStore, Multimodal, Similarity, TextAnalysis}

/** The index-update contract (round-17): the third lifecycle verb —
  * UPDATE, for the `changed` set c07's snapshot diff computes.
  * Re-crawls rewrite documents constantly, so this is the
  * highest-volume lifecycle event a real corpus feeds an index.
  * Contract, per artifact family:
  *
  *  1. update → probe/serve ≡ probe/serve of an index REBUILT with
  *     the new revisions (the d26/s31 deletion precedent on the third
  *     verb);
  *  2. atomicity: an update is ONE generation fold published by one
  *     atomic `_current` flip — a reader that resolved the pre-update
  *     generation keeps planning against it (live-reader grace), and
  *     no reader ever sees the torn middle (old revision masked, new
  *     one not yet probing);
  *  3. edges: an id the index never held inserts; a tombstoned id
  *     revives with the revision (update IS an upsert); standing
  *     tombstones fold in and the lane is reclaimed; re-applying the
  *     same update is idempotent;
  *  4. the composed cluster-map update ≡ a map rebuilt over the
  *     revised corpus's pairs.
  */
class IndexUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def tombLaneExists(dir: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      IndexStore.tombstoneLane(IndexStore.currentPath(dir))))

  private def docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
  private def revised(d: DataFrame): DataFrame =
    d.select($"doc_id", concat($"text", lit(" updated revision edition")).as("text"))

  test("LSH index: update → probe ≡ rebuild-with-new-revisions; edges; reclaim") {
    val standing = docs.filter($"doc_id" % 10 =!= 0)
    val delta = docs.filter($"doc_id" % 10 === 0)
    val changed = revised(standing.filter($"doc_id" % 11 === 0))
    val dir = java.nio.file.Files.createTempDirectory("upd-lsh").toString
    val rb = java.nio.file.Files.createTempDirectory("upd-lsh-rb").toString
    try {
      Dedup.writeLshIndex(standing, dir)
      // one standing doc is ALSO tombstoned before the update — the
      // fold must reclaim it (and its tombstone lane) along the way
      val removed = standing.filter($"doc_id" % 13 === 0 && $"doc_id" % 11 =!= 0)
        .select($"doc_id")
      Dedup.deleteFromLshIndex(removed, dir)
      Dedup.updateInLshIndex(changed, dir)
      // rebuild: standing minus removed, changed docs revised
      Dedup.writeLshIndex(
        standing.join(removed, Seq("doc_id"), "left_anti")
          .join(changed.select($"doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(changed), rb)
      def probe(d: String) = Dedup.probeLshIndex(spark, d, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      val want = probe(rb)
      assert(want.nonEmpty, "fixture delta must touch some pair")
      assert(probe(dir) === want, "update→probe diverged from rebuild")
      assert(!tombLaneExists(dir), "the update fold must reclaim the lane")
      // the lanes themselves match a rebuild row-for-row
      def lane(root: String, l: String) = spark.read
        .parquet(s"${IndexStore.currentPath(root)}/$l")
      assert(lane(dir, "shingles").as[(Long, Seq[Long])].collect().toSet ===
        lane(rb, "shingles").as[(Long, Seq[Long])].collect().toSet)
      assert(lane(dir, "bucket_counts").as[(Int, Long, Long)].collect().toSet ===
        lane(rb, "bucket_counts")
          .groupBy($"band_id", $"band_hash").agg(sum($"n").as("n"))
          .as[(Int, Long, Long)].collect().toSet,
        "counts lane must equal the rebuild's live bucket mass")
      // idempotence: re-applying the same update changes nothing
      Dedup.updateInLshIndex(changed, dir)
      assert(probe(dir) === want, "double-update changed the answer")
    } finally { BenchUtil.rmTree(dir); BenchUtil.rmTree(rb) }
  }

  test("LSH index: update inserts absent ids and revives tombstoned ids") {
    val standing = docs.filter($"doc_id" % 10 =!= 0 && $"doc_id" <= 300)
    val dir = java.nio.file.Files.createTempDirectory("upd-lsh-edge").toString
    try {
      Dedup.writeLshIndex(standing, dir)
      val victim = standing.orderBy($"doc_id").limit(1)
      Dedup.deleteFromLshIndex(victim.select($"doc_id"), dir)
      // "update" of the tombstoned doc (same text) + of a brand-new id
      val newDoc = victim.select(($"doc_id" + 1000000L).as("doc_id"), $"text")
      Dedup.updateInLshIndex(victim.unionByName(newDoc), dir)
      val live = spark.read.parquet(s"${IndexStore.currentPath(dir)}/shingles")
        .select($"doc_id").as[Long].collect().toSet
      val vid = victim.select($"doc_id").as[Long].head()
      assert(live.contains(vid), "update must revive a tombstoned id")
      assert(live.contains(vid + 1000000L), "update of an absent id must insert")
    } finally BenchUtil.rmTree(dir)
  }

  test("update atomicity: one generation per update, pre-update gen survives the flip") {
    val standing = docs.filter($"doc_id" % 10 =!= 0)
    val changed = revised(standing.filter($"doc_id" % 11 === 0))
    val dir = java.nio.file.Files.createTempDirectory("upd-atomic").toString
    try {
      Dedup.writeLshIndex(standing, dir)
      val g0 = IndexStore.currentGen(dir).get
      // a reader resolves the PRE-update generation and plans over it
      val preRoot = IndexStore.currentPath(dir)
      val preFrame = spark.read.parquet(s"$preRoot/shingles")
      val preCount = preFrame.count()
      Dedup.updateInLshIndex(changed, dir)
      assert(IndexStore.currentGen(dir).get === g0 + 1,
        "an update must publish exactly one new generation")
      // live-reader grace: the pre-update plan still materializes
      assert(preFrame.count() === preCount,
        "a reader that resolved the pre-update generation must keep it")
      // and the pre-update root still reads the ORIGINAL revisions
      assert(spark.read.parquet(s"$preRoot/shingles").count() === preCount)
    } finally BenchUtil.rmTree(dir)
  }

  test("IVF index: update → serve ≡ rebuild-with-new-revisions (vectors re-assigned)") {
    val c = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm($"v"))
    val cents = Similarity.kmeansCentroids(c.select($"vec_id", $"v"), 5, 2)
    // revision: a deterministic nudge that can move a vector across
    // cluster boundaries (element-wise +0.3 on the first coordinate)
    val changed = c.filter($"vec_id" % 11 === 0)
      .select($"vec_id", transform($"v",
        (x, i) => when(i === 0, x + 0.3).otherwise(x)).as("v"))
    val dir = java.nio.file.Files.createTempDirectory("upd-ivf").toString
    val rb = java.nio.file.Files.createTempDirectory("upd-ivf-rb").toString
    try {
      Similarity.writeIvfIndex(c.select($"vec_id", $"v"), cents, dir)
      Similarity.updateInIvfIndex(changed, cents, dir)
      Similarity.writeIvfIndex(
        c.select($"vec_id", $"v")
          .join(changed.select($"vec_id"), Seq("vec_id"), "left_anti")
          .unionByName(changed), cents, rb)
      val q = c.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
      def serve(d: String) =
        Similarity.ivfTopKFromIndex(spark, d, cents, q, nprobe = 2, k = 3)
          .as[(Long, Long, Int, Double)].collect().toSet
      assert(serve(dir) === serve(rb), "update→serve diverged from rebuild")
      assert(!tombLaneExists(dir))
    } finally { BenchUtil.rmTree(dir); BenchUtil.rmTree(rb) }
  }

  test("labeled IVF: update moves vector AND label atomically; filtered serve ≡ rebuild") {
    val c = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"), $"label")
      .withColumn("nrm", Similarity.norm($"v"))
    val cents = Similarity.kmeansCentroids(c.select($"vec_id", $"v"), 5, 2)
    // the revision flips the label too — the re-crawl reclassified it
    val changed = c.filter($"vec_id" % 11 === 0)
      .select($"vec_id", (($"label" + 1) % 4).as("label"),
        transform($"v", (x, i) => when(i === 0, x + 0.3).otherwise(x)).as("v"))
    val dir = java.nio.file.Files.createTempDirectory("upd-lab").toString
    val rb = java.nio.file.Files.createTempDirectory("upd-lab-rb").toString
    try {
      Similarity.writeLabeledIvfIndex(c.select($"vec_id", $"label", $"v"), cents, dir)
      Similarity.updateInLabeledIvfIndex(changed, cents, dir)
      Similarity.writeLabeledIvfIndex(
        c.select($"vec_id", $"label", $"v")
          .join(changed.select($"vec_id"), Seq("vec_id"), "left_anti")
          .unionByName(changed.select($"vec_id", $"label", $"v")), cents, rb)
      val q = c.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"label", $"v".as("qv"), $"nrm".as("qn"))
      def serve(d: String) =
        Similarity.filteredTopKFromIndex(spark, d, q, k = 3)
          .as[(Long, Long, Int, Double)].collect().toSet
      assert(serve(dir) === serve(rb), "labeled update diverged from rebuild")
    } finally { BenchUtil.rmTree(dir); BenchUtil.rmTree(rb) }
  }

  test("BM25 index: update → serve ≡ rebuild; stats lane matches the rebuild's") {
    val d0 = docs.filter($"doc_id" <= 400)
    val changed = revised(d0.filter($"doc_id" % 11 === 0))
    val dir = java.nio.file.Files.createTempDirectory("upd-bm25").toString
    val rb = java.nio.file.Files.createTempDirectory("upd-bm25-rb").toString
    try {
      TextAnalysis.writeBm25Index(d0, dir)
      TextAnalysis.updateInBm25Index(changed, dir)
      TextAnalysis.writeBm25Index(
        d0.join(changed.select($"doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(changed), rb)
      val q = d0.filter($"doc_id" < 10)
      def serve(d: String) =
        TextAnalysis.bm25TopKFromIndex(spark, d, q, 3)
          .as[(Long, Long, Int, Double)].collect().toSet
      assert(serve(dir) === serve(rb), "update→serve diverged from rebuild")
      def stats(d: String) = spark.read
        .parquet(s"${IndexStore.currentPath(d)}/stats")
        .agg(sum($"n_docs"), sum($"sum_dl")).as[(Long, Long)].head()
      assert(stats(dir) === stats(rb),
        "updated stats must equal the rebuild's (dl changed with the revision)")
    } finally { BenchUtil.rmTree(dir); BenchUtil.rmTree(rb) }
  }

  test("payload index: update → probe ≡ rebuild (new bytes, new fingerprint)") {
    val pay = Tables.documents(spark, sf0001)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .filter($"doc_id" <= 400)
    val standing = pay.filter($"doc_id" % 10 =!= 0)
    val delta = pay.filter($"doc_id" % 10 === 0)
    val changed = standing.filter($"doc_id" % 11 === 0)
      .select($"doc_id",
        encode(concat(decode($"payload", "UTF-8"), lit(" rev")), "UTF-8")
          .as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("upd-pay").toString
    val rb = java.nio.file.Files.createTempDirectory("upd-pay-rb").toString
    try {
      Multimodal.writePayloadIndex(standing, dir)
      Multimodal.updateInPayloadIndex(changed, dir)
      Multimodal.writePayloadIndex(
        standing.join(changed.select($"doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(changed), rb)
      def probe(d: String) = Multimodal.probePayloadIndex(spark, d, delta, 3)
        .collect().map(_.toString).toSet
      assert(probe(dir) === probe(rb), "update→probe diverged from rebuild")
    } finally { BenchUtil.rmTree(dir); BenchUtil.rmTree(rb) }
  }

  test("sync: one-generation full-diff fold ≡ rebuild (adds + revisions + removals, LSH and BM25)") {
    // the composed lifecycle verb: upserts = changed revisions ∪ added
    // docs, removed = dead ids — ONE atomic generation per artifact
    val universe = docs.filter($"doc_id" <= 500)
    val standing = universe.filter($"doc_id" % 9 =!= 0)
    val added = universe.filter($"doc_id" % 9 === 0)
    val changed = revised(standing.filter($"doc_id" % 11 === 0))
    val removed = standing
      .filter($"doc_id" % 7 === 0 && $"doc_id" % 11 =!= 0).select($"doc_id")
    val upserts = changed.unionByName(added)
    val net = standing
      .join(removed, Seq("doc_id"), "left_anti")
      .join(upserts.select($"doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(upserts)
    val lsh = java.nio.file.Files.createTempDirectory("sync-lsh").toString
    val lshRb = java.nio.file.Files.createTempDirectory("sync-lsh-rb").toString
    val bm = java.nio.file.Files.createTempDirectory("sync-bm").toString
    val bmRb = java.nio.file.Files.createTempDirectory("sync-bm-rb").toString
    try {
      Dedup.writeLshIndex(standing, lsh)
      val g0 = IndexStore.currentGen(lsh).get
      Dedup.syncLshIndex(upserts, removed, lsh)
      assert(IndexStore.currentGen(lsh).get === g0 + 1,
        "the whole diff must land as ONE generation")
      Dedup.writeLshIndex(net, lshRb)
      val delta = docs.filter($"doc_id" > 500 && $"doc_id" <= 700)
      def probe(d: String) = Dedup.probeLshIndex(spark, d, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(probe(lsh) === probe(lshRb), "LSH sync diverged from rebuild")
      TextAnalysis.writeBm25Index(standing, bm)
      TextAnalysis.syncBm25Index(upserts, removed, bm)
      TextAnalysis.writeBm25Index(net, bmRb)
      val q = universe.filter($"doc_id" < 10)
      def serve(d: String) = TextAnalysis.bm25TopKFromIndex(spark, d, q, 3)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(serve(bm) === serve(bmRb), "BM25 sync diverged from rebuild")
    } finally Seq(lsh, lshRb, bm, bmRb).foreach(BenchUtil.rmTree)
  }

  test("streaming corpus sync: sliced CDC feed ≡ rebuild; replay idempotent; delete wins") {
    val universe = docs.filter($"doc_id" <= 500)
    val standing = universe.filter($"doc_id" % 9 =!= 0)
    // the CDC feed: adds (%9=0), revisions (%11=0 of standing),
    // deletes (%7=0 of standing, not also revised)
    val events = universe.filter($"doc_id" % 9 === 0)
      .select($"doc_id", $"text", lit("upsert").as("op"))
      .unionByName(revised(standing.filter($"doc_id" % 11 === 0))
        .select($"doc_id", $"text", lit("upsert").as("op")))
      .unionByName(standing
        .filter($"doc_id" % 7 === 0 && $"doc_id" % 11 =!= 0)
        .select($"doc_id", lit(null).cast("string").as("text"),
          lit("delete").as("op")))
    val net = standing
      .join(events.select($"doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(universe.filter($"doc_id" % 9 === 0))
      .unionByName(revised(standing.filter(
        $"doc_id" % 11 === 0 && $"doc_id" % 9 =!= 0)))
    val lsh = java.nio.file.Files.createTempDirectory("ssync-lsh").toString
    val rb = java.nio.file.Files.createTempDirectory("ssync-rb").toString
    try {
      Dedup.writeLshIndex(standing, lsh)
      // stream the feed in 3 id-range slices
      val (lo, hi) = {
        val r = events.agg(min($"doc_id"), max($"doc_id")).head
        (r.getLong(0), r.getLong(1))
      }
      val bounds = (0 to 3).map(i => lo + (hi - lo + 1) * i / 3)
      (0 until 3).foreach { i =>
        streaming.StreamingCorpusSync.syncBatch(
          events.filter($"doc_id" >= bounds(i) && $"doc_id" < bounds(i + 1)),
          Some(lsh), None)
      }
      Dedup.writeLshIndex(net, rb)
      val delta = docs.filter($"doc_id" > 500 && $"doc_id" <= 700)
      def probe(d: String) = Dedup.probeLshIndex(spark, d, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      val want = probe(rb)
      assert(probe(lsh) === want, "streamed sync diverged from rebuild")
      // replay the middle batch — answer-idempotent
      streaming.StreamingCorpusSync.syncBatch(
        events.filter($"doc_id" >= bounds(1) && $"doc_id" < bounds(2)),
        Some(lsh), None)
      assert(probe(lsh) === want, "replayed batch changed the answer")
      // delete-wins conflict resolution: one malformed batch carrying
      // BOTH ops for one live doc must end with the doc absent
      val victim = net.orderBy($"doc_id").limit(1)
      val vid = victim.select($"doc_id").as[Long].head()
      streaming.StreamingCorpusSync.syncBatch(
        victim.select($"doc_id", $"text", lit("upsert").as("op"))
          .unionByName(victim.select($"doc_id",
            lit(null).cast("string").as("text"), lit("delete").as("op"))),
        Some(lsh), None)
      val live = spark.read
        .parquet(s"${IndexStore.currentPath(lsh)}/shingles")
        .select($"doc_id").as[Long].collect().toSet
      assert(!live.contains(vid), "delete must win a same-batch conflict")
    } finally Seq(lsh, rb).foreach(BenchUtil.rmTree)
  }

  test("cluster map: composed update ≡ map rebuilt over the revised corpus's pairs") {
    val standing = docs.filter($"doc_id" % 10 =!= 0)
    val changed = revised(standing.filter($"doc_id" % 11 === 0))
    val lsh = java.nio.file.Files.createTempDirectory("upd-cm-lsh").toString
    val cmap = java.nio.file.Files.createTempDirectory("upd-cm-map").toString
    val rb = java.nio.file.Files.createTempDirectory("upd-cm-rb").toString
    try {
      Dedup.writeLshIndex(standing, lsh)
      Dedup.writeClusterMap(
        Dedup.ngramJaccardPairs(standing, 0.8).select($"d1", $"d2"), cmap)
      Dedup.updateClusterMapViaLshIndex(changed, cmap, lsh)
      val revisedCorpus = standing
        .join(changed.select($"doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(changed)
      Dedup.writeClusterMap(
        Dedup.ngramJaccardPairs(revisedCorpus, 0.8).select($"d1", $"d2"), rb)
      def read(d: String) = Dedup.readClusterMap(spark, d)
        .as[(Long, Long)].collect().toMap
      assert(read(cmap) === read(rb),
        "composed cluster-map update diverged from the one-shot rebuild")
    } finally { BenchUtil.rmTree(lsh); BenchUtil.rmTree(cmap); BenchUtil.rmTree(rb) }
  }
}
