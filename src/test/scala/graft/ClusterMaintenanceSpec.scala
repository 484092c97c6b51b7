package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IndexStore}

/** The d25 contract: the persisted (doc_id, cluster_rep) map, merged
  * batch by batch with each delta's verified pairs, must equal the
  * one-shot connected-components run over the full pair set at EVERY
  * batch boundary — cluster maintenance at delta cost, the same
  * equivalence discipline as c12 ≡ c01 and s18 append ≡ rebuild. */
class ClusterMaintenanceSpec extends SparkSpec {

  private def mapOf(dir: String): Map[Long, Long] = {
    import spark.implicits._
    Dedup.readClusterMap(spark, dir).as[(Long, Long)].collect().toMap
  }

  private def ccOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.clusterPairs(pairs.toDF("d1", "d2")).as[(Long, Long)]
      .collect().toMap
  }

  test("synthetic chain: two merges build alias chains, resolution matches one-shot CC") {
    import spark.implicits._
    val batch0 = Seq((10L, 11L), (20L, 21L), (30L, 31L))
    // merge 1: new doc 40 bridges clusters 10 and 20 → alias 20→10
    val batch1 = Seq((11L, 40L), (40L, 21L))
    // merge 2: new docs bridge the 10-chain with cluster 30 AND bring
    // a smaller id (5) — reps 10 and 30 must both alias to 5, and the
    // old alias 20→10 must RESOLVE through the chain 20→10→5
    val batch2 = Seq((21L, 50L), (50L, 31L), (5L, 51L), (51L, 31L))
    val dir = java.nio.file.Files.createTempDirectory("cmap-chain").toString
    try {
      Dedup.writeClusterMap(batch0.toDF("d1", "d2"), dir)
      assert(mapOf(dir) === ccOf(batch0))
      Dedup.mergeIntoClusterMap(batch1.toDF("d1", "d2"), dir)
      assert(mapOf(dir) === ccOf(batch0 ++ batch1))
      Dedup.mergeIntoClusterMap(batch2.toDF("d1", "d2"), dir)
      val want = ccOf(batch0 ++ batch1 ++ batch2)
      assert(mapOf(dir) === want, "chained aliases must resolve to the global min")
      assert(want(20L) === 5L, "fixture must actually exercise a 2-link chain")
      // path compression: compaction rewrites members resolved, drops
      // the alias lane, and the read is unchanged
      val gen0 = IndexStore.currentGen(dir).get
      Dedup.compactClusterMap(spark, dir)
      assert(IndexStore.currentGen(dir).get === gen0 + 1)
      assert(mapOf(dir) === want, "compaction changed the resolved map")
      assert(!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
        s"${IndexStore.currentPath(dir)}/aliases")),
        "compaction must drop the alias lane")
      val members = spark.read
        .parquet(s"${IndexStore.currentPath(dir)}/members")
      assert(members.groupBy($"doc_id").count().filter($"count" > 1)
        .count() === 0L, "one member row per doc after compaction")
      assert(members.as[(Long, Long)].collect().toMap === want,
        "compacted members must be fully path-compressed on disk")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("boundary sweep on real docs: merge(standing, delta) ≡ full recompute at every split") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val full = Dedup.clusterPairs(
        Dedup.ngramJaccardPairs(docs, 0.8).select($"d1", $"d2"))
      .as[(Long, Long)].collect().toMap
    assert(full.nonEmpty, "fixture must have clusters")
    Seq(maxId / 3, (maxId * 4) / 5).foreach { b =>
      val standing = docs.filter($"doc_id" <= b)
      val delta = docs.filter($"doc_id" > b)
      val dir = java.nio.file.Files
        .createTempDirectory(s"cmap-sweep-$b").toString
      try {
        Dedup.writeClusterMap(
          Dedup.ngramJaccardPairs(standing, 0.8).select($"d1", $"d2"), dir)
        Dedup.mergeIntoClusterMap(
          Dedup.deltaNearDupPairs(standing, delta, 0.8).select($"d1", $"d2"),
          dir)
        assert(mapOf(dir) === full,
          s"merge at boundary $b diverged from the one-shot CC")
      } finally graft.BenchUtil.rmTree(dir)
    }
  }

  test("property: random graphs sliced into arbitrary merge batches ≡ union-find, with a mid-stream compaction") {
    import spark.implicits._
    (0 until 2).foreach { seed =>
      val rnd = new scala.util.Random(3100 + seed)
      val n = 30
      val edges = (Seq.fill(18)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
          .filter { case (a, b) => a != b } ++ (40L until 46L).map(i => (i, i + 1)))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // arbitrary 3-way slicing of the EDGE set — batches may merge two
      // standing clusters, touch only new ids, or both
      val batches = rnd.shuffle(edges).grouped(math.max(1, edges.size / 3 + 1)).toSeq
      val dir = java.nio.file.Files.createTempDirectory(s"cmap-prop-$seed").toString
      try {
        Dedup.writeClusterMap(batches.head.toDF("d1", "d2"), dir)
        batches.tail.zipWithIndex.foreach { case (b, i) =>
          Dedup.mergeIntoClusterMap(b.toDF("d1", "d2"), dir)
          if (i == 0) Dedup.compactClusterMap(spark, dir) // mid-stream fold
        }
        // union-find ground truth, min-id reps
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(x => x -> find(x)).toMap
        assert(mapOf(dir) === expected, s"seed=$seed slicing=${batches.map(_.size)}")
      } finally graft.BenchUtil.rmTree(dir)
    }
  }

  test("d27 bridge split: removing the bridge doc splits its cluster; unaffected clusters untouched") {
    import spark.implicits._
    // cluster {1,2,3,10,11} bridged by 2; independent cluster {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 10L), (3L, 11L), (20L, 21L))
    def liveAmong(removedSet: Set[Long])(aff: org.apache.spark.sql.DataFrame) = {
      val live = edges.filter { case (a, b) =>
        !removedSet(a) && !removedSet(b) }.toDF("d1", "d2")
      live.join(aff.select($"doc_id".as("d1")), Seq("d1"), "left_semi")
        .join(aff.select($"doc_id".as("d2")), Seq("d2"), "left_semi")
    }
    val dir = java.nio.file.Files.createTempDirectory("cmap-bridge").toString
    try {
      Dedup.writeClusterMap(edges.toDF("d1", "d2"), dir)
      assert(mapOf(dir) === ccOf(edges))
      Dedup.deleteFromClusterMap(Seq(2L).toDF("doc_id"), dir,
        liveAmong(Set(2L)))
      assert(mapOf(dir) === Map(1L -> 1L, 10L -> 1L, 3L -> 3L, 11L -> 3L,
        20L -> 20L, 21L -> 20L),
        "bridge removal must split the component and leave {20,21} alone")
      // a doc losing its LAST pair vanishes entirely
      Dedup.deleteFromClusterMap(Seq(10L).toDF("doc_id"), dir,
        liveAmong(Set(2L, 10L)))
      assert(mapOf(dir) === Map(3L -> 3L, 11L -> 3L, 20L -> 20L, 21L -> 20L),
        "doc 1 lost its last pair and must leave the map")
      // merges compose after a delete-fold
      Dedup.mergeIntoClusterMap(Seq((11L, 21L)).toDF("d1", "d2"), dir)
      assert(mapOf(dir) === Map(3L -> 3L, 11L -> 3L, 20L -> 3L, 21L -> 3L),
        "post-delete merge must union the split survivors")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("d27 property: random removals ≡ union-find over the surviving edges") {
    import spark.implicits._
    (0 until 2).foreach { seed =>
      val rnd = new scala.util.Random(4200 + seed)
      val n = 24
      val edges = (Seq.fill(16)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
          .filter { case (a, b) => a != b } ++ (30L until 35L).map(i => (i, i + 1)))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val removedSet = rnd.shuffle(nodes).take(nodes.size / 4).toSet
      val survivors = edges.filter { case (a, b) =>
        !removedSet(a) && !removedSet(b) }
      val dir = java.nio.file.Files.createTempDirectory(s"cmap-del-$seed").toString
      try {
        Dedup.writeClusterMap(edges.toDF("d1", "d2"), dir)
        Dedup.deleteFromClusterMap(removedSet.toSeq.toDF("doc_id"), dir,
          aff => survivors.toDF("d1", "d2")
            .join(aff.select($"doc_id".as("d1")), Seq("d1"), "left_semi")
            .join(aff.select($"doc_id".as("d2")), Seq("d2"), "left_semi"))
        val expected =
          if (survivors.isEmpty) Map.empty[Long, Long] else ccOf(survivors)
        assert(mapOf(dir) === expected,
          s"seed=$seed removed=$removedSet")
      } finally graft.BenchUtil.rmTree(dir)
    }
  }

  test("d27 via the persisted LSH index: pair source from the artifact ≡ in-plan recompute") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val removed = docs.filter($"doc_id" % 9 === 0).select($"doc_id")
    val root = java.nio.file.Files.createTempDirectory("cmap-via").toString
    try {
      val lsh = s"$root/lsh"; val viaIdx = s"$root/via"; val inPlan = s"$root/inplan"
      Dedup.writeLshIndex(docs, lsh)
      val pairs = Dedup.ngramJaccardPairs(docs, 0.8).select($"d1", $"d2")
        .localCheckpoint()
      Dedup.writeClusterMap(pairs, viaIdx)
      Dedup.writeClusterMap(pairs, inPlan)
      // production order: the index takes the takedown first, then the
      // cluster map re-derives affected pairs FROM the masked index
      Dedup.deleteFromLshIndex(removed, lsh)
      Dedup.deleteFromClusterMapViaLshIndex(removed, viaIdx, lsh)
      Dedup.deleteFromClusterMap(removed, inPlan,
        aff => Dedup.ngramJaccardPairs(
          docs.join(removed, Seq("doc_id"), "left_anti")
            .join(aff, Seq("doc_id"), "left_semi"), 0.8))
      assert(mapOf(viaIdx) === mapOf(inPlan),
        "index-sourced pair derivation diverged from the in-plan recompute")
      assert(mapOf(viaIdx).nonEmpty)
    } finally graft.BenchUtil.rmTree(root)
  }

  test("merge replay is idempotent: re-merging an already-merged batch changes nothing") {
    import spark.implicits._
    // the foreachBatch replay case: after a crash the same delta batch
    // is merged again — projected edges all collapse to self-loops, so
    // no aliases and no member rows may appear
    val b0 = Seq((10L, 11L), (20L, 21L))
    val b1 = Seq((11L, 21L), (30L, 31L))
    val dir = java.nio.file.Files.createTempDirectory("cmap-replay").toString
    try {
      Dedup.writeClusterMap(b0.toDF("d1", "d2"), dir)
      Dedup.mergeIntoClusterMap(b1.toDF("d1", "d2"), dir)
      val want = mapOf(dir)
      Dedup.mergeIntoClusterMap(b1.toDF("d1", "d2"), dir) // replay
      assert(mapOf(dir) === want, "replayed merge changed the map")
      Dedup.mergeIntoClusterMap(
        (b0 ++ b1).toDF("d1", "d2"), dir) // even a full re-merge
      assert(mapOf(dir) === want, "full re-merge changed the map")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("merges count toward the auto-compaction cadence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cmap-cadence").toString
    try {
      Dedup.writeClusterMap(Seq((10L, 11L)).toDF("d1", "d2"), dir)
      val gen0 = IndexStore.currentGen(dir).get
      Dedup.mergeIntoClusterMap(Seq((11L, 12L)).toDF("d1", "d2"), dir,
        compactEvery = 2)
      Dedup.mergeIntoClusterMap(Seq((12L, 13L)).toDF("d1", "d2"), dir,
        compactEvery = 2)
      assert(IndexStore.currentGen(dir).get === gen0 + 1,
        "second counted merge at cadence 2 must trigger compression")
      assert(mapOf(dir) === ccOf(Seq((10L, 11L), (11L, 12L), (12L, 13L))))
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("streamed admission maintains the map: slicing ≡ one-shot CC; replay idempotent; compaction rides (r17)") {
    // VERDICT r16 #5: admission already computes the verified delta
    // pairs per micro-batch — fold them into the persisted map so an
    // online corpus's cluster map never goes stale between batch runs.
    // The contract: the map after streaming the corpus in ANY slicing
    // equals one-shot CC over the full exact pair set (the c12 ≡ c01
    // discipline), a replayed batch is a no-op merge, and the map's
    // own compaction cadence rides through untouched.
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").filter($"doc_id" <= 600)
    val want = {
      val pairs = Dedup.ngramJaccardPairs(docs, 0.8).select($"d1", $"d2")
      Dedup.clusterPairs(pairs).as[(Long, Long)].collect().toMap
    }
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    val (lo, hi) = {
      val r = docs.agg(min($"doc_id"), max($"doc_id")).head
      (r.getLong(0), r.getLong(1))
    }
    def streamInto(slices: Int, cmapCompactEvery: Int): (String, String) = {
      val hist = java.nio.file.Files.createTempDirectory("cmap-str-h").toString
      val cmap = java.nio.file.Files.createTempDirectory("cmap-str-m").toString
      val bounds = (0 to slices).map(i => lo + (hi - lo + 1) * i / slices)
      (0 until slices).foreach { i =>
        streaming.StreamingCuration.admitBatch(
          docs.filter($"doc_id" >= bounds(i) && $"doc_id" < bounds(i + 1)),
          hist, 0.8, i.toLong, Some(cmap), cmapCompactEvery)
      }
      (hist, cmap)
    }
    val (h4, m4) = streamInto(4, 0)
    val (h2, m2) = streamInto(2, 2) // different slicing, compaction riding
    try {
      assert(mapOf(m4) === want, "4-batch streamed map diverged from one-shot CC")
      assert(mapOf(m2) === want, "2-batch (compacted) map diverged from one-shot CC")
      // replay: re-run the LAST batch of the 4-slicing verbatim — the
      // history overwrite is idempotent by design and the map merge
      // must no-op (endpoints are all members already)
      val bounds = (0 to 4).map(i => lo + (hi - lo + 1) * i / 4)
      streaming.StreamingCuration.admitBatch(
        docs.filter($"doc_id" >= bounds(3) && $"doc_id" < bounds(4)),
        h4, 0.8, 3L, Some(m4), 0)
      assert(mapOf(m4) === want, "replayed batch changed the map")
    } finally Seq(h4, m4, h2, m2).foreach(graft.BenchUtil.rmTree)
  }
}
