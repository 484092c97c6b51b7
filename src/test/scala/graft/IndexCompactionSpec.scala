package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IndexStore, Multimodal, Similarity}

/** The index-compaction contract (round-14): append-only index
  * artifacts accumulate one small file set per delta batch, and at
  * production cadence the FILE COUNT becomes the probe bottleneck.
  * Compaction must fold the lanes without changing any probe answer,
  * bound the file count, and stay safe for readers that planned
  * against the pre-compaction generation (the IndexStore grace
  * window). */
class IndexCompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[String] = {
    val b = scala.collection.mutable.ArrayBuffer[String]()
    val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try st.forEach(p => if (p.toString.endsWith(".parquet")) b += p.toString)
    finally st.close()
    b.toSeq
  }

  test("LSH index: 20 appends then compact — same probe answer, files bounded, counts lane merged") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val cut = (maxId * 4) / 5
    val standing = docs.filter($"doc_id" <= cut)
    val delta = docs.filter($"doc_id" > cut)
    val dir = java.nio.file.Files.createTempDirectory("compact-lsh").toString
    try {
      // build from the first slice, append the remaining 19
      val bounds = (0 to 20).map(i => 1 + cut * i / 20)
      Dedup.writeLshIndex(
        standing.filter($"doc_id" < bounds(1)), dir)
      (1 until 20).foreach { i =>
        Dedup.appendToLshIndex(
          standing.filter($"doc_id" >= bounds(i) && $"doc_id" < bounds(i + 1)),
          dir)
      }
      val before = Dedup.probeLshIndex(spark, dir, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      val filesBefore = parquetFiles(dir).size
      val gen0 = IndexStore.currentGen(dir).get
      // a reader that PLANNED before compaction (the live-reader case)
      val preplanned = Dedup.probeLshIndex(spark, dir, delta, 0.8)
      Dedup.compactLshIndex(spark, dir)
      assert(IndexStore.currentGen(dir).get === gen0 + 1, "generation must bump")
      val filesAfter = parquetFiles(IndexStore.currentPath(dir)).size
      assert(filesAfter * 4 <= filesBefore,
        s"compaction barely folded: $filesBefore -> $filesAfter")
      val after = Dedup.probeLshIndex(spark, dir, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(after === before, "compaction changed the probe answer")
      assert(after.nonEmpty, "fixture delta must touch some pair")
      // counts lane partials merged to one row per bucket
      val counts = spark.read
        .parquet(s"${IndexStore.currentPath(dir)}/bucket_counts")
      assert(counts.groupBy($"band_id", $"band_hash").count()
        .filter($"count" > 1).count() === 0L, "counts lane still has partials")
      // grace: the pre-compaction plan still executes (its generation
      // survives one compaction cycle)...
      assert(preplanned.as[(Long, Long, Double)].collect().toSet === before,
        "live reader lost its planned generation after one compaction")
      // ...and is swept only after TWO further generations publish
      Dedup.compactLshIndex(spark, dir)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(IndexStore.genPath(dir, gen0))),
        "retired generation must be swept after the grace window")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("IVF index: appends then compact — served top-k identical, one file per list") {
    import spark.implicits._
    val c = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val centroids = Similarity.trainedCentroids(spark, sf0001, k = 5, iters = 2)
    val q = c.withColumn("nrm", Similarity.norm($"v")).filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
    def serve(dir: String) =
      Similarity.ivfTopKFromIndex(spark, dir, centroids, q, nprobe = 2, k = 3)
        .as[(Long, Long, Int, Double)].collect().toSet
    val maxId = c.agg(max($"vec_id")).head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("compact-ivf").toString
    try {
      val bounds = (0 to 20).map(i => maxId * i / 20)
      Similarity.writeIvfIndex(
        c.filter($"vec_id" <= bounds(1)), centroids, dir)
      (1 until 20).foreach { i =>
        Similarity.appendToIvfIndex(
          c.filter($"vec_id" > bounds(i) && $"vec_id" <= bounds(i + 1)),
          centroids, dir)
      }
      val before = serve(dir)
      val filesBefore = parquetFiles(dir).size
      Similarity.compactIvfIndex(spark, dir)
      val filesAfter = parquetFiles(IndexStore.currentPath(dir)).size
      assert(filesAfter * 4 <= filesBefore,
        s"compaction barely folded: $filesBefore -> $filesAfter")
      assert(filesAfter <= 5, s"expected ~one file per list, got $filesAfter")
      assert(serve(dir) === before, "compaction changed served results")
      assert(before.nonEmpty)
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("IVFADC index: appends then compact — served ADC top-k identical, files bounded") {
    import spark.implicits._
    val (kc, dsub, kpq, iters, nprobe) = (5, 4, 16, 2, 2)
    val vq64 = Similarity.pqSubvectors(
      Tables.embeddings(spark, sf0001)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")), 64)
      .cache()
    try {
      val coarse = Similarity.trainedPqCodebooks(spark, sf0001, 64, kc, iters)
      val rsv = Similarity.coarseResidualsForSpec(vq64, coarse)
        .select($"vec_id", posexplode(Similarity.subSplit($"r", dsub)))
        .toDF("vec_id", "sub", "sv")
      val books = Similarity.pqCodebooks(rsv, kpq, iters).cache()
      def serve(dir: String) =
        Similarity.ivfAdcTopKFromIndex(spark, dir,
            vq64.filter($"vec_id" < 20), dsub, nprobe, k = 3)
          .as[(Long, Long, Int, Double)].collect().toSet
      val maxId = vq64.agg(max($"vec_id")).head().getLong(0)
      val dir = java.nio.file.Files.createTempDirectory("compact-adc").toString
      try {
        val bounds = (0 to 10).map(i => maxId * i / 10)
        Similarity.writeIvfAdcIndex(
          vq64.filter($"vec_id" <= bounds(1)), coarse, books, dsub, dir)
        (1 until 10).foreach { i =>
          Similarity.appendToIvfAdcIndex(
            vq64.filter($"vec_id" > bounds(i) && $"vec_id" <= bounds(i + 1)),
            dsub, dir)
        }
        val before = serve(dir)
        val filesBefore = parquetFiles(dir).size
        Similarity.compactIvfAdcIndex(spark, dir)
        val filesAfter = parquetFiles(IndexStore.currentPath(dir)).size
        assert(filesAfter * 3 <= filesBefore,
          s"compaction barely folded: $filesBefore -> $filesAfter")
        assert(serve(dir) === before, "compaction changed served results")
        assert(before.nonEmpty)
      } finally graft.BenchUtil.rmTree(dir)
    } finally { vq64.unpersist(); () }
  }

  test("payload index: appends then compact — probe identical, files bounded") {
    import spark.implicits._
    val all = Tables.documents(spark, sf0001)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    val maxId = all.agg(max($"doc_id")).head().getLong(0)
    val cut = (maxId * 4) / 5
    val standing = all.filter($"doc_id" <= cut)
    val delta = all.filter($"doc_id" > cut)
    val dir = java.nio.file.Files.createTempDirectory("compact-pay").toString
    try {
      val bounds = (0 to 20).map(i => 1 + cut * i / 20)
      Multimodal.writePayloadIndex(
        standing.filter($"doc_id" < bounds(1)), dir)
      (1 until 20).foreach { i =>
        Multimodal.appendToPayloadIndex(
          standing.filter($"doc_id" >= bounds(i) && $"doc_id" < bounds(i + 1)),
          dir)
      }
      val before = Multimodal.probePayloadIndex(spark, dir, delta, 7)
        .as[(Long, Long, Int)].collect().toSet
      val filesBefore = parquetFiles(dir).size
      Multimodal.compactPayloadIndex(spark, dir)
      val filesAfter = parquetFiles(IndexStore.currentPath(dir)).size
      assert(filesAfter * 4 <= filesBefore,
        s"compaction barely folded: $filesBefore -> $filesAfter")
      val after = Multimodal.probePayloadIndex(spark, dir, delta, 7)
        .as[(Long, Long, Int)].collect().toSet
      assert(after === before, "compaction changed the probe answer")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("auto-compaction knob: 20 appends at compactEvery=5 fold unattended, probe ≡ manual twin") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val cut = (maxId * 4) / 5
    val standing = docs.filter($"doc_id" <= cut)
    val delta = docs.filter($"doc_id" > cut)
    val auto = java.nio.file.Files.createTempDirectory("auto-lsh").toString
    val manual = java.nio.file.Files.createTempDirectory("manual-lsh").toString
    try {
      val bounds = (0 to 21).map(i => 1 + cut * i / 21)
      Dedup.writeLshIndex(standing.filter($"doc_id" < bounds(1)), auto)
      Dedup.writeLshIndex(standing.filter($"doc_id" < bounds(1)), manual)
      (1 until 21).foreach { i =>
        val slice = standing
          .filter($"doc_id" >= bounds(i) && $"doc_id" < bounds(i + 1))
        Dedup.appendToLshIndex(slice, auto, compactEvery = 5)
        Dedup.appendToLshIndex(slice, manual)
      }
      // 20 counted appends at cadence 5 → four unattended folds
      assert(IndexStore.currentGen(auto).get === 4L,
        s"expected 4 auto-folds, generation is ${IndexStore.currentGen(auto)}")
      val a = Dedup.probeLshIndex(spark, auto, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      val m = Dedup.probeLshIndex(spark, manual, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(a === m && a.nonEmpty, "auto-compacted probe diverged")
      assert(parquetFiles(IndexStore.currentPath(auto)).size <
        parquetFiles(IndexStore.currentPath(manual)).size,
        "auto path must hold fewer live files than the never-compacted twin")
    } finally { graft.BenchUtil.rmTree(auto); graft.BenchUtil.rmTree(manual) }
  }

  test("legacy flat dir: first compaction adopts it into gen=0 — no mixed layout, probe unchanged") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val cut = (maxId * 4) / 5
    val delta = docs.filter($"doc_id" > cut)
    val dir = java.nio.file.Files.createTempDirectory("legacy-lsh").toString
    try {
      // manufacture a pre-generation artifact: build normally, then
      // flatten gen=0 to the top level and drop _current (a round-13
      // index looked exactly like this)
      Dedup.writeLshIndex(docs.filter($"doc_id" <= cut), dir)
      val g0 = java.nio.file.Paths.get(IndexStore.genPath(dir, 0L))
      val st = java.nio.file.Files.list(g0)
      try st.forEach { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(dir, p.getFileName.toString))
      } finally st.close()
      java.nio.file.Files.delete(g0)
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_current"))
      val before = Dedup.probeLshIndex(spark, dir, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      Dedup.compactLshIndex(spark, dir)
      // adoption migrated the flat lanes: nothing parquet-bearing left
      // at the top level, so no partition-discovery mixing is possible
      val topLevel = {
        val s2 = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        try {
          import scala.jdk.CollectionConverters._
          s2.iterator().asScala.map(_.getFileName.toString).toSet
        } finally s2.close()
      }
      assert(topLevel.forall(n => n.startsWith("gen=") || n.startsWith("_")),
        s"flat lanes must migrate into generations, found $topLevel")
      assert(IndexStore.currentGen(dir).contains(1L),
        "adoption publishes gen 0, compaction folds into gen 1")
      val after = Dedup.probeLshIndex(spark, dir, delta, 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(after === before && after.nonEmpty,
        "legacy adoption changed the probe answer")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("sweep grace: a fresh dangling gen (compaction mid-build) survives; an aged one is debris") {
    val dir = java.nio.file.Files.createTempDirectory("sweep-grace").toString
    try {
      IndexStore.publish(dir, 0L)
      // a second maintainer (or crashed compaction) left gen=1 unpublished
      val dangling = java.nio.file.Paths.get(IndexStore.genPath(dir, 1L))
      java.nio.file.Files.createDirectories(dangling)
      java.nio.file.Files.write(dangling.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3))
      IndexStore.sweep(dir) // default grace: fresh mtime → mid-build, keep
      assert(java.nio.file.Files.exists(dangling),
        "a freshly-written dangling generation must survive the sweep")
      IndexStore.sweep(dir, danglingGraceMs = 0L) // aged out → crash debris
      assert(!java.nio.file.Files.exists(dangling),
        "an aged dangling generation must be swept")
    } finally graft.BenchUtil.rmTree(dir)
  }
}
