package graft

import org.apache.spark.sql.functions._
import graft.operators.{IndexStore, TextAnalysis}

/** The t41 contract: the persisted BM25 postings index must serve
  * bit-identically to the in-plan t25 path, stay bit-identical under
  * append (≡ rebuild at every boundary) and delete (≡ rebuild without
  * the removed docs), prune its scan to the query terms' bucket
  * partitions, and reclaim dead rows + the tombstone lane at
  * compaction — the full artifact-family lifecycle on the lexical
  * lane. */
class Bm25IndexSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[String] = {
    val b = scala.collection.mutable.ArrayBuffer[String]()
    val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try st.forEach(p => if (p.toString.endsWith(".parquet")) b += p.toString)
    finally st.close()
    b.toSeq
  }

  private def docs = {
    import spark.implicits._
    Tables.documents(spark, sf0001).select($"doc_id", $"text")
  }

  private def queriesOf(d: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    d.filter($"doc_id" < 20)
  }

  private def serve(dir: String) = {
    import spark.implicits._
    TextAnalysis.bm25TopKFromIndex(spark, dir, queriesOf(docs), 3)
      .as[(Long, Long, Int, Double)].collect().toSet
  }

  test("serve ≡ in-plan bm25TopK bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-rt").toString
    try {
      TextAnalysis.writeBm25Index(docs, dir)
      import spark.implicits._
      val inPlan = TextAnalysis.bm25TopK(docs, queriesOf(docs), 3)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(inPlan.nonEmpty)
      assert(serve(dir) === inPlan,
        "persisted serve diverged from the in-plan BM25 path")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("append ≡ rebuild at every boundary; standing files untouched") {
    import spark.implicits._
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val want = {
      val dir = java.nio.file.Files.createTempDirectory("bm25-full").toString
      try { TextAnalysis.writeBm25Index(docs, dir); serve(dir) }
      finally graft.BenchUtil.rmTree(dir)
    }
    Seq(maxId / 3, (maxId * 4) / 5).foreach { b =>
      val dir = java.nio.file.Files.createTempDirectory(s"bm25-ap-$b").toString
      try {
        TextAnalysis.writeBm25Index(docs.filter($"doc_id" <= b), dir)
        val standingFiles = parquetFiles(dir).map { p =>
          (p, java.nio.file.Files.getLastModifiedTime(
            java.nio.file.Paths.get(p)).toMillis)
        }.toSet
        TextAnalysis.appendToBm25Index(docs.filter($"doc_id" > b), dir)
        assert(serve(dir) === want, s"append at boundary $b diverged from rebuild")
        val after = parquetFiles(dir).map { p =>
          (p, java.nio.file.Files.getLastModifiedTime(
            java.nio.file.Paths.get(p)).toMillis)
        }.toSet
        assert(standingFiles.subsetOf(after),
          "append must not rewrite or touch standing files")
      } finally graft.BenchUtil.rmTree(dir)
    }
  }

  test("delete ≡ rebuild-without-removed; idempotent; compaction reclaims") {
    import spark.implicits._
    val removed = docs.filter($"doc_id" % 7 === 0 && $"doc_id" >= 20)
      .select($"doc_id")
    val dir = java.nio.file.Files.createTempDirectory("bm25-del").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("bm25-del-rb").toString
    try {
      TextAnalysis.writeBm25Index(docs, dir)
      TextAnalysis.deleteFromBm25Index(removed, dir)
      TextAnalysis.writeBm25Index(
        docs.join(removed, Seq("doc_id"), "left_anti"), rebuilt)
      val want = serve(rebuilt)
      assert(want.nonEmpty)
      assert(serve(dir) === want,
        "delete→serve diverged from rebuild (scores include avgdl — the " +
        "stats correction must be exact)")
      assert(want.forall { case (_, d, _, _) => !(d % 7 == 0 && d >= 20) },
        "a removed doc surfaced in a ranking")
      // idempotence: double-delete + absent ids must not re-subtract
      TextAnalysis.deleteFromBm25Index(removed, dir)
      TextAnalysis.deleteFromBm25Index(
        spark.range(5).select(($"id" + 900000L).as("doc_id")), dir)
      assert(serve(dir) === want, "re-delete changed the answer")
      TextAnalysis.compactBm25Index(spark, dir)
      assert(serve(dir) === want, "compaction-with-tombstones changed the answer")
      assert(!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
        IndexStore.tombstoneLane(IndexStore.currentPath(dir)))),
        "new generation must carry no tombstone lane")
      val liveIds = spark.read
        .parquet(s"${IndexStore.currentPath(dir)}/postings")
        .select($"doc_id").distinct().as[Long].collect().toSet
      assert(liveIds.forall(d => !(d % 7 == 0 && d >= 20)),
        "dead postings must be physically dropped at compaction")
      // stats lane fully re-derived: one row, equal to the rebuild's
      val st = spark.read.parquet(s"${IndexStore.currentPath(dir)}/stats")
        .as[(Long, Long)].collect().toSeq
      val stWant = spark.read
        .parquet(s"${IndexStore.currentPath(rebuilt)}/stats")
        .as[(Long, Long)].collect().toSeq
      assert(st.length === 1 && st === stWant,
        s"compacted stats $st must equal the rebuild's $stWant")
    } finally { graft.BenchUtil.rmTree(dir); graft.BenchUtil.rmTree(rebuilt) }
  }

  test("probe prunes to the query terms' bucket partitions (static isin, the s17 pin)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25-prune").toString
    try {
      TextAnalysis.writeBm25Index(docs, dir)
      // one single-term query → at most ONE bucket partition scanned
      val oneTerm = Seq((1000000L, "the")).toDF("doc_id", "text")
      val served = TextAnalysis.bm25TopKFromIndex(spark, dir, oneTerm, 3)
      val root = served.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case o => o
      }
      val scan = root.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(dir)) => f
      }.get
      val staticFilters = scan.partitionFilters.filterNot(e =>
        e.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])
          .isDefined)
      assert(staticFilters.nonEmpty, "static bucket filter missing from the scan")
      val partsRead =
        scan.relation.location.listFiles(staticFilters, Nil).size
      val totalParts = scan.relation.location.listFiles(Nil, Nil).size
      assert(totalParts > 10, s"fixture must populate many buckets, got $totalParts")
      assert(partsRead === 1,
        s"single-term probe must scan exactly 1 bucket, scanned $partsRead")
      assert(served.count() === 3, "the pruned probe must still rank")
    } finally graft.BenchUtil.rmTree(dir)
  }
}
