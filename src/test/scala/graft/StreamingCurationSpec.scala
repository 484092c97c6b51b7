package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingCuration

/** Online near-dup admission: the streamed result must equal the
  * one-shot batch computation (keep-first dedup) REGARDLESS of how the
  * stream was sliced into micro-batches — the batching-invariance the
  * operator's contract promises. */
class StreamingCurationSpec extends SparkSpec {

  /** Corpus with near-dup chains that CROSS batch boundaries: base
    * docs early, near-copies later (and a near-copy of a near-copy, so
    * a rejected doc must still suppress its own copies). */
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(): String =
      Seq.fill(20 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(t: String): String = {
      val w = t.split(' ')
      w.updated(rnd.nextInt(w.length), vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val base = Seq.fill(12)(doc())
    val copies = base.take(6).map(mutate)         // near-dups of admitted docs
    val copyOfCopy = copies.take(3).map(mutate)   // near-dups of REJECTED docs
    (base ++ copies ++ copyOfCopy).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  /** Ground truth: keep-first = drop d2 of every J ≥ τ pair. */
  private def keepFirst(docs: Seq[(Long, String)], tau: Double): Set[Long] = {
    import spark.implicits._
    val all = docs.toDF("doc_id", "text")
    val rejected = Dedup.ngramJaccardPairs(all, tau)
      .select($"d2").as[Long].collect().toSet
    docs.map(_._1).toSet -- rejected
  }

  test("streamed admission ≡ one-shot keep-first dedup across batch slicings") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus
    val expected = keepFirst(docs, 0.8)
    // sanity: the fixture must actually exercise cross-batch chains
    assert(expected.size < docs.size && expected.size > docs.size / 3)
    // three fixed slicings plus three seeded-random ones: invariance
    // must hold for ANY batch boundaries, not just round numbers
    val randomSlicings = (0 until 3).map { seed =>
      val rnd = new scala.util.Random(100 + seed)
      Iterator.continually(1 + rnd.nextInt(9)).scanLeft(0)(_ + _)
        .takeWhile(_ < docs.size).toSeq.sliding(2).map(w => w(1) - w(0)).toSeq
    }
    (Seq(Seq(7, 7, 7), Seq(1, 20), Seq(docs.size)) ++ randomSlicings).foreach { slicing =>
      val histDir = java.nio.file.Files.createTempDirectory("cur-hist").toString
      val ckpt = java.nio.file.Files.createTempDirectory("cur-ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = StreamingCuration.nearDupAdmission(
        input.toDF().toDF("doc_id", "text"), histDir, 0.8, ckpt)
      try {
        var rest = docs
        slicing.foreach { n =>
          val (batch, tail) = rest.splitAt(n)
          rest = tail
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        rest.grouped(9).foreach { batch => // leftovers, if the slicing undercounts
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        val admitted = StreamingCuration.admittedDocs(spark, histDir)
          .select($"doc_id").as[Long].collect().toSet
        assert(admitted === expected, s"slicing=$slicing")
      } finally q.stop()
    }
  }

  test("full-pipeline streamed admission ≡ one-shot c01 across slicings, seed, replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Curation
    val all = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val bench = all.filter(_._1 < 20).toDF("doc_id", "text")
    val stream = all.filter(_._1 >= 20)
    val expected = Curation.c01CurationPipeline(spark, sf0001)
      .as[(Long, Double)].collect().toSet
    assert(expected.nonEmpty && expected.size < stream.size)
    def curated(dir: String) =
      StreamingCuration.curatedDocs(spark, dir).as[(Long, Double)].collect().toSet
    // batch-fold form: whole corpus streamed from empty state, two slicings
    for (k <- Seq(1, 5)) {
      val dir = java.nio.file.Files.createTempDirectory("pipe-state").toString
      val size = math.max(1, (stream.size + k - 1) / k)
      stream.grouped(size).zipWithIndex.foreach { case (b, i) =>
        StreamingCuration.admitPipelineBatch(
          b.toDF("doc_id", "text"), bench, dir, i.toLong)
      }
      assert(curated(dir) === expected, s"slicing k=$k diverges from c01")
    }
    // streaming form with a SEEDED standing corpus (the c12 shape live):
    // first 60% curated offline, the rest arrives in micro-batches
    val cut = stream(stream.size * 3 / 5)._1
    val dir = java.nio.file.Files.createTempDirectory("pipe-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pipe-ckpt").toString
    StreamingCuration.seedPipelineState(
      stream.filter(_._1 < cut).toDF("doc_id", "text"), bench, dir)
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.pipelineAdmission(
      input.toDF().toDF("doc_id", "text"), bench, dir, ckpt)
    try {
      stream.filter(_._1 >= cut).grouped(7).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      assert(curated(dir) === expected, "seeded streaming run diverges from c01")
    } finally q.stop()
    // replay idempotence: re-running the last batch id changes nothing
    val lastId = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong).max
      finally s.close()
    }
    val lastBatch = stream.filter(_._1 >= cut).grouped(7).toSeq.last
    StreamingCuration.admitPipelineBatch(
      lastBatch.toDF("doc_id", "text"), bench, dir, lastId)
    assert(curated(dir) === expected, "replayed batch changed the curated set")
  }

  test("admission survives a checkpoint restart without duplicate or lost history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus
    val expected = keepFirst(docs, 0.8)
    val histDir = java.nio.file.Files.createTempDirectory("cur-restart-h").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur-restart-c").toString
    val input = MemoryStream[(Long, String)]
    def start() = StreamingCuration.nearDupAdmission(
      input.toDF().toDF("doc_id", "text"), histDir, 0.8, ckpt)
    val q1 = start()
    try {
      input.addData(docs.take(10): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint; the rest of the stream continues
    val q2 = start()
    try {
      input.addData(docs.drop(10): _*)
      q2.processAllAvailable()
      val admitted = StreamingCuration.admittedDocs(spark, histDir)
        .select($"doc_id").as[Long].collect().toSet
      assert(admitted === expected)
      assert(spark.read.parquet(histDir).count() === docs.size.toLong,
        "history must hold each doc exactly once across the restart")
    } finally q2.stop()
  }

  test("out-of-order ids: defined (d2-in-batch) semantics, history doc untouched") {
    import spark.implicits._
    val histDir = java.nio.file.Files.createTempDirectory("cur-ooo").toString
    val t = "alpha beta gamma delta eps zeta eta theta iota kappa " * 3
    StreamingCuration.seedHistory(
      Seq((10L, t), (20L, "x y z " * 10)).toDF("doc_id", "text"), histDir)
    // doc 5 violates monotonicity and duplicates history doc 10: the
    // pair's d2 = 10 is already written, so 5 ADMITS (semi-join keeps
    // only batch-side d2s) and the violation is logged, not silent data
    // corruption
    StreamingCuration.admitBatch(
      Seq((5L, t)).toDF("doc_id", "text"), histDir, 0.8, batchId = 0L)
    val admitted = StreamingCuration.admittedDocs(spark, histDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted === Set(5L, 10L, 20L))
  }

  test("admissionStats: per-batch seen/admitted/rejected reconciles with admittedDocs") {
    import spark.implicits._
    val histDir = java.nio.file.Files.createTempDirectory("graft-admstats").toString
    val mk = (ids: Seq[Long], text: String) => ids.map(i => (i, text + " " + i))
    // seed 2 docs, then two batches where batch 1 contains a near-copy
    // of a seeded doc (rejected) and a fresh doc (admitted)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    StreamingCuration.seedHistory(
      Seq((1L, base + " one"), (2L, "totally different words here xyz abc def ghi jkl")).toDF("doc_id", "text"),
      histDir)
    StreamingCuration.admitBatch(
      Seq((10L, base + " two"), (11L, "unrelated fresh content qqq www eee rrr ttt yyy uuu")).toDF("doc_id", "text"),
      histDir, 0.8, batchId = 0L)
    StreamingCuration.admitBatch(
      Seq((20L, "another novel document with its own vocabulary entirely mmm nnn ooo ppp")).toDF("doc_id", "text"),
      histDir, 0.8, batchId = 1L)
    val stats = StreamingCuration.admissionStats(spark, histDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // seed batch is fully admitted by definition
    assert(stats.exists { case (b, n, a, r) => b == -1L && n == 2 && a == 2 && r == 0 })
    // totals reconcile with the curated output
    val admittedTotal = stats.map(_._3).sum
    assert(admittedTotal === StreamingCuration.admittedDocs(spark, histDir).count())
    // every batch satisfies seen = admitted + rejected
    stats.foreach { case (b, n, a, r) => assert(n === a + r, s"batch $b") }
    // the near-copy of the seeded doc was rejected in batch 0
    assert(stats.exists { case (b, _, _, r) => b == 0L && r >= 1 })
  }

  test("admittedDocs on a fresh dir returns an empty frame, not an error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cur-fresh").toString
    assert(StreamingCuration.admittedDocs(spark, dir).count() === 0L)
  }

  test("seeded corpus suppresses stream near-copies; replayed batch is idempotent") {
    import spark.implicits._
    val docs = corpus
    val histDir = java.nio.file.Files.createTempDirectory("cur-seed").toString
    val seed = docs.take(12).toDF("doc_id", "text")
    StreamingCuration.seedHistory(seed, histDir)
    // batch 0 = the near-copies; every one collides with the seed
    val batch = docs.slice(12, 18).toDF("doc_id", "text")
    StreamingCuration.admitBatch(batch, histDir, 0.8, batchId = 0L)
    val admittedAfter = StreamingCuration.admittedDocs(spark, histDir)
      .select($"doc_id").as[Long].collect().toSet
    val expected = keepFirst(docs.take(18), 0.8)
    assert(admittedAfter === expected)
    // replay the same batch id (failure recovery): history must not
    // grow — the batch=0 subdir is overwritten, not appended
    StreamingCuration.admitBatch(batch, histDir, 0.8, batchId = 0L)
    val replayed = StreamingCuration.admittedDocs(spark, histDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(replayed === expected)
    val total = spark.read.parquet(histDir).count()
    assert(total === 18L, s"replay must be idempotent, history has $total rows")
  }
}
