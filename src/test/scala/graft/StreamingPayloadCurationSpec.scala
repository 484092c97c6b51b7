package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingPayloadCuration

/** The payload leg of the streaming-curation family: streamed
  * byte-exact admission must equal the one-shot keep-first dedup
  * (m05's min-id-per-sha) regardless of batch slicing. */
class StreamingPayloadCurationSpec extends SparkSpec {

  /** Payloads with exact-dup chains crossing batch boundaries: distinct
    * base payloads, byte-identical re-uploads of some later in id
    * order, and re-uploads of payloads that were themselves REJECTED
    * (the chain case: the verdict must come from the sha SET, not the
    * admitted subset). */
  private def corpus: Seq[(Long, Array[Byte])] = {
    val rnd = new scala.util.Random(3)
    def base(): Array[Byte] =
      Array.fill(200 + rnd.nextInt(100))((rnd.nextInt(26) + 'a').toByte)
    val bases = Seq.fill(10)(base())
    val copies = bases.take(5)          // dups of admitted payloads
    val copyOfCopy = copies.take(3)     // dups of REJECTED payloads
    (bases ++ copies ++ copyOfCopy).zipWithIndex.map { case (p, i) => (i.toLong, p) }
  }

  /** Ground truth: reject p iff ∃ earlier id with identical bytes. */
  private def keepFirst(ps: Seq[(Long, Array[Byte])]): Set[Long] = {
    val seen = scala.collection.mutable.Set[Seq[Byte]]()
    ps.sortBy(_._1).collect {
      case (id, p) if seen.add(p.toSeq) => id
    }.toSet
  }

  test("streamed payload admission ≡ one-shot keep-first dedup across batch slicings") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ps = corpus
    val expected = keepFirst(ps)
    assert(expected.size === 10, "fixture must reject exactly the 8 re-uploads")
    Seq(Seq(6, 6, 6), Seq(1, 17), Seq(ps.size), Seq(3, 3, 3, 3, 3, 3)).foreach { slicing =>
      val histDir = java.nio.file.Files.createTempDirectory("pcur-hist").toString
      val ckpt = java.nio.file.Files.createTempDirectory("pcur-ckpt").toString
      val input = MemoryStream[(Long, Array[Byte])]
      val q = StreamingPayloadCuration.exactDedupAdmission(
        input.toDF().toDF("doc_id", "payload"), histDir, ckpt)
      try {
        var rest = ps
        slicing.foreach { n =>
          val (batch, tail) = rest.splitAt(n)
          rest = tail
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        rest.grouped(7).foreach { batch =>
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        val admitted = StreamingPayloadCuration.admittedDocs(spark, histDir)
          .select($"doc_id").as[Long].collect().toSet
        assert(admitted === expected, s"slicing=$slicing")
      } finally q.stop()
    }
  }

  test("seeded corpus suppresses stream re-uploads; replay is idempotent") {
    import spark.implicits._
    val ps = corpus
    val histDir = java.nio.file.Files.createTempDirectory("pcur-seed").toString
    val (seed, stream) = ps.splitAt(10)
    StreamingPayloadCuration.seedHistory(seed.toDF("doc_id", "payload"), histDir)
    StreamingPayloadCuration.admitBatch(stream.toDF("doc_id", "payload"), histDir, 0L)
    val admitted1 = StreamingPayloadCuration.admittedDocs(spark, histDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted1 === keepFirst(ps))
    // replay of batch 0: history read excludes batch=0 — identical
    // result, never self-suppressed
    StreamingPayloadCuration.admitBatch(stream.toDF("doc_id", "payload"), histDir, 0L)
    val admitted2 = StreamingPayloadCuration.admittedDocs(spark, histDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted2 === admitted1)
    // the agreement with m08's batch form: the stream batch's admitted
    // NEW payloads == m08-style anti-join of the delta vs the seed
    val viaM08 = {
      val all = ps.toDF("doc_id", "payload")
        .select($"doc_id", sha2($"payload", 256).as("sha"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"sha").orderBy($"doc_id")
      all.filter($"doc_id" >= 10)
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .join(all.filter($"doc_id" < 10).select($"sha"), Seq("sha"), "left_anti")
        .select($"doc_id").as[Long].collect().toSet
    }
    assert(admitted1.filter(_ >= 10) === viaM08)
  }

  test("admittedDocs on a fresh dir returns an empty frame, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("pcur-empty").toString
    assert(StreamingPayloadCuration.admittedDocs(spark, dir).count() === 0)
  }
}
