package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingVectorCuration

/** The vector twin of StreamingCurationSpec: streamed embedding
  * admission must equal the one-shot keep-first computation regardless
  * of batch slicing. */
class StreamingVectorCurationSpec extends SparkSpec {

  /** Vectors with near-dup chains crossing batch boundaries: random
    * base vectors (pairwise cosine far below τ), near-copies of some
    * of them later in id order, and near-copies of REJECTED copies. */
  private def corpus: Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(7)
    def base(): Seq[Double] = Seq.fill(16)(rnd.nextGaussian())
    def perturb(v: Seq[Double]): Seq[Double] = v.map(_ + rnd.nextGaussian() * 0.02)
    val bases = Seq.fill(10)(base())
    val copies = bases.take(5).map(perturb)      // near-dups of admitted vecs
    val copyOfCopy = copies.take(3).map(perturb) // near-dups of REJECTED vecs
    (bases ++ copies ++ copyOfCopy).zipWithIndex.map { case (v, i) => (i.toLong, v) }
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  /** Ground truth: reject v iff ∃ u < v with cosine ≥ τ. */
  private def keepFirst(vecs: Seq[(Long, Seq[Double])], tau: Double): Set[Long] = {
    val rejected = (for {
      (i, u) <- vecs; (j, w) <- vecs if i < j && cos(u, w) >= tau
    } yield j).toSet
    vecs.map(_._1).toSet -- rejected
  }

  test("streamed vector admission ≡ one-shot keep-first across batch slicings") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vecs = corpus
    val tau = 0.8
    val expected = keepFirst(vecs, tau)
    // fixture sanity: rejections exist and chains cross the base set
    assert(expected.size < vecs.size && expected.size >= 10)
    Seq(Seq(6, 6, 6), Seq(1, 17), Seq(vecs.size), Seq(3, 3, 3, 3, 3, 3)).foreach { slicing =>
      val histDir = java.nio.file.Files.createTempDirectory("vcur-hist").toString
      val ckpt = java.nio.file.Files.createTempDirectory("vcur-ckpt").toString
      val input = MemoryStream[(Long, Seq[Double])]
      val q = StreamingVectorCuration.nearDupAdmission(
        input.toDF().toDF("vec_id", "v"), histDir, tau, ckpt)
      try {
        var rest = vecs
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
        val admitted = StreamingVectorCuration.admittedVecs(spark, histDir)
          .select($"vec_id").as[Long].collect().toSet
        assert(admitted === expected, s"slicing=$slicing")
      } finally q.stop()
    }
  }

  test("seeded corpus suppresses stream near-copies; replay is idempotent") {
    import spark.implicits._
    val vecs = corpus
    val tau = 0.8
    val histDir = java.nio.file.Files.createTempDirectory("vcur-seed").toString
    val (seed, stream) = vecs.splitAt(10)
    StreamingVectorCuration.seedHistory(seed.toDF("vec_id", "v"), histDir)
    StreamingVectorCuration.admitBatch(stream.toDF("vec_id", "v"), histDir, tau, 0L)
    val admitted1 = StreamingVectorCuration.admittedVecs(spark, histDir)
      .select($"vec_id").as[Long].collect().toSet
    assert(admitted1 === keepFirst(vecs, tau))
    // replay of batch 0: history read excludes batch=0, so the result
    // is identical, not self-suppressed
    StreamingVectorCuration.admitBatch(stream.toDF("vec_id", "v"), histDir, tau, 0L)
    val admitted2 = StreamingVectorCuration.admittedVecs(spark, histDir)
      .select($"vec_id").as[Long].collect().toSet
    assert(admitted2 === admitted1)
  }

  test("admittedVecs on a fresh dir returns an empty frame, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("vcur-empty").toString
    assert(StreamingVectorCuration.admittedVecs(spark, dir).count() === 0)
  }
}
