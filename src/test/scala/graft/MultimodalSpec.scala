package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("m01 metadata is deterministic, in range, and row-complete") {
    import spark.implicits._
    val n = Tables.documents(spark, sf0001).count()
    val a = Multimodal.m01MultimodalMeta(spark, sf0001)
    assert(a.count() === n)
    val bad = a.filter(
      $"width" < 1 || $"width" > 1280 ||
      $"height" < 1 || $"height" > 720 ||
      $"channels" < 1 || $"channels" > 3 ||
      $"n_pixels" =!= $"width" * $"height" * $"channels")
    assert(bad.count() === 0)
    // determinism: run twice, same result hash
    val h1 = a.orderBy("doc_id").collect().toSeq
    val h2 = Multimodal.m01MultimodalMeta(spark, sf0001).orderBy("doc_id").collect().toSeq
    assert(h1 === h2)
  }

  test("batched decode: per-partition codec, row-complete, deterministic checksums") {
    import spark.implicits._
    val out = Multimodal.decodeBatched(spark, sf0001)
    val n = Tables.documents(spark, sf0001).count()
    assert(out.count() === n)
    // checksum must match a per-row recomputation (codec reuse across
    // the partition must not leak state between rows)
    val direct = Tables.documents(spark, sf0001)
      .select($"doc_id", encode($"text", "utf-8").as("p"))
      .as[(Long, Array[Byte])].collect()
      .map { case (id, p) =>
        val c = new java.util.zip.CRC32(); c.update(p); id -> c.getValue
      }.toMap
    val batched = out.collect().map(r => r.doc_id -> r.checksum).toMap
    assert(batched === direct)
  }

  test("m03 chunking reassembles to original length") {
    import spark.implicits._
    val chunks = Multimodal.m03ChunkSample(spark, sf0001)
      .groupBy($"doc_id")
      .agg(sum($"chunk_len").as("total"), max($"chunk_len").as("max_len"))
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", length($"text").as("n"))
    val mismatch = chunks.join(docs, "doc_id")
      .filter($"total" =!= $"n" || $"max_len" > 100)
    assert(mismatch.count() === 0)
  }
}
