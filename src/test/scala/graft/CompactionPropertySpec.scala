package graft

import java.nio.file.Files

import graft.ingest.{BulkAction, EsSimCompact, EsSimStore, FileEsBulkClient}

/** Property test for the in-place compaction invariant: under any
  * interleaving of upsert writes and [[EsSimCompact.inPlace]] runs, the
  * directory's upsert-resolved state equals a last-write-wins map model.
  * This is the replay-ordering contract the compacted-file name pinning
  * (newest input's micros + z-leading client id) exists to preserve —
  * a compacted file must override everything it folded and be
  * overridden by anything written after it. */
class CompactionPropertySpec extends SparkSpec {

  test("random write/compact interleavings resolve to the last-write-wins model") {
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(4000 + seed)
      val dir = Files.createTempDirectory(s"escomp-prop-$seed").toString
      val model = scala.collection.mutable.Map.empty[String, String]
      var version = 0
      (0 until 12).foreach { step =>
        if (step > 0 && rnd.nextInt(3) == 0) {
          // maintenance between "batches" — exactly Main's cadence
          EsSimCompact.inPlace(spark, dir, maxActions = 50, graceMs = 3600000)
        } else {
          // a batch of random upserts over a small id space (collisions
          // are the point: last write must win across compactions)
          val client = new FileEsBulkClient(dir)
          val batch = (0 until 5 + rnd.nextInt(20)).map { _ =>
            val id = rnd.nextInt(15).toString
            version += 1
            val ts = f"2024-01-01 00:${(version / 60) % 60}%02d:${version % 60}%02d.000000"
            id -> s"""{"id":$id,"ts":"$ts","v":$version}"""
          }
          // in-batch order matters too: later action in the same file wins
          batch.foreach { case (id, src) => model(id) = src }
          client.bulk(batch.map { case (id, src) => BulkAction("idx", id, src) })
          // wall-clock micro ticks separate file names across clients
          Thread.sleep(2)
        }
      }
      val got = EsSimStore.read(spark, dir).collect()
        .map(r => r.getString(1) -> r.getString(2)).toMap
      assert(got === model.toMap, s"seed=$seed")
    }
  }
}
