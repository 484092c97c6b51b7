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

  test("m06 block near-dup: append/aligned-insert detected, 1-byte shift honestly missed") {
    import spark.implicits._
    def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")
    val A = "a" * 64; val B = "b" * 64; val C = "c" * 64; val D = "d" * 64
    val E = "e" * 64; val X = "x" * 64
    val payloads = Seq(
      1L -> bytes(A + B + C + D),       // base: blocks {A,B,C,D}
      2L -> bytes(A + B + C + D + E),   // appended copy: j = 4/5
      3L -> bytes(X + A + B + C + D),   // 64-aligned prefix insert: j = 4/5
      4L -> bytes("!" + A + B + C + D), // 1-byte shift: every block differs
      5L -> bytes(A + A + A + A)        // block-repeat degenerate: {A}, j = 1/4
    ).toDF("doc_id", "payload")
    val got = Multimodal.chunkNearDupPairs(payloads, 0.5)
      .select($"d1", $"d2", $"block_jaccard")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(math.abs(got((1L, 2L)) - 0.8) < 1e-12)
    assert(math.abs(got((1L, 3L)) - 0.8) < 1e-12)
    // the 1-byte shift (doc 4) shares no 64-aligned block with doc 1 —
    // the documented fixed-offset blind spot content-defined chunking
    // would close; if this starts matching, the blocking changed
  }

  test("m08 delta payload admission: standing dups dropped, in-batch dups kept once") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = operators.Multimodal.m08DeltaPayloads(spark, sf0001)
    val all = Tables.documents(spark, sf0001)
      .select($"doc_id", sha2(encode($"text", "utf-8"), 256).as("h"))
    val standing = all.filter($"doc_id" % 10 =!= 0)
      .select($"h").as[String].collect().toSet
    val rows = got.as[(Long, String)].collect()
    assert(rows.nonEmpty)
    // no admitted payload exists in the standing manifest
    assert(rows.forall { case (_, h) => !standing.contains(h) })
    // one row per distinct admitted hash, and it is the min delta id
    assert(rows.map(_._2).distinct.length === rows.length)
    val minByHash = all.filter($"doc_id" % 10 === 0)
      .groupBy($"h").agg(min($"doc_id").as("m"))
      .as[(String, Long)].collect().toMap
    assert(rows.forall { case (id, h) => minByHash(h) === id })
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

  test("m07 perceptual hash: identical=0, edits=low, different content=high hamming") {
    import spark.implicits._
    import graft.functions.BlockHash64
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = ("the quick brown fox jumps over the lazy dog " * 48).getBytes("UTF-8")
    assert(BlockHash64.compute(base.clone()) === BlockHash64.compute(base))
    // small in-place edit: a few words swapped mid-payload
    val edited = new String(base, "UTF-8")
      .replaceFirst("quick brown fox", "rapid brown fox").getBytes("UTF-8")
    val hEdit = ham(BlockHash64.compute(base), BlockHash64.compute(edited))
    assert(hEdit <= 7, s"small edit drifted $hEdit bits")
    // INSERTION — shifts every later byte; the octant histogram must
    // absorb it (a positional segment hash does not: measured 14-39
    // bits on fixture near-dups, see kernel scaladoc)
    val shifted = ("PREFIX STAMP 123 " + new String(base, "UTF-8")).getBytes("UTF-8")
    val hShift = ham(BlockHash64.compute(base), BlockHash64.compute(shifted))
    assert(hShift <= 7, s"insertion drifted $hShift bits")
    // different character composition → far away
    val other = ("zyxwvu polyphony rhythm gym xylophone quartz " * 48).getBytes("UTF-8")
    val hOther = ham(BlockHash64.compute(base), BlockHash64.compute(other))
    assert(hOther > 10, s"unrelated payload too close: $hOther bits")
    // balance property: at most 32 bits set (>= 32 values <= lower median)
    assert(java.lang.Long.bitCount(BlockHash64.compute(base)) <= 32)
    assert(BlockHash64.compute(Array.emptyByteArray) === 0L)
    // the banded pair join (codegen path) finds exactly the near trio
    val payloads = Seq(
      (1L, base), (2L, edited), (3L, shifted), (4L, other)
    ).toDF("doc_id", "payload")
    val pairs = operators.Multimodal.perceptualNearDupPairs(payloads, 7)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
    // fixture recall vs the exact-Jaccard ground truth: the perceptual
    // tier must see most text near-dups (measured 20/25 at <= 7, random
    // background min 11 — zero overlap on this corpus)
    val truth = operators.Dedup.d03NgramJaccard(spark, sf001)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val got = operators.Multimodal.m07PerceptualNearDup(spark, sf001)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.7, s"recall = $recall (${(truth & got).size}/${truth.size})")
  }

  test("m10 persisted payload index: probe ≡ m07 delta-touching, append leaves standing files untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val all = Tables.documents(spark, sf001)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    val standing = all.filter($"doc_id" % 10 =!= 0)
    val delta = all.filter($"doc_id" % 10 === 0)
    val got = operators.Multimodal.m10PayloadIndexProbe(spark, sf001)
      .as[(Long, Long, Int)].collect().toSet
    // ≡ m07 over the full corpus restricted to delta-touching pairs —
    // EXACT by pigeonhole coverage, not a recall bound
    val m07 = operators.Multimodal.m07PerceptualNearDup(spark, sf001)
      .as[(Long, Long, Int)].collect().toSet
    val touching = m07.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(got === touching, "probe diverges from m07's delta-touching pairs")
    assert(got.nonEmpty, "fixture delta must touch some perceptual pair")
    assert(m07.exists(p => p._1 % 10 != 0 && p._2 % 10 != 0),
      "fixture must also have old-old pairs the probe must NOT emit")
    // persisted round-trip: write half the standing set, append the
    // rest (standing files byte-untouched), probe ≡ in-plan rebuild
    val maxId = standing.agg(max($"doc_id")).head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("m10-idx").toString
    try {
      operators.Multimodal.writePayloadIndex(
        standing.filter($"doc_id" <= maxId / 2), dir)
      def dataFiles = {
        val b = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
        val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try st.forEach(p => if (p.toString.endsWith(".parquet")) b += p)
        finally st.close()
        b.map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p)).toMap
      }
      val before = dataFiles
      operators.Multimodal.appendToPayloadIndex(
        standing.filter($"doc_id" > maxId / 2), dir)
      val after = dataFiles
      assert(before.keySet.subsetOf(after.keySet), "append removed standing files")
      before.foreach { case (f, t) =>
        assert(after(f) == t, s"standing file $f was modified by append") }
      assert(after.size > before.size, "append wrote no new files")
      val served = operators.Multimodal.probePayloadIndex(spark, dir, delta, 7)
        .as[(Long, Long, Int)].collect().toSet
      assert(served === got, "persisted probe diverges from in-plan rebuild")
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("m09 payload decontamination: exact copy, perturbed variant, unrelated clean") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 48).getBytes("UTF-8")
    val stamped = ("PREFIX STAMP 123 " + new String(base, "UTF-8")).getBytes("UTF-8")
    val other = ("zyxwvu polyphony rhythm gym xylophone quartz " * 48).getBytes("UTF-8")
    // note: a REVERSED payload is perceptually near its original under
    // the octant-histogram hash (byte multisets per octant barely move)
    // — the second bench doc must differ in character composition
    val far = ("0123456789 abcdef binary blob header " * 48).getBytes("UTF-8")
    val bench = Seq((0L, base), (1L, far)).toDF("doc_id", "payload")
    val corpus = Seq(
      (100L, base.clone()), // byte-exact copy of bench 0
      (101L, stamped),      // re-encoded variant: perceptual hit, not byte hit
      (102L, other)         // clean
    ).toDF("doc_id", "payload")
    val got = operators.Multimodal.payloadDecontamination(corpus, bench, 7)
      .as[(Long, Option[Long], Option[Int], Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(100L, 101L, 102L), "full audit: one row per corpus doc")
    assert(got.filter(_._2._5).keySet === Set(100L, 101L),
      s"flag set wrong: ${got.filter(_._2._5).keySet}")
    assert(got(100L) === ((100L, Some(0L), Some(0), true, true)), s"got ${got(100L)}")
    assert(got(102L) === ((102L, None, None, false, false)), s"got ${got(102L)}")
    // the stamped variant: flagged perceptually (hamming may be 0 —
    // the octant histogram absorbs the insertion entirely, which is
    // the kernel's design) but NOT byte-exact — exactly the case the
    // independent sha signal exists to label
    val (_, b101, h101, ex101, fl101) = got(101L)
    assert(b101 === Some(0L) && h101.exists(_ <= 7) && !ex101 && fl101,
      s"variant must be a perceptual-only hit: ${got(101L)}")
  }

  test("m11 perceptual clusters: transitive chain collapses to min rep, unpaired absent") {
    import spark.implicits._
    // the m07 fixture trio (base, edited, shifted) is a transitive
    // chain; m11 must emit one component with rep = min doc_id and no
    // row for the unpaired payload — d08's contract over m07's edges
    val base = ("the quick brown fox jumps over the lazy dog " * 48).getBytes("UTF-8")
    val edited = new String(base, "UTF-8")
      .replaceFirst("quick brown fox", "rapid brown fox").getBytes("UTF-8")
    val shifted = ("PREFIX STAMP 123 " + new String(base, "UTF-8")).getBytes("UTF-8")
    val other = ("zyxwvu polyphony rhythm gym xylophone quartz " * 48).getBytes("UTF-8")
    val payloads = Seq(
      (7L, base), (3L, edited), (9L, shifted), (4L, other)
    ).toDF("doc_id", "payload")
    val pairs = operators.Multimodal.perceptualNearDupPairs(payloads, 7)
      .select($"d1", $"d2")
    val got = operators.Dedup.clusterPairs(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 3L), (7L, 3L), (9L, 3L)), got.toString)
    // registered entry agrees with CC over the registered m07 pairs
    val viaEntry = operators.Multimodal.m11PerceptualClusters(spark, sf001)
      .as[(Long, Long)].collect().toSet
    val viaPairs = operators.Dedup.clusterPairs(
      operators.Multimodal.m07PerceptualNearDup(spark, sf001).select($"d1", $"d2"))
      .as[(Long, Long)].collect().toSet
    assert(viaEntry === viaPairs && viaEntry.nonEmpty)
  }

  test("m12 CDC chunking: insertion re-synchronizes boundaries where fixed blocks collapse") {
    import spark.implicits._
    // varied (non-periodic) content: exactly-periodic payloads are
    // CDC's documented pathological case (only `period` distinct
    // rolling contexts — if none hits the mask every cut is a maxLen
    // force-cut and the operator degrades to fixed blocking; that
    // corpus shape belongs to m07's perceptual tier)
    val base = ((1 to 400).map(i => s"tok$i word${i * 7 % 13}").mkString(" "))
      .getBytes("UTF-8")
    // ONE prepended byte: the worst case for a fixed grid — every
    // 64-byte block boundary shifts, shared fixed blocks collapse to
    // ~0; CDC boundaries re-synchronize after the first chunk
    val shifted = ("X" + new String(base, "UTF-8")).getBytes("UTF-8")
    val other = ((1 to 400).map(i => s"zz${i * 31 % 97}q${i}")).mkString(" ")
      .getBytes("UTF-8")
    val payloads = Seq((1L, base), (2L, shifted), (3L, other))
      .toDF("doc_id", "payload")
    val fixed = operators.Multimodal.chunkNearDupPairs(payloads, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val cdc = operators.Multimodal.cdcNearDupPairs(payloads, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(!fixed.contains((1L, 2L)),
      "fixed 64-byte grid should lose the shifted pair (else this fixture is not load-bearing)")
    assert(cdc.contains((1L, 2L)), s"CDC lost the shifted near-dup: $cdc")
    assert(!cdc.contains((1L, 3L)) && !cdc.contains((2L, 3L)),
      s"CDC matched unrelated payloads: $cdc")
    // kernel determinism + coverage: same bytes -> same chunk set;
    // chunks respect min/max bounds (16..256) and cover the payload
    val mask = (1L << 10) | (1L << 12) | (1L << 14) | (1L << 16) |
      (1L << 18) | (1L << 20)
    val hs1 = graft.functions.GearChunkHashes.compute(base.clone(), mask, 16, 256)
    val hs2 = graft.functions.GearChunkHashes.compute(base, mask, 16, 256)
    assert(hs1.array.toSeq === hs2.array.toSeq)
    assert(graft.functions.GearChunkHashes.compute(Array.emptyByteArray, mask, 16, 256)
      .array.isEmpty)
    // the spans sibling: same cut points (hash lane identical), lengths
    // within [min, max], and their sum covers the payload exactly when
    // no within-payload chunk repeats (dedup drops repeat lengths too)
    val spans = graft.functions.GearChunkHashes.computeSpans(base, mask, 16, 256)
    val sh = spans.getArray(0).toLongArray.toSeq
    val sl = spans.getArray(1).toIntArray.toSeq
    assert(sh === hs1.array.toSeq, "spans' hash lane diverges from GearChunkHashes")
    assert(sl.forall(l => l >= 1 && l <= 256))
    assert(sl.sum <= base.length)
    if (sh == sh.distinct) assert(sl.sum === base.length, "spans must tile the payload")
  }

  test("m13 storage dedup report: hand-computed byte masses and ratio") {
    import spark.implicits._
    // srcA: two identical 128-byte payloads + one distinct 64-byte one
    //   total = 320 B over 3 payloads; distinct blocks: the dup's two
    //   64-B blocks + the loner's one → unique = 192 B → ratio 1.666667
    // srcB: one 100-byte payload → blocks 64+36 → unique = total = 100
    val a = ("A" * 64) + ("B" * 64)
    val rows = operators.Multimodal.m13StorageDedup _
    val df = Seq(
      (1L, a, "srcA"), (2L, a, "srcA"), (3L, "C" * 64, "srcA"),
      (4L, ("D" * 100), "srcB"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("m13fix").toString
    try {
      df.write.parquet(s"$dir/documents.parquet")
      val got = rows(spark, dir).collect()
        .map(r => r.getString(0) -> r).toMap
      val sa = got("srcA")
      assert(sa.getLong(1) === 3L && sa.getLong(2) === 320L)
      assert(sa.getLong(3) === 3L && sa.getLong(4) === 192L)
      assert(sa.getDouble(5) === 1.666667)
      val sb = got("srcB")
      assert(sb.getLong(2) === 100L && sb.getLong(4) === 100L &&
        sb.getDouble(5) === 1.0)
      // corpus row: 420 B over blocks {A64,B64,C64,D64,D36} = 292 B
      val all = got("*")
      assert(all.getLong(1) === 4L && all.getLong(2) === 420L)
      assert(all.getLong(3) === 5L && all.getLong(4) === 292L)
      assert(all.getDouble(5) === 1.438356)
    } finally graft.BenchUtil.rmTree(dir)
  }

  test("payload collapse: mass-duplicated payload reconstructs every member pair exactly") {
    import spark.implicits._
    // 1000 byte-identical copies of one payload + a near-dup variant +
    // an unrelated payload: the collapse must keep the candidate join
    // at ONE row per distinct-payload pair while the expanded answer
    // carries the full member-pair truth
    val base = (1 to 200).map(i => s"asset$i b${i * 3 % 17}").mkString(" ")
    val near = (base + " trailing-stamp-bytes " + ("pad" * 30)).getBytes("UTF-8")
    val other = (1 to 200).map(i => s"zz${i * 31 % 97}q$i").mkString(" ")
      .getBytes("UTF-8")
    val copies = (0L until 1000L).map(i => (i, base.getBytes("UTF-8")))
    val payloads = (copies ++ Seq((2000L, near), (3000L, other)))
      .toDF("doc_id", "payload")
    Seq[(String, org.apache.spark.sql.DataFrame)](
      "m06" -> operators.Multimodal.chunkNearDupPairs(payloads, 0.5),
      "m12" -> operators.Multimodal.cdcNearDupPairs(payloads, 0.5)
    ).foreach { case (tag, pairsDf) =>
      val rows = pairsDf.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val unit = rows.filter { case (d1, d2, _) => d1 < 1000 && d2 < 1000 }
      assert(unit.length === 1000 * 999 / 2, s"$tag: unit pair count")
      assert(unit.forall(_._3 == 1.0), s"$tag: unit pairs must score exactly 1.0")
      assert(rows.forall { case (d1, d2, _) => d1 < d2 }, s"$tag: ordering")
      assert(rows.length === rows.distinct.length, s"$tag: duplicate pairs")
      // the near-dup variant pairs with EVERY copy at one common score
      val nearScores = rows.filter(_._2 == 2000L).map(_._3).distinct
      if (nearScores.nonEmpty) {
        assert(rows.count(_._2 == 2000L) === 1000, s"$tag: near-dup expansion")
        assert(nearScores.length === 1, s"$tag: cross-group score must be uniform")
      }
      assert(!rows.exists(r => r._1 == 3000L || r._2 == 3000L),
        s"$tag: unrelated payload paired")
    }
    // the near-dup is a genuine pair on at least the CDC path (append-
    // robust); without it the expansion half of the fixture is inert
    val cdcRows = operators.Multimodal.cdcNearDupPairs(payloads, 0.5)
      .filter($"d2" === 2000L).count()
    assert(cdcRows === 1000L, "CDC lost the appended near-dup variant")
  }

  test("chunk df-cap: flooded chunk values leave the Jaccard universe with documented drop semantics") {
    import spark.implicits._
    def blk(c: Char): Array[Byte] = Array.fill(64)(c.toByte)
    // 100 DISTINCT payloads sharing one 64-byte boilerplate block
    // (df 100 > 64) with unique tails; x/y additionally share a
    // PRIVATE block S (df 2). With the cap: pairs among the 100 share
    // only the flooded block -> not emitted; x keeps {S}, y keeps
    // {S, U_y} -> jaccard exactly 1/2
    val flood = blk('P')
    val s = blk('S')
    val hundred = (0L until 100L).map(i =>
      (i, flood ++ (s"uniq$i-" * 20).getBytes("UTF-8").take(64)
        ++ s"tail$i".getBytes("UTF-8")))
    val x = (500L, flood ++ s)
    val y = (501L, flood ++ s ++ blk('Y'))
    val payloads = (hundred ++ Seq(x, y)).toDF("doc_id", "payload")
    val capped = operators.Multimodal.chunkNearDupPairs(payloads, 0.2, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.map(t => (t._1, t._2)).toSet === Set((500L, 501L)),
      s"capped pair set: ${capped.toSeq}")
    assert(capped.head._3 === 0.5, "jaccard over the SURVIVING universe")
    // uncapped, the flooded block alone makes ~C(100,2) boilerplate
    // pairs — exactly the storm the cap drops
    val uncapped = operators.Multimodal.chunkNearDupPairs(payloads, 0.2, maxDf = 0L)
      .count()
    assert(uncapped >= 100L * 99L / 2, s"uncapped boilerplate pairs: $uncapped")
    // same contract on the CDC path: shared-prefix chunks flood (df
    // ~102 > 64) and leave the universe; only the x/y pair (private
    // shared run S) survives any positive threshold
    val longFlood = ((1 to 80).map(i => s"hdr$i c${i * 5 % 11}").mkString(" "))
      .getBytes("UTF-8") // ~600 varied bytes -> several shared chunks
    val longS = ((1 to 40).map(i => s"sec$i v${i * 7 % 13}").mkString(" "))
      .getBytes("UTF-8")
    val cdcHundred = (0L until 100L).map { i =>
      // fully unique pseudorandom tails: any chunk shared between two
      // of these docs could only come from the flooded prefix
      val rnd = new scala.util.Random(1000 + i)
      (i, longFlood ++ Array.fill(120)((rnd.nextInt(26) + 'a').toByte))
    }
    val cdcPayloads = (cdcHundred ++ Seq(
      (500L, longFlood ++ longS), (501L, longFlood ++ longS ++ blk('Y'))))
      .toDF("doc_id", "payload")
    val cdcCapped = operators.Multimodal.cdcNearDupPairs(cdcPayloads, 0.05, maxDf = 64)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(cdcCapped === Set((500L, 501L)), s"cdc capped pair set: $cdcCapped")
    val cdcUncapped = operators.Multimodal.cdcNearDupPairs(cdcPayloads, 0.05, maxDf = 0L)
      .count()
    assert(cdcUncapped >= 100L * 99L / 2, s"cdc uncapped pairs: $cdcUncapped")
  }

  test("m15: byte profile on hand payloads — constant, binary, and mixed bytes") {
    import spark.implicits._
    val payloads = Seq(
      (1L, Array[Byte](65, 65, 65, 65)),              // "AAAA"
      (2L, Array[Byte](0, 1, 2, 3)),                  // pure binary junk
      (3L, Array[Byte](65, 66, 0, 0))                 // half printable
    ).toDF("doc_id", "payload")
    val rows = Multimodal.byteProfile(payloads)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L) === ((1L, 4L, 1L, 1.0, 1.0)))
    assert(rows(2L) === ((2L, 4L, 4L, 0.25, 0.0)))
    assert(rows(3L) === ((3L, 4L, 3L, 0.5, 0.5)))
  }

  test("m17: transfer estimate reconciles with an independent chunk-set recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Multimodal.m17SnapshotTransfer(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.contains("*") && rows.size > 1)
    rows.values.foreach { r =>
      val (nb, db, nvb) = (r.getLong(1), r.getLong(3), r.getLong(5))
      assert(nvb >= 0 && nvb <= db && db <= nb,
        s"${r.getString(0)}: novel $nvb / distinct $db / new $nb out of order")
      assert(math.abs(r.getDouble(6) - nvb.toDouble / db) < 1e-6)
      assert(math.abs(r.getDouble(7) - (1.0 - nvb.toDouble / nb)) < 1e-6)
    }
    // independent recompute of the '*' numbers with the same kernel but
    // a different aggregation path (local sets instead of joins)
    val docs = Tables.documents(spark, sf0001)
    def spansOf(df: org.apache.spark.sql.DataFrame) = df
      .filter(length($"payload") > 0)
      .select(graft.functions.GearChunkSpans($"payload", Multimodal.GearMask, 16, 256).as("sp"))
      .select(explode(arrays_zip($"sp.h", $"sp.len")).as("z"))
      .select($"z.h".as("ck"), $"z.len".cast("long").as("len"))
      .as[(Long, Long)].collect()
    val oldSet = spansOf(docs.filter($"doc_id" % 10 =!= 0)
      .select(encode(when($"doc_id" % 10 === 5, concat($"text", lit(" [stale rev]")))
        .otherwise($"text"), "utf-8").as("payload"))).map(_._1).toSet
    val newChunks = spansOf(docs.filter($"doc_id" % 10 =!= 1)
      .select(encode($"text", "utf-8").as("payload"))).distinct
    val star = rows("*")
    assert(star.getLong(2) === newChunks.length.toLong, "distinct chunk count")
    assert(star.getLong(3) === newChunks.map(_._2).sum, "distinct chunk bytes")
    val novel = newChunks.filterNot(c => oldSet(c._1))
    assert(star.getLong(4) === novel.length.toLong, "novel chunk count")
    assert(star.getLong(5) === novel.map(_._2).sum, "novel chunk bytes")
    // the snapshot pair shares most content: real savings must show
    assert(star.getDouble(7) > 0.5, "expected high transfer savings")
    assert(star.getLong(5) > 0, "edits/additions must produce novel bytes")
  }

  test("m16: sniff matrix reconciles exactly with the planted mislabel rule") {
    import spark.implicits._
    val ids = Tables.documents(spark, sf0001)
      .select($"doc_id").as[Long].collect()
    val types = Array("png", "jpeg", "riff", "raw")
    // local ground truth of the planting rule
    val expected = ids.groupBy { id =>
      val dec = types((id % 4).toInt)
      val sn  = if (id % 17 == 0) types(((id % 4 + 1) % 4).toInt) else dec
      (dec, sn)
    }.map { case (k, v) => k -> v.length.toLong }
    val got = Multimodal.m16ModalitySniff(spark, sf0001)
      .select($"declared", $"sniffed", $"n_payloads", $"mismatch").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet === expected.keySet, "confusion-matrix cells")
    expected.foreach { case (cell, n) =>
      assert(got(cell)._1 === n, s"cell $cell count")
      assert(got(cell)._2 === (cell._1 != cell._2), s"cell $cell mismatch flag")
    }
    // the fixture must exercise BOTH planes: clean diagonal + mislabels
    assert(expected.keys.exists { case (a, b) => a == b })
    assert(expected.keys.exists { case (a, b) => a != b },
      "no mislabeled rows planted — the audit is vacuous")
  }

}
