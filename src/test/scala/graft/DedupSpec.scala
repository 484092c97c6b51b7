package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Non-oracled dedup semantics: MinHash-vs-exact-Jaccard agreement and
  * SimHash recall against the exact ground truth. */
class DedupSpec extends SparkSpec {

  private def exactPairs(sf: String): Set[(Long, Long)] =
    Dedup.d03NgramJaccard(spark, sf)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH finds exactly the exact-Jaccard >= 0.8 pairs") {
    val exact = exactPairs(sf001)
    val lsh = Dedup.d04MinhashLsh(spark, sf001)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact)
  }

  test("minhash signature estimates Jaccard within tolerance on near-dup pairs") {
    import spark.implicits._
    val sh = Tables.documents(spark, sf001)
      .select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
      .filter(size($"sh") > 0)
      .select($"doc_id", $"sh", Dedup.minhashSignature($"sh").as("sig"))
    val exact = Dedup.d03NgramJaccard(spark, sf001)
      .select("d1", "d2", "jaccard").collect()
    assert(exact.nonEmpty)
    val byId = sh.select($"doc_id", $"sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    exact.foreach { r =>
      val (d1, d2, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (s1, s2) = (byId(d1), byId(d2))
      val est = s1.zip(s2).count { case (a, b) => a == b }.toDouble / s1.size
      assert(math.abs(est - j) < 0.15, s"pair ($d1,$d2): est=$est exact=$j")
    }
  }

  test("simhash hamming <= 5 pairs cover the exact near-dup pairs, few extras") {
    val exact = exactPairs(sf001)
    val sim = Dedup.d05Simhash(spark, sf001)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.95, s"simhash recall $recall over ${exact.size} true pairs")
    assert(sim.size <= exact.size * 3 + 10, s"simhash precision blowup: ${sim.size} pairs")
  }

  test("shared pair frame: d08/d09 over precomputed pairs equal standalone forms") {
    import spark.implicits._
    // the pipeline form: materialize the d03 join ONCE, feed clusters
    // and cross-modal QA from it — results must be identical to each
    // operator recomputing the join itself
    val pairs = Dedup.ngramJaccardPairs(graft.Tables.documents(spark, sf001), 0.8).cache()
    try {
      val clustersShared = Dedup.d08DedupClusters(spark, sf001, Some(pairs))
        .as[(Long, Long)].collect().toSet
      val clustersAlone = Dedup.d08DedupClusters(spark, sf001)
        .as[(Long, Long)].collect().toSet
      assert(clustersShared === clustersAlone)
      val xmShared = graft.operators.Curation.d09CrossModal(spark, sf001, Some(pairs))
        .collect().map(_.toSeq).toSet
      val xmAlone = graft.operators.Curation.d09CrossModal(spark, sf001)
        .collect().map(_.toSeq).toSet
      assert(xmShared === xmAlone)
    } finally pairs.unpersist()
  }

  test("c05 leakage-safe split: no near-dup pair straddles splits, all docs covered") {
    import spark.implicits._
    val split = graft.operators.Curation.c05LeakageSafeSplit(spark, sf001)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // total coverage, one split per doc
    assert(split.size === Tables.documents(spark, sf001).count())
    // the contract t09's per-doc split cannot give: both endpoints of
    // every J >= 0.8 pair land in the SAME split
    val pairs = Dedup.ngramJaccardPairs(
        Tables.documents(spark, sf001).select($"doc_id", $"text"), 0.8)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) === split(b), s"pair ($a,$b) straddles ${split(a)}/${split(b)}")
    }
    // and t09's split DOES violate it on this fixture (the reason c05
    // exists) — if this ever stops holding, the fixture lost its
    // cross-bucket near-dups and the test above went vacuous
    def bucket(id: Long) = (id * 2654435761L) % 100
    assert(pairs.exists { case (a, b) =>
      (bucket(a) < 90) != (bucket(b) < 90) ||
      (bucket(a) < 95) != (bucket(b) < 95) })
  }

  test("c05 pairs overload: a shared pair frame yields the identical split") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val alone = graft.operators.Curation.leakageSafeSplit(docs, 0.8)
      .as[(Long, Long, String)].collect().toSet
    // a pipeline shares the materialized collapsed pair graph (the d10
    // economics: corpus shingle join runs once) ...
    val graph = Dedup.collapsedPairGraph(docs, 0.8).cache()
    try {
      val viaGraph = graft.operators.Curation.leakageSafeSplit(docs, graph)
        .as[(Long, Long, String)].collect().toSet
      assert(viaGraph === alone)
      // ... and the fully-expanded d03 pair frame works identically
      // (same connected components, more edges)
      val expanded = Dedup.ngramJaccardPairs(docs, 0.8)
      val viaPairs = graft.operators.Curation.leakageSafeSplit(docs, expanded)
        .as[(Long, Long, String)].collect().toSet
      assert(viaPairs === alone)
    } finally graph.unpersist()
  }

  test("c06 split audit: c05's cluster split audits clean, the per-doc hash split does not") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    // the split c05 BUILT to be leakage-free must audit empty...
    val safe = graft.operators.Curation.c05LeakageSafeSplit(spark, sf001)
      .select($"doc_id", $"split")
    val safeViolations = graft.operators.Curation
      .splitAuditPairs(docs, safe, 0.8).count()
    assert(safeViolations === 0L)
    // ...and the naive per-doc hash split must NOT (else the audit —
    // and c05's reason to exist — went vacuous on this fixture)
    val naiveViolations = graft.operators.Curation
      .c06SplitAudit(spark, sf001).count()
    assert(naiveViolations > 0L)
  }

  test("d14 containment: catches verbatim inclusion Jaccard misses; matches brute force") {
    import spark.implicits._
    // planted case: a 12-token quote embedded verbatim in an 80-token
    // document — containment 1.0, symmetric Jaccard ≈ 0.11
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val long = quote + " " + (1 to 80).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, long), (3L, other)).toDF("doc_id", "text")
    val planted = Dedup.containmentPairs(docs, 0.9)
      .select($"inner_id", $"outer_id", $"containment").collect()
    assert(planted.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(planted.head.getDouble(2) === 1.0)
    val jac = Dedup.ngramJaccardPairs(docs, 0.05)
      .filter($"d1" === 1L && $"d2" === 2L).select($"jaccard").collect()
    assert(jac.nonEmpty && jac.head.getDouble(0) < 0.2,
      "inclusion pair should score far below any usable Jaccard threshold")
    // prefix-filtered join ≡ brute-force all-pairs containment on the
    // real fixture (recall proof for the one-sided prefix theorem)
    val corpus = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val sh = corpus.select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
      .filter(size($"sh") > 0)
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" =!= $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("o"),
        (size(array_intersect($"a.sh", $"b.sh")).cast("double") /
          size($"a.sh")).as("c"))
      .filter($"c" >= 0.9)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    val got = Dedup.containmentPairs(corpus, 0.9)
      .select($"inner_id", $"outer_id").as[(Long, Long)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty, "fixture should contain containment pairs")
  }

  test("d15 substring spans: maximal cross-doc spans, internal repetition excluded") {
    import spark.implicits._
    // planted case: a 20-token boilerplate block pasted into two
    // otherwise-unrelated documents (Jaccard far below any threshold),
    // a third doc that repeats an 8-token phrase internally (must NOT
    // flag: repetition, not duplication), and a clean doc
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val docA = (1 to 30).map(i => s"a$i").mkString(" ") + " " + boiler
    val docB = boiler + " " + (1 to 30).map(i => s"c$i").mkString(" ")
    val docC = phrase + " x1 x2 x3 " + phrase // internal repeat only
    val docD = (1 to 25).map(i => s"d$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, 8)
      .select($"doc_id", $"span_start", $"span_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the shared 20-token run comes back as ONE maximal span per doc:
    // tokens 30..49 in A (after its 30 unique tokens), 0..19 in B
    assert(spans === Set((1L, 30L, 20L), (2L, 0L, 20L)), spans.toString)
    // verify Jaccard really is blind to this pair at dedup thresholds
    val j = Dedup.ngramJaccardPairs(docs.filter($"doc_id" <= 2), 0.05)
      .select($"jaccard").collect()
    assert(j.forall(_.getDouble(0) < 0.5),
      "planted pair must be invisible to set similarity at dedup thresholds")
    // window count arithmetic: a 20-token run at k=8 is 13 windows
    val nw = Dedup.substringSpans(docs, 8)
      .select($"n_windows").collect().map(_.getLong(0)).toSet
    assert(nw === Set(13L))
    // fixture sanity: the real corpus has cross-doc spans (planted
    // near-dups share long runs) and the operator finds them
    val corpus = Tables.documents(spark, sf001).select($"doc_id", $"text")
    assert(Dedup.substringSpans(corpus, 8).count() > 0)
  }

  test("d18 substring removal: owner keeps, copies excised, edges pinned") {
    import spark.implicits._
    // same planted family as the d15 spec: the 20-token boilerplate in
    // A (owner: smallest doc_id) and B; C repeats a phrase internally
    // (never flagged — repetition, not duplication); D is clean; E is
    // nothing BUT the boilerplate (full removal); F is shorter than
    // the window (untouchable)
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val aHead = (1 to 30).map(i => s"a$i").mkString(" ")
    val bTail = (1 to 30).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, aHead + " " + boiler),
      (2L, boiler + " " + bTail),
      (3L, phrase + " x1 x2 x3 " + phrase),
      (4L, (1 to 25).map(i => s"d$i").mkString(" ")),
      (5L, boiler),
      (6L, "s1 s2 s3")).toDF("doc_id", "text")
    val got = Dedup.dedupSubstrings(docs, 8)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    def sha(t: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // A owns the boilerplate (doc_id 1 < 2, 5): keeps everything
    assert(got(1L) === (1L, 50L, 50L, 0L, sha(aHead + " " + boiler)))
    // B and E hold foreign-owned copies: the block is excised whole
    assert(got(2L) === (2L, 50L, 30L, 20L, sha(bTail)))
    assert(got(5L) === (5L, 20L, 0L, 20L, sha("")))
    // internal repetition, clean docs, and short docs are untouched
    assert(got(3L) === (3L, 19L, 19L, 0L, sha(phrase + " x1 x2 x3 " + phrase)))
    assert(got(4L)._4 === 0L)
    assert(got(6L) === (6L, 3L, 3L, 0L, sha("s1 s2 s3")))
    // removal is idempotent here: after excising B's and E's copies
    // only the owner still holds the block, so a second pass over the
    // cleaned corpus finds nothing cross-doc-duplicated
    val cleaned = Seq(
      (1L, aHead + " " + boiler), (2L, bTail),
      (3L, phrase + " x1 x2 x3 " + phrase),
      (4L, (1 to 25).map(i => s"d$i").mkString(" ")), (6L, "s1 s2 s3"))
      .toDF("doc_id", "text")
    val again = Dedup.dedupSubstrings(cleaned, 8)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(again.forall(_._4 == 0L), "second pass removed more — not idempotent")
  }

  test("d21 persisted LSH index: probe ≡ in-plan rebuild ≡ d11, append leaves standing files untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val standing = docs.filter($"doc_id" % 10 =!= 0)
    val delta = docs.filter($"doc_id" % 10 === 0)
    val rebuilt = Dedup.d21LshIndexProbe(spark, sf001)
      .as[(Long, Long, Double)].collect().toSet
    // same answer as the prefix-join delta probe (d11): two machineries,
    // one contract — the delta-touching J ≥ τ pair set
    val viaPrefix = Dedup.deltaNearDupPairs(standing, delta, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(rebuilt === viaPrefix, "LSH probe diverges from the prefix-join probe")
    assert(rebuilt.nonEmpty, "fixture delta must touch some pair")
    val maxId = standing.agg(max($"doc_id")).head().getLong(0)
    for (frac <- Seq(0.5, 0.9)) {
      val boundary = (maxId * frac).toLong
      val dir = java.nio.file.Files.createTempDirectory("d21-idx").toString
      try {
        Dedup.writeLshIndex(standing.filter($"doc_id" <= boundary), dir)
        def dataFiles = {
          val b = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
          val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          try st.forEach(p => if (p.toString.endsWith(".parquet")) b += p)
          finally st.close()
          b.map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p))
            .toMap
        }
        val before = dataFiles
        Dedup.appendToLshIndex(standing.filter($"doc_id" > boundary), dir)
        val after = dataFiles
        assert(before.keySet.subsetOf(after.keySet),
          "append rewrote or removed standing index files")
        before.foreach { case (f, t) =>
          assert(after(f) == t, s"standing file $f was modified by append")
        }
        assert(after.size > before.size, "append wrote no new files")
        val served = Dedup.probeLshIndex(spark, dir, delta, 0.8, 1000)
          .as[(Long, Long, Double)].collect().toSet
        assert(served === rebuilt,
          s"persisted probe diverges from rebuild at boundary fraction $frac")
      } finally graft.BenchUtil.rmTree(dir)
    }
  }

  test("d20 intra-doc repetition: first copy survives, later copies excised, cross-doc dups ignored") {
    import spark.implicits._
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      // d18's doc-3 complement: the internal repeat d18 deliberately
      // keeps is exactly what d20 excises — second copy starts at pos
      // 11 ≥ 0 + 8, its single exact window is the island
      (3L, phrase + " x1 x2 x3 " + phrase),
      // cross-doc duplication is NOT d20's business (no intra repeat)
      (1L, (1 to 30).map(i => s"a$i").mkString(" ") + " " + boiler),
      (2L, boiler + " " + (1 to 30).map(i => s"c$i").mkString(" ")),
      (4L, (1 to 25).map(i => s"d$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.intraDocRepeatRemoval(docs, 8)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    def sha(t: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(3L) === (3L, 19L, 11L, 8L, sha(phrase + " x1 x2 x3")))
    assert(got(1L)._4 === 0L && got(2L)._4 === 0L && got(4L)._4 === 0L,
      "cross-doc duplication must be untouched — that is d18's job")

    // periodic text at the registered k=2: echoes of the first copy
    // within < k of it are not flagged themselves, but the flagged
    // non-overlapping repeats island over them — one span cuts the
    // whole tail, the first period survives
    val periodic = Seq((7L, "r1 r2 r1 r2 r1 r2 r1 r2")).toDF("doc_id", "text")
    val p = Dedup.intraDocRepeatRemoval(periodic, 2)
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(p === (7L, 8L, 2L, 6L, sha("r1 r2")))

    // and the registered fixture entry is load-bearing, not vacuous:
    // the sf0.01 corpus carries real intra-doc bigram repeats
    val fixture = Dedup.d20IntraDocRepeats(spark, sf001)
      .as[(Long, Long, Long, Long, String)].collect()
    val touched = fixture.count(_._4 > 0L)
    assert(touched >= 300, s"only $touched docs excised — prune not load-bearing")
  }

  test("d19 delta substring removal: standing owns, delta cleaned, delta-internal dups kept") {
    import spark.implicits._
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val standing = Seq(
      (1L, (1 to 30).map(i => s"a$i").mkString(" ") + " " + boiler),
      (2L, (1 to 25).map(i => s"s$i").mkString(" "))).toDF("doc_id", "text")
    val novel = (1 to 30).map(i => s"n$i").mkString(" ")
    val deltaDup = (1 to 12).map(i => s"z$i").mkString(" ")
    val delta = Seq(
      (10L, boiler + " " + novel),     // standing block → excised
      (11L, novel),                    // windows shared with doc 10 only — NOT standing → kept
      (12L, deltaDup),                 // delta-internal dup pair...
      (13L, deltaDup),                 // ...both kept (standing doesn't own them)
      (14L, "t1 t2 t3")).toDF("doc_id", "text") // short → untouched
    val got = Dedup.deltaSubstringRemoval(standing, delta, 8)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    def sha(t: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.keySet === Set(10L, 11L, 12L, 13L, 14L),
      "output must cover exactly the delta")
    assert(got(10L) === (10L, 50L, 30L, 20L, sha(novel)))
    assert(got(11L) === (11L, 30L, 30L, 0L, sha(novel)))
    assert(got(12L) === (12L, 12L, 12L, 0L, sha(deltaDup)))
    assert(got(13L) === (13L, 12L, 12L, 0L, sha(deltaDup)))
    assert(got(14L) === (14L, 3L, 3L, 0L, sha("t1 t2 t3")))
    // composition with d18: delta-cleaning then treating the union as
    // standing leaves nothing standing-owned in a replayed delta
    val replay = Dedup.deltaSubstringRemoval(
      standing.unionByName(Seq((10L, novel)).toDF("doc_id", "text")),
      Seq((20L, boiler + " x9 " + boiler)).toDF("doc_id", "text"), 8)
      .as[(Long, Long, Long, Long, String)].collect()
    // both boiler copies in the new doc are standing-owned → only the
    // lone separator token survives
    assert(replay.head._3 === 1L && replay.head._5 === sha("x9"))
    // the production seam: the standing window set persisted to parquet
    // and reloaded must clean the delta identically
    val setDir = java.nio.file.Files.createTempDirectory("d19-set").toString
    try {
      Dedup.substringWindowSet(standing, 8)
        .write.mode("overwrite").parquet(setDir)
      val viaSet = Dedup.deltaSubstringRemovalWithSet(
          spark.read.parquet(setDir), delta, 8)
        .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
      assert(viaSet === got, "persisted-set path diverges from inline path")
    } finally graft.BenchUtil.rmTree(setDir)
  }

  test("dedup is idempotent: d01 over its own survivors is identity") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001)
    val kept = Dedup.d01ExactDedup(spark, sf001).select($"keep_id")
    val deduped = docs.join(kept, docs("doc_id") === kept("keep_id"))
    // re-dedup the survivors: every group must have exactly one member
    val again = deduped.groupBy(sha2($"text", 256)).count().filter($"count" > 1)
    assert(again.count() === 0)
  }

  test("d16 bloom decontamination: identical to d07 on the fixture (no false negatives)") {
    import spark.implicits._
    val exact = operators.Curation.d07Decontamination(spark, sf001)
      .as[(Long, Long, Long)].collect().toSet
    val bloom = operators.Curation.d16BloomDecontamination(spark, sf001)
      .as[(Long, Long, Long)].collect().toSet
    // no false negatives (≥3 shared with one bench doc ⇒ ≥3 distinct
    // hashes in the union bloom) and the exact verify join discards
    // false positives → set equality, not ⊆
    assert(bloom === exact)
    assert(exact.nonEmpty, "fixture must contain contamination for this test to bite")
  }

  test("d16 prefilter pruning power: a clean disjoint-vocab corpus barely reaches the join") {
    import spark.implicits._
    // the realistic corpus shape: each doc has its own vocabulary, a
    // handful embed a benchmark passage verbatim (the contamination),
    // everything else shares nothing with the bench set
    val benchDocs = (0 until 5).map(b =>
      (b.toLong, (1 to 30).map(j => s"bench${b}tok$j").mkString(" ")))
    val passage = benchDocs(2)._2.split(" ").take(10).mkString(" ") // 8 shared trigrams
    val corpusDocs = (0 until 500).map { i =>
      val own = (1 to 40).map(j => s"doc${i}w$j").mkString(" ")
      (100L + i, if (i % 100 == 7) own + " " + passage else own)
    }
    val bench = benchDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val got = operators.Curation.bloomContaminationCounts(corpus, bench)
      .as[(Long, Long, Long)].collect().toSet
    // ground truth via the d07 (no-prefilter) rule on the same frames
    def shingled(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", operators.Dedup.shingleHashes($"text").as("sh"))
      .filter(size($"sh") > 0)
    val want = operators.Curation.contaminationCounts(
        shingled(corpus).select($"doc_id", explode($"sh").as("sg")),
        shingled(bench).select($"doc_id".as("bench_id"), explode($"sh").as("sg")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(want.map(_._1) === corpusDocs.collect { case (id, t) if t.contains("bench") => id }.toSet)
    // the scale claim: only the planted docs (+ possible rare bloom FPs)
    // pass the prefilter — the clean 99% never explode into the join
    val bits = functions.BloomBits.build(
      shingled(bench).select(explode($"sh")).distinct().as[Long].collect())
    val flagged = shingled(corpus)
      .filter(functions.BloomHitsAtLeast($"sh", bits, 4, 3)).count()
    assert(flagged <= want.map(_._1).size + 5,
      s"prefilter kept $flagged docs; expected ≈ ${want.map(_._1).size} planted contaminations")
  }

  test("BloomBits: inserted members always hit; false-positive rate within sizing bound") {
    val rnd = new scala.util.Random(7)
    val members = Array.fill(5000)(rnd.nextLong())
    val bits = functions.BloomBits.build(members)
    members.foreach(h => assert(functions.BloomBits.mightContain(bits, 4, h)))
    val memberSet = members.toSet
    val probes = Array.fill(100000)(rnd.nextLong()).filterNot(memberSet)
    val fp = probes.count(h => functions.BloomBits.mightContain(bits, 4, h))
    // sizing: 16 bits/member, k=4 → theoretical ~0.24%; assert a lenient 1%
    assert(fp.toDouble / probes.length < 0.01, s"FP rate ${fp.toDouble / probes.length}")
  }

  test("c07 snapshot diff: applying the diff to the old manifest reproduces the new one") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001)
    // the two snapshot manifests c07 derives internally, materialized
    // independently here as ground truth
    val old = docs.filter($"doc_id" % 10 =!= 0)
      .select($"doc_id", sha2(
        when($"doc_id" % 10 === 5, concat($"text", lit(" [stale rev]")))
          .otherwise($"text"), 256).as("h"))
      .as[(Long, String)].collect().toMap
    val nw = docs.filter($"doc_id" % 10 =!= 1)
      .select($"doc_id", sha2($"text", 256).as("h"))
      .as[(Long, String)].collect().toMap
    val diff = operators.Curation.c07SnapshotDiff(spark, sf001)
      .as[(Long, String, Option[String])].collect()
    assert(diff.nonEmpty)
    // each status is truthful against the manifests
    diff.foreach {
      case (id, "added", h)   => assert(!old.contains(id) && h.contains(nw(id)))
      case (id, "removed", h) => assert(old.contains(id) && !nw.contains(id) && h.isEmpty)
      case (id, "changed", h) => assert(old(id) != nw(id) && h.contains(nw(id)))
      case (id, st, _)        => fail(s"doc $id: unexpected status '$st'")
    }
    // the CDC contract: old manifest + diff = new manifest, exactly
    val applied = (old -- diff.collect { case (id, "removed", _) => id }) ++
      diff.collect { case (id, st, Some(h)) if st != "removed" => id -> h }
    assert(applied === nw)
    // and the unchanged mass is NOT emitted — the property that makes
    // the diff manifest-sized instead of corpus-sized
    val emitted = diff.map(_._1).toSet
    old.keySet.intersect(nw.keySet).filter(id => old(id) == nw(id))
      .foreach(id => assert(!emitted(id), s"unchanged doc $id emitted"))
  }

  test("d17 LSH clusters = d12 collapse clusters = d08 exact clusters (three routes, one answer)") {
    import spark.implicits._
    // the three cluster paths differ only in HOW pairs are produced
    // (exact join / collapse / LSH+verify) — the assignment must be
    // identical whenever LSH recall holds, which the fixture satisfies
    val d08 = Dedup.d08DedupClusters(spark, sf001)
      .as[(Long, Long)].collect().toSet
    val d12 = Dedup.d12CollapsedClusters(spark, sf001)
      .as[(Long, Long)].collect().toSet
    val d17 = Dedup.d17LshClusters(spark, sf001)
      .as[(Long, Long)].collect().toSet
    assert(d17 === d08, "LSH route diverged from exact clusters")
    assert(d12 === d08, "collapse route diverged from exact clusters")
    assert(d17.nonEmpty)
  }

  test("d22: survival curve reconciles with keep-first at every tau and is monotone") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val taus = Seq(0.7, 0.8, 0.9, 1.0)
    val curve = Dedup.survivalCurve(docs, taus)
      .select($"tau", $"n_survivors").as[(Double, Long)].collect().toMap
    val n = docs.count()
    taus.foreach { t =>
      val killed = Dedup.ngramJaccardPairs(docs, t)
        .select($"d2").distinct().count()
      assert(curve(t) === n - killed, s"tau=$t diverges from keep-first")
    }
    // survivors can only grow as the threshold tightens
    val ordered = taus.sorted.map(curve)
    assert(ordered === ordered.sorted, s"curve not monotone: $ordered")
    assert(curve(0.7) < n, "fixture must contain near-dups at the loosest cut")
  }

  test("d23: cluster-size histogram partitions the corpus exactly and matches d08") {
    import spark.implicits._
    val rows = Dedup.d23ClusterMass(spark, sf0001)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", size(split($"text", " ")).cast("long")).as[(Long, Long)]
      .collect()
    // the report must partition the WHOLE corpus: doc and token masses
    // across all size rows reconcile with the raw table, shares sum to 1
    assert(rows.map(_._3).sum === docs.length.toLong, "doc mass")
    assert(rows.map(_._4).sum === docs.map(_._2).sum, "token mass")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3, "doc shares")
    // local ground truth from d08's own cluster assignment
    val reps = Dedup.d08DedupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val sizes = docs.map(d => reps.getOrElse(d._1, d._1))
      .groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).map { case (s2, cs) => s2 -> cs.size.toLong }
    rows.foreach { case (s2, nc, dcs, _, _, _) =>
      assert(sizes(s2) === nc, s"size $s2 cluster count")
      assert(dcs === s2 * nc, s"size $s2 doc mass inconsistent")
    }
    assert(rows.exists(_._1 === 1L), "singleton row missing")
    assert(rows.exists(_._1 > 1L), "fixture has no multi-doc cluster")
  }

  test("d24: keep-best picks the max-quality member and prices the gain over keep-first") {
    import spark.implicits._
    val rows = Dedup.d24KeepBest(spark, sf0001)
      .as[(Long, Long, Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    val quality = operators.TextAnalysis.t02QualityScore(spark, sf0001)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    val reps = Dedup.d08DedupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val members = quality.keys.groupBy(id => reps.getOrElse(id, id))
    assert(rows.length === members.size, "one row per cluster")
    assert(rows.map(_._2).sum === quality.size.toLong,
      "cluster sizes must partition the corpus")
    rows.foreach { case (rep, sz, kept, kq, firstId, gain) =>
      val m = members(rep)
      assert(m.size.toLong === sz, s"rep $rep size")
      // kept = max quality, ties to lowest id — recompute locally
      val best = m.minBy(id => (-quality(id), id))
      assert(kept === best, s"rep $rep kept $kept != local best $best")
      assert(math.abs(kq - quality(best)) < 1e-9, s"rep $rep kept quality")
      assert(firstId === m.min, s"rep $rep first pick")
      assert(gain >= -1e-9, s"rep $rep negative gain")
      assert(math.abs(gain - (quality(best) - quality(m.min))) < 1e-5,
        s"rep $rep gain")
      if (sz === 1L) assert(kept === rep && gain === 0.0, s"rep $rep singleton")
    }
    // the fixture must show keep-best actually diverging somewhere
    assert(rows.exists(r => r._3 != r._5),
      "keep-best never disagreed with keep-first on this corpus")
  }

}
