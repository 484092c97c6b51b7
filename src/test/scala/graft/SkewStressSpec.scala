package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Skew stress for the near-dup paths (round-3/4 carried item): the
  * corpus shape that shows up at 100 TB is a mass-duplicated
  * boilerplate doc (license header, template page) whose LSH band
  * buckets all explode past any cap. The d04 `maxBucket` guard exists
  * for exactly this; these tests exercise it UNDER that condition, and
  * pin the exact d03 join's behavior on the same corpus. */
class SkewStressSpec extends SparkSpec {

  private val BoilerCopies = 1200 // > the guard's 1000-doc bucket cap

  /** 1200 identical boilerplate docs + 60 normal docs with 8 planted
    * near-dup pairs (single-word mutation over ~30-word texts). */
  private def skewedCorpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val boiler = "all rights reserved " +
      Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def doc(): String =
      Seq.fill(25 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val normal = Seq.fill(52)(doc())
    val nearCopies = normal.take(8).map { t =>
      val w = t.split(' ')
      w.updated(rnd.nextInt(w.length), vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val texts = Seq.fill(BoilerCopies)(boiler) ++ normal ++ nearCopies
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def banded(docs: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val sh = docs.select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
      .filter(size($"sh") > 0)
    sh.select($"doc_id", posexplode(Dedup.bandKeys(Dedup.minhashSignature($"sh"))))
      .toDF("doc_id", "band_id", "band_hash")
  }

  /** Brute-force J ≥ 0.8 pair count over the whole corpus, and the
    * subset among non-boilerplate docs, computed from collected shingle
    * sets (61 distinct texts — cheap on the driver). */
  private def groundTruth(docs: org.apache.spark.sql.DataFrame): (Long, Set[(Long, Long)]) = {
    import spark.implicits._
    val sets = docs.select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
      .as[(Long, Seq[Long])].collect().map { case (id, sh) => id -> sh.toSet }
    var total = 0L
    val normal = Set.newBuilder[(Long, Long)]
    for (i <- sets.indices; j <- (i + 1) until sets.length) {
      val (ia, sa) = sets(i); val (ib, sb) = sets(j)
      if (sa.nonEmpty && sb.nonEmpty) {
        val inter = (sa & sb).size
        if (inter.toDouble / (sa.size + sb.size - inter) >= 0.8) {
          total += 1
          if (ia >= BoilerCopies && ib >= BoilerCopies)
            normal += ((math.min(ia, ib), math.max(ia, ib)))
        }
      }
    }
    (total, normal.result())
  }

  test("maxBucket guard: flooded boilerplate buckets are dropped, normal recall intact") {
    import spark.implicits._
    val docs = skewedCorpus.cache()
    try {
      val b = banded(docs).cache()
      val guarded = Dedup.lshCandidates(b) // default maxBucket = 1000
        .as[(Long, Long)].collect()
      // every boilerplate bucket holds all 1200 copies (identical docs
      // -> identical signatures) > cap -> dropped from candidate gen
      assert(guarded.forall { case (d1, d2) =>
        d1 >= BoilerCopies && d2 >= BoilerCopies
      }, "boilerplate doc leaked into candidate generation past the guard")
      // the guard is a NO-OP for normal docs: their buckets are small,
      // so the guarded candidate set restricted to normal docs equals
      // the unguarded one exactly. (LSH recall itself — a pair at
      // J ≈ 0.8 has a ~5% genuine miss chance per banding theory — is
      // d04's oracle-compare concern, not the guard's.)
      val unguardedAll = Dedup.lshCandidates(b, maxBucket = Int.MaxValue)
        .as[(Long, Long)].collect()
      val unguardedNormal = unguardedAll.filter { case (d1, d2) =>
        d1 >= BoilerCopies && d2 >= BoilerCopies }.toSet
      assert(guarded.toSet === unguardedNormal,
        "guard changed candidates among docs with healthy buckets")
      // sanity: verified candidates are real near-dups of the truth set
      val (_, normalTruth) = groundTruth(docs)
      assert(normalTruth.nonEmpty, "fixture must plant normal near-dup pairs")
      val sh = docs.select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
      val verified = guarded.toSeq.toDF("d1", "d2")
        .join(sh.select($"doc_id".as("d1"), $"sh".as("sh1")), "d1")
        .join(sh.select($"doc_id".as("d2"), $"sh".as("sh2")), "d2")
        .select($"d1", $"d2", Dedup.jaccard($"sh1", $"sh2").as("j"))
        .filter($"j" >= 0.8)
        .select($"d1", $"d2").as[(Long, Long)].collect()
        .map { case (a, b2) => (math.min(a, b2), math.max(a, b2)) }.toSet
      assert(verified.subsetOf(normalTruth),
        "verified guarded candidates must be true near-dup pairs")
      assert(verified.nonEmpty, "guard must not starve all normal recall")
      // what the guard PREVENTS: unguarded candidate set is quadratic
      // in the duplicated doc (1200*1199/2 pairs from one text)
      val quad = BoilerCopies.toLong * (BoilerCopies - 1) / 2
      assert(unguardedAll.length >= quad,
        s"expected >= $quad unguarded candidates, got ${unguardedAll.length}")
      assert(guarded.length.toLong < quad / 100,
        "guard failed to cap the candidate explosion")
      b.unpersist()
    } finally docs.unpersist()
  }

  test("exact d03 prefix join completes on the skewed corpus with the full quadratic truth") {
    import spark.implicits._
    val docs = skewedCorpus.cache()
    try {
      val (expected, _) = groundTruth(docs)
      val t0 = System.nanoTime()
      // exact join: mass duplicates ARE near-dups (J = 1.0), so the true
      // answer contains all C(1200,2) boilerplate pairs — the test is
      // that the prefix join produces exactly them without hanging
      // (candidates stay bounded by prefix-token buckets, then verify
      // is per-pair)
      val n = Dedup.ngramJaccardPairs(docs, 0.8).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val quad = BoilerCopies.toLong * (BoilerCopies - 1) / 2
      assert(expected >= quad, "fixture sanity: boilerplate pairs dominate")
      assert(n === expected, s"exact join must return the full truth")
      assert(sec < 120.0, s"skewed exact join took ${sec}s — budget blown")
    } finally docs.unpersist()
  }

  test("collapse path on the mass-dup corpus: same truth, O(1) join rows, O(m) graph edges") {
    import spark.implicits._
    val docs = skewedCorpus.cache()
    try {
      val (expected, _) = groundTruth(docs)
      // d10 reproduces the full quadratic TRUTH (all C(1200,2) boiler
      // pairs included) while the JOIN saw the boilerplate once
      assert(Dedup.ngramJaccardPairsViaCollapse(docs, 0.8).count() === expected)
      // the clustering form never materializes the clique at all:
      // 1199 star edges for the 1200-dup group instead of 719,400
      val edges = Dedup.collapsedPairGraph(docs, 0.8)
        .as[(Long, Long)].collect()
      val boilerEdges = edges.count { case (d1, d2) =>
        d1 < BoilerCopies && d2 < BoilerCopies }
      assert(boilerEdges === BoilerCopies - 1,
        s"expected a ${BoilerCopies - 1}-edge star for the boiler group, got $boilerEdges")
      // and those edges produce the correct single cluster for the group
      val clusters = Dedup.clusterPairs(edges.toSeq.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      (0L until BoilerCopies.toLong).foreach { id =>
        assert(clusters(id) === 0L, s"boiler doc $id not clustered to rep 0")
      }
    } finally docs.unpersist()
  }

  test("payload storm: 1000 copies of one padded payload — collapse keeps the chunk joins linear, truth exact") {
    // the m06/m12 twin of the d10 test above: a mass-duplicated binary
    // payload (the re-uploaded asset / zero-padded block case) must
    // cost the inverted-index join ONE row per distinct payload, while
    // the expanded answer still carries the full C(1000,2) clique —
    // and a payload whose content is one repeated byte (all chunk
    // values identical = the maximal within-payload flood) must not
    // blow the join up either
    import spark.implicits._
    val padded = ("asset-header " + (" " * 400) + " trailer")
      .getBytes("UTF-8")
    val rnd = new scala.util.Random(11)
    val normals = (0 until 60).map { i =>
      (5000L + i, Array.fill(300 + rnd.nextInt(200))((rnd.nextInt(26) + 'a').toByte))
    }
    val storm = (0L until 1000L).map(i => (i, padded)) ++ normals
    val payloads = storm.toDF("doc_id", "payload").cache()
    try {
      Seq[(String, org.apache.spark.sql.DataFrame)](
        "m06" -> operators.Multimodal.chunkNearDupPairs(payloads, 0.5),
        "m12" -> operators.Multimodal.cdcNearDupPairs(payloads, 0.5)
      ).foreach { case (tag, df) =>
        val rows = df.select("d1", "d2").as[(Long, Long)].collect()
        val clique = rows.count { case (a, b) => a < 1000 && b < 1000 }
        assert(clique === 1000 * 999 / 2, s"$tag: storm clique incomplete")
        assert(!rows.exists { case (a, b) => a >= 5000 || b >= 5000 },
          s"$tag: unrelated random payloads paired")
      }
    } finally { payloads.unpersist(); () }
  }

  test("vector dup-storm: s26's exact pre-collapse ≡ uncapped SemDeDup, rep join at distinct cardinality") {
    // SemDeDup's pathological input: 1000 byte-identical embeddings
    // (re-crawled page / default thumbnail) all landing in one cluster.
    // The collapsed form must (a) run its cluster→pair→CC program over
    // DISTINCT vectors only and (b) return exactly the uncapped
    // program's output — the same-answer-scalable-plan contract the
    // driver also hash-checks via s23's oracle
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(23)
    def vec(): Array[Double] = Array.fill(16)(rnd.nextGaussian())
    val dup = vec()
    val vecs = ((0L until 1000L).map(i => (i, dup)) ++
      (0 until 60).map(i => (5000L + i, vec())))
      .toDF("vec_id", "v").cache()
    try {
      val cen = vecs.filter($"vec_id" < 8)
        .select($"vec_id".as("cluster_id"), $"v".as("cv"),
          Similarity.norm($"v").as("cn"))
      val uncapped = Similarity.semDedupFlags(vecs, cen, 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      val collapsed = Similarity.semDedupCollapsed(vecs, cen, 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      assert(collapsed === uncapped, "collapse changed the answer")
      // the storm group keeps exactly its min id
      assert(uncapped.count { case (id, _, _, keep) => id < 1000 && keep } === 1)
      // candidate mass bound: the rep-level program sees one row per
      // DISTINCT vector — 61 here, not 1060
      val reps = vecs.groupBy($"v").count().count()
      assert(reps === 61L, s"expected 61 distinct vectors, got $reps")
    } finally { vecs.unpersist(); () }
  }

  test("t39 under the boilerplate storm: the Zipf model join stays row-linear and exact") {
    import spark.implicits._
    // 1200 identical docs make every boilerplate token a maximally hot
    // model-join key (corpus count ≥ 1200 on ~33 keys). t39's shape
    // absorbs this by construction: per-(doc, token) counts combine
    // map-side BEFORE the join, so the hot key carries ONE row per
    // (doc, token) — join fan-in ≈ Σ distinct tokens per doc, never
    // Σ raw token mass — and the surprisal sum stays integer-exact.
    val dir = java.nio.file.Files.createTempDirectory("t39-storm").toString
    skewedCorpus
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val rows = operators.TextAnalysis.t39UnigramSurprisal(spark, dir)
        .as[(Long, Long, Long, Double)].collect()
      assert(rows.length === BoilerCopies + 60, "one row per doc")
      // all boilerplate copies share one text ⇒ identical scores, and
      // their tokens are the corpus's most common ⇒ the storm's mean
      // surprisal must sit strictly below the normal docs' average
      val (storm, normal) = rows.partition(_._1 < BoilerCopies)
      assert(storm.map(_._4).distinct.length === 1, "storm scores differ")
      val stormMean = storm.head._4
      val normalMean = normal.map(_._4).sum / normal.length
      assert(stormMean < normalMean,
        s"boilerplate ($stormMean) must score below normal docs ($normalMean)")
      // join fan-in bound: distinct (doc, token) pairs, not token mass
      val pdt = Tables.documents(spark, dir)
        .select($"doc_id", explode(split($"text", " ")).as("tok"))
        .groupBy($"doc_id", $"tok").count().count()
      val mass = Tables.documents(spark, dir)
        .select(size(split($"text", " "))).as[Int].collect().map(_.toLong).sum
      assert(pdt < mass / 2,
        s"map-side combine must shrink the join input ($pdt vs $mass)")
    } finally graft.BenchUtil.rmTree(dir)
  }
}
