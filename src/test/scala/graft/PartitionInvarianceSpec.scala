package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Similarity}

/** The 100 TB portability property: every deterministic operator must
  * produce IDENTICAL results regardless of input partitioning and
  * shuffle-partition count — a job that changes answers when the
  * cluster grows from 32 to 1000 executors is wrong, not slow. Float
  * determinism is engineered (exact quantized sums, index-ordered dot
  * products, total-order tie-breaks); this spec checks the claim end
  * to end by running each operator at two very different parallelism
  * shapes and comparing full result sets. */
class PartitionInvarianceSpec extends SparkSpec {

  private def withShuffle[T](n: Int)(f: => T): T = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("near-dup, ANN, split, and mix are partition-count invariant") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val langDocs = Tables.documents(spark, sf001).select($"doc_id", $"lang")
    val e = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cen = Similarity.seedCentroids(e, 8)

    def runAll(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val d = docs.repartition(inputParts)
      val l = langDocs.repartition(inputParts)
      val v = e.repartition(inputParts)
      (Dedup.ngramJaccardPairs(d, 0.8).as[(Long, Long, Double)].collect().toSet,
       Similarity.ivfNearDupPairs(v, cen, 0.45).as[(Long, Long, Double)].collect().toSet,
       Curation.leakageSafeSplit(d, 0.8).as[(Long, Long, String)].collect().toSet,
       Curation.trainingMix(l, Curation.c03Weights.toMap, 0.6)
         .as[(Long, String)].collect().toSet,
       Dedup.collapsedClusters(d, 0.8).as[(Long, Long)].collect().toSet)
    }

    val narrow = runAll(inputParts = 3, shuffleParts = 5)
    val wide = runAll(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "d03 pairs diverge across parallelism")
    assert(narrow._2 === wide._2, "s08 ANN pairs diverge across parallelism")
    assert(narrow._3 === wide._3, "c05 split diverges across parallelism")
    assert(narrow._4 === wide._4, "c03 mix diverges across parallelism")
    assert(narrow._5 === wide._5, "d12 clusters diverge across parallelism")
  }

  test("t16 top-20 and t13 top-20 are shuffle-partition invariant (tie-breaks total)") {
    val a = withShuffle(3)(operators.TextAnalysis.t16MergePairs(spark, sf001)
      .collect().map(_.toSeq).toSeq)
    val b = withShuffle(29)(operators.TextAnalysis.t16MergePairs(spark, sf001)
      .collect().map(_.toSeq).toSeq)
    assert(a === b)
    val c = withShuffle(3)(operators.TextAnalysis.t13TermTopk(spark, sf001)
      .collect().map(_.toSeq).toSeq)
    val d = withShuffle(29)(operators.TextAnalysis.t13TermTopk(spark, sf001)
      .collect().map(_.toSeq).toSeq)
    assert(c === d)
  }

  test("containment, block near-dup, tf-idf, cohesion, datasheet are parallelism invariant") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val srcDocs = Tables.documents(spark, sf001).select($"source", $"doc_id", $"text")
    val payloads = Tables.documents(spark, sf001)
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    val vecs = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"), $"label")

    def runAll(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val d = docs.repartition(inputParts)
      val p = payloads.repartition(inputParts)
      (Dedup.containmentPairs(d, 0.9)
         .as[(Long, Long, Double)].collect().toSet,
       operators.Multimodal.chunkNearDupPairs(p, 0.5)
         .as[(Long, Long, Double)].collect().toSet,
       operators.TextAnalysis.tfidfTerms(d, 3)
         .collect().map(_.toSeq).toSet,
       // s09's decimal-sum determinism is the whole point of its design:
       // a double Σu would diverge here — feed the REPARTITIONED frame
       // so input-partition variation (not just shuffle-partition
       // variation) is what the operator actually sees
       Similarity.labelCohesion(vecs.repartition(inputParts))
         .collect().map(_.toSeq).toSet,
       Curation.corpusDatasheet(srcDocs.repartition(inputParts))
         .collect().map(_.toSeq).toSet)
    }

    val narrow = runAll(inputParts = 3, shuffleParts = 5)
    val wide = runAll(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "d14 containment diverges across parallelism")
    assert(narrow._2 === wide._2, "m06 block pairs diverge across parallelism")
    assert(narrow._3 === wide._3, "t18 tf-idf diverges across parallelism")
    assert(narrow._4 === wide._4, "s09 cohesion diverges across parallelism")
    assert(narrow._5 === wide._5, "c04 datasheet diverges across parallelism")
  }

  test("t20 CMS estimates, s11 survivor set, t21 LM scores are parallelism invariant") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val vecs = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cen = Similarity.seedCentroids(vecs, 8)

    def runAll(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      // CMS cell sums are integer adds (merge-order free); the survivor
      // decision composes the oracled s08 join + CC + a total-order
      // window; t21's and t25's only order-varying reduction is the
      // quantized decimal term sum — all must be bit-stable as the
      // cluster reshapes
      val d = docs.repartition(inputParts)
      // c16's DSIR weights: integer bucket counts + 6dp per-bucket log
      // weights + an exact-decimal per-doc sum + total-order top-K —
      // the full selection must survive any reshaping
      val srcd = Tables.documents(spark, sf001)
        .select($"doc_id", $"text", $"source").repartition(inputParts)
      (operators.TextAnalysis.cmsTokenEstimates(d)
         .as[(String, Long)].collect().toSet,
       Similarity.semanticSurvivors(vecs.repartition(inputParts), cen, 0.45)
         .as[(Long, Long, Double, Boolean)].collect().toSet,
       operators.TextAnalysis.lmQualityScores(d)
         .as[(Long, Long, Double)].collect().toSet,
       operators.TextAnalysis.bm25TopK(d, d.filter($"doc_id" < 20), 3)
         .as[(Long, Long, Int, Double)].collect().toSet,
       Curation.dsirSelect(srcd.filter(!$"source".isin("src1", "src2")),
           srcd.filter($"source".isin("src1", "src2")), 2048, 100)
         .collect().map(_.toSeq).toSet)
    }

    val narrow = runAll(inputParts = 3, shuffleParts = 5)
    val wide = runAll(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "t20 CMS estimates diverge across parallelism")
    assert(narrow._2 === wide._2, "s11 survivors diverge across parallelism")
    assert(narrow._3 === wide._3, "t21 LM scores diverge across parallelism")
    assert(narrow._4 === wide._4, "t25 BM25 ranking diverges across parallelism")
    assert(narrow._5 === wide._5, "c16 DSIR selection diverges across parallelism")
  }

  test("s12 PQ training and codes are parallelism invariant") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))

    // Lloyd's updates are the classic place float training diverges
    // across partitionings (sum order varies); s12's updates are exact
    // decimal means of 1e-6-quantized components, so codebooks — and
    // therefore every downstream code — must be bit-identical as both
    // the input layout and the shuffle width change
    def run(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val sv = Similarity.pqSubvectors(vecs.repartition(inputParts), 4)
      val books = Similarity.pqCodebooks(sv, 16, 2)
      (books.as[(Int, Int, Seq[Double])].collect().toSet,
       Similarity.pqCodes(sv, books)
         .as[(Long, Seq[Int])].collect().toSet)
    }

    val narrow = run(inputParts = 3, shuffleParts = 5)
    val wide = run(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "s12 codebooks diverge across parallelism")
    assert(narrow._2 === wide._2, "s12 codes diverge across parallelism")
  }

  test("s13 coarse assignment and residuals are parallelism invariant") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))

    // the IVFADC-specific stage on top of the s12 machinery: the
    // argmin coarse assignment (min_by with a total-order key) and the
    // 6dp residual subtraction must be bit-identical however the input
    // is laid out and however wide the shuffle is
    def run(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val vq64 = Similarity.pqSubvectors(vecs.repartition(inputParts), 64)
      val coarse = Similarity.pqCodebooks(vq64, 5, 2)
      Similarity.coarseResiduals(vq64, coarse)
        .as[(Long, Int, Seq[Double])].collect().toSet
    }

    assert(run(inputParts = 3, shuffleParts = 5) === run(inputParts = 17, shuffleParts = 32),
      "s13 coarse assignment/residuals diverge across parallelism")
  }

  test("s15 MMR picks and t26 chunks are parallelism invariant") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val vecs = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))

    // MMR's greedy loop runs per-group over a pool the candidate window
    // cut with total-order ties; the group's iterator order is
    // partition-dependent, so the in-group n_id sort is load-bearing —
    // this is the test that fails if someone removes it. t26 is a pure
    // narrow map; invariance should be trivial and stay that way.
    def run(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val v = vecs.repartition(inputParts)
      val c = v.withColumn("nrm", Similarity.norm($"v"))
      val q = c.filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"rel".desc, $"n_id".asc)
      val cands = c.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("n_id"),
          (Similarity.dot($"v", $"qv") / ($"nrm" * $"qn")).as("rel"), $"v", $"nrm")
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 20)
        .select($"q_id", $"n_id", $"rel", $"v", $"nrm")
      (Similarity.mmrRerank(cands, 5, 0.7, 0.3)
         .as[(Long, Int, Long, Double)].collect().toSet,
       operators.TextAnalysis.chunkWindows(docs.repartition(inputParts), 64, 48)
         .as[(Long, Int, Int, Int, String)].collect().toSet)
    }

    val narrow = run(inputParts = 3, shuffleParts = 5)
    val wide = run(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "s15 MMR picks diverge across parallelism")
    assert(narrow._2 === wide._2, "t26 chunks diverge across parallelism")
  }

  test("t27 fusion, c09 cap, c10 budget are parallelism invariant") {
    import spark.implicits._
    val srcDocs = Tables.documents(spark, sf001)
      .select($"doc_id", $"source", $"text")

    // c09/c10 rank on a 6dp-rounded float with doc_id tie-break and
    // c10 adds an order-dependent (but integer-exact) running sum —
    // the total order is what makes both partition-independent. t27
    // stacks two retrievals' determinism plus the fusion window.
    def run(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val d = srcDocs.repartition(inputParts)
      (Curation.sourceCap(d, 15)
         .as[(Long, String, Double, Int)].collect().toSet,
       Curation.tokenBudgetAdmission(d, 400L)
         .as[(Long, String, Long, Long)].collect().toSet,
       Curation.tokenBudgetAdmissionPruned(d, 400L)
         .as[(Long, String, Long, Long)].collect().toSet,
       operators.TextAnalysis.t27RrfFusion(spark, sf001)
         .as[(Long, Long, Int, Double)].collect().toSet)
    }

    val narrow = run(inputParts = 3, shuffleParts = 5)
    val wide = run(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "c09 cap diverges across parallelism")
    assert(narrow._2 === wide._2, "c10 admission diverges across parallelism")
    assert(narrow._3 === wide._3, "c11 pruned admission diverges across parallelism")
    assert(narrow._4 === wide._4, "t27 fusion diverges across parallelism")
  }

  test("q70 ordered listagg, t29 BPE merges, s16 binary top-k, m08 admission are parallelism invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // q70 is the classic trap this suite exists for: an ordered string
    // aggregation whose WITHIN GROUP sort must neutralize shuffle
    // arrival order. t29's histogram collect order must not leak into
    // training; s16's windows are total-ordered; m08's keep-first rides
    // a (hash, doc_id) window.
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    def run(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val d = docs.repartition(inputParts)
      val vecs = Tables.embeddings(spark, sf001)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .repartition(inputParts)
      (operators.Relational5.q70ListAgg(spark, sf001)
         .as[(String, String, Long)].collect().toSet,
       operators.TextAnalysis.bpeTrain(d, 25),
       operators.Similarity.binaryHammingTopK(vecs, $"vec_id" < 20, 150, 3)
         .as[(Long, Long, Int, Double)].collect().toSet,
       operators.Multimodal.m08DeltaPayloads(spark, sf001)
         .as[(Long, String)].collect().toSet,
       // t30: per-row encode of a per-run-trained table — invariant iff
       // BOTH training and the sequence hash are
       {
         val toks = graft.functions.BpeEncode($"text",
           operators.TextAnalysis.bpeTrain(d, 25))
         d.select($"doc_id", size(toks).cast("long"),
             xxhash64(concat_ws(" ", toks)))
           .as[(Long, Long, Long)].collect().toSet
       })
    }
    val narrow = run(inputParts = 3, shuffleParts = 5)
    val wide = run(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "q70 listagg diverges across parallelism")
    assert(narrow._2 === wide._2, "t29 merge table diverges across parallelism")
    assert(narrow._3 === wide._3, "s16 top-k diverges across parallelism")
    assert(narrow._4 === wide._4, "m08 admission diverges across parallelism")
    assert(narrow._5 === wide._5, "t30 encode diverges across parallelism")
  }

  test("s17 index write/serve and t31 BPE packing are parallelism invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // s17's layout write shards lists across files differently at
    // different parallelisms — the SERVE result must not notice (the
    // total-ordered windows absorb file/row arrival order); t31's
    // per-lang running sums must not leak shuffle order
    val docs = Tables.documents(spark, sf001)
      .select($"lang", $"doc_id", $"text")
    val emb = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cen = operators.Similarity.trainedCentroids(spark, sf001, k = 5, iters = 2)
    def run(inputParts: Int, shuffleParts: Int) = withShuffle(shuffleParts) {
      val d = docs.repartition(inputParts)
      val merges = operators.TextAnalysis.bpeTrain(
        d.select($"doc_id", $"text"), 40)
      val t31 = d.select($"lang", $"doc_id",
          size(graft.functions.BpeEncode($"text", merges)).cast("long").as("n_tok"))
        .withColumn("cum", sum($"n_tok").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"lang")
            .orderBy($"doc_id")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
        .withColumn("pack_id", floor(($"cum" - $"n_tok") / 2048))
        .groupBy($"lang", $"pack_id")
        .agg(count(lit(1)).as("n"), sum($"n_tok").as("st"))
        .as[(String, Long, Long, Long)].collect().toSet
      val v = emb.repartition(inputParts)
      val dir = java.nio.file.Files.createTempDirectory("inv-s17").toString
      val s17 = try {
        operators.Similarity.writeIvfIndex(v, cen, dir)
        val q = v.withColumn("nrm", operators.Similarity.norm($"v"))
          .filter($"vec_id" < 20)
          .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
        operators.Similarity.ivfTopKFromIndex(spark, dir, cen, q, 2, 3)
          .as[(Long, Long, Int, Double)].collect().toSet
      } finally graft.BenchUtil.rmTree(dir)
      (t31, s17)
    }
    val narrow = run(inputParts = 3, shuffleParts = 5)
    val wide = run(inputParts = 17, shuffleParts = 32)
    assert(narrow._1 === wide._1, "t31 packing diverges across parallelism")
    assert(narrow._2 === wide._2, "s17 serve diverges across parallelism")
  }

  test("m11 clusters and s23 semdedup are shuffle-partition invariant") {
    // m11 is golden-snapshot-hashed, so its determinism across
    // parallelisms is load-bearing for the oracle (the m07/m10
    // precedent); s23's SQL oracle runs at one parallelism only, so
    // the invariance check is what extends its guarantee to any
    // cluster shape
    def m11At(n: Int) = withShuffle(n)(
      operators.Multimodal.m11PerceptualClusters(spark, sf001)
        .collect().map(_.toSeq).toSet)
    assert(m11At(3) === m11At(29), "m11 clusters diverge across parallelism")
    def s23At(n: Int) = withShuffle(n)(
      operators.Similarity.s23SemDedup(spark, sf001)
        .collect().map(_.toSeq).toSet)
    assert(s23At(3) === s23At(29), "s23 semdedup diverges across parallelism")
  }

  test("m12 CDC dedup is shuffle-partition invariant") {
    // m12 is golden-snapshot-hashed: the gear kernel is a sequential
    // pure function per row and the Jaccard join integer-exact — this
    // probe is what upgrades that argument to a measured property
    def at(n: Int) = withShuffle(n)(
      operators.Multimodal.m12CdcNearDup(spark, sf001)
        .collect().map(_.toSeq).toSet)
    assert(at(3) === at(29), "m12 CDC pairs diverge across parallelism")
  }

  test("c22 audit, t39 surprisal, s30 refine, m16 sniff are shuffle-partition invariant") {
    // the r15 operators: c22/m16 are integer counts + 6dp ratios over
    // per-row regex/prefix work; t39's classes are integer bit-length
    // arithmetic; s30 composes s13's invariant stack with per-row
    // sequential dots and total-order ties — all four must hold the
    // 100 TB portability property their scaladocs claim
    def at(n: Int) = withShuffle(n)((
      operators.Curation.c22PiiCanaryAudit(spark, sf001)
        .collect().map(_.toSeq).toSet,
      operators.TextAnalysis.t39UnigramSurprisal(spark, sf001)
        .collect().map(_.toSeq).toSet,
      operators.Similarity.s30RefinedTopK(spark, sf001)
        .collect().map(_.toSeq).toSet,
      operators.Multimodal.m16ModalitySniff(spark, sf001)
        .collect().map(_.toSeq).toSet))
    val (a3, b3, c3, d3) = at(3)
    val (a29, b29, c29, d29) = at(29)
    assert(a3 === a29, "c22 audit diverges across parallelism")
    assert(b3 === b29, "t39 surprisal diverges across parallelism")
    assert(c3 === c29, "s30 refined picks diverge across parallelism")
    assert(d3 === d29, "m16 sniff matrix diverges across parallelism")
  }

  test("d24 keep-best and m17 transfer estimate are shuffle-partition invariant") {
    // d24's whole claim is that the rounded-quality argmax is a total
    // order; m17's that hash-set membership + integer rollups are
    // partition-free — both must survive a parallelism change
    def at(n: Int) = withShuffle(n)((
      operators.Dedup.d24KeepBest(spark, sf001)
        .collect().map(_.toSeq).toSet,
      operators.Multimodal.m17SnapshotTransfer(spark, sf001)
        .collect().map(_.toSeq).toSet))
    val (a3, b3) = at(3)
    val (a29, b29) = at(29)
    assert(a3 === a29, "d24 manifest diverges across parallelism")
    assert(b3 === b29, "m17 transfer report diverges across parallelism")
  }
}
