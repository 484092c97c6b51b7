package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup

/** Property-based invariants (SURVEY §5.2 item 3): JSON round-trip,
  * dedup idempotence, minhash-vs-exact-Jaccard bounds — over generated
  * data, not just the fixtures. (ScalaCheck generators driven with
  * fixed seeds — the scalatest/scalacheck bridge artifact is not in
  * the offline cache.) */
class PropertySpec extends SparkSpec {

  /** Deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAllSamples[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    samples(g, n).foreach(body)

  private val word = Gen.oneOf("spark", "data", "query", "join", "agg", "row",
    "scan", "fast", "slow", "table", "value", "key", "hash", "batch", "window")
  private val text: Gen[String] = Gen.chooseNum(3, 60)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("prefix-filtered exact join loses no pair vs brute force (generated corpora)") {
    import spark.implicits._
    // corpora biased toward overlap: small vocab + explicit near-copies
    (0 until 4).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta", "iota", "kappa")
      def doc(): String =
        Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = Seq.fill(15)(doc())
      val nearCopies = base.take(6).map { t =>
        val w = t.split(' ')
        val i = rnd.nextInt(w.length)
        w.updated(i, vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val texts = (base ++ nearCopies).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = texts.toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(docs, 0.8)
        .select($"d1", $"d2").as[(Long, Long)].collect().toSet
      // brute force over the same shingle sets (same hashing)
      val sets = docs.select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        if sets(a).nonEmpty && sets(b).nonEmpty
        j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
        if j >= 0.8
      } yield (a, b)).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("τ floor-rounding: boundary pair at J = 2/3 survives a non-representable τ") {
    import spark.implicits._
    // B's 2 shingles ⊂ A's 3 → Jaccard exactly 2/3. With p = ROUND(τ·10⁶)
    // = 666667 > τ·10⁶ the cross-multiplied length filter (2·10⁶ ≥ 3·p)
    // rejects the pair before verification ever runs; floor keeps p/q ≤ τ
    // and the pair survives. Pins the round-5 ADVICE regression.
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, 2.0 / 3.0)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("prefix-filtered join is exact for any τ: sweep {0.5, 2/3, 0.7, 0.9} vs brute force") {
    import spark.implicits._
    Seq(0.5, 2.0 / 3.0, 0.7, 0.9).foreach { tau =>
      (0 until 3).foreach { seed =>
        val rnd = new scala.util.Random(3000 + seed)
        val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
          "eta", "theta", "iota", "kappa")
        def doc(): String =
          Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val base = Seq.fill(15)(doc())
        // heavier mutation than the τ=0.8 test: pairs must straddle the
        // lower thresholds too, or the sweep tests nothing new
        val nearCopies = base.take(8).map { t =>
          val w = t.split(' ').toVector
          (0 until 1 + rnd.nextInt(4)).foldLeft(w) { (v, _) =>
            v.updated(rnd.nextInt(v.length), vocab(rnd.nextInt(vocab.size)))
          }.mkString(" ")
        }
        val texts = (base ++ nearCopies).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val docs = texts.toDF("doc_id", "text")
        val got = Dedup.ngramJaccardPairs(docs, tau)
          .select($"d1", $"d2").as[(Long, Long)].collect().toSet
        val sets = docs.select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
        val expected = (for {
          a <- sets.keys; b <- sets.keys if a < b
          if sets(a).nonEmpty && sets(b).nonEmpty
          j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
          if j >= tau
        } yield (a, b)).toSet
        assert(got === expected, s"tau=$tau seed=$seed")
      }
    }
  }

  test("collapse pre-pass ≡ direct prefix join on corpora with mass exact duplicates") {
    import spark.implicits._
    // corpora where exact duplication dominates — the shape the collapse
    // exists for: identical copies must yield within-group J=1 pairs,
    // near-copies must expand across groups with unchanged jaccard
    // τ = 1.0: cross-group pairs are impossible (distinct sets ⇒ J < 1),
    // so the output must be exactly the within-group cliques
    Seq(0.7, 0.8, 1.0).foreach { tau =>
      (0 until 3).foreach { seed =>
        val rnd = new scala.util.Random(4000 + seed)
        val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
          "eta", "theta", "iota", "kappa")
        def doc(): String =
          Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val base = Seq.fill(10)(doc())
        // exact duplicates: doc 0 copied 12×, docs 1-3 copied 2× each
        val exactDups = Seq.fill(12)(base(0)) ++ base.slice(1, 4).flatMap(t => Seq(t, t))
        val nearCopies = base.take(5).map { t =>
          val w = t.split(' ')
          w.updated(rnd.nextInt(w.length), vocab(rnd.nextInt(vocab.size))).mkString(" ")
        }
        val texts = (base ++ exactDups ++ nearCopies).zipWithIndex
          .map { case (t, i) => (i.toLong, t) }
        val docs = texts.toDF("doc_id", "text")
        val direct = Dedup.ngramJaccardPairs(docs, tau)
          .as[(Long, Long, Double)].collect().toSet
        val collapsed = Dedup.ngramJaccardPairsViaCollapse(docs, tau)
          .as[(Long, Long, Double)].collect().toSet
        assert(collapsed === direct, s"tau=$tau seed=$seed")
      }
    }
  }

  test("delta near-dup ≡ full pair join restricted to pairs touching the delta") {
    import spark.implicits._
    Seq(0.7, 0.8).foreach { tau =>
      (0 until 3).foreach { seed =>
        val rnd = new scala.util.Random(6000 + seed)
        val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
          "eta", "theta", "iota", "kappa")
        def doc(): String =
          Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val base = Seq.fill(14)(doc())
        // near-copies land on BOTH sides of the split so the test sees
        // new-new, new-old, and (excluded) old-old qualifying pairs
        val nearCopies = base.take(7).map { t =>
          val w = t.split(' ')
          w.updated(rnd.nextInt(w.length), vocab(rnd.nextInt(vocab.size))).mkString(" ")
        }
        val texts = (base ++ nearCopies).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val docs = texts.toDF("doc_id", "text")
        val isNew = (id: Long) => id % 3 == 0
        val oldDocs = docs.filter($"doc_id" % 3 =!= 0)
        val newDocs = docs.filter($"doc_id" % 3 === 0)
        val got = Dedup.deltaNearDupPairs(oldDocs, newDocs, tau)
          .as[(Long, Long, Double)].collect().toSet
        val expected = Dedup.ngramJaccardPairs(docs, tau)
          .as[(Long, Long, Double)].collect().toSet
          .filter(pr => isNew(pr._1) || isNew(pr._2))
        assert(got === expected, s"tau=$tau seed=$seed")
      }
    }
  }

  test("delta near-dup degenerate inputs: empty corpus, empty delta") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val none = docs.limit(0)
    // empty standing corpus: delta-vs-delta pairs only
    val coldStart = Dedup.deltaNearDupPairs(none, docs, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(coldStart === Set((1L, 2L, 1.0)))
    // empty delta: nothing to admit, nothing to pair
    assert(Dedup.deltaNearDupPairs(docs, none, 0.8).count() === 0L)
  }

  test("collapsedPairGraph clusters ≡ clusters over the full expanded pair set") {
    import spark.implicits._
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(5000 + seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta", "iota", "kappa")
      def doc(): String =
        Seq.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = Seq.fill(10)(doc())
      val exactDups = Seq.fill(9)(base(0)) ++ Seq(base(1), base(1))
      val nearCopies = base.take(4).map { t =>
        val w = t.split(' ')
        w.updated(rnd.nextInt(w.length), vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val texts = (base ++ exactDups ++ nearCopies).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val docs = texts.toDF("doc_id", "text")
      val full = Dedup.clusterPairs(
        Dedup.ngramJaccardPairs(docs, 0.8).select($"d1", $"d2"))
        .as[(Long, Long)].collect().toMap
      val viaGraph = Dedup.clusterPairs(Dedup.collapsedPairGraph(docs, 0.8))
        .as[(Long, Long)].collect().toMap
      assert(viaGraph === full, s"seed=$seed")
      // d12's actual path: CC on rep-level pairs only, members attached
      // by one join — must still equal the doc-level ground truth
      val viaRepCC = Dedup.collapsedClusters(docs, 0.8)
        .as[(Long, Long)].collect().toMap
      assert(viaRepCC === full, s"seed=$seed (rep-level CC)")
    }
  }

  test("native topk ≡ typed TopKAggregator on random scores with ties") {
    import spark.implicits._
    Engine.registerFunctions(spark)
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(7000 + seed)
      // few distinct scores → heavy ties, exercising the (-score, tag)
      // tie-break in both implementations
      val data = Seq.fill(200)((rnd.nextInt(10).toDouble, rnd.nextInt(1000).toLong))
        .distinct
      data.toDF("score", "tag").createOrReplaceTempView("tk_prop")
      val native = spark.sql("SELECT topk(score, tag, 7) FROM tk_prop")
        .collect().head.getSeq[Long](0)
      val typed = data.toDF("score", "tag")
        .agg(udaf(new functions.TopKAggregator(7)).apply($"score", $"tag"))
        .collect().head.getSeq[Long](0)
      assert(native === typed, s"seed=$seed")
      // and both equal the reference sort
      val ref = data.sortBy { case (s, t) => (-s, t) }.take(7).map(_._2)
      assert(native === ref, s"seed=$seed")
    }
  }

  test("q22 rank-interpolated quantiles match percentile() incl. all-NULL groups") {
    import spark.implicits._
    // synthetic lineitem slice: group C has every l_extendedprice NULL —
    // percentile() keeps the group with a NULL quantile; the scalable
    // rewrite must too (left joins off the full group list)
    // and a NULL group KEY: percentile() keeps NULL as its own group;
    // the rewrite's joins must be null-safe (<=>) to keep it too
    val rows = Seq(
      (Some("A"), Some(1.0), Some(10.0)), (Some("A"), Some(2.0), Some(20.0)),
      (Some("A"), Some(3.0), Some(30.0)), (Some("A"), Some(4.0), None: Option[Double]),
      (Some("B"), Some(5.0), Some(50.0)), (Some("B"), Some(7.0), Some(70.0)),
      (Some("C"), Some(9.0), None), (Some("C"), Some(11.0), None),
      (None: Option[String], Some(13.0), Some(130.0)),
      (None: Option[String], Some(15.0), Some(150.0)))
    val dir = java.nio.file.Files.createTempDirectory("q22null").toString
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = operators.Relational2.q22Percentiles(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.get(1), r.get(2), r.get(3), r.get(4))).toMap
    val expected = graft.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.25)").as("q25"),
           expr("percentile(l_quantity, 0.5)").as("q50"),
           expr("percentile(l_quantity, 0.75)").as("q75"),
           expr("percentile(l_extendedprice, 0.9)").as("price_p90"))
      .collect().map(r => r.getString(0) ->
        (r.get(1), r.get(2), r.get(3), r.get(4))).toMap
    assert(got === expected)
    assert(got("C")._4 === null, "all-NULL group must keep its row with NULL quantile")
    assert(got.contains(null) && got(null)._2 === 14.0,
      "NULL group key must survive the joins with its computed quantiles")
  }

  test("label-propagation clustering equals union-find on generated graphs") {
    import spark.implicits._
    // reliable-checkpoint mode on the last seed: same results, lineage
    // truncated through a durable dir instead of executor memory
    val ckptDir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    (0 until 4).foreach { seed =>
      val rnd = new scala.util.Random(2000 + seed)
      val n = 40
      // sparse random graph + a long chain (stresses multi-round propagation)
      val randomEdges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val chain = (50L until 58L).map(i => (i, i + 1))
      val pairs = (randomEdges ++ chain).distinct
      val mode = if (seed == 3) Some(ckptDir) else None
      val got = Dedup.clusterPairs(pairs.toDF("d1", "d2"), mode)
        .as[(Long, Long)].collect().toMap
      // union-find ground truth with min-id representatives
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      assert(got === expected, s"seed=$seed")
    }
    // the reliable mode must actually have persisted rounds to the dir
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
    val persisted = try w.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally w.close()
    assert(persisted > 0, "reliable checkpoint mode wrote nothing")
  }

  test("clusterPairs with fractional double ids converges correctly (join probe)") {
    import spark.implicits._
    // chain 0.25—0.5—0.75: the labels differ by < 1 unit, so a
    // DECIMAL(38,0) sum probe would see an unchanged sum after round 1
    // (21.25 and 21.0 both land on 21) and stop with 0.75 still labeled
    // 0.5 — the premature-convergence bug the IntegralType gate prevents
    val pairs = Seq((0.5, 0.25), (0.75, 0.5), (10.25, 10.125)).toDF("d1", "d2")
    val got = Dedup.clusterPairs(pairs).as[(Double, Double)].collect().toMap
    assert(got === Map(0.25 -> 0.25, 0.5 -> 0.25, 0.75 -> 0.25,
      10.125 -> 10.125, 10.25 -> 10.125))
  }

  test("clusterPairs releases superseded per-round checkpoint blocks deterministically") {
    import spark.implicits._
    // A 12-node chain forces ~12 min-label propagation rounds, i.e.
    // ~12 per-round localCheckpoints per call. Before the lifecycle fix
    // each survived until the async ContextCleaner got to it, so
    // repeated calls in one long-lived session accumulated block-manager
    // debt (the r8 bench instability: c05 92.5 s worst case, s11's
    // monotone 4.3→18 s climb). Now each superseded round is unpersisted
    // (blocking) the moment its successor materializes: after k calls
    // only the k final label frames (plus at most the async-released
    // edge caches) may still hold blocks.
    def cachedNow() = spark.sparkContext.getRDDStorageInfo.length
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val base = cachedNow()
    val calls = 3
    (0 until calls).foreach { _ =>
      assert(Dedup.clusterPairs(pairs).count() === 13)
    }
    val leaked = cachedNow() - base
    assert(leaked <= 2 * calls,
      s"clusterPairs left $leaked cached RDDs after $calls calls — per-round checkpoints not released")
  }

  test("from_json ∘ to_json = identity on generated nested records") {
    import spark.implicits._
    val gen = for {
      a <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
      b <- Gen.alphaNumStr.map(_.take(20))
      c <- Gen.chooseNum(-1e6, 1e6).map(v => math.round(v * 100) / 100.0)
      d <- Gen.listOf(Gen.chooseNum(0, 100)).map(_.take(5))
    } yield (a, b, c, d)
    forAllSamples(Gen.listOfN(30, gen), 5) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("a", "b", "c", "d")
        val schema = df.schema
        val roundTripped = df
          .select(from_json(to_json(struct($"a", $"b", $"c", $"d")), schema).as("s"))
          .select($"s.a", $"s.b", $"s.c", $"s.d")
        assert(roundTripped.collect().toSeq === df.collect().toSeq)
      }
    }
  }

  test("exact dedup is idempotent on generated corpora: dedup ∘ dedup = dedup") {
    import spark.implicits._
    forAllSamples(Gen.listOfN(40, text), 5) { texts =>
      if (texts.nonEmpty) {
        // duplicate some rows deliberately
        val corpus = (texts ++ texts.take(10)).zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val once = corpus.groupBy(sha2($"text", 256).as("h"))
          .agg(min($"doc_id").as("keep_id"))
        val twice = once.join(corpus, once("keep_id") === corpus("doc_id"))
          .groupBy(sha2($"text", 256).as("h2")).agg(min($"doc_id").as("keep_id"))
        assert(once.count() === twice.count())
        assert(once.select("keep_id").collect().map(_.getLong(0)).sorted.toSeq ===
               twice.select("keep_id").collect().map(_.getLong(0)).sorted.toSeq)
      }
    }
  }

  test("minhash signature agreement estimates exact Jaccard within 0.2 on generated pairs") {
    import spark.implicits._
    val pairGen = for {
      base <- Gen.chooseNum(20, 60).flatMap(n => Gen.listOfN(n, word))
      nMut <- Gen.chooseNum(0, 8)
      muts <- Gen.listOfN(nMut, word)
    } yield (base.mkString(" "), (base.drop(nMut) ++ muts).mkString(" "))
    forAllSamples(Gen.listOfN(10, pairGen), 3) { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.zipWithIndex
          .flatMap { case ((t1, t2), i) => Seq((i.toLong * 2, t1), (i.toLong * 2 + 1, t2)) }
          .toDF("doc_id", "text")
          .select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
          .filter(size($"sh") > 0)
          .select($"doc_id", $"sh", Dedup.minhashSignature($"sh").as("sig"))
        val rows = df.collect().map(r =>
          r.getLong(0) -> (r.getSeq[Long](1).toSet, r.getSeq[Long](2))).toMap
        pairs.indices.foreach { i =>
          for {
            (s1, g1) <- rows.get(i.toLong * 2)
            (s2, g2) <- rows.get(i.toLong * 2 + 1)
          } {
            val exact = (s1 & s2).size.toDouble / (s1 | s2).size
            val est = g1.zip(g2).count { case (a, b) => a == b }.toDouble / g1.size
            assert(math.abs(est - exact) <= 0.2,
              s"pair $i: minhash est $est vs exact $exact")
          }
        }
      }
    }
  }

  test("sketch-pruned budget ≡ exact on random corpora, incl. budgets AT a prefix boundary") {
    import spark.implicits._
    import graft.operators.{Curation, TextAnalysis}
    import graft.functions.BpeEncode
    // the c11/c15 cut proof has one sharp corner: better-mass exactly
    // equal to the budget. Random corpora alone almost never land
    // there, so for every corpus the budget sweep INCLUDES exact
    // per-source cumulative prefix sums (where cum_tok == budget admits
    // the boundary doc) alongside tiny/huge budgets
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    (0 until 4).foreach { seed =>
      val rnd = new scala.util.Random(7000 + seed)
      val rows = (0L until (30 + rnd.nextInt(30)).toLong).map { i =>
        val n = 4 + rnd.nextInt(36)
        (i, s"s${rnd.nextInt(3)}",
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docs = rows.toDF("doc_id", "source", "text")
      // whitespace denomination: exact window vs pruned two-pass
      def wsAdmit(b: Long) = Curation.tokenBudgetAdmission(docs, b)
        .as[(Long, String, Long, Long)].collect().toSet
      // boundary budgets: actual cumulative sums in the admission order
      val cums = wsAdmit(Long.MaxValue / 4).toSeq.map(_._4)
      val budgets = (Seq(1L, 7L, 100000L) ++
        Seq.fill(3)(cums(rnd.nextInt(cums.size)))).distinct
      budgets.foreach { b =>
        val exact = wsAdmit(b)
        val pruned = Curation.tokenBudgetAdmissionPruned(docs, b)
          .as[(Long, String, Long, Long)].collect().toSet
        assert(exact === pruned, s"seed=$seed budget=$b (whitespace)")
      }
      // BPE denomination: pruned two-pass vs a local exact recompute
      val merges = TextAnalysis.bpeTrain(docs.select($"doc_id", $"text"), 20)
      val nTok = size(BpeEncode($"text", merges)).cast("long")
      val scored = docs.select($"doc_id", $"source",
          round(TextAnalysis.qualityScoreCol($"text"), 6).as("q"), nTok.as("n"))
        .as[(Long, String, Double, Long)].collect()
      def exactBpe(b: Long) = scored.groupBy(_._2).iterator.flatMap {
        case (_, rs) =>
          val ordered = rs.sortBy(r => (-r._3, r._1))
          val cs = ordered.scanLeft(0L)(_ + _._4).tail
          ordered.zip(cs).takeWhile(_._2 <= b)
            .map { case (r, c) => (r._1, r._2, r._4, c) }
      }.toSet
      val bpeCums = exactBpe(Long.MaxValue / 4).toSeq.map(_._4)
      val bpeBudgets = (Seq(3L, 40L, 100000L) ++
        Seq.fill(3)(bpeCums(rnd.nextInt(bpeCums.size)))).distinct
      bpeBudgets.foreach { b =>
        val pruned = Curation.tokenBudgetAdmissionPrunedWith(docs, b, nTok)
          .as[(Long, String, Long, Long)].collect().toSet
        assert(exactBpe(b) === pruned, s"seed=$seed budget=$b (bpe)")
      }
    }
  }

  test("c23 kappa integer identity ≡ textbook (po−pe)/(1−pe) on generated confusion matrices") {
    // the DECIMAL(38,0) identity κ = (n·(n11+n00) − B)/(n² − B) with
    // B = (n11+n10)(n11+n01)+(n01+n00)(n10+n00) must equal the
    // floating-point textbook form wherever the latter is defined —
    // including cell counts far past BIGINT-squaring territory
    val cell = Gen.oneOf(Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 4000000000L))
    val m = for { a <- cell; b <- cell; c <- cell; d <- cell } yield (a, b, c, d)
    forAllSamples(m, 300) { case (n11, n10, n01, n00) =>
      val n = n11 + n10 + n01 + n00
      if (n > 0) {
        val bb = BigInt(n11 + n10) * BigInt(n11 + n01) +
          BigInt(n01 + n00) * BigInt(n10 + n00)
        val n2 = BigInt(n) * BigInt(n)
        if (n2 != bb) {
          val ident = (BigDecimal(BigInt(n) * BigInt(n11 + n00) - bb) /
            BigDecimal(n2 - bb)).toDouble
          val po = (n11 + n00).toDouble / n
          val pe = (BigDecimal(bb) / BigDecimal(n2)).toDouble
          val textbook = (po - pe) / (1.0 - pe)
          // 1e-6, not 1e-12: the residual is cancellation in the
          // TEXTBOOK float form as pe → 1 (po−pe and 1−pe both small)
          // — the identity side is exact rational arithmetic, which is
          // why the operator ships the identity, not the textbook form
          assert(math.abs(ident - textbook) < 1e-6,
            s"($n11,$n10,$n01,$n00): $ident vs $textbook")
          assert(ident >= -1.0 - 1e-9 && ident <= 1.0 + 1e-9)
        }
      }
    }
  }

  test("t39 bit-length class equals floor(log2) arithmetic for any positive count") {
    // len(bin(x)) − 1 == ⌊log2 x⌋ exactly — including above 2^53 where
    // a floating log2 would round; the per-token class N-vs-c identity
    // follows for every (c ≤ N) pair
    val x = Gen.oneOf(Gen.chooseNum(1L, 1L << 20),
      Gen.chooseNum(1L, Long.MaxValue))
    (samples(x, 500) ++ Seq(1L, 2L, 3L, 4L, (1L << 53) - 1, 1L << 53,
      (1L << 53) + 1, Long.MaxValue)).foreach { v =>
      val bits = java.lang.Long.toBinaryString(v).length
      // bin-string length is exactly ⌊log2 v⌋ + 1: 2^(bits-1) ≤ v < 2^bits
      assert((BigInt(1) << (bits - 1)) <= BigInt(v) &&
        BigInt(v) < (BigInt(1) << bits), s"x=$v class off")
    }
  }
}
