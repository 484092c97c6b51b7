package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {

  test("mod-p fingerprints: near-dup pairs share most elements, random pairs don't") {
    import spark.implicits._
    val fp = TextAnalysis.t08ModpFingerprint(spark, sf001)
      .select($"doc_id", split($"fp", ",").as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty).toSet).toMap
    val truePairs = Dedup.d03NgramJaccard(spark, sf001)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(truePairs.nonEmpty)
    truePairs.foreach { case (a, b) =>
      val (fa, fb) = (fp(a), fp(b))
      // 1/8 sampling can leave a very short doc with an empty
      // fingerprint — no overlap evidence either way, skip
      if (fa.nonEmpty && fb.nonEmpty) {
        val j = (fa & fb).size.toDouble / (fa | fb).size
        assert(j >= 0.6, s"near-dup pair ($a,$b) fingerprint overlap $j")
      }
    }
    // a handful of random non-dup pairs overlap far less
    val ids = fp.keys.toSeq.sorted.take(20)
    val rnd = for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val trueSet = truePairs.toSet
    val overlaps = rnd.filterNot(trueSet.contains).take(50).map { case (a, b) =>
      (fp(a) & fp(b)).size.toDouble / math.max(1, (fp(a) | fp(b)).size)
    }
    assert(overlaps.max < 0.5, s"random-pair fingerprint overlap too high: ${overlaps.max}")
  }

  test("bpe token counts exceed whitespace counts only when punctuation/digits split") {
    import spark.implicits._
    val rows = TextAnalysis.t07BpeTokens(spark, sf0001).collect()
    rows.foreach { r =>
      // space-separated word-only text: BPE-ish count == whitespace count
      assert(r.getInt(2) >= r.getInt(1) - 1)
    }
  }
}
