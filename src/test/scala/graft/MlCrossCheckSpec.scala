package graft

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Independent cross-validation: spark.ml's MinHashLSH (a completely
  * separate implementation — CountVectorizer sparse vectors + its own
  * hash family) must find the same near-dup pairs as our native
  * MinHash+LSH pipeline on the fixture. */
class MlCrossCheckSpec extends SparkSpec {

  test("spark.ml MinHashLSH approxSimilarityJoin agrees with d04 on near-dup pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .filter(size($"sh") > 0)
    val cv = new CountVectorizer().setInputCol("sh").setOutputCol("features")
      .setBinary(true).fit(docs)
    val vecs = cv.transform(docs).select($"doc_id", $"features")
    val lsh = new MinHashLSH().setNumHashTables(16).setSeed(42)
      .setInputCol("features").setOutputCol("hashes").fit(vecs)
    // Jaccard distance threshold 0.2 == similarity 0.8
    val mlPairs = lsh.approxSimilarityJoin(vecs, vecs, 0.2, "dist")
      .select($"datasetA.doc_id".as("d1"), $"datasetB.doc_id".as("d2"))
      .filter($"d1" < $"d2")
      .distinct()
      .as[(Long, Long)].collect().toSet
    val ours = Dedup.d04MinhashLsh(spark, sf001)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(ours === mlPairs,
      s"ml-only: ${mlPairs -- ours}, ours-only: ${ours -- mlPairs}")
  }
}
