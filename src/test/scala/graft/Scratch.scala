package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for round-7 perf attribution (not a test). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import operators.Dedup

    def med(label: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val sorted = ts.map(_._1).sorted
      println(f"SCRATCH $label%-28s med=${sorted(2)}%7.3f min=${sorted.head}%7.3f s rows=${ts.head._2}")
    }

    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")

    // warmup
    Dedup.d08DedupClusters(spark, sfDir, None).queryExecution.toRdd.count()
    Dedup.d12CollapsedClusters(spark, sfDir).queryExecution.toRdd.count()
    Dedup.clusterPairs(Dedup.collapsedPairGraph(docs, 0.8)).queryExecution.toRdd.count()
    operators.Curation.c01CurationPipeline(spark, sfDir).queryExecution.toRdd.count()

    med("d08 clusters")(Dedup.d08DedupClusters(spark, sfDir, None).queryExecution.toRdd.count())
    med("d12 old (star graph CC)")(
      Dedup.clusterPairs(Dedup.collapsedPairGraph(docs, 0.8)).queryExecution.toRdd.count())
    med("d12 new (rep-level CC)")(
      Dedup.d12CollapsedClusters(spark, sfDir).queryExecution.toRdd.count())
    med("c01 pipeline")(operators.Curation.c01CurationPipeline(spark, sfDir).queryExecution.toRdd.count())
    med("c02 funnel")(operators.Curation.c02CurationFunnel(spark, sfDir).queryExecution.toRdd.count())
    med("d10 viaCollapse")(
      Dedup.ngramJaccardPairsViaCollapse(docs, 0.8).queryExecution.toRdd.count())
    med("d03 direct")(Dedup.ngramJaccardPairs(docs, 0.8).queryExecution.toRdd.count())

    spark.stop()
  }
}
