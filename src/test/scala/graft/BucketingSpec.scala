package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed on the join key
  * land pre-partitioned, so the join plans with NO Exchange (shuffle) —
  * the production layout for the recurring fact⋈fact joins at 100 TB
  * (SURVEY §7 M5 / the "bucketing for co-located joins" scale item). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle") {
    import spark.implicits._
    // default warehouse dir (spark-warehouse/, gitignored); tables
    // dropped in finally
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // disable broadcast so the join would otherwise shuffle both sides
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(spark, sf0001)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      Tables.orders(spark, sf0001)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an Exchange on either side;
      // the only allowed exchange is the final single aggregation
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      // and it still computes the right answer
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val actual = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(actual === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("IVF probes over a cluster-partitioned corpus are partition-pruned scans") {
    import spark.implicits._
    // SCALE.md's claim for s03 at 100 TB: write the bucketed corpus
    // partitioned by cluster id and a probe of nprobe clusters reads
    // only those partitions' files — proof via PartitionFilters in the
    // scan plan plus the partitions-scanned count
    val dir = java.nio.file.Files.createTempDirectory("ivf-part").toString
    val k = 5
    Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("cluster_id", pmod(xxhash64($"vec_id"), lit(k)).cast("int"))
      .write.partitionBy("cluster_id").mode("overwrite").parquet(dir)
    val probed = spark.read.parquet(dir).filter($"cluster_id".isin(0, 2))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(600))
    val scan = probed.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum > 0)
    // the probe touches 2 of k partitions, never the full corpus
    val partsRead = scan.relation.location.listFiles(scan.partitionFilters, Nil).size
    assert(partsRead === 2, s"expected 2 pruned partitions, scanned $partsRead")
    // and the rows really are only those clusters'
    val clusters = probed.select($"cluster_id").distinct()
      .as[Int].collect().toSet
    assert(clusters === Set(0, 2))
  }

  test("t25 materialized postings index bucketed by token: query join drops the postings shuffle") {
    import spark.implicits._
    // SCALE.md's claim for BM25 at 100 TB: tf/df/dlen are the
    // materialized index, "stored bucketed by token" — so the recurring
    // query-time join re-shuffles only the (tiny) query-term side, never
    // the corpus postings. Proof: the same join against a bucketed vs a
    // plain copy of the postings has exactly one fewer Exchange, and the
    // bucketed scan is bucket-aware.
    spark.sql("DROP TABLE IF EXISTS tf_b")
    spark.sql("DROP TABLE IF EXISTS tf_plain")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      val tf = docs.select($"doc_id", explode(split($"text", " ")).as("token"))
        .filter(length($"token") > 0)
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
      tf.write.bucketBy(8, "token").sortBy("token")
        .mode("overwrite").saveAsTable("tf_b")
      tf.write.mode("overwrite").saveAsTable("tf_plain")
      val qt = docs.filter($"doc_id" < 20)
        .select($"doc_id".as("q_id"), explode(split($"text", " ")).as("token"))
        .filter(length($"token") > 0).distinct()
      def joined(t: String) = spark.table(t).join(qt, "token")
      val bPlan = joined("tf_b").queryExecution.executedPlan.toString
      val pPlan = joined("tf_plain").queryExecution.executedPlan.toString
      def exchanges(p: String) = "Exchange".r.findAllIn(p).size
      assert(bPlan.contains("SelectedBucketsCount"), bPlan.take(600))
      assert(exchanges(bPlan) === exchanges(pPlan) - 1,
        s"bucketed join should drop exactly the postings shuffle:\n$bPlan")
      // and the answers agree
      val a = joined("tf_b").collect().map(_.toSeq).toSet
      val b = joined("tf_plain").collect().map(_.toSeq).toSet
      assert(a === b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS tf_b")
      spark.sql("DROP TABLE IF EXISTS tf_plain")
    }
  }

  test("basic auth header (A5/A6): RFC 7617 token, absent when unconfigured") {
    import graft.ingest._
    assert(EsRestAuth.basicAuthHeader("", "x") === None)
    val Some((k, v)) = EsRestAuth.basicAuthHeader("elastic", "changeme")
    assert(k === "Authorization")
    assert(v === "Basic " + java.util.Base64.getEncoder
      .encodeToString("elastic:changeme".getBytes("UTF-8")))
    val cfg = IngestionConfig.fromArgs(Seq("sink.username=u", "sink.password=p"))
    val headers = EsRestAuth.bulkHeaders(cfg)
    assert(headers("Content-Type") === "application/x-ndjson")
    assert(headers.contains("Authorization"))
    assert(EsRestAuth.baseUrls(cfg.sinkUrls) === Seq("http://localhost:9200"))
  }
}
