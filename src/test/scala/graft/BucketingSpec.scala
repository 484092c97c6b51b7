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
