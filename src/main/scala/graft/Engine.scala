package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade: one call registers the corpus tables as temp
  * views and the engine's custom functions in the session's function
  * registry, after which the full surface is available through plain
  * `spark.sql` — the "switch from the reference" entry point.
  *
  * {{{
  *   val spark = Engine.session()
  *   Engine.attach(spark, "/data/corpus")
  *   spark.sql("SELECT minhash_band_keys(shingle_hashes(text)) FROM documents")
  * }}}
  */
object Engine {

  /** Opinionated local session defaults (AQE on, UTC, sane shuffle
    * parallelism); on a cluster, spark-submit conf wins. */
  def session(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
              shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    registerFunctions(s)
    s
  }

  /** Register the test-corpus parquet tables as temp views. */
  def attach(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Register the engine's native expressions for SQL callers. */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("shingle_hashes",
      es => functions.ShingleHashes(es.head, 3, 4294967291L), "scala_udf")
    registry.createOrReplaceTempFunction("minhash_sig",
      es => functions.MinHashSig(es.head,
        operators.Dedup.permAB.map(_._1).toArray,
        operators.Dedup.permAB.map(_._2).toArray, 4294967291L), "scala_udf")
    registry.createOrReplaceTempFunction("minhash_band_keys",
      es => functions.BandKeys(es.head, 16), "scala_udf")
    registry.createOrReplaceTempFunction("simhash64",
      es => functions.SimHash64(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("dot_product",
      es => functions.DotProduct(es(0), es(1)), "scala_udf")
    registry.createOrReplaceTempFunction("l2_norm",
      es => functions.L2Norm(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("exact_qsum",
      es => functions.ExactQuantizedSum(es.head).toAggregateExpression(), "scala_udf")
    // token_set_count(text, 'w1,w2,...') — the comma-joined word list
    // must be a literal (it compiles into the expression); non-literal
    // args fail analysis with a clear message
    registry.createOrReplaceTempFunction("token_set_count",
      es => functions.TokenSetCount(es.head,
        functions.TokenSetCount.parseWordList(es(1))), "scala_udf")
    registry.createOrReplaceTempFunction("char_shingle_hashes",
      es => functions.CharShingleHashes(es.head, 5, 4294967291L), "scala_udf")
    registry.createOrReplaceTempFunction("mod_filter",
      es => functions.ModFilter(es(0),
        functions.ModFilter.literalLong(es(1), "m"),
        functions.ModFilter.literalLong(es(2), "r")), "scala_udf")
    // per-group top-k for SQL callers — topk(score, tag, k) with a
    // literal k, null-skipping, O(k) state (native TypedImperative
    // form; the typed-Aggregator tier remains TopKAggregator via q43)
    registry.createOrReplaceTempFunction("topk",
      es => functions.TopKTags.forSql(es(0), es(1), es(2)), "scala_udf")
  }

  /** Run SQL against an attached session. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
