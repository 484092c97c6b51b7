package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator inventory (SURVEY.md §2); every
  * entry with an `oracleSql` counterpart is hash-checked against DuckDB
  * at sf0.01 by the driver. Entries without oracle SQL (approximate /
  * non-SQL-expressible ops) get a rows-only check and are covered by
  * ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Relational2.queries ++
      operators.Relational3.queries ++
      operators.Relational4.queries ++
      operators.Relational5.queries ++
      operators.Layout.queries ++
      operators.Skew.queries ++
      operators.EventAnalytics.queries ++
      operators.Dedup.queries ++
      operators.Curation.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Multimodal.queries ++
      ingest.Emit.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Relational2.oracles ++
      operators.Relational3.oracles ++
      operators.Relational4.oracles ++
      operators.Relational5.oracles ++
      operators.Layout.oracles ++
      operators.Skew.oracles ++
      operators.EventAnalytics.oracles ++
      operators.Dedup.oracles ++
      operators.Curation.oracles ++
      operators.Similarity.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Multimodal.oracles ++
      ingest.Emit.oracles
}
