package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Data-layout operators: multi-dimensional (Z-order / Morton)
  * clustering keys and the range-partitioned file layout built on them.
  *
  * Why this is an operator and not an afterthought: at 100 TB the
  * dominant cost of every query is the scan, and the scan's cost is
  * decided by LAYOUT — parquet min/max (and partition) pruning can only
  * skip a file if the file's value range is narrow on the filtered
  * column. A linear sort gives narrow ranges on ONE column; a Z-order
  * key interleaves the bits of several columns so a range-partitioned
  * write yields files whose min/max envelope is narrow on ALL of them —
  * predicate pushdown then skips files for filters on any clustered
  * dimension ([[graft.LayoutSpec]] measures exactly this). The same
  * public design appears in lakehouse table formats (e.g. Delta
  * OPTIMIZE ZORDER BY); here it is expressed as a pure DataFrame
  * transform: bucket each column by its global min/max, interleave the
  * bucket bits, `repartitionByRange` + sort by the key, write.
  *
  * The key computation is one narrow projection over a broadcast 1-row
  * min/max aggregate — no shuffle beyond the final range partitioner,
  * which any clustered write needs anyway. All arithmetic is exact
  * IEEE-double + integer bit ops, identical in Spark and DuckDB, so the
  * driver hash-checks the key itself (q68).
  */
object Layout {

  /** Bits per dimension; 2 dims × 16 bits = 32-bit Z-value. */
  val Bits = 16

  private val Buckets = 1 << Bits // 65536

  /** Scale a value into [0, 2^bits) by its column's global [min, max].
    * A constant column (mx = mn) buckets to 0 everywhere. */
  private def bucket(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      least(lit(Buckets - 1L),
        floor((x - mn) / (mx - mn) * lit(Buckets.toDouble)).cast("long")))

  /** Interleave the low `Bits` bits of two bucket ids (x gets the odd
    * bit positions, y the even) — the Morton / Z-curve index. Public as
    * the SQL function `morton_interleave` for callers that bucket their
    * own dimensions. */
  def interleave(bx: Column, by: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(bx, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(by, i).bitwiseAND(lit(1L)), 2 * i)
    }

  /** The same interleave as a raw Catalyst expression tree, for the
    * SQL function registries (a Column built from the public functions
    * API holds unresolved nodes that cannot be embedded in a registry
    * builder's expression). Same bit arithmetic, codegen-friendly. */
  def interleaveExpr(bx: org.apache.spark.sql.catalyst.expressions.Expression,
                     by: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    def bit(e: Expression, i: Int, pos: Int): Expression =
      ShiftLeft(BitwiseAnd(ShiftRight(e, Literal(i)), Literal(1L)), Literal(pos))
    (0 until Bits).foldLeft(Literal(0L): Expression) { (acc, i) =>
      Add(Add(acc, bit(bx, i, 2 * i + 1)), bit(by, i, 2 * i))
    }
  }

  /** Append a `zkey` column: the Z-order key of (colA, colB), bucketed
    * by each column's global min/max (computed in one broadcast 1-row
    * aggregate — no collect, no second shuffle). */
  def withZorderKey(df: DataFrame, colA: String, colB: String): DataFrame = {
    val mm = df.agg(
      min(col(colA)).cast("double").as("mn_a"),
      max(col(colA)).cast("double").as("mx_a"),
      min(col(colB)).cast("double").as("mn_b"),
      max(col(colB)).cast("double").as("mx_b"))
    df.crossJoin(broadcast(mm))
      .withColumn("zkey", interleave(
        bucket(col(colA).cast("double"), col("mn_a"), col("mx_a")),
        bucket(col(colB).cast("double"), col("mn_b"), col("mx_b"))))
      .drop("mn_a", "mx_a", "mn_b", "mx_b")
  }

  /** Write `df` as `numFiles` parquet files range-clustered on the
    * Z-order key of (colA, colB): files end up with narrow min/max
    * envelopes on BOTH columns, so a filter on either prunes files. */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
                   outDir: String, numFiles: Int): Unit =
    withZorderKey(df, colA, colB)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(outDir)

  /** q68: the Z-order key of every order on (o_custkey, o_totalprice) —
    * the hash-checkable core of the layout path. */
  def q68Zorder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withZorderKey(orders(s, d), "o_custkey", "o_totalprice")
      .select($"o_orderkey", $"zkey")
  }

  private def interleaveSql(bx: String, by: String): String =
    (0 until Bits).map(i =>
      s"((($bx >> $i) & 1) << ${2 * i + 1}) + ((($by >> $i) & 1) << ${2 * i})")
      .mkString(" + ")

  private def bucketSql(x: String, mn: String, mx: String): String =
    s"""CASE WHEN $mx = $mn THEN 0
       |     ELSE LEAST(${Buckets - 1}, CAST(FLOOR(($x - $mn) / ($mx - $mn) * ${Buckets}.0) AS BIGINT))
       |END""".stripMargin

  val q68Sql: String =
    s"""WITH mm AS (
       |  SELECT CAST(MIN(o_custkey) AS DOUBLE) AS mn_a, CAST(MAX(o_custkey) AS DOUBLE) AS mx_a,
       |         CAST(MIN(o_totalprice) AS DOUBLE) AS mn_b, CAST(MAX(o_totalprice) AS DOUBLE) AS mx_b
       |  FROM orders
       |), b AS (
       |  SELECT o_orderkey,
       |    ${bucketSql("CAST(o_custkey AS DOUBLE)", "mn_a", "mx_a")} AS bx,
       |    ${bucketSql("CAST(o_totalprice AS DOUBLE)", "mn_b", "mx_b")} AS by
       |  FROM orders CROSS JOIN mm
       |)
       |SELECT o_orderkey, ${interleaveSql("bx", "by")} AS zkey FROM b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_zorder" -> (q68Zorder _),
  )

  val oracles: Map[String, String] = Map(
    "q68_zorder" -> q68Sql,
  )
}
