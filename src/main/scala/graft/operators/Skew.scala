package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Skew-mitigation utilities for 100 TB shuffles. AQE's skew-join
  * handling covers sort-merge joins automatically; these cover the two
  * cases it does not: skewed *aggregation* over heavy-hitter keys, and
  * broadcast-infeasible joins where one side's key histogram is
  * power-law.
  */
object Skew {

  /** Salted equi-join: spread each left row across `salts` partitions
    * deterministically (hash of the whole row, not a random — keeps the
    * operator re-runnable/idempotent), replicate the right side once per
    * salt, join on (key, salt). Output equals the plain join. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }

  /** Two-phase distinct count per (possibly heavy-hitter) key: phase 1
    * dedups on (key, value) — a shuffle whose key space is the full
    * pair, so a hot key spreads across partitions — phase 2 counts per
    * key. Equivalent to COUNT(DISTINCT value) GROUP BY key without
    * funneling a hot key through one task. */
  def q41SkewDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .select($"l_returnflag", $"l_partkey").distinct()
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_parts"))
  }

  val q41Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Salted-join correctness surfaced as a query: the salted join of
    * lineitem (skewed on 3-value l_returnflag) against a tiny flag dim,
    * aggregated — oracled by the plain SQL join. */
  def q42SaltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flagDim = s.createDataFrame(Seq(("A", 1.0), ("N", 2.0), ("R", 3.0)))
      .toDF("flag", "weight")
    saltedJoin(lineitem(s, d).select($"l_returnflag", $"l_quantity"),
        flagDim, "l_returnflag", "flag", salts = 8)
      .groupBy($"l_returnflag")
      .agg(graft.Det.dsum($"l_quantity" * $"weight").as("weighted_qty"),
           count(lit(1)).as("n"))
  }

  val q42Sql: String =
    s"""SELECT l_returnflag,
       |  ${graft.Det.sqlSum("l_quantity * weight")} AS weighted_qty,
       |  COUNT(*) AS n
       |FROM lineitem
       |JOIN (VALUES ('A', 1.0), ('N', 2.0), ('R', 3.0)) AS dim(flag, weight)
       |  ON l_returnflag = flag
       |GROUP BY l_returnflag""".stripMargin

  /** Per-group top-k via the bounded [[graft.functions.TopKAggregator]]
    * (C8 UDAF surface): only |groups|·k pairs cross the shuffle — the
    * scale-path alternative to the window row_number of q07. Output
    * matches the window formulation, which is the oracle. */
  def q43TopKAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val topk = udaf(new graft.functions.TopKAggregator(3))
    orders(s, d)
      .groupBy($"o_custkey")
      .agg(topk($"o_totalprice", $"o_orderkey").as("ids"))
      .select($"o_custkey", concat_ws(",", $"ids").as("top_orders"))
  }

  val q43Sql: String =
    """SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_orders
      |FROM (SELECT o_custkey, o_orderkey,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |GROUP BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_skew_distinct" -> (q41SkewDistinct _),
    "q42_salted_join"   -> (q42SaltedJoin _),
    "q43_topk_agg"      -> (q43TopKAgg _),
  )

  val oracles: Map[String, String] = Map(
    "q41_skew_distinct" -> q41Sql,
    "q42_salted_join"   -> q42Sql,
    "q43_topk_agg"      -> q43Sql,
  )
}
