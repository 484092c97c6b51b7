package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.Det._

/** Tier C1 relational surface, part 5: the hardest TPC-H subquery
  * shapes — correlated aggregate equality (Q2/Q17 family), chained
  * EXISTS / NOT EXISTS against the same fact (Q21 family), and CTE +
  * aggregate-equality selection (Q15 family) — exercising Catalyst's
  * subquery decorrelation end-to-end. Authored in SQL via the Engine
  * view surface where the SQL shape *is* the point.
  */
object Relational5 {

  /** Correlated MAX equality (TPC-H Q2's shape on this schema): each
    * customer's single most expensive order. Decorrelates to a
    * max-per-key join; equality on 2-decimal doubles is exact. */
  def q55CorrelatedMax(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  val q55Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  /** TPC-H Q21 shape: suppliers with a late line on a multi-supplier
    * order where no OTHER supplier was late — EXISTS + NOT EXISTS, both
    * correlated against the same fact table. */
  def q56MultiExists(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate)
        |GROUP BY s_name""".stripMargin)
  }

  val q56Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate)
      |GROUP BY s_name""".stripMargin

  /** TPC-H Q15 shape: CTE of per-supplier revenue, select the
    * supplier(s) achieving the global maximum (aggregate equality over
    * a CTE — exact through the deterministic decimal revenue). */
  def q57CteMax(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         |      AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin)
  }

  val q57Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin

  /** rank vs dense_rank over real ties (integer-valued quantities):
    * tied rows share a rank; rank skips, dense_rank doesn't — both
    * deterministic under ties by definition. */
  def q58RankDense(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"l_quantity".asc)
    lineitem(s, d)
      .filter($"l_orderkey" <= 1000)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_quantity",
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
  }

  val q58Sql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
      |  RANK() OVER w AS rk,
      |  DENSE_RANK() OVER w AS drk
      |FROM lineitem
      |WHERE l_orderkey <= 1000
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC)""".stripMargin

  /** Keyset-free pagination: total-ordered LIMIT+OFFSET (page 3 of the
    * balance ranking). Deterministic via the unique tie-break. */
  def q59LimitOffset(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      .offset(20)
      .limit(10)
      .select($"c_custkey", $"c_acctbal")
  }

  val q59Sql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey ASC
      |LIMIT 10 OFFSET 20""".stripMargin

  /** split_part + string decomposition of structured identifiers. */
  def q60SplitPart(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    nation(s, d).select($"n_nationkey",
      split_part($"n_name", lit("_"), lit(1)).as("prefix"),
      split_part($"n_name", lit("_"), lit(2)).cast("int").as("num"),
      split_part($"n_name", lit("_"), lit(-1)).as("last_part"))
  }

  val q60Sql: String =
    """SELECT n_nationkey,
      |  split_part(n_name, '_', 1) AS prefix,
      |  CAST(split_part(n_name, '_', 2) AS INTEGER) AS num,
      |  split_part(n_name, '_', -1) AS last_part
      |FROM nation""".stripMargin

  /** Null-safe / failure-safe scalar semantics: try_cast (malformed →
    * NULL, not error), try_divide-by-zero, and the null-safe equality
    * operator <=> vs plain = on NULLs. */
  def q61TrySemantics(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      """SELECT p_partkey,
        |  TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
        |  TRY_CAST(SUBSTR(p_brand, 7) AS INTEGER) AS brand_num,
        |  TRY_DIVIDE(p_retailprice, p_size - p_size) AS div_zero,
        |  (NULLIF(p_size, p_size) <=> NULL) AS nullsafe_eq,
        |  (NULLIF(p_size, p_size) = NULL) AS plain_eq
        |FROM part WHERE p_partkey <= 100""".stripMargin)
  }

  val q61Sql: String =
    """SELECT p_partkey,
      |  TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
      |  TRY_CAST(SUBSTR(p_brand, 7) AS INTEGER) AS brand_num,
      |  p_retailprice / NULLIF(p_size - p_size, 0) AS div_zero,
      |  (NULLIF(p_size, p_size) IS NOT DISTINCT FROM NULL) AS nullsafe_eq,
      |  (NULLIF(p_size, p_size) = NULL) AS plain_eq
      |FROM part WHERE p_partkey <= 100""".stripMargin

  /** Inline VALUES relation joined against a table (the constant-dim
    * pattern without a file). */
  def q62InlineValues(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      """SELECT r.r_name, t.hemisphere, COUNT(*) AS n_nations
        |FROM nation n
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |JOIN (VALUES ('AFRICA', 'south'), ('AMERICA', 'west'),
        |             ('ASIA', 'east'), ('EUROPE', 'north'),
        |             ('MIDDLE EAST', 'center')) AS t(rname, hemisphere)
        |  ON r.r_name = t.rname
        |GROUP BY r.r_name, t.hemisphere""".stripMargin)
  }

  val q62Sql: String =
    """SELECT r.r_name, t.hemisphere, COUNT(*) AS n_nations
      |FROM nation n
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |JOIN (VALUES ('AFRICA', 'south'), ('AMERICA', 'west'),
      |             ('ASIA', 'east'), ('EUROPE', 'north'),
      |             ('MIDDLE EAST', 'center')) AS t(rname, hemisphere)
      |  ON r.r_name = t.rname
      |GROUP BY r.r_name, t.hemisphere""".stripMargin

  /** GROUPING() indicators distinguish "NULL because subtotal row" from
    * "NULL data" in rollup output. */
  def q63GroupingId(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag) AS g_flag,
        |  GROUPING(l_linestatus) AS g_status,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
  }

  val q63Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g_flag,
      |  GROUPING(l_linestatus) AS g_status,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** q67: recursive CTE — `WITH RECURSIVE` landed in Spark 4, closing
    * the one relational construct this surface previously reached only
    * through the iterative-DataFrame form (d08's clusterPairs). The
    * workload: ancestor chains by integer halving over customer keys
    * (cur → ⌊cur/2⌋ until 1), depth histogram — ~log₂(maxkey) recursion
    * rounds, each a narrow projection, identical arithmetic in DuckDB.
    * Same SQL text runs on both engines. */
  def q67RecursiveCte(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(q67Sql)
  }

  val q67Sql: String =
    """WITH RECURSIVE anc(start, cur, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT start, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
      |  FROM anc WHERE cur > 1
      |), depths AS (
      |  SELECT start AS c_custkey, MAX(depth) AS depth_to_root
      |  FROM anc GROUP BY start
      |)
      |SELECT depth_to_root, CAST(COUNT(*) AS BIGINT) AS n
      |FROM depths GROUP BY depth_to_root""".stripMargin

  /** q70: ordered string aggregation — Spark 4's `listagg` with
    * `WITHIN GROUP (ORDER BY …)` (SPARK-42746), the report-building
    * aggregate (CSV cells, label lists). The explicit order is what
    * makes it deterministic — an unordered listagg varies with
    * partitioning. Oracle uses DuckDB's dialect (`string_agg` with an
    * in-argument ORDER BY): same semantics, independently implemented. */
  def q70ListAgg(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      """SELECT r_name,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name""".stripMargin)
  }

  val q70Sql: String =
    """SELECT r_name,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |GROUP BY r_name""".stripMargin

  /** q71: `GROUP BY ALL` — group by every non-aggregate select item
    * (Spark 4 / DuckDB shared dialect; the same SQL text runs on both
    * engines, so the oracle also checks the resolution rule itself). */
  def q71GroupByAll(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(q71Sql)
  }

  val q71Sql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-01-01'
      |GROUP BY ALL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_listagg"        -> (q70ListAgg _),
    "q71_group_by_all"   -> (q71GroupByAll _),
    "q67_recursive_cte"  -> (q67RecursiveCte _),
    "q61_try_semantics"  -> (q61TrySemantics _),
    "q62_inline_values"  -> (q62InlineValues _),
    "q63_grouping_id"    -> (q63GroupingId _),
    "q59_limit_offset"   -> (q59LimitOffset _),
    "q60_split_part"     -> (q60SplitPart _),
    "q58_rank_dense"     -> (q58RankDense _),
    "q55_correlated_max" -> (q55CorrelatedMax _),
    "q56_multi_exists"   -> (q56MultiExists _),
    "q57_cte_max"        -> (q57CteMax _),
  )

  val oracles: Map[String, String] = Map(
    "q70_listagg"        -> q70Sql,
    "q71_group_by_all"   -> q71Sql,
    "q67_recursive_cte"  -> q67Sql,
    "q61_try_semantics"  -> q61Sql,
    "q62_inline_values"  -> q62Sql,
    "q63_grouping_id"    -> q63Sql,
    "q59_limit_offset"   -> q59Sql,
    "q60_split_part"     -> q60Sql,
    "q58_rank_dense"     -> q58Sql,
    "q55_correlated_max" -> q55Sql,
    "q56_multi_exists"   -> q56Sql,
    "q57_cte_max"        -> q57Sql,
  )
}
