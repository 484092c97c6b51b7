package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.Det._

/** Tier C1 relational core (SURVEY.md §2): the full relational-algebra
  * surface the reference gets "for free" once data is exposed as
  * DataFrames. Every query here is declarative — Catalyst does predicate
  * pushdown, column pruning, join selection (broadcast for dims), and
  * AQE re-planning; nothing is hand-scheduled.
  *
  * Scale notes (100 TB):
  *  - dims (region/nation/supplier/part at TPC-H ratios) are broadcast —
  *    marked explicitly with broadcast() so the plan survives stats loss;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key, which is
  *    also the natural bucketing key for a production layout;
  *  - aggregations are partial+final (map-side combine) automatically;
  *  - top-k = orderBy.limit → Spark's TakeOrderedAndProject (no full sort
  *    materialization); per-group top-k = window row_number ≤ k, one
  *    shuffle on the partition key.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan → filter → hash agg (partial+
    * final) → 4-row result. The filter and 7-column projection push into
    * the parquet scan. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" <= lit("2000-01-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_extendedprice")} AS avg_price,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + string predicates; both the LIKE filter and the 4-column
    * read schema reach the parquet scan (PushedFilters / ReadSchema). */
  def q02FilterProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .filter($"p_type".startsWith("ECONOMY") && $"p_size" >= 20 && $"p_brand".like("Brand#1%"))
      .select($"p_partkey", $"p_name", $"p_brand", $"p_retailprice")
  }

  val q02Sql: String =
    """SELECT p_partkey, p_name, p_brand, p_retailprice
      |FROM part
      |WHERE p_type LIKE 'ECONOMY%' AND p_size >= 20 AND p_brand LIKE 'Brand#1%'""".stripMargin

  /** TPC-H Q3-style shipping-priority: fact⋈fact⋈dim, agg, global top-10.
    * orderBy.limit compiles to TakeOrderedAndProject — per-partition
    * top-10 then a driver merge of 32 candidates, no full sort. */
  def q03TopRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = orders(s, d).filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, d).filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  val q03Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  /** EXISTS → left-semi join (TPC-H Q4 shape): no row multiplication, the
    * probe side streams. */
  def q04SemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val l = lineitem(s, d).filter($"l_shipdate" > lit("1997-06-01").cast("timestamp"))
    o.join(l, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q5-style: 6-table join through two broadcast dim hops
    * (nation, region) and three shuffle joins on the fact keys. */
  def q05RegionRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = region(s, d).filter($"r_name" === "ASIA")
    lineitem(s, d)
      .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(supplier(s, d)),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  val q05Sql: String =
    s"""SELECT n_name, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name""".stripMargin

  /** TPC-H Q6-style: pure scan+filter+single-row agg — the pushdown
    * benchmark. All three predicates reach the parquet reader. */
  def q06RevenueFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
              $"l_discount" >= 0.02 && $"l_discount" <= 0.04 &&
              $"l_quantity" < 25)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q06Sql: String =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_discount >= 0.02 AND l_discount <= 0.04
       |  AND l_quantity < 25""".stripMargin

  /** Per-group top-k: row_number over (custkey, totalprice desc) ≤ 3.
    * One shuffle on o_custkey; ties broken by o_orderkey so the result
    * is total-order deterministic. */
  def q07TopPerGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |             ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders)
      |WHERE rn <= 3""".stripMargin

  /** Running/offset window functions over a total order: running decimal
    * sum, lag, lead, rank. Frame order is (shipdate, orderkey, linenumber)
    * — unique, so both engines sum in the identical sequence. */
  def q08RunningWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Seq($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
    val w = Window.partitionBy($"l_suppkey").orderBy(ord: _*)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .filter($"l_suppkey" <= 5)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum($"l_quantity".cast(DecimalType(18, 6))).over(wf).cast("double"))
      .withColumn("prev_qty", lag($"l_quantity", 1).over(w))
      .withColumn("next_qty", lead($"l_quantity", 1).over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity",
        $"rn", $"running_qty", $"prev_qty", $"next_qty")
  }

  val q08Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  ROW_NUMBER() OVER w AS rn,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
      |       OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
      |  LAG(l_quantity, 1) OVER w AS prev_qty,
      |  LEAD(l_quantity, 1) OVER w AS next_qty
      |FROM lineitem
      |WHERE l_suppkey <= 5
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)""".stripMargin

  /** ROLLUP grouping sets: (flag,status), (flag), (). Spark plans one
    * Expand + hash agg — a single shuffle for all three grouping sets. */
  def q09Rollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"), dsum($"l_quantity").as("sum_qty"))
  }

  val q09Sql: String =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       |  ${sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over orders dims. */
  def q10Cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
  }

  val q10Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       |  ${sqlSum("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Set operations: UNION (distinct), INTERSECT, EXCEPT — each is a
    * shuffle-on-full-row dedup; explicit parens keep evaluation order
    * identical in the oracle. */
  def q11SetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val building = customer(s, d).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val bigSpenders = orders(s, d).filter($"o_totalprice" > 400000)
      .select($"o_custkey".as("c_custkey"))
    val positive = customer(s, d).filter($"c_acctbal" > 0)
      .select($"c_custkey")
    val finished = orders(s, d).filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("c_custkey"))
    building.union(bigSpenders).distinct()
      .intersect(positive)
      .except(finished)
  }

  val q11Sql: String =
    """SELECT c_custkey FROM (
      |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |   UNION
      |   SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000)
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 0
      |) EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  /** DISTINCT + exact COUNT(DISTINCT …) multi-column. */
  def q12Distinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).agg(
      countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"),
      countDistinct($"l_suppkey").as("n_suppliers"),
      countDistinct($"l_partkey").as("n_parts"))
  }

  val q12Sql: String =
    """SELECT COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  COUNT(DISTINCT l_partkey) AS n_parts
      |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project"  -> (q02FilterProject _),
    "q03_top_revenue"     -> (q03TopRevenue _),
    "q04_semi_join"       -> (q04SemiJoin _),
    "q05_region_revenue"  -> (q05RegionRevenue _),
    "q06_revenue_filter"  -> (q06RevenueFilter _),
    "q07_top_per_group"   -> (q07TopPerGroup _),
    "q08_running_window"  -> (q08RunningWindow _),
    "q09_rollup"          -> (q09Rollup _),
    "q10_cube"            -> (q10Cube _),
    "q11_set_ops"         -> (q11SetOps _),
    "q12_distinct"        -> (q12Distinct _),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_top_revenue"     -> q03Sql,
    "q04_semi_join"       -> q04Sql,
    "q05_region_revenue"  -> q05Sql,
    "q06_revenue_filter"  -> q06Sql,
    "q07_top_per_group"   -> q07Sql,
    "q08_running_window"  -> q08Sql,
    "q09_rollup"          -> q09Sql,
    "q10_cube"            -> q10Sql,
    "q11_set_ops"         -> q11Sql,
    "q12_distinct"        -> q12Sql,
  )
}
