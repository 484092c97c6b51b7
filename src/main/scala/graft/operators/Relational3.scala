package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables._
import graft.Det._

/** Tier C1 relational surface, part 3: pivot, advanced window frames
  * (rangeBetween, ntile/percent_rank/cume_dist), regex functions,
  * schema-on-read JSON lane (from_json with a declared StructType),
  * null ordering, correlated aggregate subqueries, and FILTER'd
  * aggregates.
  */
object Relational3 {

  /** Pivot (wide aggregation): order counts per priority × status.
    * Spark .pivot compiles to a single hash agg with CASE projections —
    * mirrored in SQL with FILTER'd aggregates. */
  def q32Pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  val q32Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** q69: UNPIVOT — the inverse of q32's pivot: the wide per-status
    * columns back to (priority, status, n) long form. Spark compiles
    * `unpivot` to a single Expand over q32's aggregate output — one
    * pass, no extra shuffle — the melt step every report/feature
    * matrix needs on its way back into a long-form pipeline. */
  def q69Unpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    q32Pivot(s, d).unpivot(
      Array($"o_orderpriority"), Array($"F", $"O", $"P"), "status", "n")
  }

  val q69Sql: String =
    s"""WITH piv AS (
       |  ${q32Sql.replace("\n", "\n  ")}
       |)
       |SELECT o_orderpriority, status, n FROM piv
       |UNPIVOT (n FOR status IN ("F", "O", "P"))""".stripMargin

  /** RANGE window frame: for each order, count of same-customer orders
    * within ±30 days by order date (range, not rows). */
  def q33RangeFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // NTZ→timestamp→long = epoch seconds under the UTC session zone,
    // matching DuckDB's epoch() on naive timestamps
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 30L * 86400)
    orders(s, d)
      .withColumn("n_near", count(lit(1)).over(w))
      .select($"o_orderkey", $"o_custkey", $"n_near")
  }

  val q33Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |                 RANGE BETWEEN 2592000 PRECEDING AND 2592000 FOLLOWING) AS n_near
      |FROM orders""".stripMargin

  /** Rank-family window functions: ntile, percent_rank, cume_dist over
    * a unique total order (tie-free → engine-identical).
    *
    * The partition-less Window is DELIBERATE here: a global percent_rank
    * is definitionally a total order, so Spark warns and single-
    * partitions the sort — acceptable on dimension-sized inputs
    * (customer), the only place this surface is offered. Corpus-scale
    * paths are machine-checked to never do this (PlanSpec's
    * partition-less-Window guard on the k-means lineage). */
  def q34RankFamily(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"c_acctbal".asc, $"c_custkey".asc)
    customer(s, d)
      .select($"c_custkey", $"c_acctbal",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 8).as("pct_rank"),
        round(cume_dist().over(w), 8).as("cume"))
  }

  val q34Sql: String =
    """SELECT c_custkey, c_acctbal,
      |  NTILE(4) OVER w AS quartile,
      |  ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
      |  ROUND(CUME_DIST() OVER w, 8) AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin

  /** Regex surface: extract, match test, count of matches. */
  def q35Regex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .select($"p_partkey",
        regexp_extract($"p_brand", "Brand#(\\d+)", 1).cast("int").as("brand_num"),
        $"p_name".rlike("^p[aeiou]").as("starts_vowelish"),
        size(split($"p_type", "E", -1)).minus(1).as("n_e"))
      .filter($"brand_num" >= 10)
  }

  val q35Sql: String =
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
      |  regexp_matches(p_name, '^p[aeiou]') AS starts_vowelish,
      |  len(string_split(p_type, 'E')) - 1 AS n_e
      |FROM part
      |WHERE CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) >= 10""".stripMargin

  /** Schema-on-read lane (SURVEY §1.3): parse the events props JSON
    * with a declared StructType and aggregate on the typed field. */
  def q36FromJson(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val schema = StructType(Seq(StructField("k", IntegerType)))
    events(s, d)
      .select($"event_type", from_json($"props", schema).getField("k").as("k"))
      .groupBy($"event_type")
      .agg(avg($"k").cast("double").as("avg_k"), count($"k").as("n_k"))
  }

  val q36Sql: String =
    """SELECT event_type,
      |  AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k,
      |  COUNT(json_extract_string(props, '$.k')) AS n_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Explicit null ordering: full-outer join residue sorted with
    * NULLS FIRST, capped deterministically. */
  def q37NullOrdering(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perCust = orders(s, d).groupBy($"o_custkey").agg(count(lit(1)).as("n"))
    customer(s, d)
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"n")
      .orderBy($"n".asc_nulls_first, $"c_custkey".asc)
      .limit(50)
  }

  val q37Sql: String =
    """SELECT c_custkey, n
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
      |) ON c_custkey = o_custkey
      |ORDER BY n ASC NULLS FIRST, c_custkey ASC
      |LIMIT 50""".stripMargin

  /** Correlated aggregate subquery (TPC-H Q17 shape): lineitems below
    * 40% of their part's average quantity. */
  def q38CorrelatedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perPart = lineitem(s, d).groupBy($"l_partkey".as("pk"))
      .agg(davg($"l_quantity").as("avg_qty"))
    lineitem(s, d)
      .join(perPart, $"l_partkey" === $"pk")
      .filter($"l_quantity" < $"avg_qty" * 0.4)
      .agg(dsum($"l_extendedprice").as("total_price"), count(lit(1)).as("n_rows"))
  }

  val q38Sql: String =
    s"""SELECT ${sqlSum("l_extendedprice")} AS total_price, COUNT(*) AS n_rows
       |FROM lineitem l
       |WHERE l_quantity < 0.4 * (
       |  SELECT ${sqlAvg("l2.l_quantity")}
       |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** FILTER'd / conditional aggregates in one pass. */
  def q39ConditionalAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).groupBy($"l_returnflag").agg(
      count(when($"l_discount" > 0.05, 1)).as("n_discounted"),
      count(when($"l_tax" === 0.0, 1)).as("n_taxfree"),
      dsum(when($"l_quantity" > 40, $"l_extendedprice").otherwise(0.0)).as("bulk_price"))
  }

  val q39Sql: String =
    s"""SELECT l_returnflag,
       |  COUNT(*) FILTER (l_discount > 0.05) AS n_discounted,
       |  COUNT(*) FILTER (l_tax = 0.0) AS n_taxfree,
       |  ${sqlSum("CASE WHEN l_quantity > 40 THEN l_extendedprice ELSE 0.0 END")} AS bulk_price
       |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** first/last value window + global min_by/max_by aggregates. */
  def q40FirstLast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select($"o_custkey",
        first($"o_orderkey").over(w).as("first_order"),
        last($"o_orderkey").over(w).as("last_order"))
      .distinct()
  }

  val q40Sql: String =
    """SELECT DISTINCT o_custkey,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
      |  LAST_VALUE(o_orderkey) OVER w AS last_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_pivot"           -> (q32Pivot _),
    "q69_unpivot"         -> (q69Unpivot _),
    "q33_range_frame"     -> (q33RangeFrame _),
    "q34_rank_family"     -> (q34RankFamily _),
    "q35_regex"           -> (q35Regex _),
    "q36_from_json"       -> (q36FromJson _),
    "q37_null_ordering"   -> (q37NullOrdering _),
    "q38_correlated_agg"  -> (q38CorrelatedAgg _),
    "q39_conditional_agg" -> (q39ConditionalAgg _),
    "q40_first_last"      -> (q40FirstLast _),
  )

  val oracles: Map[String, String] = Map(
    "q32_pivot"           -> q32Sql,
    "q69_unpivot"         -> q69Sql,
    "q33_range_frame"     -> q33Sql,
    "q34_rank_family"     -> q34Sql,
    "q35_regex"           -> q35Sql,
    "q36_from_json"       -> q36Sql,
    "q37_null_ordering"   -> q37Sql,
    "q38_correlated_agg"  -> q38Sql,
    "q39_conditional_agg" -> q39Sql,
    "q40_first_last"      -> q40Sql,
  )
}
