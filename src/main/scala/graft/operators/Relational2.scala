package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.Det._

/** Tier C1 relational surface, part 2: outer/anti/cross joins, scalar
  * subqueries, scalar function surface, non-equi (range) self-join,
  * exact percentiles, array functions + explode, conditional logic.
  *
  * Scale notes: the range self-join (q17) is an equi-join on user_id
  * with the range as a post-join predicate — Spark plans a shuffled
  * sort-merge join on the equi key, so cost is per-user-group quadratic
  * only, never a global cross product. The scalar-subquery pattern (q15)
  * broadcasts a 1-row aggregate — no driver collect.
  */
object Relational2 {

  /** NOT EXISTS → left-anti join: customers with no orders. */
  def q13AntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .join(orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  val q13Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Scalar function surface: string (upper/substr/length/replace/
    * concat/trim), math (abs/floor/ceil/sqrt/mod), date (year/month/
    * day/datediff). Functions chosen for bit-identical semantics across
    * engines (no locale-, rounding-mode-, or libm-sensitive calls). */
  def q14ScalarFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .filter($"p_partkey" <= 500)
      .select(
        $"p_partkey",
        upper($"p_name").as("name_upper"),
        substring($"p_type", 1, 4).as("type_prefix"),
        length($"p_name").as("name_len"),
        regexp_replace($"p_brand", "Brand#", "B").as("brand_short"),
        concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
        abs($"p_retailprice" - 950.0).as("price_dev"),
        floor($"p_retailprice").as("price_floor"),
        ceil($"p_retailprice" / 10.0).as("price_decile"),
        sqrt($"p_size".cast("double")).as("size_sqrt"),
        ($"p_partkey" % 7).as("key_mod"))
  }

  val q14Sql: String =
    """SELECT p_partkey,
      |  UPPER(p_name) AS name_upper,
      |  SUBSTR(p_type, 1, 4) AS type_prefix,
      |  LENGTH(p_name) AS name_len,
      |  REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
      |  p_brand || '/' || p_type AS brand_type,
      |  ABS(p_retailprice - 950.0) AS price_dev,
      |  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
      |  CAST(CEIL(p_retailprice / 10.0) AS BIGINT) AS price_decile,
      |  SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
      |  p_partkey % 7 AS key_mod
      |FROM part
      |WHERE p_partkey <= 500""".stripMargin

  /** Scalar subquery: customers above the global (deterministic decimal)
    * average balance. The 1-row aggregate is broadcast, not collected. */
  def q15ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val avgBal = customer(s, d).agg(davg($"c_acctbal").as("avg_bal"))
    customer(s, d)
      .join(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .select($"c_custkey", $"c_acctbal")
  }

  val q15Sql: String =
    s"""SELECT c_custkey, c_acctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT ${sqlAvg("c_acctbal")} FROM customer)""".stripMargin

  /** IN-subquery → left-semi join with a distinct build side. */
  def q16InSubquery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hot = lineitem(s, d).filter($"l_quantity" >= 49).select($"l_suppkey")
    supplier(s, d)
      .join(hot, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
  }

  val q16Sql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49)""".stripMargin

  /** Range (non-equi) self-join: for each user, count follow-up events
    * within 10 minutes of each event. Equi key user_id carries the
    * shuffle; the time range is a join-level filter. */
  def q17RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = events(s, d).select($"user_id", $"event_id".as("a_id"), $"ts".as("a_ts"))
    val b = events(s, d).select($"user_id".as("b_user"), $"event_id".as("b_id"), $"ts".as("b_ts"))
    a.join(b,
        $"user_id" === $"b_user" && $"b_id" =!= $"a_id" &&
        $"b_ts" >= $"a_ts" && $"b_ts" < $"a_ts" + expr("INTERVAL 10 MINUTES"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  val q17Sql: String =
    """SELECT a.user_id, COUNT(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND b.event_id <> a.event_id
      | AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 10 MINUTE
      |GROUP BY a.user_id""".stripMargin

  /** FULL OUTER join: per-customer order stats keeping both unmatched
    * sides (customers without orders / orders without known customer). */
  def q18FullOuter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perCust = orders(s, d).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
    customer(s, d)
      .join(perCust, $"c_custkey" === $"o_custkey", "full_outer")
      .select(
        coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_mktsegment",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"sum_price", lit(0.0)).as("sum_price"))
  }

  val q18Sql: String =
    s"""SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       |  c_mktsegment,
       |  COALESCE(n_orders, 0) AS n_orders,
       |  COALESCE(sum_price, 0.0) AS sum_price
       |FROM customer
       |FULL OUTER JOIN (
       |  SELECT o_custkey, COUNT(*) AS n_orders,
       |    ${sqlSum("o_totalprice")} AS sum_price
       |  FROM orders GROUP BY o_custkey
       |) ON c_custkey = o_custkey""".stripMargin

  /** CROSS join of two small dims (plan check: BroadcastNestedLoop with
    * a broadcast side, never a shuffled cartesian at scale). */
  def q19CrossJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    nation(s, d).select($"n_name")
      .crossJoin(broadcast(region(s, d).select($"r_name")))
  }

  val q19Sql: String =
    "SELECT n_name, r_name FROM nation CROSS JOIN region"

  /** GROUP BY + HAVING on an aggregate expression. */
  def q20Having(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_spent"))
      .filter($"n_orders" >= 20)
  }

  val q20Sql: String =
    s"""SELECT o_custkey, COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS total_spent
       |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20""".stripMargin

  /** UNION ALL (bag semantics) of two differently-filtered branches,
    * re-aggregated — branch provenance kept in a literal column. */
  def q21UnionAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      .select(lit("urgent").as("bucket"), $"o_totalprice")
    val cheap = orders(s, d).filter($"o_totalprice" < 5000)
      .select(lit("cheap").as("bucket"), $"o_totalprice")
    urgent.unionAll(cheap)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
  }

  val q21Sql: String =
    s"""SELECT bucket, COUNT(*) AS n, ${sqlSum("o_totalprice")} AS sum_price
       |FROM (
       |  SELECT 'urgent' AS bucket, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
       |  UNION ALL
       |  SELECT 'cheap' AS bucket, o_totalprice FROM orders WHERE o_totalprice < 5000
       |) GROUP BY bucket""".stripMargin

  /** Exact interpolated percentiles (≡ Spark `percentile` ≡ DuckDB
    * `quantile_cont`) per group — WITHOUT per-group value buffering.
    *
    * Spark's `percentile()` is a TypedImperativeAggregate that holds
    * every value of a group in one aggregation buffer: O(group size)
    * executor MEMORY, the one thing that cannot survive billion-row
    * groups. Scalable form of the same exact semantics: shuffle-sort
    * per group (`row_number` — WindowExec spills its partition buffer
    * to disk, so the bound is disk not heap), keep only the floor/ceil
    * rank rows each quantile needs, and interpolate with the identical
    * formula `lower·(hi−pos) + higher·(pos−lo)` both engines use, so
    * the doubles stay bit-equal to `percentile()`'s (two non-null
    * terms per sum — FP addition is commutative, so partial-agg order
    * cannot change the bits). */
  def q22Percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = lineitem(s, d)
    // every key join below is null-safe (<=>): percentile() under
    // groupBy keeps a NULL group key as its own group, and a plain
    // equi-join (null != null) would silently drop it
    def nsJoin(lhs: DataFrame, rhs: DataFrame, how: String): DataFrame = {
      val r = rhs.withColumnRenamed("l_returnflag", "rf_r")
      lhs.join(r, lhs("l_returnflag") <=> r("rf_r"), how).drop("rf_r")
    }
    def quantiles(valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
      val w = Window.partitionBy($"l_returnflag").orderBy($"v")
      val counts = li.groupBy($"l_returnflag")
        .agg(count(col(valueCol)).as("n"))
      val ranked = nsJoin(
        li.select($"l_returnflag", col(valueCol).as("v"))
          .filter($"v".isNotNull)
          .withColumn("rn", row_number().over(w)),
        broadcast(counts), "inner")
      val aggs = ps.map { case (name, p) =>
        val pos = lit(p) * ($"n" - 1).cast("double")
        val lo = floor(pos)
        val hi = ceil(pos)
        val rank0 = ($"rn" - 1).cast("double")
        sum(
          when(rank0 === lo && lo === hi, $"v")
            .when(rank0 === lo, $"v" * (hi - pos))
            .when(rank0 === hi, $"v" * (pos - lo))
        ).as(name)
      }
      ranked.groupBy($"l_returnflag").agg(aggs.head, aggs.tail: _*)
    }
    // anchor on the full group list with left joins: a group whose
    // values are all NULL in one column keeps its row with a NULL
    // quantile (percentile()'s semantics), instead of vanishing from
    // the inner join
    nsJoin(
      nsJoin(li.select($"l_returnflag").distinct(),
        quantiles("l_quantity",
          Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75)), "left_outer"),
      quantiles("l_extendedprice", Seq("price_p90" -> 0.9)), "left_outer")
  }

  val q22Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  quantile_cont(l_extendedprice, 0.9) AS price_p90
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** CASE WHEN banding + NULLIF/COALESCE null logic. */
  def q23CaseWhen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select(
        when($"o_totalprice" < 100000, "low")
          .when($"o_totalprice" < 300000, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif($"o_orderstatus", lit("P")), lit("pending")).as("status_norm"))
      .groupBy($"band", $"status_norm")
      .agg(count(lit(1)).as("n"))
  }

  val q23Sql: String =
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
      |            WHEN o_totalprice < 300000 THEN 'mid'
      |            ELSE 'high' END AS band,
      |  COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_norm,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** Array functions: split, distinct, sort, join — canonical fingerprint
    * of each document's vocabulary (string output keeps the compare
    * engine-neutral). */
  def q24ArrayFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(
        $"doc_id",
        size(split($"text", " ")).as("n_tokens"),
        size(array_distinct(split($"text", " "))).as("n_distinct_tokens"),
        array_join(slice(array_sort(array_distinct(split($"text", " "))), 1, 8), " ")
          .as("vocab_prefix"))
  }

  val q24Sql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:8], ' ') AS vocab_prefix
      |FROM documents""".stripMargin

  /** explode (lateral unnest) → global term frequencies, top 20. */
  def q25Explode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token".asc)
      .limit(20)
  }

  val q25Sql: String =
    """SELECT token, COUNT(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 20""".stripMargin

  /** Grouped list aggregation with deterministic ordering:
    * sort_array(collect_list) ≡ list_sort(list()). */
  def q26CollectList(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    supplier(s, d)
      .groupBy($"s_nationkey")
      .agg(
        count(lit(1)).as("n_suppliers"),
        array_join(sort_array(collect_list($"s_suppkey")), ",").as("supp_keys"))
  }

  val q26Sql: String =
    """SELECT s_nationkey, COUNT(*) AS n_suppliers,
      |  array_to_string(list_sort(list(s_suppkey)), ',') AS supp_keys
      |FROM supplier GROUP BY s_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_anti_join"       -> (q13AntiJoin _),
    "q14_scalar_funcs"    -> (q14ScalarFuncs _),
    "q15_scalar_subquery" -> (q15ScalarSubquery _),
    "q16_in_subquery"     -> (q16InSubquery _),
    "q17_range_join"      -> (q17RangeJoin _),
    "q18_full_outer"      -> (q18FullOuter _),
    "q19_cross_join"      -> (q19CrossJoin _),
    "q20_having"          -> (q20Having _),
    "q21_union_all"       -> (q21UnionAll _),
    "q22_percentiles"     -> (q22Percentiles _),
    "q23_case_when"       -> (q23CaseWhen _),
    "q24_array_funcs"     -> (q24ArrayFuncs _),
    "q25_explode"         -> (q25Explode _),
    "q26_collect_list"    -> (q26CollectList _),
  )

  val oracles: Map[String, String] = Map(
    "q13_anti_join"       -> q13Sql,
    "q14_scalar_funcs"    -> q14Sql,
    "q15_scalar_subquery" -> q15Sql,
    "q16_in_subquery"     -> q16Sql,
    "q17_range_join"      -> q17Sql,
    "q18_full_outer"      -> q18Sql,
    "q19_cross_join"      -> q19Sql,
    "q20_having"          -> q20Sql,
    "q21_union_all"       -> q21Sql,
    "q22_percentiles"     -> q22Sql,
    "q23_case_when"       -> q23Sql,
    "q24_array_funcs"     -> q24Sql,
    "q25_explode"         -> q25Sql,
    "q26_collect_list"    -> q26Sql,
  )
}
