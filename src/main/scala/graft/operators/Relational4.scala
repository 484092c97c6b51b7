package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Tier C1 relational surface, part 4: bag-semantics set operations,
  * map/struct construction and access, generator functions, datetime
  * arithmetic, extended string functions, array operations. */
object Relational4 {

  /** INTERSECT ALL / EXCEPT ALL — multiset semantics (duplicates
    * preserved by multiplicity), distinct from q11's set semantics. */
  def q45BagSetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cheap = lineitem(s, d).filter($"l_extendedprice" < 20000).select($"l_partkey")
    val bulky = lineitem(s, d).filter($"l_quantity" >= 30).select($"l_partkey")
    cheap.intersectAll(bulky)
      .groupBy($"l_partkey").agg(count(lit(1)).as("n_both"))
  }

  val q45Sql: String =
    """SELECT l_partkey, COUNT(*) AS n_both FROM (
      |  SELECT l_partkey FROM lineitem WHERE l_extendedprice < 20000
      |  INTERSECT ALL
      |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 30
      |) GROUP BY l_partkey""".stripMargin

  /** Map construction + access: per-order status→count map, queried by
    * key. Output projected to scalars (map column layouts differ across
    * engines; access semantics are what's under test). */
  def q46MapFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupBy($"o_custkey")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1))).na.fill(0L)
      .select($"o_custkey",
        map(lit("F"), $"F", lit("O"), $"O", lit("P"), $"P").as("m"))
      .select($"o_custkey",
        element_at($"m", "F").as("n_f"),
        element_at($"m", "O").as("n_o"),
        (element_at($"m", "F") + element_at($"m", "O") + element_at($"m", "P")).as("n_total"))
  }

  val q46Sql: String =
    """SELECT o_custkey,
      |  m['F'][1] AS n_f, m['O'][1] AS n_o,
      |  m['F'][1] + m['O'][1] + m['P'][1] AS n_total
      |FROM (
      |  SELECT o_custkey, MAP {
      |    'F': COUNT(*) FILTER (o_orderstatus = 'F'),
      |    'O': COUNT(*) FILTER (o_orderstatus = 'O'),
      |    'P': COUNT(*) FILTER (o_orderstatus = 'P') } AS m
      |  FROM orders GROUP BY o_custkey
      |)""".stripMargin

  /** Generator: explode a per-row sequence(1..p_size), aggregate — the
    * row-expansion shape of UDTF-style operators. */
  def q47Generators(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .filter($"p_partkey" <= 100)
      .select($"p_partkey", explode(sequence(lit(1), $"p_size")).as("i"))
      .groupBy($"p_partkey")
      .agg(count(lit(1)).as("n"), sum($"i").as("tri"))
  }

  val q47Sql: String =
    """SELECT p_partkey, COUNT(*) AS n, CAST(SUM(i) AS BIGINT) AS tri
      |FROM (SELECT p_partkey, unnest(generate_series(1, p_size)) AS i
      |      FROM part WHERE p_partkey <= 100)
      |GROUP BY p_partkey""".stripMargin

  /** Datetime arithmetic: day offsets, month boundaries, component
    * extraction, day differences. */
  def q48DatetimeArith(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .filter($"o_orderkey" <= 2000)
      .select($"o_orderkey",
        to_date($"o_orderdate").as("od"),
        date_add(to_date($"o_orderdate"), 30).as("due"),
        last_day(to_date($"o_orderdate")).as("month_end"),
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"),
        datediff(last_day(to_date($"o_orderdate")), to_date($"o_orderdate")).as("days_left"))
  }

  val q48Sql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS od,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  EXTRACT(YEAR FROM o_orderdate) AS y,
      |  EXTRACT(QUARTER FROM o_orderdate) AS q,
      |  datediff('day', CAST(o_orderdate AS DATE), last_day(CAST(o_orderdate AS DATE))) AS days_left
      |FROM orders WHERE o_orderkey <= 2000""".stripMargin

  /** Extended string surface: pad, repeat, reverse, translate, locate. */
  def q49StringFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    nation(s, d).select($"n_nationkey",
      lpad($"n_name", 12, "_").as("padded"),
      reverse($"n_name").as("rev"),
      translate($"n_name", "_N", "-n").as("trans"),
      instr($"n_name", "_").as("us_pos"),
      repeat(substring($"n_name", 1, 2), 3).as("rep"))
  }

  val q49Sql: String =
    """SELECT n_nationkey,
      |  lpad(n_name, 12, '_') AS padded,
      |  reverse(n_name) AS rev,
      |  translate(n_name, '_N', '-n') AS trans,
      |  instr(n_name, '_') AS us_pos,
      |  repeat(substr(n_name, 1, 2), 3) AS rep
      |FROM nation""".stripMargin

  /** Array ops beyond q24: containment, position, slicing, concat,
    * element access on a derived token array. */
  def q50ArrayOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = split($"text", " ")
    documents(s, d)
      .filter($"doc_id" < 100)
      .select($"doc_id",
        array_contains(t, "spark").as("has_spark"),
        array_position(t, "data").as("data_pos"),
        array_join(slice(t, 2, 3), "|").as("mid3"),
        element_at(t, 1).as("first_tok"),
        element_at(t, -1).as("last_tok"),
        size(concat(slice(t, 1, 2), slice(t, 1, 2))).as("dup4"))
  }

  val q50Sql: String =
    """SELECT doc_id,
      |  list_contains(t, 'spark') AS has_spark,
      |  COALESCE(list_position(t, 'data'), 0) AS data_pos,
      |  array_to_string(t[2:4], '|') AS mid3,
      |  t[1] AS first_tok,
      |  t[-1] AS last_tok,
      |  len(list_concat(t[1:2], t[1:2])) AS dup4
      |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |WHERE doc_id < 100""".stripMargin

  /** Statistical aggregates from exact decimal moment sums: Spark's
    * stddev/corr use single-pass moment updates whose merge order
    * varies with partitioning (results differ in low bits across
    * engines and runs); computing from exact Σx, Σx², Σxy instead is
    * bit-deterministic on both sides — the same property graft.Det
    * gives plain sums. */
  def q51Stats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.Det._
    val agg = lineitem(s, d).groupBy($"l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      dsum($"l_quantity").as("sx"),
      dsum($"l_quantity" * $"l_quantity").as("sxx"),
      dsum($"l_extendedprice").as("sy"),
      dsum($"l_extendedprice" * $"l_extendedprice").as("syy"),
      dsum($"l_quantity" * $"l_extendedprice").as("sxy"))
    agg.select($"l_returnflag",
      round(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6).as("stddev_qty"),
      round(($"n" * $"sxy" - $"sx" * $"sy") /
        sqrt(($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")), 8)
        .as("corr_qty_price"))
  }

  val q51Sql: String = {
    import graft.Det._
    s"""SELECT l_returnflag,
       |  ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       |  ROUND((n * sxy - sx * sy) /
       |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 8) AS corr_qty_price
       |FROM (
       |  SELECT l_returnflag,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${sqlSum("l_quantity")} AS sx,
       |    ${sqlSum("l_quantity * l_quantity")} AS sxx,
       |    ${sqlSum("l_extendedprice")} AS sy,
       |    ${sqlSum("l_extendedprice * l_extendedprice")} AS syy,
       |    ${sqlSum("l_quantity * l_extendedprice")} AS sxy
       |  FROM lineitem GROUP BY l_returnflag
       |)""".stripMargin
  }

  /** Histogram binning: fixed-width buckets via floor arithmetic
    * (engine-neutral, unlike width_bucket availability). */
  def q52Histogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select(floor($"o_totalprice" / 50000).cast("int").as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"))
  }

  val q52Sql: String =
    """SELECT CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS bucket, COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** The TypedImperativeAggregate exact sum (graft.functions
    * .ExactQuantizedSum): long-accumulator quantized summation with the
    * identical result contract as the DECIMAL(18,6) path — the oracle
    * IS the decimal formulation, so the gate proves the equivalence. */
  def q53FastMoneySum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        graft.functions.ExactQuantizedSum($"l_quantity").as("sum_qty"),
        graft.functions.ExactQuantizedSum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("sum_disc_price"),
        count(lit(1)).as("n"))
  }

  val q53Sql: String = {
    import graft.Det._
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  }

  /** LATERAL correlated subquery (authored in SQL — the same engine
    * surface a spark.sql user writes): top-2 orders per customer via a
    * per-row dependent subquery. */
  def q54Lateral(s: SparkSession, d: String): DataFrame = {
    graft.Engine.attach(s, d)
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2)
        |WHERE c_custkey <= 300""".stripMargin)
  }

  val q54Sql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) AS t
      |WHERE c_custkey <= 300""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_lateral"        -> (q54Lateral _),
    "q53_fast_money_sum" -> (q53FastMoneySum _),
    "q51_stats"          -> (q51Stats _),
    "q52_histogram"      -> (q52Histogram _),
    "q45_bag_set_ops"    -> (q45BagSetOps _),
    "q46_map_funcs"      -> (q46MapFuncs _),
    "q47_generators"     -> (q47Generators _),
    "q48_datetime_arith" -> (q48DatetimeArith _),
    "q49_string_funcs"   -> (q49StringFuncs _),
    "q50_array_ops"      -> (q50ArrayOps _),
  )

  val oracles: Map[String, String] = Map(
    "q54_lateral"        -> q54Sql,
    "q53_fast_money_sum" -> q53Sql,
    "q51_stats"          -> q51Sql,
    "q52_histogram"      -> q52Sql,
    "q45_bag_set_ops"    -> q45Sql,
    "q46_map_funcs"      -> q46Sql,
    "q47_generators"     -> q47Sql,
    "q48_datetime_arith" -> q48Sql,
    "q49_string_funcs"   -> q49Sql,
    "q50_array_ops"      -> q50Sql,
  )
}
