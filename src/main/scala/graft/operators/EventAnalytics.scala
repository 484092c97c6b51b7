package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.Det._

/** Event/time-oriented analytics over the `events` table: JSON property
  * extraction, time bucketing, tumbling + sliding windows, and batch
  * sessionization. The same transforms run unchanged under Structured
  * Streaming (graft.streaming) — these batch variants are the
  * oracle-checkable face of C7.
  *
  * Scale notes: all window/bucket aggs group on (bucket, dimension) —
  * one shuffle, partial aggregation map-side. Sessionization shuffles
  * once on user_id; at 100 TB the skew concern is power-law users, which
  * AQE skew-join handles for joins, and for aggregation stays bounded
  * because per-user state is a running session, not a buffered list.
  */
object EventAnalytics {

  /** JSON property extraction (schemaless :source lane, SURVEY §1.2):
    * get_json_object over the props JSON string, typed cast, aggregate. */
  def q27JsonExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
           min($"k").as("min_k"), max($"k").as("max_k"))
  }

  val q27Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Calendar bucketing: events per (day, type) via date_trunc. */
  def q28TimeBuckets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
  }

  val q28Sql: String =
    s"""SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
       |  ${sqlSum("value")} AS sum_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Tumbling 5-minute windows (Spark `window`), keyed by event_type.
    * Streaming form is identical modulo readStream + watermark. */
  def q29Tumbling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
  }

  val q29Sql: String =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
      |  event_type, COUNT(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding windows: 10-minute width, 5-minute slide — every event
    * lands in exactly two windows. Oracle replicates by unnesting the
    * two window starts per event. */
  def q30Sliding(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(window($"ts", "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"window.start".as("window_start"), $"n", $"sum_value")
  }

  val q30Sql: String =
    s"""SELECT window_start, COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM (
       |  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
       |                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS window_start,
       |         value
       |  FROM events
       |) GROUP BY 1""".stripMargin

  /** Batch sessionization: session_window with a 4-hour inactivity gap
    * per user. Oracle = classic gaps-and-islands (lag + running flag
    * sum). Session identity: (user_id, first event ts). */
  def q31Sessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(session_window($"ts", "4 hours"), $"user_id")
      .agg(count(lit(1)).as("n_events"), max($"ts").as("last_ts"))
      .select($"session_window.start".as("session_start"),
              $"user_id", $"n_events", $"last_ts")
  }

  val q31Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL '4 hours'
      |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), numbered AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged
      |)
      |SELECT MIN(ts) AS session_start, user_id,
      |  COUNT(*) AS n_events, MAX(ts) AS last_ts
      |FROM numbered GROUP BY user_id, session_id""".stripMargin

  /** Spark 4 VariantType lane: parse the schemaless props JSON into a
    * variant column once, extract typed fields with variant_get — the
    * engine-native representation for the reference's schemaless
    * :source maps (binary-encoded, no per-access re-parse). Output is
    * projected to standard types so the result stays engine-neutral. */
  def q44Variant(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select($"event_type", parse_json($"props").as("v"))
      .select($"event_type",
        expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count($"k").as("n"))
  }

  val q44Sql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  COUNT(json_extract_string(props, '$.k')) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** AS-OF join (q64): each event is matched to the customer's most
    * recent order at or before the event time — the canonical temporal
    * enrichment operator (point-in-time feature lookup).
    *
    * Spark has no native as-of join; per the custom-operator preference
    * order this is COMPOSED from existing ops rather than a custom
    * SparkPlan: tag both inputs, union, and take `last(..., ignoreNulls)`
    * over a (key, time)-ordered window — ONE shuffle on the join key,
    * no range join, no per-event probe. Orders are pre-aggregated to one
    * row per (customer, date) so the as-of pick is deterministic under
    * ties; at equal timestamps the order row sorts before the event row
    * (inclusive "at or before" semantics, matching DuckDB's ASOF JOIN
    * with e.ts >= o.t). Skew note: the window partitions by customer —
    * power-law customers stay bounded because window state is a single
    * running value, not a buffered list. */
  def q64AsofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val od = orders(s, d)
      .groupBy($"o_custkey", $"o_orderdate".cast("timestamp").as("t"))
      .agg(max($"o_orderkey").as("last_order"))
    val oSide = od.select($"o_custkey".as("uid"), $"t", lit(1).as("is_order"),
      $"last_order", lit(null).cast("long").as("event_id"))
    val eSide = events(s, d).select($"user_id".as("uid"), $"ts".as("t"),
      lit(0).as("is_order"), lit(null).cast("long").as("last_order"), $"event_id")
    val w = Window.partitionBy($"uid").orderBy($"t".asc, $"is_order".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oSide.unionByName(eSide)
      .withColumn("asof_order", last($"last_order", ignoreNulls = true).over(w))
      .filter($"is_order" === 0 && $"asof_order".isNotNull)
      .select($"event_id", $"uid".as("user_id"), $"t".as("ts"),
        $"asof_order".as("last_order"))
  }

  val q64Sql: String =
    """WITH od AS (
      |  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS t,
      |         MAX(o_orderkey) AS last_order
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT e.event_id, e.user_id, e.ts, o.last_order
      |FROM events e ASOF JOIN od o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.t""".stripMargin

  /** q65: conversion funnel — users who did view → click → purchase in
    * strict temporal order. Each stage is a per-user min-timestamp
    * aggregate joined forward (stage N's clock starts at stage N−1's
    * first qualifying event); output is one row per stage with the
    * surviving-user count. Three small keyed aggregates + joins, no
    * window over raw events. */
  def q65Funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("v_ts"))
    val c = ev.filter($"event_type" === "click")
      .join(v, "user_id").filter($"ts" > $"v_ts")
      .groupBy($"user_id").agg(min($"ts").as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"ts" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    Seq(("1_view", v), ("2_click_after_view", c), ("3_purchase_after_click", p))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), $"n_users")
      }.reduce(_ unionByName _)
  }

  val q65Sql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id
      |)
      |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
      |UNION ALL SELECT '2_click_after_view', COUNT(*) FROM c
      |UNION ALL SELECT '3_purchase_after_click', COUNT(*) FROM p""".stripMargin

  /** q66: cohort retention — users grouped by first-seen day, counted
    * on each later day they return. One pass to the per-user cohort
    * day, one distinct (user, day) activity set, one join — the
    * standard retention triangle. */
  def q66Retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val cohort = ev.groupBy($"user_id").agg(to_date(min($"ts")).as("cohort_day"))
    val active = ev.select($"user_id", to_date($"ts").as("day")).distinct()
    active.join(cohort, "user_id")
      .groupBy($"cohort_day", datediff($"day", $"cohort_day").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
  }

  val q66Sql: String =
    """WITH cohort AS (
      |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      |  FROM events GROUP BY user_id
      |), active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |)
      |SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM active JOIN cohort USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ---- q72: per-user activity-series similarity top-k ----

  /** q72: which users behave alike over TIME — cosine similarity of
    * per-user daily activity series, the time-series similarity-search
    * modality (the EDBT'19 streaming-series / ICDE'21 top-k trajectory
    * line) expressed relationally: the (user, day, count) frame
    * equi-joins itself on the day key, so the inner product is an
    * integer aggregate and the dense per-user vector NEVER
    * materializes. The same events that q28 buckets and q65/q66
    * funnel/retain become a similarity space — cohort discovery,
    * bot-ring detection, account-sharing signals.
    *
    * Scale: the sparse join's fan-out per day bucket is |active
    * probes| × |active users| — linear in the corpus for a fixed probe
    * set (never users²); the dot aggregate combines map-side; norms
    * are one pass over the same daily frame. If the probe set is "all
    * users" the problem becomes all-pairs and belongs to the s04/s08
    * blocked/LSH machinery instead — this operator is the
    * probe-against-corpus form. Zero-overlap pairs are absent from the
    * join in BOTH engines (no shared active day ⇒ dot 0 ⇒ cannot
    * outrank any overlapping candidate, and both engines omit the row
    * identically). Integer dots + IEEE sqrt/divide → bit-identical;
    * full SQL oracle. */
  def q72SeriesTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cosine".desc, $"n_id".asc)
    val daily = events(s, d)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
    val norms = daily.groupBy($"user_id")
      .agg(sum($"c" * $"c").as("ss"))
      .select($"user_id", sqrt($"ss".cast("double")).as("nrm"))
    daily.filter($"user_id" < 10)
      .select($"user_id".as("q_id"), $"day", $"c".as("qc"))
      .join(daily.select($"user_id".as("n_id"), $"day", $"c".as("nc")), Seq("day"))
      .filter($"q_id" =!= $"n_id")
      .groupBy($"q_id", $"n_id")
      .agg(sum($"qc" * $"nc").as("dot"))
      .join(norms.select($"user_id".as("q_id"), $"nrm".as("qn")), Seq("q_id"))
      .join(norms.select($"user_id".as("n_id"), $"nrm".as("nn")), Seq("n_id"))
      .select($"q_id", $"n_id",
        ($"dot".cast("double") / ($"qn" * $"nn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"q_id", $"n_id", $"rank", round($"cosine", 6).as("cosine_r"))
  }

  val q72Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2
      |), norms AS (
      |  SELECT user_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nrm
      |  FROM daily GROUP BY 1
      |), dots AS (
      |  SELECT q.user_id AS q_id, n.user_id AS n_id, SUM(q.c * n.c) AS dot
      |  FROM daily q JOIN daily n ON q.day = n.day AND q.user_id <> n.user_id
      |  WHERE q.user_id < 10
      |  GROUP BY 1, 2
      |), sims AS (
      |  SELECT d.q_id, d.n_id,
      |    CAST(d.dot AS DOUBLE) / (nq.nrm * nn.nrm) AS cosine,
      |    ROW_NUMBER() OVER (PARTITION BY d.q_id
      |      ORDER BY CAST(d.dot AS DOUBLE) / (nq.nrm * nn.nrm) DESC,
      |               d.n_id ASC) AS rank
      |  FROM dots d
      |  JOIN norms nq ON nq.user_id = d.q_id
      |  JOIN norms nn ON nn.user_id = d.n_id
      |)
      |SELECT q_id, n_id, rank, ROUND(cosine, 6) AS cosine_r
      |FROM sims WHERE rank <= 3""".stripMargin


  /** q73: user-journey Markov transition matrix — P(next event type |
    * current type), estimated from per-user event streams: order each
    * user's events by (ts, event_id) (the id tiebreak makes same-
    * timestamp order deterministic), form (prev_type, type) bigrams
    * with lag, count, and normalize per source type. The standard
    * product-analytics journey model (and the generator behind q65's
    * funnel hypotheses: a funnel is one path through this matrix).
    *
    * Scale: lag needs each user's stream ordered — a window keyed
    * user_id, so it parallelizes by user and no global order exists
    * (events are already user-sharded in any real store). The bigram
    * count is a partial+final groupBy over ≤ |types|² keys and the
    * normalization joins two tiny aggregates. One user-keyed shuffle
    * of (type, ts, id) triples — payload-free — dominates; everything
    * after is bounded by the type-pair cardinality, not the corpus. */
  def q73MarkovTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val bi = events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type").agg(count(lit(1)).as("n"))
    val tot = bi.groupBy($"prev_type").agg(sum($"n").as("n_from"))
    bi.join(tot, Seq("prev_type"))
      .select($"prev_type", $"event_type".as("next_type"), $"n",
        round($"n".cast("double") / $"n_from", 6).as("p_r"))
  }

  val q73Sql: String =
    """WITH bi AS (
      |  SELECT prev_type, event_type, COUNT(*) AS n FROM (
      |    SELECT LAG(event_type) OVER (PARTITION BY user_id
      |             ORDER BY ts, event_id) AS prev_type,
      |           event_type
      |    FROM events
      |  ) WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |), tot AS (
      |  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from FROM bi GROUP BY 1
      |)
      |SELECT bi.prev_type, bi.event_type AS next_type, bi.n,
      |  ROUND(bi.n / CAST(tot.n_from AS DOUBLE), 6) AS p_r
      |FROM bi JOIN tot USING (prev_type)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_series_topk"  -> (q72SeriesTopK _),
    "q65_funnel"       -> (q65Funnel _),
    "q73_markov_transitions" -> (q73MarkovTransitions _),
    "q66_retention"    -> (q66Retention _),
    "q64_asof_join"    -> (q64AsofJoin _),
    "q44_variant"      -> (q44Variant _),
    "q27_json_extract" -> (q27JsonExtract _),
    "q28_time_buckets" -> (q28TimeBuckets _),
    "q29_tumbling"     -> (q29Tumbling _),
    "q30_sliding"      -> (q30Sliding _),
    "q31_sessions"     -> (q31Sessions _),
  )

  val oracles: Map[String, String] = Map(
    "q72_series_topk"  -> q72Sql,
    "q65_funnel"       -> q65Sql,
    "q73_markov_transitions" -> q73Sql,
    "q66_retention"    -> q66Sql,
    "q64_asof_join"    -> q64Sql,
    "q44_variant"      -> q44Sql,
    "q27_json_extract" -> q27Sql,
    "q28_time_buckets" -> q28Sql,
    "q29_tumbling"     -> q29Sql,
    "q30_sliding"      -> q30Sql,
    "q31_sessions"     -> q31Sql,
  )
}
