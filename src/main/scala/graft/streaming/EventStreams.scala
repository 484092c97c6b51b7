package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Tier C7 streaming analytics: the same declarative transforms as
  * graft.operators.EventAnalytics, under Structured Streaming with
  * event-time watermarks. Each function takes a *streaming* DataFrame
  * with the events schema (ts timestamp, user_id long, event_type
  * string, value double [, event_id long]).
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded to
  * open windows per key; dropDuplicatesWithinWatermark bounds dedup
  * state to the watermark horizon; mapGroupsWithState keeps one small
  * case-class per user with an idle timeout — all state lives in the
  * executor state store (RocksDB in production), never the driver.
  */
object EventStreams {

  /** Tumbling 5-minute counts per event_type; late data beyond the
    * watermark is dropped (append mode emits only finalized windows). */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows (10 min / 5 min slide). */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** Stateful streaming dedup by event_id, state bounded by the
    * watermark horizon (re-deliveries within it are dropped). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running totals on Spark 4's transformWithState — the
    * successor API to mapGroupsWithState: typed state variables from a
    * StatefulProcessorHandle, explicit TimeMode, RocksDB-backed state
    * store. Functionally equivalent to [[runningUserTotals]]; both are
    * kept because production code migrates from the former to this. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserRunning] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      state = getHandle.getValueState[UserRunning]("running",
        org.apache.spark.sql.Encoders.product[UserRunning],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
      val prev = Option(state.get()).getOrElse(UserRunning(key, 0L, 0.0))
      val batch = rows.toSeq
      val next = UserRunning(key,
        prev.n_events + batch.size,
        prev.sum_value + batch.map(_.value).sum)
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserTotalsTws(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Stream-stream interval join: purchases within 10 minutes after a
    * click by the same user (the streaming form of the q17 range join).
    * Watermarks on both sides bound the buffered state to the join
    * window. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    c.join(p, expr(
      """c_user = p_user AND
        |p_ts >= c_ts AND p_ts < c_ts + INTERVAL 10 MINUTES""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("c_ts"), col("p_ts"))
  }

  /** Streaming content dedup — the streaming twin of the batch d01
    * exact dedup: documents whose sha256(text) was already seen within
    * the watermark are suppressed, so re-crawled/re-delivered content
    * never reaches the sink twice. State is one row per distinct hash
    * inside the watermark horizon, evicted as event time advances. */
  def dedupByContent(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-static enrichment: each streaming event joined to a static
    * dimension (the per-customer order profile) — the streaming form of
    * the q64 point-in-time lookup when the dimension is slowly-changing
    * enough to snapshot. The static side is broadcast into every
    * micro-batch; no streaming state accrues (unlike stream-stream
    * joins, nothing is buffered across triggers), so this scales with
    * the dimension's broadcast size only. */
  def enrichWithProfile(events: DataFrame, profile: DataFrame): DataFrame =
    events.join(broadcast(profile), events("user_id") === profile("cust_id"), "left")
      .select(events("event_id"), events("user_id"), events("ts"),
        col("n_orders"), col("total_spent"))

  /** Left-outer stream-stream interval join: every click emits — joined
    * rows as matches arrive, unmatched clicks with null purchase once
    * the watermark proves no purchase can still arrive for them. */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    c.join(p, expr(
      """c_user = p_user AND
        |p_ts >= c_ts AND p_ts < c_ts + INTERVAL 10 MINUTES""".stripMargin), "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Per-user running aggregate via arbitrary stateful processing. */
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserRunning(userId,
            prev.n_events + batch.size,
            prev.sum_value + batch.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** Completed-session assembly via flatMapGroupsWithState: events
    * accumulate per user; when the event-time watermark passes the
    * session's inactivity gap (EventTimeTimeout), the closed session is
    * emitted — zero or one output per invocation, the flatMap shape. */
  final case class OpenSession(user_id: Long, startMs: Long, lastMs: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  def assembleSessions(events: Dataset[UserEvent],
                       gapMs: Long = 30 * 60 * 1000L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n))
          } else {
            val batch = rows.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            batch.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs < gapMs =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(userId,
                    new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)
                  cur = Some(OpenSession(userId, t, t, 1))
                case None =>
                  cur = Some(OpenSession(userId, t, t, 1))
              }
            }
            val wm = state.getCurrentWatermarkMs()
            cur.foreach { s =>
              if (s.lastMs + gapMs <= wm) {
                // the batch itself spanned past the gap: the session is
                // already expired by event time — emit it now (a timeout
                // below the current watermark is rejected by Spark)
                closed += ClosedSession(userId,
                  new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)
                state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1))
              }
            }
            closed.iterator
          }
      }
  }

  /** Streaming trending terms: per tumbling window, the top-k tokens by
    * frequency — t13's corpus top-k as a stream, emitted exactly once
    * per window WHEN THE WATERMARK CLOSES IT (Spark disallows the
    * aggregate-then-rank formulation in streaming: chained aggregations
    * can't append; this keyed-state form can).
    *
    * Semantics contract: output for a window equals the batch
    * computation `tokens in window → count → top-k (freq desc, token
    * asc)` over exactly the rows the watermark admitted — the final
    * counts are arrival-order-free, so the emission is deterministic
    * (spec-checked against the batch twin).
    *
    * Scale: state is one token→count map per OPEN window (watermark
    * bounds how many windows are open; the map is window-vocabulary
    * sized). At 100 TB-stream vocabularies, cap the map with a
    * Misra-Gries heavy-hitters sketch (same emission shape, ±εN count
    * error) — deliberately NOT the default because MG's kept set is
    * arrival-order-dependent and would break the determinism contract
    * above; exactness is the default, the sketch is the documented
    * escape hatch. */
  final case class WindowTokens(counts: Map[String, Long])
  final case class TrendingTerm(window_start: java.sql.Timestamp, rank: Int,
      token: String, freq: Long)

  def trendingTerms(docs: Dataset[(java.sql.Timestamp, String)],
                    windowMs: Long = 60000L, k: Int = 3,
                    watermark: String = "10 seconds"): Dataset[TrendingTerm] = {
    import docs.sparkSession.implicits._
    def topK(win: Long, counts: Map[String, Long]): Iterator[TrendingTerm] =
      counts.toSeq.sortBy { case (t, f) => (-f, t) }.take(k).zipWithIndex.map {
        case ((t, f), i) =>
          TrendingTerm(new java.sql.Timestamp(win), i + 1, t, f)
      }.iterator
    // tokenization stays UNTYPED: a typed flatMap reserializes its
    // output and drops the event-time attribute, and EventTimeTimeout
    // requires the watermarked column to reach the stateful operator
    docs.toDF("ts", "text")
      .withWatermark("ts", watermark)
      .select($"ts", explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
      .withColumn("win",
        (floor(unix_millis($"ts") / windowMs) * windowMs).cast("long"))
      .as[(java.sql.Timestamp, String, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[WindowTokens, TrendingTerm](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (win: Long, rows: Iterator[(java.sql.Timestamp, String, Long)],
         state: GroupState[WindowTokens]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            topK(win, counts)
          } else {
            // Exactly-once-per-window depends on Spark dropping late
            // rows BEFORE they reach this function: with a watermark +
            // EventTimeTimeout, FlatMapGroupsWithStateExec filters input
            // rows whose event time is below the current watermark
            // (`watermarkPredicateForData` in physical planning), so a
            // group whose window was already emitted (state removed,
            // winEnd <= watermark) can never be revived here by a
            // straggler row — if it could, this branch would rebuild
            // state from that row alone and the winEnd <= wm check below
            // would re-emit the window with partial counts. If a future
            // Spark version relaxes that pre-filter, add an explicit
            // .filter($"ts" >= watermark) upstream; StreamingSpec's
            // trendingTerms once-per-window assertion is the tripwire.
            var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
            rows.foreach { r =>
              counts = counts.updated(r._2, counts.getOrElse(r._2, 0L) + 1L)
            }
            val wm = state.getCurrentWatermarkMs()
            val winEnd = win + windowMs
            if (winEnd <= wm) {
              // the watermark already passed this window's end inside
              // this batch — emit now, a timeout below the watermark is
              // rejected by Spark
              state.remove()
              topK(win, counts)
            } else {
              state.update(WindowTokens(counts))
              state.setTimeoutTimestamp(winEnd)
              Iterator.empty
            }
          }
      }
  }
}
