package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling windows finalize on watermark; late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.tumblingCounts(df, "10 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
        (ts("2024-01-01 00:02:00"), 2L, "click", 2.0),
        (ts("2024-01-01 00:06:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      // advance watermark far past the first windows
      input.addData((ts("2024-01-01 01:00:00"), 3L, "click", 1.0))
      q.processAllAvailable()
      // this event is 1h late, behind the watermark → dropped
      input.addData((ts("2024-01-01 00:03:00"), 9L, "click", 99.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 02:00:00"), 3L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumb")
        .select($"window_start".cast("string"), $"event_type", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("2024-01-01 00:00:00", "click", 2L)))
      assert(rows.contains(("2024-01-01 00:05:00", "view", 1L)))
      // the late event did NOT bump the 00:00 click window to 3
      assert(!rows.exists(r => r._1 == "2024-01-01 00:00:00" && r._2 == "click" && r._3 == 3L))
    } finally q.stop()
  }

  test("session windows merge within gap, split across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.sessionCounts(df, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, "a", 0.0),
        (ts("2024-01-01 00:10:00"), 1L, "a", 0.0), // same session (gap < 30m)
        (ts("2024-01-01 01:30:00"), 1L, "a", 0.0)) // new session
      q.processAllAvailable()
      input.addData((ts("2024-01-01 05:00:00"), 2L, "a", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select($"session_start".cast("string"), $"user_id", $"n_events")
        .as[(String, Long, Long)].collect().toSet
      assert(rows.contains(("2024-01-01 00:00:00", 1L, 2L)))
      assert(rows.contains(("2024-01-01 01:30:00", 1L, 1L)))
    } finally q.stop()
  }

  test("streaming content dedup suppresses re-delivered identical text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.dedupByContent(df, "10 minutes")
      .writeStream.format("memory").queryName("cdedup").outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:00:00"), "hello world"),
        (2L, ts("2024-01-01 00:00:30"), "something else"))
      q.processAllAvailable()
      // same CONTENT under a new doc_id within the watermark → suppressed
      input.addData((3L, ts("2024-01-01 00:01:00"), "hello world"))
      q.processAllAvailable()
      val ids = spark.table("cdedup").select($"doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }

  test("stream-static enrichment: events pick up the broadcast profile, no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val profile = Seq((1L, 3L, 150.0), (2L, 1L, 40.0))
      .toDF("cust_id", "n_orders", "total_spent")
    val input = MemoryStream[(Long, Long, Timestamp)]
    val df = input.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.enrichWithProfile(df, profile)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      input.addData(
        (10L, 1L, ts("2024-01-01 00:00:00")),
        (11L, 2L, ts("2024-01-01 00:01:00")),
        (12L, 9L, ts("2024-01-01 00:02:00"))) // no profile row → nulls
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .select($"event_id", $"n_orders", $"total_spent")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
      assert(rows === Set((10L, 3L, 150.0), (11L, 1L, 40.0), (12L, -1L, -1.0)))
      // stream-static joins keep no streaming state across triggers
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupWithinWatermark(df, "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00"), 1.0))
      input.addData((1L, ts("2024-01-01 00:00:01"), 1.0)) // redelivery, same id
      input.addData((2L, ts("2024-01-01 00:00:02"), 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup").select($"event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("windowed aggregation state survives a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("aggck").toString
    val out = java.nio.file.Files.createTempDirectory("aggout").toString
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    def start() = EventStreams.tumblingCounts(
        input.toDF().toDF("ts", "user_id", "event_type", "value"), "10 minutes")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out)
      }.start()
    val q1 = start()
    try {
      // open a window with 2 events, stop BEFORE it finalizes
      input.addData(
        (ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
        (ts("2024-01-01 00:02:00"), 2L, "click", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint; watermark-advancing event finalizes
    // the pre-restart window WITH its restored partial state
    val q2 = start()
    try {
      input.addData((ts("2024-01-01 01:00:00"), 3L, "click", 1.0))
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .select($"window_start".cast("string"), $"event_type", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("2024-01-01 00:00:00", "click", 2L)),
        s"restored window state must count both pre-restart events; got $rows")
    } finally q2.stop()
  }

  test("transformWithState running totals (RocksDB state store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningUserTotalsTws(input.toDS())
      .writeStream.format("memory").queryName("tws").outputMode("update").start()
    try {
      input.addData(EventStreams.UserEvent(1L, ts("2024-01-01 00:00:00"), 5.0))
      q.processAllAvailable()
      input.addData(EventStreams.UserEvent(1L, ts("2024-01-01 00:01:00"), 7.0))
      q.processAllAvailable()
      val rows = spark.table("tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 12.0)), s"got $rows")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val cdf = clicks.toDF().toDF("event_id", "user_id", "ts")
    val pdf = purchases.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.clickToPurchase(cdf, pdf)
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      clicks.addData((1L, 7L, ts("2024-01-01 00:00:00")))
      purchases.addData(
        (100L, 7L, ts("2024-01-01 00:05:00")), // within window → joins
        (101L, 7L, ts("2024-01-01 00:30:00")), // outside window
        (102L, 8L, ts("2024-01-01 00:05:00"))) // other user
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
      assert(rows === Set((1L, 100L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.clickToPurchaseOuter(
        clicks.toDF().toDF("event_id", "user_id", "ts"),
        purchases.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    try {
      clicks.addData((1L, 7L, ts("2024-01-01 00:00:00"))) // will match
      clicks.addData((2L, 8L, ts("2024-01-01 00:00:00"))) // never matches
      purchases.addData((100L, 7L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      // advance BOTH watermarks far past the join window
      clicks.addData((3L, 9L, ts("2024-01-01 02:00:00")))
      purchases.addData((101L, 9L, ts("2024-01-01 02:30:00")))
      q.processAllAvailable()
      val rows = spark.table("ssjo")
        .select($"click_id", $"purchase_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((1L, 100L)), s"matched pair missing: $rows")
      assert(rows.contains((2L, -1L)), s"unmatched click must emit with null: $rows")
    } finally q.stop()
  }

  test("trending terms: per-window top-k emitted once on watermark close, equals batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = EventStreams.trendingTerms(input.toDS(), windowMs = 60000L, k = 2)
      .writeStream.format("memory").queryName("trend").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:05"), "apple banana apple"),
        (ts("2024-01-01 00:00:40"), "banana apple"),
        (ts("2024-01-01 00:01:30"), "cherry cherry date"))
      q.processAllAvailable()
      // the 00:01:30 doc advanced the watermark to 00:01:20 — past the
      // FIRST window's end, so exactly that window is emitted; the
      // second (ends 00:02:00) must still be open
      assert(spark.table("trend").count() === 2)
      assert(spark.table("trend")
        .select($"window_start".cast("string")).as[String].collect()
        .forall(_ == "2024-01-01 00:00:00"))
      // advance the watermark far past both windows
      input.addData((ts("2024-01-01 01:00:00"), "zzz"))
      q.processAllAvailable()
      val rows = spark.table("trend")
        .select($"window_start".cast("string"), $"rank", $"token", $"freq")
        .as[(String, Int, String, Long)].collect().toSet
      val expected = Set(
        ("2024-01-01 00:00:00", 1, "apple", 3L),
        ("2024-01-01 00:00:00", 2, "banana", 2L),
        ("2024-01-01 00:01:00", 1, "cherry", 2L),
        ("2024-01-01 00:01:00", 2, "date", 1L))
      assert(rows === expected)
      // batch twin over the same admitted rows produces the same table
      val batch = Seq(
        (ts("2024-01-01 00:00:05"), "apple banana apple"),
        (ts("2024-01-01 00:00:40"), "banana apple"),
        (ts("2024-01-01 00:01:30"), "cherry cherry date"))
        .toDF("ts", "text")
        .select(window($"ts", "1 minute").getField("start").cast("string").as("w"),
          explode(split($"text", " ")).as("token"))
        .groupBy($"w", $"token").agg(count(lit(1)).as("freq"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy($"w").orderBy($"freq".desc, $"token".asc)
      val twin = batch.withColumn("rank", row_number().over(win))
        .filter($"rank" <= 2)
        .select($"w", $"rank", $"token", $"freq")
        .as[(String, Int, String, Long)].collect().toSet
      assert(rows === twin)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits sessions closed by event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.assembleSessions(input.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("fsess").outputMode("append").start()
    try {
      input.addData(
        EventStreams.UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
        EventStreams.UserEvent(1L, ts("2024-01-01 00:10:00"), 1.0))
      q.processAllAvailable()
      // a much later event: (a) splits into a new session inline,
      // (b) advances the watermark so the first session times out
      input.addData(EventStreams.UserEvent(1L, ts("2024-01-01 03:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(EventStreams.UserEvent(2L, ts("2024-01-01 09:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("fsess")
        .select($"session_start".cast("string"), $"user_id", $"n_events")
        .as[(String, Long, Long)].collect().toSet
      assert(rows.contains(("2024-01-01 00:00:00", 1L, 2L)),
        s"first session must close; got $rows")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("runtot").outputMode("update").start()
    try {
      input.addData(EventStreams.UserEvent(1L, ts("2024-01-01 00:00:00"), 5.0))
      q.processAllAvailable()
      input.addData(
        EventStreams.UserEvent(1L, ts("2024-01-01 00:01:00"), 7.0),
        EventStreams.UserEvent(2L, ts("2024-01-01 00:01:00"), 1.0))
      q.processAllAvailable()
      val byUser = spark.table("runtot").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(byUser.contains((1L, 2L, 12.0)), s"got ${byUser.toSeq}")
      assert(byUser.contains((2L, 1L, 1.0)))
    } finally q.stop()
  }
}
