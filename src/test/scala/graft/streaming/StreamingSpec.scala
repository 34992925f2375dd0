package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.SparkSpec

/** Event-time semantics the batch oracle can't exercise: watermarking
  * with append mode (late-data drop), and arbitrary stateful processing
  * via flatMapGroupsWithState (SURVEY.md §2 "absent categories" —
  * harness-demanded streaming surface).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark + append: closed windows emit, late events drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_sink").start()
    try {
      // batch 1: two events in hour-0, one in hour-2 (advances watermark
      // to 02:30 - 10min = 02:20 > hour-0 end → hour-0 closes)
      input.addData((ts("2024-01-01 00:10:00"), 1.0), (ts("2024-01-01 00:20:00"), 1.0),
        (ts("2024-01-01 02:30:00"), 1.0))
      q.processAllAvailable()
      // batch 2: a late hour-0 event (before watermark) must be dropped
      input.addData((ts("2024-01-01 00:30:00"), 99.0))
      q.processAllAvailable()
      // batch 3: advance far so everything else closes
      input.addData((ts("2024-01-01 09:00:00"), 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 23:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("wm_sink")
        .select(date_format(col("window.start"), "HH").cast("int").as("h"), col("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows(0) === 2, "late event did not inflate the closed hour-0 window")
      assert(rows(2) === 1)
    } finally q.stop()
  }

  test("streaming dedup: dropDuplicates keeps first occurrence across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val dd = input.toDF().toDF("id", "ts", "v")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("id")
    val q = dd.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dd_sink").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:02:00"), 99.0)) // duplicate id → dropped
      q.processAllAvailable()
      val rows = spark.table("dd_sink").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(rows === Map(1L -> 1.0, 2L -> 2.0))
    } finally q.stop()
  }

  test("stream-stream inner join with watermarks and a time bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_c", "ts_c").withWatermark("ts_c", "1 hour")
    val p = purchases.toDF().toDF("user_p", "ts_p").withWatermark("ts_p", "1 hour")
    val joined = p.join(c, expr(
      "user_p = user_c AND ts_c <= ts_p AND ts_c >= ts_p - INTERVAL 30 minutes"))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ss_sink").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (3L, ts("2024-01-01 09:00:00")))
      purchases.addData(
        (1L, ts("2024-01-01 10:15:00")), // within 30min of u1 click → joins
        (2L, ts("2024-01-01 10:20:00")), // no click → dropped
        (3L, ts("2024-01-01 10:30:00"))) // click 90min earlier → outside bound
      q.processAllAvailable()
      val users = spark.table("ss_sink").select("user_p").collect().map(_.getLong(0)).toSeq
      assert(users === Seq(1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState: custom per-key running state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val counted = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (String, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[(String, Double)], state: GroupState[Double]) =>
          val sum = state.getOption.getOrElse(0.0) + values.map(_._2).sum
          state.update(sum)
          Iterator((key, sum))
      }
    val q = counted.toDF("key", "running").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("st_sink").start()
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      q.processAllAvailable()
      input.addData(("a", 3.0))
      q.processAllAvailable()
      val rows = spark.table("st_sink").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      assert(rows.contains(("a", 3.0)), "first micro-batch sum for a")
      assert(rows.contains(("a", 6.0)), "state carried across micro-batches")
      assert(rows.contains(("b", 5.0)))
    } finally q.stop()
  }

  test("quotaPerKey admits first N per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val quoted = graft.streaming.EventStreams.quotaPerKey(
      input.toDF().toDF("user_id", "event_id", "ts"), quota = 2)
    val q = quoted.writeStream
      .outputMode("append").format("memory").queryName("quota_sink").start()
    try {
      // batch 1: one event for u1 → admitted (1/2 used)
      input.addData((1L, 10L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: two more for u1 → only the batch-earliest admitted;
      // u2's both admitted
      input.addData(
        (1L, 12L, ts("2024-01-01 12:00:00")),
        (1L, 11L, ts("2024-01-01 11:00:00")),
        (2L, 20L, ts("2024-01-01 10:00:00")),
        (2L, 21L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      val admitted = spark.table("quota_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(admitted === Set((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)))
    } finally q.stop()
  }

  test("firstTouchPerType (transformWithState): MapState carries first-seen across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val touched = graft.streaming.EventStreams.firstTouchPerType(
      input.toDF().toDF("user_id", "event_id", "event_type", "ts"))
    graft.streaming.EventStreams.withRocksDbStateStore(spark) {
    val q = touched.writeStream
      .outputMode("append").format("memory").queryName("first_touch_sink").start()
    try {
      // batch 1: u1 views (first touch), u1 views again (suppressed)
      input.addData(
        (1L, 10L, "view", ts("2024-01-01 10:00:00")),
        (1L, 11L, "view", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // batch 2: u1 view AGAIN (state must remember across batches →
      // suppressed), u1 purchase (new type → emitted), u2 view (new
      // key → emitted)
      input.addData(
        (1L, 12L, "view", ts("2024-01-01 12:00:00")),
        (1L, 13L, "purchase", ts("2024-01-01 12:30:00")),
        (2L, 20L, "view", ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
      val rows = spark.table("first_touch_sink").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        (1L, "view", ts("2024-01-01 10:00:00").getTime * 1000),
        (1L, "purchase", ts("2024-01-01 12:30:00").getTime * 1000),
        (2L, "view", ts("2024-01-01 09:00:00").getTime * 1000)))
    } finally q.stop()
    }
  }

  test("sessionTimeout (transformWithState timers): watermark closes the session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = graft.streaming.EventStreams.sessionTimeout(
      input.toDF().toDF("user_id", "ts"), gapMs = 3600 * 1000L)
    graft.streaming.EventStreams.withRocksDbStateStore(spark) {
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("session_timeout_sink").start()
    try {
      // batch 1: u1's session (2 events, last at 10:10) — nothing emits
      input.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("session_timeout_sink").count() == 0)
      // batch 2: u2 far in the future pushes max event time to 13:00;
      // batch 3's watermark (13:00 - 1s) then passes u1's timer at
      // 11:10 and the expired-timer path emits u1's closed session
      input.addData((2L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 13:10:00")))
      q.processAllAvailable()
      val rows = spark.table("session_timeout_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set((1L, 2L, ts("2024-01-01 10:10:00").getTime)))
    } finally q.stop()
    }
  }

  test("patternMatches (transformWithState ListState): buffer carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val matches = graft.streaming.EventStreams.patternMatches(
      input.toDF().toDF("user_id", "event_id", "event_type", "ts"))
    graft.streaming.EventStreams.withRocksDbStateStore(spark) {
    val q = matches.writeStream
      .outputMode("append").format("memory").queryName("pattern_sink").start()
    try {
      // batch 1: u1 view→click (pattern open, nothing emits);
      // u2 view→purchase (wrong order, nothing ever emits)
      input.addData(
        (1L, 10L, "view", ts("2024-01-01 10:00:00")),
        (1L, 11L, "click", ts("2024-01-01 10:05:00")),
        (2L, 20L, "view", ts("2024-01-01 10:00:00")),
        (2L, 21L, "purchase", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("pattern_sink").count() == 0)
      // batch 2: u1's purchase completes the buffered view→click from
      // batch 1 (ListState carry); an error event then breaks the
      // buffer, so a second immediate purchase must NOT match
      input.addData(
        (1L, 12L, "purchase", ts("2024-01-01 10:10:00")),
        (1L, 13L, "error", ts("2024-01-01 10:15:00")),
        (1L, 14L, "purchase", ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      val rows = spark.table("pattern_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, ts("2024-01-01 10:10:00").getTime * 1000)))
    } finally q.stop()
    }
  }
}
