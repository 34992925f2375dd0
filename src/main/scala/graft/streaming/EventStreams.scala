package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Num

/** User-facing streaming transforms over the events schema
  * (ts timestamp, user_id long, event_type string, value double, …).
  * Each transform is unbounded-safe: the same code runs on a batch
  * DataFrame or a readStream frame (Structured Streaming's core
  * contract), which is how the oracle checks batch equivalence while
  * StreamingSpec checks incremental semantics.
  */
object EventStreams {

  /** Tumbling event-time window aggregate. */
  def tumblingAgg(events: DataFrame, window: String = "1 hour"): DataFrame =
    events
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))

  /** Gap-based sessionization per user. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"))

  /** Per-user session stats over sessionize's output. */
  def sessionStats(sessions: DataFrame): DataFrame =
    sessions.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_ev").as("n_events"),
        max("n_ev").as("max_session_events"))

  /** Drive a streaming frame to completion into an in-memory table and
    * return it as a batch DataFrame (used by the declared queries to
    * exercise the streaming engine inside a batch contract).
    */
  def runToMemorySink(streamingDf: DataFrame, outputMode: String = "complete"): DataFrame = {
    val sinkName = s"graft_stream_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = streamingDf.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    streamingDf.sparkSession.table(sinkName)
  }
}
