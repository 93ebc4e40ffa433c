package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-ready event transforms (SURVEY §2.2 row 42).
  * Every builder here works identically on a batch frame and a streaming
  * frame (`readStream` source): tumbling/session windows are the same
  * `window()`/`session_window()` calls, and the watermark hook makes the
  * aggregations state-bounded in continuous mode. Batch queries
  * (`events_window_agg`, `events_sessionize`) exercise the exact same
  * plans the stream would run.
  */
object StreamOps {

  /** Bound state for streaming aggregation; no-op on batch frames. */
  def withWatermark(df: DataFrame, tsCol: String, delay: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, delay) else df

  /** Tumbling-window counts/sums per event type. */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
                  delay: String = "2 hours"): DataFrame =
    withWatermark(events, "ts", delay)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessionization per user: session_window keeps a session
    * open while events arrive within `gap` of the previous one. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 delay: String = "2 hours"): DataFrame =
    withWatermark(events, "ts", delay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
}
