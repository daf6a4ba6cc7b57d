package graft.streaming

import graft.Tables.{asDouble, money}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-window transforms shared by batch queries and Structured Streaming
  * (SURVEY.md §2.10). Each takes any frame with the `events` schema —
  * batch (`spark.read`) or streaming (`spark.readStream`/MemoryStream) —
  * and returns the same logical plan, so batch results ARE the oracle for
  * the streaming execution (asserted in StreamingSpec).
  *
  * Scale posture: tumbling/hopping aggregate with partial+final combine on
  * (window, key); session windows shuffle once by user key. In streaming
  * mode add `withWatermark` before these transforms to bound state.
  */
object Streams {

  /** Tumbling 10-minute windows per event_type: count + exact-decimal sum. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), asDouble(sum(money(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Hopping windows: width 10 minutes, slide 5 — each event lands in two
    * windows. */
  def hopping(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user with a 5-minute inactivity gap. Spark's
    * session end = last event + gap (half-open [start, end)). */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           asDouble(sum(money(col("value")))).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"), col("sum_value"))
}
