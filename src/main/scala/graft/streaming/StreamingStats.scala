package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous event statistics: the streaming form of the A4 per-window
  * aggregations (reference `EventStatisticsService` polls counters; the
  * Spark-native form is an event-time tumbling window + watermark).
  *
  * Semantics under the watermark (spec-pinned in StreamingStatsSpec):
  * events later than the horizon are dropped by the engine; a window
  * finalizes — and in append mode emits exactly once — when the watermark
  * passes its end. State is bounded by (horizon / window) per group key,
  * evicted automatically: the property that lets the aggregation run
  * forever at 1 M events/s without growing state.
  */
object StreamingStats {

  /** Tumbling per-(window, event_type) counts and value sums over an
    * event-time `ts` column.
    */
  def tumblingStats(events: DataFrame, windowDur: String,
                    watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows (gap-merged) per user over the same event-time
    * column — the streaming form of q:w_session_30m. A session closes
    * (and in append mode emits exactly once) when the watermark passes
    * last-event + gap; state per open session is one merged range.
    */
  def sessionStats(events: DataFrame, gap: String,
                   watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
