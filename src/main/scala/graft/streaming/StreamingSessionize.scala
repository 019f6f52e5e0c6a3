package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time sessionization on a stream — the streaming counterpart of
  * q_sessionize (X5): Spark's native `session_window` merges events within
  * `gap` of each other into one window per key, and the watermark both
  * bounds state (sessions older than the watermark are evicted after
  * finalizing) and defines completeness (append mode emits a session only
  * once no on-time event can extend it).
  *
  * Session semantics match the batch operator: `session_start` is the
  * first event time, `session_end − gap` the last event time, so
  * batch-vs-stream parity is pinned in `StreamingSessionizeSpec` by
  * comparing (key, start, end, n) tuples from the SAME rows.
  *
  * Scale shape: the state store keys on (key, merged window) — per-key
  * live-session state only, watermark-evicted; the aggregation is
  * hash-distributed by key exactly like the batch groupBy. No custom
  * state processor needed: the built-in operator already implements
  * gap-merge + eviction.
  */
object StreamingSessionize {

  /** Gap-based sessions per key over an event-time `TimestampType` column.
    * Works unchanged on batch DataFrames (the parity anchor). */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
