package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the unbounded-stream twin of the batch
  * gap-split sessions in [[graft.ops.RelationalOps.sessionize]] (q54),
  * built on Spark's NATIVE `session_window` aggregation rather than custom
  * `flatMapGroupsWithState` state: the built-in operator already maintains
  * merge-on-overlap session state with watermark-bounded retention, so
  * custom state code would only re-implement it worse (the preference
  * order SURVEY.md §7.2 sets: compose built-ins before custom state).
  *
  * Semantics: a session groups a user's events whose gaps are < `gap`;
  * state per key is O(open sessions), sealed sessions emit once the
  * watermark passes session end + gap. Note the window-end convention
  * difference vs batch q54: `session_window.end` = last event + gap,
  * while q54's `end_us` = last event — both are emitted here (`last_ts`
  * matches q54's convention; `window_end` is the native operator's).
  * Boundary convention: q54 splits when a gap is STRICTLY greater than
  * the threshold; `session_window` splits at exactly the threshold too
  * (half-open [start, last+gap) windows) — identical for every gap except
  * the exact-equality edge.
  */
object StreamSessions {

  def sessionize(events: DataFrame, tsCol: String = "ts",
                 gap: String = "30 minutes",
                 watermarkDelay: String = "30 seconds"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsCol).as("first_ts"),
        max(tsCol).as("last_ts"))
      .select(
        col("user_id"),
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("first_ts"), col("last_ts"))
}
