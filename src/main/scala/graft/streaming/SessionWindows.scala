package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization: the continuous form of the batch q36 operator
  * (gap-based sessions via lag + running sum). Spark's built-in
  * `session_window` is the declarative shape — state is one open window per
  * active (user, session), merged as events arrive, emitted and evicted
  * once the watermark passes the session gap. That keeps state bounded by
  * ACTIVE sessions, not history, which is what survives an unbounded
  * stream: nothing accumulates for users gone idle.
  */
object SessionWindows {

  /** Per-user sessions with a fixed inactivity gap. Works on streaming or
    * batch frames with (ts, user_id, value). Emits one row per closed
    * session (append mode requires the watermark).
    */
  def userSessions(events: DataFrame, gap: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Watermark-bounded exact dedup on a key column: the built-in
    * counterpart to [[StatefulDedup]] for the common "drop exact replays
    * within the lateness horizon" case — state expires with the watermark
    * instead of a processing-time timeout. */
  def dedupWithinWatermark(events: DataFrame, lateness: String,
                           keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)
}
