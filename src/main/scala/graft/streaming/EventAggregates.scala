package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over an event stream: watermarked tumbling/sliding
  * window aggregation. The reference's replication core needs no windows
  * (SURVEY §2.11 — idempotent merge handles lateness), but the query surface
  * of a Spark-native engine exposes them; this is the streaming-side shape
  * with bounded state: the watermark evicts window state older than the
  * allowed lateness.
  */
object EventAggregates {

  /** Tumbling (or sliding, if `slide` differs) per-type counts and sums.
    * Works on a streaming OR batch DataFrame with (ts, event_type, value). */
  def windowedTypeStats(events: DataFrame, windowLen: String, slide: String,
                        lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
}
