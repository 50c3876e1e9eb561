package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins: the streaming counterpart of the batch
  * as-of join (operators/AsofJoin) for the attribution shape — match each
  * right-stream event (purchase) to left-stream events (clicks) that
  * happened within a bounded look-back interval.
  *
  * The time-interval condition is what bounds state: each side buffers only
  * rows inside `horizon` of its watermark, so state is (arrival rate x
  * horizon), independent of stream age. An unbounded equi-join between
  * streams would grow state forever — never ship one.
  */
object StreamJoins {

  /** Inner interval join: left events within `[right.ts - horizon, right.ts]`
    * for the same user. Both inputs need (ts, user_id, ...); columns are
    * prefixed to keep the output unambiguous.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, horizon: String,
                   lateness: String): DataFrame = {
    val l = left.withWatermark("ts", lateness)
      .select(col("ts").as("l_ts"), col("user_id").as("l_user"),
        col("event_type").as("l_type"), col("value").as("l_value"))
    val r = right.withWatermark("ts", lateness)
      .select(col("ts").as("r_ts"), col("user_id").as("r_user"),
        col("event_type").as("r_type"), col("value").as("r_value"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("l_ts") <= col("r_ts") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $horizon"))
  }
}
