package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming counterpart of q185's trailing-window anomaly detector:
  * per-user state is the last 10 cent-quantized values (a constant-size
  * ring), maintained with `flatMapGroupsWithState`, and every arriving
  * event is tested with the SAME integer z-score inequality the batch
  * query uses — (n*v - s)^2 > 4*(n*q - s^2) — so the stream's verdicts
  * equal the batch window's verdicts event-for-event (spec-gated).
  *
  * Ordering contract: events must arrive (ts_ms, event_id)-ordered per
  * user ACROSS microbatches — the event_id tiebreak matters, because the
  * batch window orders by it too and two same-millisecond events split
  * across batches would otherwise see each other in a different order
  * than q185's frame. Within a batch they are sorted here. That is the
  * contract a replayed ingest log satisfies; out-of-order arrival needs a
  * watermark-delayed reorder buffer upstream, which would change the
  * emission time but not the verdicts.
  *
  * Scale shape: state is 10 longs per active user — groups shuffle by
  * user_id (high cardinality), state never grows with history length.
  */
object AnomalyStream {

  case class Ev(event_id: Long, user_id: Long, ts_ms: Long, v: Long)
  case class Anomaly(user_id: Long, event_id: Long, ts_ms: Long, v: Long, hist_n: Long)
  case class Hist(vals: Seq[Long])

  val Window = 10
  val MinHist = 5

  /** The per-group transition: test each event against the current ring,
    * then push it in. Public so batch-parity is testable directly. */
  def step(userId: Long, events: Iterator[Ev], state: GroupState[Hist]): Iterator[Anomaly] = {
    var h = state.getOption.map(_.vals).getOrElse(Vector.empty[Long])
    val out = events.toSeq.sortBy(e => (e.ts_ms, e.event_id)).flatMap { e =>
      val n = h.size.toLong
      val hit = if (n >= MinHist) {
        val s = h.sum
        val q = h.map(x => x * x).sum
        val lhs = n * e.v - s
        lhs * lhs > 4L * (n * q - s * s)
      } else false
      h = (h :+ e.v).takeRight(Window)
      if (hit) Some(Anomaly(e.user_id, e.event_id, e.ts_ms, e.v, n)) else None
    }
    state.update(Hist(h))
    out.iterator
  }

  /** events: (event_id, user_id, ts_ms, v) rows (already quantized). */
  def detect(events: DataFrame): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_id", "user_id", "ts_ms", "v").as[Ev]
      .groupByKey(_.user_id)
      // NoTimeout: processing-time timeouts schedule empty batches forever
      // under processAllAvailable (round-2 gotcha)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
  }

  /** Wire a quantized event stream into a parquet anomaly ledger. */
  def start(events: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    detect(events).toDF()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** Batch events -> the quantized frame `detect` consumes (the same
    * projection q185 starts from). */
  def quantized(spark: SparkSession, d: String): DataFrame =
    graft.Tables.events(spark, d).select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("ts_ms"),
      (col("value").cast("decimal(12,2)") * 100).cast("long").as("v"))
}
