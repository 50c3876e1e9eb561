package graft.sinks

import graft.operators.Projection
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Webhook audit log (K7, `lib/webhookdb/logged_webhook.rb`): every inbound
  * request is appended with its response status; retention truncates bodies
  * (7d success / 30d failure), deletes at 90d; replay re-emits stored
  * requests into the ingest path with hop-by-hop headers stripped
  * (`api/replay.rb`, `logged_webhook.rb:145`).
  */
object AuditLog {

  val TruncateSuccessDays = 7
  val TruncateFailureDays = 30
  val DeleteDays = 90
  /** Headers never replayed (connection/transport-specific). */
  val StrippedHeaders: Seq[String] =
    Seq("accept", "accept-encoding", "content-length", "host", "connection", "version")

  /** Retention pass (R6): body truncation + hard delete, one windowed scan. */
  def applyRetention(log: DataFrame, now: Timestamp): DataFrame = {
    val age = datediff(lit(now), col("inserted_at"))
    log
      .filter(age <= DeleteDays)
      .withColumn("body",
        when(col("response_status") < 400 && age > TruncateSuccessDays, lit(null))
          .when(age > TruncateFailureDays, lit(null))
          .otherwise(col("body")))
  }

  /** Replay limits (`logged_webhook.rb:21-24`): one replay call may cover at
    * most 4 hours, reaching back at most 7 days. */
  val MaxReplayIntervalHours = 4
  val MaxReplayHistoryDays = 7

  /** Replay a bounded time window, enforcing the reference's limits. */
  def replayWindow(log: DataFrame, from: Timestamp, to: Timestamp,
                   now: Timestamp): DataFrame = {
    require(to.after(from), s"empty replay window: $from..$to")
    require(to.getTime - from.getTime <= MaxReplayIntervalHours * 3600L * 1000L,
      s"replay window exceeds $MaxReplayIntervalHours h: $from..$to")
    require(now.getTime - from.getTime <= MaxReplayHistoryDays * 86400L * 1000L,
      s"replay window reaches past $MaxReplayHistoryDays d of history: $from")
    replay(log, col("inserted_at") >= lit(from) && col("inserted_at") < lit(to))
  }

  /** Replay stored requests as an ingest batch: header filtering + fresh
    * ingest sequence (replays are "new" arrivals — the idempotent merge makes
    * them safe). */
  def replay(log: DataFrame, scope: org.apache.spark.sql.Column): DataFrame = {
    val kept = map_filter(col("headers"),
      (k, _) => !k.isin(StrippedHeaders.map(lit(_)): _*))
    log.filter(scope && col("body").isNotNull)
      .select(
        col("body"),
        kept.as("headers"),
        col("path"),
        col("method"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("inserted_at"), col("request_id")))
          .cast("long").as(Projection.IngestSeqCol))
  }
}
