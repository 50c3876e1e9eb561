package graft.replicators

import graft.functions.Converters
import graft.operators.{ColumnSpec, Merge, MergeSpec, Pipeline, Projection, ReplicatorSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.Instant

/** `icalendar_calendar_v1` (`lib/webhookdb/replicator/icalendar_calendar_v1.rb`):
  * the calendar-level table plus the webhook COMMAND protocol —
  * `{"type":"SYNC"|"DELETE","external_id":...,"ics_url":...}`
  * (`:114-133`) — and the R4 delete cascade that removes the calendar row
  * and every dependent event row in one logical operation (`:140-153`).
  */
object IcalendarCalendar {

  /** Calendar row schema: external_id key, webcal->https url rewrite
    * (`:80`), set-once created, sync bookkeeping. */
  val spec: ReplicatorSpec = ReplicatorSpec(
    name = "icalendar_calendar_v1",
    remoteKeyCol = "external_id",
    columns = Seq(
      ColumnSpec("external_id", StringType, Seq("external_id")),
      ColumnSpec("ics_url", StringType, Seq("ics_url"),
        convert = c => Converters.gsub(c, "^webcal", "https"), skipNil = true),
      ColumnSpec("row_created_at", TimestampType, Seq("row_created_at"),
        defaulter = Some(Converters.defaultNow), setOnce = true),
      ColumnSpec("row_updated_at", TimestampType, Seq("row_updated_at"),
        defaulter = Some(Converters.defaultNow)),
      ColumnSpec("last_synced_at", TimestampType, Seq("last_synced_at"), skipNil = true)),
    timestampCol = Some("row_updated_at"),
    updateWhere = (_, _) => lit(true))

  /** Feed refresh cadence (`icalendar.rb:23`,
    * `jobs/icalendar_enqueue_syncs.rb:38`): calendars refetch every 6 h; the
    * enqueue scan runs every 30 min; each due feed starts up to 1 h late by
    * a deterministic per-calendar splay (fleet spread without RNG state). */
  val SyncPeriodHours = 6
  val EnqueueScanMinutes = 30
  val MaxSplaySeconds = 3600L

  /** Calendars due for a feed refetch, each with its splay offset. */
  def dueForRefresh(calendars: DataFrame,
                    now: java.sql.Timestamp): DataFrame =
    calendars.filter(col("last_synced_at").isNull ||
        col("last_synced_at") <=
          lit(new java.sql.Timestamp(now.getTime - SyncPeriodHours * 3600000L)))
      .withColumn("start_delay_seconds",
        pmod(xxhash64(col("external_id")), lit(MaxSplaySeconds)))

  /** Route one batch of calendar command webhooks: SYNC commands upsert the
    * calendar row; DELETE commands cascade (R4) — drop the calendar row AND
    * all dependent event rows for that external id. Returns the new
    * (calendars, events) snapshots. */
  def processCommands(spark: SparkSession, calendars: DataFrame, events: DataFrame,
                      commands: DataFrame): (DataFrame, DataFrame) = {
    val typed = commands.withColumn("__type",
      upper(get_json_object(col("body"), "$.type")))
    val syncs = typed.filter(col("__type") === "SYNC").drop("__type")
    val deletes = typed.filter(col("__type") === "DELETE")
      .select(get_json_object(col("body"), "$.external_id").as("__del_id"))

    val afterSync = Pipeline.upsertBatch(spec, calendars, syncs)
    val delIds = broadcast(deletes.distinct())
    val newCalendars = afterSync
      .join(delIds, col("external_id") === col("__del_id"), "left_anti")
    val newEvents = events
      .join(delIds, col("calendar_external_id") === col("__del_id"), "left_anti")
    (newCalendars, newEvents)
  }

  /** One feed sync for a calendar (the SYNC job body): expand the fetched
    * ICS, merge into the events table (data-diff update_where + set-once
    * created), then reconcile (R1 cancel-missing + R2 stale sequences) and
    * stamp the calendar's last_synced_at. */
  def syncFeed(spark: SparkSession, calendars: DataFrame, events: DataFrame,
               calendarId: String, icsText: String, now: Instant): (DataFrame, DataFrame) = {
    import spark.implicits._
    val expanded = IcalendarEvents
      .expandDataset(Seq((calendarId, icsText)).toDS(), now).toDF()
      .withColumn(Projection.IngestSeqCol, monotonically_increasing_id())
    val mergeSpec = MergeSpec(
      keyCols = Seq("compound_identity"),
      orderCol = Projection.IngestSeqCol,
      updateWhere = (t, s) => !(t("data") <=> s("data")) ||
        !(t("status") <=> s("status")),
      coalesceOnUpdate = Nil)
    val merged = Merge.upsert(
      events.withColumn(Projection.IngestSeqCol, lit(-1L)), expanded, mergeSpec)
      .drop(Projection.IngestSeqCol)
    val reconciled = IcalendarEvents.reconcile(merged,
      expanded.drop(Projection.IngestSeqCol), calendarId)
    val newCalendars = calendars.withColumn("last_synced_at",
      when(col("external_id") === calendarId,
        lit(java.sql.Timestamp.from(now))).otherwise(col("last_synced_at")))
    (newCalendars, reconciled)
  }
}
