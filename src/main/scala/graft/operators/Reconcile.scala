package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconciliation / retention operators (SURVEY §2.5, §2.6). */
object Reconcile {

  /** R1 — cancel-missing, full-feed reconciliation
    * (`icalendar_calendar_v1.rb:245-261`): rows of `current` scoped by
    * `scope` whose key is NOT in `presentKeys` and whose `statusCol` is not
    * already `cancelledValue` get status := cancelledValue. Left-anti shaped,
    * expressed as a broadcast-friendly left join on the (small) present set.
    */
  def cancelMissing(current: DataFrame, presentKeys: DataFrame, keyCol: String,
                    statusCol: String, cancelledValue: String,
                    scope: Column = lit(true)): DataFrame = {
    val present = broadcast(presentKeys.select(col(keyCol)).distinct()
      .withColumn("__present", lit(true)))
    current.join(present, Seq(keyCol), "left")
      .withColumn(statusCol,
        when(scope && col("__present").isNull && !(col(statusCol) <=> cancelledValue),
          lit(cancelledValue)).otherwise(col(statusCol)))
      .select(current.columns.map(col): _*) // preserve the input column order
  }

  /** R2 — stale-sequence delete (`icalendar_calendar_v1.rb:445-450`): drop
    * rows whose per-group sequence exceeds the max seen in the new feed.
    * `maxSeen`: (groupCol, maxSeq). */
  def deleteStaleSequences(current: DataFrame, maxSeen: DataFrame,
                           groupCol: String, seqCol: String,
                           maxSeqCol: String): DataFrame =
    current.join(broadcast(maxSeen), Seq(groupCol), "left")
      .filter(col(maxSeqCol).isNull || col(seqCol) <= col(maxSeqCol))
      .drop(maxSeqCol)

  /** R3 — stale-row deleter (`base_stale_row_deleter.rb:54-173`): delete rows
    * matching `staleCondition` whose `updatedAtCol` falls in
    * [staleAt - lookback, staleAt). The reference chunks by hour/10k rows to
    * bound Postgres locks; under a columnar snapshot a single windowed
    * predicate both prunes files and bounds the scan. */
  def staleRowDelete(current: DataFrame, updatedAtCol: String,
                     staleCondition: Column,
                     windowStart: Column, windowEnd: Column): DataFrame =
    current.filter(
      !(staleCondition &&
        col(updatedAtCol) >= windowStart && col(updatedAtCol) < windowEnd))

  /** I1 — sync-target incremental scan (`sync_target.rb:435-447`):
    * `ts in [lastSynced, now] ORDER BY ts`. The order-by matters for the
    * paged commit protocol (I6); at scale this is a range-partitioned sort. */
  def incrementalScan(table: DataFrame, tsCol: String,
                      lastSyncedAt: Column, now: Column): DataFrame =
    table.filter(col(tsCol) >= lastSyncedAt && col(tsCol) <= now)
      .orderBy(col(tsCol))

  /** R6 — audit-log retention (`logged_webhook.rb:40-44`): truncate bodies
    * past `truncateAt`, drop rows past `deleteAt`. */
  def auditRetention(log: DataFrame, tsCol: String, bodyCol: String,
                     truncateBefore: Column, deleteBefore: Column): DataFrame =
    log.filter(col(tsCol) >= deleteBefore)
      .withColumn(bodyCol,
        when(col(tsCol) < truncateBefore, lit(null)).otherwise(col(bodyCol)))
}
