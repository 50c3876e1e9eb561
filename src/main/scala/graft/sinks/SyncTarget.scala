package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Outbound sync targets (K1-K3, `lib/webhookdb/sync_target.rb`): periodic
  * incremental export of replicated rows into a customer system, paged, with
  * a committed watermark that only advances over fully-delivered data.
  *
  * The transport is pluggable ([[PageSink]]): a JDBC staging merge (K1), a
  * warehouse bulk load (K2) or paged HTTP POSTs (K3) all consume the same
  * ordered page stream. Tests inject a collecting sink.
  *
  * Scale/ordering model (I1/I5/I6): the scan is
  * `ts in [lastSynced, now] ORDER BY ts` — a range-partitioned sort in
  * Spark. Pages stream through the driver in timestamp order (the page
  * protocol is ordered by contract, like the reference's server-side
  * cursor), and `last_synced_at` advances to the max ts of the last FULLY
  * delivered page — a crash resumes from the committed watermark and
  * re-delivers at most one window (idempotent on the consumer's key merge,
  * `sync_target.rb:527-598`).
  */
object SyncTarget {

  trait PageSink {
    /** Deliver one page. Throwing aborts the run; already-delivered pages
      * stay committed. */
    def writePage(page: Seq[Row], pageIdx: Long): Unit
  }

  final case class SyncResult(
      pagesDelivered: Long,
      rowsDelivered: Long,
      /** Watermark to persist; None when nothing was delivered. */
      committedThrough: Option[Timestamp],
      /** True when maxPages stopped the run early (soft transaction cap,
        * `sync_target.rb:59-64` — caller re-enqueues a continuation). */
      truncated: Boolean)

  /** Run one incremental sync pass. */
  def sync(table: DataFrame, tsCol: String, lastSyncedAt: Timestamp,
           now: Timestamp, pageSize: Int, sink: PageSink,
           maxPages: Long = Long.MaxValue): SyncResult = {
    val scan = table
      .filter(col(tsCol) >= lit(lastSyncedAt) && col(tsCol) <= lit(now))
      .orderBy(col(tsCol))
    val tsIdx = scan.schema.fieldIndex(tsCol)

    var pages = 0L
    var rows = 0L
    var committed: Option[Timestamp] = None
    var truncated = false
    val it = scan.toLocalIterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    def flush(): Unit = if (buf.nonEmpty) {
      sink.writePage(buf.toSeq, pages)
      pages += 1
      rows += buf.size
      committed = Some(buf.last.getAs[Timestamp](tsIdx))
      buf.clear()
    }
    while (it.hasNext && !truncated) {
      buf += it.next()
      if (buf.size >= pageSize) {
        flush()
        if (pages >= maxPages && it.hasNext) truncated = true
      }
    }
    if (!truncated) flush()
    SyncResult(pages, rows, committed, truncated)
  }

  /** I7 — due-scheduling scan (`sync_target.rb:98-106`, index-friendly form):
    * targets whose `last_synced_at` is NULL or older than now - period. */
  def dueForSync(targets: DataFrame, lastSyncedCol: String, periodSecCol: String,
                 now: Timestamp): DataFrame =
    targets.filter(
      col(lastSyncedCol).isNull ||
        col(lastSyncedCol) <= (lit(now).cast("long") - col(periodSecCol)).cast("timestamp"))

  /** I8 — `rows_needing_sync` (`icalendar_calendar_v1.rb:135-138`). */
  def rowsNeedingSync(rows: DataFrame, lastSyncedCol: String,
                      cutoff: Timestamp): DataFrame =
    rows.filter(col(lastSyncedCol).isNull || col(lastSyncedCol) < lit(cutoff))
}
