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
        * `sync_target.rb:59-64` — caller re-enqueues a continuation).
        * NEVER set for delivery failures — see [[failure]]. */
      truncated: Boolean,
      /** The sink error that aborted the run, if any: callers alert/retry
        * with backoff rather than silently re-enqueueing a continuation.
        * The committed watermark still reflects fully-delivered pages. */
      failure: Option[Throwable] = None)

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

  /** I6 — parallel page delivery with the min-inflight ordered commit
    * (`sync_target.rb:555-598`): pages post concurrently, but the
    * committed watermark only advances to just below the EARLIEST page
    * still in flight — a crash never skips an undelivered page, at the cost
    * of re-sending completed later pages (idempotent on the consumer's
    * merge). */
  def syncParallel(table: DataFrame, tsCol: String, lastSyncedAt: Timestamp,
                   now: Timestamp, pageSize: Int, sink: PageSink,
                   parallelism: Int): SyncResult = {
    import java.util.concurrent.{Executors, TimeUnit}
    val scan = table
      .filter(col(tsCol) >= lit(lastSyncedAt) && col(tsCol) <= lit(now))
      .orderBy(col(tsCol))
    val tsIdx = scan.schema.fieldIndex(tsCol)

    // ordered-commit bookkeeping: the watermark is the last ts of the
    // longest contiguous prefix of COMPLETED pages (pages may finish out of
    // order; an undelivered earlier page blocks later ones from committing)
    val completedPages = new java.util.concurrent.ConcurrentHashMap[Long, Timestamp]()
    val commitLock = new Object
    var nextToCommit = 0L
    val committed = new java.util.concurrent.atomic.AtomicReference[Option[Timestamp]](None)
    def advance(): Unit = commitLock.synchronized {
      var ts = Option.empty[Timestamp]
      while (completedPages.containsKey(nextToCommit)) {
        ts = Some(completedPages.remove(nextToCommit))
        nextToCommit += 1
      }
      ts.foreach(t => committed.set(Some(t)))
    }
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val deliveredPages = new java.util.concurrent.atomic.AtomicLong(0)
    val deliveredRows = new java.util.concurrent.atomic.AtomicLong(0)
    val pool = Executors.newFixedThreadPool(parallelism.max(1))
    var pages = 0L
    try {
      val it = scan.toLocalIterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      val futures = scala.collection.mutable.ArrayBuffer.empty[java.util.concurrent.Future[_]]
      def submit(): Unit = {
        val page = buf.toSeq
        val idx = pages
        val pageLastTs = page.last.getAs[Timestamp](tsIdx)
        pages += 1
        buf.clear()
        futures += pool.submit(new Runnable {
          def run(): Unit =
            try {
              sink.writePage(page, idx)
              deliveredPages.incrementAndGet()
              deliveredRows.addAndGet(page.size.toLong)
              completedPages.put(idx, pageLastTs)
              advance()
            } catch { case t: Throwable => failure.compareAndSet(null, t) }
        })
      }
      while (it.hasNext && failure.get() == null) {
        buf += it.next()
        if (buf.size >= pageSize) submit()
      }
      if (buf.nonEmpty && failure.get() == null) submit()
      futures.foreach(f => try f.get() catch { case _: Exception => () })
      // delivered counts reflect pages that actually completed, not pages
      // submitted; a sink failure is reported distinctly from the maxPages
      // soft cap (truncated), so callers can tell "re-enqueue continuation"
      // from "delivery failed" (`sync_target.rb:59-64` vs error path)
      SyncResult(deliveredPages.get(), deliveredRows.get(), committed.get(),
        truncated = false, failure = Option(failure.get()))
    } finally {
      pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS); ()
    }
  }

  /** Period bounds (`sync_target.rb:46-47`): user-requested sync periods
    * clamp to [10 min, 24 h]. */
  val MinPeriodSeconds = 600L
  val MaxPeriodSeconds = 86400L
  def clampPeriod(seconds: Long): Long =
    seconds.max(MinPeriodSeconds).min(MaxPeriodSeconds)

  /** Deterministic scheduler jitter (`sync_target.rb:219-229`): each due
    * target starts up to min(20 s, period/4) late, keyed by its id — the
    * distributed, reproducible analog of the reference's random in-process
    * sleep, so a fleet of targets with the same period doesn't hit consumer
    * systems on the same tick. */
  def jitterSeconds(targetId: org.apache.spark.sql.Column,
                    periodSec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(targetId),
      greatest(lit(1L), least(lit(20L), (periodSec.cast("long") / 4).cast("long"))))

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
