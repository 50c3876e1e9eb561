package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.Row
import java.sql.Timestamp

/** K1-K3/I1/I5/I6 contracts: ordered paging, watermark commit over full
  * pages only, soft-cap continuation resume. */
class SyncTargetSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def table = (1 to 10).map { i =>
    (i.toLong, ts(f"2024-01-${i}%02d 00:00:00"))
  }.toDF("id", "updated")

  private class Collecting extends SyncTarget.PageSink {
    val pages = scala.collection.mutable.ArrayBuffer.empty[Seq[Row]]
    def writePage(page: Seq[Row], idx: Long): Unit = pages += page
  }

  test("pages are ordered by ts, watermark = last delivered ts") {
    val sink = new Collecting
    val r = SyncTarget.sync(table, "updated",
      ts("2024-01-03 00:00:00"), ts("2024-01-08 00:00:00"), pageSize = 4, sink)
    assert(sink.pages.map(_.size).toSeq == Seq(4, 2)) // 6 rows in window
    val ids = sink.pages.flatten.map(_.getLong(0))
    assert(ids == Seq(3L, 4L, 5L, 6L, 7L, 8L))
    assert(r.committedThrough.contains(ts("2024-01-08 00:00:00")))
    assert(!r.truncated)
  }

  test("soft page cap truncates; resume from committed watermark completes") {
    val sink = new Collecting
    val r1 = SyncTarget.sync(table, "updated",
      ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"),
      pageSize = 3, sink, maxPages = 2)
    assert(r1.truncated && r1.pagesDelivered == 2)
    val wm = r1.committedThrough.get
    assert(wm == ts("2024-01-06 00:00:00"))
    // continuation resumes at the watermark (consumer merge dedups the overlap row)
    val r2 = SyncTarget.sync(table, "updated", wm, ts("2024-01-10 00:00:00"),
      pageSize = 3, sink)
    assert(!r2.truncated)
    val all = sink.pages.flatten.map(_.getLong(0))
    assert(all.distinct.sorted == (1L to 10L))
  }

  test("failing page aborts but prior pages stay committed") {
    val sink = new SyncTarget.PageSink {
      var delivered = 0
      def writePage(page: Seq[Row], idx: Long): Unit = {
        if (idx == 1) throw new RuntimeException("boom")
        delivered += page.size
      }
    }
    assertThrows[RuntimeException] {
      SyncTarget.sync(table, "updated",
        ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"), pageSize = 4, sink)
    }
    assert(sink.delivered == 4)
  }

  test("parallel delivery: watermark only advances over the completed prefix (I6)") {
    // page 1 (middle) fails; pages 0 and 2 deliver. The watermark must stop
    // at the end of page 0 — page 2's completion cannot commit past the hole.
    val delivered = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    val sink = new SyncTarget.PageSink {
      def writePage(page: Seq[Row], idx: Long): Unit = {
        if (idx == 1) { Thread.sleep(50); throw new RuntimeException("boom") }
        delivered.add(idx)
      }
    }
    val r = SyncTarget.syncParallel(table, "updated",
      ts("2024-01-01 00:00:00"), ts("2024-01-09 00:00:00"),
      pageSize = 3, sink, parallelism = 3)
    // a sink error is a FAILURE, not the maxPages soft cap: truncated stays
    // false (the two answers differ — continuation vs alert/backoff)
    assert(!r.truncated)
    assert(r.failure.exists(_.getMessage == "boom"))
    assert(r.committedThrough.contains(ts("2024-01-03 00:00:00"))) // end of page 0
    assert(delivered.contains(0L) && delivered.contains(2L))
    assert(r.pagesDelivered == 2 && r.rowsDelivered == 6) // failed page not counted
  }

  test("parallel delivery commits everything when all pages succeed") {
    val sink = new Collecting
    val r = SyncTarget.syncParallel(table, "updated",
      ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"),
      pageSize = 4, sink, parallelism = 4)
    assert(!r.truncated && r.failure.isEmpty)
    assert(r.committedThrough.contains(ts("2024-01-10 00:00:00")))
    assert(r.pagesDelivered == 3 && r.rowsDelivered == 10)
    assert(sink.pages.flatten.map(_.getLong(0)).sorted == (1L to 10L))
  }

  test("due scheduling + rows needing sync filters") {
    val targets = Seq(
      ("t1", Some(ts("2024-01-01 00:00:00")), 600L),
      ("t2", Some(ts("2024-01-01 00:51:00")), 600L),
      ("t3", None, 600L)).toDF("id", "last_synced_at", "period_sec")
    val due = SyncTarget.dueForSync(targets, "last_synced_at", "period_sec",
      ts("2024-01-01 01:00:00")).select("id").as[String].collect().sorted
    assert(due.toSeq == Seq("t1", "t3"))

    val rows = Seq(("r1", Some(ts("2024-01-01 00:00:00"))), ("r2", None))
      .toDF("id", "last_synced_at")
    val need = SyncTarget.rowsNeedingSync(rows, "last_synced_at",
      ts("2024-01-01 00:30:00")).select("id").as[String].collect().sorted
    assert(need.toSeq == Seq("r1", "r2"))
  }

  test("period clamps to [10 min, 24 h]; jitter is deterministic and bounded") {
    assert(SyncTarget.clampPeriod(1) == 600L)
    assert(SyncTarget.clampPeriod(3600) == 3600L)
    assert(SyncTarget.clampPeriod(1000000) == 86400L)
    val targets = (1 to 200).map(i => (s"t$i", 600L)).toDF("id", "period_sec")
    val jit = targets.select(
      SyncTarget.jitterSeconds(col("id"), col("period_sec")).as("j"))
      .as[Long].collect()
    assert(jit.forall(j => j >= 0 && j < 20)) // min(20, 600/4) = 20
    assert(jit.distinct.length > 5)           // actually spread, not constant
    val again = targets.select(
      SyncTarget.jitterSeconds(col("id"), col("period_sec")).as("j"))
      .as[Long].collect()
    assert(jit.toSeq == again.toSeq)          // reproducible
    // tiny period never divides by zero
    val tiny = Seq(("x", 2L)).toDF("id", "period_sec").select(
      SyncTarget.jitterSeconds(col("id"), col("period_sec")).as("j"))
      .as[Long].collect()
    assert(tiny.head == 0L)
  }
}
