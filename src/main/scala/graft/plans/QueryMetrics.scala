package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Execution metrics for one query run — the observability surface an
  * operator of a shared 100 TB engine needs next to the admission gates in
  * [[ReadonlyGuard]]: how much was actually read, shuffled, and spilled,
  * so per-org cost attribution and regression alarms have numbers instead
  * of plans.
  *
  * Attribution is real, not best-effort: the measured action runs inside a
  * dedicated job group, the listener collects the stage ids of exactly the
  * jobs carrying that group id, and only task-ends from those stages are
  * summed — concurrent queries on the same SparkContext (other orgs, other
  * suites) do not contaminate the numbers.
  */
object QueryMetrics {

  final case class Metrics(
      inputBytes: Long, inputRecords: Long,
      shuffleWriteBytes: Long, shuffleReadBytes: Long,
      memorySpillBytes: Long, diskSpillBytes: Long,
      resultRows: Long, wallMs: Long)

  private val groupCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `df.count()` under a metrics listener and return what it cost.
    * For metering a query you are also serving, prefer [[measureAction]] —
    * count()'s column-pruned plan can read far fewer bytes than the real
    * collect, and running both doubles the work. */
  def measure(df: DataFrame): Metrics = {
    val (rows, m) = measureAction(df.sparkSession)(df.count())
    m.copy(resultRows = rows)
  }

  /** Run an arbitrary Spark `action` under a metrics listener and return its
    * result together with what that exact execution cost. This is the real
    * attribution path: one execution, metered as served — not a side count()
    * whose pruned plan under-reports input bytes. `resultRows` is 0 (the
    * action's result is opaque here); callers that know their row count set
    * it via `copy`. */
  def measureAction[A](spark: SparkSession)(action: => A): (A, Metrics) = {
    val sc = spark.sparkContext
    val group = s"graft-metrics-${groupCounter.incrementAndGet()}"
    val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    var input = 0L; var records = 0L
    var sw = 0L; var sr = 0L; var memSpill = 0L; var diskSpill = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group))
          j.stageIds.foreach(s => myStages.add(s))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && myStages.contains(t.stageId)) synchronized {
          input += m.inputMetrics.bytesRead
          records += m.inputMetrics.recordsRead
          sw += m.shuffleWriteMetrics.bytesWritten
          sr += m.shuffleReadMetrics.totalBytesRead
          memSpill += m.memoryBytesSpilled
          diskSpill += m.diskBytesSpilled
        }
      }
    }
    sc.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      sc.setJobGroup(group, s"QueryMetrics.measure($group)",
        interruptOnCancel = false)
      val result = try action finally sc.clearJobGroup()
      // listener events are posted asynchronously; drain before reading
      org.apache.spark.GraftListenerBridge.drainListeners(sc)
      (result, Metrics(input, records, sw, sr, memSpill, diskSpill, 0L,
        (System.nanoTime() - t0) / 1000000L))
    } finally sc.removeSparkListener(listener)
  }

  /** Human-oriented one-liner (ops logs, the reference's admin diag style). */
  def render(m: Metrics): String =
    f"rows=${m.resultRows} wall=${m.wallMs}ms read=${m.inputBytes}B/" +
      f"${m.inputRecords}rec shuffle=${m.shuffleWriteBytes}B/w+${m.shuffleReadBytes}B/r " +
      f"spill=${m.memorySpillBytes}+${m.diskSpillBytes}B"
}
