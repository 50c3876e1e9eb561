package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Execution metrics for one query run — the observability surface an
  * operator of a shared 100 TB engine needs next to the admission gates in
  * [[ReadonlyGuard]]: how much was actually read, shuffled, and spilled,
  * so per-org cost attribution and regression alarms have numbers instead
  * of plans.
  *
  * Implementation: a scoped `SparkListener` around one action. Listener
  * events are JVM-wide, so concurrent queries on the same session would
  * mix — the measured action runs inside a dedicated job group and tasks
  * are attributed by stage membership of that run's jobs. For the per-query
  * admission path (one query per child session, `ReadonlyGuard`) this is
  * exact.
  */
object QueryMetrics {

  final case class Metrics(
      inputBytes: Long, inputRecords: Long,
      shuffleWriteBytes: Long, shuffleReadBytes: Long,
      memorySpillBytes: Long, diskSpillBytes: Long,
      resultRows: Long, wallMs: Long)

  /** Run `df.count()` under a metrics listener and return what it cost. */
  def measure(df: DataFrame): Metrics = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    var input = 0L; var records = 0L
    var sw = 0L; var sr = 0L; var memSpill = 0L; var diskSpill = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) synchronized {
          input += m.inputMetrics.bytesRead
          records += m.inputMetrics.recordsRead
          sw += m.shuffleWriteMetrics.bytesWritten
          sr += m.shuffleReadMetrics.totalBytesRead
          memSpill += m.memoryBytesSpilled
          diskSpill += m.diskBytesSpilled
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = ()
    }
    sc.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      val rows = df.count()
      // listener events are posted asynchronously; drain before reading
      org.apache.spark.GraftListenerBridge.drainListeners(sc)
      Metrics(input, records, sw, sr, memSpill, diskSpill, rows,
        (System.nanoTime() - t0) / 1000000L)
    } finally sc.removeSparkListener(listener)
  }

  /** Human-oriented one-liner (ops logs, the reference's admin diag style). */
  def render(m: Metrics): String =
    f"rows=${m.resultRows} wall=${m.wallMs}ms read=${m.inputBytes}B/" +
      f"${m.inputRecords}rec shuffle=${m.shuffleWriteBytes}B/w+${m.shuffleReadBytes}B/r " +
      f"spill=${m.memorySpillBytes}+${m.diskSpillBytes}B"
}
