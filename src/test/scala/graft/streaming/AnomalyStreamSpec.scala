package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the anomaly detector: feeding the event table
  * through the stateful stream in time-ordered microbatches must reproduce
  * q185's batch-window verdicts exactly — same events flagged, same
  * history counts — and the per-user state must stay ring-bounded. */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchResult() =
    graft.queries.ExtraQueries.q185(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("v"), col("hist_n"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("stateful stream reproduces the batch trailing-window verdicts") {
    val quantized = AnomalyStream.quantized(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
      // the ingest contract: (ts, event_id)-ordered — the id tiebreak keeps
      // same-millisecond events in the batch window's order across batches
      .sortBy { case (id, _, ts, _) => (ts, id) }
      .toSeq
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Long)]
    val root = java.nio.file.Files.createTempDirectory("anomstream").toString
    val q = AnomalyStream.start(
      input.toDS().toDF("event_id", "user_id", "ts_ms", "v"),
      s"$root/out", s"$root/chk")
    try {
      quantized.grouped((quantized.size / 5).max(1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$root/out")
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("v"), col("hist_n"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = batchResult()
    assert(streamed == batch,
      s"stream/batch diverged: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty, "parity test must exercise real anomalies")
  }

  test("step() is ring-bounded and batch-slicing-invariant") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    // one user, 30 drifting values with periodic spikes, split unevenly
    val evs = (0 until 30).map { i =>
      val v = if (i % 13 == 12) 5000L else 100L + i
      AnomalyStream.Ev(i.toLong, 7L, 1000L + i, v)
    }
    def run(chunks: Seq[Seq[AnomalyStream.Ev]]): Seq[(Long, Long)] = {
      var prev: Optional[AnomalyStream.Hist] = Optional.empty()
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      chunks.foreach { c =>
        val st = TestGroupState.create[AnomalyStream.Hist](
          prev, GroupStateTimeout.NoTimeout(), 0L,
          Optional.empty[Long](), hasTimedOut = false)
        out ++= AnomalyStream.step(7L, c.iterator, st)
          .map(a => (a.event_id, a.hist_n))
        assert(st.exists && st.get.vals.size <= AnomalyStream.Window)
        prev = Optional.of(st.get)
      }
      out.toSeq
    }
    val whole = run(Seq(evs))
    val sliced = run(evs.grouped(7).toSeq)
    assert(whole == sliced && whole.nonEmpty)
  }
}
