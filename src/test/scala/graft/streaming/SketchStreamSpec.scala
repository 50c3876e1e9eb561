package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.HllSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL maintenance: the stream's final registers must equal the
  * batch computation over the union of all microbatches (the monoid
  * contract, end to end), replay must be a no-op, and compaction must be
  * read-equivalent while collapsing the partition history. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): Seq[(Long, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed registers equal the batch sketch over the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("sketchstream").toString
    val (store, chk) = (s"$root/regs", s"$root/chk")
    val docs = corpus()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = SketchStream.start(
      input.toDS().toDF("doc_id", "source", "text"), store, chk)
    try {
      docs.grouped((docs.size / 3).max(1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = regMap(SketchStream.registers(spark, store))
    val batch = regMap(HllSketch.registers(HllSketch.ranked(
      docs.toDF("doc_id", "source", "text"))))
    assert(streamed == batch, "stream fold must equal the one-pass batch build")
    // and the estimate read works off the store
    assert(HllSketch.estimate(SketchStream.registers(spark, store)).count() > 0)
  }

  test("replaying a microbatch is a no-op; compaction is read-equivalent") {
    val root = java.nio.file.Files.createTempDirectory("sketchstream2").toString
    val store = s"$root/regs"
    val docs = corpus().take(60)
    val (b0, b1) = docs.splitAt(30)
    SketchStream.runBatch(spark, b0.toDF("doc_id", "source", "text"), 0L, store)
    SketchStream.runBatch(spark, b1.toDF("doc_id", "source", "text"), 1L, store)
    val before = regMap(SketchStream.registers(spark, store))

    // at-least-once replay of batch 1: registers must not change
    SketchStream.runBatch(spark, b1.toDF("doc_id", "source", "text"), 1L, store)
    assert(regMap(SketchStream.registers(spark, store)) == before)

    // compaction: identical reads; history moves under the sentinel while
    // the max batch keeps its own (redeliverable) partition
    SketchStream.compact(spark, store)
    assert(regMap(SketchStream.registers(spark, store)) == before)
    val partsAfter = spark.read.parquet(store)
      .select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(partsAfter == Set(BatchStore.HistoryBatch, 1L),
      s"expected sentinel + max batch, got $partsAfter")
    // the crash window: batch 1 redelivered AFTER compaction must not
    // clobber the merged history
    SketchStream.runBatch(spark, b1.toDF("doc_id", "source", "text"), 1L, store)
    assert(regMap(SketchStream.registers(spark, store)) == before,
      "redelivery after compaction discarded pre-compaction history")
  }
}
