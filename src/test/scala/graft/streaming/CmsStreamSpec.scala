package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.CmsSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CMS maintenance: SUM registers are NOT idempotent, so these
  * tests pin the property the partition-replace discipline exists for —
  * a replayed microbatch must not double-count — alongside the monoid
  * equality (stream == one-pass batch) and compaction equivalence. */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): Seq[(Long, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed registers equal the batch sketch over the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("cmsstream").toString
    val (store, chk) = (s"$root/regs", s"$root/chk")
    val docs = corpus()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = CmsStream.start(input.toDS().toDF("doc_id", "text"), store, chk)
    try {
      docs.grouped((docs.size / 3).max(1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = regMap(CmsStream.registers(spark, store))
    val batch = regMap(CmsSketch.registers(CmsSketch.tokenStream(
      docs.toDF("doc_id", "text"))))
    assert(streamed == batch, "summed stream fold must equal the one-pass build")
  }

  test("a replayed microbatch must NOT double-count; compaction is read-equivalent") {
    val root = java.nio.file.Files.createTempDirectory("cmsstream2").toString
    val store = s"$root/regs"
    val docs = corpus().take(40)
    val (b0, b1) = docs.splitAt(20)
    CmsStream.runBatch(spark, b0.toDF("doc_id", "text"), 0L, store)
    CmsStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store)
    val before = regMap(CmsStream.registers(spark, store))
    assert(before.values.sum > 0)

    // at-least-once replay of batch 1: without the partition replace this
    // would double batch 1's contribution to every touched cell
    CmsStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store)
    assert(regMap(CmsStream.registers(spark, store)) == before,
      "replayed batch double-counted — partition replace is broken")

    CmsStream.compact(spark, store)
    assert(regMap(CmsStream.registers(spark, store)) == before)
    assert(spark.read.parquet(store)
      .select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(BatchStore.HistoryBatch, 1L))
    // the crash window the sentinel exists for: the max batch redelivered
    // AFTER compaction (crash before checkpoint commit) replaces only its
    // own delta — under collapse-to-max-batch it would have replaced the
    // whole merged history with one batch's cells
    CmsStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store)
    assert(regMap(CmsStream.registers(spark, store)) == before,
      "redelivery after compaction discarded pre-compaction history")
  }
}
