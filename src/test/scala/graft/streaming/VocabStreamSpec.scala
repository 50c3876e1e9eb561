package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The fourth streaming store, written entirely against BatchStore: these
  * tests prove the extraction's contract — a new stream gets replay
  * exactness (SUM counts, non-idempotent) and read-equivalent compaction
  * without containing any recovery logic of its own. */
class VocabStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): Seq[(Long, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def cmap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def batchCounts(docs: Seq[(Long, String)]): Map[String, Long] =
    cmap(docs.toDF("doc_id", "text")
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt")))

  test("streamed counts equal the batch count over the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("vocabstream").toString
    val (store, chk) = (s"$root/vocab", s"$root/chk")
    val docs = corpus()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = VocabStream.start(input.toDS().toDF("doc_id", "text"), store, chk)
    try {
      docs.grouped((docs.size / 3).max(1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    assert(cmap(VocabStream.counts(spark, store)) == batchCounts(docs))
  }

  test("replayed microbatch does not double-count; compaction is read-equivalent") {
    val root = java.nio.file.Files.createTempDirectory("vocabstream2").toString
    val store = s"$root/vocab"
    val docs = corpus().take(40)
    val (b0, b1) = docs.splitAt(20)
    VocabStream.runBatch(spark, b0.toDF("doc_id", "text"), 0L, store)
    VocabStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store)
    val before = cmap(VocabStream.counts(spark, store))
    assert(before == batchCounts(docs))
    // at-least-once: batch 1 delivered again must REPLACE, not add
    VocabStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store)
    assert(cmap(VocabStream.counts(spark, store)) == before,
      "replay must not double-count a SUM store")
    VocabStream.compact(spark, store)
    assert(cmap(VocabStream.counts(spark, store)) == before,
      "compaction must be read-equivalent")
    // history collapses into the sentinel partition; the max batch keeps
    // its OWN partition, so an at-least-once redelivery replaces only its
    // own delta instead of clobbering the merged history
    val parts = spark.read.parquet(store).select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(parts == Set(BatchStore.HistoryBatch, 1L),
      s"expected sentinel + max batch after compaction, got $parts")
    // the crash window: batch 1 redelivered AFTER compaction (crash between
    // foreachBatch and checkpoint commit) must not discard history
    VocabStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store)
    assert(cmap(VocabStream.counts(spark, store)) == before,
      "redelivery after compaction discarded pre-compaction history")
  }
}
