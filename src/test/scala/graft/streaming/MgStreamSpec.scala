package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Fifth streaming store (bounded-state Misra-Gries summaries): the fold of
  * per-batch summaries must keep the WHOLE-stream retention guarantee, stay
  * replay-exact, and compact read-equivalently — all without its own
  * recovery logic (the BatchStore extraction's contract). */
class MgStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 12

  private def corpus(): Seq[(Long, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def exactCounts(docs: Seq[(Long, String)]): Map[String, Long] =
    docs.toDF("doc_id", "text")
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def assertGuarantee(cand: Seq[(String, Long)], exact: Map[String, Long]): Unit = {
    val n = exact.values.sum
    assert(cand.size <= K - 1, s"fold kept ${cand.size} > ${K - 1} counters")
    exact.foreach { case (t, c) =>
      if (c * K > n)
        assert(cand.exists(_._1 == t), s"heavy hitter $t (count $c, n=$n) dropped")
    }
    cand.foreach { case (t, reported) =>
      val true_ = exact.getOrElse(t, 0L)
      assert(reported <= true_ && true_ - reported <= n / K,
        s"$t bound violated: reported=$reported true=${true_} n/K=${n / K}")
    }
  }

  test("streamed fold keeps the whole-corpus retention guarantee") {
    val root = java.nio.file.Files.createTempDirectory("mgstream").toString
    val (store, chk) = (s"$root/mg", s"$root/chk")
    val docs = corpus()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = MgStream.start(input.toDS().toDF("doc_id", "text"), store, chk, K)
    try {
      docs.grouped((docs.size / 4).max(1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    assertGuarantee(MgStream.candidates(spark, store, K), exactCounts(docs))
  }

  test("replayed microbatch replaces its summary; compaction is read-equivalent") {
    val root = java.nio.file.Files.createTempDirectory("mgstream2").toString
    val store = s"$root/mg"
    val docs = corpus().take(60)
    val (b0, b1) = docs.splitAt(30)
    MgStream.runBatch(spark, b0.toDF("doc_id", "text"), 0L, store, K)
    MgStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store, K)
    val before = MgStream.candidates(spark, store, K)
    assertGuarantee(before, exactCounts(docs))
    // at-least-once: batch 1 delivered again must REPLACE its partition
    MgStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store, K)
    assert(MgStream.candidates(spark, store, K) == before,
      "replay must not change the folded summary")
    MgStream.compact(spark, store, K)
    assert(MgStream.candidates(spark, store, K) == before,
      "compaction must be read-equivalent")
    // sentinel + the max batch's own partition: a redelivery of the max
    // batch replaces only its own delta, never the merged history
    val parts = spark.read.parquet(store).select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(parts == Set(BatchStore.HistoryBatch, 1L),
      s"expected sentinel + max batch after compaction, got $parts")
    // the crash window: batch 1 redelivered AFTER compaction must fold to
    // the same summary (pre-compaction history intact)
    MgStream.runBatch(spark, b1.toDF("doc_id", "text"), 1L, store, K)
    assert(MgStream.candidates(spark, store, K) == before,
      "redelivery after compaction discarded pre-compaction history")
    // post-compaction ingest keeps folding correctly
    MgStream.runBatch(spark, b1.toDF("doc_id", "text"), 2L, store, K)
    assertGuarantee(MgStream.candidates(spark, store, K), exactCounts(docs ++ b1))
  }
}
