package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental dedup: each microbatch near-dup-checks against
  * all prior batches plus itself, and replayed batches replace rather than
  * double their output. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val words = "the quick brown fox jumps over a lazy dog near the river bank today"
  private def dup(group: Long, tail: Long): String =
    words.split(' ').map(w => s"${w}g$group").mkString(" ") + s" tail$tail"
  private def uniq(i: Long): String =
    words.split(' ').zipWithIndex.map { case (w, j) => s"$w u${i}x$j" }.mkString(" ")

  private def dirs(): (String, String, String, String) = {
    val root = java.nio.file.Files.createTempDirectory("dedupstream").toString
    (s"$root/sigs", s"$root/archive", s"$root/pairs", s"$root/chk")
  }

  private def pairSet(pairsDir: String): Set[(Long, Long, Long)] =
    spark.read.parquet(pairsDir)
      .select(col("doc_a"), col("doc_b"), col("ingest_batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("microbatches dedup against all earlier batches and themselves") {
    val (sigs, archive, pairs, chk) = dirs()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupStream.start(
      input.toDS().toDF("doc_id", "text"), sigs, archive, pairs, chk)
    try {
      // batch 0: one dup pair inside the batch, one singleton
      input.addData((10L, dup(1, 0)), (11L, dup(1, 1)), (30L, uniq(30)))
      q.processAllAvailable()
      // batch 1: dup vs batch 0, intra-batch dup pair, singleton
      input.addData((12L, dup(1, 2)), (20L, dup(2, 0)), (21L, dup(2, 1)), (40L, uniq(40)))
      q.processAllAvailable()
    } finally q.stop()

    val got = pairSet(pairs)
    assert(got === Set(
      (10L, 11L, 0L),               // batch-0 internal
      (10L, 12L, 1L), (11L, 12L, 1L), // batch 1 vs batch 0
      (20L, 21L, 1L)))              // batch-1 internal
  }

  test("a doc redelivered in a later batch supersedes its old content") {
    val (sigs, archive, pairs, _) = dirs()
    // batch 0: docs 10/11 are group-1 near-dups
    DedupStream.runBatch(spark,
      Seq((10L, dup(1, 0)), (11L, dup(1, 1))).toDF("doc_id", "text"),
      0L, sigs, archive, pairs)
    // batch 1: doc 10 comes BACK with entirely different content (group 3).
    // Its stale group-1 signature must not emit pairs, and (10,10) never.
    DedupStream.runBatch(spark,
      Seq((10L, dup(3, 0)), (60L, uniq(60))).toDF("doc_id", "text"),
      1L, sigs, archive, pairs)
    // batch 2: doc 12 near-dups the NEW content of 10; doc 13 near-dups
    // group 1, which only doc 11 still carries.
    DedupStream.runBatch(spark,
      Seq((12L, dup(3, 1)), (13L, dup(1, 2))).toDF("doc_id", "text"),
      2L, sigs, archive, pairs)

    val got = pairSet(pairs)
    assert(got === Set(
      (10L, 11L, 0L),   // settled before the redelivery
      (10L, 12L, 2L),   // banded + verified against 10's CURRENT content
      (11L, 13L, 2L)),  // 10 no longer matches group 1 — only 11 does
      s"got $got")
    // one jaccard row per verified pair — no contradictory duplicates from
    // the doubled archive rows
    val dupPairRows = spark.read.parquet(pairs)
      .groupBy("doc_a", "doc_b", "ingest_batch").count()
      .filter(col("count") > 1).count()
    assert(dupPairRows === 0L)
  }

  test("within-batch duplicates resolve content-deterministically") {
    // A microbatch is an unordered set: the same logical batch may arrive
    // with rows in any order. The winner for a doc_id delivered twice in
    // one batch must not depend on that order.
    val rowsA = Seq((10L, dup(1, 0)), (10L, dup(2, 0)), (11L, dup(1, 1)))
    val rowsB = rowsA.reverse
    val (s1, a1, p1, _) = dirs()
    val (s2, a2, p2, _) = dirs()
    DedupStream.runBatch(spark, rowsA.toDF("doc_id", "text"), 0L, s1, a1, p1)
    DedupStream.runBatch(spark, rowsB.toDF("doc_id", "text"), 0L, s2, a2, p2)
    def archived(dir: String): Map[Long, String] =
      spark.read.parquet(dir).select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m1 = archived(a1)
    assert(m1 === archived(a2), "winner must not depend on row order")
    assert(m1.keySet === Set(10L, 11L), "exactly one archived row per doc")
    // one signature per doc in the store, and the pair output is a set
    // decided by the winning content (no contradictory rows)
    assert(spark.read.parquet(s1).groupBy("doc_id").count()
      .filter(col("count") > 1).count() === 0L)
    assert(pairSet(p1) === pairSet(p2))
  }

  test("a replayed batch replaces its output instead of doubling it") {
    val (sigs, archive, pairs, _) = dirs()
    val b0 = Seq((10L, dup(1, 0)), (11L, dup(1, 1))).toDF("doc_id", "text")
    val b1 = Seq((12L, dup(1, 2)), (50L, uniq(50))).toDF("doc_id", "text")
    DedupStream.runBatch(spark, b0, 0L, sigs, archive, pairs)
    DedupStream.runBatch(spark, b1, 1L, sigs, archive, pairs)
    val first = pairSet(pairs)
    // crash-replay of batch 1: same data, same batch id
    DedupStream.runBatch(spark, b1, 1L, sigs, archive, pairs)
    assert(pairSet(pairs) === first, "replay must be idempotent")
    assert(first === Set((10L, 11L, 0L), (10L, 12L, 1L), (11L, 12L, 1L)))
    // and the store holds exactly one signature row per doc
    val sigRows = spark.read.parquet(sigs).groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(sigRows === 0L, "replayed signatures must overwrite, not append")
  }
}
