package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream-maintained band index must answer the online admission
  * probe across microbatches, never double under replay (the (batch,
  * bucket) dynamic overwrite), and shed superseded docs' stale bands on
  * compaction. */
class BandIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val words = "the quick brown fox jumps over a lazy dog near the river bank today"
  private def dup(group: Long, tail: Long): String =
    words.split(' ').map(w => s"${w}g$group").mkString(" ") + s" tail$tail"
  private def uniq(i: Long): String =
    words.split(' ').zipWithIndex.map { case (w, j) => s"$w u${i}x$j" }.mkString(" ")

  private def dirs(): (String, String, String, String, String) = {
    val root = java.nio.file.Files.createTempDirectory("bandidxstream").toString
    (s"$root/sigs", s"$root/archive", s"$root/pairs", s"$root/chk", s"$root/bandidx")
  }

  private def probeHits(idx: String, probe: Seq[(Long, String)]): Set[Long] =
    BandIndexStream.probe(spark, idx,
      IncrementalDedup.signatures(probe.toDF("doc_id", "text")))
      .collect().map(_.getLong(1)).toSet

  test("stream-maintained index answers the probe across microbatches") {
    val (sigs, archive, pairs, chk, idx) = dirs()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupStream.start(
      input.toDS().toDF("doc_id", "text"), sigs, archive, pairs, chk,
      bandIndexDir = Some(idx))
    try {
      input.addData((10L, dup(1, 0)), (30L, uniq(30)))
      q.processAllAvailable()
      input.addData((11L, dup(1, 1)), (40L, uniq(40)))
      q.processAllAvailable()
    } finally q.stop()
    // an UNSEEN group-1 near-dup probes the live index: it must surface
    // the batch-0 member AND the batch-1 member; distinct docs never
    assert(probeHits(idx, Seq((900000L, dup(1, 7)))) === Set(10L, 11L))
    assert(probeHits(idx, Seq((900001L, uniq(77)))) === Set.empty[Long])
  }

  test("a replayed microbatch replaces its index partition, never doubles it") {
    val (sigs, archive, pairs, _, idx) = dirs()
    DedupStream.runBatch(spark,
      Seq((10L, dup(1, 0)), (30L, uniq(30))).toDF("doc_id", "text"),
      0L, sigs, archive, pairs, bandIndexDir = Some(idx))
    val rows = spark.read.parquet(idx).count()
    // crashed-attempt replay of batch 0: identical content, same batch id
    DedupStream.runBatch(spark,
      Seq((10L, dup(1, 0)), (30L, uniq(30))).toDF("doc_id", "text"),
      0L, sigs, archive, pairs, bandIndexDir = Some(idx))
    assert(spark.read.parquet(idx).count() === rows,
      "replay must dynamic-overwrite the (batch, bucket) leaves, not append")
    assert(probeHits(idx, Seq((900000L, dup(1, 7)))) === Set(10L))
  }

  test("stale bands are candidates only; standalone compact drops them") {
    val (sigs, _, _, _, idx) = dirs()
    // appendBatch directly (no in-loop trigger): doc 10's group-1 bands
    // go stale when batch 1 re-signs it with group-3 content
    def sigsOf(rows: Seq[(Long, String)]) =
      IncrementalDedup.signatures(rows.toDF("doc_id", "text"))
    val b0 = Seq((10L, dup(1, 0)), (11L, dup(1, 1)))
    BandIndexStream.appendBatch(spark, sigsOf(b0), 0L, idx)
    BatchStore.writePartition(sigsOf(b0), 0L, sigs)
    val b1 = Seq((10L, dup(3, 0)))
    BandIndexStream.appendBatch(spark, sigsOf(b1), 1L, idx)
    BatchStore.writePartition(sigsOf(b1), 1L, sigs)
    // pre-compaction: stale bands are extra CANDIDATES only — a group-1
    // probe still surfaces 10 (the caller's exact verification against
    // CURRENT text is what rejects it)
    assert(probeHits(idx, Seq((900000L, dup(1, 7)))) === Set(10L, 11L))
    BandIndexStream.compact(spark, idx, sigs)
    // post-compaction: only live content's bands remain
    assert(probeHits(idx, Seq((900000L, dup(1, 7)))) === Set(11L))
    assert(probeHits(idx, Seq((900001L, dup(3, 7)))) === Set(10L))
    // exactly live-docs x LshBands rows survive
    assert(spark.read.parquet(idx).count() ===
      2L * graft.functions.Hashing.LshBands)
  }

  test("the in-loop measured trigger fires on a content-changing redelivery") {
    val (sigs, archive, pairs, _, idx) = dirs()
    DedupStream.runBatch(spark,
      Seq((10L, dup(1, 0)), (11L, dup(1, 1))).toDF("doc_id", "text"),
      0L, sigs, archive, pairs, bandIndexDir = Some(idx))
    // doc 10 redelivered with group-3 content: 3 delivered versions vs 2
    // live docs = 50% bloat > the 25% slack — maybeCompact fires INSIDE
    // runBatch, so the index is already clean when the batch returns
    DedupStream.runBatch(spark,
      Seq((10L, dup(3, 0))).toDF("doc_id", "text"),
      1L, sigs, archive, pairs, bandIndexDir = Some(idx))
    assert(spark.read.parquet(idx).count() ===
      2L * graft.functions.Hashing.LshBands,
      "the measured trigger must have compacted in-loop")
    assert(probeHits(idx, Seq((900000L, dup(1, 7)))) === Set(11L))
    assert(probeHits(idx, Seq((900001L, dup(3, 7)))) === Set(10L))
  }

  test("random redelivery schedule converges to fresh-build rows (seed 7)") {
    val bands = graft.functions.Hashing.LshBands
    val r = new java.util.Random(7)
    val (sigs, archive, pairs, _, idx) = dirs()
    val live = scala.collection.mutable.Map.empty[Long, Int] // id -> version
    var batchId = 0L
    (0 until 8).foreach { step =>
      val chosen = (0 until r.nextInt(3) + 1)
        .map(_ => r.nextInt(8) + 1L).distinct
      val rows = chosen.map { id =>
        val v = live.getOrElse(id, -1) + 1 // redelivery = NEW content version
        live(id) = v
        (id, uniq(id * 1000 + v))
      }
      DedupStream.runBatch(spark, rows.toDF("doc_id", "text"),
        batchId, sigs, archive, pairs, bandIndexDir = Some(idx))
      batchId += 1
      // the trigger's own invariant, checked at EVERY step: the index
      // never holds more than live x bands x (1 + slack) rows for long —
      // immediately after a batch it is either under the bound or was
      // just compacted to exactly live x bands
      val rowsNow = spark.read.parquet(idx).count()
      assert(rowsNow <= (live.size * bands * 1.25).toLong + bands,
        s"step $step: $rowsNow rows vs ${live.size} live docs — trigger lost")
    }
    // final state converges to exactly the fresh-build size
    BandIndexStream.compact(spark, idx, sigs)
    assert(spark.read.parquet(idx).count() === live.size.toLong * bands)
  }
}
