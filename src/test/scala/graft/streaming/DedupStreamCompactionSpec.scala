package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Store/archive compaction for the streaming dedup loop: collapsing the
  * batch-partitioned tables to one latest row per doc_id must be invisible
  * to every reader (same pairs, same resolved content), bound the store at
  * O(live docs), and survive a crash inside its delete/rename swap. */
class DedupStreamCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val words = "the quick brown fox jumps over a lazy dog near the river bank today"
  private def dup(group: Long, tail: Long): String =
    words.split(' ').map(w => s"${w}g$group").mkString(" ") + s" tail$tail"
  private def uniq(i: Long): String =
    words.split(' ').zipWithIndex.map { case (w, j) => s"$w u${i}x$j" }.mkString(" ")

  private def dirs(): (String, String, String, String) = {
    val root = java.nio.file.Files.createTempDirectory("dedupcompact").toString
    (s"$root/sigs", s"$root/archive", s"$root/pairs", s"$root/chk")
  }

  private def pairSet(pairsDir: String): Set[(Long, Long, Long)] =
    spark.read.parquet(pairsDir)
      .select(col("doc_a"), col("doc_b"), col("ingest_batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Batches with redeliveries, so superseded rows accumulate: doc 10 is
    * re-ingested with new content in batch 1. */
  private def seed(sigs: String, archive: String, pairs: String): Unit = {
    DedupStream.runBatch(spark,
      Seq((10L, dup(1, 0)), (11L, dup(1, 1)), (30L, uniq(30))).toDF("doc_id", "text"),
      0L, sigs, archive, pairs)
    DedupStream.runBatch(spark,
      Seq((10L, dup(3, 0)), (60L, uniq(60))).toDF("doc_id", "text"),
      1L, sigs, archive, pairs)
  }

  private def followUp(sigs: String, archive: String, pairs: String): Unit =
    DedupStream.runBatch(spark,
      Seq((12L, dup(3, 1)), (13L, dup(1, 2))).toDF("doc_id", "text"),
      2L, sigs, archive, pairs)

  test("compaction preserves reads and bounds the store at one row per doc") {
    val (s1, a1, p1, _) = dirs()
    val (s2, a2, p2, _) = dirs()
    seed(s1, a1, p1); seed(s2, a2, p2)

    val storeRowsBefore = spark.read.parquet(s1).count()
    val archiveRowsBefore = spark.read.parquet(a1).count()
    DedupStream.compact(spark, s1)
    DedupStream.compact(spark, a1)

    // one latest row per doc_id, superseded versions gone
    val store = spark.read.parquet(s1)
    assert(store.count() === store.select("doc_id").distinct().count())
    assert(store.count() < storeRowsBefore, "redelivered doc 10 had 2 sig rows")
    val archive = spark.read.parquet(a1)
    assert(archive.count() === archive.select("doc_id").distinct().count())
    assert(archive.count() < archiveRowsBefore)
    // the surviving row is the LATEST version, original batch stamp kept
    val d10 = archive.filter(col("doc_id") === 10L)
      .select(col("text"), col("ingest_batch").cast("long")).collect()
    assert(d10.length === 1)
    assert(d10.head.getString(0) === dup(3, 0))
    assert(d10.head.getLong(1) === 1L)

    // a later batch reads identically off the compacted and uncompacted dirs
    followUp(s1, a1, p1); followUp(s2, a2, p2)
    assert(pairSet(p1) === pairSet(p2))
    assert(pairSet(p1) === Set(
      (10L, 11L, 0L), (10L, 12L, 2L), (11L, 13L, 2L)))
  }

  test("compacted tables hold fewer data files (scan bytes shrink)") {
    val (s1, a1, p1, _) = dirs()
    // doc 10 re-ingested every batch: partitions 1..2 end up holding ONLY
    // superseded rows and must disappear entirely
    DedupStream.runBatch(spark,
      Seq((10L, dup(1, 0)), (11L, dup(1, 1)), (30L, uniq(30))).toDF("doc_id", "text"),
      0L, s1, a1, p1)
    (1L to 3L).foreach { b =>
      DedupStream.runBatch(spark,
        Seq((10L, dup(b + 2, 0))).toDF("doc_id", "text"), b, s1, a1, p1)
    }
    def dataFiles(dir: String): Int = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try it.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally it.close()
    }
    def partitions(dir: String): Set[String] =
      new java.io.File(dir).list().filter(_.startsWith("ingest_batch=")).toSet
    val filesBefore = dataFiles(s1)
    assert(partitions(s1).size === 4)
    DedupStream.compact(spark, s1)
    assert(dataFiles(s1) < filesBefore,
      "per-microbatch file accumulation must collapse")
    // only partitions with surviving rows remain; batch-partition layout is
    // preserved (dynamic partition overwrite on a replayed batch must still
    // target its own directory)
    assert(partitions(s1) === Set("ingest_batch=0", "ingest_batch=3"))
    val store = spark.read.parquet(s1)
    assert(store.count() === 3L) // 11, 30, and the latest 10
  }

  test("a crash between compaction's delete and rename heals on the next batch") {
    val (s1, a1, p1, _) = dirs()
    val (s2, a2, p2, _) = dirs()
    seed(s1, a1, p1); seed(s2, a2, p2)
    DedupStream.compact(spark, s1)
    // simulate the crash window: the live store vanished after the rewrite
    // sibling was completed (rename never ran)
    val fs = new org.apache.hadoop.fs.Path(s1)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s1),
      new org.apache.hadoop.fs.Path(s1 + ".rewrite")))
    // the next microbatch recovers the store before reading it — no empty-
    // store restart, no discarded rewrite
    followUp(s1, a1, p1); followUp(s2, a2, p2)
    assert(pairSet(p1) === pairSet(p2))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s1 + ".rewrite")))
  }

  test("start(compactEvery = 1) keeps the loop green while compacting inline") {
    val (sigs, archive, pairs, chk) = dirs()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupStream.start(
      input.toDS().toDF("doc_id", "text"), sigs, archive, pairs, chk,
      compactEvery = 1)
    try {
      input.addData((10L, dup(1, 0)), (11L, dup(1, 1)), (30L, uniq(30)))
      q.processAllAvailable()
      input.addData((10L, dup(3, 0)), (60L, uniq(60)))
      q.processAllAvailable()
      input.addData((12L, dup(3, 1)), (13L, dup(1, 2)))
      q.processAllAvailable()
    } finally q.stop()
    assert(pairSet(pairs) === Set(
      (10L, 11L, 0L), (10L, 12L, 2L), (11L, 13L, 2L)))
    val store = spark.read.parquet(sigs)
    assert(store.count() === store.select("doc_id").distinct().count())
  }
}
