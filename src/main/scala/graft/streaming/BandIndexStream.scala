package graft.streaming

import graft.operators.{BandIndex, KeyedStore}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming maintenance of the band-partitioned LSH index
  * ([[graft.operators.BandIndex]]) — the piece that keeps the ONLINE
  * admission probe live while documents arrive as a stream instead of
  * batch ingests. Round-12 completes the chain: batch ingest maintains
  * the index ([[graft.operators.IncrementalSplit]]), the online probe
  * reads it bucket-pruned, and this module feeds it from
  * [[DedupStream]]'s microbatch loop.
  *
  * Replay discipline is [[BatchStore]]'s, specialized: rows are
  * partitioned by (ingest_batch, bucket) and each microbatch
  * dynamic-overwrites ONLY its own (batch, bucket) leaves — banding is a
  * pure function of the batch's deduped content, so a replayed batch
  * recomputes byte-identical bands into the same leaves and the index
  * never doubles (unlike the batch-path [[BandIndex.append]], whose
  * replays bloat until `maybeCompact` fires). The bucket partition level
  * is what [[BandIndex.probe]] prunes on — pruning works identically
  * across the batch subdirectories, so probe is REUSED verbatim on this
  * layout (the extra ingest_batch column rides along unreferenced).
  *
  * A doc_id redelivered with new content in a later batch leaves its old
  * bands in the old batch's partition: superseded bands are extra
  * CANDIDATES only (the admission caller verifies against CURRENT text —
  * exactness is never at stake), and [[compact]] rebuilds the index from
  * the signature store's latest-per-doc rows, dropping them.
  */
object BandIndexStream {

  /** Append one microbatch's bands: stamp, then dynamic-overwrite the
    * batch's own (ingest_batch, bucket) leaves. Recover-first, like every
    * BatchStore write (a write into a crashed compaction's swap window
    * would orphan the completed rewrite). */
  def appendBatch(spark: SparkSession, deltaSigs: DataFrame, batchId: Long,
                  dir: String): Unit = {
    KeyedStore.recover(spark, dir)
    // width: the dir's persisted geometry (the legacy default for a
    // fresh streaming dir — appendBatch writes no meta, so probe's
    // reader resolves the same default; one width for the dir's life)
    val nb = BandIndex.bucketWidth(spark, dir)
    BandIndex.banded(deltaSigs)
      .withColumn("bucket", BandIndex.bucketOf(col("band"), nb))
      .withColumn("ingest_batch", lit(batchId))
      .repartition(col("bucket")) // one file per owning task, not tasks x buckets
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "bucket")
      .parquet(dir)
  }

  /** Online admission probe — [[BandIndex.probe]] verbatim: the bucket
    * partition filter prunes leaf directories across every batch
    * partition, so a small probe reads <= LshBands/Buckets of the index
    * regardless of how many microbatches built it. */
  def probe(spark: SparkSession, dir: String, probeSigs: DataFrame): DataFrame =
    BandIndex.probe(spark, dir, probeSigs)

  /** Measured compaction trigger for the STREAMING layout (the batch
    * path's `BandIndex.maybeCompact` shape, specialized): the streaming
    * index never double-writes a batch, so its only bloat source is
    * content-CHANGING redeliveries — a doc_id re-signed in a later batch
    * leaves its old bands in the old batch partition. The index holds
    * exactly LshBands rows per DELIVERED version, the live set is one
    * version per doc, so rows beyond liveDocs * LshBands * (1 + slack)
    * are provably stale and [[compact]] drops them. Cost of the
    * estimate: index row count from parquet footers (no data read) plus
    * ONE narrow doc_id-column distinct count over the signature store —
    * strictly cheaper than the store-wide candidate leg the microbatch
    * loop already pays every batch. Single-writer like compact. Returns
    * whether it fired. */
  def maybeCompact(spark: SparkSession, dir: String, sigStoreDir: String,
                   slack: Double = 0.25): Boolean = {
    val idxRows = BandIndex.footerRowCount(spark, dir)
    if (idxRows == 0L) return false
    val p = new org.apache.hadoop.fs.Path(sigStoreDir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      return false
    KeyedStore.recover(spark, sigStoreDir)
    val live = spark.read.parquet(sigStoreDir).select("doc_id").distinct().count()
    val bloated =
      idxRows > (live * graft.functions.Hashing.LshBands * (1.0 + slack)).toLong
    if (bloated) compact(spark, dir, sigStoreDir)
    bloated
  }

  /** Rebuild the index from the signature store's LATEST row per doc —
    * drops superseded docs' stale bands and collapses the per-batch file
    * accumulation. Surviving rows keep their signature's ingest_batch
    * stamp (the layout invariant replayed batches rely on). Single-writer:
    * run from the stream's own foreachBatch or under the dir's TableLock. */
  def compact(spark: SparkSession, dir: String, sigStoreDir: String): Unit = {
    val spark2 = spark
    KeyedStore.recover(spark2, sigStoreDir)
    val p = new org.apache.hadoop.fs.Path(sigStoreDir)
    if (!p.getFileSystem(spark2.sparkContext.hadoopConfiguration).exists(p)) return
    val w = Window.partitionBy(col("doc_id")).orderBy(col("ingest_batch").desc)
    val latest = spark2.read.parquet(sigStoreDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val rebuilt = BandIndex.banded(latest.select(col("doc_id"), col("sig")))
      .join(latest.select(col("doc_id"), col("ingest_batch")), Seq("doc_id"))
      .withColumn("bucket", BandIndex.bucketOf(col("band"),
        BandIndex.bucketWidth(spark2, dir)))
      .repartition(col("bucket"))
    val idxPath = new org.apache.hadoop.fs.Path(dir)
    val fs = idxPath.getFileSystem(spark2.sparkContext.hadoopConfiguration)
    KeyedStore.recover(spark2, dir)
    if (!fs.exists(idxPath)) return
    KeyedStore.rewriteSwap(spark2, dir) { tmp =>
      rebuilt.write.mode(SaveMode.Overwrite)
        .partitionBy("ingest_batch", "bucket").parquet(tmp)
    }
  }
}
