package graft.streaming

import graft.operators.{HllSketch, KeyedStore}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streaming face of the HLL sketch (the third consumer of
  * [[graft.operators.HllSketch]]'s one arithmetic, after batch q117 and
  * incremental q120): a stream of (doc_id, source, text) maintains
  * per-source distinct-shingle registers one microbatch at a time.
  *
  * The monoid does all the work. Each microbatch writes ONLY its own
  * delta register table (<= m rows per source touched — KBs, however
  * large the batch); reads max-merge across partitions. MAX is
  * idempotent, so a replayed batch is a no-op even WITHOUT the
  * partition-overwrite discipline — but the batch-stamped dynamic
  * overwrite is kept anyway (same contract as DedupStream) so the store
  * also never accumulates duplicate partitions under replay, and
  * compaction has clean units to collapse.
  *
  * Unlike DedupStream's signature store (per-doc rows, grows with the
  * corpus), the register store is bounded by sources * m rows LIVE — only
  * the partition COUNT grows with batches, and `compact` collapses the
  * history to one partition via the crash-recoverable `.rewrite` swap.
  */
object SketchStream {

  private val regSchema = new StructType()
    .add("source", StringType).add("idx", LongType).add("m", LongType)
    .add("ingest_batch", LongType)

  /** One microbatch: build the delta's register table and write it as this
    * batch's partition. Public so replay idempotence is testable without a
    * streaming harness. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               storeDir: String): Unit = {
    KeyedStore.recover(spark, storeDir)
    BatchStore.writePartition(
      HllSketch.registers(HllSketch.ranked(
        batch.select(col("doc_id"), col("source"), col("text")))),
      batchId, storeDir)
  }

  /** The live register table: max-merge across every batch partition. */
  def registers(spark: SparkSession, storeDir: String): DataFrame =
    HllSketch.registers(BatchStore.read(spark, storeDir, regSchema), valueCol = "m")

  /** Collapse the batch-partition history (all but the redeliverable max
    * batch) to one register row per (source, idx) in the sentinel
    * partition, via the crash-recoverable rewrite swap. Reads before and
    * after are identical (MAX of MAXes); what changes is the partition
    * count the per-read merge scans. */
  def compact(spark: SparkSession, storeDir: String): Unit =
    BatchStore.collapseHistory(spark, storeDir, regSchema)(
      live => HllSketch.registers(live, valueCol = "m"))

  /** Wire a (doc_id, source, text) stream into the maintenance loop. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
            compactEvery: Int = 0): StreamingQuery =
    BatchStore.loop(docs, checkpointDir, compactEvery)(
      (s, batch, batchId) => runBatch(s, batch, batchId, storeDir))(
      s => compact(s, storeDir))
}
