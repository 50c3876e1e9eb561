package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streaming vocabulary maintenance — the fourth streaming store, and the
  * proof of the BatchStore extraction: per-token corpus counts maintained
  * one microbatch at a time, in ~40 lines that contain ZERO replay or
  * crash-recovery logic. Counts merge by SUM (non-idempotent, like CMS),
  * so correctness rides entirely on BatchStore's own-partition replace
  * discipline; compaction collapses the batch history to one summed
  * partition through the crash-safe swap.
  *
  * This is the store a streaming corpus-refresh pipeline feeds: the live
  * `counts` read is exactly the token table q142's vocabulary freeze and
  * q104's surprisal model are built from, kept current without a batch
  * recount. Live state is vocabulary-sized per partition; only the
  * partition count grows between compactions.
  */
object VocabStream {

  private val schema = new StructType()
    .add("tok", StringType).add("cnt", LongType)
    .add("ingest_batch", LongType)

  /** One microbatch: count the delta's tokens, replace this batch's
    * partition. Public so replay exactness is testable directly. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               storeDir: String): Unit =
    BatchStore.writePartition(
      batch.select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt")),
      batchId, storeDir)

  /** The live token-count table: SUM across every batch partition. */
  def counts(spark: SparkSession, storeDir: String): DataFrame =
    BatchStore.read(spark, storeDir, schema)
      .groupBy(col("tok")).agg(sum(col("cnt")).as("cnt"))

  /** Collapse the batch history (all but the redeliverable max batch)
    * into the summed sentinel partition. */
  def compact(spark: SparkSession, storeDir: String): Unit =
    BatchStore.collapseHistory(spark, storeDir, schema)(
      live => live.groupBy(col("tok")).agg(sum(col("cnt")).as("cnt")))

  /** Wire a (doc_id, text) stream into the maintenance loop. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
            compactEvery: Int = 0): StreamingQuery =
    BatchStore.loop(docs, checkpointDir, compactEvery)(
      (s, batch, batchId) => runBatch(s, batch, batchId, storeDir))(
      s => compact(s, storeDir))
}
