package graft.streaming

import graft.operators.{CmsSketch, KeyedStore}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Streaming count-min maintenance — the NON-idempotent sibling of
  * [[SketchStream]]: registers merge by SUM, so a naively re-appended
  * microbatch would double-count under Structured Streaming's
  * at-least-once foreachBatch contract. Correctness therefore rides
  * entirely on the batch-partition replace discipline: each microbatch
  * computes its own delta register table and dynamically OVERWRITES its
  * own `ingest_batch` partition — a replay replaces identical rows
  * instead of adding them, which is what turns at-least-once delivery
  * into exactly-once sums. (For HLL the same discipline is belt-and-
  * braces; here it is the whole proof.)
  *
  * Live state is bounded at Depth*Width rows per batch partition;
  * `compact` collapses the history to one summed partition via the
  * crash-recoverable rewrite swap.
  */
object CmsStream {

  private val regSchema = new StructType()
    .add("r", IntegerType).add("j", LongType).add("cnt", LongType)
    .add("ingest_batch", LongType)

  /** One microbatch: sum the delta's cells and replace this batch's
    * partition. Public so replay exactness is testable directly. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               storeDir: String): Unit = {
    KeyedStore.recover(spark, storeDir)
    BatchStore.writePartition(
      CmsSketch.registers(CmsSketch.tokenStream(batch)), batchId, storeDir)
  }

  /** The live register table: SUM across every batch partition. */
  def registers(spark: SparkSession, storeDir: String): DataFrame =
    BatchStore.read(spark, storeDir, regSchema).groupBy(col("r"), col("j"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Collapse the batch-partition history (all but the redeliverable max
    * batch) into the summed sentinel partition. */
  def compact(spark: SparkSession, storeDir: String): Unit =
    BatchStore.collapseHistory(spark, storeDir, regSchema)(
      live => live.groupBy(col("r"), col("j")).agg(sum(col("cnt")).as("cnt")))

  /** Wire a (doc_id, text) stream into the maintenance loop. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
            compactEvery: Int = 0): StreamingQuery =
    BatchStore.loop(docs, checkpointDir, compactEvery)(
      (s, batch, batchId) => runBatch(s, batch, batchId, storeDir))(
      s => compact(s, storeDir))
}
