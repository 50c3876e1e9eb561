package graft.streaming

import graft.operators.IncrementalDedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructType}

/** Streaming face of incremental dedup: a stream of (doc_id, text) docs is
  * near-dup-checked against everything that arrived before it, one
  * microbatch at a time — the continuous form of the daily-ingest
  * signature-store loop (see IncrementalDedup's scaladoc for the scale
  * shape: per batch O(delta + candidates), store x store impossible).
  *
  * Crash/replay discipline: every write — doc archive, verified pairs,
  * appended signatures — is partitioned by `ingest_batch` and dynamically
  * overwritten, and the store read excludes the current batch's partition.
  * A replayed microbatch therefore REPLACES its own prior output instead
  * of doubling it, and never sees its own half-written signatures as
  * "store": idempotent under Structured Streaming's at-least-once
  * foreachBatch contract.
  */
object DedupStream {

  private val sigSchema = new StructType()
    .add("doc_id", LongType).add("sig", ArrayType(LongType))
    .add("ingest_batch", LongType)
  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("ingest_batch", LongType)

  /** Read a batch-partitioned parquet dir that may not exist yet (first
    * microbatch): missing dir = empty table. */
  private def readOr(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def writeBatchPartition(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(dir)

  /** One microbatch: archive the docs, dedup the delta against all prior
    * batches plus itself, persist pairs, append signatures. Public so the
    * replay-idempotence contract is testable without a streaming harness. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               storeDir: String, archiveDir: String, pairsDir: String,
               threshold: Double = 0.5): Unit = {
    val delta = batch.select(col("doc_id"), col("text")).localCheckpoint(true)
    writeBatchPartition(delta.withColumn("ingest_batch", lit(batchId)), archiveDir)
    // Store = signatures of strictly-earlier batches; a replayed batch's
    // own partition (from the crashed attempt) is excluded, then
    // overwritten below.
    val storeSigs = readOr(spark, storeDir, sigSchema)
      .filter(col("ingest_batch") < batchId).select(col("doc_id"), col("sig"))
    val deltaSigs = IncrementalDedup.signatures(delta).cache()
    val corpus = readOr(spark, archiveDir, docSchema)
      .filter(col("ingest_batch") <= batchId).select(col("doc_id"), col("text"))
    val pairs = IncrementalDedup.verifyPairs(
      IncrementalDedup.candidatePairs(storeSigs, deltaSigs), corpus, threshold)
      .localCheckpoint(true)
    writeBatchPartition(pairs.withColumn("ingest_batch", lit(batchId)), pairsDir)
    writeBatchPartition(deltaSigs.withColumn("ingest_batch", lit(batchId)), storeDir)
    deltaSigs.unpersist()
    ()
  }

  /** Attach the dedup loop to a streaming Dataset of (doc_id, text). */
  def start(docs: DataFrame, storeDir: String, archiveDir: String,
            pairsDir: String, checkpointDir: String,
            threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        runBatch(batch.sparkSession, batch, batchId,
          storeDir, archiveDir, pairsDir, threshold)
      }
      .start()
}
