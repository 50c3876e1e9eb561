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

  private def readOr(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(regSchema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], regSchema)
  }

  /** One microbatch: build the delta's register table and write it as this
    * batch's partition. Public so replay idempotence is testable without a
    * streaming harness. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               storeDir: String): Unit = {
    KeyedStore.recover(spark, storeDir)
    val delta = HllSketch.registers(HllSketch.ranked(
        batch.select(col("doc_id"), col("source"), col("text"))))
      .withColumn("ingest_batch", lit(batchId))
    delta.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(storeDir)
  }

  /** The live register table: max-merge across every batch partition. */
  def registers(spark: SparkSession, storeDir: String): DataFrame = {
    KeyedStore.recover(spark, storeDir)
    HllSketch.registers(readOr(spark, storeDir), valueCol = "m")
  }

  /** Collapse the batch-partition history to one register row per
    * (source, idx) in a single partition, via the crash-recoverable
    * rewrite swap. Reads before and after are identical (MAX of MAXes);
    * what changes is the partition count the per-read merge scans. */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val maxBatch = readOr(spark, storeDir).agg(max(col("ingest_batch"))).head()
    if (maxBatch.isNullAt(0)) return
    val keepBatch = maxBatch.getLong(0)
    val collapsed = registers(spark, storeDir)
      .withColumn("ingest_batch", lit(keepBatch))
      .coalesce(1)
    KeyedStore.rewriteSwap(spark, storeDir) { tmp =>
      collapsed.write.mode(SaveMode.Overwrite)
        .partitionBy("ingest_batch").parquet(tmp)
    }
  }

  /** Wire a (doc_id, source, text) stream into the maintenance loop. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
            compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        runBatch(batch.sparkSession, batch, batchId, storeDir)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compact(batch.sparkSession, storeDir)
      }
      .start()
}
