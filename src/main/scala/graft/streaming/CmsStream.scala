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

  private def readOr(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(regSchema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], regSchema)
  }

  /** One microbatch: sum the delta's cells and replace this batch's
    * partition. Public so replay exactness is testable directly. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               storeDir: String): Unit = {
    KeyedStore.recover(spark, storeDir)
    val delta = CmsSketch.registers(CmsSketch.tokenStream(batch))
      .withColumn("ingest_batch", lit(batchId))
    delta.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(storeDir)
  }

  /** The live register table: SUM across every batch partition. */
  def registers(spark: SparkSession, storeDir: String): DataFrame = {
    KeyedStore.recover(spark, storeDir)
    readOr(spark, storeDir).groupBy(col("r"), col("j"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Collapse the batch-partition history to one summed partition. */
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

  /** Wire a (doc_id, text) stream into the maintenance loop. */
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
