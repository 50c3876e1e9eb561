package graft.streaming

import graft.functions.Text
import graft.operators.MisraGries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streaming heavy-hitter candidates — the fifth store on the BatchStore
  * replay core, and the BOUNDED-STATE counterpart of [[VocabStream]]: where
  * VocabStream's live state is vocabulary-sized, this store writes one
  * Misra-Gries summary (at most k-1 rows) per microbatch and folds them at
  * read time with the mergeable-summaries rule, so store size is
  * O(batches * k) between compactions and O(k) after — a trending-tokens
  * tracker whose footprint never depends on the vocabulary.
  *
  * Replay safety is inherited: a redelivered microbatch REPLACES its own
  * summary partition (BatchStore own-partition overwrite), and the read-time
  * fold is deterministic (batch-id order). The fold's retention guarantee —
  * every token with total frequency > n/k appears among the candidates —
  * holds for the whole stream by mergeability, so callers recount the
  * candidates exactly and get the true heavy-hitter set (the q179 recipe).
  */
object MgStream {

  val DefaultK = 40

  private val schema = new StructType()
    .add("tok", StringType).add("cnt", LongType)
    .add("ingest_batch", LongType)

  /** One microbatch: summarize the delta's tokens into <= k-1 counters,
    * replace this batch's partition. Public so replay exactness is testable
    * directly. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               storeDir: String, k: Int = DefaultK): Unit = {
    import spark.implicits._
    // explode_outer + null filter: same InferFiltersFromGenerate discipline
    // as q179 — don't let the tokens() chain be cloned into a size() filter
    val toks = batch.select(explode_outer(Text.tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull)
    BatchStore.writePartition(
      MisraGries.summarize(toks, k).toDF("tok", "cnt"), batchId, storeDir)
  }

  /** The one read-time fold, shared by the live read and compaction: the
    * collect is bounded by construction (<= k-1 rows per batch partition;
    * compaction collapses history to one) — summary state, not data. */
  private def foldSummaries(live: DataFrame, k: Int): Seq[(String, Long)] = {
    val byBatch = live.select(col("tok"), col("cnt"), col("ingest_batch"))
      .collect().groupBy(_.getLong(2)).toSeq.sortBy(_._1)
      .map(_._2.map(r => (r.getString(0), r.getLong(1))).toSeq)
    MisraGries.mergeSummaries(byBatch, k)
  }

  /** The live candidate summary: fold the per-batch summaries in batch-id
    * order. */
  def candidates(spark: SparkSession, storeDir: String, k: Int = DefaultK): Seq[(String, Long)] =
    foldSummaries(BatchStore.read(spark, storeDir, schema), k)

  /** Collapse the batch history (all but the redeliverable max batch)
    * into the merged-summary sentinel partition. */
  def compact(spark: SparkSession, storeDir: String, k: Int = DefaultK): Unit =
    BatchStore.collapseHistory(spark, storeDir, schema) { live =>
      import spark.implicits._
      foldSummaries(live, k).toDF("tok", "cnt")
    }

  /** Wire a (doc_id, text) stream into the maintenance loop. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
            k: Int = DefaultK, compactEvery: Int = 0): StreamingQuery =
    BatchStore.loop(docs, checkpointDir, compactEvery)(
      (s, batch, batchId) => runBatch(s, batch, batchId, storeDir, k))(
      s => compact(s, storeDir, k))
}
