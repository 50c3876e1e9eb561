package graft.streaming

import graft.operators.InvIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance for the persisted inverted index
  * ([[graft.operators.InvIndex]]) — the leg that completes the RETRIEVAL
  * family's matrix: batch statistics (q181) / incremental store (q213) /
  * online BM25 search (q214) / STREAMING arrival here, the
  * [[BandIndexStream]] / [[SubstrStream]] analogue.
  *
  * The replay story is the simplest of the three families because the
  * store's own commit protocol already IS the replay discipline:
  * `InvIndex.ingest` keys every partition by batch id and commits via a
  * marker written last, so a redelivered microbatch (foreachBatch is
  * at-least-once) uncommits and replaces exactly its own partitions —
  * including the content-CHANGING redelivery case that strands stale
  * bands in [[BandIndexStream]]'s layout (no compaction trigger needed
  * here; there is nothing to go stale). A crash mid-ingest leaves the
  * batch uncommitted and therefore invisible to every mid-stream reader
  * until the engine redelivers it.
  *
  * Cross-batch duplicate doc_ids are REJECTED by the store's insert-only
  * contract, failing the streaming query loudly — route changed content
  * through new doc_ids, the family convention.
  *
  * Search and statistics are served MID-STREAM off the live root: readers
  * prune to committed batches, so a query racing a microbatch sees the
  * complete pre-batch index, never a partial one.
  */
object IndexStream {

  /** One microbatch: one marker-committed index batch. Safe to call
    * directly with a replayed/out-of-order `batchId` — the specs drive
    * exactly such schedules. */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               root: String): Unit =
    InvIndex.ingest(spark, root, batch.select(col("doc_id"), col("text")),
      batchId)

  /** q181's report off the live store (committed batches only). */
  def stats(spark: SparkSession, root: String): DataFrame =
    InvIndex.stats(spark, root)

  /** BM25 top-k off the live store — [[InvIndex.search]] verbatim. */
  def search(spark: SparkSession, root: String, terms: Seq[String],
             k: Int): DataFrame =
    InvIndex.search(spark, root, terms, k)

  /** Attach the index to a streaming Dataset of (doc_id, text). */
  def start(docs: DataFrame, root: String,
            checkpointDir: String): StreamingQuery =
    BatchStore.loop(docs, checkpointDir, 0) { (s, batch, batchId) =>
      runBatch(s, batch, batchId, root)
    } { _ => () }
}
