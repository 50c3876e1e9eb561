package graft.streaming

import graft.operators.IncrementalSubstr
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streaming ingestion for the EXACT-SUBSTRING ledger
  * ([[graft.operators.IncrementalSubstr]]) — the round-13 leg that
  * completes the substring family's matrix: batch (q208), incremental
  * refresh (q211), online admission probe (q212), and STREAMING arrival
  * here (the [[BandIndexStream]] analogue for the LSH family).
  *
  * Each microbatch is one locked ledger round; replay safety stacks two
  * idempotent layers:
  *  - the raw delta is ARCHIVED under its `ingest_batch` partition with
  *    [[BatchStore.writePartition]]'s dynamic overwrite (the corpus the
  *    ledger's holder-recompute contract needs must outlive the
  *    microbatch — a stream cannot re-serve yesterday's text);
  *  - the ledger round itself lands on a DETERMINISTIC round id derived
  *    from the delta's content, so a crashed microbatch's redelivery
  *    overwrites its own partition and is then dropped row-by-row by
  *    the docs-ledger fingerprint match ([[IncrementalSubstr.ingest]]'s
  *    replay discipline, already model-fuzzed in `StoreFuzzSpec`).
  *
  * The replayed-batch corpus view is pinned by `ingest_batch <= batchId`
  * — a redelivered batch recomputes against exactly the documents it saw
  * the first time, even though later batches have since landed (their
  * rounds are already in the ledger; the replay's rows drop before any
  * of that state is read).
  *
  * Content-CHANGING redeliveries are REJECTED by the ledger's
  * insert-only contract (monotone window counts — see ingest's
  * scaladoc), which fails the streaming query loudly rather than
  * silently corrupting spans; ingest changed documents under a new
  * doc_id, exactly as in batch.
  *
  * The admission probe and the span report are served MID-STREAM off the
  * live root: probes are read-only and rounds are writer-locked, so a
  * probe between (or during) microbatches sees a complete ledger state.
  */
object SubstrStream {

  private def archiveDir(root: String) = s"$root/stream-archive"

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("ingest_batch", LongType)

  /** One microbatch: archive the delta, then run one ledger round with
    * the archive (this batch and earlier) as the corpus. Safe to call
    * directly with an out-of-order/replayed `batchId` — both layers
    * heal (the specs drive exactly such schedules). */
  def runBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               root: String, maintainBloom: Boolean = true): Unit = {
    val docs = batch.select(col("doc_id"), col("text"))
    BatchStore.writePartition(docs, batchId, archiveDir(root))
    // identical-content duplicates collapse (changed content cannot
    // coexist — ingest rejects it before the second version's round), so
    // dropDuplicates needs no recency window here
    val corpus = BatchStore.readOr(spark, archiveDir(root), docSchema)
      .filter(col("ingest_batch") <= batchId)
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("text"))
    IncrementalSubstr.ingest(spark, root, corpus, docs,
      maintainBloom = maintainBloom)
  }

  /** Online admission probe against the live root —
    * [[IncrementalSubstr.probe]] verbatim (read-only; rounds are
    * writer-locked, so mid-stream probes see complete ledger states). */
  def probe(spark: SparkSession, root: String, probeDocs: DataFrame): DataFrame =
    IncrementalSubstr.probe(spark, root, probeDocs)

  /** The maintained span report over everything streamed so far. */
  def report(spark: SparkSession, root: String): DataFrame =
    IncrementalSubstr.report(spark, root)

  /** Attach the ledger to a streaming Dataset of (doc_id, text). */
  def start(docs: DataFrame, root: String, checkpointDir: String,
            maintainBloom: Boolean = true): StreamingQuery =
    BatchStore.loop(docs, checkpointDir, 0) { (s, batch, batchId) =>
      runBatch(s, batch, batchId, root, maintainBloom)
    } { _ => () }
}
