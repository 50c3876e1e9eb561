package graft.sources

import graft.operators.Projection
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** Executor-side paginated backfill (S8/S12 at scale): a DataSourceV2 table
  * where each INDEPENDENT cursor — one per parent row / shard
  * (`transistor_episode_stats_v1.rb:81-134`, pool `base.rb:1134-1166`) —
  * becomes one `InputPartition`, and the whole pagination loop (token walk,
  * retries, page buffering) runs inside the executor task's
  * `PartitionReader`. Nothing is accumulated on the driver: with 100k
  * parents, 100k partitions stream pages straight into the downstream
  * projection+merge exchange, bounded only by executor count.
  *
  * [[Backfiller.run]] remains the right tool for a genuinely SERIAL token
  * protocol (each token derives from the previous response — one cursor, no
  * parallelism to mine); this source is for the fan-out case where cursors
  * are independent per parent.
  *
  * Fetchers are shipped to executors inside the partition descriptor, so
  * they must be [[java.io.Serializable]] (capture page state, not
  * connections; open transports lazily inside `fetchPage`). The fetcher
  * list itself is handed over through a driver-side registry keyed by a
  * UUID — planning happens on the driver, so the lookup never leaves it.
  */
object DistributedBackfill {

  /** A [[Backfiller.PageFetcher]] that can ride to executors. */
  trait PageFetcher extends Backfiller.PageFetcher with Serializable

  private[sources] final case class Job(
      fetchers: Seq[Backfiller.PageFetcher with Serializable],
      maxAttempts: Int,
      maxPages: Int,
      backoffMs: Long)

  private val registry = new ConcurrentHashMap[String, Job]()

  /** Output schema: identical shape to [[Backfiller.toWebhookDf]] so the
    * result feeds `Pipeline.upsertBatch` unchanged. */
  val schema: StructType = StructType(Seq(
    StructField("body", StringType, nullable = true),
    StructField(Projection.IngestSeqCol, LongType, nullable = false)))

  /** Read all fetchers' pages as one DataFrame, pagination on executors.
    *
    * Ingest sequence: fetcher index in the high bits, item arrival order in
    * the low 40 bits — deterministic, and per-cursor page order is preserved
    * for the last-wins dedup (U4) exactly as the serial loop preserves it.
    */
  def read(spark: SparkSession,
           fetchers: Seq[Backfiller.PageFetcher with Serializable],
           maxAttempts: Int = 3,
           maxPages: Int = 100000,
           backoffMs: Long = 0L): DataFrame = {
    val id = UUID.randomUUID().toString
    registry.put(id, Job(fetchers, maxAttempts, maxPages, backoffMs))
    spark.read.format(classOf[BackfillSource].getName)
      .option(BackfillSource.JobIdKey, id).load()
  }

  private[sources] def job(id: String): Job = {
    val j = registry.get(id)
    require(j != null, s"unknown backfill job $id (registry is driver-side)")
    j
  }

  /** Drop a finished job's fetchers from the registry (driver memory). */
  def release(id: String): Unit = { registry.remove(id); () }
}

/** TableProvider entry point — addressed by fully-qualified class name via
  * `spark.read.format(...)`, no service-loader registration needed. */
class BackfillSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DistributedBackfill.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new BackfillSource.BackfillTable(properties.get(BackfillSource.JobIdKey))
}

object BackfillSource {
  val JobIdKey = "jobid"

  private final class BackfillTable(jobId: String) extends Table with SupportsRead {
    require(jobId != null, s"missing required option $JobIdKey")
    override def name(): String = s"graft_backfill_$jobId"
    override def schema(): StructType = DistributedBackfill.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new BackfillScan(jobId)
      }
  }

  private final class BackfillScan(jobId: String) extends Scan with Batch {
    override def readSchema(): StructType = DistributedBackfill.schema
    override def toBatch: Batch = this
    // planInputPartitions runs on the driver: resolve the registry here and
    // ship each fetcher inside its partition descriptor.
    override def planInputPartitions(): Array[InputPartition] = {
      val j = DistributedBackfill.job(jobId)
      j.fetchers.zipWithIndex.map { case (f, i) =>
        FetcherPartition(f, i, j.maxAttempts, j.maxPages, j.backoffMs): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new BackfillReaderFactory
  }

  private final case class FetcherPartition(
      fetcher: Backfiller.PageFetcher with Serializable,
      idx: Int, maxAttempts: Int, maxPages: Int, backoffMs: Long)
    extends InputPartition

  private final class BackfillReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new BackfillReader(p.asInstanceOf[FetcherPartition])
  }

  /** The executor-side pagination loop: same retry contract as
    * [[Backfiller.run]] (maxAttempts per page, FatalFetchError = 401 stops
    * the cursor without retry), streaming one page at a time — peak memory
    * is one page, independent of cursor length. */
  private final class BackfillReader(p: FetcherPartition)
      extends PartitionReader[InternalRow] {
    private var token: Option[String] = None
    private var buf: Iterator[String] = Iterator.empty
    private var pages = 0
    private var exhausted = false
    private var itemIdx = 0L
    private var current: InternalRow = _

    override def next(): Boolean = {
      while (!buf.hasNext && !exhausted) fetchNextPage()
      if (!buf.hasNext) false
      else {
        val body = buf.next()
        val seq = (p.idx.toLong << 40) | itemIdx
        itemIdx += 1
        current = InternalRow(UTF8String.fromString(body), seq)
        true
      }
    }

    private def fetchNextPage(): Unit = {
      if (pages >= p.maxPages) { exhausted = true; return }
      val backoff: Int => Unit =
        if (p.backoffMs <= 0) _ => ()
        else attempt => Thread.sleep(p.backoffMs * attempt)
      Backfiller.fetchWithRetry(p.fetcher, token, p.maxAttempts, backoff) match {
        case Some((items, nextTok)) =>
          buf = items.iterator
          token = nextTok
          pages += 1
          if (nextTok.isEmpty) exhausted = true
        case None => // auth error: stop this cursor (page skipped)
          exhausted = true
      }
    }

    override def get(): InternalRow = current
    override def close(): Unit = ()
  }
}
