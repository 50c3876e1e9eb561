package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Band-PARTITIONED LSH index: the storage layout that turns the
  * signature store's one corpus-wide narrow scan (the only corpus-sized
  * component left in an incremental dedup/split refresh — see
  * [[IncrementalSplit]]) into a partition-pruned read for SMALL probes.
  *
  * The batch/incremental paths band both join legs and shuffle on the
  * band key — right for delta-sized probes (a 10% delta's bands touch
  * every bucket anyway). The path this index serves is the ONLINE one: a
  * handful of incoming documents (an ingest admission check, a
  * user-facing "is this a near-dup" endpoint) probing a huge stored
  * corpus. Bands are written `partitionBy(bucket)` with
  * bucket = xxhash64(band) % [[Buckets]]; a probe computes its own bands'
  * buckets (driver-sized: probe docs x [[Hashing.LshBands]] values,
  * bounded by [[Buckets]]), and the partition filter prunes the scan to
  * matching directories — a single-doc probe reads at most
  * LshBands/Buckets of the index regardless of corpus size. Candidates
  * then verify exactly as everywhere else
  * ([[IncrementalDedup.verifyPairs]]).
  *
  * Same banding as the batch path (`Hashing` is the single source of
  * truth), so probe candidates EQUAL the batch LSH candidates touching
  * the probe docs — [[BandIndexSpec]] gates that equivalence and the
  * pruning itself (records read, via QueryMetrics).
  */
object BandIndex {

  /** Partition count: at LshBands = 4, a one-doc probe reads <= 4/64 of
    * the index; raise for larger stores (directories are cheap). */
  val Buckets = 64

  private[graft] def bucketOf(band: org.apache.spark.sql.Column) =
    pmod(xxhash64(band), lit(Buckets.toLong)).cast("int")

  private[graft] def banded(sigs: DataFrame): DataFrame = sigs.select(
    col("doc_id"),
    explode(Hashing.lshBandKeys(col("sig"),
      Hashing.LshBands, Hashing.LshRowsPerBand)).as("band"))

  /** Build (or rebuild) the index from a signature table
    * ([[IncrementalDedup.signatures]]'s (doc_id, sig) schema). */
  def build(spark: SparkSession, dir: String, sigs: DataFrame): Unit =
    bandedRows(sigs)
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(dir)

  /** Bands + bucket, repartitioned BY BUCKET before the partitioned
    * write: without this every shuffle task writes a sliver into every
    * bucket directory (tasks x Buckets small files — measured as the
    * dominant probe cost at 100x), with it each bucket's rows land in
    * one file per writing task that owns it (~Buckets files total). */
  private def bandedRows(sigs: DataFrame): DataFrame =
    banded(sigs).withColumn("bucket", bucketOf(col("band")))
      .repartition(col("bucket"))

  /** Append a delta's bands (the incremental-store discipline: new docs'
    * signatures fold in, their bands append here; dynamic partition
    * overwrite is NOT used, so replays may duplicate band rows — probe
    * results are a DISTINCT pair set, unaffected, but the index GROWS
    * under replay: [[maybeCompact]] is the measured trigger that rebuilds
    * it once the bloat crosses a threshold). */
  def append(spark: SparkSession, dir: String, deltaSigs: DataFrame): Unit = {
    KeyedStore.recover(spark, dir)
    bandedRows(deltaSigs)
      .write.partitionBy("bucket").mode(SaveMode.Append).parquet(dir)
  }

  /** Rebuild the index from the CURRENT signature store through the
    * keyed-store swap discipline ([[KeyedStore.rewriteSwap]]): the
    * replacement is built at a `.rewrite` sibling and renamed in, so a
    * crash at any point leaves either the old or the new index complete
    * (recover heals the delete-before-rename window). Collapses replay
    * duplicates; callers serialize on the store's writer lock. */
  def compact(spark: SparkSession, dir: String, sigs: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      build(spark, dir, sigs)
    else KeyedStore.rewriteSwap(spark, dir) { tmp =>
      bandedRows(sigs)
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(tmp)
    }
  }

  /** How many of the [[Buckets]] partitions a probe's bands touch — the
    * adaptive-routing input ([[IncrementalSplit]]): partition pruning
    * only pays when this is a small fraction of [[Buckets]]. One
    * probe-sized job. */
  def probeBucketCount(probeSigs: DataFrame): Long =
    banded(probeSigs).select(bucketOf(col("band")).as("bucket"))
      .distinct().count()

  /** Index rows counted from parquet FOOTERS only — a driver-side walk of
    * the (<= [[Buckets]] directories x few files) listing, no Spark job,
    * no data pages read: the compaction trigger must not cost an
    * index-wide scan per ingest round. */
  def footerRowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") &&
          !name.startsWith("_") && !name.startsWith(".")) files += f
    }
    // footer opens parallelize trivially (independent ~1 ms reads); a
    // serial walk over an append-accumulated index was measurable
    import scala.jdk.CollectionConverters._
    files.asJava.parallelStream().mapToLong { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum()
  }

  /** Measured compaction trigger: a fresh index holds exactly
    * (store docs x [[Hashing.LshBands]]) rows; replayed appends duplicate
    * band rows past that. Compact when actual exceeds expected by more
    * than `slack`. Both counts come from parquet footers (driver-side,
    * no job). Returns whether a compaction ran. */
  def maybeCompact(spark: SparkSession, dir: String, sigDir: String,
                   sigs: DataFrame, slack: Double = 0.25): Boolean = {
    val actual = footerRowCount(spark, dir)
    val expected = footerRowCount(spark, sigDir) * Hashing.LshBands
    val bloated = actual > (expected * (1.0 + slack)).toLong
    if (bloated) compact(spark, dir, sigs)
    bloated
  }

  /** LSH candidates for a SMALL probe set: (q_id, cand_id) pairs of probe
    * doc x indexed doc sharing a band. Reads only the probe bands'
    * bucket partitions. Self-matches are dropped; verification is the
    * caller's next step (exact Jaccard over fetched shingles). */
  def probe(spark: SparkSession, dir: String, probeSigs: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Probes are lock-free readers: recover ONLY when the live dir is
    // absent — either a crashed compact's delete-before-rename window
    // (promote the completed .rewrite, never answer a wrong EMPTY to an
    // admission check) or a concurrent swap mid-flight (same promotion;
    // rewriteSwap tolerates the benign rename loss). An unconditional
    // recover here would delete a concurrent compact's in-progress
    // .rewrite out from under it.
    if (!fs.exists(p)) KeyedStore.recover(spark, dir)
    if (!fs.exists(p)) {
      // an admission check before any ingest: nothing indexed, nothing
      // similar — an empty answer, not a path error
      import spark.implicits._
      return Seq.empty[(Long, Long)].toDF("q_id", "cand_id")
    }
    val qBands = banded(probeSigs)
      .select(col("doc_id").as("q_id"), col("band"),
        bucketOf(col("band")).as("bucket"))
      .localCheckpoint(true) // tiny; and the bucket list below re-reads it
    // driver-sized by construction: <= min(probeDocs x LshBands, Buckets)
    val buckets = qBands.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val idx = spark.read.parquet(dir)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
    qBands.join(idx, Seq("bucket", "band"))
      .filter(col("q_id") =!= col("doc_id"))
      .select(col("q_id"), col("doc_id").as("cand_id"))
      .distinct()
  }
}
