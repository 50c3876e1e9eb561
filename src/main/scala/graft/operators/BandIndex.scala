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
  * bucket = xxhash64(band) % the index's bucket width; a probe computes
  * its own bands' buckets (driver-sized: probe docs x [[Hashing.LshBands]]
  * values, bounded by the width), and the partition filter prunes the
  * scan to matching directories — a single-doc probe reads at most
  * LshBands/width of the index regardless of corpus size.
  *
  * Bucket width is INDEX-LEVEL GEOMETRY, fixed at creation, persisted in
  * a SIBLING meta file (`<dir>.buckets` — beside the parquet dir, so the
  * compact swap's delete-and-rename of the dir itself cannot lose it;
  * lock-free probes must see one width for the index's whole life), and
  * sized from the first build's signature count ([[autoBuckets]]): a
  * sandbox-scale index writes 8 well-filled band files instead of a
  * 64-way spray of KB slivers (whose per-file footer opens also
  * dominated the compaction trigger's walk), while a warehouse-scale
  * build gets finer pruning than the old fixed 64. Meta-less dirs that
  * already exist pin the legacy [[DefaultBuckets]].
  *
  * Candidates verify exactly as everywhere else
  * ([[IncrementalDedup.verifyPairs]]). Same banding as the batch path
  * (`Hashing` is the single source of truth), so probe candidates EQUAL
  * the batch LSH candidates touching the probe docs — [[BandIndexSpec]]
  * gates that equivalence and the pruning itself (records read, via
  * QueryMetrics, at an explicit spec-pinned width).
  */
object BandIndex {

  /** Legacy / fallback partition width — the pre-geometry constant,
    * still pinned for meta-less dirs that already carry bands. New
    * indexes size their width from the first build ([[autoBuckets]]). */
  val DefaultBuckets = 64

  /** Creation-time width from the indexed signature count: band rows are
    * docs x [[Hashing.LshBands]]; target ~2^19 rows (a few tens of MB)
    * per bucket file, power of two, clamped to [8, 4096] (guide §2.5:
    * scale-adaptive partitioning; §6: output file sizing). */
  private[operators] def autoBuckets(nSigs: Long): Int = {
    val rows = nSigs * Hashing.LshBands
    val targetPerBucket = 1L << 19
    var b = 8
    while (b < 4096 && b.toLong * targetPerBucket < rows) b <<= 1
    b
  }

  private def metaPath(dir: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(dir)
    new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".buckets")
  }

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readBuckets(spark: SparkSession, dir: String): Option[Int] = {
    val p = metaPath(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    try Some(raw.trim.toInt)
    catch {
      case _: NumberFormatException =>
        sys.error(s"BandIndex at $dir: bucket meta $p is unparsable " +
          s"(${raw.trim.take(32)}); it is written atomically, so this " +
          "indicates external corruption — restore it or rebuild the index")
    }
  }

  private def writeBucketsMeta(spark: SparkSession, dir: String, b: Int): Unit = {
    val p = metaPath(dir)
    val tmp = new org.apache.hadoop.fs.Path(p.toString + ".tmp")
    val fs = fsOf(spark, dir)
    val out = fs.create(tmp, true)
    try out.write(s"$b\n".getBytes("UTF-8")) finally out.close()
    if (fs.exists(p) && !fs.delete(p, false))
      sys.error(s"bucket meta: could not replace $p")
    if (!fs.rename(tmp, p))
      sys.error(s"bucket meta: rename $tmp -> $p failed")
  }

  /** The index's persisted width; for a meta-less path, the legacy
    * [[DefaultBuckets]] when bands already exist (those can only be laid
    * out at the old hardcoded width), else the `create` choice —
    * persisted only when `create` is given (build), never by readers. */
  private def bucketsOf(spark: SparkSession, dir: String,
                        create: Option[Int] = None): Int =
    readBuckets(spark, dir).getOrElse {
      val legacy = {
        val p = new org.apache.hadoop.fs.Path(dir)
        fsOf(spark, dir).exists(p)
      }
      val b = if (legacy) DefaultBuckets else create.getOrElse(DefaultBuckets)
      create.foreach(_ => writeBucketsMeta(spark, dir, b))
      b
    }

  private[graft] def bucketOf(band: org.apache.spark.sql.Column, nb: Int) =
    pmod(xxhash64(band), lit(nb.toLong)).cast("int")

  private[graft] def banded(sigs: DataFrame): DataFrame = sigs.select(
    col("doc_id"),
    explode(Hashing.lshBandKeys(col("sig"),
      Hashing.LshBands, Hashing.LshRowsPerBand)).as("band"))

  /** Build (or rebuild) the index from a signature table
    * ([[IncrementalDedup.signatures]]'s (doc_id, sig) schema). Width:
    * the dir's persisted geometry when it has one, else an explicit
    * `buckets` > 0 (specs gating the pruning claim at a pinned width),
    * else sized from the signature count. */
  def build(spark: SparkSession, dir: String, sigs: DataFrame,
            buckets: Int = 0): Unit = {
    val nb = bucketsOf(spark, dir, create =
      Some(if (buckets > 0) buckets else autoBuckets(sigs.count())))
    bandedRows(sigs, nb)
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Bands + bucket, repartitioned BY BUCKET before the partitioned
    * write: without this every shuffle task writes a sliver into every
    * bucket directory (tasks x width small files — measured as the
    * dominant probe cost at 100x), with it each bucket's rows land in
    * one file per writing task that owns it (~width files total). */
  private def bandedRows(sigs: DataFrame, nb: Int): DataFrame =
    banded(sigs).withColumn("bucket", bucketOf(col("band"), nb))
      .repartition(col("bucket"))

  /** Append a delta's bands (the incremental-store discipline: new docs'
    * signatures fold in, their bands append here; dynamic partition
    * overwrite is NOT used, so replays may duplicate band rows — probe
    * results are a DISTINCT pair set, unaffected, but the index GROWS
    * under replay: [[maybeCompact]] is the measured trigger that rebuilds
    * it once the bloat crosses a threshold). */
  def append(spark: SparkSession, dir: String, deltaSigs: DataFrame): Unit = {
    KeyedStore.recover(spark, dir)
    bandedRows(deltaSigs, bucketsOf(spark, dir))
      .write.partitionBy("bucket").mode(SaveMode.Append).parquet(dir)
  }

  /** Rebuild the index from the CURRENT signature store through the
    * keyed-store swap discipline ([[KeyedStore.rewriteSwap]]): the
    * replacement is built at a `.rewrite` sibling path and renamed in, so
    * a crash at any point leaves either the old or the new index complete
    * (recover heals the delete-before-rename window). Collapses replay
    * duplicates. The WIDTH is the index's persisted geometry, never
    * resized here: lock-free probes compute bucket lists from the meta,
    * and a mid-compact width flip would silently prune them to the wrong
    * directories. Callers serialize on the store's writer lock. */
  def compact(spark: SparkSession, dir: String, sigs: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      build(spark, dir, sigs)
    else {
      val nb = bucketsOf(spark, dir)
      KeyedStore.rewriteSwap(spark, dir) { tmp =>
        bandedRows(sigs, nb)
          .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(tmp)
      }
    }
  }

  /** How many of the index's bucket partitions a probe's bands touch —
    * the adaptive-routing input ([[IncrementalSplit]]): partition pruning
    * only pays when this is a small fraction of the width. One
    * probe-sized job; width from the dir's persisted geometry (the
    * legacy default when the index does not exist yet — routing there is
    * a heuristic, never a correctness input). */
  def probeBucketCount(spark: SparkSession, dir: String,
                       probeSigs: DataFrame): Long = {
    val nb = bucketsOf(spark, dir)
    banded(probeSigs).select(bucketOf(col("band"), nb).as("bucket"))
      .distinct().count()
  }

  /** The dir's bucket width (legacy default when absent) — the routing
    * gate's denominator ([[IncrementalSplit]]). Driver-side, no job. */
  def bucketWidth(spark: SparkSession, dir: String): Int = bucketsOf(spark, dir)

  /** Index rows counted from parquet FOOTERS only — a driver-side walk of
    * the (<= width directories x few files) listing, no Spark job,
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
    val nb = bucketsOf(spark, dir)
    val qBands = banded(probeSigs)
      .select(col("doc_id").as("q_id"), col("band"),
        bucketOf(col("band"), nb).as("bucket"))
      .localCheckpoint(true) // tiny; and the bucket list below re-reads it
    // driver-sized by construction: <= min(probeDocs x LshBands, width)
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
