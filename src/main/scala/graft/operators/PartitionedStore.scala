package graft.operators

import graft.functions.Converters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Hash-partitioned snapshot layout (U5, `partitionable_mixin.rb:33-129`,
  * DDL `db_adapter/pg.rb:134-139`): very large replica tables store under
  * `bucket = pmod(str2inthash(remote_key), n)` partitions. Because the merge
  * conflict target includes the partition column, an incremental merge only
  * touches the buckets present in the batch — partition pruning instead of
  * a full-table rewrite, which is the difference between O(batch) and
  * O(table) at 100 TB.
  *
  * Commits are ATOMIC across buckets via a manifest pointer flip (the
  * reference gets the same guarantee from PG transactions, `base.rb:762-785`):
  * each write lands bucket data under a fresh epoch directory `e<V>/`, then
  * publishes `_manifest/v<V>.json` mapping every bucket to the epoch that
  * owns its current data. Readers resolve the highest manifest; a crash
  * after data write but before manifest publish leaves only an orphan epoch
  * directory — the visible snapshot is unchanged, never half-old/half-new.
  * On local/HDFS filesystems the publish is an atomic rename; on object
  * stores the same protocol maps to a conditional PUT of the next version.
  * Writer concurrency contract: single writer per table (the reference's
  * advisory-lock discipline); a version collision fails the late writer.
  */
object PartitionedStore {

  val BucketCol = "part_bucket"
  private val ManifestDir = "_manifest"

  final case class Manifest(version: Long, buckets: Map[Int, Long]) {
    def epochDirs: Map[Long, Seq[Int]] =
      buckets.groupBy(_._2).map { case (e, bs) => e -> bs.keys.toSeq.sorted }
  }

  // ------------------------------------------------------------- manifest io

  private def render(m: Manifest): String = {
    val bs = m.buckets.toSeq.sortBy(_._1)
      .map { case (b, e) => s""""$b":$e""" }.mkString(",")
    s"""{"version":${m.version},"buckets":{$bs}}"""
  }

  private def parse(s: String): Manifest = {
    val version = """"version":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(sys.error(s"bad manifest: $s"))
    val buckets = """"(\d+)":(\d+)""".r.findAllMatchIn(
      s.substring(s.indexOf("\"buckets\""))).map(m =>
      m.group(1).toInt -> m.group(2).toLong).toMap
    Manifest(version, buckets)
  }

  private def manifestName(v: Long): String = f"v$v%012d.json"

  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Latest committed manifest, or None for a directory with no snapshot
    * (or a pre-manifest flat layout). */
  def currentManifest(dir: String): Option[Manifest] = {
    val md = Paths.get(dir, ManifestDir)
    if (!Files.isDirectory(md)) return None
    val latest = listDir(md)
      .filter(_.getFileName.toString.matches("v\\d{12}\\.json"))
      .maxByOption(_.getFileName.toString)
    latest.map(p => parse(new String(Files.readAllBytes(p), "UTF-8")))
  }

  /** Publish a manifest version: full write to a temp name, then an atomic
    * rename into place — the commit point. A pre-existing version file means
    * a concurrent writer won the race; fail rather than clobber. */
  private def publish(dir: String, m: Manifest): Unit = {
    val md = Paths.get(dir, ManifestDir)
    Files.createDirectories(md)
    val dst = md.resolve(manifestName(m.version))
    require(!Files.exists(dst),
      s"concurrent writer: manifest version ${m.version} already committed")
    val tmp = Files.createTempFile(md, ".tmp-", ".json")
    Files.write(tmp, render(m).getBytes("UTF-8"))
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Buckets that actually materialized files under an epoch directory
    * (a merge can leave a touched bucket empty — it must not be flipped). */
  private def bucketsIn(epochDir: Path): Seq[Int] =
    if (!Files.isDirectory(epochDir)) Seq.empty
    else listDir(epochDir)
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith(s"$BucketCol=") =>
        s.stripPrefix(s"$BucketCol=").toInt }
      .sorted

  // ------------------------------------------------------------------ api

  def withBucket(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(Converters.str2inthash(col(keyCol)), lit(buckets)))

  /** Write a full snapshot as epoch v, then commit it. Serialized per table
    * by [[TableLock]] (the advisory-lock discipline, `base.rb:995-1044`);
    * the manifest-version collision in [[publish]] stays as the backstop
    * for writers that bypass the lock. */
  def write(df: DataFrame, dir: String, keyCol: String, buckets: Int): Unit =
    TableLock.withLock(dir) { writeLocked(df, dir, keyCol, buckets) }

  private def writeLocked(df: DataFrame, dir: String, keyCol: String, buckets: Int): Unit = {
    val v = currentManifest(dir).map(_.version + 1).getOrElse(1L)
    val b = withBucket(df, keyCol, buckets)
    b.write.mode("overwrite").partitionBy(BucketCol).parquet(s"$dir/e$v")
    val landed = bucketsIn(Paths.get(dir, s"e$v"))
    // Empty snapshot: a partitioned write of zero rows leaves no parquet
    // files at all (schema lost). Land one unpartitioned empty file so
    // read() of the committed-but-empty table still answers with the
    // right schema instead of crashing.
    if (landed.isEmpty)
      b.limit(0).write.mode("overwrite").parquet(s"$dir/e$v")
    publish(dir, Manifest(v, landed.map(_ -> v).toMap))
  }

  /** Read the committed snapshot: one pruned parquet scan per live epoch
    * (each restricted to the buckets that epoch still owns), unioned. The
    * union stays shallow because [[compact]] folds history; every scan keeps
    * `part_bucket` as a partition column, so bucket filters still prune. */
  def read(spark: SparkSession, dir: String): DataFrame =
    currentManifest(dir) match {
      case None => spark.read.parquet(dir) // pre-manifest flat layout
      case Some(m) => readManifest(spark, dir, m)
    }

  /** Time travel: read the snapshot as of a PAST committed version — every
    * manifest inside the [[ManifestRetention]] window is a complete,
    * immutable description of its snapshot (epochs are append-only until
    * [[vacuum]], which honors the same window). */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame =
    readManifest(spark, dir, manifestAt(dir, version))

  private def manifestAt(dir: String, version: Long): Manifest = {
    val p = Paths.get(dir, ManifestDir, manifestName(version))
    require(Files.exists(p),
      s"version $version is not committed (or vacuumed past retention) at $dir")
    parse(new String(Files.readAllBytes(p), "UTF-8"))
  }

  /** Committed versions still readable, oldest first. */
  def versions(dir: String): Seq[Long] = {
    val md = Paths.get(dir, ManifestDir)
    if (!Files.isDirectory(md)) Seq.empty
    else listDir(md).map(_.getFileName.toString)
      .filter(_.matches("v\\d{12}\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong).sorted
  }

  private def readManifest(spark: SparkSession, dir: String, m: Manifest): DataFrame =
    if (m.buckets.isEmpty) spark.read.parquet(s"$dir/e${m.version}") // empty snapshot
    else readBuckets(spark, dir, m, m.buckets.keys.toSeq.sorted)

  /** Row-level diff between two committed versions: (keys..., change) with
    * change in {added, removed, changed} — the audit view time travel
    * enables ("what did batch N actually do"). One full-outer join on the
    * key; content comparison is an md5 over the non-key columns in sorted
    * column order, so column order changes don't read as data changes.
    *
    * BUCKET-PRUNED: epoch directories are immutable once committed, so a
    * bucket owned by the SAME epoch in both manifests is byte-identical and
    * cannot contribute a diff row — only buckets whose owning epoch differs
    * (or that exist on one side only) are read. For adjacent versions that
    * is O(buckets the batch touched), not O(table); after a compaction every
    * bucket changes owner and the compare degrades to the full scan it
    * genuinely needs. */
  def diff(spark: SparkSession, dir: String, fromVersion: Long, toVersion: Long,
           keyCols: Seq[String]): DataFrame = {
    val mFrom = manifestAt(dir, fromVersion)
    val mTo = manifestAt(dir, toVersion)
    val changed = (mFrom.buckets.keySet ++ mTo.buckets.keySet)
      .filter(bkt => mFrom.buckets.get(bkt) != mTo.buckets.get(bkt))
      .toSeq.sorted
    def hashed(m: Manifest, tag: String): DataFrame = {
      val full = readManifest(spark, dir, m)
      // partition pruning on the layout column restricts each epoch scan to
      // the changed buckets; the pre-pruned plan reads zero files for an
      // untouched bucket
      val df =
        if (changed.isEmpty) full.where(lit(false))
        else full.where(col(BucketCol).isin(changed.map(Int.box): _*))
      // exclude the layout column: rebucketing (different bucket count)
      // must not read as data change
      val payload = df.columns
        .filterNot(c => keyCols.contains(c) || c == BucketCol).sorted
      df.select(keyCols.map(col) :+
        md5(to_json(struct(payload.map(col).toSeq: _*))).as(s"__h_$tag"): _*)
    }
    val a = hashed(mFrom, "from")
    val b = hashed(mTo, "to")
    a.join(b, keyCols, "full_outer")
      .withColumn("change",
        when(col("__h_from").isNull, lit("added"))
          .when(col("__h_to").isNull, lit("removed"))
          .when(col("__h_from") =!= col("__h_to"), lit("changed")))
      .where(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  private def readBuckets(spark: SparkSession, dir: String, m: Manifest,
                          buckets: Seq[Int]): DataFrame = {
    val want = buckets.toSet
    val perEpoch = m.epochDirs.toSeq.sortBy(_._1).flatMap { case (e, owned) =>
      val keep = owned.filter(want)
      if (keep.isEmpty) None
      else Some(spark.read.option("basePath", s"$dir/e$e")
        .parquet(keep.map(b => s"$dir/e$e/$BucketCol=$b"): _*))
    }
    perEpoch.reduceLeft(_ unionByName _)
  }

  /** Merge a batch into the snapshot, rewriting ONLY the buckets the batch
    * touches: read prunes to the touched-bucket set, merge runs on the
    * pruned slice, the result lands under a new epoch directory, and the
    * manifest flip commits every touched bucket at once — atomically.
    *
    * Serialized per table by [[TableLock]]: a streaming microbatch and a
    * concurrent backfill merging the same table take turns and BOTH land —
    * the manifest is read inside the lock, so the second writer merges onto
    * the first writer's commit instead of colliding with it. */
  def mergeInto(spark: SparkSession, dir: String, batch: DataFrame,
                spec: MergeSpec, keyCol: String, buckets: Int): Unit =
    TableLock.withLock(dir) { mergeIntoLocked(spark, dir, batch, spec, keyCol, buckets) }

  private def mergeIntoLocked(spark: SparkSession, dir: String, batch: DataFrame,
                              spec: MergeSpec, keyCol: String, buckets: Int): Unit = {
    val m = currentManifest(dir).getOrElse(
      sys.error(s"no committed snapshot at $dir — write() first"))
    val bucketed = withBucket(batch, keyCol, buckets)
    val touched = bucketed.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val existing = touched.filter(m.buckets.contains)
    val current =
      if (existing.isEmpty) bucketed.limit(0)
      else readBuckets(spark, dir, m, existing.toSeq)
    val mergeSpec = spec.copy(keyCols = (BucketCol +: spec.keyCols).distinct)
    val merged = Merge.upsert(
      current.select(bucketed.columns.map(col): _*), bucketed, mergeSpec)
    val v = m.version + 1
    merged.write.mode("overwrite").partitionBy(BucketCol).parquet(s"$dir/e$v")
    val landed = bucketsIn(Paths.get(dir, s"e$v"))
    publish(dir, Manifest(v, m.buckets ++ landed.map(_ -> v)))
  }

  /** Compact only when the live-epoch union depth crosses `maxEpochs` —
    * the policy a per-microbatch merge cadence needs: merges stay O(batch)
    * while read fan-out stays bounded, and the full rewrite amortizes over
    * `maxEpochs` batches. Returns true when a compaction ran. */
  def maybeCompact(spark: SparkSession, dir: String, maxEpochs: Int = 8): Boolean =
    currentManifest(dir) match {
      case Some(m) if m.epochDirs.size > maxEpochs => compact(spark, dir); true
      case _ => false
    }

  /** Fold all live epochs into one: a full rewrite that bounds the epoch
    * union depth (run on the reference's retention cadence, not per batch).
    * Takes the [[TableLock]] — compaction is a writer. */
  def compact(spark: SparkSession, dir: String): Unit = TableLock.withLock(dir) {
    val m = currentManifest(dir).getOrElse(return)
    if (m.epochDirs.size <= 1) return
    val v = m.version + 1
    read(spark, dir).write.mode("overwrite")
      .partitionBy(BucketCol).parquet(s"$dir/e$v")
    publish(dir, Manifest(v, bucketsIn(Paths.get(dir, s"e$v")).map(_ -> v).toMap))
  }

  /** Delete epoch directories no manifest-current bucket references —
    * crash orphans and compacted-away history. Safe after the readers of
    * superseded versions have drained (the reference's retention window). */
  /** How many superseded manifest versions [[vacuum]] retains (time-travel
    * / late-reader window; the current version never counts against it). */
  val ManifestRetention = 10

  /** Takes the [[TableLock]]: an in-flight writer's epoch directory (data
    * written, manifest not yet published) would otherwise look orphaned and
    * be reclaimed out from under it. The no-table check stays OUTSIDE the
    * lock — acquiring would create the directory, turning a no-op sweep
    * over removed tables into a directory resurrection. */
  def vacuum(dir: String, retain: Int = ManifestRetention): Seq[String] = {
    if (!Files.isDirectory(Paths.get(dir))) return Seq.empty
    TableLock.withLock(dir) { vacuumLocked(dir, retain) }
  }

  private def vacuumLocked(dir: String, retain: Int): Seq[String] = {
    val current = currentManifest(dir)
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    // 1. Prune superseded manifest files past the retention window first (a
    //    per-microbatch merge cadence would otherwise grow _manifest forever
    //    and slow every currentManifest listing).
    current.foreach { _ =>
      val md = Paths.get(dir, ManifestDir)
      listDir(md)
        .filter(_.getFileName.toString.matches("v\\d{12}\\.json"))
        .sortBy(_.getFileName.toString)
        .dropRight(retain + 1)
        .foreach(Files.delete)
    }
    // 2. Live epochs = everything ANY retained manifest still references —
    //    readAt() must keep working for the whole retention window, not
    //    just the newest version. A version's own epoch stays live even
    //    when it owns no buckets (the schema of a committed empty snapshot).
    val live: Set[Long] = {
      val md = Paths.get(dir, ManifestDir)
      if (!Files.isDirectory(md)) Set.empty
      else listDir(md)
        .filter(_.getFileName.toString.matches("v\\d{12}\\.json"))
        .map(p => parse(new String(Files.readAllBytes(p), "UTF-8")))
        .flatMap(m => m.buckets.values.toSet + m.version)
        .toSet
    }
    val doomed = listDir(root)
      .filter(p => p.getFileName.toString.matches("e\\d+") &&
        !live.contains(p.getFileName.toString.stripPrefix("e").toLong))
    // 3. Reclaim pre-manifest flat-layout bucket dirs orphaned by the
    //    layout upgrade (only once a manifest owns the table).
    val legacy = if (current.isEmpty) Seq.empty
    else listDir(root).filter(_.getFileName.toString.startsWith(s"$BucketCol="))
    (doomed ++ legacy).foreach { p =>
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
    (doomed ++ legacy).map(_.getFileName.toString).sorted
  }
}
