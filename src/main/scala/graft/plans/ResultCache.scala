package graft.plans

import graft.operators.TableLock
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LeafNode
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import java.nio.file.{Files, Paths}

/** Version-aware query RESULT cache: repeated reads of the same query over
  * unchanged data are served from a materialized parquet result instead of
  * re-running the plan — the dashboard/saved-query workload of a shared
  * warehouse, where the same rollup is requested orders of magnitude more
  * often than its inputs change.
  *
  * The cache key is an md5 over
  *  - the CANONICALIZED optimized plan (expression ids normalized by
  *    Catalyst itself, so two sessions building the same query agree), and
  *  - every leaf input file's (path, length, modificationTime).
  * Any data change — a new file, a rewritten bucket, a compaction — moves
  * the key, so a hit can never serve stale rows; there is no TTL to tune
  * and no explicit invalidation call to forget. Queries with a
  * NON-file-backed leaf (local relations, temp views over in-memory data,
  * JDBC) are REFUSED at fingerprint time: their data is invisible to the
  * file-status key (two different local relations even canonicalize to
  * the same plan text), so caching them could serve another query's rows.
  *
  * Results land under `cacheDir/<key>` via a temp-dir + atomic-rename
  * publish (concurrent writers of the same key: one rename wins, the
  * loser discards — both computed identical bytes), guarded by the
  * store's advisory [[TableLock]] only around the rename so readers never
  * see a partial result. Eviction renames the victim OUT of the key
  * space first (atomic disappear), then deletes — a concurrent reader
  * either sees the whole entry or a clean miss/failure, never a silent
  * subset; the residual hazard (a lazy read that resolved the path before
  * an eviction) fails loudly at action time, the same contract as any
  * table dropped mid-query.
  *
  * Scale: the cached artifact is the query RESULT (rollup-sized), not the
  * input; `prune` bounds the directory by entry count (oldest access
  * evicted first). Not a substitute for [[graft.operators.IncrementalAgg]]
  * — that maintains a rollup under appends; this memoizes arbitrary
  * results between changes. */
final class ResultCache(spark: SparkSession, cacheDir: String) {

  Files.createDirectories(Paths.get(cacheDir))

  /** Run (or serve) `df`. `hits`/`misses` counters are exposed for specs
    * and ops visibility. */
  def run(df: DataFrame): DataFrame = {
    val key = fingerprint(df)
    val target = Paths.get(cacheDir, key)
    if (Files.isDirectory(target)) {
      hits.incrementAndGet()
      touch(target)
      spark.read.parquet(target.toString)
    } else {
      misses.incrementAndGet()
      val tmp = Paths.get(cacheDir, s".tmp-$key-${java.util.UUID.randomUUID()}")
      df.write.mode("overwrite").parquet(tmp.toString)
      TableLock.withLock(cacheDir) {
        if (Files.isDirectory(target)) {
          // another writer published the same key first: identical bytes
          // by construction — discard ours
          delete(tmp)
        } else {
          Files.move(tmp, target)
        }
      }
      touch(target)
      spark.read.parquet(target.toString)
    }
  }

  /** The version-aware key: canonicalized plan + input file statuses.
    * Throws for plans with a non-file-backed leaf — see the class doc. */
  def fingerprint(df: DataFrame): String = {
    val nonFile = df.queryExecution.analyzed.collect {
      case l: LeafNode if !l.isInstanceOf[LogicalRelation] => l.nodeName
      case lr: LogicalRelation if !lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.getClass.getSimpleName
    }
    require(nonFile.isEmpty,
      s"ResultCache keys on input FILE statuses; plan has non-file leaves " +
        s"(${nonFile.distinct.mkString(", ")}) whose data the key cannot see " +
        "— caching them could serve stale or foreign rows")
    val plan = df.queryExecution.optimizedPlan.canonicalized.toString
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val inputs = df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(hadoopConf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(plan.getBytes("UTF-8"))
    inputs.foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Keep only the `maxEntries` most recently ACCESSED results. Victims
    * are renamed out of the key space atomically BEFORE deletion. */
  def prune(maxEntries: Int): Unit = TableLock.withLock(cacheDir) {
    val entries = listDir(Paths.get(cacheDir))
      .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
      .sortBy(p => Files.getLastModifiedTime(p).toMillis)
    entries.dropRight(maxEntries).foreach { victim =>
      val hidden = victim.resolveSibling(
        s".evict-${victim.getFileName}-${java.util.UUID.randomUUID()}")
      Files.move(victim, hidden) // atomic disappear from the key space
      delete(hidden)
    }
  }

  /** Files.list with the stream closed (it holds a directory fd). */
  private def listDir(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toList
    } finally s.close()
  }

  private def touch(p: java.nio.file.Path): Unit =
    try Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch {
      // entry evicted between the existence check and the touch: the read
      // will surface it; access-time upkeep must not
      case _: java.nio.file.NoSuchFileException => ()
    }

  private def delete(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val w = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
      } finally w.close()
    } else Files.deleteIfExists(p)
    ()
  }

  val hits = new java.util.concurrent.atomic.AtomicLong(0L)
  val misses = new java.util.concurrent.atomic.AtomicLong(0L)
}
