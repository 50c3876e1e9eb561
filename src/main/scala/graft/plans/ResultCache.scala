package graft.plans

import graft.operators.TableLock
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * and no explicit invalidation call to forget. Results land under
  * `cacheDir/<key>` via a temp-dir + atomic-rename publish (concurrent
  * writers of the same key: one rename wins, the loser discards — both
  * computed identical bytes), guarded by the store's advisory
  * [[TableLock]] only around the rename so readers never see a partial
  * result.
  *
  * Scale: the cached artifact is the query RESULT (rollup-sized), not the
  * input; `prune` bounds the directory by entry count (oldest access
  * evicted first). Not a substitute for [[graft.operators.IncrementalAgg]]
  * — that maintains a rollup under appends; this memoizes arbitrary
  * results between changes. */
final class ResultCache(spark: SparkSession, cacheDir: String) {

  Files.createDirectories(Paths.get(cacheDir))

  /** Run (or serve) `df`. `hit`/`miss` counters are exposed for specs and
    * ops visibility. */
  def run(df: DataFrame): DataFrame = {
    val key = fingerprint(df)
    val target = Paths.get(cacheDir, key)
    if (Files.isDirectory(target)) {
      hits += 1
      touch(target)
      spark.read.parquet(target.toString)
    } else {
      misses += 1
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

  /** The version-aware key: canonicalized plan + input file statuses. */
  def fingerprint(df: DataFrame): String = {
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

  /** Keep only the `maxEntries` most recently ACCESSED results. */
  def prune(maxEntries: Int): Unit = TableLock.withLock(cacheDir) {
    import scala.jdk.CollectionConverters._
    val entries = Files.list(Paths.get(cacheDir)).iterator().asScala
      .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
      .toSeq.sortBy(p => Files.getLastModifiedTime(p).toMillis)
    entries.dropRight(maxEntries).foreach(delete)
  }

  private def touch(p: java.nio.file.Path): Unit =
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))

  private def delete(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
    else Files.deleteIfExists(p)
    ()
  }

  @volatile var hits: Long = 0L
  @volatile var misses: Long = 0L
}
