package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Latest-content-wins fold for a keyed parquet store — the shared store
  * discipline of the incremental operators (IncrementalDedup's signature
  * store, IvfIncremental's code store). One store-scanning join classifies
  * the delta:
  *
  *  - key absent from the store          -> APPEND (the normal new row);
  *  - key present, value columns equal   -> SKIP (a crashed attempt's
  *    replay must not duplicate rows);
  *  - key present, any value changed     -> the store is REWRITTEN with
  *    the delta's rows replacing the stale ones (re-ingested content must
  *    supersede — a stale sketch describes no live content).
  *
  * The common no-reingest round therefore stays an O(delta) append over
  * one store scan; only a round carrying changed re-ingests pays the
  * O(store) rewrite. The rewrite goes through a sibling dir + rename,
  * never an in-place overwrite: the sibling is built from parent + leaf
  * name (a trailing slash cannot turn it into a hidden CHILD of the store
  * that the swap's recursive delete would destroy), every delete/rename
  * return is checked, and `recover` heals the delete-before-rename crash
  * window on the next round's read. Value comparison is null-safe
  * (`<=>`), so a legitimately-null column neither blocks the skip nor
  * forces a rewrite.
  */
object KeyedStore {

  /** Fold `delta` into the store at `storeDir` (which must exist — callers
    * initialize with a plain overwrite write). `delta` must carry exactly
    * the store's schema; `key` identifies rows. The store holds at most one
    * row per key (the operators' store invariant); a delta that carries the
    * same key twice (within-batch redelivery) is collapsed to ONE row here,
    * content-deterministically, BEFORE the fold — without this, both copies
    * would read as store-absent and both append, permanently double-keying
    * the store. The winner is the row with the greatest content hash
    * (map-typed columns enter as to_json, the Merge.dedupLastWins rule):
    * arbitrary but replay-stable, matching the streaming path's
    * within-batch determinism. */
  def fold(spark: SparkSession, storeDir: String, delta: DataFrame,
           key: String): Unit = {
    recover(spark, storeDir)
    val store = spark.read.parquet(storeDir)
    val valueCols = delta.columns.filterNot(_ == key).toSeq
    val tiebreak = delta.schema.fields.toSeq.sortBy(_.name).map { f =>
      if (Merge.containsMapType(f.dataType)) to_json(col(f.name)) else col(f.name)
    }
    val oneRowPerKey = delta
      .withColumn("__ks_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(key))
          .orderBy(xxhash64(tiebreak: _*).desc)))
      .filter(col("__ks_rn") === 1).drop("__ks_rn")
    val cur = store.select(
      col(key) +: lit(true).as("__in_store") +:
        valueCols.map(c => col(c).as(s"__cur_$c")): _*)
    // ONE store-scanning join feeds the changed? flag, the append set AND
    // the rewrite's replacement rows (its output is delta-sized, pinned by
    // the checkpoint — the delta lineage runs exactly once). LAZY pin: the
    // changed probe right below is the fold's first action and
    // materializes it in the same job — the eager variant paid a
    // dedicated checkpoint job per fold, and folds run twice per
    // lifecycle ingest round (r13-verdict item 1: job count is the
    // lifecycle operators' bill).
    val folded = oneRowPerKey.join(cur, Seq(key), "left").localCheckpoint(eager = false)
    val unchanged = valueCols.map(c => col(c) <=> col(s"__cur_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val anyChanged = !folded
      .filter(coalesce(col("__in_store"), lit(false)) && !unchanged).isEmpty
    if (!anyChanged) {
      folded.filter(col("__in_store").isNull)
        .select(key, valueCols: _*)
        .write.mode(SaveMode.Append).parquet(storeDir)
    } else {
      // both legs come from the checkpointed join result, not the delta
      // lineage — an expensive delta (e.g. IVF centroid assignment) is
      // never recomputed for the rewrite
      rewriteSwap(spark, storeDir) { tmp =>
        store.join(folded.select(col(key)), Seq(key), "left_anti")
          .unionByName(folded.select(col(key) +: valueCols.map(col): _*))
          .write.mode(SaveMode.Overwrite).parquet(tmp)
      }
    }
  }

  /** Crash-recoverable whole-store rewrite — the shared swap primitive of
    * the keyed-store family (fold's supersede path, DedupStream's store
    * compaction). `write` builds the replacement at the `.rewrite` sibling
    * path it is handed; the swap then deletes the live store and renames
    * the sibling in. A crash between the delete and the rename leaves only
    * the completed sibling, which [[recover]] promotes on the next call —
    * every store entry point must call recover (or this) before reading.
    * Single-writer discipline: callers serialize via the store's writer
    * lock (TableLock); two concurrent swaps on one dir are not arbitrated
    * here. POSIX/HDFS rename atomicity assumed (see SCALE.md). */
  def rewriteSwap(spark: SparkSession, storeDir: String)(write: String => Unit): Unit = {
    recover(spark, storeDir)
    val cur = storePath(storeDir)
    val tmp = rewritePath(storeDir)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireAtomicRename(fs.getScheme, storeDir)
    write(tmp.toString)
    if (!fs.delete(cur, true))
      sys.error(s"store rewrite: could not delete $cur (rewrite intact at $tmp)")
    if (!fs.rename(tmp, cur)) {
      // benign race: a lock-free reader (BandIndex.probe) that observed the
      // delete-before-rename window may have already PROMOTED the completed
      // rewrite — the store is the new content either way
      if (fs.exists(cur) && !fs.exists(tmp)) ()
      else sys.error(s"store rewrite: rename $tmp -> $cur failed; " +
        "recover will promote the rewrite on the next round")
    }
  }

  private def storePath(storeDir: String) =
    new org.apache.hadoop.fs.Path(storeDir)
  private def rewritePath(storeDir: String) = {
    val cur = storePath(storeDir) // Path normalization strips trailing '/'
    new org.apache.hadoop.fs.Path(cur.getParent, cur.getName + ".rewrite")
  }

  /** Filesystem schemes whose directory rename is a non-atomic copy+delete
    * (or whose create has no exclusive mode) — the swap's correctness
    * assumptions do not hold there. */
  private val NonAtomicRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "swift", "oss", "cos")

  /** The swap discipline assumes POSIX/HDFS-style atomic directory rename.
    * Object stores fake rename as copy+delete: a reader racing the swap
    * sees a partial store and a crash mid-"rename" loses the invariant
    * recover() relies on (at most one of {store, rewrite} complete). Fail
    * loudly instead of corrupting silently; on such storage, keep stores in
    * a PartitionedStore table — its versioned-manifest pointer-flip commits
    * through a single small-file write and needs no rename. */
  private[operators] def requireAtomicRename(scheme: String, dir: String): Unit =
    if (NonAtomicRenameSchemes.contains(Option(scheme).getOrElse("").toLowerCase))
      sys.error(s"KeyedStore at $dir: filesystem scheme '$scheme' has no " +
        "atomic directory rename; the .rewrite swap is unsafe here. Use a " +
        "PartitionedStore (manifest pointer-flip) for object-store-backed " +
        "state, or point the store at HDFS/POSIX storage.")

  /** Heal a crash between a rewrite's delete and rename: if the store dir
    * is gone but a completed `.rewrite` sibling exists, promote it. A
    * `.rewrite` left beside a LIVE store (crash before the delete) is
    * stale and removed — the next changed round rebuilds it. */
  def recover(spark: SparkSession, storeDir: String): Unit = {
    val cur = storePath(storeDir)
    val tmp = rewritePath(storeDir)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) {
      if (!fs.exists(cur)) {
        // two lock-free readers can race this promotion — losing the
        // rename is fine as long as SOMEONE promoted the rewrite
        if (!fs.rename(tmp, cur) && !(fs.exists(cur) && !fs.exists(tmp)))
          sys.error(s"store recovery: rename $tmp -> $cur failed")
      } else if (!fs.delete(tmp, true) && fs.exists(tmp))
        sys.error(s"store recovery: could not clear stale $tmp")
    }
  }
}
