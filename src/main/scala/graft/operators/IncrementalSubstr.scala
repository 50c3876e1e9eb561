package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incremental EXACT-SUBSTRING span maintenance — the incremental form of
  * q208 (the Lee-et-al suffix-array dedup step), the third member of the
  * incremental family (MinHash signatures: [[IncrementalDedup]]; cluster
  * representatives: [[IncrementalSplit]]). Three persisted stores under
  * one root:
  *
  *  - `wins/round=<rid>/` — the window-count LEDGER: per ingest round,
  *    one partition of (w, n, holder) rows — n occurrences of the 32-char
  *    window `w` in that round's delta, and, when n == 1, the single
  *    delta doc holding it. Append-only across rounds; a round's
  *    partition is OVERWRITTEN under its deterministic round id, so a
  *    crashed round's replay heals rather than double-counts. Global
  *    count = sum(n) over partitions; the global holder of a
  *    count-1 window is the one partial row with n == 1.
  *  - `docs/`  — (doc_id, fp, len): the ingested-document ledger
  *    ([[KeyedStore]]); replayed docs are dropped by fingerprint match,
  *    changed re-ingests are REJECTED (see ingest).
  *  - `asg/`   — (doc_id, n_spans, dup_chars, kept_chars): the per-doc
  *    span report, upserted for recomputed docs only.
  *
  * Per round the work is O(delta + affected docs), never O(corpus): the
  * delta's windows join the ledger RESTRICTED to those windows (one
  * narrow semi-joined scan — the [[IncrementalSplit]] candidate-leg
  * shape); the only documents rescanned are the delta itself plus the
  * HOLDERS of windows whose global count crosses 1 -> 2 in this round.
  *
  * EQUIVALENCE (the q101/q201 gate discipline): after any insert-only
  * ingest sequence, [[report]] equals the batch recompute
  * ([[batchReport]], q208's body) over the full corpus. Why: a doc's
  * span set is a function of the global duplicated-status (count >= 2)
  * of its own windows; insert-only ingest makes counts MONOTONE, so a
  * window's status flips at most once, in exactly the round its second
  * occurrence arrives — and that round's recompute set contains every
  * doc affected by the flip: the arriving docs (always recomputed) and
  * the tracked holder of the first occurrence. A count-1 window has
  * exactly one holder by definition, so holder tracking is complete;
  * windows already at >= 2 change no existing doc's status. q211 gates
  * this against q208's oracle SQL verbatim.
  */
object IncrementalSubstr {

  /** Window length — the single source of truth for the batch queries
    * (q208/q210) and this store. */
  val L = 32

  private def winsDir(root: String) = s"$root/wins"
  private def docsDir(root: String) = s"$root/docs"
  private def asgDir(root: String) = s"$root/asg"
  private def bloomFile(root: String) = s"$root/bloom/filter.bin"

  /** Ledger bucket of a window — the wins partitions are sub-partitioned
    * by it so a probe with few bloom-positive windows prunes its ledger
    * read to matching directories. */
  private val LedgerBuckets = 256
  private def bucketOf(w: org.apache.spark.sql.Column) =
    pmod(xxhash64(w), lit(LedgerBuckets.toLong)).cast("int")

  /** Bloom geometry: fixed at root creation (first ingest), read back on
    * every later round. ~1% false positives up to ~2M distinct windows
    * at the default; past ~50% fill the probe SKIPS the screen (a
    * saturated bloom marks everything "maybe" while still charging its
    * evaluation — measured) and leans on bucket pruning alone. Size up
    * for bigger ledgers; answers are identical at any geometry. */
  private val DefaultBloomBits = 1 << 24
  private val BloomK = 6

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // ------------------------------------------------------------------
  // Batch primitives (q208/q210 delegate here — single source of truth)
  // ------------------------------------------------------------------

  /** Stride-1 char L-gram windows: (doc_id, p, w). `docs` must carry
    * (doc_id, text, len); docs shorter than L contribute none. */
  def windows(docs: DataFrame): DataFrame =
    docs.filter(col("len") >= L)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, len - $L), i -> substring(text, i + 1, $L))")))
      .select(col("doc_id"), col("pos").as("p"), col("col").as("w"))

  /** Maximal duplicated spans (doc_id, s, e), e exclusive, from the
    * covered-position set (doc_id, p). Gaps-and-islands: windows are all
    * length L, so coverage is contiguous exactly while consecutive
    * starts are <= L apart. */
  def spansOfCov(cov: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy("doc_id").orderBy("p")
    cov
      .withColumn("brk",
        when(col("p") - lag("p", 1).over(byPos) > L, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(byPos))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("p").as("s"), (max(col("p")) + lit(L)).as("e"))
  }

  /** Per-doc span report (doc_id, n_spans, dup_chars, kept_chars) for
    * `docs` given their duplicated-window covered set. Docs with no
    * spans report zeros. */
  def reportFor(docs: DataFrame, cov: DataFrame): DataFrame = {
    val perDoc = spansOfCov(cov).groupBy("doc_id")
      .agg(count(lit(1)).as("ns"), sum(col("e") - col("s")).as("dc"))
    docs.select(col("doc_id"), col("len"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ns"), lit(0L)).as("n_spans"),
        coalesce(col("dc"), lit(0L)).as("dup_chars"),
        (col("len") - coalesce(col("dc"), lit(0L))).cast(LongType)
          .as("kept_chars"))
  }

  /** The batch recompute — q208's body. `docs` must carry
    * (doc_id, text, len). */
  def batchReport(docs: DataFrame): DataFrame = {
    val wins = windows(docs)
    val dup = wins.groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("w")
    reportFor(docs, wins.join(dup, Seq("w")).select(col("doc_id"), col("p")))
  }

  // ------------------------------------------------------------------
  // Incremental store
  // ------------------------------------------------------------------

  private val winsSchema = StructType(Seq(
    StructField("w", StringType), StructField("n", LongType),
    StructField("holder", LongType), StructField("round", StringType)))

  /** Explicit read schema (data + partition columns): an all-short-docs
    * round writes ZERO data files under its partitioned dir, and schema
    * inference has nothing to infer from. */
  private val winsFileSchema = StructType(Seq(
    StructField("w", StringType), StructField("n", LongType),
    StructField("holder", LongType),
    StructField("bucket", org.apache.spark.sql.types.IntegerType),
    StructField("round", StringType)))

  private def readWins(spark: SparkSession, root: String): DataFrame =
    if (exists(spark, winsDir(root)))
      spark.read.schema(winsFileSchema).parquet(winsDir(root))
        .select(col("w"), col("n"), col("holder"), col("round").cast(StringType))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], winsSchema)

  // ---- bloom sidecar: the probe's fast-negative path --------------------
  // Correctness invariant: the bloom COVERS every ledger window (no false
  // negatives), maintained by OR-ing the delta's bits in BEFORE the wins
  // partition is written — a crash between the two leaves only extra bits
  // (false positives, safe), and a replay re-ORs idempotently.

  private def readBloom(spark: SparkSession, root: String): Option[(Int, Int, Array[Long])] = {
    val p = new org.apache.hadoop.fs.Path(bloomFile(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = new java.io.DataInputStream(fs.open(p))
    try {
      val m = in.readInt(); val k = in.readInt()
      val bits = new Array[Long](m / 64)
      var i = 0
      while (i < bits.length) { bits(i) = in.readLong(); i += 1 }
      Some((m, k, bits))
    } finally in.close()
  }

  private def writeBloom(spark: SparkSession, root: String,
                         m: Int, k: Int, bits: Array[Long]): Unit = {
    val p = new org.apache.hadoop.fs.Path(bloomFile(root))
    val tmp = new org.apache.hadoop.fs.Path(bloomFile(root) + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(fs.create(tmp, true))
    try {
      out.writeInt(m); out.writeInt(k)
      var i = 0
      while (i < bits.length) { out.writeLong(bits(i)); i += 1 }
    } finally out.close()
    if (fs.exists(p) && !fs.delete(p, false))
      sys.error(s"bloom sidecar: could not replace $p")
    if (!fs.rename(tmp, p))
      sys.error(s"bloom sidecar: rename $tmp -> $p failed")
  }

  /** OR the delta's window bits into the sidecar. Creating the sidecar
    * on a root that ALREADY has ledger rounds (a previously bloom-less
    * root opting in) catches up from the full ledger first — a bloom
    * covering only later rounds would answer false negatives for the
    * earlier ones. */
  private def foldBloom(spark: SparkSession, root: String,
                        deltaWindows: DataFrame, mBits: Int): Unit = {
    val existing = readBloom(spark, root)
    val (m, k, cur) = existing
      .getOrElse((mBits, BloomK, new Array[Long](mBits / 64)))
    if (existing.isEmpty && exists(spark, winsDir(root))) {
      val catchUp = BloomFilter.build(
        readWins(spark, root).select(xxhash64(col("w")).as("h")), m, k)
      var i = 0
      while (i < cur.length) { cur(i) |= catchUp(i); i += 1 }
    }
    val add = BloomFilter.build(
      deltaWindows.select(xxhash64(col("w")).as("h")).distinct(), m, k)
    var i = 0
    while (i < cur.length) { cur(i) |= add(i); i += 1 }
    writeBloom(spark, root, m, k, cur)
  }

  private val asgSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_spans", LongType),
    StructField("dup_chars", LongType), StructField("kept_chars", LongType)))

  /** The maintained per-doc span report over every ingested document
    * (empty before the first ingest — a report, not a path error). */
  def report(spark: SparkSession, root: String): DataFrame = {
    KeyedStore.recover(spark, asgDir(root))
    if (!exists(spark, asgDir(root)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], asgSchema)
    spark.read.parquet(asgDir(root))
      .select(col("doc_id"), col("n_spans"), col("dup_chars"), col("kept_chars"))
  }

  /** ONLINE admission probe: the duplicated-span report of INCOMING
    * documents against the ledger, read-only (nothing mutates — the
    * ingest-or-reject decision happens after). A probe window counts as
    * duplicated iff its ledger count plus its within-probe count
    * reaches 2 — exactly the batch semantics over (store corpus ∪ probe
    * docs) restricted to the probe rows, which is what q212 gates.
    *
    * The ledger leg is three-tier, cheapest first, answers identical:
    *  1. BLOOM fast-negative: probe windows are screened against the
    *     sidecar (no false negatives by the fold-before-write
    *     invariant); a clean document — the common admission case —
    *     short-circuits with ZERO ledger IO.
    *  2. Bucket-pruned scan: when the bloom-positive windows touch few
    *     of the [[LedgerBuckets]] sub-partitions, only those
    *     directories are read (the BandIndex partition-pruning shape).
    *  3. Full semi-joined scan otherwise (dup-heavy probes) — narrow,
    *     the same shape as ingest's transition leg. */
  def probe(spark: SparkSession, root: String, probeDocs: DataFrame): DataFrame = {
    val docs = probeDocs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))
    val wProbe = windows(docs)
    val probeCounts = wProbe.groupBy("w").agg(count(lit(1)).as("n"))
    val ledger = readWins(spark, root)
    // tier 1 — bloom screen, ONLY while the filter is still selective: a
    // ledger far past the sidecar's geometry has most bits set, and a
    // saturated bloom marks every window "maybe" while still charging
    // the screen's evaluation + checkpoint (measured at 100x: a clean
    // probe paid 30 s through a full bloom vs 17.7 s without). The fill
    // gate is a driver-side popcount over the read bits.
    val screened: Option[DataFrame] = readBloom(spark, root) match {
      case Some((m, k, bits)) if exists(spark, winsDir(root)) &&
          bits.map(java.lang.Long.bitCount(_).toLong).sum * 2 < m =>
        import graft.functions.expressions.BloomContains
        Some(probeCounts.select(col("w"))
          .filter(BloomContains.countContained(
            array(xxhash64(col("w"))), bits, m, k) === 1L)
          .localCheckpoint(true)) // pinned: bucket list + semi-join reuse it
      case _ => None
    }
    val maybeW = screened.getOrElse(probeCounts.select(col("w")))
    // tier 2 — bucket pruning works with or WITHOUT the bloom (the probe
    // windows themselves bound the candidate buckets); the bloom just
    // shrinks the set further, down to zero for a clean document
    val buckets = maybeW.select(bucketOf(col("w")).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val ledgerCounts =
      if (buckets.isEmpty)
        probeCounts.limit(0).select(col("w"), col("n")) // fast negative
      else {
        val src =
          if (exists(spark, winsDir(root)) && buckets.length <= LedgerBuckets / 4)
            spark.read.schema(winsFileSchema).parquet(winsDir(root))
              .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
          else ledger
        src.join(maybeW, Seq("w"), "left_semi")
          .groupBy("w").agg(sum(col("n")).as("n"))
      }
    val dupW = probeCounts.unionByName(ledgerCounts)
      .groupBy("w").agg(sum(col("n")).as("nTot"))
      .filter(col("nTot") >= 2).select("w")
    reportFor(docs, wProbe.join(dupW, Seq("w")).select(col("doc_id"), col("p")))
  }

  /** One ingest round. `corpus` must serve (doc_id, text) for every doc
    * the store has ingested (holder texts are fetched on demand for
    * 1 -> 2 transition windows only) plus the delta.
    *
    * INSERT-ONLY by content (the [[IncrementalSplit]] discipline): a
    * delta doc_id already in the ledger with IDENTICAL content is a
    * crashed-round replay and is dropped (the whole round is idempotent:
    * the window partition is overwritten under a deterministic round id,
    * the report fold skips unchanged rows). A delta whose content
    * CHANGED for a stored doc_id is REJECTED before anything mutates —
    * window counts are monotone sums, so superseding content would leave
    * phantom counts the equivalence guarantee cannot survive. Re-ingest
    * under a new doc_id, or rebuild the root.
    *
    * With `maintainBloom = true` (or once the root HAS a bloom — the
    * sidecar, once created, is folded by EVERY subsequent ingest, or its
    * no-false-negatives invariant would break) the probe's fast-negative
    * tier stays available. A refresh-only root (q211's shape: ingest +
    * report, never probed) passes false and skips the per-round fold.
    *
    * Serialized on the root's writer lock: transitions are detected
    * against ONE ledger state and the same state is extended. */
  def ingest(spark: SparkSession, root: String, corpus: DataFrame,
             delta: DataFrame, maintainBloom: Boolean = true): Unit =
    TableLock.withLock(root) {
      ingestLocked(spark, root, corpus, delta, maintainBloom)
    }

  private def ingestLocked(spark: SparkSession, root: String,
                           corpus: DataFrame, delta: DataFrame,
                           maintainBloom: Boolean): Unit = {
    val d0 = delta.select(col("doc_id"), col("text"),
      length(col("text")).as("len"), md5(col("text")).as("fp"))
    // a delta carrying one doc_id with TWO different texts is ambiguous
    // in the same way a changed re-ingest is — reject, don't pick
    val dupIds = d0.groupBy("doc_id")
      .agg(countDistinct(col("fp")).as("nf")).filter(col("nf") > 1)
      .select(col("doc_id")).limit(3).collect().map(_.getLong(0))
    if (dupIds.nonEmpty)
      sys.error(s"IncrementalSubstr.ingest at $root: delta carries doc_ids " +
        s"with conflicting texts (e.g. ${dupIds.mkString(", ")})")
    val dd = d0.dropDuplicates("doc_id")
    val ledger =
      if (exists(spark, docsDir(root))) {
        KeyedStore.recover(spark, docsDir(root))
        spark.read.parquet(docsDir(root))
      } else dd.select(col("doc_id"), col("fp"), col("len")).limit(0)
    val classified = dd
      .join(ledger.select(col("doc_id"), col("fp").as("__fp_cur")),
        Seq("doc_id"), "left")
    val changed = classified
      .filter(col("__fp_cur").isNotNull && col("__fp_cur") =!= col("fp"))
      .select(col("doc_id")).limit(3).collect().map(_.getLong(0))
    if (changed.nonEmpty)
      sys.error(s"IncrementalSubstr.ingest at $root: delta re-ingests stored " +
        s"doc_ids with CHANGED content (e.g. ${changed.mkString(", ")}); window " +
        "counts are monotone, so superseding content would break the " +
        "batch-equivalence guarantee. Ingest changed documents under a new " +
        "doc_id, or rebuild the root.")
    // replays (identical content) drop out; what remains is genuinely new
    val fresh = classified.filter(col("__fp_cur").isNull)
      .select(col("doc_id"), col("text"), col("len"), col("fp"))
      .localCheckpoint(true)
    if (fresh.isEmpty) return
    // deterministic round id: a replay of the same delta lands on the
    // same wins partition and overwrites it (idempotent), never appends
    val rid = "r" + java.lang.Long.toHexString(
      fresh.agg(expr("bit_xor(xxhash64(doc_id, fp))")).head().getLong(0))

    // bloom first (see the sidecar invariant above): a crash between the
    // bloom fold and the wins write leaves only extra bits — safe; the
    // reverse order could leave ledger windows the probe's fast-negative
    // would wrongly clear. An existing sidecar is ALWAYS folded (a
    // skipped round would plant false negatives); a bloom-less root only
    // starts one when asked.
    if (maintainBloom || readBloom(spark, root).isDefined)
      foldBloom(spark, root, windows(fresh), DefaultBloomBits)
    // write the round partition FIRST and read it back as the delta-count
    // materialization: a first-ingest delta is corpus-sized, so pinning
    // these counts on the heap (localCheckpoint) OOMs at scale — parquet
    // is the spill. Writing before transition detection is safe because
    // the pre-count read EXCLUDES this round's partition (which also
    // makes it replay-stable: a crashed attempt's rows never inflate
    // pre-counts). Sub-partitioned by window bucket (repartitioned by it
    // first — the BandIndex small-files lesson) so a probe with few
    // bloom-positive windows prunes its read to matching directories.
    windows(fresh).groupBy("w").agg(
      count(lit(1)).as("n"),
      when(count(lit(1)) === 1, max(col("doc_id"))).as("holder"))
      .withColumn("bucket", bucketOf(col("w")))
      .repartition(col("bucket"))
      .write.partitionBy("bucket")
      .mode(SaveMode.Overwrite).parquet(s"${winsDir(root)}/round=$rid")
    val dCounts = spark.read
      .schema(StructType(winsFileSchema.filterNot(_.name == "round")))
      .parquet(s"${winsDir(root)}/round=$rid")

    // 1 -> 2 transitions: ledger windows at global count EXACTLY 1 that
    // the delta touches (any delta occurrence pushes them to >= 2). Their
    // single holders are the only STORED docs whose spans can change this
    // round. The scan is semi-join-restricted to the delta's windows —
    // narrow, the IncrementalSplit candidate-leg shape.
    val pre = readWins(spark, root).filter(col("round") =!= lit(rid))
      .join(dCounts.select("w"), Seq("w"), "left_semi")
      .groupBy("w").agg(sum(col("n")).as("nStore"), max(col("holder")).as("h"))
    val transHolders = pre.filter(col("nStore") === 1)
      .select(col("h").as("doc_id")).distinct()
      .localCheckpoint(true) // driver-small; pin before downstream reads

    // recompute set: the delta + transition holders (disjoint: holders
    // are stored ids, fresh ids are ledger-absent). Holder text comes
    // from the corpus (the ingest contract).
    val holderDocs = corpus.join(transHolders, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    val redo = fresh.select(col("doc_id"), col("text"), col("len"))
      .unionByName(holderDocs)
      .localCheckpoint(true)
    val wRedo = windows(redo)
    // duplicated-status for the recompute docs' windows, from the FULL
    // ledger (this round included) restricted to those windows
    val dupW = readWins(spark, root)
      .join(wRedo.select("w").distinct(), Seq("w"), "left_semi")
      .groupBy("w").agg(sum(col("n")).as("nTot"))
      .filter(col("nTot") >= 2).select("w")
    val rep = reportFor(redo, wRedo.join(dupW, Seq("w"))
      .select(col("doc_id"), col("p")))
      .localCheckpoint(true) // pin before asg mutates under the lineage
    if (exists(spark, asgDir(root)))
      KeyedStore.fold(spark, asgDir(root), rep, "doc_id")
    else rep.write.parquet(asgDir(root))
    // the docs ledger is the round's COMMIT point: written last, so any
    // crash above replays the whole round idempotently
    val docRows = fresh.select(col("doc_id"), col("fp"), col("len"))
    if (exists(spark, docsDir(root)))
      KeyedStore.fold(spark, docsDir(root), docRows, "doc_id")
    else docRows.write.parquet(docsDir(root))
  }
}
