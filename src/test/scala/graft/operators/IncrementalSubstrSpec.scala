package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental exact-substring spans vs the persisted window-count
  * ledger: batch equivalence after multi-round ingest (including the
  * 1 -> 2 count-transition recompute of a STORED holder), replay
  * idempotency at the ledger level, and the changed-re-ingest rejection
  * that protects the monotone-count guarantee. */
class IncrementalSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def root(): String =
    java.nio.file.Files.createTempDirectory("incsubstr-spec").toString

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def withLen(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text"), length(col("text")).as("len"))

  private def sortedReport(d: DataFrame): Seq[(Long, Long, Long, Long)] =
    d.select(col("doc_id"), col("n_spans"), col("dup_chars"), col("kept_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  // 40-char span shared between docs 1 and 20 — ingested in DIFFERENT
  // rounds, so round 2 must reach back and recompute doc 1 (the holder)
  private val S = "the quick brown fox jumps over the dogsx"
  private val corpus = Seq(
    1L -> s"aaaa bbbb cccc $S dddd eeee ffff",
    2L -> "totally unique content with nothing shared anywhere at all",
    20L -> s"gggg hhhh iiii jjjj $S kkkk llll",
    21L -> "another fully unique document that repeats no substring")

  test("1 -> 2 transition recomputes the stored holder; report == batch") {
    val r = root()
    val all = df(corpus)
    IncrementalSubstr.ingest(spark, r, all, df(corpus.take(2)))
    // after round 1 nothing is duplicated — doc 1 must report zero spans
    val afterR1 = sortedReport(IncrementalSubstr.report(spark, r))
    assert(afterR1 == Seq((1L, 0L, 0L, corpus(0)._2.length.toLong),
      (2L, 0L, 0L, corpus(1)._2.length.toLong)))
    // round 2 brings the second occurrence of S: doc 1's window counts
    // cross 1 -> 2 and its report must be REWRITTEN, not just doc 20's.
    // route FORCED to refresh: the transition/holder machinery is what
    // this test pins (auto would pick recompute on a ledger this small)
    IncrementalSubstr.ingest(spark, r, all, df(corpus.drop(2)), route = "refresh")
    val got = sortedReport(IncrementalSubstr.report(spark, r))
    val want = sortedReport(IncrementalSubstr.batchReport(withLen(all)))
    assert(got == want, s"incremental $got != batch $want")
    assert(got.find(_._1 == 1L).get._2 == 1L,
      "the holder's span must appear after the transition round")
  }

  test("multi-round ingest equals batch on the real corpus — BOTH routes") {
    // the refresh/recompute router's force flags, gated equal the
    // IncrementalSplit way: same rounds, same corpus, identical reports
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val want = sortedReport(IncrementalSubstr.batchReport(withLen(docs)))
    Seq("refresh", "recompute").foreach { route =>
      val r = root()
      Seq(1L, 2L, 0L).foreach { k =>
        IncrementalSubstr.ingest(spark, r, docs,
          docs.filter(pmod(col("doc_id"), lit(3L)) === k), route = route)
      }
      val got = sortedReport(IncrementalSubstr.report(spark, r))
      assert(got == want, s"route=$route diverged from batch")
    }
  }

  test("report routing picks by ledger/delta bytes (the measured bracket)") {
    // small ledger (the 1x sidecar point, 27 MB): recompute wins/ties
    assert(IncrementalSubstr.routeFor(ledgerBytes = 27L << 20,
      deltaBytes = 1L << 20) == "recompute")
    // the 10x point (250 MB ledger, 500-doc delta): refresh wins 2x —
    // measured from identical pre-states, BENCH_sf1_substr_inc.json
    assert(IncrementalSubstr.routeFor(ledgerBytes = 250L << 20,
      deltaBytes = 3L << 20) == "refresh")
    // the 100x point (2.5 GB): refresh
    assert(IncrementalSubstr.routeFor(ledgerBytes = 5L << 29,
      deltaBytes = 3L << 20) == "refresh")
    // corpus-scale delta (>= 1/4 of the ledger by bytes) against a big
    // ledger: transitions touch most holders anyway — recompute
    assert(IncrementalSubstr.routeFor(ledgerBytes = 5L << 29,
      deltaBytes = 1L << 30) == "recompute")
  }

  test("replay of a delta is idempotent: same report, no double counts") {
    val r = root()
    val all = df(corpus)
    IncrementalSubstr.ingest(spark, r, all, df(corpus.take(2)))
    IncrementalSubstr.ingest(spark, r, all, df(corpus.drop(2)))
    val before = sortedReport(IncrementalSubstr.report(spark, r))
    // full-delta replay (crashed-round redelivery): every doc_id already
    // ledgered with identical content — dropped, nothing mutates
    IncrementalSubstr.ingest(spark, r, all, df(corpus.drop(2)))
    IncrementalSubstr.ingest(spark, r, all, df(corpus))
    val after = sortedReport(IncrementalSubstr.report(spark, r))
    assert(after == before)
    // window ledger did not double-count: a doubled count would flip a
    // count-1 window to "duplicated" and surface phantom spans on docs
    // 2/21 — but assert the ledger directly too
    val winTotals = spark.read.parquet(s"$r/wins")
      .groupBy("w").agg(sum("n").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(winTotals <= 2L, s"replay inflated a window count to $winTotals")
  }

  test("changed re-ingest is rejected before anything mutates") {
    val r = root()
    val all = df(corpus)
    IncrementalSubstr.ingest(spark, r, all, df(corpus.take(2)))
    val before = sortedReport(IncrementalSubstr.report(spark, r))
    val ex = intercept[RuntimeException] {
      IncrementalSubstr.ingest(spark, r, all,
        df(Seq(1L -> "entirely different replacement text for doc one")))
    }
    assert(ex.getMessage.contains("CHANGED content"))
    assert(sortedReport(IncrementalSubstr.report(spark, r)) == before)
  }

  test("conflicting texts for one doc_id inside a delta are rejected") {
    val r = root()
    val ex = intercept[RuntimeException] {
      IncrementalSubstr.ingest(spark, r, df(corpus),
        df(Seq(5L -> "text one", 5L -> "text two")))
    }
    assert(ex.getMessage.contains("conflicting texts"))
  }

  test("probe is read-only and equals the batch restriction") {
    val r = root()
    val store = df(corpus.take(2))   // holds one copy of S (doc 1)
    IncrementalSubstr.ingest(spark, r, store, store)
    val winsBefore = spark.read.parquet(s"$r/wins").count()
    val probeDocs = df(corpus.drop(2)) // doc 20 carries the second S copy
    val got = IncrementalSubstr.probe(spark, r, probeDocs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._1).toSeq
    // batch over store ∪ probe, restricted to the probe rows
    val want = sortedReport(IncrementalSubstr.batchReport(withLen(df(corpus))))
      .filter(t => t._1 == 20L || t._1 == 21L)
    assert(got == want, s"probe $got != batch restriction $want")
    assert(got.find(_._1 == 20L).get._2 == 1L,
      "the probe doc sharing S with the store must report its span")
    // read-only: no ledger growth, no report change
    assert(spark.read.parquet(s"$r/wins").count() == winsBefore)
    assert(sortedReport(IncrementalSubstr.report(spark, r)).map(_._1) ==
      Seq(1L, 2L))
  }

  test("probe tiers: clean doc = zero ledger IO; dup doc = bucket-pruned") {
    import graft.plans.QueryMetrics
    val r = root()
    val store = df(corpus.take(2))
    // explicit FINE width: this test gates the admission-root pruning
    // claim, which needs enough buckets that a shared span's ~9 boundary
    // windows stay a small bucket fraction; the delta-sized default
    // correctly picks a coarse width for a KB-scale store (where a full
    // scan is the cheaper plan) and grows to 4096 at warehouse scale
    IncrementalSubstr.ingest(spark, r, store, store, buckets = 256)
    val ledgerRecords = spark.read.parquet(s"$r/wins").count()
    // tier 1 — bloom fast-negative: a document sharing nothing with the
    // store must not read the ledger at all (the common admission case)
    val clean = df(Seq(50L ->
      "a perfectly clean document sharing zero windows with store xyzq"))
    val (cleanOut, m1) = QueryMetrics.measureAction(spark) {
      IncrementalSubstr.probe(spark, r, clean).collect()
    }
    assert(cleanOut.map(_.getLong(1)).sum == 0L)
    // the probe reads its own doc rows, never ledger parquet: every
    // ledger record read would show up here
    assert(m1.inputRecords < ledgerRecords,
      s"clean probe read ${m1.inputRecords} records (ledger=$ledgerRecords)")
    // tier 2 — a doc sharing exactly S probes bloom-positive windows
    // only: the pruned scan must read a strict subset of the ledger
    val dup = df(Seq(60L -> s"zz $S yy"))
    val (dupOut, m2) = QueryMetrics.measureAction(spark) {
      IncrementalSubstr.probe(spark, r, dup).collect()
    }
    assert(dupOut.head.getLong(1) == 1L, "the shared span must be reported")
    assert(m2.inputRecords < ledgerRecords,
      s"dup probe read ${m2.inputRecords} of $ledgerRecords ledger records — pruning lost")
  }

  test("bucket geometry persists at creation; later params are ignored") {
    val r = root()
    val all = df(corpus)
    // created coarse: the width is persisted under meta/buckets and every
    // later round lays its partition out under THAT width, or the probe's
    // pruning math would read the wrong directories
    IncrementalSubstr.ingest(spark, r, all, df(corpus.take(2)), buckets = 8)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$r/meta/buckets")).trim == "8")
    // a later round asking for a different width is ignored, not honored
    IncrementalSubstr.ingest(spark, r, all, df(corpus.drop(2)), buckets = 512)
    val dirs = new java.io.File(s"$r/wins").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getName)
      .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt)
    assert(dirs.nonEmpty && dirs.forall(b => b >= 0 && b < 8),
      s"round partitions must use the persisted width 8, saw ${dirs.distinct.sorted.toSeq}")
    // the probe prunes under the persisted width and still answers exactly
    val got = IncrementalSubstr.probe(spark, r, df(Seq(70L -> s"pp $S qq")))
      .collect()
    assert(got.head.getAs[Long]("n_spans") == 1L)
  }

  test("bloom opt-in mid-life catches up: no false negatives for old rounds") {
    val r = root()
    val all = df(corpus)
    // round 1 bloom-less (refresh-only shape), round 2 opts in: the
    // sidecar must cover round 1's windows or a probe sharing S with
    // doc 1 would fast-negative its way past the ledger
    IncrementalSubstr.ingest(spark, r, all, df(corpus.take(2)), maintainBloom = false)
    IncrementalSubstr.ingest(spark, r, all, df(Seq(21L -> corpus(3)._2)))
    val probeDoc = df(Seq(70L -> s"pp $S qq"))
    val got = IncrementalSubstr.probe(spark, r, probeDoc).collect()
    assert(got.head.getAs[Long]("n_spans") == 1L,
      "probe must find the span stored in the pre-bloom round")
  }

  private def bloomHeader(r: String): (Int, Long, Long) = {
    val in = new java.io.DataInputStream(
      java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(s"$r/bloom/filter.bin")))
    try {
      assert(in.readInt() == -2, "sidecar must be v2")
      (in.readInt(), in.readLong(), in.readLong()) // (k, mBits, nKeys)
    } finally in.close()
  }

  test("bloom sidecar resizes with the ledger; no false negatives across rebuild") {
    val r = root()
    // round 1: tiny — the sidecar starts at the floor geometry
    val r1 = df(corpus.take(2))
    IncrementalSubstr.ingest(spark, r, r1, r1)
    val (_, m1, n1) = bloomHeader(r)
    assert(n1 > 0)
    // round 2: enough fresh windows that bloomBitsFor(n) outruns m1 —
    // the fold must REBUILD at a larger geometry, still covering round 1
    val big = (0 until 40).map { i =>
      (1000L + i) -> (s"doc $i " + (0 until 12).map(j => s"tok${i}x$j").mkString(" ") +
        " filler material keeps windows unique and plentiful here")
    }
    val all = df(corpus.take(2) ++ big)
    IncrementalSubstr.ingest(spark, r, all, df(big))
    val (_, m2, n2) = bloomHeader(r)
    assert(m2 > m1, s"sidecar must grow: $m1 -> $m2 (nKeys $n1 -> $n2)")
    assert(n2 > n1)
    // a probe sharing S (stored in the PRE-resize round) must still hit:
    // the rebuild covers every visible ledger window or tier 1 would
    // fast-negative its way past the stored span
    val got = IncrementalSubstr.probe(spark, r, df(Seq(70L -> s"pp $S qq")))
      .collect()
    assert(got.head.getAs[Long]("n_spans") == 1L,
      "probe must find the span stored before the sidecar resize")
  }

  test("a pre-v2 sidecar file is superseded by the next fold, not trusted") {
    val r = root()
    val r1 = df(corpus.take(2))
    IncrementalSubstr.ingest(spark, r, r1, r1)
    // overwrite the sidecar with a legacy-format file (Int m, Int k, bits)
    // whose bits are all zero — if any path TRUSTED it, the stored span
    // would fast-negative away; v2 readers must treat it as absent
    val m = 1 << 14
    val out = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(s"$r/bloom/filter.bin")))
    try {
      out.writeInt(m); out.writeInt(6)
      (0 until m / 64).foreach(_ => out.writeLong(0L))
    } finally out.close()
    // the raw overwrite bypassed Hadoop's checksum sidecar — drop it so
    // the read path sees the legacy bytes, not a ChecksumException
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$r/bloom/.filter.bin.crc"))
    // probe before any fold: tier 1 unavailable, answer still exact
    val probeDoc = df(Seq(70L -> s"pp $S qq"))
    assert(IncrementalSubstr.probe(spark, r, probeDoc).collect()
      .head.getAs[Long]("n_spans") == 1L)
    // next ingest rebuilds v2 from the full ledger (the legacy file's
    // presence alone must trigger the fold even without maintainBloom)
    val all = df(corpus)
    IncrementalSubstr.ingest(spark, r, all, df(corpus.drop(2)), maintainBloom = false)
    val (_, _, nKeys) = bloomHeader(r)
    assert(nKeys > 0)
    assert(IncrementalSubstr.probe(spark, r, probeDoc).collect()
      .head.getAs[Long]("n_spans") == 1L)
  }

  test("empty delta is a graceful no-op, not an NPE") {
    val r = root()
    val all = df(corpus)
    IncrementalSubstr.ingest(spark, r, all, df(corpus.take(2)))
    val before = sortedReport(IncrementalSubstr.report(spark, r))
    // a caller filter matching no rows: zero-row delta both before the
    // first ingest on a fresh root and against an existing one
    IncrementalSubstr.ingest(spark, r, all, df(corpus).filter(col("doc_id") < 0))
    assert(sortedReport(IncrementalSubstr.report(spark, r)) == before)
    val fresh = root()
    IncrementalSubstr.ingest(spark, fresh, all, df(corpus).limit(0))
    assert(sortedReport(IncrementalSubstr.report(spark, fresh)).isEmpty)
  }

  test("meta-less root with existing rounds pins the legacy default width") {
    val r = root()
    val all = df(corpus)
    // a root written before the persisted-geometry change: rounds exist,
    // meta/buckets does not (simulated by deleting it)
    IncrementalSubstr.ingest(spark, r, all, df(corpus.take(2)))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$r/meta/buckets"))
    // the next ingest must IGNORE its create param (the old rounds are
    // laid out at DefaultBuckets) and persist the legacy width, or every
    // later prune reads the wrong bucket= directories
    IncrementalSubstr.ingest(spark, r, all, df(corpus.drop(2)), buckets = 8)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$r/meta/buckets")).trim ==
      IncrementalSubstr.DefaultBuckets.toString)
    val got = IncrementalSubstr.probe(spark, r, df(Seq(70L -> s"pp $S qq")))
      .collect()
    assert(got.head.getAs[Long]("n_spans") == 1L,
      "probe under the healed geometry must still find the stored span")
  }

  test("docs shorter than the window length report zeros") {
    val r = root()
    val tiny = df(Seq(7L -> "short", 8L -> "also short"))
    IncrementalSubstr.ingest(spark, r, tiny, tiny)
    assert(sortedReport(IncrementalSubstr.report(spark, r)) ==
      Seq((7L, 0L, 0L, 5L), (8L, 0L, 0L, 10L)))
  }
}
