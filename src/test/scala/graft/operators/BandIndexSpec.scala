package graft.operators

import graft.SparkSpec
import graft.plans.QueryMetrics
import org.apache.spark.sql.DataFrame

/** The band-partitioned index must return EXACTLY the batch LSH
  * candidates touching the probe docs, while reading only the probe
  * bands' bucket partitions — the online admission-check path. */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  /** IncrementalDedupSpec's corpus geometry: docs sharing i/10 are
    * near-dups (i%10 < 3); i%10 >= 3 rows are globally distinct. */
  private def doc(i: Long): (Long, String) = {
    val words = "the quick brown fox jumps over a lazy dog near the river bank today"
    if (i % 10 < 3) {
      val salted = words.split(' ').map(w => s"${w}g${i / 10}").mkString(" ")
      (i, s"$salted tail${i % 10}")
    } else
      (i, words.split(' ').zipWithIndex.map { case (w, j) => s"$w u${i}x$j" }.mkString(" "))
  }

  private def docs(ids: Seq[Long]): DataFrame = ids.map(doc).toDF("doc_id", "text")

  /** 60 two-member near-dup groups + 40 globally-distinct rows. */
  private val storeIds: Seq[Long] =
    (0 until 60).flatMap(g => Seq(g * 10L, g * 10L + 1L)) ++
      (0 until 40).map(i => 2000L + i * 10L + 5L)

  test("probe equals the batch LSH candidates touching the probe docs") {
    val dir = java.nio.file.Files.createTempDirectory("bandidx").toString + "/idx"
    val storeSigs = IncrementalDedup.signatures(docs(storeIds)).cache()
    BandIndex.build(spark, dir, storeSigs)
    // 42: unstored member of stored group 4; 40: STORED (self must drop);
    // 9995: globally distinct (no candidates)
    val probeIdSet = Set(42L, 40L, 9995L)
    val probeSigs = IncrementalDedup.signatures(docs(probeIdSet.toSeq))
    val got = BandIndex.probe(spark, dir, probeSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the batch candidate pairs touching the probes,
    // re-oriented to (probe, stored) and restricted to indexed docs
    val expected = IncrementalDedup.candidatePairs(storeSigs, probeSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (q, c) => probeIdSet.contains(q) && storeIds.contains(c) }
      .toSet
    assert(got == expected, s"got $got expected $expected")
    assert(got.contains((42L, 40L)) && got.contains((42L, 41L)),
      "the stored near-dup group must surface")
    assert(!got.exists { case (q, c) => q == c }, "self-matches must drop")
    assert(!got.exists(_._1 == 9995L), "a distinct doc has no candidates")
    storeSigs.unpersist()
  }

  test("probe reads a pruned slice of the index, not the whole store") {
    val dir = java.nio.file.Files.createTempDirectory("bandidx2").toString + "/idx"
    // explicit width: this test gates the pruning claim, which needs a
    // one-doc probe's <= 4 band buckets to be a small slice at spec
    // scale; the default sig-count geometry correctly picks a coarse
    // width for a 160-doc index
    BandIndex.build(spark, dir, IncrementalDedup.signatures(docs(storeIds)),
      buckets = 64)
    val fullRecords = spark.read.parquet(dir).count()
    val probeSigs = IncrementalDedup.signatures(docs(Seq(41L)))
    val (_, m) = QueryMetrics.measureAction(spark) {
      BandIndex.probe(spark, dir, probeSigs).count()
    }
    // one doc touches <= LshBands (4) buckets of 64; the metric also
    // counts the tiny probe-side reads, so bound loosely at half
    assert(m.inputRecords < fullRecords / 2,
      s"probe read ${m.inputRecords} of $fullRecords index records — pruning lost")
  }

  test("probing a not-yet-built index answers empty, not a path error") {
    val dir = java.nio.file.Files.createTempDirectory("bandidx4").toString + "/idx"
    val out = BandIndex.probe(spark, dir, IncrementalDedup.signatures(docs(Seq(40L))))
    assert(out.columns.toSeq == Seq("q_id", "cand_id") && out.count() == 0)
  }

  test("replayed appends bloat the index; compact restores the fresh build") {
    val ids = Seq(70L, 71L, 72L, 85L)
    val sigs = IncrementalDedup.signatures(docs(ids)).cache()
    val fresh = java.nio.file.Files.createTempDirectory("bandidx5").toString + "/idx"
    BandIndex.build(spark, fresh, sigs)
    val lived = java.nio.file.Files.createTempDirectory("bandidx6").toString + "/idx"
    BandIndex.build(spark, lived, IncrementalDedup.signatures(docs(ids.take(2))))
    val delta = IncrementalDedup.signatures(docs(ids.drop(2)))
    BandIndex.append(spark, lived, delta)
    BandIndex.append(spark, lived, delta) // crashed-round replay
    val freshRows = BandIndex.footerRowCount(spark, fresh)
    assert(BandIndex.footerRowCount(spark, lived) > freshRows, "replay must show as bloat")
    BandIndex.compact(spark, lived, sigs)
    // compact == fresh build: same row multiset (bucket included), and
    // the footer count the trigger reads is back to exact
    assert(BandIndex.footerRowCount(spark, lived) == freshRows)
    def rows(dir: String) = spark.read.parquet(dir)
      .select("doc_id", "band", "bucket")
      .collect().map(_.toString).sorted.toSeq
    assert(rows(lived) == rows(fresh), "compact must equal a fresh build")
    sigs.unpersist()
  }

  test("maybeCompact triggers on the bloat threshold, not before") {
    val ids = Seq(70L, 71L, 72L, 85L)
    val sigDir = java.nio.file.Files.createTempDirectory("bandidx7").toString + "/sigs"
    val sigs = IncrementalDedup.signatures(docs(ids))
    sigs.write.parquet(sigDir)
    val dir = java.nio.file.Files.createTempDirectory("bandidx8").toString + "/idx"
    BandIndex.build(spark, dir, spark.read.parquet(sigDir))
    assert(!BandIndex.maybeCompact(spark, dir, sigDir, spark.read.parquet(sigDir)),
      "a fresh index must not compact")
    BandIndex.append(spark, dir, IncrementalDedup.signatures(docs(ids.take(2)))) // 50% bloat
    assert(BandIndex.maybeCompact(spark, dir, sigDir, spark.read.parquet(sigDir)),
      "50% bloat must cross the 25% threshold")
    assert(BandIndex.footerRowCount(spark, dir) ==
      ids.size.toLong * graft.functions.Hashing.LshBands)
  }

  test("append makes new docs probeable without a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("bandidx3").toString + "/idx"
    BandIndex.build(spark, dir, IncrementalDedup.signatures(docs(Seq(70L, 71L))))
    BandIndex.append(spark, dir, IncrementalDedup.signatures(docs(Seq(72L))))
    val hits = BandIndex.probe(spark, dir,
      IncrementalDedup.signatures(docs(Seq(9972L, 72L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 72 (group 7) finds both the built and the appended... 72 IS the
    // appended doc: it finds the two built members; 9972 is distinct
    assert(hits == Set((72L, 70L), (72L, 71L)), s"$hits")
  }
}
