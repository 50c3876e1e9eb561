package graft.functions

import graft.SparkSpec
import graft.functions.expressions.BloomContains
import graft.operators.BloomFilter
import org.apache.spark.sql.functions._

/** BloomFilter.build + BloomContains.countContained: builder and probe stay
  * in lock-step, no false negatives ever, false positives deterministic,
  * both eval paths agree. */
class BloomContainsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 14
  private val K = 3

  private def buildBits(keys: Seq[Long]): Array[Long] =
    BloomFilter.build(keys.toDF("s"), M, K)

  /** Independent reference membership: recompute probes via BloomContains
    * .probe directly (the builder must place bits exactly there). */
  private def refContained(s: Long, bits: Array[Long]): Boolean =
    (0 until K).forall { i =>
      val pos = BloomContains.probe(s, i, M)
      (bits((pos >>> 6).toInt) & (1L << (pos & 63))) != 0L
    }

  test("no false negatives: every inserted key probes as contained") {
    val keys = (1L to 2000L).map(i => i * 2654435761L % 4294967311L)
    val bits = buildBits(keys)
    val n = keys.toDF("doc").select(array(col("doc")).as("arr"))
      .select(BloomContains.countContained(col("arr"), bits, M, K).as("c"))
      .agg(sum("c")).as[Long].head()
    assert(n == keys.size)
  }

  test("count matches an element-wise reference recomputation, FPs included") {
    val inserted = (1L to 500L).map(i => i * 48271L % 4294967311L)
    val bits = buildBits(inserted)
    val probesArr = (1L to 3000L).toArray // mostly NOT inserted -> some FPs possible
    val expected = probesArr.count(refContained(_, bits)).toLong
    val got = Seq(probesArr.toSeq).toDF("arr")
      .select(BloomContains.countContained(col("arr"), bits, M, K))
      .as[Long].head()
    assert(got == expected)
    // determinism: a rebuilt filter from the same keys probes identically
    val got2 = Seq(probesArr.toSeq).toDF("arr")
      .select(BloomContains.countContained(col("arr"), buildBits(inserted), M, K))
      .as[Long].head()
    assert(got2 == expected)
  }

  test("interpreted eval path agrees with codegen") {
    val keys = Seq(5L, 99L, 12345L)
    val bits = buildBits(keys)
    val arrs = Seq(Seq(5L, 99L, 7L), Seq.empty[Long], Seq(12345L))
    def run(): Seq[Long] = arrs.toDF("arr")
      .select(BloomContains.countContained(col("arr"), bits, M, K).as("c"))
      .as[Long].collect().toSeq
    val codegen = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(run() == codegen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(codegen == Seq(2L, 0L, 1L))
  }

  test("tiny filter saturates: everything contained once all bits are set") {
    val m = 64 // one word — dense insertion must set every probe path
    val bits = BloomFilter.build((0L until 512L).toDF("s"), m, K)
    val got = Seq(Seq(777777L, 1L, 424242L)).toDF("arr")
      .select(BloomContains.countContained(col("arr"), bits, m, K))
      .as[Long].head()
    assert(got == 3L) // pure false positives — the saturated-filter contract
  }

  test("probe positions column form matches the JVM probe") {
    val keys = Seq(3L, 4294967310L, 123456789L)
    val rows = keys.toDF("s")
      .select(col("s"), BloomFilter.probePositions(col("s"), M, K).as("p"))
      .as[(Long, Seq[Long])].collect()
    rows.foreach { case (s, ps) =>
      assert(ps == (0 until K).map(i => BloomContains.probe(s, i, M)))
    }
  }

  test("signed hashes (xxhash64-style) probe safely: no false negatives, builder/probe agree") {
    val keys = Seq(-1L, Long.MinValue, Long.MaxValue, -4294967311L, -987654321L)
    val bits = buildBits(keys)
    val got = Seq(keys).toDF("arr")
      .select(BloomContains.countContained(col("arr"), bits, M, K))
      .as[Long].head()
    assert(got == keys.size.toLong)
    keys.foreach { s =>
      (0 until K).foreach { i =>
        val pos = BloomContains.probe(s, i, M)
        assert(pos >= 0 && pos < M, s"probe($s,$i) out of range: $pos")
      }
    }
  }

  test("non-bigint arrays are rejected at ANALYSIS time, not misread at execution") {
    // ArrayData.getLong on an array<int> child would silently read garbage;
    // checkInputDataTypes must fail the plan before it ever runs
    val bits = buildBits(Seq(1L))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1, 2, 3)).toDF("arr")
        .select(BloomContains.countContained(col("arr"), bits, M, K))
        .collect()
    }
    assert(e.getMessage.contains("array<bigint>") ||
      e.getMessage.toLowerCase.contains("data type mismatch"),
      s"unexpected analysis error: ${e.getMessage}")
  }
}
