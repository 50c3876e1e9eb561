package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics the DuckDB oracle can't see for q165/q166: the q47↔q166
  * signal parity (same Gopher numbers from two plan shapes) and the
  * linkage separation q165 exists to surface. */
class LongdocAndPiiSpec extends SparkSpec {

  test("q166 computes exactly q47's top-token/top-bigram permille (two shapes, one answer)") {
    val hof = PipelineQueries.q47(spark, sfDir)
      .select(col("doc_id"), col("top_token_permille").as("e1"),
        col("top_bigram_permille").as("e2"))
    val keyed = TextQueries.q166(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("rep1_pm"), col("rep2_pm"))
    // q47 drops zero-token docs; q166 reports them with zeroed signals.
    val joined = keyed.join(hof, Seq("doc_id"), "left").cache()
    val mismatched = joined.filter(col("n_tokens") > 0 &&
      (col("rep1_pm") =!= col("e1") || col("rep2_pm") =!= col("e2"))).count()
    assert(mismatched == 0)
    val badEmpty = joined.filter(col("n_tokens") === 0 &&
      (col("e1").isNotNull || col("rep1_pm") =!= 0 || col("rep2_pm") =!= 0)).count()
    assert(badEmpty == 0)
    assert(joined.count() > 0)
    joined.unpersist()
  }

  test("q166 keep gate is exactly the 300/200 permille thresholds") {
    val out = TextQueries.q166(spark, sfDir)
    val bad = out.filter(
      col("keep") =!= (col("rep1_pm") <= 300 && col("rep2_pm") <= 200)).count()
    assert(bad == 0)
    // the signals are real (non-degenerate) on this corpus, which happens
    // to be non-repetitive enough that every document passes the gate
    val top = out.agg(max(col("rep1_pm")), max(col("rep2_pm"))).collect().head
    assert(top.getLong(0) > 0 && top.getLong(0) <= 300)
    assert(out.filter(col("keep")).count() == out.count())
  }

  test("q165 separates k-anonymous classes from linking ones") {
    val rows = TextQueries.q165(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // emails embed doc_id: every value is unique to its document
    val (emailVals, emailLinked, emailFan, emailOcc) = rows("email")
    assert(emailLinked == 0 && emailFan == 1 && emailOcc == emailVals)
    // IPs collide mod 256: with 500+ docs, most values link across docs
    val (ipVals, ipLinked, ipFan, ipOcc) = rows("ip")
    assert(ipVals <= 256 && ipLinked > 0 && ipFan >= 2 && ipOcc > ipVals)
    // phones collide only mod lcm(900, 10000): none at test scale
    val (phoneVals, phoneLinked, phoneFan, _) = rows("phone")
    assert(phoneLinked == 0 && phoneFan == 1 && phoneVals > 0)
  }
}
