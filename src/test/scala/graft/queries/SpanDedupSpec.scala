package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Invariants of q167's first-occurrence-wins rewrite that the value-level
  * oracle can't state: global single-survivor conservation, rewrite
  * identity on untouched docs, and full erasure of exact-duplicate docs. */
class SpanDedupSpec extends SparkSpec {

  test("q167: each distinct span survives exactly once corpus-wide") {
    val out = DedupQueries.q167(spark, sfDir).cache()
    val keptTotal = out.agg(sum(col("n_spans") - col("n_spans_removed")))
      .collect().head.getLong(0)
    // distinct span values across the corpus, recomputed independently
    val S = 8
    val distinctSpans = Tables.documents(spark, sfDir)
      .select(Text.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .where(col("n") > 0)
      .select(explode(transform(
        sequence(lit(1), expr(s"(n + ${S - 1}) div $S").cast("int")),
        i => concat_ws(" ", slice(col("t"), (i - 1) * S + 1, lit(S))))).as("span"))
      .select(countDistinct(col("span"))).collect().head.getLong(0)
    assert(keptTotal == distinctSpans)
    out.unpersist()
  }

  test("q167: a doc with no removals reassembles byte-identically to its normalized text") {
    val out = DedupQueries.q167(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(Text.normalize(col("text")).cast("binary")).as("orig_md5"))
    val broken = out.where(col("n_spans_removed") === 0 && col("n_spans") > 0)
      .join(docs, Seq("doc_id"))
      .where(col("text_md5") =!= col("orig_md5")).count()
    assert(broken == 0)
    // and the rewrite is not a no-op on this corpus
    assert(out.where(col("n_spans_removed") > 0).count() > 0)
  }

  test("q167: matches a driver-side brute-force replay of first-occurrence-wins") {
    val S = 8
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = docs.map { case (id, text) =>
      val t = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val spans = t.grouped(S).map(_.mkString(" ")).toSeq
      val kept = spans.filter(sp => seen.add(sp))
      (id, (spans.size.toLong, (spans.size - kept.size).toLong,
        kept.map(_.split(" ").length.toLong).sum))
    }.toMap
    val got = DedupQueries.q167(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    val bad = expect.collect { case (id, e) if got(id) != e => id -> (e, got(id)) }
    assert(bad.isEmpty, s"first 3 mismatches: ${bad.take(3)}")
    // and the policy actually fired somewhere on this corpus
    assert(expect.values.exists(_._2 > 0))
  }
}
