package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SegmentDedup.rewrite: cross-document duplicated 8-token segments are
  * removed, everything else (unique segments + the trailing remainder) is
  * kept verbatim and in order. */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private val S = 4 // small segments keep fixtures readable

  // tokens "a1 a2 a3 a4" form one segment at S=4
  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("shared aligned segment is removed from every doc carrying it; unique tail kept") {
    val shared = words("dup", S)
    val docs = Seq(
      (1L, s"$shared ${words("a", S)} tail1"),      // seg0 dup, seg1 unique, 1 trailing
      (2L, s"$shared ${words("b", S)} tail2 extra"),// seg0 dup, seg1 unique, 2 trailing
      (3L, s"${words("c", S)}")                     // no dup anywhere
    ).toDF("doc_id", "text")
    val out = SegmentDedup.rewrite(docs, S).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((1L, 2L, 1L, S + 1L, s"${words("a", S)} tail1")))
    assert(out(1) == ((2L, 2L, 1L, S + 2L, s"${words("b", S)} tail2 extra")))
    assert(out(2) == ((3L, 1L, 0L, S.toLong, words("c", S)))) // untouched
  }

  test("same span UNALIGNED does not collide (fixed windows, by design)") {
    val shared = words("dup", S)
    val docs = Seq(
      (1L, s"$shared ${words("a", S)}"),
      (2L, s"off $shared ${words("b", S - 1)}") // shifted by one token
    ).toDF("doc_id", "text")
    val out = SegmentDedup.rewrite(docs, S).orderBy("doc_id").collect()
    assert(out.forall(_.getLong(2) == 0L)) // no dup segments detected
  }

  test("repeat within ONE doc only is not a duplicate (cross-doc semantics)") {
    val seg = words("x", S)
    val docs = Seq(
      (1L, s"$seg $seg"), // same segment twice in the same doc
      (2L, words("y", S))
    ).toDF("doc_id", "text")
    val out = SegmentDedup.rewrite(docs, S).orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L && out(0).getString(4) == s"$seg $seg")
  }

  test("fully duplicated doc rewrites to its sub-segment remainder only") {
    val seg = words("z", S)
    val docs = Seq(
      (1L, s"$seg rem"),
      (2L, s"$seg")
    ).toDF("doc_id", "text")
    val out = SegmentDedup.rewrite(docs, S).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    assert(out(0) == ((1L, 1L, "rem")))
    assert(out(1) == ((2L, 0L, ""))) // everything removed -> empty rewrite
  }

  test("docs shorter than one segment pass through whole") {
    val docs = Seq((1L, "just two"), (2L, "just two")).toDF("doc_id", "text")
    val out = SegmentDedup.rewrite(docs, S).orderBy("doc_id").collect()
    // identical short docs share NO segment (they have none) -> kept whole
    assert(out.forall(r => r.getLong(1) == 0L && r.getString(4) == "just two"))
  }

  test("empty text yields an empty rewrite, not a crash") {
    val docs = Seq((1L, ""), (2L, "four words here now")).toDF("doc_id", "text")
    val out = SegmentDedup.rewrite(docs, S).orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 0L && out(0).getString(4) == "")
  }

  test("testdata corpus: counts are internally consistent and dups exist at sf0.001") {
    val out = SegmentDedup.rewrite(graft.Tables.documents(spark, sfDir), 8)
    val bad = out.filter(
      col("n_dup_segments") > col("n_segments") ||
        col("n_dup_segments") < 0 ||
        col("kept_tokens") < (col("n_segments") - col("n_dup_segments")) * 8)
      .count()
    assert(bad == 0)
    // the corpus plants near-dup docs; aligned leading segments collide
    assert(out.filter(col("n_dup_segments") > 0).count() > 0)
  }
}
