package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusFnSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("t").select(c.as("r")).collect()(0).get(0)

  test("tokens + shingles") {
    assert(one(Text.tokens(col("t")), "The  quick Brown fox") ==
      Seq("the", "quick", "brown", "fox"))
    assert(one(Text.shingles(col("t"), 3), "a b c d") == Seq("a b c", "b c d"))
    assert(one(Text.shingles(col("t"), 3), "a b") == Seq("a b")) // degenerate
  }

  private def shingleHashes(t: org.apache.spark.sql.Column) =
    Hashing.shingleHashes(
      transform(Text.tokens(t), w => Hashing.hash32(w)),
      Hashing.hash32(Text.normalize(t)))

  test("minhash signature is stable and sensitive") {
    val df = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog"),
      ("d2", "the quick brown fox jumps over the lazy cat"),
      ("d3", "entirely different content with no overlap here")).toDF("id", "t")
    val sig = df.select(col("id"),
      Hashing.minhashSignature(shingleHashes(col("t")), 8).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sig("d1").size == 8)
    // near-dups share most mins; disjoint docs share none of the 8
    val shared12 = sig("d1").zip(sig("d2")).count { case (a, b) => a == b }
    val shared13 = sig("d1").zip(sig("d3")).count { case (a, b) => a == b }
    assert(shared12 > shared13)
  }

  test("jaccard") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Hashing.jaccard(col("x"), col("y"))).as[Double].collect()(0)
    assert(math.abs(j - 0.5) < 1e-9)
  }

  test("simhash near-dup has small hamming distance") {
    val df = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog today"),
      ("d2", "the quick brown fox jumps over the lazy dog tonight"),
      ("d3", "completely unrelated words appear in this sentence instead")).toDF("id", "t")
    val sh = df.select(col("id"),
      Hashing.simhash(shingleHashes(col("t")), 32).as("s"))
      .as[(String, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh("d1"), sh("d2")) < ham(sh("d1"), sh("d3")))
  }

  test("cosine of identical and orthogonal vectors") {
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("a", "b")
    val got = df.select(Vectors.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
  }

  test("rolling fingerprint: equal for equal normalized text, differs otherwise") {
    val df = Seq(("A  b\tC", "a b c", "a b d")).toDF("x", "y", "z")
    val r = df.select(
      Text.rollingFingerprint(col("x")).as("x"),
      Text.rollingFingerprint(col("y")).as("y"),
      Text.rollingFingerprint(col("z")).as("z")).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("corpus kernels are callable from the SQL surface") {
    graft.plans.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, typedLit}
    val row = spark.sql(
      """SELECT graft_dot(array(1L,2L), array(3L,4L)) AS d,
        |       graft_l2sq(array(0L,3L), array(4L,7L)) AS l,
        |       graft_minhash(array(5L,9L), 4) AS mh,
        |       graft_simhash(array(5L,9L)) AS sh""".stripMargin).collect()(0)
    assert(row.getLong(0) == 11L)
    assert(row.getLong(1) == 32L)
    assert(row.getSeq[Long](2).size == 4)
    // parity with the Column API forms
    import spark.implicits._
    val viaCols = Seq(Seq(5L, 9L)).toDF("h")
      .select(Hashing.minhashSignature(col("h"), 4).as("mh"),
        Hashing.simhash(col("h"), 32).as("sh"))
      .collect()(0)
    assert(row.getSeq[Long](2) == viaCols.getSeq[Long](0))
    assert(row.getLong(3) == viaCols.getLong(1))
    // the banded edit distance: exact under the radius, clamped beyond
    val lev = spark.sql(
      """SELECT levenshtein_within('kitten', 'sitting', 3) AS a,
        |       levenshtein_within('kitten', 'abcdefgh', 3) AS b""".stripMargin)
      .collect()(0)
    assert(lev.getLong(0) == 3L && lev.getLong(1) == 4L)
  }

  test("url canonicalization: case, www, ports, tracking params, fragments, slashes") {
    import spark.implicits._
    val cases = Seq(
      // two crawls of the same page -> same key
      ("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&q=1#top", "https://example.com/a/b?q=1"),
      ("https://example.com/a/b/?q=1", "https://example.com/a/b?q=1"),
      // non-default port kept; param order preserved
      ("http://Example.com:8080/p?b=2&a=1&fbclid=zzz", "http://example.com:8080/p?b=2&a=1"),
      // default http port dropped; root path collapses; empty query dropped
      ("http://example.com:80/?utm_campaign=c", "http://example.com"),
      // path case preserved (URL paths are case-sensitive)
      ("https://example.com/Docs/Page1", "https://example.com/Docs/Page1"),
      // gclid stripped mid-query
      ("http://a.com/p?x=1&gclid=g&y=2", "http://a.com/p?x=1&y=2"))
    val out = cases.map(_._1).toDF("url")
      .select(graft.functions.Text.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"got $got want $want")
    }
  }

  test("langid picks the language with most markers") {
    val scores = Text.langScores(col("t"))
    val df = Seq("el que la de los por es una cosa").toDF("t")
    val vals = df.select(scores.map { case (c, s) => s.as(c) }: _*).collect()(0)
    val best = Text.LangMarkers.map(_._1).zipWithIndex.maxBy { case (_, i) => vals.getInt(i) }._1
    assert(best == "es")
  }
}
