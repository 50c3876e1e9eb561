package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Structural invariants of the curation governance family — the
  * properties that make each operator trustworthy as a DECISION, beyond
  * the value-level oracle gate: budget conservation (q198), the
  * leakage-free guarantee (q194), and block conservation through the
  * boilerplate rewrite (q199). */
class CurationQueriesSpec extends SparkSpec {

  test("q198: largest-remainder quotas sum to the budget exactly") {
    val out = CurationQueries.q198(spark, sfDir).collect()
    val totalTokens = Tables.documents(spark, sfDir)
      .select(sum(size(Text.tokens(col("text")))).cast("long")).head().getLong(0)
    val budget = totalTokens / 3
    assert(out.map(_.getAs[Long]("alloc")).sum == budget,
      s"sum(alloc) must equal budget $budget exactly — float quotas drift")
    out.foreach { r =>
      assert(Set(0L, 1L).contains(r.getAs[Long]("extra")))
      assert(r.getAs[Long]("alloc") ==
        r.getAs[Long]("base_alloc") + r.getAs[Long]("extra"))
    }
  }

  test("q194: cluster-aware split covers every doc and leaks zero pairs") {
    val out = CurationQueries.q194(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "splits must partition the corpus")
    // the property the operator exists for: no verified near-dup pair
    // straddles splits under cluster-keyed assignment
    assert(out.forall(_.getAs[Long]("n_cross_pairs") == 0L),
      s"cross-split near-dup pairs: ${out.mkString(", ")}")
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "valid"))
  }

  test("q199: block accounting conserves the corpus and finds the footer") {
    val out = CurationQueries.q199(spark, sfDir)
    val byDoc = out.collect()
    // conservation: n_blocks per doc == ceil(tokens(text + footer) / 2)
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(Text.tokens(concat(col("text"), lit(" copyright footer "),
          col("source"), lit(" all rights reserved")))).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) + 1) / 2).toMap
    byDoc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_blocks") == expected(id),
        s"doc $id block count diverged from ceil(tokens/2)")
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_blocks"))
    }
    // the planted per-source footer must be detected somewhere in every
    // source (each source shares its footer blocks across all its docs)
    val bySource = byDoc.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_dropped")).sum).toMap
    bySource.foreach { case (s, dropped) =>
      assert(dropped > 0L, s"source $s: planted footer not detected")
    }
  }

  /** Write a minimal documents table and return its directory — q208/q209
    * only touch (doc_id, text), so the constructed corpus stays narrow. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("curdocs").toString
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q208: constructed spans — cross-doc, self-repeat, boundaries exact") {
    // S (40 chars) is shared by docs 1 and 2 with unique flanks, so the
    // maximal duplicated span in each is EXACTLY S. Doc 3 repeats R (35
    // chars) twice with a 40-char unique gap — two islands, never merged.
    // Doc 4 has no 32-char substring occurring twice anywhere.
    val S = "the quick brown fox jumps over the dogs"  + "x" // 40 chars
    val R = "zebra lion tiger bear wolf eagle hawk"         // 37 chars
    assert(S.length == 40 && R.length == 37)
    val gap  = "0123456789012345678901234567890123456789"   // 40 chars
    val rows = Seq(
      1L -> s"aaaa bbbb cccc $S dddd eeee ffff",
      2L -> s"gggg hhhh iiii jjjj $S kkkk llll",
      3L -> s"mm $R $gap$R nn",
      4L -> "unique text with no repeats anywhere at all in this corpus")
    val out = CurationQueries.q208(spark, docsDir(rows)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_chars"))).toMap
    // the maximal span is ' '+S+' ' (42 chars): both occurrences sit
    // between spaces, so the duplicated region extends one char past S on
    // each side — MAXIMALITY is part of what this pins
    assert(out(1L) == (1L, 42L), s"doc 1: ${out(1L)} — span must be ' S '")
    assert(out(2L) == (1L, 42L), s"doc 2: ${out(2L)}")
    // doc 3: R+' ' (38 chars) appears twice (left extension blocked: 'm '
    // vs '9' before the copies); the 40-char gap exceeds L=32 so the two
    // islands stay separate
    assert(out(3L) == (2L, 76L), s"doc 3: ${out(3L)}")
    assert(out(4L) == (0L, 0L), s"doc 4: ${out(4L)}")
    // kept_chars conservation re-checked by the oracle gate; here assert
    // the schema contract survived the left join for span-free docs
    assert(out.size == 4)
  }

  test("q210: scrub rewrite — constructed cleaned text, exact; q208 identity") {
    // doc 1/2 share S with identical flanking spaces (the q208 fixture):
    // the scrubbed text must be the original with ' '+S+' ' cut — pin the
    // exact rewrite, not just its length
    val S = "the quick brown fox jumps over the dogs" + "x"
    val rows = Seq(
      1L -> s"aaaa bbbb cccc $S dddd eeee ffff",
      2L -> s"gggg hhhh iiii jjjj $S kkkk llll",
      3L -> "no duplicated substrings live in this document at all")
    val dir = docsDir(rows)
    val out = CurationQueries.q210(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // the cut span is ' '+S+' ' (both flanking spaces are duplicated), so
    // the kept segments join with NO space between them
    assert(out(1L).getAs[String]("clean_md5") == md5Of("aaaa bbbb ccccdddd eeee ffff"))
    assert(out(2L).getAs[String]("clean_md5") == md5Of("gggg hhhh iiii jjjjkkkk llll"))
    assert(out(3L).getAs[String]("clean_md5") == md5Of(rows(2)._2),
      "span-free docs must pass through verbatim")
    // cross-query identity on the real corpus: the rewrite removes
    // EXACTLY the char mass q208 reports as duplicated
    val kept = CurationQueries.q208(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("kept_chars")).toMap
    CurationQueries.q210(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("clean_len") == kept(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: clean_len != q208.kept_chars")
    }
  }

  test("q209: chunk-count closed form and full token coverage at the edges") {
    val word = "tok"
    def docOf(n: Int): String = Seq.fill(n)(word).mkString(" ")
    // n = 1 / 63 / 64 (fits one window) / 65 / 112 (exact two) / 113 / 200
    val ns = Seq(1, 63, 64, 65, 112, 113, 200)
    val rows = ns.zipWithIndex.map { case (n, i) => (i + 1L, docOf(n)) }
    val out = CurationQueries.q209(spark, docsDir(rows)).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    ns.zipWithIndex.foreach { case (n, i) =>
      val chunks = out(i + 1L).sortBy(_.getAs[Long]("chunk_idx"))
      val expectK = if (n <= 64) 1 else (n - 64 + 47) / 48 + 1
      assert(chunks.length == expectK, s"n=$n: ${chunks.length} chunks, want $expectK")
      chunks.zipWithIndex.foreach { case (c, ci) =>
        assert(c.getAs[Long]("start_tok") == ci * 48L)
        assert(c.getAs[Long]("n_toks") ==
          math.min(64L, n - ci * 48L), s"n=$n chunk $ci size")
      }
      // ragged tail still reaches the end: last chunk covers token n-1
      val last = chunks.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_toks") == n.toLong,
        s"n=$n: chunks must cover every token exactly once past the overlap")
    }
  }
}
