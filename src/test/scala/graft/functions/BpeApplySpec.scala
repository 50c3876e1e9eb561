package graft.functions

import graft.SparkSpec
import graft.functions.expressions.BpeEncode
import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Parity contract for the BpeEncode expression: the compiled (rank-
  * priority / sequential-fallback) kernel must be BIT-IDENTICAL to the
  * definitional literal replace chain, on the real learned table over the
  * real corpus, on adversarial hand tables that break the fast-path
  * preconditions, and on both eval paths.
  */
class BpeApplySpec extends SparkSpec {

  private def literalChain(word: String, merges: Seq[(String, String)]): String = {
    val enc = " " + word.map(c => s"$c;").mkString(" ")
    merges.foldLeft(enc) { case (w, (l, r)) => w.replace(s" $l; $r;", s" $l$r;") }
  }

  private def kernel(word: String, merges: Seq[(String, String)]): String =
    new BpeEncode.MergeTable(merges)
      .encode(UTF8String.fromString(word)).toString

  test("learned corpus table: expression == literal chain on every corpus word") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = BpeTrainer.train(docs, 10)
    val pairs = merges.map(m => (m.left_sym, m.right_sym))
    assert(new BpeEncode.MergeTable(pairs).fastPathOk,
      "a trained table must satisfy the funnel preconditions (fast path)")
    val words = docs.select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .filter(!col("w").contains(";") && !col("w").rlike("[^\\x00-\\x7F]"))
      .distinct().collect().map(_.getString(0))
    assert(words.length >= 30, s"precondition: real vocabulary (${words.length})")
    words.foreach { w =>
      assert(kernel(w, pairs) == literalChain(w, pairs),
        s"divergence on corpus word '$w'")
    }
  }

  test("subwordCounts (expression) == subwordCountsLiteral (chain) frame-for-frame") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = BpeTrainer.train(docs, 10)
    val a = BpeTrainer.subwordCounts(docs, merges).orderBy(col("doc_id")).collect()
    val b = BpeTrainer.subwordCountsLiteral(docs, merges).orderBy(col("doc_id")).collect()
    assert(a.toSeq == b.toSeq, "expression and literal-chain frames diverge")
  }

  test("adversarial tables take the sequential fallback and still match the chain") {
    // duplicate merged string from two derivations: (a,bc) and (ab,c) both
    // yield "abc" — the shape the funnel proof forbids on the fast path
    val dup = Seq(("b", "c"), ("a", "b"), ("a", "bc"), ("ab", "c"))
    assert(!new BpeEncode.MergeTable(dup).fastPathOk, "dup merged string must disable fast path")
    // duplicate pair entry: second application could fire again later
    val dupPair = Seq(("a", "b"), ("a", "b"))
    assert(!new BpeEncode.MergeTable(dupPair).fastPathOk, "dup pair must disable fast path")
    // side that is neither a single char nor an earlier output
    val orphan = Seq(("ab", "cd"))
    assert(!new BpeEncode.MergeTable(orphan).fastPathOk, "orphan side must disable fast path")
    val words = Seq("abc", "abcabc", "aabbcc", "abcd", "abcdab", "cdab", "x",
      "", "aaaa", "abab", "bcbc", "cabc")
    for (table <- Seq(dup, dupPair, orphan); w <- words)
      assert(kernel(w, table) == literalChain(w, table),
        s"fallback divergence on '$w' with $table")
  }

  test("LARGE fallback table: 2000 interacting merges with duplicate pairs " +
    "replay exactly like the literal chain") {
    // a production-sized table that VIOLATES the funnel preconditions
    // everywhere (duplicate pairs over a 4-symbol alphabet, so later
    // duplicates re-fire on the products of earlier merges): the exact
    // sequential-replay fallback must stay bit-identical to the
    // definitional chain at this scale, not just on toy tables
    val alpha = "abcd"
    def sym(i: Int): String = alpha((i % 4)).toString
    val big = (0 until 2000).map { i =>
      // mix single chars and previously-producible composites
      if (i % 5 == 4) (sym(i) + sym(i / 2), sym(i / 3))
      else (sym(i), sym(i / 4))
    }
    assert(!new BpeEncode.MergeTable(big).fastPathOk,
      "duplicate pairs must disable the fast path")
    val words = Seq("abcd", "aabbccdd", "abcabcabc", "dddd", "cbadcbad",
      "aaaaaaaaaa", "abdcba", "ccccabab", "badcab", "a", "")
    words.foreach { w =>
      assert(kernel(w, big) == literalChain(w, big),
        s"large-fallback divergence on '$w'")
    }
  }

  test("decode(encode) is the identity — the tokenizer is lossless") {
    // the delimited symbol string " s1; s2; ...;" must reconstruct the
    // word by stripping delimiters: symbols contain no space/';' (corpus
    // tokens with the delimiter are excluded on both engines), so any
    // residue would mean the encoder dropped or duplicated characters —
    // the contract a training pipeline's detokenization relies on
    def decode(enc: String): String = enc.replace(";", "").replace(" ", "")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = BpeTrainer.train(docs, 10)
    val pairs = merges.map(m => (m.left_sym, m.right_sym))
    val words = docs.select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .filter(!col("w").contains(";") && !col("w").rlike("[^\\x00-\\x7F]"))
      .distinct().collect().map(_.getString(0))
    words.foreach(w => assert(decode(kernel(w, pairs)) == w, s"lossy on '$w'"))
    // fallback path too (adversarial table)
    val dup = Seq(("b", "c"), ("a", "b"), ("a", "bc"), ("ab", "c"))
    Seq("abc", "abcabc", "aabbcc", "x", "aaaa").foreach(w =>
      assert(decode(kernel(w, dup)) == w, s"fallback lossy on '$w'"))
  }

  test("fast path handles back-to-back runs the way literal replace does") {
    // " a; a; a; a;" -> "aa aa", the resume-after-replacement contract
    val t = Seq(("a", "a"))
    assert(kernel("aaaa", t) == " aa; aa;")
    assert(kernel("aaa", t) == " aa; a;")
    assert(kernel("aaaa", t) == literalChain("aaaa", t))
    // chained merges exercise rank ordering
    val chain = Seq(("a", "b"), ("ab", "c"), ("abc", "d"))
    assert(kernel("abcd", chain) == " abcd;")
    assert(kernel("abcd", chain) == literalChain("abcd", chain))
    assert(kernel("dabc", chain) == " d; abc;")
  }

  test("both eval paths agree (interpreted Projection vs codegen)") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val expr = BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("abcabx"),
        org.apache.spark.sql.types.StringType), merges)
    val interpreted = expr.eval(null).toString
    assert(interpreted == " abc; ab; x;")
    import spark.implicits._
    // through a real projection (codegen path)
    val viaDf = Seq("abcabx").toDF("w")
      .select(BpeEncode.bpeEncode(col("w"), merges).as("e"))
      .collect().head.getString(0)
    assert(viaDf == interpreted)
  }

  test("plan size is independent of the merge count (the 50k-merge contract)") {
    val big = (1 to 1000).map(i => (s"x$i", s"y$i")) // orphan sides: fallback, fine
    val small = Seq(("a", "b"))
    import spark.implicits._
    def planLen(m: Seq[(String, String)]): Int =
      Seq("ab").toDF("w").select(BpeEncode.bpeEncode(col("w"), m).as("e"))
        .queryExecution.executedPlan.toString.length
    val (pBig, pSmall) = (planLen(big), planLen(small))
    assert(pBig <= pSmall + 50,
      s"plan must not grow with the table: $pBig vs $pSmall")
  }
}
