package graft.operators

import graft.SparkSpec

/** BpeTrainer: the merge loop learns the textbook chain, handles
  * back-to-back runs with leftmost-non-overlap semantics, breaks ties
  * deterministically, and stops when no pair remains. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("learns the most frequent pair first and builds on prior merges") {
    // "abab" x3, "ab" x2: pair (a,b) count = 3*2 + 2*1 = 8 dominates
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val m = BpeTrainer.train(docs, 3)
    assert(m.head == BpeTrainer.Merge(1, "a", "b", "ab", 8))
    // after merging: "abab" -> [ab, ab], "ab" -> [ab]; next pair (ab, ab) = 3
    assert(m(1) == BpeTrainer.Merge(2, "ab", "ab", "abab", 3))
    // then nothing is adjacent anywhere -> early stop
    assert(m.size == 2)
  }

  test("back-to-back runs merge leftmost-non-overlapping (aaaa -> aa aa)") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = BpeTrainer.train(docs, 2)
    // step 1: (a,a) appears 3 times in "a a a a" (overlap counting is the
    // standard pair-count), merged leftmost-first -> "aa aa"
    assert(m.head == BpeTrainer.Merge(1, "a", "a", "aa", 3))
    assert(m(1) == BpeTrainer.Merge(2, "aa", "aa", "aaaa", 1))
  }

  test("count ties break lexicographically by (left, right)") {
    // "dc" and "ba" each once: tie at 1 -> (b,a) wins over (d,c)
    val docs = Seq((1L, "dc ba")).toDF("doc_id", "text")
    val m = BpeTrainer.train(docs, 1)
    assert(m.head == BpeTrainer.Merge(1, "b", "a", "ba", 1))
  }

  test("single-char words yield no merges") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(BpeTrainer.train(docs, 5).isEmpty)
  }

  test("tokens containing the ; delimiter are excluded from merge statistics") {
    // without the exclusion, "a;b" encodes to phantom empty symbols and the
    // ';' symbol corrupts pair counts (oracle replays the same corruption,
    // so only a unit test can catch it)
    val docs = Seq((1L, "a;b a;b a;b xy xy")).toDF("doc_id", "text")
    val m = BpeTrainer.train(docs, 2)
    assert(m.map(_.merged) == Seq("xy")) // only the clean token trains
    assert(m.head.cnt == 2)
  }

  test("merged symbols never collide with the ; delimiter encoding") {
    // a 3-deep chain whose merged symbols are multi-char on both sides
    val docs = Seq((1L, "xyxy xyxy xy")).toDF("doc_id", "text")
    val m = BpeTrainer.train(docs, 3)
    assert(m.map(_.merged) == Seq("xy", "xyxy"))
    assert(m(1).cnt == 2) // two "xyxy" words contribute (xy,xy) once each
  }

  test("testdata corpus: 10 deterministic merges, counts non-increasing is NOT required but steps are") {
    val m = BpeTrainer.train(graft.Tables.documents(spark, sfDir), 10)
    assert(m.size == 10)
    assert(m.map(_.step) == (1L to 10L))
    // re-run is bit-identical (deterministic tie-break end to end)
    assert(BpeTrainer.train(graft.Tables.documents(spark, sfDir), 10) == m)
  }

  test("subwordCounts applies the merge chain; OOV words count as one token") {
    import spark.implicits._
    // (a,b) dominates the pair stats: abab contributes it twice, abc and
    // ab once each => the single learned merge is "ab"
    val docs = Seq(
      (1L, "abab abc xy"),              // ab|ab, ab|c, x|y -> 6 subwords
      (2L, "ab;c caf\u00e9 ab"))        // ';'-word OOV, non-ASCII OOV, ab
      .toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, 1)
    assert(merges.map(m => (m.left_sym, m.right_sym)) == Seq(("a", "b")))
    val out = BpeTrainer.subwordCounts(docs, merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 6L), (2L, 3L, 3L)))
  }
}
