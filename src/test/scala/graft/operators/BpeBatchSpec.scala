package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batched-pass BPE training must be EQUIVALENCE-PRESERVING: for any
  * corpus and any batch width, `train(docs, n, batchTop = B)` returns the
  * bit-identical merge list to the serial `train(docs, n)` — same pairs,
  * same order, same counts. The batch selector's three rules (pairwise
  * symbol/concat disjointness with stop-at-first-conflict, fresh concats
  * only, strict count drop at the cut) exist exactly so this holds; these
  * corpora are built to violate each rule if it were dropped. */
class BpeBatchSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(text: Seq[(Long, String)], steps: Int, b: Int): Unit = {
    val docs = text.toDF("doc_id", "text")
    val serial = BpeTrainer.train(docs, steps)
    val batched = BpeTrainer.train(docs, steps, batchTop = b)
    assert(batched == serial,
      s"batchTop=$b diverged:\n serial  $serial\n batched $batched")
  }

  test("real corpus: batched merge list is bit-identical to serial") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assertSame(docs, steps = 14, b = 8)
  }

  test("tiny-alphabet tie-heavy corpus: strict-drop rule exercised") {
    // words over {a,b,c,d} collide constantly: many equal counts, so a
    // batch cut that kept count-tied members would let the serial
    // tiebreak diverge — the popped-ties rule is what keeps this green
    val r = new java.util.Random(5L)
    val alpha = "abcd"
    val docs = (1L to 40L).map { i =>
      val w = (0 until r.nextInt(5) + 3)
        .map(_ => alpha(r.nextInt(4))).mkString
      (i, Seq.fill(r.nextInt(3) + 1)(w).mkString(" "))
    }
    for (b <- Seq(2, 4, 16)) assertSame(docs, steps = 20, b = b)
  }

  test("fresh-concat rule: a pair whose concat is an existing symbol ends the batch") {
    // (a,b) merges early creating symbol "ab"; the corpus also carries
    // frequent "x a b" contexts, so after that merge the PRE-EXISTING
    // shape (x, ab) gains instances — if a later same-pass member ranked
    // below (x, ab)'s boosted count, skipping the fresh-concat check
    // would emit it out of order. Run several widths; all must match.
    val docs = Seq(
      (1L, ("xab " * 6).trim),          // the boost target's context
      (2L, ("ab " * 10).trim),          // makes (a,b) the top pair
      (3L, ("xa " * 4).trim),           // (x,a) feeds the boost bound
      (4L, ("cd " * 7).trim),           // a competing disjoint pair
      (5L, ("ce df " * 3).trim))        // filler pairs below the cut
    for (b <- Seq(2, 3, 8)) assertSame(docs, steps = 12, b = b)
  }

  test("run-heavy corpus: self-pairs and back-to-back merges stay serial") {
    val docs = Seq(
      (1L, "aaaa aaaa aa"), (2L, "abab abab ab"), (3L, "aabb aabb"),
      (4L, "bbbb bb"), (5L, "baba ba"))
    for (b <- Seq(2, 4)) assertSame(docs, steps = 15, b = b)
  }

  test("batch width beyond the table size early-stops like serial") {
    val docs = Seq((1L, "xy xy zw"))
    assertSame(docs, steps = 10, b = 64)
  }

  test("argmax whose concat is an already-minted symbol runs solo") {
    // two routes to the same string: (b,c) -> "bc" early, then (a,bc)
    // mints "abc"; separately "ab c" contexts can re-mint "abc" via
    // (ab,c). Once "abc" exists, an argmax whose concat is "abc" must
    // take NO batch mates: its merge adds instances to pre-existing
    // pairs on "abc", which can outrank a same-pass mate mid-pass.
    // Seeded structured corpora over chain-prone alphabets hit the
    // two-route regime repeatedly; every width must equal serial.
    val r = new java.util.Random(17L)
    val frags = Seq("abc", "ab", "bc", "a", "b", "c", "x", "xabc", "abcd")
    val docs = (1L to 50L).map { i =>
      val w = (0 until r.nextInt(4) + 2).map(_ => frags(r.nextInt(frags.size))).mkString
      (i, Seq.fill(r.nextInt(4) + 1)(w).mkString(" "))
    }
    for (b <- Seq(2, 4, 8)) assertSame(docs, steps = 25, b = b)
  }
}
