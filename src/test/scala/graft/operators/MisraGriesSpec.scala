package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Property tests for the Misra-Gries summary: the retention guarantee
  * (every item with true frequency > n/k is in the summary) and the
  * undercount bound (0 <= true - reported <= n/k) must hold on skewed
  * random streams under BOTH single-partition and multi-partition merges —
  * the mergeable-summaries combine must not weaken either bound. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def checkStream(items: Seq[String], k: Int): Unit = {
    val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val n = items.size.toLong
    Seq(1, 7).foreach { parts =>
      val df = items.toDF("tok").repartition(parts)
      val mg = MisraGries.summarize(df, k).toMap
      assert(mg.size <= k - 1, s"summary kept ${mg.size} > ${k - 1} counters")
      exact.foreach { case (t, c) =>
        if (c * k > n)
          assert(mg.contains(t), s"heavy hitter $t (count $c, n=$n, k=$k) dropped at $parts partitions")
      }
      mg.foreach { case (t, reported) =>
        val true_ = exact.getOrElse(t, 0L)
        assert(reported <= true_, s"$t overcounted: $reported > $true_")
        assert(true_ - reported <= n / k,
          s"$t undercount ${true_ - reported} exceeds n/k = ${n / k}")
      }
    }
  }

  test("skewed random streams keep every heavy hitter with bounded undercount") {
    val seed = org.scalacheck.rng.Seed(91L)
    // zipf-ish: small ids exponentially more likely
    val tokGen = Gen.frequency(
      (32, Gen.const("a")), (16, Gen.const("b")), (8, Gen.const("c")),
      (4, Gen.oneOf("d", "e")), (2, Gen.oneOf("f", "g", "h")),
      (1, Gen.chooseNum(0, 400).map("t" + _)))
    val cases = Gen.listOfN(4, Gen.listOfN(3000, tokGen))
      .apply(Gen.Parameters.default, seed).get
    cases.foreach(checkStream(_, k = 8))
    checkStream(cases.head, k = 3)
  }

  test("uniform stream wider than k yields only bounded candidates") {
    val items = (0 until 900).map(i => "u" + (i % 30))
    checkStream(items, k = 8)
  }

  test("empty and null-only input yield an empty summary") {
    assert(MisraGries.summarize(Seq.empty[String].toDF("tok"), 8).isEmpty)
    assert(MisraGries.summarize(Seq[Option[String]](None, None).toDF("tok"), 8).isEmpty)
  }
}
