package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Differential test for domain-binary-search selection: kth must equal
  * the sorted array's k-th element on random multisets (duplicates,
  * negatives, skew) for every valid rank. */
class DistributedSelectSpec extends SparkSpec {
  import spark.implicits._

  test("kth matches sorted order on random multisets") {
    val seed = org.scalacheck.rng.Seed(17L)
    val gen = Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)))
    val cases = gen.apply(Gen.Parameters.default, seed).get
    cases.foreach { xs =>
      val df = xs.toDF("v").repartition(5).cache()
      val sorted = xs.sorted
      val ranks = Seq(1, (xs.size + 1) / 2, xs.size).distinct
      ranks.foreach { k =>
        assert(DistributedSelect.kth(df, k.toLong) == sorted(k - 1),
          s"k=$k xs=${xs.take(20)}...")
      }
      df.unpersist()
    }
  }

  test("duplicates and single-value domains converge") {
    val df = Seq(7L, 7L, 7L, 7L).toDF("v")
    (1 to 4).foreach(k => assert(DistributedSelect.kth(df, k.toLong) == 7L))
    val two = Seq(-5L, 3L).toDF("v")
    assert(DistributedSelect.kth(two, 1) == -5L)
    assert(DistributedSelect.kth(two, 2) == 3L)
  }

  test("kthMulti matches per-rank kth on shared rounds") {
    val xs = Seq(5L, -2L, 9L, 9L, 0L, 3L, 3L, 14L, -7L, 6L)
    val df = xs.toDF("v").cache()
    val sorted = xs.sorted
    val ks = Seq(1L, 3L, 5L, 10L)
    assert(DistributedSelect.kthMulti(df, ks) == ks.map(k => sorted(k.toInt - 1)))
    df.unpersist()
  }

  test("a rank past the row count fails loudly instead of returning the max") {
    val df = Seq(1L, 2L, 3L).toDF("v")
    intercept[IllegalArgumentException](DistributedSelect.kth(df, 4L))
    intercept[IllegalArgumentException](DistributedSelect.kth(Seq(7L).toDF("v"), 2L))
  }
}
