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

  test("groupKth matches per-group sorted order on random data") {
    val seed = org.scalacheck.rng.Seed(29L)
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-500L, 500L)))
    val xs = gen.apply(Gen.Parameters.default, seed).get
    val byG = xs.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    val ranks = byG.map { case (g, vs) => g -> ((vs.size + 1L) / 2L) }
    val got = DistributedSelect.groupKth(xs.toDF("g", "v").repartition(5), ranks)
    byG.foreach { case (g, vs) =>
      assert(got(g) == vs((ranks(g) - 1).toInt), s"group $g")
    }
    intercept[IllegalArgumentException](
      DistributedSelect.groupKth(xs.toDF("g", "v"), Map("a" -> 10000L)))
    intercept[IllegalArgumentException](
      DistributedSelect.groupKth(xs.toDF("g", "v"), Map("zz" -> 1L)))
  }
}
