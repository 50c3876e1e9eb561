package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Differential property test for the as-of join: the windowed one-pass
  * implementation must match a naive per-row scan (latest strictly-earlier
  * right row per key, whole row adopted atomically, nulls preserved). Right
  * timestamps are unique per key so the expected answer is well-defined. */
class AsofPropertySpec extends SparkSpec {
  import spark.implicits._

  test("asof matches a naive per-row scan on random data") {
    val seed = org.scalacheck.rng.Seed(41L)
    val leftGen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 100L), Gen.chooseNum(0, 999)))
    val rightGen = Gen.listOfN(80, Gen.zip(
      Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 100L),
      Gen.option(Gen.oneOf("x", "y")), Gen.option(Gen.chooseNum(0L, 9L))))
    val (left, rightRaw) = Gen.zip(leftGen, rightGen)
      .apply(Gen.Parameters.default, seed).get
    // unique right ts per key -> deterministic "latest" row
    val right = rightRaw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq

    val got = AsofJoin.asof(
      left.toDF("k", "lts", "v"),
      right.toDF("k", "rts", "p1", "p2"),
      keyCols = Seq("k"), leftTs = "lts", rightTs = "rts",
      payload = Seq("p1", "p2"))
      .select("k", "lts", "v", "asof_p1", "asof_p2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._2, t._3))

    val want = left.map { case (k, lts, v) =>
      val m = right.filter(r => r._1 == k && r._2 < lts)
        .sortBy(_._2).lastOption
      (k, lts, v, m.flatMap(_._3), m.flatMap(_._4))
    }.sortBy(t => (t._1, t._2, t._3))

    assert(got.length == want.length)
    assert(got.toSeq == want.toSeq)
  }

  private def randomSides(seed: Long) = {
    val leftGen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 100L), Gen.chooseNum(0, 999)))
    val rightGen = Gen.listOfN(80, Gen.zip(
      Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 100L),
      Gen.option(Gen.oneOf("x", "y")), Gen.option(Gen.chooseNum(0L, 9L))))
    val (left, rightRaw) = Gen.zip(leftGen, rightGen)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
    (left, rightRaw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq)
  }

  test("asofWithin matches a naive scan with the tolerance applied") {
    val (left, right) = randomSides(42L)
    val tol = 20L
    val got = AsofJoin.asofWithin(
      left.toDF("k", "lts", "v"), right.toDF("k", "rts", "p1", "p2"),
      keyCols = Seq("k"), leftTs = "lts", rightTs = "rts",
      payload = Seq("p1", "p2"), tolerance = tol)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._2, t._3))
    val want = left.map { case (k, lts, v) =>
      val m = right.filter(r => r._1 == k && r._2 < lts && lts - r._2 <= tol)
        .sortBy(_._2).lastOption
      (k, lts, v, m.flatMap(_._3), m.flatMap(_._4))
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == want.toSeq)
  }

  test("asofForward matches a naive scan (earliest strictly-later row)") {
    val (left, right) = randomSides(43L)
    val got = AsofJoin.asofForward(
      left.toDF("k", "lts", "v"), right.toDF("k", "rts", "p1", "p2"),
      keyCols = Seq("k"), leftTs = "lts", rightTs = "rts",
      payload = Seq("p1", "p2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._2, t._3))
    val want = left.map { case (k, lts, v) =>
      val m = right.filter(r => r._1 == k && r._2 > lts)
        .sortBy(_._2).headOption
      (k, lts, v, m.flatMap(_._3), m.flatMap(_._4))
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == want.toSeq)
  }
}
