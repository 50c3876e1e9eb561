package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Differential test for integer PageRank: the distributed power iteration
  * must match a sequential reference that performs the SAME scaled-integer
  * operations, on random symmetric graphs — plus the regular-graph
  * invariant (every node of a symmetric cycle has identical rank, because
  * the integer update is symmetric under the graph's automorphisms). */
class RankPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1)
    val deg = out.map { case (u, es) => u -> es.size.toLong }
    val incoming = edges.groupBy(_._2)
    var r: Map[Long, Long] = deg.map { case (u, _) => u -> RankPropagation.Scale }
    for (_ <- 1 to iters) {
      r = deg.map { case (v, _) =>
        val s = incoming.getOrElse(v, Seq.empty)
          .map { case (u, _) => r(u) / deg(u) }.sum
        v -> (15L * RankPropagation.Scale + 85L * s) / 100L
      }
    }
    r
  }

  private def check(raw: Seq[(Long, Long)], iters: Int): Unit = {
    // symmetrize + dedup + drop self loops (the operator's documented input)
    val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
    if (edges.nonEmpty) {
      val got = RankPropagation.ranks(edges.toDF("src", "dst"), iters)
        .as[(Long, Long)].collect().toMap
      assert(got == reference(edges, iters), s"edges=$edges iters=$iters")
    }
  }

  test("random symmetric graphs match the sequential integer reference") {
    val seed = org.scalacheck.rng.Seed(53L)
    val edgeGen = Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L))
    val cases = Gen.listOfN(5, Gen.listOfN(40, edgeGen))
      .apply(Gen.Parameters.default, seed).get
    cases.zipWithIndex.foreach { case (c, i) => check(c, iters = 1 + i % 3) }
  }

  test("symmetric cycle yields identical rank on every node") {
    val n = 12L
    val cycle = (0L until n).map(i => (i, (i + 1) % n))
    val got = RankPropagation.ranks(
      cycle.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst"),
      iters = 3).as[(Long, Long)].collect()
    assert(got.length == n && got.map(_._2).distinct.length == 1)
    // degree-2 regular: r = (15S + 85r)/100 fixpoint stays at scale
    assert(got.head._2 == RankPropagation.Scale)
  }
}
