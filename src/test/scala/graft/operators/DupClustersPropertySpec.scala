package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Differential property test for dup-cluster assignment: min-label
  * propagation must produce exactly the connected components a union-find
  * computes, on random graphs including long chains (worst-case diameter
  * for the propagation loop). */
class DupClustersPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    // canonical label = min member id per component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val pairs = edges.map { case (a, b) => (a.min(b), a.max(b)) }
      .filter(e => e._1 != e._2).distinct
    if (pairs.nonEmpty) {
      val expected = unionFind(pairs)
      val got = DupClusters.assign(pairs.toDF("doc_a", "doc_b"), maxIters = 100)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"edges=$pairs")
      // BOTH tiers against the same reference: the default path (driver
      // union-find under the edge bound) and the forced-distributed star
      // contraction (driverMaxEdges = 0) — small graphs would otherwise
      // never exercise the distributed rounds
      val gotStar = DupClusters.assignStar(pairs.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(gotStar == expected, s"tier-0 union-find diverged: edges=$pairs")
      val gotDist = DupClusters
        .assignStarWithRounds(pairs.toDF("doc_a", "doc_b"), driverMaxEdges = 0)
        ._1.as[(Long, Long)].collect().toMap
      assert(gotDist == expected, s"star contraction diverged: edges=$pairs")
    }
  }

  test("random sparse graphs match union-find components") {
    val seed = org.scalacheck.rng.Seed(37L)
    val edgeGen = Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 40L))
    val cases = Gen.listOfN(6, Gen.listOfN(35, edgeGen))
      .apply(Gen.Parameters.default, seed).get
    cases.foreach(check)
  }

  test("a long chain converges to one component (worst-case diameter)") {
    check((0L until 30L).map(i => (i, i + 1)))
  }

  test("star contraction round count is logarithmic in the chain length") {
    // a 512-hop path: label propagation would need 512 rounds; star
    // contraction must land in O(log^2 n) — assert a hard single-digit-ish
    // bound so a regression to per-hop convergence fails loudly
    val pairs = (0L until 512L).map(i => (i, i + 1))
    // force the distributed tier: the log^2 claim is about the star
    // rounds, which the driver union-find tier would otherwise absorb
    val (labels, rounds) =
      DupClusters.assignStarWithRounds(pairs.toDF("doc_a", "doc_b"),
        driverMaxEdges = 0)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 513 && got.forall(_._2 == 0L))
    assert(rounds <= 12, s"star contraction took $rounds rounds on a 512-path")
  }

  test("V-shaped shared children do not pass the star-forest check early") {
    // Bipartite roots/children sets satisfy the WEAK "no node is both root
    // and child" predicate at round 0, but children 10 and 11 each have two
    // roots — declaring convergence here split the component into per-root
    // cluster ids and emitted duplicate doc_id rows. The exact predicate
    // must force contraction until every child has exactly one root.
    val pairs = Seq((1L, 10L), (5L, 10L), (2L, 11L), (5L, 11L))
    // forced-distributed: the convergence predicate under test lives in
    // the star rounds, not the union-find tier
    val got = DupClusters
      .assignStarWithRounds(pairs.toDF("doc_a", "doc_b"), driverMaxEdges = 0)
      ._1.as[(Long, Long)].collect()
    assert(got.length == got.map(_._1).distinct.length,
      s"duplicate doc_id rows: ${got.sorted.toSeq}")
    assert(got.toMap == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L),
      s"got ${got.sorted.toSeq}")
  }

  test("tier-0 union-find handles string keys (the ER name graph)") {
    // q191 contracts a STRING-keyed name graph; both tiers must agree on
    // the lexicographic min-label there too
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("doc_a", "doc_b")
    val expected = Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x")
    val got = DupClusters.assignStar(pairs).as[(String, String)].collect().toMap
    assert(got == expected, s"got $got")
    val gotDist = DupClusters.assignStarWithRounds(pairs, driverMaxEdges = 0)
      ._1.as[(String, String)].collect().toMap
    assert(gotDist == expected, s"got $gotDist")
  }

  test("star contraction handles self-loops, duplicates, and empty input") {
    import org.apache.spark.sql.functions._
    val pairs = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
    val got = DupClusters.assignStar(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    val gotDist = DupClusters.assignStarWithRounds(pairs, driverMaxEdges = 0)
      ._1.as[(Long, Long)].collect().toMap
    assert(gotDist == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DupClusters.assignStar(empty).filter(lit(true)).count() == 0)
    assert(DupClusters.assignStarWithRounds(empty, driverMaxEdges = 0)
      ._1.filter(lit(true)).count() == 0)
  }
}
