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
      val got = DupClusters.assign(pairs.toDF("doc_a", "doc_b"), maxIters = 100)
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(pairs), s"edges=$pairs")
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
}
