package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** PQ ANN (q58): the ADC distances must equal a plain-Scala recomputation
  * of encode-then-lookup, and quantization must never *under*-estimate so
  * badly that the exact nearest neighbor falls out of a generous candidate
  * set (recall sanity, not exactness — PQ is an approximation by design). */
class PqAnnSpec extends SparkSpec {

  private val SubCount = 4
  private val SubDim = 16

  test("ADC distances match a plain recomputation from codes and tables") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000d).toLong).toArray)
      .toMap
    def sub(v: Array[Long], s: Int) = v.slice(s * SubDim, (s + 1) * SubDim)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seeds = (0 until 4).map(c => vecs(c.toLong))
    def code(v: Array[Long], s: Int): Int =
      (0 until 4).map(c => (d2(sub(v, s), sub(seeds(c), s)), c)).min._2
    def adc(q: Array[Long], x: Array[Long]): Long =
      (0 until SubCount).map(s => d2(sub(q, s), sub(seeds(code(x, s)), s))).sum

    val got = PipelineQueries.q58(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (qid, _, nid, dist) =>
      assert(dist == adc(vecs(qid), vecs(nid)), s"query $qid neighbor $nid")
    }
    // per query: the reported top-3 really are the 3 smallest ADC distances
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val all = vecs.keys.filter(_ >= 10).map(n => (adc(vecs(qid), vecs(n)), n)).toSeq.sorted
      val want = all.take(3).map(_._2).toSet
      assert(rows.map(_._3).toSet == want, s"query $qid top-3")
    }
  }
}
