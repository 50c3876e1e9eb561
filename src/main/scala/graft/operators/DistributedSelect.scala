package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact order statistics without a global sort: binary search over the
  * VALUE DOMAIN of an integer column. Each probe round is one map-side
  * counting aggregate, so selecting any set of ranks costs log2(domain
  * range) cheap scans — ~24 for cent-quantized prices — instead of the
  * shuffle-the-world total sort or the single-partition window an
  * ORDER BY/ntile would plan. Multiple ranks share rounds: `kthMulti`
  * probes every still-open rank's midpoint in the SAME aggregate
  * (conditional counts), so median+p90+p99 cost one scan per round, not
  * three. The input should be cached by the caller (the rounds re-scan
  * it).
  *
  * This is the exact companion to the q123 histogram sketch: the sketch
  * answers many quantiles approximately in one pass; this answers exact
  * ranks in log passes. Both avoid global order.
  */
object DistributedSelect {

  /** k-th smallest (1-indexed, k in [1, n]) of the frame's first column
    * (integer-typed). Deterministic: converges to the unique value v where
    * count(<= v) >= k and count(<= v-1) < k. Throws on k > n. */
  def kth(values: DataFrame, k: Long): Long =
    kthMulti(values, Seq(k)).head

  /** All requested ranks in one synchronized domain search: one counting
    * aggregate per round covering every still-open rank's midpoint. */
  def kthMulti(values: DataFrame, ks: Seq[Long]): Seq[Long] = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ranks are 1-indexed")
    val c = col(values.columns.head)
    val bounds = values
      .agg(min(c).cast("long"), max(c).cast("long"), count(lit(1))).head()
    require(!bounds.isNullAt(0), "kth of an empty frame")
    val n = bounds.getLong(2)
    require(ks.forall(_ <= n), s"a rank exceeds the row count $n")
    val lo = Array.fill(ks.size)(bounds.getLong(0))
    val hi = Array.fill(ks.size)(bounds.getLong(1))
    while (ks.indices.exists(i => lo(i) < hi(i))) {
      val active = ks.indices.filter(i => lo(i) < hi(i))
      // hi - lo >= 0, so the midpoint floors correctly for negative lo too
      // (caveat: a domain wider than Long.Max/2 would overflow the
      // difference — no quantized column is)
      val mids = active.map(i => lo(i) + (hi(i) - lo(i)) / 2)
      val probes = mids.map(m => sum(when(c <= m, 1L).otherwise(0L)))
      val row = values.agg(probes.head, probes.tail: _*).head()
      active.zipWithIndex.foreach { case (i, j) =>
        if (row.getLong(j) >= ks(i)) hi(i) = mids(j) else lo(i) = mids(j) + 1
      }
    }
    ks.indices.map(lo(_))
  }
}
