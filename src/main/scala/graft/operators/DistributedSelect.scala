package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact order statistics without a global sort: binary search over the
  * VALUE DOMAIN of an integer column. Each probe is one map-side counting
  * aggregate ("how many values <= mid"), so selecting the k-th smallest of
  * any corpus costs log2(domain range) cheap scans — ~40 for full-range
  * longs, ~24 for cent-quantized prices — instead of the shuffle-the-world
  * total sort or the single-partition window an ORDER BY/ntile would plan.
  * The input should be cached by the caller when several ranks are probed
  * (the counting passes re-scan it).
  *
  * This is the exact companion to the q123 histogram sketch: the sketch
  * answers many quantiles approximately in one pass; this answers one rank
  * exactly in log passes. Both avoid global order.
  */
object DistributedSelect {

  /** k-th smallest (1-indexed, k in [1, n]) of the frame's first column
    * (integer-typed). Deterministic: the loop converges to the unique
    * value v where count(<= v) >= k and count(<= v-1) < k. */
  def kth(values: DataFrame, k: Long): Long = {
    require(k >= 1, "k is 1-indexed")
    val c = col(values.columns.head)
    val bounds = values.agg(min(c).cast("long"), max(c).cast("long")).head()
    require(!bounds.isNullAt(0), "kth of an empty frame")
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    var lastCnt = -1L
    while (lo < hi) {
      // hi - lo >= 0, so this midpoint floors correctly for negative lo
      // too (caveat: a domain wider than Long.Max/2 would overflow the
      // difference — no quantized column is)
      val mid = lo + (hi - lo) / 2
      val cnt = values.filter(c <= mid).count()
      lastCnt = cnt
      if (cnt >= k) hi = mid else lo = mid + 1
    }
    // enforce the documented k <= n upper bound: an out-of-range rank
    // otherwise converges silently onto max(values). Reuse the last probe
    // when it already certifies the result (cnt >= k at the final hi).
    if (lastCnt < k && values.filter(c <= lo).count() < k)
      throw new IllegalArgumentException(
        s"rank k=$k exceeds the row count (column max reached first)")
    lo
  }
}
