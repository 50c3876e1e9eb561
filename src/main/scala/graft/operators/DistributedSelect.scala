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

  /** Per-GROUP exact rank selection, all groups sharing each round's scan:
    * the frame's columns are (group: String, v: integer); `ranks` gives
    * each group's 1-indexed target rank. Every round broadcasts the active
    * groups' midpoints, joins them on (tiny, dimension-sized), and counts
    * per group in one map-side-combinable aggregate — so per-source
    * medians over any corpus cost log2(domain) scans total, not a
    * per-group sort or a partitionBy(group) window that would drag each
    * group into one partition. Driver state is O(groups): a dimension
    * table, not data. */
  def groupKth(values: DataFrame, ranks: Map[String, Long]): Map[String, Long] = {
    require(ranks.nonEmpty && ranks.values.forall(_ >= 1), "ranks are 1-indexed")
    val Seq(g, v) = values.columns.toSeq.take(2)
    val spark = values.sparkSession
    import spark.implicits._
    val init = values.groupBy(col(g)).agg(
      min(col(v)).cast("long").as("lo"), max(col(v)).cast("long").as("hi"),
      count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ranks.foreach { case (grp, k) =>
      val n = init.getOrElse(grp, throw new IllegalArgumentException(s"no rows for group $grp"))._3
      require(k <= n, s"rank $k exceeds group $grp's row count $n")
    }
    var lo = ranks.map { case (grp, _) => grp -> init(grp)._1 }
    var hi = ranks.map { case (grp, _) => grp -> init(grp)._2 }
    while (ranks.keys.exists(grp => lo(grp) < hi(grp))) {
      val mids = ranks.keys.filter(grp => lo(grp) < hi(grp))
        .map(grp => grp -> (lo(grp) + (hi(grp) - lo(grp)) / 2)).toMap
      val midDf = mids.toSeq.toDF(g, "__mid")
      val counts = values.join(broadcast(midDf), Seq(g))
        .groupBy(col(g))
        .agg(sum(when(col(v) <= col("__mid"), 1L).otherwise(0L)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      mids.foreach { case (grp, mid) =>
        if (counts.getOrElse(grp, 0L) >= ranks(grp)) hi += grp -> mid
        else lo += grp -> (mid + 1)
      }
    }
    ranks.keys.map(grp => grp -> lo(grp)).toMap
  }

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
