package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact order statistics without a global sort: m-ary search over the
  * VALUE DOMAIN of an integer column. Each probe round is one map-side
  * counting aggregate that tests [[Probes]] midpoints per still-open
  * rank, so the bracket shrinks by (Probes+1)x per round and selecting
  * any set of ranks costs log_{Probes+1}(domain range) cheap scans —
  * ~8 for cent-quantized prices at 8-ary — instead of the
  * shuffle-the-world total sort or the single-partition window an
  * ORDER BY/ntile would plan. The extra conditional sums per round are
  * map-side arithmetic riding a scan the round pays anyway; the rounds
  * themselves are the scarce resource (each is a full pass + a driver
  * turnaround), which is why fewer, fatter probes win (guide §1.2:
  * passes first). Multiple ranks share rounds: `kthMulti` probes every
  * still-open rank's midpoints in the SAME aggregate, so
  * median+p90+p99 cost one scan per round, not three. The input should
  * be cached by the caller (the rounds re-scan it).
  *
  * This is the exact companion to the q123 histogram sketch: the sketch
  * answers many quantiles approximately in one pass; this answers exact
  * ranks in log passes. Both avoid global order.
  */
object DistributedSelect {

  /** Probe points per still-open rank per round: 7 midpoints divide the
    * bracket 8 ways, so rounds drop 3x vs binary for ~7x the (map-side,
    * near-free) conditional sums per scan. */
  private val Probes = 7

  /** The probe points for bracket [lo, hi], strictly inside [lo, hi-1],
    * deduplicated and sorted (narrow brackets yield fewer points). The
    * exact (width * j) / 8 form is used while it provably cannot overflow
    * (width <= Long.Max / Probes); past that, step-first division keeps
    * the full 64-bit domain safe — probe placement shifts by < 1 step,
    * which affects only the convergence constant, never the fixpoint
    * (r13-advice finding: the multiply-first form silently shrank the
    * safe domain to ~Long.Max/7). */
  private def probePoints(lo: Long, hi: Long): Seq[Long] = {
    val width = hi - lo
    val pts =
      if (width <= Long.MaxValue / Probes)
        (1 to Probes).map(j => lo + width * j / (Probes + 1))
      else {
        val step = width / (Probes + 1)
        (1 to Probes).map(j => lo + step * j)
      }
    pts.distinct.filter(_ < hi)
  }

  /** Tighten [lo, hi] from probe counts: hi drops to the smallest probe
    * whose count reaches k; lo passes the largest probe whose count
    * misses k. Same fixpoint as binary search — the unique v with
    * count(<= v) >= k and count(<= v-1) < k — reached in a third of the
    * rounds. */
  private def tighten(lo: Long, hi: Long, k: Long,
                      counted: Seq[(Long, Long)]): (Long, Long) = {
    val hit = counted.collect { case (m, c) if c >= k => m }
    val miss = counted.collect { case (m, c) if c < k => m }
    (if (miss.nonEmpty) miss.max + 1 else lo,
      if (hit.nonEmpty) math.min(hi, hit.min) else hi)
  }

  /** k-th smallest (1-indexed, k in [1, n]) of the frame's first column
    * (integer-typed). Deterministic: converges to the unique value v where
    * count(<= v) >= k and count(<= v-1) < k. Throws on k > n. */
  def kth(values: DataFrame, k: Long): Long =
    kthMulti(values, Seq(k)).head

  /** Per-GROUP exact rank selection, all groups sharing each round's scan:
    * the frame's columns are (group: String, v: integer); `ranks` gives
    * each group's 1-indexed target rank. Every round broadcasts the active
    * groups' probe points, joins them on (tiny, dimension-sized), and
    * counts per (group, probe) in one map-side-combinable aggregate — so
    * per-source medians over any corpus cost log_{Probes+1}(domain) scans
    * total, not a per-group sort or a partitionBy(group) window that
    * would drag each group into one partition. Driver state is
    * O(groups x Probes): a dimension table, not data. */
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
      val mids: Seq[(String, Long)] = ranks.keys.toSeq
        .filter(grp => lo(grp) < hi(grp))
        .flatMap(grp => probePoints(lo(grp), hi(grp)).map(grp -> _))
      val midDf = mids.toDF(g, "__mid")
      val counts = values.join(broadcast(midDf), Seq(g))
        .groupBy(col(g), col("__mid"))
        .agg(sum(when(col(v) <= col("__mid"), 1L).otherwise(0L)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      mids.groupBy(_._1).foreach { case (grp, pts) =>
        val counted = pts.map { case (_, m) => m -> counts.getOrElse((grp, m), 0L) }
        val (nlo, nhi) = tighten(lo(grp), hi(grp), ranks(grp), counted)
        lo += grp -> nlo; hi += grp -> nhi
      }
    }
    ranks.keys.map(grp => grp -> lo(grp)).toMap
  }

  /** All requested ranks in one synchronized domain search: one counting
    * aggregate per round covering every still-open rank's probe points. */
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
      // hi - lo >= 0, so the probe points floor correctly for negative lo
      // too (caveat: a domain SPAN wider than Long.Max overflows the
      // difference itself — e.g. a full-range 64-bit hash column; split
      // such a search at 0, or quantize. probePoints is overflow-safe for
      // any representable width)
      val pts: Seq[(Int, Long)] =
        active.flatMap(i => probePoints(lo(i), hi(i)).map(i -> _))
      val probes = pts.map { case (_, m) => sum(when(c <= m, 1L).otherwise(0L)) }
      val row = values.agg(probes.head, probes.tail: _*).head()
      pts.zipWithIndex.groupBy(_._1._1).foreach { case (i, entries) =>
        val counted = entries.map { case ((_, m), j) => m -> row.getLong(j) }
        val (nlo, nhi) = tighten(lo(i), hi(i), ks(i), counted)
        lo(i) = nlo; hi(i) = nhi
      }
    }
    ks.indices.map(lo(_))
  }
}
