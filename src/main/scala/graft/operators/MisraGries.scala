package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Misra-Gries heavy-hitters summary: one streaming pass with at most k-1
  * counters per task, merged with the mergeable-summaries rule (Agarwal et
  * al., PODS 2012) — combine counts, subtract the k-th largest, drop
  * non-positive. The merged summary retains EVERY item whose true frequency
  * exceeds n/k, with per-item undercount at most n/k.
  *
  * Scale shape: executor state is a constant-size map (k-1 entries); the
  * driver sees only numPartitions * (k-1) summary rows, folded in partition
  * order for determinism — summary state, not data, the same discipline as
  * [[BloomFilter.build]]'s bitset. The summary is a candidate PRUNER:
  * callers recount the <=k-1 candidates exactly in a second (filtered,
  * map-side-combinable) pass, so downstream results never depend on the
  * sketch's counting error, only on its retention guarantee.
  */
object MisraGries {

  /** One-pass candidate summary of `items` (first column, cast to string;
    * nulls skipped). Returns (item, undercounted weight), count-descending
    * with item tiebreak. At most k-1 entries.
    *
    * DETERMINISM: MG merge is order-sensitive in its counts (every merge
    * order satisfies the bounds, but different orders can keep different
    * near-threshold candidates), and treeAggregate combines partition
    * summaries in task-COMPLETION order. So partition summaries are
    * collected with their index — numPartitions * (k-1) rows, summary
    * state like the Bloom/codebook collects, never data — and folded in
    * partition order: same input + partitioning => same summary, which is
    * what makes MgStream's replayed-microbatch partitions byte-stable. */
  def summarize(items: DataFrame, k: Int): Seq[(String, Long)] = {
    require(k >= 2, "k must be >= 2")
    val name = items.columns.head
    val ds = items.select(col(name).cast("string"))
      .filter(col(name).isNotNull)
      .as(Encoders.STRING)
    val parts = ds.rdd.mapPartitionsWithIndex { (i, it) =>
      val m = it.foldLeft(mutable.Map.empty[String, Long])((acc, x) => add(acc, x, k))
      Iterator.single((i, m.toSeq))
    }.collect().sortBy(_._1)
    val m = parts.foldLeft(mutable.Map.empty[String, Long]) { case (acc, (_, s)) =>
      merge(acc, mutable.Map(s: _*), k)
    }
    m.toSeq.sortBy { case (t, c) => (-c, t) }
  }

  /** Merge pre-computed summaries (e.g. per-microbatch store partitions)
    * with the same rule the treeAggregate combiner uses. Mergeability
    * (Agarwal et al.) makes the retention/undercount bounds hold for the
    * TOTAL stream regardless of how it was split — this is what lets a
    * streaming store keep one k-1-row summary per batch and fold at read
    * time. Summaries are folded in the given order; callers pass a
    * deterministic order (e.g. batch id) for reproducible counts. */
  def mergeSummaries(summaries: Iterable[Seq[(String, Long)]], k: Int): Seq[(String, Long)] = {
    require(k >= 2, "k must be >= 2")
    val acc = mutable.Map.empty[String, Long]
    summaries.foreach { s => merge(acc, mutable.Map(s: _*), k) }
    acc.toSeq.sortBy { case (t, c) => (-c, t) }
  }

  /** Classic MG step: increment a tracked item, adopt into a free counter,
    * or decrement everything (dropping zeros) when all k-1 are taken. */
  private def add(m: mutable.Map[String, Long], item: String, k: Int): mutable.Map[String, Long] = {
    m.get(item) match {
      case Some(c) => m(item) = c + 1
      case None if m.size < k - 1 => m(item) = 1L
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (key, c) => if (c == 1L) dead += key else m(key) = c - 1 }
        dead.foreach(m.remove)
    }
    m
  }

  /** Mergeable-summaries combine: sum counts, then restore the <=k-1 bound
    * by subtracting the k-th largest count from every entry (equivalent to
    * that many simultaneous MG decrements) and dropping non-positives. */
  private def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long],
    k: Int): mutable.Map[String, Long] = {
    b.foreach { case (key, c) => a(key) = a.getOrElse(key, 0L) + c }
    if (a.size > k - 1) {
      val pivot = a.values.toArray.sortBy(-_).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (key, c) => if (c - pivot <= 0L) dead += key else a(key) = c - pivot }
      dead.foreach(a.remove)
    }
    a
  }
}
