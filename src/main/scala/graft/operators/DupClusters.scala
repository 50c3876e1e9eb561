package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assignment: connected components over the near-dup
  * pair graph, via min-label propagation to a fixpoint. Each doc ends up
  * labeled with the smallest doc id reachable through dup pairs — the
  * canonical representative used to drop all-but-one copy of a dup group.
  *
  * Scale shape: each iteration is one join + one aggregation on the edge
  * list (edges ~ near-dup pairs, tiny relative to the corpus); iteration
  * count is the graph diameter (near-dup clusters are shallow — a handful
  * of rounds). Labels are checkpointed per round to keep plans flat.
  */
object DupClusters {

  /** pairs: (doc_a, doc_b) with doc_a < doc_b. Returns (doc_id, cluster_id)
    * for every doc appearing in a pair; cluster_id = min id in component. */
  def assign(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .cache()
    var labels = edges.select(col("u").as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "v"), Seq("v"))
        .groupBy(col("u").as("doc_id"))
        .agg(min(col("cluster_id")).as("n_min"))
      // localCheckpoint truncates the per-round lineage so each iteration
      // costs one constant-size join, not a replay of all prior rounds.
      // The convergence flag rides along in the checkpointed frame, so the
      // check is a cheap scan of the materialized partitions — one join job
      // per round total, not a second join+shuffle for change detection.
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("cluster_id"),
          (col("n_min").isNotNull && col("n_min") < col("cluster_id"))
            .cast("long").as("__changed"))
        .localCheckpoint(true)
      // coalesce: sum over an empty frame (no near-dup pairs) is NULL.
      val changed =
        next.agg(coalesce(sum(col("__changed")), lit(0L))).first().getLong(0)
      labels = next.drop("__changed")
      converged = changed == 0
      iter += 1
    }
    // Non-convergence means WRONG labels (a component wider than maxIters
    // hops still carries split cluster ids), and a dedup run against split
    // representatives silently keeps duplicates — fail loudly instead.
    // Min-label propagation moves one hop per round, so maxIters bounds the
    // component diameter the caller expects; raise it for chainier corpora.
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters rounds — a dup " +
          s"component's diameter exceeds maxIters; raise maxIters")
    labels
  }
}
