package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental IVF index maintenance — the embeddings counterpart of
  * IncrementalDedup's daily-ingest loop. A 100 TB embedding corpus is
  * clustered ONCE (k-means — see queries.PipelineQueries q54); after that,
  * each ingest batch of new/updated vectors is assigned to its nearest
  * stored centroid MAP-SIDE (the k x dim centroid scalars broadcast as
  * literals — no shuffle, no join) and its (vec_id, cluster, dist) code
  * row is folded into the persisted code store, which the IVF search path
  * prunes by cell label. Per-batch work is O(delta x k); the corpus is
  * never rescanned.
  *
  * The code store follows KeyedStore's latest-content-wins discipline: a
  * replayed crashed batch appends nothing, a RE-EMBEDDED vector (same
  * vec_id, new embedding -> different code) supersedes its stale row —
  * searches must prune by the cell the vector is in NOW, not the cell its
  * old embedding hashed to.
  *
  * Quantized-integer arithmetic end-to-end (vectors scaled x1e6 and
  * floored) so assignment is engine-exact — same convention as q54, whose
  * assignment kernel lives here (single source of truth for both).
  */
object IvfIncremental {

  /** Squared L2 distance to a literal centroid — codegen'd zip_with +
    * aggregate, no UDF. */
  def distTo(vec: Column, centroid: Seq[Long]): Column =
    aggregate(
      zip_with(vec, typedLit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Assign each vector to the nearest centroid (ties -> lowest cluster
    * id), as (vec_id, v, cluster, dist). Struct comparison is
    * lexicographic, so `array_min` over (dist, cid) structs is exactly the
    * oracle's `row_number() OVER (ORDER BY dist, cid) = 1`. Pure map-side:
    * the centroids are literal columns, broadcast with the plan. */
  def assign(vecs: DataFrame, cents: Seq[(Int, Seq[Long])]): DataFrame = {
    val candidates = cents.map { case (cid, cv) =>
      struct(distTo(col("v"), cv).as("dist"), lit(cid).as("cid"))
    }
    val best = array_min(array(candidates: _*))
    vecs.select(col("vec_id"), col("v"),
      best.getField("cid").as("cluster"), best.getField("dist").as("dist"))
  }

  /** Code rows for a (vec_id, v) batch under the given centroids. */
  def codes(vecs: DataFrame, cents: Seq[(Int, Seq[Long])]): DataFrame =
    assign(vecs, cents).select(col("vec_id"),
      col("cluster").cast("long").as("cluster"), col("dist"))

  /** Initialize the code store: assign and persist the full corpus once. */
  def initIndex(storeDir: String, vecs: DataFrame,
                cents: Seq[(Int, Seq[Long])]): Unit =
    codes(vecs, cents).write.mode(SaveMode.Overwrite).parquet(storeDir)

  /** One ingest round: assign the delta against the stored centroids and
    * fold its codes into the store (append new vec_ids, skip unchanged
    * replays, supersede re-embedded vectors). */
  def appendBatch(spark: SparkSession, storeDir: String, delta: DataFrame,
                  cents: Seq[(Int, Seq[Long])]): Unit =
    KeyedStore.fold(spark, storeDir, codes(delta, cents), "vec_id")
}
