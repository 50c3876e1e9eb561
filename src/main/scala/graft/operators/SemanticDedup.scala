package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cell-bounded candidate pairs for embedding-cosine (semantic) dedup.
  *
  * The IVF trade in the semantic-dedup pipeline (q96) is per-cell quadratic
  * pairwise work: fine when k-means keeps cells balanced, pathological when
  * one cell degenerates — at 100x, a cell holding 1% of a 10^9-vector corpus
  * is a 10^14-pair join. Nothing in the plain label-equi-join bounds that.
  *
  * This operator is the scale guard: cells at or under `maxCellSize` pair
  * exactly as before (identity — the common case and the oracle-gated one);
  * a cell OVER the cap is refined by random-hyperplane sub-buckets
  * ([[Vectors.hyperplaneBucket]], the same deterministic integer matrix the
  * ANN path uses) with just enough bits to bring the EXPECTED sub-cell size
  * under the cap, and pairs form within (label, sub-bucket) only.
  *
  * The refinement is the standard SRP-LSH recall trade, stated honestly:
  * a pair at cosine >= `threshold` crosses one hyperplane with probability
  * acos(threshold)/pi (~0.045 at 0.99), so with b refinement bits the pair
  * stays co-bucketed with probability ~(1 - 0.045)^b — ~96% at the 1 bit a
  * 2x-over-cap cell needs, ~83% at 4 bits. Exactness is restored by raising
  * `maxCellSize` or re-clustering (more k-means cells); the cap's job is
  * that NO cell, however degenerate, can take the job down.
  */
object SemanticDedup {

  /** Max refinement bits — caps the hyperplane matrix size; 2^16 sub-cells
    * is a 65536x reduction of a degenerate cell's pair count. */
  val MaxRefineBits = 16

  /** Candidate pairs (`doc_a`, `doc_b`) with `doc_a < doc_b` and cosine >=
    * `threshold`, within label cells bounded by `maxCellSize`.
    *
    * `corpus` must carry `idCol` (long), `labelCol`, `qvCol` (array<long>,
    * the quantized vector) and `normCol` (double, its L2 norm). `dim` is the
    * vector dimensionality (sizes the hyperplane matrix).
    */
  def boundedPairs(corpus: DataFrame, idCol: String, labelCol: String,
                   qvCol: String, normCol: String, dim: Int,
                   threshold: Double, maxCellSize: Int): DataFrame = {
    require(maxCellSize > 1, s"maxCellSize must be > 1, got $maxCellSize")
    val matrix = Vectors.hyperplaneMatrix(MaxRefineBits, dim)
    // per-cell sizes: one tiny aggregate, broadcast back onto the corpus
    val sizes = corpus.groupBy(col(labelCol)).agg(count(lit(1)).as("__cell_n"))
    // bits = ceil(log2(n / cap)) for oversized cells, else 0 — the fewest
    // hyperplanes that bring the expected sub-cell under the cap
    val bits = ceil(log(2.0, col("__cell_n").cast(DoubleType) / maxCellSize))
      .cast("int")
    val refined = corpus.join(broadcast(sizes), Seq(labelCol))
      .withColumn("__bits",
        when(col("__cell_n") <= maxCellSize, lit(0))
          .otherwise(least(bits, lit(MaxRefineBits))))
      .withColumn("__sub",
        when(col("__bits") === 0, lit(0L)).otherwise(
          pmod(Vectors.hyperplaneBucket(col(qvCol), matrix),
            // 2^bits; exact in double well past MaxRefineBits
            pow(lit(2.0), col("__bits")).cast("long"))))
      .drop("__cell_n", "__bits")
    val a = refined.select(col(labelCol), col("__sub"),
      col(idCol).as("__ida"), col(qvCol).as("__qa"), col(normCol).as("__na"))
    val b = refined.select(col(labelCol), col("__sub"),
      col(idCol).as("__idb"), col(qvCol).as("__qb"), col(normCol).as("__nb"))
    a.join(b, Seq(labelCol, "__sub"))
      .where(col("__ida") < col("__idb"))
      .where((Vectors.dotLong(col("__qa"), col("__qb")).cast(DoubleType) /
        (col("__na") * col("__nb"))) >= threshold)
      .select(col("__ida").as("doc_a"), col("__idb").as("doc_b"))
  }
}
