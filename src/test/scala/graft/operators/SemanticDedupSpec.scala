package graft.operators

import graft.SparkSpec
import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The cell-size guard for semantic dedup: identity under the cap,
  * hyperplane refinement (bounded sub-cells, preserved near-dup recall)
  * over it. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic pseudo-random vector for id i, plus planted near-dups:
    * ids >= 100000 are a tiny perturbation of (id - 100000)'s vector. */
  private def corpus(ids: Seq[Long], label: Long): DataFrame = {
    val rows = ids.map { i =>
      val base = if (i >= 100000L) i - 100000L else i
      val v = (0 until Dim).map { d =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$base:$d".getBytes("UTF-8")).take(4)
        val u = java.nio.ByteBuffer.wrap(h).getInt.toLong
        val raw = (u % 100000L) + 100000L // positive, spread
        if (i >= 100000L) raw + (i % 7L) else raw // near-dup: tiny nudge
      }
      (i, label, v)
    }
    rows.toDF("vec_id", "label", "qv")
      .withColumn("norm", sqrt(Vectors.dotLong(col("qv"), col("qv")).cast(DoubleType)))
  }

  private def pairsOf(df: DataFrame, cap: Int): Set[(Long, Long)] =
    SemanticDedup.boundedPairs(df, "vec_id", "label", "qv", "norm", Dim,
      threshold = 0.999, maxCellSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("under the cap the pairs are exactly the plain within-cell pairs") {
    val df = corpus((1L to 40L) ++ Seq(100005L, 100017L), label = 1L)
    val bounded = pairsOf(df, cap = 1024)
    // plain quadratic reference
    val a = df.select(col("label"), col("vec_id").as("va"), col("qv").as("qa"), col("norm").as("na"))
    val b = df.select(col("label"), col("vec_id").as("vb"), col("qv").as("qb"), col("norm").as("nb"))
    val plain = a.join(b, Seq("label")).where(col("va") < col("vb"))
      .where((Vectors.dotLong(col("qa"), col("qb")).cast(DoubleType) /
        (col("na") * col("nb"))) >= 0.999)
      .select("va", "vb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded == plain)
    assert(bounded.contains((5L, 100005L)) && bounded.contains((17L, 100017L)))
  }

  test("a degenerate cell is refined: planted near-dups survive, pair work shrinks") {
    // one cell of 600 vectors + 30 planted near-dups, cap 64 -> 4 bits of
    // hyperplane refinement (expected sub-cell ~40)
    val planted = (1L to 30L).map(_ + 100000L)
    val df = corpus((1L to 600L) ++ planted, label = 7L)
    val bounded = pairsOf(df, cap = 64)
    // recall on the planted near-dups: each (i, i+100000) pair is at
    // cosine ~1; with 4 bits the expected survival is ~0.83^... — but the
    // perturbation here is TINY (e-5 relative), so sign flips are rare;
    // require >= 80% observed
    val kept = planted.count(p => bounded.contains((p - 100000L, p)))
    assert(kept >= 24, s"only $kept/30 planted near-dup pairs survived refinement")
    // and the refinement actually bounded the join: sub-cells are all well
    // under the original 630-vector cell
    val matrix = Vectors.hyperplaneMatrix(SemanticDedup.MaxRefineBits, Dim)
    val subSizes = df
      .withColumn("sub", pmod(Vectors.hyperplaneBucket(col("qv"), matrix), lit(16L)))
      .groupBy("sub").count().collect().map(_.getLong(1))
    assert(subSizes.forall(_ < 630L))
    assert(subSizes.length > 1, "refinement produced a single sub-cell — no bound")
  }
}
