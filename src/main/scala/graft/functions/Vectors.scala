package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector primitives (`Array[Float]` columns) for similarity
  * search: dot product, norms, cosine — as codegen'd higher-order functions.
  *
  * Scale shape: brute-force top-k is a map-side cross score + per-query
  * top-k (no full sort); the IVF path prunes candidates by a cluster-id
  * column so only same-cell pairs are scored.
  */
object Vectors {

  /** Dot product of two float-array columns, accumulated in double.
    * `zip_with` + `aggregate` keeps it inside whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast(DoubleType) * v.cast(DoubleType)))

  /** Cosine similarity; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = l2Norm(a) * l2Norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Integer dot product over quantized (Long) vectors — bit-exact across
    * engines, used by the oracle-checked similarity queries. Native codegen
    * kernel ([[graft.functions.expressions.VectorOps]]): one loop per pair
    * instead of an interpreted lambda per element. */
  def dotLong(a: Column, b: Column): Column =
    graft.functions.expressions.VectorOps.dotLong(a, b)

  /** The composed-Column form of [[dotLong]], kept as the parity reference
    * the native kernel is locked against (`VectorOpsSpec`). */
  def dotLongComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Integer squared L2 distance over quantized (Long) vectors (native
    * codegen kernel; see [[dotLong]]). */
  def l2SqLong(a: Column, b: Column): Column =
    graft.functions.expressions.VectorOps.l2SqLong(a, b)

  /** Composed parity reference for [[l2SqLong]]. */
  def l2SqLongComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast(DoubleType) - y.cast(DoubleType)
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic integer hyperplane matrix for random-hyperplane LSH:
    * component (p, i) = (md5("p:i") first-4-bytes mod 2048) - 1024. All
    * integers, no RNG state — the matrix inlines as a literal in any engine
    * (the DuckDB oracles embed the same constants), so bucket assignment is
    * bit-exact everywhere. */
  def hyperplaneMatrix(planes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until planes).map { p =>
      (0 until dim).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$i".getBytes("UTF-8")).take(4)
        val u = java.nio.ByteBuffer.wrap(hex).getInt.toLong & 0xFFFFFFFFL
        (u % 2048L) - 1024L
      }
    }

  /** Random-hyperplane LSH bucket of a quantized (Long) vector: bit p set
    * when the integer dot against plane p is non-negative. Integer
    * arithmetic end to end — sign decisions never ride on float summation
    * order. */
  def hyperplaneBucket(qv: Column, matrix: Seq[Seq[Long]]): Column =
    matrix.zipWithIndex.map { case (plane, p) =>
      when(dotLong(qv, typedlit(plane)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
}
