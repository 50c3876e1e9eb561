package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{DotLong, L2SqLong}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Parity lock for the native vector kernels: native == composed-Column
  * forms on random data (codegen path), plus the null contract (null array /
  * length mismatch -> null) on both eval paths. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val seed = org.scalacheck.rng.Seed(11L)
  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, seed).get

  test("native == composed on random vectors (codegen path)") {
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1000000L, 1000000L)).map(_.toArray)
    val rows = samples(Gen.zip(vecGen, vecGen), 300)
    val df = rows.toDF("a", "b")
      .withColumn("nd", Vectors.dotLong(col("a"), col("b")))
      .withColumn("cd", Vectors.dotLongComposed(col("a"), col("b")))
      .withColumn("nl", Vectors.l2SqLong(col("a"), col("b")))
      .withColumn("cl", Vectors.l2SqLongComposed(col("a"), col("b")))
    assert(df.filter(!(col("nd") <=> col("cd")) || !(col("nl") <=> col("cl"))).count() === 0)
  }

  test("null contract: null input or length mismatch -> null, like zip_with") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
      (None, Some(Seq(3L, 4L))),
      (Some(Seq(1L, 2L)), None),
      (Some(Seq(1L, 2L, 3L)), Some(Seq(3L, 4L)))) // length mismatch
      .toDF("a", "b")
      .withColumn("nd", Vectors.dotLong(col("a"), col("b")))
      .withColumn("cd", Vectors.dotLongComposed(col("a"), col("b")))
    val got = df.select(col("nd"), col("cd")).collect()
    assert(got(0).getLong(0) === 11L && got(0).getLong(1) === 11L)
    (1 until 4).foreach { i =>
      assert(got(i).isNullAt(0) === got(i).isNullAt(1), s"row $i")
      assert(got(i).isNullAt(0), s"row $i should be null")
    }
  }

  test("interpreted eval matches codegen semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def arrLit(xs: Seq[Long]) =
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    assert(DotLong(arrLit(Seq(2L, 3L)), arrLit(Seq(5L, 7L))).eval(null) === 31L)
    assert(L2SqLong(arrLit(Seq(2L, 3L)), arrLit(Seq(5L, 7L))).eval(null) === 25L)
    assert(DotLong(arrLit(Seq(1L)), arrLit(Seq(1L, 2L))).eval(null) === null)
  }
}
