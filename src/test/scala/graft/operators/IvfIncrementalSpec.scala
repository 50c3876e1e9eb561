package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance: map-side nearest-centroid assignment and
  * the latest-content-wins code store (via KeyedStore). */
class IvfIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val cents: Seq[(Int, Seq[Long])] =
    Seq((0, Seq(0L, 0L)), (1, Seq(100L, 0L)))

  private def vecs(rows: (Long, Seq[Long])*): DataFrame =
    rows.toDF("vec_id", "v")

  private def codeMap(df: DataFrame): Map[Long, (Long, Long)] =
    df.select("vec_id", "cluster", "dist").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("assign picks the nearest centroid, ties to the lowest cluster id") {
    val out = codeMap(IvfIncremental.codes(
      vecs(10L -> Seq(10L, 0L), 11L -> Seq(60L, 0L), 12L -> Seq(50L, 0L)),
      cents))
    assert(out(10L) === (0L, 100L))   // 10^2 vs 90^2
    assert(out(11L) === (1L, 1600L))  // 60^2=3600 vs 40^2=1600
    assert(out(12L) === (0L, 2500L), "equidistant -> lowest cid wins")
  }

  test("code store: append, replay without bloat, re-embedding supersedes") {
    val dir = java.nio.file.Files.createTempDirectory("ivfinc").toString + "/codes"
    IvfIncremental.initIndex(dir, vecs(1L -> Seq(5L, 0L), 2L -> Seq(90L, 0L)), cents)

    // a new vector appends
    IvfIncremental.appendBatch(spark, dir, vecs(3L -> Seq(95L, 0L)), cents)
    val afterAppend = codeMap(spark.read.parquet(dir))
    assert(afterAppend.keySet === Set(1L, 2L, 3L))
    assert(afterAppend(3L) === (1L, 25L))

    // a crashed batch's replay appends nothing
    IvfIncremental.appendBatch(spark, dir, vecs(3L -> Seq(95L, 0L)), cents)
    assert(spark.read.parquet(dir).groupBy("vec_id").count()
      .filter(col("count") > 1).count() === 0L, "replay must not duplicate")

    // a RE-EMBEDDED vector moves cells: its code row must be replaced, or
    // IVF search would prune to the cell its OLD embedding hashed to
    IvfIncremental.appendBatch(spark, dir, vecs(1L -> Seq(98L, 0L)), cents)
    val afterMove = codeMap(spark.read.parquet(dir))
    assert(afterMove.keySet === Set(1L, 2L, 3L))
    assert(afterMove(1L) === (1L, 4L), "new embedding's cell, exactly once")
  }

  test("KeyedStore compares null-safely: null values neither block the " +
    "replay skip nor force a rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("keyed").toString + "/st"
    Seq((1L, Some(7L), None: Option[String]), (2L, None, Some("x")))
      .toDF("k", "a", "b").write.parquet(dir)
    // identical delta (with the same nulls) must append nothing
    KeyedStore.fold(spark,
      dir, Seq((1L, Some(7L), None: Option[String])).toDF("k", "a", "b"), "k")
    assert(spark.read.parquet(dir).count() === 2L)
    // a null -> value change is a real change: the row is superseded
    KeyedStore.fold(spark,
      dir, Seq((2L, Some(9L), Some("x"))).toDF("k", "a", "b"), "k")
    val r2 = spark.read.parquet(dir).filter(col("k") === 2L).collect()
    assert(r2.length === 1 && r2.head.getLong(1) === 9L)
  }
}
