package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Z-order: the interleave must match a bit-twiddling reference, and the
  * clustered layout must actually localize range predicates on EVERY
  * clustered dimension (the whole point — each dimension's filter touches
  * few partitions, the pruning proxy for parquet row-group min/max). */
class ZOrderSpec extends SparkSpec {

  private def refZ(a: Long, b: Long): Long = {
    def clamp(x: Long) = math.min(math.max(x, 0L), 65535L)
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((clamp(a) >> i) & 1L) << (i * 2)
      z |= ((clamp(b) >> i) & 1L) << (i * 2 + 1)
    }
    z
  }

  test("zValue matches the reference interleave, including clamping") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (70000L, -5L), (12345L, 54321L), (255L, 256L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")))).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => refZ(a, b) })
  }

  test("interleave is monotone per dimension when the other is fixed") {
    import spark.implicits._
    val rows = (0L until 200L).map(a => (a, 37L))
    val got = rows.toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")))).as[Long].collect()
    assert(got.toSeq == got.toSeq.sorted)
  }

  test("cluster tolerates an empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ZOrder.cluster(empty, Seq("a", "b"), 4).count() == 0)
  }

  test("cluster degrades gracefully when a non-first key column is all null") {
    import spark.implicits._
    // dim b carries no ordering information — it must contribute a constant,
    // not throw; ordering degrades to single-dimension clustering on a
    val df = (1L to 100L).map(i => (i, Option.empty[java.lang.Long])).toDF("a", "b")
    val out = ZOrder.cluster(df, Seq("a", "b"), 4)
    assert(out.count() == 100)
    // and the fully-null-keys case (both dims null) also survives
    val allNull = (1L to 10L)
      .map(_ => (Option.empty[java.lang.Long], Option.empty[java.lang.Long]))
      .toDF("a", "b")
    assert(ZOrder.cluster(allNull, Seq("a", "b"), 2).count() == 10)
  }

  test("clustering localizes range filters on both dimensions") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val parts = 16
    val clustered = ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), parts)
      .withColumn("pid", spark_partition_id())
      .cache()
    val baseline = li.repartition(parts)
      .withColumn("pid", spark_partition_id())
      .cache()
    try {
      val maxPart = clustered.agg(max("l_partkey")).first().getLong(0)
      val maxSupp = clustered.agg(max("l_suppkey")).first().getLong(0)
      def touched(df: org.apache.spark.sql.DataFrame,
                  cond: org.apache.spark.sql.Column): Long =
        df.filter(cond).select("pid").distinct().count()
      // a 1/8 slab on one dim of a 2-d z-curve fragments into at most
      // ~2^3 runs — a minority of the 16 range partitions; the hash
      // layout (what you get without clustering) touches ~all of them
      for ((name, cond) <- Seq(
        ("partkey", col("l_partkey") <= maxPart / 8),
        ("suppkey", col("l_suppkey") <= maxSupp / 8))) {
        val z = touched(clustered, cond)
        val h = touched(baseline, cond)
        assert(z <= 10, s"$name filter touched $z/$parts clustered partitions")
        assert(z < h, s"$name: clustered $z not better than hash layout $h")
      }
    } finally { clustered.unpersist(); baseline.unpersist() }
  }
}
