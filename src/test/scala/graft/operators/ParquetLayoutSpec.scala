package graft.operators

import graft.SparkSpec
import graft.plans.QueryMetrics
import org.apache.spark.sql.functions._

/** Bloom-filtered parquet layout: a point lookup on a SCATTERED key (which
  * min/max row-group stats cannot prune) must read far fewer bytes from the
  * bloom-filtered layout than from the plain one. */
class ParquetLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def dataset() =
    // xxhash scatters the key so every row group spans ~the full range:
    // min/max pruning is useless by construction, blooms are the only
    // thing that can skip groups
    spark.range(0, 200000).select(
      xxhash64(col("id")).as("k"),
      col("id"),
      concat(lit("payload-"), col("id").cast("string"),
        lit("-" * 100)).as("pad"))

  test("bloom filters prune row groups for point lookups; plain layout cannot") {
    val base = java.nio.file.Files.createTempDirectory("bloom").toString
    val df = dataset()
    val probe = df.select("k").orderBy("id").limit(1).collect()(0).getLong(0)

    // ~2000 rows land per 256 KiB row group; ndv is sized per GROUP
    ParquetLayout.writeWithBloom(df, s"$base/bloomed", Seq("k"),
      rowGroupBytes = 1L << 18, expectedDistinct = 4000L)
    // the honest baseline models the 100 TB state: a remote-key column too
    // high-cardinality for dictionary pages (dictionary filtering would
    // otherwise already skip groups exactly — blooms exist for when it
    // can't), same row-group size, no bloom
    df.write.mode("overwrite")
      .option("parquet.block.size", (1L << 18).toString)
      .option("parquet.enable.dictionary#k", "false")
      .parquet(s"$base/plain")

    def lookupBytes(dir: String): (Long, Long) = {
      val (rows, m) = QueryMetrics.measureAction(spark)(
        ParquetLayout.read(spark, dir).where(col("k") === probe).collect())
      assert(rows.length == 1 && rows(0).getAs[Long]("k") == probe)
      (m.inputBytes, m.inputRecords)
    }
    val (bloomBytes, bloomRecords) = lookupBytes(s"$base/bloomed")
    val (plainBytes, plainRecords) = lookupBytes(s"$base/plain")
    info(s"bloom: bytes=$bloomBytes records=$bloomRecords; " +
      s"plain: bytes=$plainBytes records=$plainRecords")
    // records are the pruning ground truth: the plain layout decodes every
    // row (min/max cannot prune a scattered key), the bloomed layout only
    // the handful of row groups whose filter might contain the probe
    assert(plainRecords == 200000L,
      s"plain layout must scan everything, read $plainRecords")
    assert(bloomRecords * 20 < plainRecords,
      s"bloom layout should decode <5% of rows for a point lookup, " +
        s"read $bloomRecords of $plainRecords")
    // the equality filter actually reaches the scan on both layouts
    val plan = ParquetLayout.read(spark, s"$base/bloomed")
      .where(col("k") === probe).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo"))
  }

  test("bloom layout round-trips all rows and columns intact") {
    val dir = java.nio.file.Files.createTempDirectory("bloom2").toString
    val df = dataset()
    ParquetLayout.writeWithBloom(df, dir, Seq("k"))
    val back = ParquetLayout.read(spark, dir)
    assert(back.count() == 200000L)
    assert(back.columns.sorted.toSeq == Seq("id", "k", "pad"))
    assert(back.agg(sum("id")).first().getLong(0) == (0L until 200000L).sum)
  }
}
