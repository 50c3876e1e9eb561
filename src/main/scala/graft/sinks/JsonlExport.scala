package graft.sinks

import graft.functions.expressions.Str2IntHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded JSONL export — the egress format training pipelines actually
  * consume (one JSON object per line, fixed shard count, a manifest the
  * downstream loader can verify).
  *
  * Sharding is KEYED (stable hash of a caller-named key), not round-robin:
  * re-running the export over the same data produces byte-identical shard
  * membership, so downstream caches/resumable loaders stay valid. The
  * manifest carries per-shard row counts and an order-independent content
  * checksum (sum of per-row xxhash64 mod 1e9+7 — small enough that
  * the sum of any realistic row count stays in a long under ANSI mode), all computed distributed
  * in one aggregation — verification never re-reads the export.
  */
object JsonlExport {

  val ShardCol = "shard"
  private val ChecksumMod = 1000000007L

  final case class ShardStat(shard: Int, rows: Long, checksum: Long)

  /** Write `df` as JSONL text files under `dir/shard=N/` plus
    * `dir/manifest.json`;
    * returns the per-shard stats. JSON fields are sorted struct fields in
    * `df` column order; the key column must be present in `df`. */
  def export(df: DataFrame, dir: String, keyCol: String, shards: Int): Seq[ShardStat] = {
    require(shards > 0, "shards must be positive")
    val payload = df.columns.filterNot(_ == ShardCol)
    df.withColumn(ShardCol, pmod(Str2IntHash.str2inthash(col(keyCol)), lit(shards)))
      .withColumn("__line", to_json(struct(payload.map(col).toSeq: _*)))
      .repartition(shards, col(ShardCol))
      .select(col(ShardCol), col("__line"))
      .write.mode("overwrite").partitionBy(ShardCol).text(dir)
    // Stats come from the WRITTEN files, not a second evaluation of the
    // plan: re-deriving from source would let a non-deterministic column
    // (or a source that changed between jobs) publish a manifest that
    // disagrees with the bytes on disk.
    val stats = verify(df.sparkSession, dir)
    val manifest = stats.map(s =>
      s"""{"shard":${s.shard},"rows":${s.rows},"checksum":${s.checksum}}""")
      .mkString("[", ",", "]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "manifest.json"),
      s"""{"shards":$shards,"key":"$keyCol","stats":$manifest}\n""".getBytes("UTF-8"))
    stats
  }

  /** Recompute the manifest stats from an export directory (loader-side
    * verification): same aggregation over the written lines. */
  def verify(spark: SparkSession, dir: String): Seq[ShardStat] =
    spark.read
      .option("basePath", dir)
      .text(s"$dir/$ShardCol=*")
      .withColumn(ShardCol, col(ShardCol).cast("int"))
      .groupBy(col(ShardCol))
      .agg(count(lit(1)).as("rows"),
        sum(pmod(xxhash64(col("value")), lit(ChecksumMod))).as("sum_h"))
      .collect()
      .map(r => ShardStat(r.getInt(0), r.getLong(1), r.getLong(2) % ChecksumMod))
      .sortBy(_.shard).toSeq
}
