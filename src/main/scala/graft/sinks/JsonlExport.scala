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
    val stats = verify(df.sparkSession, dir, shards)
    val manifest = stats.map(s =>
      s"""{"shard":${s.shard},"rows":${s.rows},"checksum":${s.checksum}}""")
      .mkString("[", ",", "]")
    // Manifest goes through the SAME filesystem abstraction as the data:
    // a local java.nio path would break the moment `dir` is an HDFS/object
    // store URI while Spark's writer happily lands the shards there.
    val path = new org.apache.hadoop.fs.Path(dir, "manifest.json")
    val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    val keyJson = keyCol.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    try out.write(
      s"""{"shards":$shards,"key":"$keyJson","stats":$manifest}\n""".getBytes("UTF-8"))
    finally out.close()
    stats
  }

  /** Recompute the manifest stats from an export directory (loader-side
    * verification): same aggregation over the written lines. A shard whose
    * hash bucket received zero rows produces NO shard=N directory, so the
    * declared shard count fills the gaps with explicit zero-row entries —
    * otherwise a loader cannot tell an intentionally-empty shard from a
    * missing one. When `shards` is not given it is read from the manifest. */
  def verify(spark: SparkSession, dir: String, shards: Int = -1): Seq[ShardStat] = {
    val declared = if (shards > 0) shards else shardsFromManifest(spark, dir)
    // an entirely-empty export writes no shard=N dirs at all; the glob then
    // matches nothing and the read throws PATH_NOT_FOUND — that is still a
    // valid export of zero rows, every shard intentionally empty. Any OTHER
    // analysis failure propagates: swallowing it would report corruption as
    // "all shards legitimately empty".
    val present = try readStats(spark, dir) catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null && e.getCondition.startsWith("PATH_NOT_FOUND") =>
        Map.empty[Int, ShardStat]
    }
    // stray shard dirs BEYOND the declared count (stale data from a larger
    // prior export, tampering) must surface, not be silently projected away:
    // a loader reading shard=* would ingest them, so the verification result
    // has to disagree with the manifest
    val stray = present.keys.filter(i => i < 0 || i >= declared).toSeq.sorted
    (0 until declared).map(i => present.getOrElse(i, ShardStat(i, 0L, 0L))) ++
      stray.map(present)
  }

  private def readStats(spark: SparkSession, dir: String): Map[Int, ShardStat] =
    spark.read
      .option("basePath", dir)
      .text(s"$dir/$ShardCol=*")
      .withColumn(ShardCol, col(ShardCol).cast("int"))
      .groupBy(col(ShardCol))
      .agg(count(lit(1)).as("rows"),
        sum(pmod(xxhash64(col("value")), lit(ChecksumMod))).as("sum_h"))
      .collect()
      .map(r => r.getInt(0) -> ShardStat(r.getInt(0), r.getLong(1), r.getLong(2) % ChecksumMod))
      .toMap

  private def shardsFromManifest(spark: SparkSession, dir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(dir, "manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"shards"\s*:\s*(\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"no shard count in $path"))
  }
}
