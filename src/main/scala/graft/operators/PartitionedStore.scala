package graft.operators

import graft.functions.Converters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-partitioned snapshot layout (U5, `partitionable_mixin.rb:33-129`,
  * DDL `db_adapter/pg.rb:134-139`): very large replica tables store under
  * `bucket = pmod(str2inthash(remote_key), n)` partitions. Because the merge
  * conflict target includes the partition column, an incremental merge only
  * touches the buckets present in the batch — partition pruning instead of
  * a full-table rewrite, which is the difference between O(batch) and
  * O(table) at 100 TB.
  */
object PartitionedStore {

  val BucketCol = "part_bucket"

  def withBucket(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(Converters.str2inthash(col(keyCol)), lit(buckets)))

  /** Write a snapshot partitioned by bucket. */
  def write(df: DataFrame, dir: String, keyCol: String, buckets: Int): Unit =
    withBucket(df, keyCol, buckets)
      .write.mode("overwrite").partitionBy(BucketCol).parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)

  /** Merge a batch into the partitioned snapshot, rewriting ONLY the buckets
    * the batch touches: read prunes on the bucket set, merge runs on the
    * pruned slice, and the dynamic-overwrite write replaces just those
    * bucket directories. */
  def mergeInto(spark: SparkSession, dir: String, batch: DataFrame,
                spec: MergeSpec, keyCol: String, buckets: Int): Unit = {
    val bucketed = withBucket(batch, keyCol, buckets)
    val touched = bucketed.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).sorted
    val current = read(spark, dir)
      .filter(col(BucketCol).isin(touched.map(Integer.valueOf): _*))
    val mergeSpec = spec.copy(keyCols = (BucketCol +: spec.keyCols).distinct)
    val merged = Merge.upsert(
      current.select(bucketed.columns.map(col): _*), bucketed, mergeSpec)
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, "dynamic")
    try merged.write.mode("overwrite").partitionBy(BucketCol).parquet(dir)
    finally prev.foreach(spark.conf.set(conf, _))
  }
}
