package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * All engine queries take `(SparkSession, sfDir)` and resolve tables here so
  * the same code runs at any scale factor.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a table across the cluster before per-row-expensive work
    * (hashing, JSON parsing, text analysis). The driver testdata ships one
    * parquet row group per file, so the scan itself is a single task; a
    * cheap round-robin exchange buys full parallelism for the expensive
    * projection above it. On production multi-file/multi-row-group tables
    * the scan already parallelizes and this is a no-op choice — use it only
    * when compute-per-row dominates. */
  def parallel(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    df.repartition(spark.sparkContext.defaultParallelism)
  }

  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and this
    * loader truncates epoch-nanos to the standard microsecond TimestampType
    * (floor — matching what engines with native ns types do when casting). */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
