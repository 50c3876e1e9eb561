package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** `events.ts` has shipped as two physical parquet types across testdata
    * generations, both normalized here to the standard TimestampType so
    * every query sees one shape:
    *  - TIMESTAMP(NANOS): Spark has no native ns type; sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, the column arrives as
    *    LongType epoch-nanos, and the loader floors to micros (matching
    *    what engines with native ns types do when casting);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TimestampNTZType; cast to TimestampType under the UTC session
    *    timezone (all sessions pin it), preserving the instant exactly —
    *    the same naive-as-UTC reading the DuckDB oracle uses. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
