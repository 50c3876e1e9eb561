package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several sort keys so
  * that range predicates on ANY of them map to contiguous-ish z-value
  * ranges. Sorting a table by z-value before writing parquet gives every
  * dimension usable min/max row-group statistics — the multi-dimensional
  * generalization of "sort by the filter column", and the standard layout
  * trick for 100 TB fact tables filtered by more than one key (public
  * examples: Delta OPTIMIZE ZORDER, Hudi clustering).
  *
  * The z-value is a pure integer Column expression (shifts and masks,
  * whole-stage codegen); `cluster` is a range-partitioned sort on it — the
  * one full shuffle a layout rewrite inherently costs, paid once at write
  * time and amortized over every pruned read after.
  */
object ZOrder {

  /** Bits kept per dimension. 16 bits x up to 3 dims stays in 63 bits. */
  val BitsPerDim = 16

  /** Morton interleave of the low [[BitsPerDim]] bits of each column
    * (values clamped to the representable range; keys are expected to be
    * non-negative surrogates/buckets — clamp, don't wrap, so ordering is
    * preserved at the boundary). Bit i of dim d lands at position
    * i * dims + d. */
  def zValue(cols: Seq[Column]): Column = {
    require(cols.nonEmpty && cols.size * BitsPerDim <= 63,
      s"up to ${63 / BitsPerDim} dimensions, got ${cols.size}")
    val dims = cols.size
    val max = (1L << BitsPerDim) - 1
    val clamped = cols.map(c => least(greatest(c.cast("long"), lit(0L)), lit(max)))
    val bits = for {
      (c, d) <- clamped.zipWithIndex
      i <- 0 until BitsPerDim
    } yield shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * dims + d)
    bits.reduce(_ bitwiseOR _)
  }

  /** Add the z-value column. */
  def withZValue(df: DataFrame, keyCols: Seq[String],
                 zCol: String = "z_value"): DataFrame =
    df.withColumn(zCol, zValue(keyCols.map(col)))

  /** Cluster by z-value: range-partition + in-partition sort (one total
    * sort), ready to write as parquet whose row-group min/max stats prune
    * on every clustered dimension.
    *
    * Dimensions are min/max-normalized to the full [[BitsPerDim]] range
    * first: interleaving RAW values lets a wide-range key's high bits
    * drown a narrow-range key's entire contribution (measured: a 4-bit
    * suppkey next to an 8-bit partkey got zero locality). Production
    * z-order implementations interleave per-column range ids for the same
    * reason; linear scaling is the distribution-free approximation and
    * costs one tiny min/max aggregate. */
  def cluster(df: DataFrame, keyCols: Seq[String], partitions: Int): DataFrame = {
    val full = (1L << BitsPerDim) - 1
    val stats = keyCols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val statRow = df.agg(stats.head, stats.tail: _*).first()
    // empty input, or EVERY key entirely null: min/max are null across the
    // board — nothing to normalize, any layout is clustered
    if (keyCols.indices.forall(i => statRow.isNullAt(2 * i)))
      return df.withColumn("z_value", lit(0L))
        .repartitionByRange(partitions, col("z_value"))
    val scaled = keyCols.zipWithIndex.map { case (c, i) =>
      if (statRow.isNullAt(2 * i))
        // this dimension is entirely null: it carries no ordering
        // information — contribute a constant instead of an NPE, and let
        // the remaining dimensions own the interleave
        lit(0L)
      else {
        val lo = statRow.getLong(2 * i)
        val hi = statRow.getLong(2 * i + 1)
        val span = math.max(hi - lo, 1L)
        if (span <= Long.MaxValue / full)
          // integer arithmetic, exact: scale up then divide down
          expr(s"((CAST(`$c` AS BIGINT) - $lo) * $full) DIV $span")
        else
          // huge span (epoch-nanos-scale keys): multiplying first would
          // overflow — divide the value down instead (still monotone, the
          // only property the interleave needs)
          expr(s"(CAST(`$c` AS BIGINT) - $lo) DIV ${span / full + 1}")
      }
    }
    df.withColumn("z_value", zValue(scaled))
      .repartitionByRange(partitions, col("z_value"))
      .sortWithinPartitions("z_value")
  }
}
