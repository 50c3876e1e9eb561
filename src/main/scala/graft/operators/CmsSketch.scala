package graft.operators

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-min register kernel shared by the batch query (q116) and the
  * streaming maintenance loop (`streaming.CmsStream`).
  *
  * CMS registers are a commutative monoid under element-wise SUM — but
  * unlike HLL's MAX they are NOT idempotent: re-adding a delta
  * double-counts. That asymmetry is the point of the streaming face: the
  * batch-partitioned replace discipline (each microbatch owns exactly one
  * partition) is what turns at-least-once delivery into exactly-once
  * register sums, where the HLL loop would have been correct even without
  * it. */
object CmsSketch {

  val Depth = 4
  val Width = 16

  def cell(r: Int, h: Column): Column =
    pmod(pmod(lit(Hashing.MinhashA(r)) * h + lit(Hashing.MinhashB(r)),
      lit(Hashing.P)), lit(Width.toLong))

  def cellSql(r: Int, h: String): String =
    s"((${Hashing.MinhashA(r)} * $h + ${Hashing.MinhashB(r)}) % ${Hashing.P}) % $Width"

  /** (text) rows -> the token stream with the shared 32-bit hash. */
  def tokenStream(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .select(col("tok"), Hashing.hash32(col("tok")).as("h"))

  /** Register table for a token stream: one commutative SUM per (r, j)
    * cell — map-side combined, <= Depth*Width rows per task. */
  def registers(toks: DataFrame): DataFrame =
    toks.select(explode(array((0 until Depth).map { r =>
        struct(lit(r).cast(IntegerType).as("r"), cell(r, col("h")).as("j"))
      }: _*)).as("rj"))
      .groupBy(col("rj.r").as("r"), col("rj.j").as("j"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimate for each probe token: min over rows of its cell. */
  def estimate(regs: DataFrame, probes: DataFrame): DataFrame = {
    val cells = probes.select(col("tok"),
      explode(array((0 until Depth).map { r =>
        struct(lit(r).cast(IntegerType).as("r"), cell(r, col("h")).as("j"))
      }: _*)).as("rj"))
    cells.join(broadcast(regs),
        cells("rj.r") === regs("r") && cells("rj.j") === regs("j"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("cms_est"))
  }
}
