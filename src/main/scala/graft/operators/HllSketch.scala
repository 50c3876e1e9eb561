package graft.operators

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HyperLogLog register kernel shared by the batch query (q117), the
  * incremental fold (q120), and the streaming maintenance loop
  * (`streaming.SketchStream`): one arithmetic, three consumption shapes.
  *
  * Registers are a commutative idempotent monoid under element-wise MAX —
  * the property every consumer leans on: Spark's partial aggregation
  * builds them map-side with at most m rows per group per task, delta
  * tables merge into exactly the batch result regardless of split or
  * order, and replaying a delta is a no-op. All arithmetic is integer
  * (rank via the cross-engine-exact `length(bin(n))` idiom, estimate via
  * scaled-integer alpha and integer division) so every consumer is
  * oracle-exact against the same DuckDB replay.
  */
object HllSketch {

  /** 2^B registers per group; the remaining Rem bits feed the
    * leading-zero rank. Alpha (0.709 for m=64) ships as a 2^20-scaled
    * integer so the estimate is integer-exact cross-engine. */
  val B = 6
  val M = 1 << B // 64
  val Rem = 26 // 32 - B
  val AlphaScaled = 743440L // floor(0.709 * 2^20)

  /** (doc_id, source, text) -> one row per (doc, shingle) with the HLL
    * bucket index and leading-zero rank. Pure projection + explode; the
    * md5-per-token / shingle-combine pipeline is the dedup family's. */
  def ranked(docs: DataFrame): DataFrame = {
    val staged = docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"),
        Hashing.hash32(Text.normalize(col("text"))).as("nh"))
      .select(col("doc_id"), col("source"),
        transform(col("toks"), t => Hashing.hash32(t)).as("th"), col("nh"))
      .select(col("doc_id"), col("source"),
        Hashing.shingleHashes(col("th"), col("nh")).as("sh"))
    // explode_outer, deliberately: plain explode triggers
    // InferFiltersFromGenerate, whose inferred `size(sh) > 0` filter is
    // pushed below the projections with the WHOLE shingle expression
    // inlined — re-expanding the token-hash array inside each of the three
    // element_at references (measured 48 s vs 3 s on the sf0.1 corpus).
    // The outer variant skips that rule, and `sh` is never null or empty
    // here (text is filtered non-null and the degenerate fallback emits
    // [whole-doc hash]), so the row sets are identical.
    val s = staged.select(col("doc_id"), col("source"), explode_outer(col("sh")).as("s"))
    // rehash the [0,P) shingle hash into 32 uniform bits
    val h2 = pmod(lit(Hashing.MinhashA(4)) * col("s") + lit(Hashing.MinhashB(4)),
      lit(Hashing.P)) % lit(4294967296L)
    s.select(col("doc_id"), col("source"), col("s"),
        (h2 / lit(1L << Rem)).cast(LongType).as("idx"),
        pmod(h2, lit(1L << Rem)).as("rem"))
      .select(col("doc_id"), col("source"), col("s"), col("idx"),
        when(col("rem") === 0L, lit(Rem + 1))
          .otherwise(lit(Rem + 1) - length(bin(col("rem"))))
          .cast(LongType).as("rho"))
  }

  /** Collapse ranked rows (or a union of register tables carrying the same
    * columns) to one register row per (source, idx). */
  def registers(ranked: DataFrame, valueCol: String = "rho"): DataFrame =
    ranked.groupBy(col("source"), col("idx"))
      .agg(max(col(valueCol)).as("m"))

  /** Register fold + integer estimate; `exact` supplies the truth column
    * (source, exact_distinct) the oracle gates against. */
  def finish(regs: DataFrame, exact: DataFrame): DataFrame = {
    val folded = regs.groupBy(col("source")).agg(
      count(lit(1)).as("n_present"),
      sum(pow(lit(2.0), lit((Rem + 1).toLong) - col("m")).cast(LongType))
        .as("z_present"))
    val zScale = 1L << (Rem + 1)
    val est = folded
      .withColumn("z_scaled",
        col("z_present") + (lit(M.toLong) - col("n_present")) * lit(zScale))
      .withColumn("hll_est",
        expr(s"(${AlphaScaled}L * ${M.toLong * M * (zScale / (1L << 20))}L) DIV z_scaled"))
    est.join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("n_present"),
        col("z_scaled"), col("hll_est"))
      .orderBy(col("source"))
  }

  /** Integer estimate from a register table alone (no truth column) — the
    * production read, used by the streaming loop's spec. */
  def estimate(regs: DataFrame): DataFrame = {
    val folded = regs.groupBy(col("source")).agg(
      count(lit(1)).as("n_present"),
      sum(pow(lit(2.0), lit((Rem + 1).toLong) - col("m")).cast(LongType))
        .as("z_present"))
    val zScale = 1L << (Rem + 1)
    folded
      .withColumn("z_scaled",
        col("z_present") + (lit(M.toLong) - col("n_present")) * lit(zScale))
      .withColumn("hll_est",
        expr(s"(${AlphaScaled}L * ${M.toLong * M * (zScale / (1L << 20))}L) DIV z_scaled"))
      .select(col("source"), col("n_present"), col("z_scaled"), col("hll_est"))
      .orderBy(col("source"))
  }
}
