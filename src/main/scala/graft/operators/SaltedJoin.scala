package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit salted equi-join for DETERMINISTIC hot keys: when a join key's
  * distribution is known-skewed (one tenant, one null-ish sentinel, one
  * viral document), AQE's runtime skew split helps shuffles but cannot
  * split a single hash partition consumed by a single task's build side.
  * Salting fixes the layout itself: fan each skewed-side row into one of
  * `salts` sub-keys and replicate the compact side once per salt, so the
  * hot key's rows spread over `salts` tasks.
  *
  * Join results are IDENTICAL to the plain join (each skewed row meets
  * exactly the one replica sharing its salt) — the salt is layout, not
  * semantics. Cost: the compact side shuffles `salts` times larger.
  *
  * When the compact side fits the broadcast threshold, Spark broadcasts
  * and there is no shuffle to skew — salt only the sides too big to
  * broadcast but small enough to replicate `salts` ways.
  */
object SaltedJoin {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join of a skewed `big` side with a compact `dim` side.
    *
    * The salt MUST be deterministic per row: a salt derived from partition
    * content or order (`monotonically_increasing_id`, `rand`) changes when a
    * fetch-failure re-executes an upstream stage, moving rows across reduce
    * partitions mid-retry — duplicated or lost join rows at exactly the
    * scale this operator targets. So the salt is a pure content hash:
    *   - `rowId` given: `pmod(xxhash64(rowId), salts)` — uniform even for
    *     byte-identical payloads (the viral-document case), as long as the
    *     id column is unique.
    *   - no `rowId`: `pmod(xxhash64(all columns), salts)` — deterministic;
    *     byte-identical duplicate rows share a salt (correctness-safe: the
    *     spread degrades, results don't). Pass a unique id to spread those.
    */
  def join(big: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int,
           rowId: Option[String] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltBasis = rowId match {
      case Some(id) => Seq(col(id))
      case None     => big.columns.toSeq.map(col)
    }
    val salted = big.withColumn(SaltCol,
      pmod(xxhash64(saltBasis: _*), lit(salts)).cast("int"))
    val replicated = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }
}
