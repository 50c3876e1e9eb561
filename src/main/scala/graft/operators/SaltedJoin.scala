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
    * The salt hashes the row PLUS a per-row ordinal: a hot key often means
    * many byte-identical rows (the viral-document case), and a pure
    * content hash would send them all to ONE salt, defeating the spread.
    * The ordinal makes the salt non-deterministic across runs — harmless,
    * because the salt is layout only and never reaches the result. */
  def join(big: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigCols = big.columns
    val salted = big.withColumn(SaltCol,
      pmod(xxhash64((bigCols.map(col) :+ monotonically_increasing_id()).toSeq: _*),
        lit(salts)).cast("int"))
    val replicated = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }
}
