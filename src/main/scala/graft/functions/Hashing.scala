package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hash-family primitives for near-duplicate detection at corpus scale:
  * MinHash signatures, LSH band keys, SimHash.
  *
  * Design: every hash is derived from `md5(seed || value)` hex, so the exact
  * same signatures are computable by any SQL engine (oracle parity) and the
  * whole pipeline stays in Catalyst codegen — no UDFs, no driver loops. At
  * 100 TB each doc's signature is computed map-side in one projection; only
  * the (band_key, doc_id) pairs shuffle.
  */
object Hashing {

  /** 32-bit unsigned hash of a string under a seed: first 8 hex chars of
    * md5(seed || ":" || s), as a Long in [0, 2^32). */
  def seededHash32(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 8), 16, 10).cast(LongType)

  /** MinHash signature: array of k minima of seeded hashes over the shingle
    * array. One pass over shingles per doc; k seeded permutation estimates. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingleArr, s => seededHash32(s, seed)))
    }: _*)

  /** LSH band keys: signature array (length k = bands * rowsPerBand) folded
    * into `bands` strings "band:h1-h2-..". Docs sharing any band key are
    * near-dup candidates. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("-",
        (lit(s"b$b") +: (0 until rowsPerBand).map(r =>
          element_at(signature, b * rowsPerBand + r + 1).cast(StringType))): _*)
    }: _*)

  /** SimHash over a token/shingle array: for each of `bits` positions, sum
    * +1/-1 votes of each element's seeded bit, emit the sign bitmap as Long.
    * bits <= 62 to stay in signed-Long range. */
  def simhash(tokenArr: Column, bits: Int): Column = {
    require(bits <= 62)
    // For each bit b: sum over tokens of (2*bit(token,b) - 1); >0 -> bit set.
    val terms = (0 until bits).map { b =>
      val vote = aggregate(tokenArr, lit(0L),
        (acc, t) => acc + (pmod(seededHash32(t, b), lit(2L)) * 2L - 1L))
      when(vote > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Hamming distance between two SimHash Longs. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = (size(a) + size(b)).cast(DoubleType) - inter
    when(union === 0d, lit(1d)).otherwise(inter / union)
  }
}
