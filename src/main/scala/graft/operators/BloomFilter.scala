package graft.operators

import graft.functions.Hashing
import graft.functions.expressions.BloomContains
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build for decontamination-style membership
  * probes: freeze a (small) key set — e.g. every shingle of a held-out
  * eval suite — into an m-bit filter, then stream the (huge) training
  * corpus past it map-side with `BloomContains.countContained`.
  *
  * The probe math mirrors `BloomContains.probe` exactly and is reproducible
  * by an external SQL engine: h1 = (s*A1 + B1) mod P, step = ((s*A2 + B2)
  * mod P) mod (m-1) + 1, pos_i = (h1 + i*step) mod m, with A/B the first
  * two universal-hash constants of `Hashing` and P its >2^32 prime.
  *
  * Scale shape: bit positions are computed executor-side from the key
  * table; the driver only ever sees constant-size m/64-word bitsets folded
  * with OR (`treeAggregate`, depth 2) — never the keys. The result is a
  * plan-shippable Array[Long] (128 KiB at m = 2^20), sized for eval sets:
  * at ~1.8 keys/bit a 2^20-bit filter holds ~400k keys under 1% false
  * positives; size m up for larger key sets, the build shape is unchanged.
  */
object BloomFilter {

  private val P  = Hashing.P
  private val A1 = Hashing.MinhashA(0)
  private val B1 = Hashing.MinhashB(0)
  private val A2 = Hashing.MinhashA(1)
  private val B2 = Hashing.MinhashB(1)

  /** Column form of the k probe positions of hash column `s` — the builder
    * runs this executor-side over the key table. Must stay in lock-step
    * with `BloomContains.probe` (including the [0, P) normalization that
    * makes signed hashes safe). */
  def probePositions(s: Column, mBits: Int, k: Int): Column = {
    val sn = pmod(s, lit(P))
    val h1 = (sn * A1 + B1) % P
    val step = ((sn * A2 + B2) % P) % (mBits - 1) + 1
    transform(sequence(lit(0), lit(k - 1)), i => (h1 + i * step) % mBits)
  }

  /** Build the bitset from a single-Long-column DataFrame of key hashes.
    * No distinct over positions: OR-setting a bit twice is idempotent and
    * far cheaper than the exchange a dedup would cost. */
  def build(keyHashes: DataFrame, mBits: Int, k: Int): Array[Long] = {
    require(mBits > 1 && Integer.bitCount(mBits) == 1, "mBits must be a power of two")
    val col0 = col(keyHashes.columns.head)
    val positions = keyHashes
      .select(explode(probePositions(col0, mBits, k)).as("pos"))
      .as(Encoders.scalaLong)
    positions.rdd.treeAggregate(new Array[Long](mBits / 64))(
      seqOp = (bs, pos) => { bs((pos >>> 6).toInt) |= 1L << (pos & 63); bs },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a },
      depth = 2)
  }
}
