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
  def probePositions(s: Column, mBits: Long, k: Int): Column = {
    val sn = pmod(s, lit(P))
    val h1 = (sn * A1 + B1) % P
    val step = ((sn * A2 + B2) % P) % (mBits - 1) + 1
    transform(sequence(lit(0), lit(k - 1)), i => (h1 + i * step) % mBits)
  }

  /** Build the bitset from a single-Long-column DataFrame of key hashes.
    * No distinct over positions: OR-setting a bit twice is idempotent and
    * far cheaper than the exchange a dedup would cost. `mBits` is a Long
    * because count-sized sidecars (see
    * [[graft.operators.IncrementalSubstr]]) legitimately exceed 2^31
    * bits; the word count still fits an Int array. */
  def build(keyHashes: DataFrame, mBits: Long, k: Int): Array[Long] = {
    require(mBits > 1 && java.lang.Long.bitCount(mBits) == 1,
      "mBits must be a power of two")
    val col0 = col(keyHashes.columns.head)
    val positions = keyHashes
      .select(explode(probePositions(col0, mBits, k)).as("pos"))
      .as(Encoders.scalaLong)
    if (mBits <= SmallBits)
      positions.rdd.treeAggregate(new Array[Long]((mBits / 64).toInt))(
        seqOp = (bs, pos) => { bs((pos >>> 6).toInt) |= 1L << (pos & 63); bs },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a },
        depth = 2)
    else {
      // CHUNKED build for count-sized filters (2^27+ bits): the
      // treeAggregate shape allocates a full m-bit zero per TASK — at
      // 2^32 bits that is 512 MiB x parallelism, an OOM by design. Bit
      // positions are uniform, so no task-local accumulator smaller than
      // m exists without a shuffle; shuffle once BY CHUNK instead: each
      // reducer owns whole 2^26-bit chunks (8 MiB), builds them locally,
      // and the driver stitches — peak memory is chunks-per-task x
      // 8 MiB executor-side and exactly one filter image driver-side,
      // independent of parallelism. The chunk id IS the partition id
      // (Int hashCode is the identity), so each chunk arrives at exactly
      // one reducer and no merge is needed; |= anyway for safety.
      val chunkBits = 1L << 26
      val nChunks = (mBits / chunkBits).toInt
      val words = new Array[Long]((mBits / 64).toInt)
      val wordsPerChunk = (chunkBits / 64).toInt
      positions.rdd
        .map(pos => ((pos >>> 26).toInt, pos))
        .partitionBy(new org.apache.spark.HashPartitioner(nChunks))
        .mapPartitions { it =>
          val local = scala.collection.mutable.HashMap.empty[Int, Array[Long]]
          it.foreach { case (c, pos) =>
            val arr = local.getOrElseUpdate(c, new Array[Long](wordsPerChunk))
            val off = pos & (chunkBits - 1)
            arr((off >>> 6).toInt) |= 1L << (off & 63)
          }
          local.iterator
        }
        .collect()
        .foreach { case (c, arr) =>
          val base = c * wordsPerChunk
          var i = 0
          while (i < arr.length) { words(base + i) |= arr(i); i += 1 }
        }
      words
    }
  }

  /** Above this, `build` switches to the shuffle-by-chunk strategy. */
  private val SmallBits = 1L << 27
}
