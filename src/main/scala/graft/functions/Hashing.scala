package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hash-family primitives for near-duplicate detection at corpus scale:
  * MinHash signatures, LSH band keys, SimHash.
  *
  * Design for scale AND cross-engine exactness:
  *  - exactly ONE md5 per token (the only string hash); everything above it
  *    — shingle hashes, the k minhash "permutations", simhash bit votes —
  *    is integer arithmetic mod a >2^32 prime, so signatures cost integer
  *    ops, not repeated digests, and any SQL engine reproduces them
  *    bit-for-bit (higher-order lambdas are interpreted in Spark, so
  *    per-element work must be cheap);
  *  - signatures are map-side projections; only (band_key, doc_id) pairs
  *    shuffle, and pairwise work happens strictly inside LSH buckets.
  */
object Hashing {

  /** Prime just above 2^32 — the modulus of the integer hash universe. */
  val P: Long = 4294967311L

  /** Multipliers (< 2^28, so a*h < 2^61 never overflows a Long) and offsets
    * for the k universal-hash "permutations" h_i(x) = (a_i*x + b_i) mod P. */
  val MinhashA: Seq[Long] = Seq(15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L, 160481183L, 179424673L,
    198491317L, 217645177L, 236887691L, 256203161L, 268435019L, 275604541L)
  val MinhashB: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L,
    37L, 41L, 43L, 47L, 53L, 59L, 61L, 67L)

  /** Shingle-combine multipliers. */
  val C1 = 1000003L
  val C2 = 8191L

  /** MinHash/LSH configuration — the SINGLE source of truth shared by the
    * batch stack (queries.DedupQueries) and the incremental one
    * (operators.IncrementalDedup / streaming.DedupStream). q101 feeds
    * batch-built signatures into incremental banding, so the two MUST band
    * identically; retune here, never per-stack. */
  val MinhashK = 8
  val LshBands = 4
  val LshRowsPerBand = 2

  /** 32-bit string hash: first 8 hex chars of md5, as Long in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** The CANONICAL train/valid/test bucket in [0, 100): every split-aware
    * query (q125 leakage audit, q138 language-ID, q142 OOV, q155 drift,
    * q157 manifest) derives membership from THIS formula — one copy, so a
    * salt or threshold edit cannot silently desynchronize split
    * membership between the queries that assume they agree. Buckets
    * < 80 = train, < 90 = valid, else test. */
  def splitBucket(id: Column): Column =
    pmod(hash32(concat(lit("split:"), id.cast("string"))), lit(100L))

  /** The DuckDB mirror of [[splitBucket]] for oracle SQL. */
  def splitBucketSql(idExpr: String): String =
    s"CAST('0x' || substring(md5('split:' || CAST($idExpr AS VARCHAR)), 1, 8) AS BIGINT) % 100"

  /** Combine three consecutive token hashes into a 3-gram shingle hash.
    * Mod-P after each product so intermediates stay < 3*2^33. */
  def shingleHash(h1: Column, h2: Column, h3: Column): Column =
    pmod((h1 * C1) % P + (h2 * C2) % P + h3, lit(P))

  /** Distinct 3-gram shingle hashes from a token-hash array; degenerate docs
    * (< 3 tokens) fall back to the provided whole-doc hash. */
  def shingleHashes(tokenHashes: Column, wholeDocHash: Column): Column =
    when(size(tokenHashes) < 3, array(wholeDocHash))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(tokenHashes) - 2),
        i => shingleHash(
          element_at(tokenHashes, i),
          element_at(tokenHashes, i + 1),
          element_at(tokenHashes, i + 2)))))

  /** MinHash signature: k minima of (a_i*s + b_i) mod P over the shingle-hash
    * array. Native codegen expression — one pass for all k permutations
    * (the composed form below pays k interpreted transform+min passes). */
  def minhashSignature(shingleHashArr: Column, k: Int): Column =
    expressions.MinhashSig.minhash(shingleHashArr, k)

  /** The composed-Column reference form, kept as the parity check for the
    * native expression. */
  private[functions] def minhashComposed(shingleHashArr: Column, k: Int): Column = {
    require(k <= MinhashA.size)
    array((0 until k).map { i =>
      array_min(transform(shingleHashArr,
        s => (s * MinhashA(i) + MinhashB(i)) % P))
    }: _*)
  }

  /** LSH band keys: signature array (length k = bands * rowsPerBand) folded
    * into `bands` strings "b{i}-h1-h2-..". Docs sharing any band key are
    * near-dup candidates. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("-",
        (lit(s"b$b") +: (0 until rowsPerBand).map(r =>
          element_at(signature, b * rowsPerBand + r + 1).cast(StringType))): _*)
    }: _*)

  /** SimHash over a shingle-hash array: bit b of the fingerprint is the
    * majority vote of bit b across elements. bits <= 32 (the hash width).
    * Native codegen expression — ONE array pass for all bit votes (the
    * composed-Column form below needs an interpreted aggregate per bit). */
  def simhash(shingleHashArr: Column, bits: Int): Column =
    expressions.SimHash32.simhash(shingleHashArr, bits)

  /** The composed-Column reference form, kept as the parity check for the
    * native expression (same values bit-for-bit). */
  private[functions] def simhashComposed(shingleHashArr: Column, bits: Int): Column = {
    require(bits <= 32)
    val terms = (0 until bits).map { b =>
      val vote = aggregate(shingleHashArr, lit(0L),
        (acc, s) => acc + (shiftright(s, b).bitwiseAND(lit(1L)) * 2L - 1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
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
