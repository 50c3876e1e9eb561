package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Map-side Bloom-filter membership count: given an array of shingle hashes
  * and a pre-built bitset, counts how many of the array's elements have ALL
  * `k` probe bits set (i.e. "might be contained").
  *
  * The probe math is plain 64-bit integer arithmetic (double hashing
  * `pos_i = (h1 + i*h2) mod m`, universal hashes mod P) so an external SQL
  * oracle reproduces the filter — false positives included — bit for bit;
  * see `graft.operators.BloomFilter` for the builder and the constants.
  *
  * Scale: the bitset rides the serialized expression to every executor (a
  * 2^20-bit filter is 128 KiB) and the probe runs inside whole-stage
  * codegen — membership testing against a corpus-scale table costs zero
  * shuffle, which is the entire point of Bloom decontamination at 100 TB:
  * the eval-set side is frozen into bits once, the training corpus streams
  * past it map-side.
  */
case class BloomCountContained(child: Expression, bits: Array[Long],
                               mBits: Int, k: Int) extends UnaryExpression {
  require(mBits > 1 && Integer.bitCount(mBits) == 1, "mBits must be a power of two")
  require(k >= 1 && k <= 8, "k probes must be in [1, 8]")
  require(bits.length == mBits / 64, "bitset word count must be mBits/64")

  override def dataType: DataType = LongType

  // reject non-array<bigint> children at analysis time — ArrayData.getLong
  // would silently misread an array<int> child at execution otherwise
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_count_contained requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    BloomContains.countContained(v.asInstanceOf[ArrayData], bits, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the bitset is far too large to inline into generated source — pin it
    // in the codegen references array and index it at runtime
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BloomContains" +
        s".countContained($c, $ref, $mBits, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomCountContained =
    copy(child = newChild)

  override def prettyName: String = "bloom_count_contained"
}

object BloomContains {

  private val P  = graft.functions.Hashing.P
  private val A1 = graft.functions.Hashing.MinhashA(0)
  private val B1 = graft.functions.Hashing.MinhashB(0)
  private val A2 = graft.functions.Hashing.MinhashA(1)
  private val B2 = graft.functions.Hashing.MinhashB(1)

  /** The `i`-th probe position of hash `s` in an `m`-bit filter (m a power
    * of two). Double hashing with a non-zero step so the k probes walk the
    * whole bit space. `s` is first normalized into [0, P) so ANY Long key
    * (signed xxhash64, str2inthash, ...) probes safely — without it a
    * negative hash overflows s*A1 / yields negative positions and an
    * out-of-bounds bitset index. */
  def probe(s: Long, i: Int, m: Long): Long = {
    val sn = ((s % P) + P) % P
    val h1 = (sn * A1 + B1) % P
    val step = ((sn * A2 + B2) % P) % (m - 1) + 1
    (h1 + i * step) % m
    // no overflow at any supported m: sn < P ~ 2^32, A1 ~ 2^24, so
    // sn*A1 < 2^56; h1/step < P and i <= 7 keep h1 + i*step < 2^35 —
    // which is why m may be a Long (count-sized sidecars exceed 2^31
    // bits) while the bitset word count stays an Int array index
  }

  private def allSet(s: Long, bits: Array[Long], m: Long, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val pos = probe(s, i, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Driver-side membership test (the resident-sidecar admission path —
    * see `graft.operators.IncrementalSubstr.probe`): true iff all k probe
    * bits of `s` are set in an `mBits`-bit filter. */
  def contains(s: Long, bits: Array[Long], mBits: Long, k: Int): Boolean =
    allSet(s, bits, mBits, k)

  /** Number of elements of `arr` whose k probe bits are all set. */
  def countContained(arr: ArrayData, bits: Array[Long], m: Int, k: Int): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (allSet(arr.getLong(i), bits, m, k)) c += 1L
      i += 1
    }
    c
  }

  /** Column API (null array -> null). */
  def countContained(arr: Column, bits: Array[Long], mBits: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BloomCountContained(GraftColumnBridge.expression(arr), bits, mBits, k))
  }
}
