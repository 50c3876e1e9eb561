package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table to a word — the tokenizer-application
  * kernel, as ONE native Catalyst expression of constant plan size.
  *
  * The semantic contract is the literal merge chain (`BpeTrainer`'s
  * training replay): encode the word as space/`;`-delimited character
  * symbols, then for each merge (l, r) IN STEP ORDER replace every
  * occurrence of adjacent symbols l, r by their concatenation, leftmost
  * non-overlapping, resuming after each replacement. A production
  * tokenizer ships 30-50k merges; folding that chain into 50k nested
  * `replace` literals is not a compilable plan (plan size, analysis and
  * codegen all scale with the vocabulary). This expression carries the
  * whole table as ONE broadcast-sized reference object, so plan
  * size/compile time are independent of the merge count and per-word work
  * is O(symbols^2) via the rank-priority algorithm production tokenizers
  * use.
  *
  * Rank-priority application: repeatedly find the adjacent symbol pair
  * with the lowest merge rank present in the word and merge all its
  * occurrences left-to-right. For any merge table produced by sequential
  * BPE training this is EXACTLY the sequential replay, by the funnel
  * property: if every merged string is unique and each merge side is a
  * single code point or the output of an earlier merge, then applying
  * merge k can only create adjacencies whose pairs have rank > k (a pair
  * of rank j with a side equal to merge k's output would need that string
  * derivable by a merge of rank < j, which by uniqueness IS merge k, so
  * k < j). Rank order is therefore nondecreasing during application —
  * identical to replaying the chain. The constructor VERIFIES those two
  * preconditions; a table violating them (hand-built, adversarial) falls
  * back to exact sequential replay — still constant plan size, still
  * bit-identical to the literal chain, just O(steps) per distinct word.
  *
  * Both eval paths (interpreted + codegen) call the same kernel;
  * `BpeApplySpec` proves expression == literal-chain on the learned
  * corpus table and on a fallback-path table.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  // analysis-time rejection of a non-string child (AbstractDataType /
  // ExpectsInputTypes are private[sql], so state the contract directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a STRING word, got ${child.dataType.catalogString}")

  @transient private lazy val table = new BpeEncode.MergeTable(merges)

  override protected def nullSafeEval(v: Any): Any =
    table.encode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"

  /** Plans must not print the (possibly 50k-row) table: show the size and a
    * content fingerprint, so a testdata regen still shows an informative
    * plan-golden diff without the golden scaling with the vocabulary. */
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"${merges.length} merges", s"fp=${BpeEncode.fingerprint(merges)}")
}

object BpeEncode {

  def fingerprint(merges: Seq[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    merges.foreach { case (l, r) =>
      md.update(l.getBytes("UTF-8")); md.update(0.toByte)
      md.update(r.getBytes("UTF-8")); md.update(1.toByte)
    }
    md.digest().take(4).map(b => f"$b%02x").mkString
  }

  /** Column API: apply `merges` (in step order) to a word column. */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BpeEncode(GraftColumnBridge.expression(word.cast("string")), merges))
  }

  /** The shared kernel behind both eval paths. Serializable: shipped once
    * per executor inside the generated-code references array (same
    * mechanism Spark uses for regex Patterns), NOT per row. */
  final class MergeTable(merges: Seq[(String, String)]) extends Serializable {
    private val n = merges.length
    private val lefts = new Array[String](n)
    private val rights = new Array[String](n)
    /** pair key "l\u0000r" -> lowest rank holding that pair */
    private val rank = new java.util.HashMap[String, Integer](n * 2)

    /** True iff the funnel preconditions hold (see class doc): unique
      * merged strings, no duplicate pairs, every side a single code point
      * or an earlier merge's output — the shape every trained table has. */
    val fastPathOk: Boolean = {
      val produced = new java.util.HashSet[String]()
      var ok = true
      var i = 0
      while (i < n) {
        val (l, r) = merges(i)
        lefts(i) = l; rights(i) = r
        if (ok) {
          val m = l + r
          def sideOk(s: String): Boolean =
            (s.nonEmpty && s.codePointCount(0, s.length) == 1) || produced.contains(s)
          if (produced.contains(m) || !sideOk(l) || !sideOk(r) ||
            rank.containsKey(l + "\u0000" + r)) ok = false
          else produced.add(m)
        }
        if (!rank.containsKey(l + "\u0000" + r))
          rank.put(l + "\u0000" + r, i)
        i += 1
      }
      ok
    }

    /** Encode + fully merge one word; returns the delimited symbol string
      * " s1; s2; ... sk;" the trainer's `encode` produces. */
    def encode(u: UTF8String): UTF8String = {
      val word = u.toString
      // initial symbols: one per code point (ASCII gate upstream makes
      // this one per char in practice, but stay correct on any input)
      val cps = word.codePointCount(0, word.length)
      var syms = new Array[String](cps)
      var i = 0; var k = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        syms(k) = new String(Character.toChars(cp))
        k += 1; i += Character.charCount(cp)
      }
      var len = cps
      if (fastPathOk) {
        // rank-priority: repeatedly merge all occurrences of the
        // lowest-rank pair present; never re-scans the merge table
        var done = len < 2
        while (!done) {
          var best = Int.MaxValue
          var j = 0
          while (j < len - 1) {
            val rk = rank.get(syms(j) + "\u0000" + syms(j + 1))
            if (rk != null && rk < best) best = rk
            j += 1
          }
          if (best == Int.MaxValue) done = true
          else len = mergeAll(syms, len, lefts(best), rights(best))
        }
      } else {
        // exact sequential replay — the literal chain, one pass per merge
        var m = 0
        while (m < this.n && len >= 2) {
          len = mergeAll(syms, len, lefts(m), rights(m))
          m += 1
        }
      }
      // zero symbols (empty word) still carries the leading-space frame,
      // matching the trainer's encode + literal chain exactly
      if (len == 0) return UTF8String.fromString(" ")
      val sb = new java.lang.StringBuilder(word.length * 3)
      var s = 0
      while (s < len) {
        sb.append(' ').append(syms(s)).append(';')
        s += 1
      }
      UTF8String.fromString(sb.toString)
    }

    /** Merge every adjacent (l, r) occurrence left-to-right non-overlapping,
      * in place; returns the new symbol count. Mirrors literal string
      * replace on the delimited encoding exactly (resume AFTER the
      * replacement, so "a a a a" -> "aa aa"). */
    private def mergeAll(syms: Array[String], len: Int, l: String, r: String): Int = {
      var rd = 0; var wr = 0
      while (rd < len) {
        if (rd < len - 1 && syms(rd) == l && syms(rd + 1) == r) {
          syms(wr) = l + r; rd += 2
        } else {
          syms(wr) = syms(rd); rd += 1
        }
        wr += 1
      }
      wr
    }
  }
}
