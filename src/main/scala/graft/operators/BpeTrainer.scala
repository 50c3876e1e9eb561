package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) tokenizer training over a corpus:
  * the standard merge-learning loop — count adjacent symbol pairs across
  * the (frequency-weighted) vocabulary, merge the most frequent pair,
  * repeat — expressed Spark-first.
  *
  * Scale shape (the Lloyd's-iteration discipline): the vocabulary table
  * stays distributed (word frequencies are ONE token-keyed shuffle over the
  * corpus, map-side combined); each merge step is a map-side pair explode +
  * partial-aggregated count, and the only thing that ever reaches the
  * driver is the single argmax row per step. Applying a merge is a map-side
  * literal string replace. At 100 TB the vocab is ~10^7 rows — executor
  * cake, not a shuffle problem; step cost is independent of corpus size
  * once the vocab is built.
  *
  * Exactness: words are encoded as "` c1; c2; ...`" (every symbol prefixed
  * with a space, suffixed with `;`), so a merge of pair (l, r) is the
  * literal replacement of "` l; r;`" by "` lr;`". Literal string replace is
  * leftmost-non-overlapping and resumes AFTER each replacement in both the
  * JVM and SQL engines — exactly BPE's within-word merge order, including
  * back-to-back runs ("a a a a" -> "aa aa"). Ties on count break
  * lexicographically by (left, right): fully deterministic, reproducible
  * by an external SQL oracle replaying the same chain.
  */
object BpeTrainer {

  final case class Merge(step: Long, left_sym: String, right_sym: String,
                         merged: String, cnt: Long)

  /** Encode a word as its space/`;`-delimited character symbols. */
  private def encode(word: org.apache.spark.sql.Column) = {
    val chars = transform(sequence(lit(1), length(word)),
      i => word.substr(i, lit(1)))
    concat(lit(" "), array_join(transform(chars, c => concat(c, lit(";"))), " "))
  }

  /** Re-cache the lazily-chained replace lineage every this many merges.
    * Between checkpoints a step is ONE job (the argmax) whose scan replays
    * at most this many map-side replaces over the cached ancestor — total
    * char work stays O(CacheEvery * steps * vocab) instead of paying a
    * materialization job per step. A production 50k-merge run keeps the
    * same loop and just re-caches on this cadence. */
  private val CacheEvery = 8

  /** Learn up to `steps` merges from a (doc_id, text) corpus; stops early
    * when no adjacent pair remains. */
  def train(docs: DataFrame, steps: Int): Seq[Merge] = {
    val base = docs
      .select(explode(Text.tokens(col("text"))).as("word"))
      // tokens carrying the ';' delimiter would corrupt the symbol
      // encoding (phantom empty symbols in the pair statistics, replace
      // literals that misfire) — exclude them from merge learning, the
      // way production trainers byte-escape their marker characters; the
      // oracle applies the identical exclusion
      .filter(!col("word").contains(";"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(encode(col("word")).as("w"), col("cnt"))
      .cache()
    var cached = base // most recent materialized ancestor of w
    var w = base
    var sinceCache = 0
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var step = 1
      var exhausted = false
      while (step <= steps && !exhausted) {
        val syms = split(trim(translate(col("w"), ";", "")), " ")
        val pairs = when(size(syms) > 1,
          transform(sequence(lit(1), size(syms) - 1),
            i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
          .otherwise(array().cast(ArrayType(
            StructType(Seq(StructField("l", StringType), StructField("r", StringType))))))
        val top = w.select(explode(pairs).as("p"), col("cnt"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val Row(l: String, r: String, c: Long) = top.head
          merges += Merge(step.toLong, l, r, l + r, c)
          w = w.select(
            call_function("replace", col("w"), lit(s" $l; $r;"), lit(s" $l$r;")).as("w"),
            col("cnt"))
          sinceCache += 1
          if (sinceCache >= CacheEvery) {
            val next = w.cache()
            next.count() // materialize, then drop the previous checkpoint
            if (!(cached eq base)) cached.unpersist()
            cached = next
            w = next
            sinceCache = 0
          }
          step += 1
        }
      }
    } finally {
      if (!(cached eq base)) cached.unpersist()
      base.unpersist()
    }
    merges.toSeq
  }

  /** The learned merge table as a DataFrame (step, left_sym, right_sym,
    * merged, cnt) — the artifact a tokenizer ships. */
  def mergeTable(spark: SparkSession, docs: DataFrame, steps: Int): DataFrame = {
    import spark.implicits._
    train(docs, steps).toDF().orderBy(col("step"))
  }
}
