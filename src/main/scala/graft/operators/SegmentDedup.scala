package graft.operators

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Corpus-level exact-substring deduplication: remove token spans that are
  * duplicated ACROSS documents, keeping each document's unique remainder
  * (the operation behind "dedup the training set at the substring level",
  * and the line-level dedup of web-corpus pipelines — here the unit is a
  * fixed-width token segment because the corpus text is single-line).
  *
  * Algorithm: tokenize; split each doc into non-overlapping segments of
  * `segTokens` tokens (the trailing `< segTokens` remainder is always kept);
  * hash each segment (polynomial fold of per-token hashes mod P — integer
  * arithmetic an external SQL oracle reproduces exactly); a segment is
  * duplicated when its hash occurs in >= `minDocs` DISTINCT documents;
  * rewrite each doc with its duplicated segments removed.
  *
  * Scale shape (100 TB): one shuffle keyed by segment hash (the duplicate
  * count), then one join back keyed by doc_id. The dup-segments-per-doc
  * side arrives aggregated (doc_id, [hashes]) and is tiny relative to the
  * corpus — AQE broadcasts it, so the corpus itself never shuffles for the
  * join-back. Per-doc work is map-side array arithmetic; no doc x doc
  * stage exists anywhere.
  */
object SegmentDedup {

  private val P  = Hashing.P
  private val C1 = Hashing.C1

  /** Polynomial segment hash over a token-hash slice: fold
    * `acc = (acc*C1 + h) mod P` from 0. acc < P < 2^33 and C1 < 2^20 keep
    * every intermediate below 2^53 — exact in any 64-bit integer engine. */
  private def segmentHash(th: Column, segIdx: Column, segTokens: Int): Column =
    aggregate(slice(th, segIdx * segTokens + 1, lit(segTokens)), lit(0L),
      (acc, h) => (acc * C1 + h) % P)

  /** 0-based segment indices `[0, nSeg)`; empty when the doc is shorter
    * than one segment (sequence() would DESCEND for nSeg = 0). */
  private def segRange(nSeg: Column): Column =
    when(nSeg > 0, sequence(lit(0), nSeg - 1))
      .otherwise(array().cast(ArrayType(IntegerType)))

  /** Rewrite `docs` (doc_id, text) with cross-document duplicated segments
    * removed. Output: doc_id, n_segments, n_dup_segments, kept_tokens,
    * kept_text — one row per input doc. */
  def rewrite(docs: DataFrame, segTokens: Int, minDocs: Int = 2): DataFrame = {
    val toks = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        transform(col("t"), w => Hashing.hash32(w)).as("th"))
    val withSegs = toks
      .withColumn("n_seg", (size(col("th")) / segTokens).cast(IntegerType))
      .withColumn("sh", transform(segRange(col("n_seg")),
        i => segmentHash(col("th"), i, segTokens)))

    val segs = withSegs.select(col("doc_id"), explode(col("sh")).as("h"))
    val dup = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    // per-doc duplicated hashes, aggregated BEFORE the join back so the
    // right leg is one small row per affected doc (broadcastable)
    val dupPerDoc = segs.join(dup, Seq("h"))
      .groupBy(col("doc_id")).agg(collect_set(col("h")).as("dup_hashes"))

    withSegs.join(dupPerDoc, Seq("doc_id"), "left")
      .withColumn("dh",
        coalesce(col("dup_hashes"), array().cast(ArrayType(LongType))))
      .withColumn("kept_idx", filter(segRange(col("n_seg")),
        i => !array_contains(col("dh"), element_at(col("sh"), i + 1))))
      .withColumn("kept", concat(
        flatten(transform(col("kept_idx"),
          i => slice(col("t"), i * segTokens + 1, lit(segTokens)))),
        // trailing remainder (< segTokens tokens) is never part of a segment
        slice(col("t"), col("n_seg") * segTokens + 1,
          size(col("t")) - col("n_seg") * segTokens)))
      .select(
        col("doc_id"),
        col("n_seg").cast(LongType).as("n_segments"),
        (col("n_seg") - size(col("kept_idx"))).cast(LongType).as("n_dup_segments"),
        size(col("kept")).cast(LongType).as("kept_tokens"),
        concat_ws(" ", col("kept")).as("kept_text"))
  }
}
