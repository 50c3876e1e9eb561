package graft.queries

import graft.Tables
import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data deduplication over the `documents` corpus: exact,
  * MinHash+LSH, SimHash — the standard large-corpus near-dup stack.
  *
  * Scale shape: signatures are map-side projections; only (band_key, doc_id)
  * pairs shuffle, and pairwise work happens strictly inside LSH buckets —
  * never all-pairs. At 100 TB the band join is the single shuffle and is
  * key-salted by construction (band keys are high-cardinality).
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  // MinHash configuration: 8 permutations = 4 bands x 2 rows.
  private val K = 8
  private val Bands = 4
  private val RowsPerBand = 2
  private val SimBits = 32

  // Signature tables are tiny relative to the corpus (a few longs per doc):
  // cache them so self-joins and downstream verification stages read the
  // materialized signatures instead of re-deriving shingles+hashes on every
  // branch of the plan — the same persist-the-sketch pattern used at scale.
  private val memo = scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]
  private def memoized(spark: SparkSession, d: String, key: String)(mk: => DataFrame): DataFrame =
    memo.getOrElseUpdate((System.identityHashCode(spark), d, key), mk.cache())

  /** doc_id + distinct word-3-gram shingles, cached. */
  def shingleDf(spark: SparkSession, d: String): DataFrame =
    memoized(spark, d, "shingles") {
      Tables.documents(spark, d)
        .select(col("doc_id"), Text.shingles(col("text"), 3).as("sh"))
    }

  /** DuckDB fragments mirroring graft.functions.Text/Hashing exactly. */
  private object Sql {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val words = s"string_split($norm, ' ')"
    // word 3-gram shingles, distinct; degenerate docs fall back to [norm]
    val shingles = s"""(CASE WHEN len($words) < 3 THEN [$norm]
      ELSE list_distinct(list_transform(range(1, len($words) - 1),
        i -> $words[i] || ' ' || $words[i+1] || ' ' || $words[i+2])) END)"""
    def seededHash(seed: String, v: String) =
      s"CAST('0x' || substring(md5($seed || ':' || $v), 1, 8) AS BIGINT)"
    def minhash(seed: Int) =
      s"list_aggregate(list_transform(shingles, s -> ${seedExpr(seed, "s")}), 'min')"
    def seedExpr(seed: Int, v: String) = seededHash(seed.toString, v)
  }

  /** Exact dedup: group by md5 fingerprint of normalized text, survivor =
    * min doc_id (hash-groupBy; one shuffle on the 128-bit fingerprint). */
  def q20(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"), Text.md5Fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"), col("fp"))
      .orderBy(col("canonical_id"))
  }

  val q20Sql: String = s"""
    SELECT min(doc_id) AS canonical_id, count(*) AS n_copies, fp
    FROM (SELECT doc_id, md5(${Sql.norm}) AS fp FROM documents)
    GROUP BY fp ORDER BY canonical_id"""

  /** MinHash signatures: k seeded-min hashes over distinct word-3-gram
    * shingles. Entirely map-side. */
  def minhashDf(spark: SparkSession, d: String): DataFrame =
    memoized(spark, d, "minhash") {
      shingleDf(spark, d)
        .select(col("doc_id"), Hashing.minhashSignature(col("sh"), K).as("sig"))
    }

  def q21(spark: SparkSession, d: String): DataFrame = {
    val cols = (0 until K).map(i => element_at(col("sig"), i + 1).as(s"mh$i"))
    minhashDf(spark, d).select(col("doc_id") +: cols: _*).orderBy(col("doc_id"))
  }

  val q21Sql: String = {
    val mhs = (0 until K).map(i => s"${Sql.minhash(i)} AS mh$i").mkString(",\n      ")
    s"""
    SELECT doc_id, $mhs
    FROM (SELECT doc_id, ${Sql.shingles} AS shingles FROM documents)
    ORDER BY doc_id"""
  }

  /** LSH candidate pairs: docs sharing any (band, band-signature) bucket.
    * The self-join happens per-bucket — the only shuffle is on band keys. */
  def lshPairsDf(spark: SparkSession, d: String): DataFrame = {
    val withBands = minhashDf(spark, d)
      .select(col("doc_id"),
        explode(Hashing.lshBandKeys(col("sig"), Bands, RowsPerBand)).as("band"))
    val a = withBands.select(col("band"), col("doc_id").as("doc_a"))
    val b = withBands.select(col("band"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  def q22(spark: SparkSession, d: String): DataFrame =
    lshPairsDf(spark, d).orderBy(col("doc_a"), col("doc_b"))

  val q22Sql: String = {
    val bandExprs = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand).map(r => s"CAST(mh${b * RowsPerBand + r} AS VARCHAR)")
      s"'b$b-' || ${parts.mkString(" || '-' || ")}"
    }.mkString(", ")
    s"""
    WITH sigs AS (${q21Sql.replace("ORDER BY doc_id", "")}),
    bands AS (SELECT doc_id, unnest([$bandExprs]) AS band FROM sigs)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b"""
  }

  /** Verified near-dups: exact 3-gram Jaccard >= 0.5 on LSH candidates only
    * (never all-pairs). Jaccard is a single int division — exact. */
  def q23(spark: SparkSession, d: String): DataFrame = {
    val sh = shingleDf(spark, d)
    val pairs = lshPairsDf(spark, d)
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", Hashing.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q23Sql: String = s"""
    WITH pairs AS (${q22Sql.replace("ORDER BY doc_a, doc_b", "")}),
    sh AS (SELECT doc_id, ${Sql.shingles} AS sh FROM documents),
    scored AS (
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM pairs JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
    ORDER BY doc_a, doc_b"""

  /** SimHash signatures: bitwise majority vote of seeded shingle hashes. */
  /** SimHash over 3-gram shingles (not unigram tokens: a small shared
    * vocabulary would make every doc's token-set near-identical and the
    * fingerprint non-discriminative). */
  def simhashDf(spark: SparkSession, d: String): DataFrame =
    memoized(spark, d, "simhash") {
      shingleDf(spark, d)
        .select(col("doc_id"), Hashing.simhash(col("sh"), SimBits).as("simhash"))
    }

  def q24(spark: SparkSession, d: String): DataFrame =
    simhashDf(spark, d).orderBy(col("doc_id"))

  val q24Sql: String = {
    val bits = (0 until SimBits).map { b =>
      s"""(CASE WHEN list_sum(list_transform(toks,
         t -> 2 * (${Sql.seedExpr(b, "t")} % 2) - 1)) > 0 THEN ${1L << b} ELSE 0 END)"""
    }.mkString(" +\n      ")
    s"""
    SELECT doc_id, CAST($bits AS BIGINT) AS simhash
    FROM (SELECT doc_id, ${Sql.shingles} AS toks FROM documents)
    ORDER BY doc_id"""
  }

  /** SimHash near-dup pairs: candidates share one of 4 4-bit bands, verified
    * by Hamming distance <= 2 — the banded-bits variant of LSH. */
  def q25(spark: SparkSession, d: String): DataFrame = {
    val sh = simhashDf(spark, d)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b), shiftright(col("simhash"), b * 8).bitwiseAND(lit(255)))): _*))
        .as("band"))
    val a = banded.select(col("band"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Hashing.hammingDistance(col("sh_a"), col("sh_b")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q25Sql: String = s"""
    WITH sh AS (${q24Sql.replace("ORDER BY doc_id", "")}),
    banded AS (SELECT doc_id, simhash,
      unnest(list_transform(range(0, 4),
        b -> CAST(b AS VARCHAR) || ':' || CAST((simhash >> (b*8)) & 255 AS VARCHAR))) AS band
      FROM sh)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY doc_a, doc_b"""

  val defs: Map[String, Q] = Map(
    "q20_dedup_exact" -> (q20 _),
    "q21_minhash_signatures" -> (q21 _),
    "q22_lsh_candidate_pairs" -> (q22 _),
    "q23_jaccard_near_dups" -> (q23 _),
    "q24_simhash" -> (q24 _),
    "q25_simhash_near_dups" -> (q25 _))

  val oracles: Map[String, String] = Map(
    "q20_dedup_exact" -> q20Sql,
    "q21_minhash_signatures" -> q21Sql,
    "q22_lsh_candidate_pairs" -> q22Sql,
    "q23_jaccard_near_dups" -> q23Sql,
    "q24_simhash" -> q24Sql,
    "q25_simhash_near_dups" -> q25Sql)
}
