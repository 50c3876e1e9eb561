package graft.queries

import graft.Tables
import graft.functions.{Hashing, Text}
import graft.functions.expressions.BloomContains
import graft.operators.{BloomFilter, SegmentDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data deduplication over the `documents` corpus: exact,
  * MinHash+LSH, SimHash — the standard large-corpus near-dup stack.
  *
  * Pipeline shape (see Hashing's scaladoc): one md5 per token, integer
  * arithmetic above it. Signature tables are tiny relative to the corpus
  * (a few longs per doc) and are cached so self-joins and verification
  * stages read materialized signatures — the persist-the-sketch pattern
  * used at scale. Pairwise work happens strictly inside LSH buckets; never
  * all-pairs.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  // MinHash configuration: 8 permutations = 4 bands x 2 rows. Shared with
  // the incremental stack via Hashing (q101 mixes the two — see there).
  private val K = Hashing.MinhashK
  private val Bands = Hashing.LshBands
  private val RowsPerBand = Hashing.LshRowsPerBand
  private val SimBits = 32

  private val memo = scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]
  // bench isolation finds this module through the registry, not by name
  graft.MemoRegistry.register(() => resetMemo())
  private def memoized(spark: SparkSession, d: String, key: String)(mk: => DataFrame): DataFrame =
    memo.getOrElseUpdate((System.identityHashCode(spark), d, key), mk.cache())

  /** Drop every memoized signature table (unpersisting its cache). The
    * bench calls this between queries for per-query cost isolation: a
    * memoized DataFrame whose cache was cleared externally (via
    * `catalog.clearCache`) but whose reference survived would silently
    * recompute UNCACHED on every reuse — a self-join then pays the whole
    * shingle build twice per run (measured 100x on q25/q78). Resetting the
    * memo makes the next query rebuild AND re-cache its own intermediates. */
  def resetMemo(): Unit = {
    memo.values.foreach(df => { df.unpersist(); () })
    memo.clear()
  }

  /** DuckDB fragments mirroring graft.functions.Text/Hashing exactly. */
  private object Sql {
    val P = Hashing.P
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    // DuckDB string_split('', ' ') yields [''] while Text.tokens yields [],
    // so guard the empty string to keep token parity on empty documents.
    val words =
      s"(CASE WHEN $norm = '' THEN CAST([] AS VARCHAR[]) ELSE string_split($norm, ' ') END)"
    def hash32(v: String) = s"CAST('0x' || substring(md5($v), 1, 8) AS BIGINT)"
    // token-hash list and whole-doc hash
    val th = s"list_transform($words, w -> ${hash32("w")})"
    // distinct 3-gram shingle hashes with degenerate fallback
    val shingleHashes = s"""(CASE WHEN len(th) < 3 THEN [nh]
      ELSE list_distinct(list_transform(range(1, len(th) - 1),
        i -> ((th[i] * ${Hashing.C1}) % $P + (th[i+1] * ${Hashing.C2}) % $P + th[i+2]) % $P)) END)"""
    val docBase = s"SELECT doc_id, $th AS th, ${hash32(norm)} AS nh FROM documents"
    val shBase = s"SELECT doc_id, $shingleHashes AS sh FROM ($docBase)"
    def minhash(i: Int) =
      s"list_aggregate(list_transform(sh, s -> (s * ${Hashing.MinhashA(i)} + ${Hashing.MinhashB(i)}) % $P), 'min')"
  }

  /** doc_id + distinct 3-gram shingle hashes, cached. The build itself
    * (tokens -> per-token md5 -> shingle combine) lives in
    * IncrementalDedup.shingles — one copy for both stacks. */
  def shingleHashDf(spark: SparkSession, d: String): DataFrame =
    memoized(spark, d, "shinglehash") {
      graft.operators.IncrementalDedup.shingles(
        Tables.parallel(Tables.documents(spark, d)))
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

  /** MinHash signatures (map-side integer passes over the shingle hashes). */
  def minhashDf(spark: SparkSession, d: String): DataFrame =
    memoized(spark, d, "minhash") {
      shingleHashDf(spark, d)
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
    FROM (${Sql.shBase})
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

  /** Verified near-dups: exact shingle-hash Jaccard >= 0.5 on LSH candidates
    * only (never all-pairs). Jaccard is a single int division — exact. */
  def q23(spark: SparkSession, d: String): DataFrame = {
    val sh = shingleHashDf(spark, d)
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
    sh AS (${Sql.shBase}),
    scored AS (
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM pairs JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
    ORDER BY doc_a, doc_b"""

  /** Duplicate clusters: connected components over the verified near-dup
    * pairs (min-label propagation; oracle = recursive-CTE transitive
    * closure). The canonical-representative step of corpus dedup. */
  def clustersDf(spark: SparkSession, d: String): DataFrame =
    memoized(spark, d, "clusters") {
      graft.operators.DupClusters.assign(
        q23(spark, d).select(col("doc_a"), col("doc_b")))
    }

  def q29(spark: SparkSession, d: String): DataFrame =
    clustersDf(spark, d).orderBy(col("doc_id"))

  /** q29's components computed by large-star/small-star contraction
    * (`DupClusters.assignStar`) instead of min-label propagation: same
    * result under the same recursive-CTE oracle, but the round count is
    * O(log^2 n) instead of O(component diameter) — the variant to run when
    * dup chains can be long (crawl revisions, CDC segment graphs). */
  def q177(spark: SparkSession, d: String): DataFrame =
    graft.operators.DupClusters.assignStar(
      q23(spark, d).select(col("doc_a"), col("doc_b")))
      .orderBy(col("doc_id"))

  // lazy: q29Sql is initialized below (object vals init top-to-bottom)
  lazy val q177Sql: String = q29Sql

  val q29Sql: String = s"""
    WITH RECURSIVE dup_pairs AS (${q23Sql.replace("ORDER BY doc_a, doc_b", "")}),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM dup_pairs
              UNION ALL SELECT doc_b, doc_a FROM dup_pairs),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u)
    SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u ORDER BY doc_id"""

  /** SimHash (32-bit) over shingle hashes: bit b of the fingerprint is the
    * majority vote of bit b across the doc's shingle hashes. */
  def simhashDf(spark: SparkSession, d: String): DataFrame =
    memoized(spark, d, "simhash") {
      shingleHashDf(spark, d)
        .select(col("doc_id"), Hashing.simhash(col("sh"), SimBits).as("simhash"))
    }

  def q24(spark: SparkSession, d: String): DataFrame =
    simhashDf(spark, d).orderBy(col("doc_id"))

  val q24Sql: String = {
    val bits = (0 until SimBits).map { b =>
      s"""(CASE WHEN list_sum(list_transform(sh,
         s -> 2 * ((s >> $b) & 1) - 1)) > 0 THEN ${1L << b} ELSE 0 END)"""
    }.mkString(" +\n      ")
    s"""
    SELECT doc_id, CAST($bits AS BIGINT) AS simhash
    FROM (${Sql.shBase})
    ORDER BY doc_id"""
  }

  /** SimHash near-dup pairs: candidates share one of 4 8-bit bands, verified
    * by Hamming distance <= 3 — the banded-bits variant of LSH. */
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

  /** The dedup capstone: the surviving corpus after near-dup
    * canonicalization — every doc except cluster members that are not their
    * cluster's canonical (min-id) representative. */
  def q38(spark: SparkSession, d: String): DataFrame = {
    val losers = clustersDf(spark, d).filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"))
    Tables.documents(spark, d).select(col("doc_id"))
      .join(losers, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  val q38Sql: String = s"""
    WITH RECURSIVE dup_pairs AS (${q23Sql.replace("ORDER BY doc_a, doc_b", "")}),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM dup_pairs
              UNION ALL SELECT doc_b, doc_a FROM dup_pairs),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
    clusters AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u)
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE cluster_id <> doc_id)
    ORDER BY doc_id"""

  /** Benchmark decontamination — the train/eval n-gram overlap sweep every
    * training-data pipeline needs: docs whose shingle sets intersect the
    * held-out "benchmark" docs (doc_id % 50 = 0 plays the eval set) in at
    * least 3 distinct 3-gram shingles are flagged with their hit count.
    * Scale shape: explode to (shingle, doc) and join ON THE SHINGLE HASH —
    * one shuffle keyed by shingle, never doc x doc; the benchmark side is a
    * distinct-shingle set small enough to broadcast in practice. */
  def q78(spark: SparkSession, d: String): DataFrame = {
    val sh = shingleHashDf(spark, d)
    val bench = sh.filter(col("doc_id") % 50 === 0)
      .select(explode(col("sh")).as("s")).distinct()
    val train = sh.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    train.join(bench, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_shared_shingles"))
      .filter(col("n_shared_shingles") >= 3)
      .orderBy(col("doc_id"))
  }

  val q78Sql: String = s"""
    WITH sh AS (${Sql.shBase}),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 50 <> 0)
    SELECT doc_id, count(DISTINCT train.s) AS n_shared_shingles
    FROM train JOIN bench ON train.s = bench.s
    GROUP BY doc_id HAVING count(DISTINCT train.s) >= 3
    ORDER BY doc_id"""

  /** q149 — per-source CONTAMINATION report: q78's exact shingle-overlap
    * decontamination rolled up to the governance artifact a release
    * review reads — per source: training docs, contaminated docs (>= 3
    * shingles shared with the held-out benchmark), contamination rate,
    * and the worst document's overlap. A corpus-wide contaminated list
    * (q78) tells you WHAT to drop; this tells you WHICH FEED is leaking
    * eval data and how badly — the difference between cleanup and root
    * cause.
    *
    * Scale shape: q78's shingle-keyed join + per-doc aggregate, then one
    * source-sized rollup with a left join keeping zero-contamination
    * sources in the report (dropping them would hide exactly the healthy
    * baseline the rate is judged against). */
  def q149(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("source"))
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val perSource = train.groupBy(col("source")).agg(count(lit(1)).as("n_train"))
    val contaminated = q78(spark, d) // doc_id, n_shared_shingles
      .join(train, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"),
        max(col("n_shared_shingles")).as("worst_overlap"))
    perSource.join(contaminated, Seq("source"), "left")
      .na.fill(0L, Seq("n_contaminated", "worst_overlap"))
      .withColumn("contam_pm",
        expr("CASE WHEN n_train > 0 THEN (n_contaminated * 1000) DIV n_train ELSE 0 END"))
      .select(col("source"), col("n_train"), col("n_contaminated"),
        col("contam_pm"), col("worst_overlap"))
      .orderBy(col("source"))
  }

  val q149Sql: String = s"""
    WITH sh AS (${Sql.shBase}),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 50 <> 0),
    bad AS (
      SELECT doc_id, CAST(count(DISTINCT train.s) AS BIGINT) AS n_shared
      FROM train JOIN bench ON train.s = bench.s
      GROUP BY doc_id HAVING count(DISTINCT train.s) >= 3),
    td AS (SELECT doc_id, source FROM documents WHERE doc_id % 50 <> 0),
    ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_train FROM td GROUP BY 1),
    cs AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_contaminated,
        CAST(max(n_shared) AS BIGINT) AS worst_overlap
      FROM bad JOIN td USING (doc_id) GROUP BY 1)
    SELECT ps.source, n_train,
      coalesce(n_contaminated, 0) AS n_contaminated,
      (CASE WHEN n_train > 0
        THEN (coalesce(n_contaminated, 0) * 1000) // n_train ELSE 0 END) AS contam_pm,
      coalesce(worst_overlap, 0) AS worst_overlap
    FROM ps LEFT JOIN cs USING (source)
    ORDER BY ps.source"""

  /** q150 — segment-dedup SAVINGS by source: what cross-document
    * boilerplate removal (q106's duplicated-8-token-segment rewrite)
    * actually buys, per feed — total token mass in, kept tokens out,
    * savings permille, and how many docs were touched. The capacity-
    * planning counterpart of q149: q149 says which feed leaks eval data;
    * this says which feed ships redundant boilerplate and how much
    * storage/compute the span-level dedup recovers from it.
    *
    * Scale shape: q106's chunk-hash-keyed shuffle (its only exchange),
    * one doc_id join to the source column, one source-sized rollup. */
  def q150(spark: SparkSession, d: String): DataFrame = {
    val rewritten = q106(spark, d) // doc_id, n_segments, n_dup_segments, kept_tokens, ...
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("source"),
      Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    rewritten.join(docs, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("kept_tokens")).as("kept_tokens"),
        sum((col("n_dup_segments") > 0L).cast("long")).as("n_docs_touched"))
      .withColumn("savings_pm",
        expr("((total_tokens - kept_tokens) * 1000) DIV total_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("kept_tokens"), col("n_docs_touched"), col("savings_pm"))
      .orderBy(col("source"))
  }

  lazy val q150Sql: String = s"""
    WITH rw AS (${q106Sql.replace("ORDER BY doc_id", "")}),
    td AS (SELECT doc_id, source, CAST(len(${Sql.words}) AS BIGINT) AS n_tokens
           FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      CAST(sum(rw.kept_tokens) AS BIGINT) AS kept_tokens,
      CAST(sum(CASE WHEN rw.n_dup_segments > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_touched,
      ((CAST(sum(n_tokens) AS BIGINT) - CAST(sum(rw.kept_tokens) AS BIGINT)) * 1000)
        // CAST(sum(n_tokens) AS BIGINT) AS savings_pm
    FROM rw JOIN td USING (doc_id)
    GROUP BY source ORDER BY source"""

  /** q167 — first-occurrence-wins span dedup (C4-style surgical removal).
    * q106 deletes a duplicated 8-token segment from EVERY document (pure
    * savings rewrite); this is the policy a pretraining corpus actually
    * wants: exactly ONE canonical copy of each span survives — the
    * earliest (doc_id, span_idx) occurrence — and later occurrences
    * (including repeats within one document) are stripped before the doc
    * is reassembled. Reports, per document, the span counts in/removed,
    * surviving token mass, and an md5 of the rewritten text so the gate
    * pins the REWRITE itself, not just the counts.
    *
    * Scale shape: span ownership is ONE map-side-combinable min-struct
    * aggregate keyed by span content (no window, no per-span sort), the
    * keep filter is a keyed join back, and reassembly is a doc_id-keyed
    * collect bounded by document length — shuffles touch (span) and
    * (doc_id) keys only, never document pairs. The span frame is
    * materialized before the explode (the inline-generate trap). */
  def q167(spark: SparkSession, d: String): DataFrame = {
    val S = SegTokens
    val sp = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .select(col("doc_id"),
        when(col("n") === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), expr(s"(n + ${S - 1}) div $S").cast("int")),
            i => concat_ws(" ", slice(col("t"), (i - 1) * S + 1, lit(S)))))
          .as("spans"))
      .cache()
    val ex = sp.select(col("doc_id"), posexplode(col("spans")).as(Seq("idx", "span")))
    val owners = ex.groupBy(col("span"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("o"))
    val kept = ex.join(owners, Seq("span"))
      .where(col("doc_id") === col("o.doc_id") && col("idx") === col("o.idx"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        sum(size(split(col("span"), " ")).cast("long")).as("n_tok"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("idx"), col("span")))),
          s => s.getField("span"))).as("text2"))
    sp.select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        (col("n_spans") - coalesce(col("n_kept"), lit(0L))).as("n_spans_removed"),
        coalesce(col("n_tok"), lit(0L)).as("n_tokens_out"),
        md5(coalesce(col("text2"), lit("")).cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  // lazy: SegTokens initializes later in this object (r8 gotcha — an eager
  // val here interpolates 0)
  lazy val q167Sql: String = {
    val S = SegTokens
    s"""
    WITH b AS (SELECT doc_id, ${Sql.words} AS t FROM documents),
    bs AS (SELECT doc_id,
        (CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(1, (len(t) + ${S - 1}) // $S + 1),
           i -> array_to_string(t[(i-1)*$S+1:(i-1)*$S+$S], ' ')) END) AS spans
      FROM b),
    ex AS (SELECT doc_id, unnest(range(1, len(spans) + 1)) AS idx,
                  unnest(spans) AS span FROM bs),
    kept AS (SELECT doc_id, idx, span FROM (
        SELECT doc_id, idx, span,
          row_number() OVER (PARTITION BY span ORDER BY doc_id, idx) AS rn
        FROM ex) WHERE rn = 1),
    reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        CAST(sum(len(string_split(span, ' '))) AS BIGINT) AS n_tok,
        string_agg(span, ' ' ORDER BY idx) AS text2
      FROM kept GROUP BY doc_id)
    SELECT bs.doc_id, CAST(len(spans) AS BIGINT) AS n_spans,
      CAST(len(spans) AS BIGINT) - coalesce(n_kept, 0) AS n_spans_removed,
      coalesce(n_tok, 0) AS n_tokens_out,
      md5(coalesce(text2, '')) AS text_md5
    FROM bs LEFT JOIN reb USING (doc_id) ORDER BY bs.doc_id"""
  }

  /** Incremental dedup: the delta (doc_id % 10 = 0 plays the day's new
    * arrivals, ~10% of the corpus) is LSH-joined against the stored corpus
    * signatures plus itself and Jaccard-verified — store x store pairs are
    * never formed (see IncrementalDedup). Same MinHash/LSH/Jaccard
    * semantics as q22/q23, restricted to pairs touching the delta; the
    * oracle applies that restriction to the batch pair set, which is the
    * defining equivalence of incremental dedup. */
  def q101(spark: SparkSession, d: String): DataFrame = {
    val sigs = minhashDf(spark, d)
    val candidates = graft.operators.IncrementalDedup.candidatePairs(
      sigs.filter(col("doc_id") % 10 =!= 0), sigs.filter(col("doc_id") % 10 === 0))
    val sh = shingleHashDf(spark, d)
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", Hashing.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q101Sql: String = s"""
    WITH pairs AS (${q22Sql.replace("ORDER BY doc_a, doc_b", "")}),
    touching AS (SELECT doc_a, doc_b FROM pairs
                 WHERE doc_a % 10 = 0 OR doc_b % 10 = 0),
    sh AS (${Sql.shBase}),
    scored AS (
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM touching JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
    ORDER BY doc_a, doc_b"""

  /** Exact-substring (segment-level) corpus dedup: rewrite every doc with
    * its cross-document duplicated 8-token segments removed — the
    * span-removal flavor of training-set dedup (vs q20/q23's whole-doc
    * flavor). All heavy lifting in operators.SegmentDedup; shuffles are
    * keyed by segment hash and doc_id only. */
  def q106(spark: SparkSession, d: String): DataFrame =
    SegmentDedup.rewrite(
      Tables.parallel(Tables.documents(spark, d)), segTokens = SegTokens)
      .orderBy(col("doc_id"))

  private val SegTokens = 8

  val q106Sql: String = {
    val S = SegTokens
    s"""
    WITH base AS (SELECT doc_id, ${Sql.words} AS t, ${Sql.th} AS th FROM documents),
    seglist AS (SELECT doc_id, t,
      list_transform(range(0, len(th)//$S),
        i -> list_reduce(list_prepend(CAST(0 AS BIGINT), th[i*$S+1:i*$S+$S]),
                         (acc,h) -> (acc*${Hashing.C1} + h) % ${Sql.P})) AS sh
      FROM base),
    seg AS (SELECT doc_id, unnest(sh) AS h FROM seglist),
    dup AS (SELECT h FROM seg GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    dup_set AS (SELECT coalesce(list(h), []) AS dl FROM dup),
    kept AS (SELECT doc_id, len(sh) AS n_segments,
        len(sh) - len(list_filter(range(0, len(sh)),
                                  i -> NOT list_contains(dl, sh[i+1]))) AS n_dup_segments,
        flatten(list_transform(
          list_filter(range(0, len(sh)), i -> NOT list_contains(dl, sh[i+1])),
          i -> t[i*$S+1:i*$S+$S])) || t[len(sh)*$S+1:] AS kt
      FROM seglist, dup_set)
    SELECT doc_id, n_segments, n_dup_segments, len(kt) AS kept_tokens,
      coalesce(array_to_string(kt, ' '), '') AS kept_text
    FROM kept ORDER BY doc_id"""
  }

  /** Bloom-filter decontamination: the eval set's shingles (doc_id % 50 = 0,
    * playing the held-out benchmark) are frozen into a 2^20-bit filter and
    * the training docs are probed MAP-SIDE — the zero-shuffle scale path of
    * q78's exact shingle join. The filter math (operators.BloomFilter /
    * expressions.BloomContains) is integer-exact, so the oracle reproduces
    * the filter bit-for-bit, false positives included. */
  def q107(spark: SparkSession, d: String): DataFrame = {
    val sh = shingleHashDf(spark, d)
    val evalKeys = sh.filter(col("doc_id") % 50 === 0)
      .select(explode(col("sh")).as("s")).distinct()
    val bits = BloomFilter.build(evalKeys, BloomM, BloomK)
    sh.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"),
        BloomContains.countContained(col("sh"), bits, BloomM, BloomK)
          .as("n_bloom_hits"))
      .filter(col("n_bloom_hits") >= 3)
      .orderBy(col("doc_id"))
  }

  private val BloomM = 1 << 20
  private val BloomK = 3

  val q107Sql: String = {
    val (m, k) = (BloomM, BloomK)
    val (a1, b1) = (Hashing.MinhashA(0), Hashing.MinhashB(0))
    val (a2, b2) = (Hashing.MinhashA(1), Hashing.MinhashB(1))
    // sn mirrors BloomContains.probe's [0, P) normalization — a no-op for
    // shingle hashes (already in [0, P)) but required for contract parity
    // with the probe's support for ANY signed Long key (DuckDB's % returns
    // negatives, so reusing this pattern with e.g. xxhash64 keys would
    // silently diverge without it).
    def probed(src: String) =
      s"""SELECT *, (sn*$a1+$b1) % ${Sql.P} AS h1,
          ((sn*$a2+$b2) % ${Sql.P}) % ${m - 1} + 1 AS step
          FROM (SELECT *, ((s % ${Sql.P}) + ${Sql.P}) % ${Sql.P} AS sn FROM ($src))"""
    s"""
    WITH sh AS (${Sql.shBase}),
    evp AS (${probed("SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 50 = 0")}),
    bits AS (SELECT DISTINCT (h1 + i*step) % $m AS pos FROM evp, range(0,$k) r(i)),
    trp AS (SELECT doc_id, s, (h1 + i*step) % $m AS pos
            FROM (${probed("SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 50 <> 0")}),
                 range(0,$k) r(i)),
    hits AS (SELECT doc_id, s FROM trp JOIN bits USING (pos)
             GROUP BY doc_id, s HAVING count(*) = $k)
    SELECT doc_id, count(*) AS n_bloom_hits FROM hits
    GROUP BY doc_id HAVING count(*) >= 3 ORDER BY doc_id"""
  }

  /** q119 — corpus novelty score: per document, the fraction of its
    * distinct 3-gram shingles whose FIRST corpus occurrence (min doc_id
    * over the whole corpus) is this document — the memorization-risk /
    * contribution metric ("how much of this doc is new material vs
    * repeats of earlier documents"). Exact-duplicate docs score 0 unless
    * they are the first copy; boilerplate-heavy docs score low.
    *
    * Scale shape: one shingle-keyed aggregation (min(doc_id) — map-side
    * combinable, the same shuffle the dedup family already pays), then a
    * join-back on the same key. The aggregated first-occurrence table is
    * distinct-shingle-sized, so at test scale Catalyst BROADCASTS it
    * (verified in the plan: the corpus side pays zero join shuffle); past
    * the broadcast threshold it degrades to sort-merge on the key the agg
    * already partitioned — the canonical two-shuffle dedup shape. The
    * per-doc fold keys on doc_id. Integer permille output, no division
    * hazards (every doc has >= 1 shingle via the degenerate fallback). */
  def q119(spark: SparkSession, d: String): DataFrame = {
    val ex = shingleHashDf(spark, d)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val first = ex.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    ex.join(first, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("first_doc") === col("doc_id")).cast("long")).as("n_new"))
      .withColumn("novelty_permille",
        floor(col("n_new") * 1000d / col("n_shingles")).cast("long"))
      .orderBy(col("doc_id"))
  }

  val q119Sql: String = s"""
    WITH sh AS (${Sql.shBase}),
    ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
    first AS (SELECT s, min(doc_id) AS first_doc FROM ex GROUP BY s)
    SELECT ex.doc_id,
      CAST(count(*) AS BIGINT) AS n_shingles,
      CAST(sum(CASE WHEN first.first_doc = ex.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      CAST(floor(sum(CASE WHEN first.first_doc = ex.doc_id THEN 1 ELSE 0 END) * 1000.0
        / count(*)) AS BIGINT) AS novelty_permille
    FROM ex JOIN first USING (s)
    GROUP BY ex.doc_id
    ORDER BY ex.doc_id"""

  /** q125 — train/valid/test split LEAKAGE AUDIT: assign every document a
    * deterministic hash split (80/10/10), then cross the verified
    * near-dup pairs (q23's LSH-pruned, Jaccard-verified machinery) with
    * the split assignment and report the full (split_a, split_b) matrix
    * of candidate and verified pair counts. Cross-split verified pairs
    * ARE eval leakage — the audit every serious pretraining pipeline
    * runs before trusting held-out numbers, here as one oracle-gated
    * query composed entirely from the existing dedup operators.
    *
    * Scale shape: inherits q22/q23's (band-keyed shuffle, no all-pairs);
    * the split tag is a map-side hash; the matrix fold is <= 6 rows. */
  def q125(spark: SparkSession, d: String): DataFrame = {
    def splitOf(c: org.apache.spark.sql.Column) = {
      val b = Hashing.splitBucket(c)
      when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    }
    def matrix(pairs: DataFrame, cntName: String): DataFrame =
      pairs.select(splitOf(col("doc_a")).as("sa"), splitOf(col("doc_b")).as("sb"))
        .select(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as(cntName))
    val cand = matrix(lshPairsDf(spark, d), "n_candidates")
    val ver = matrix(q23(spark, d), "n_verified")
    cand.join(ver, Seq("split_a", "split_b"), "full_outer")
      .select(col("split_a"), col("split_b"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_verified"), lit(0L)).as("n_verified"))
      .withColumn("is_leak",
        col("split_a") =!= col("split_b") && col("n_verified") > 0L)
      .orderBy(col("split_a"), col("split_b"))
  }

  val q125Sql: String = {
    def splitSql(doc: String) =
      s"""(CASE WHEN ${Hashing.splitBucketSql(doc)} < 80 THEN 'train'
           WHEN ${Hashing.splitBucketSql(doc)} < 90 THEN 'valid'
           ELSE 'test' END)"""
    s"""
    WITH cpairs AS (${q22Sql.replace("ORDER BY doc_a, doc_b", "")}),
    vpairs AS (${q23Sql.replace("ORDER BY doc_a, doc_b", "")}),
    cm AS (SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
        CAST(count(*) AS BIGINT) AS n_candidates
      FROM (SELECT ${splitSql("doc_a")} AS sa, ${splitSql("doc_b")} AS sb FROM cpairs)
      GROUP BY 1, 2),
    vm AS (SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
        CAST(count(*) AS BIGINT) AS n_verified
      FROM (SELECT ${splitSql("doc_a")} AS sa, ${splitSql("doc_b")} AS sb FROM vpairs)
      GROUP BY 1, 2)
    SELECT coalesce(cm.split_a, vm.split_a) AS split_a,
      coalesce(cm.split_b, vm.split_b) AS split_b,
      coalesce(n_candidates, 0) AS n_candidates,
      coalesce(n_verified, 0) AS n_verified,
      (coalesce(cm.split_a, vm.split_a) <> coalesce(cm.split_b, vm.split_b)
        AND coalesce(n_verified, 0) > 0) AS is_leak
    FROM cm FULL OUTER JOIN vm
      ON cm.split_a = vm.split_a AND cm.split_b = vm.split_b
    ORDER BY split_a, split_b"""
  }

  /** q133 — cross-source overlap matrix: for every pair of sources, a
    * MinHash-estimated Jaccard of their shingle-set unions next to the
    * exact value — the corpus-curation question "how much of source A is
    * already in source B" answered two ways, so the estimator's error is
    * visible in the result itself (the q117 estimate-vs-truth discipline).
    *
    * Scale shape, estimator leg: a per-source signature is the
    * COMPONENT-WISE MIN over its docs' signatures (min over a union is the
    * min of mins — the same commutative-monoid argument as HLL register
    * MAX, so per-source state is k=16 longs, mergeable across any
    * partitioning, incremental deltas fold for free). The shuffle carries
    * k rows per source per task; the 190-pair compare is dim-table-sized.
    * The exact leg is the honest corpus cost: one distinct + one
    * shingle-keyed self-join — feasible at 100 TB but 10^6x more bytes
    * than the signature leg, which is the point the output makes. */
  private val OverlapK = 16

  def q133(spark: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(spark, d).select(col("doc_id"), col("source"))
    // mergeable per-source signature: component-wise min over doc sigs
    val perSrc = shingleHashDf(spark, d)
      .select(col("doc_id"), Hashing.minhashSignature(col("sh"), OverlapK).as("sig"))
      .join(src, Seq("doc_id"))
      .select(col("source"), posexplode(col("sig")).as(Seq("pos", "v")))
      .groupBy(col("source"), col("pos")).agg(min(col("v")).as("mv"))
    val aSide = perSrc.select(col("pos"), col("source").as("src_a"), col("mv").as("mva"))
    val bSide = perSrc.select(col("pos"), col("source").as("src_b"), col("mv").as("mvb"))
    val est = aSide.join(bSide, Seq("pos"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(when(col("mva") === col("mvb"), 1L).otherwise(0L)).as("n_match"))
      .withColumn("est_bp", expr(s"(n_match * 10000) DIV $OverlapK"))
    // exact leg: distinct (source, shingle) then a shingle-keyed self-join
    val srcSh = shingleHashDf(spark, d).join(src, Seq("doc_id"))
      .select(col("source"), explode(col("sh")).as("h")).distinct()
    val sizes = srcSh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val inter = srcSh.select(col("source").as("src_a"), col("h"))
      .join(srcSh.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("inter"))
    val pairs = sizes.select(col("source").as("src_a"), col("sz").as("sza"))
      .crossJoin(broadcast(sizes.select(col("source").as("src_b"), col("sz").as("szb"))))
      .filter(col("src_a") < col("src_b"))
    val exact = pairs.join(inter, Seq("src_a", "src_b"), "left")
      .na.fill(0L, Seq("inter"))
      .withColumn("n_union", col("sza") + col("szb") - col("inter"))
      .withColumn("exact_bp", expr("(inter * 10000) DIV n_union"))
    est.join(exact, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("n_match"), col("est_bp"),
        col("inter"), col("n_union"), col("exact_bp"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q133Sql: String = {
    val mhs = (0 until OverlapK)
      .map(i => s"${Sql.minhash(i)} AS mh$i").mkString(",\n      ")
    val mins = (0 until OverlapK).map(i => s"min(mh$i) AS m$i").mkString(", ")
    val matches = (0 until OverlapK)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""
    WITH sigs AS (
      SELECT doc_id, $mhs
      FROM (${Sql.shBase})),
    ss AS (
      SELECT source, $mins
      FROM sigs JOIN documents USING (doc_id) GROUP BY source),
    est AS (
      SELECT a.source AS src_a, b.source AS src_b,
        CAST($matches AS BIGINT) AS n_match
      FROM ss a JOIN ss b ON a.source < b.source),
    ssh AS (
      SELECT DISTINCT source, h
      FROM (SELECT source, unnest(sh) AS h
            FROM (${Sql.shBase}) JOIN documents USING (doc_id))),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM ssh GROUP BY source),
    it AS (
      SELECT x.source AS src_a, y.source AS src_b, CAST(count(*) AS BIGINT) AS inter
      FROM ssh x JOIN ssh y ON x.h = y.h AND x.source < y.source
      GROUP BY 1, 2),
    px AS (
      SELECT a.source AS src_a, b.source AS src_b, a.sz AS sza, b.sz AS szb
      FROM sz a JOIN sz b ON a.source < b.source),
    ex AS (
      SELECT px.src_a, px.src_b,
        CAST(coalesce(it.inter, 0) AS BIGINT) AS inter,
        CAST(px.sza + px.szb - coalesce(it.inter, 0) AS BIGINT) AS n_union
      FROM px LEFT JOIN it USING (src_a, src_b))
    SELECT e.src_a, e.src_b, e.n_match,
      CAST((e.n_match * 10000) // $OverlapK AS BIGINT) AS est_bp,
      ex.inter, ex.n_union,
      CAST((ex.inter * 10000) // ex.n_union AS BIGINT) AS exact_bp
    FROM est e JOIN ex USING (src_a, src_b)
    ORDER BY src_a, src_b"""
  }

  /** q134 — content-defined chunking (CDC) dedup: chunk boundaries fall
    * AFTER any token whose hash ≡ 0 (mod 8) — a content-derived rule, so
    * an insertion near the head of a document shifts only the chunks it
    * touches while every later chunk keeps its identity (fixed-size
    * segmentation, q106, re-keys everything downstream — CDC is the
    * rolling-hash discipline storage dedup uses for exactly this reason).
    * Chunk identity is a position-weighted hash sum mod P, so reordered
    * token multisets do NOT collide. Per doc: chunk count, chunks shared
    * with any other document, and the duplicated token mass they cover.
    * (Production CDC adds min/max chunk-size clamps — FastCDC — omitted
    * here; expected chunk length is the divisor, 8.)
    *
    * Scale shape: chunking is pure map-side array work (boundaries,
    * slices, weighted folds over materialized token-hash arrays); what
    * shuffles is (doc_id, clen, chash) — one exchange keyed on the chunk
    * hash for the sharing count, one join back on the same key, and the
    * per-doc re-aggregate. No doc×doc comparison anywhere. */
  def q134(spark: SparkSession, d: String): DataFrame = {
    val P = Hashing.P
    val base = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), transform(col("toks"), w => Hashing.hash32(w)).as("th"))
      .filter(size(col("th")) > 0)
    val withB = base
      .withColumn("bnds", filter(sequence(lit(1), size(col("th"))),
        i => element_at(col("th"), i) % 8L === 0L || i === size(col("th"))))
      .withColumn("bseq", sequence(lit(1), size(col("bnds"))))
    // posexplode_outer: exempt from InferFiltersFromGenerate (round-7
    // gotcha) and row-identical because bseq is provably non-empty (the
    // last token index is always a boundary and size(th) > 0 here)
    val chunks = withB
      .select(col("doc_id"), col("th"), col("bnds"),
        posexplode_outer(col("bseq")).as(Seq("p0", "ci")))
      .withColumn("lo", when(col("ci") === 1, lit(1))
        .otherwise(element_at(col("bnds"), col("ci") - 1) + 1))
      .withColumn("hi", element_at(col("bnds"), col("ci")))
      .withColumn("clen", (col("hi") - col("lo") + 1).cast("long"))
      .withColumn("chash",
        aggregate(transform(sequence(col("lo"), col("hi")),
          j => ((j - col("lo") + 1).cast("long") * element_at(col("th"), j)) % P),
          lit(0L), (s, v) => s + v) % P)
      .select(col("doc_id"), col("clen"), col("chash"))
    val counts = chunks.groupBy(col("chash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks.join(counts, Seq("chash"))
      .groupBy(col("doc_id")).agg(
        sum(col("clen")).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1L, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("nd") > 1L, col("clen")).otherwise(0L)).as("dup_tokens"))
      .withColumn("dup_bp", expr("(dup_tokens * 10000) DIV n_tokens"))
      .orderBy(col("doc_id"))
  }

  val q134Sql: String = s"""
    WITH t AS (SELECT doc_id, ${Sql.th} AS th FROM documents),
    b AS (
      SELECT doc_id, th,
        list_filter(range(1, len(th) + 1),
          i -> th[i] % 8 = 0 OR i = len(th)) AS bnds
      FROM t WHERE len(th) > 0),
    c AS (
      SELECT doc_id, th, bnds, unnest(range(1, len(bnds) + 1)) AS ci FROM b),
    lohi AS (
      SELECT doc_id, th,
        (CASE WHEN ci = 1 THEN 1 ELSE bnds[ci - 1] + 1 END) AS lo,
        bnds[ci] AS hi
      FROM c),
    ch AS (
      SELECT doc_id, CAST(hi - lo + 1 AS BIGINT) AS clen,
        list_sum(list_transform(range(lo, hi + 1),
          j -> ((j - lo + 1) * th[j]) % ${Hashing.P})) % ${Hashing.P} AS chash
      FROM lohi),
    cnt AS (SELECT chash, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chash),
    j AS (SELECT ch.doc_id, ch.clen, cnt.nd FROM ch JOIN cnt USING (chash))
    SELECT doc_id,
      CAST(sum(clen) AS BIGINT) AS n_tokens,
      CAST(count(*) AS BIGINT) AS n_chunks,
      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      CAST(sum(CASE WHEN nd > 1 THEN clen ELSE 0 END) AS BIGINT) AS dup_tokens,
      CAST((sum(CASE WHEN nd > 1 THEN clen ELSE 0 END) * 10000) // sum(clen) AS BIGINT) AS dup_bp
    FROM j GROUP BY doc_id ORDER BY doc_id"""

  val defs: Map[String, Q] = Map(
    "q167_span_dedup" -> (q167 _),
    "q134_cdc_chunk_dedup" -> (q134 _),
    "q133_source_overlap" -> (q133 _),
    "q125_split_leakage" -> (q125 _),
    "q119_novelty_score" -> (q119 _),
    "q106_segment_dedup" -> (q106 _),
    "q107_bloom_decontaminate" -> (q107 _),
    "q101_incremental_dedup" -> (q101 _),
    "q150_segment_savings" -> (q150 _),
    "q149_contamination_report" -> (q149 _),
    "q78_decontamination" -> (q78 _),
    "q20_dedup_exact" -> (q20 _),
    "q21_minhash_signatures" -> (q21 _),
    "q22_lsh_candidate_pairs" -> (q22 _),
    "q23_jaccard_near_dups" -> (q23 _),
    "q24_simhash" -> (q24 _),
    "q25_simhash_near_dups" -> (q25 _),
    "q29_dup_clusters" -> (q29 _),
    "q177_star_clusters" -> (q177 _),
    "q38_dedup_survivors" -> (q38 _))

  val oracles: Map[String, String] = Map(
    "q167_span_dedup" -> q167Sql,
    "q134_cdc_chunk_dedup" -> q134Sql,
    "q133_source_overlap" -> q133Sql,
    "q125_split_leakage" -> q125Sql,
    "q119_novelty_score" -> q119Sql,
    "q106_segment_dedup" -> q106Sql,
    "q107_bloom_decontaminate" -> q107Sql,
    "q101_incremental_dedup" -> q101Sql,
    "q150_segment_savings" -> q150Sql,
    "q149_contamination_report" -> q149Sql,
    "q78_decontamination" -> q78Sql,
    "q20_dedup_exact" -> q20Sql,
    "q21_minhash_signatures" -> q21Sql,
    "q22_lsh_candidate_pairs" -> q22Sql,
    "q23_jaccard_near_dups" -> q23Sql,
    "q24_simhash" -> q24Sql,
    "q25_simhash_near_dups" -> q25Sql,
    "q29_dup_clusters" -> q29Sql,
    "q177_star_clusters" -> q177Sql,
    "q38_dedup_survivors" -> q38Sql)
}
