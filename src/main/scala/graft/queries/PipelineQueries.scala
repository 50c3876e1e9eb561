package graft.queries

import graft.Tables
import graft.functions.{Pii, Text}
import graft.functions.expressions.NfcNormalize
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 corpus-pipeline operators: PII redaction, Gopher-style repetition
  * signals, TF-IDF term ranking, corpus-level n-gram dedup, Unicode NFC
  * canonicalization, and Lloyd's k-means over embeddings. All deterministic
  * integer/exact arithmetic so the DuckDB oracle hash-matches byte-for-byte.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q46 PII

  /** q46 — PII detection + redaction. The synthetic corpus carries no real
    * PII, so the query plants it deterministically from customer keys (the
    * same construction in both engines), then detects and redacts. The
    * operator under test is [[Pii]]: map-side regex counts + replacement,
    * zero shuffles beyond the final sort.
    */
  def q46(spark: SparkSession, d: String): DataFrame = {
    val key = col("c_custkey")
    def s(c: Column): Column = c.cast(StringType)
    val email = concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com"))
    val phone = concat(lit("555-"), lpad(s(key * 7 % 1000), 3, "0"),
      lit("-"), lpad(s(key * 13 % 10000), 4, "0"))
    val ip = concat(lit("10."), s(key % 256), lit("."), s(key * 3 % 256),
      lit("."), s(key * 7 % 256))
    val ssn = concat(lpad(s(key * 3 % 900 + 100), 3, "0"), lit("-"),
      lpad(s(key % 89 + 10), 2, "0"), lit("-"), lpad(s(key * 11 % 9000 + 1000), 4, "0"))
    val textCol = when(key % 4 === 0, concat(col("c_name"), lit(" contact pending")))
      .when(key % 4 === 1, concat(col("c_name"), lit(" email "), email, lit(" tel "), phone))
      .when(key % 4 === 2, concat(col("c_name"), lit(" last login from "), ip, lit(" ssn "), ssn))
      .otherwise(concat(col("c_name"), lit(" "), email, lit(" "), ip,
        lit(" "), phone, lit(" "), ssn))
    val src = Tables.customer(spark, d).select(col("c_custkey"), textCol.as("contact"))
    val countCols = Pii.counts(col("contact")).map { case (n, c) => c.as(s"n_$n") }
    src.select(
      (col("c_custkey") +: countCols :+
        Pii.totalCount(col("contact")).as("n_total") :+
        Pii.redact(col("contact")).as("redacted")): _*)
      .orderBy(col("c_custkey"))
  }

  val q46Sql: String = {
    val email = "lower(replace(c_name, '#', '.')) || '@example.com'"
    val phone = "'555-' || lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0')"
    val ip = "'10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' || " +
      "CAST(c_custkey * 3 % 256 AS VARCHAR) || '.' || CAST(c_custkey * 7 % 256 AS VARCHAR)"
    val ssn = "lpad(CAST(c_custkey * 3 % 900 + 100 AS VARCHAR), 3, '0') || '-' || " +
      "lpad(CAST(c_custkey % 89 + 10 AS VARCHAR), 2, '0') || '-' || " +
      "lpad(CAST(c_custkey * 11 % 9000 + 1000 AS VARCHAR), 4, '0')"
    val counts = Pii.Categories
      .map { case (n, p, _) =>
        s"CAST(len(regexp_extract_all(contact, '$p')) AS BIGINT) AS n_$n"
      }
      .mkString(",\n        ")
    val redacted = Pii.Categories.foldLeft("contact") { case (acc, (_, p, tok)) =>
      s"regexp_replace($acc, '$p', '$tok', 'g')"
    }
    s"""
    WITH src AS (
      SELECT c_custkey,
        CASE
          WHEN c_custkey % 4 = 0 THEN c_name || ' contact pending'
          WHEN c_custkey % 4 = 1 THEN c_name || ' email ' || $email || ' tel ' || $phone
          WHEN c_custkey % 4 = 2 THEN c_name || ' last login from ' || $ip || ' ssn ' || $ssn
          ELSE c_name || ' ' || $email || ' ' || $ip || ' ' || $phone || ' ' || $ssn
        END AS contact
      FROM customer
    ), counted AS (
      SELECT c_custkey, contact,
        $counts
      FROM src
    )
    SELECT c_custkey,
      ${Pii.Categories.map { case (n, _, _) => s"n_$n" }.mkString(", ")},
      CAST(${Pii.Categories.map { case (n, _, _) => s"n_$n" }.mkString(" + ")} AS BIGINT)
        AS n_total,
      $redacted AS redacted
    FROM counted
    ORDER BY c_custkey"""
  }

  // --------------------------------------------- q47 repetition signals

  /** q47 — Gopher-style repetition signals, fully map-side: per-document
    * top-token fraction, top-bigram fraction, and duplicated-token fraction
    * (permille, floor), computed with array expressions inside whole-stage
    * codegen. O(n^2) in tokens-per-doc, which is bounded by document length,
    * not corpus size — the shape survives any corpus scale with zero
    * shuffles beyond the final sort.
    */
  def q47(spark: SparkSession, d: String): DataFrame = {
    // zero-token docs are excluded on BOTH sides: Spark tokenizes '' to an
    // empty array while string_split('', ' ') yields [''] — the one input
    // where the engines' token counts (0 vs 1) could diverge
    val docs = Tables.documents(spark, d)
    val t = Text.tokens(col("text"))
    val withTok = docs.select(col("doc_id"), t.as("t"), size(t).as("n"))
      .where(col("n") > 0)
    val counts = transform(col("t"), w => size(filter(col("t"), x => x === w)))
    val bigrams = when(col("n") >= 2,
      transform(sequence(lit(1), col("n") - 1),
        i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    val stage = withTok.select(col("doc_id"), col("n"), counts.as("wc"), bigrams.as("bg"))
    val bgCounts = transform(col("bg"), w => size(filter(col("bg"), x => x === w)))
    stage.select(
      col("doc_id"),
      col("n").cast(LongType).as("n_tokens"),
      floor(array_max(col("wc")) * 1000d / col("n")).cast(LongType).as("top_token_permille"),
      when(col("n") >= 2, floor(array_max(bgCounts) * 1000d / (col("n") - 1)))
        .otherwise(lit(0)).cast(LongType).as("top_bigram_permille"),
      floor(size(filter(col("wc"), c => c >= 2)) * 1000d / col("n"))
        .cast(LongType).as("dup_token_permille"))
      .orderBy(col("doc_id"))
  }

  val q47Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, string_split(${TextSql.norm}, ' ') AS t FROM documents
      WHERE length(${TextSql.norm}) > 0
    ), stage AS (
      SELECT doc_id, len(t) AS n,
        list_transform(t, w -> len(list_filter(t, x -> x = w))) AS wc,
        list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]) AS bg
      FROM toks
    )
    SELECT doc_id,
      CAST(n AS BIGINT) AS n_tokens,
      CAST(floor(list_aggregate(wc, 'max') * 1000.0 / n) AS BIGINT) AS top_token_permille,
      CAST(CASE WHEN n >= 2 THEN floor(
          list_aggregate(list_transform(bg, w -> len(list_filter(bg, x -> x = w))), 'max')
            * 1000.0 / (n - 1))
        ELSE 0 END AS BIGINT) AS top_bigram_permille,
      CAST(floor(len(list_filter(wc, c -> c >= 2)) * 1000.0 / n) AS BIGINT)
        AS dup_token_permille
    FROM stage ORDER BY doc_id"""

  // ------------------------------------------------------ q48 tf-idf terms

  /** q48 — TF-IDF-style term ranking: top-3 terms per document by term
    * frequency weighted by inverse document frequency (scaled-integer score
    * so both engines agree exactly). Two aggregations (tf per doc-term, df
    * per term) + one window — the classic two-shuffle shape; df is tiny
    * (vocabulary-sized) and broadcasts back onto tf.
    */
  def q48(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .where(size(col("t")) > 0)
    val toks = docs.select(col("doc_id"), explode(col("t")).as("word"))
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("word").agg(countDistinct("doc_id").as("df"))
    val scored = tf.join(broadcast(df), Seq("word"))
      .select(col("doc_id"), col("word"),
        floor(col("tf") * 1000000d / col("df")).cast(LongType).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("word"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= 3)
      .select("doc_id", "rank", "word", "score")
      .orderBy(col("doc_id"), col("rank"))
  }

  val q48Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(${TextSql.norm}, ' ')) AS word
      FROM documents WHERE length(${TextSql.norm}) > 0
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
    ), scored AS (
      SELECT doc_id, word, CAST(floor(tf * 1000000.0 / df) AS BIGINT) AS score
      FROM tf JOIN df USING (word)
    ), ranked AS (
      SELECT doc_id, word, score,
        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS BIGINT)
          AS rank
      FROM scored
    )
    SELECT doc_id, rank, word, score FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank"""

  // ------------------------------------------- q49 corpus n-gram dedup

  /** q49 — corpus-level exact n-gram dedup (C4-style): every document's
    * distinct 8-gram shingles, counted across the corpus; documents whose
    * duplicated-shingle fraction exceeds 1/2 are dropped. Shuffles only
    * (shingle) and (doc_id) keys — shingle work never pairs documents.
    */
  def q49(spark: SparkSession, d: String): DataFrame = {
    // Materialize the token array BEFORE shingling (lambda expressions don't
    // share subexpressions — see Text.shingles) and spread the single-row-
    // group scan across the cluster for the per-row shingle work.
    val docs = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"),
        Text.normalize(col("text")).as("norm"))
    val sh = docs.select(col("doc_id"),
      explode(Text.shinglesOfTokens(col("t"), col("norm"), 8)).as("sh"))
    val counts = sh.groupBy("sh").agg(count(lit(1)).as("n_docs"))
    sh.join(counts, Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("dup_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("dup_shingles"),
        floor(col("dup_shingles") * 1000d / col("n_shingles")).cast(LongType)
          .as("dup_permille"))
      .withColumn("keep", col("dup_permille") <= 500)
      .orderBy(col("doc_id"))
  }

  val q49Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, ${TextSql.norm} AS norm, string_split(${TextSql.norm}, ' ') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) < 8 THEN [norm]
             ELSE list_distinct(list_transform(range(1, len(t) - 6),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) END) AS sh
      FROM toks
    ), counts AS (
      SELECT sh, count(*) AS n_docs FROM sh GROUP BY sh
    )
    SELECT doc_id,
      count(*) AS n_shingles,
      CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles,
      CAST(floor(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) * 1000.0 / count(*)) AS BIGINT)
        AS dup_permille,
      CAST(floor(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) * 1000.0 / count(*)) AS BIGINT)
        <= 500 AS keep
    FROM sh JOIN counts USING (sh)
    GROUP BY doc_id ORDER BY doc_id"""

  // -------------------------------------------------- q96 semantic dedup

  /** q96 — embedding-cosine near-dup dedup, end-to-end: the corpus has no
    * natural semantic dups (random vectors), so every 10th vector gets a
    * deterministically-perturbed variant planted (same construction in both
    * engines, cosine ~0.9999 to its original); the pipeline then finds
    * within-label pairs above 0.99, runs min-label connected components
    * ([[graft.operators.DupClusters]]), and keeps one survivor per cluster.
    * The scale shape is q37's: label-pruned pairs, norms precomputed
    * map-side, never an unpruned all-pairs join.
    */
  def q96(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Vectors
    val base = Tables.parallel(Tables.embeddings(spark, d))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast(DoubleType) * 1000000d).cast(LongType)).as("qv"))
    // transform's vec_id resolves against the INPUT row (the original id);
    // the +100000 alias applies only to the output column
    val variants = base.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("label"),
        transform(col("qv"), (x, i) =>
          x + (col("vec_id") * 7 + i) % 2001 - 1000).as("qv"))
    val corpus = base.unionByName(variants)
      .withColumn("norm", sqrt(Vectors.dotLong(col("qv"), col("qv")).cast(DoubleType)))
    // Cell-BOUNDED candidate pairs (the 100x guard): cells under the cap
    // pair exactly (identity here — the largest sf0.1 cell is ~240 incl.
    // variants, far under 1024 — so the oracle's plain within-label pairs
    // match bit-exactly); a degenerate cell would be refined by hyperplane
    // sub-buckets instead of going quadratic. See SemanticDedup's scaladoc
    // for the recall trade that engages only above the cap.
    val pairs = graft.operators.SemanticDedup.boundedPairs(
      corpus, idCol = "vec_id", labelCol = "label", qvCol = "qv",
      normCol = "norm", dim = 64, threshold = 0.99, maxCellSize = 1024)
    val clusters = graft.operators.DupClusters.assign(pairs)
      .withColumnRenamed("doc_id", "vec_id")
    corpus.select(col("vec_id")).join(clusters, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .withColumn("keep", col("vec_id") === col("cluster_id"))
      .orderBy(col("vec_id"))
  }

  val q96Sql: String = {
    val qv = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    val dot = "CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*b.qv[i])) AS DOUBLE)"
    val na = "sqrt(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*a.qv[i])) AS DOUBLE))"
    val nb = "sqrt(CAST(list_sum(list_transform(range(1, len(b.qv)+1), i -> b.qv[i]*b.qv[i])) AS DOUBLE))"
    s"""
    WITH RECURSIVE base AS (SELECT vec_id, label, $qv AS qv FROM embeddings),
    variants AS (
      -- alias kept distinct from vec_id: a lateral column alias would
      -- otherwise capture the lambda's vec_id reference
      SELECT vec_id + 100000 AS vid, label,
        list_transform(range(1, len(qv) + 1),
          i -> qv[i] + (vec_id * 7 + (i - 1)) % 2001 - 1000) AS qv
      FROM base WHERE vec_id % 10 = 0),
    corpus AS (SELECT vec_id, label, qv FROM base
               UNION ALL SELECT vid, label, qv FROM variants),
    pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE $dot / ($na * $nb) >= 0.99),
    edges AS (SELECT va AS u, vb AS v FROM pairs
              UNION ALL SELECT vb, va FROM pairs),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
    clusters AS (SELECT u AS vec_id, min(r) AS cluster_id FROM reach GROUP BY u)
    SELECT c.vec_id, COALESCE(cl.cluster_id, c.vec_id) AS cluster_id,
      c.vec_id = COALESCE(cl.cluster_id, c.vec_id) AS keep
    FROM corpus c LEFT JOIN clusters cl ON c.vec_id = cl.vec_id
    ORDER BY c.vec_id"""
  }

  // ------------------------------------------------------ q95 doc chunking

  private val ChunkLen = 32
  private val ChunkStride = 16

  /** q95 — context-window chunking: split each document's token stream into
    * fixed-length windows with 50% overlap (the standard long-document ->
    * training-sample step). Pure map-side array slicing — zero shuffles;
    * each chunk carries its token count and a content fingerprint so
    * downstream packing/dedup can run without re-tokenizing. The final
    * (short) window is kept iff it adds tokens the previous window did not
    * cover. */
  def q95(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .where(col("n") > 0)
    // chunk starts: 1, 1+stride, 1+2*stride, ... while start <= n (the
    // last window may be short); drop a trailing window fully covered by
    // its predecessor (start + len(prev) > n means prev reached the end).
    val starts = sequence(lit(1), col("n"), lit(ChunkStride))
    // the token array rides THROUGH the generator select: no second
    // tokenization pass and no self-join — the plan stays one scan + one
    // final sort
    val chunks = docs
      .select(col("doc_id"), col("n"), col("t"),
        posexplode(starts).as(Seq("idx", "start")))
      .where(col("idx") === 0 || col("start") + lit(ChunkLen - ChunkStride) <= col("n"))
    chunks
      .select(col("doc_id"), col("idx").cast(LongType).as("chunk_idx"),
        slice(col("t"), col("start"), lit(ChunkLen)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast(LongType).as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val q95Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, string_split(${TextSql.norm}, ' ') AS t,
        len(string_split(${TextSql.norm}, ' ')) AS n
      FROM documents WHERE length(${TextSql.norm}) > 0
    ), starts AS (
      SELECT doc_id, n, t, unnest(range(1, n + 1, $ChunkStride)) AS start
      FROM toks
    ), kept AS (
      SELECT doc_id, n, t, start, (start - 1) // $ChunkStride AS idx FROM starts
      WHERE start = 1 OR start + ${ChunkLen - ChunkStride} <= n
    )
    SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
      CAST(len(t[start:least(start + $ChunkLen - 1, n)]) AS BIGINT) AS n_tokens,
      md5(array_to_string(t[start:least(start + $ChunkLen - 1, n)], ' ')) AS fp
    FROM kept ORDER BY doc_id, chunk_idx"""

  private val SeqLen = 512L
  private val PackBucket = 64L

  /** q174 — cross-document SEQUENCE PACKING: concatenate the corpus token
    * stream in deterministic doc order and cut it into fixed 512-token
    * training windows (the concat-and-chunk step every pretraining run
    * performs after filtering; q95 chunks WITHIN a doc, this packs ACROSS
    * docs). The global token offset is a TWO-LEVEL cumulative sum — a
    * window partitioned by contiguous doc buckets (parallel, each bucket
    * local), plus an exclusive prefix over the tiny bucket-totals frame —
    * so no operator ever moves the corpus into one partition (the naive
    * global-ORDER window would). Per window it reports how many documents
    * contribute, how many start there, and the filled token count (= 512
    * everywhere but the final window) — the packing-efficiency /
    * boundary-fragmentation numbers a data-loader build is gated on.
    * Each doc spans (n_tok/512 + 1) windows at most, so the exploded
    * frame is tokens/512 + n_docs rows — linear, never doc x window. */
  def q174(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokenCount(col("text")).cast(LongType).as("n"))
      .where(col("n") > 0)
      .withColumn("bucket", expr(s"doc_id DIV $PackBucket"))
    val local = lens.withColumn("cum_in",
      sum(col("n")).over(Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // bucket-totals frame: one row per 64 docs — the only global-ordered
    // window runs over THIS, not the corpus (at another 10^4x, nest the
    // same two-level step once more)
    val offsets = lens.groupBy(col("bucket")).agg(sum(col("n")).as("bt"))
      .withColumn("boff",
        sum(col("bt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("bt"))
      .select(col("bucket"), col("boff"))
    val placed = local.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"),
        (col("boff") + col("cum_in") - col("n")).as("start"), col("n"))
      .withColumn("start_seq", expr(s"start DIV $SeqLen"))
      .withColumn("end_seq", expr(s"(start + n - 1) DIV $SeqLen"))
    placed
      .select(col("doc_id"), col("start"), col("n"), col("start_seq"),
        explode(sequence(col("start_seq"), col("end_seq"))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("start_seq") === col("seq_id"), 1L).otherwise(0L))
          .as("n_doc_starts"),
        sum(least(col("start") + col("n"), (col("seq_id") + 1) * SeqLen) -
          greatest(col("start"), col("seq_id") * SeqLen)).as("n_tokens"))
      .orderBy(col("seq_id"))
  }

  val q174Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(${TextSql.norm}, ' ')) AS BIGINT) AS n
      FROM documents WHERE length(${TextSql.norm}) > 0
    ), pos AS (
      SELECT doc_id, n,
        CAST(sum(n) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
      FROM toks
    ), spans AS (
      SELECT doc_id, start, n, start // $SeqLen AS start_seq,
        unnest(range(start // $SeqLen, (start + n - 1) // $SeqLen + 1)) AS seq_id
      FROM pos)
    SELECT seq_id, count(*) AS n_docs,
      CAST(sum(CASE WHEN start_seq = seq_id THEN 1 ELSE 0 END) AS BIGINT)
        AS n_doc_starts,
      CAST(sum(least(start + n, (seq_id + 1) * $SeqLen)
        - greatest(start, seq_id * $SeqLen)) AS BIGINT) AS n_tokens
    FROM spans GROUP BY seq_id ORDER BY seq_id"""

  /** q175 — EPOCH-SHUFFLED sequence packing: q174's concat-and-chunk, but
    * over the per-epoch pseudo-random document order every pretraining
    * run actually uses (deterministic: order by a salted md5-derived
    * 32-bit hash of the doc id, epoch 1 here). This is the general case
    * of the two-level cumsum — the contiguous buckets can no longer be
    * id ranges, so they become HASH RANGES (the top bits of the order
    * key): still contiguous in the shuffle order, still parallel, and
    * the bucket-offset prefix still runs over the tiny totals frame. One
    * window boundary now packs an arbitrary doc pair, which is exactly
    * what the report measures: fragmentation under shuffling matches
    * q174's within a window or two (conservation is identical). */
  def q175(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokenCount(col("text")).cast(LongType).as("n"))
      .where(col("n") > 0)
      .withColumn("h", graft.functions.Hashing.hash32(
        concat(lit("pack:1:"), col("doc_id").cast("string"))))
      .withColumn("bucket", expr("h DIV 67108864")) // 2^26: 64 hash ranges
    val local = lens.withColumn("cum_in",
      sum(col("n")).over(Window.partitionBy(col("bucket"))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = lens.groupBy(col("bucket")).agg(sum(col("n")).as("bt"))
      .withColumn("boff",
        sum(col("bt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("bt"))
      .select(col("bucket"), col("boff"))
    val placed = local.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"),
        (col("boff") + col("cum_in") - col("n")).as("start"), col("n"))
      .withColumn("start_seq", expr(s"start DIV $SeqLen"))
      .withColumn("end_seq", expr(s"(start + n - 1) DIV $SeqLen"))
    placed
      .select(col("start"), col("n"), col("start_seq"),
        explode(sequence(col("start_seq"), col("end_seq"))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("start_seq") === col("seq_id"), 1L).otherwise(0L))
          .as("n_doc_starts"),
        sum(least(col("start") + col("n"), (col("seq_id") + 1) * SeqLen) -
          greatest(col("start"), col("seq_id") * SeqLen)).as("n_tokens"))
      .orderBy(col("seq_id"))
  }

  val q175Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(${TextSql.norm}, ' ')) AS BIGINT) AS n,
        CAST('0x' || substring(md5('pack:1:' || CAST(doc_id AS VARCHAR)), 1, 8)
          AS BIGINT) AS h
      FROM documents WHERE length(${TextSql.norm}) > 0
    ), pos AS (
      SELECT doc_id, n,
        CAST(sum(n) OVER (ORDER BY h, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
      FROM toks
    ), spans AS (
      SELECT doc_id, start, n, start // $SeqLen AS start_seq,
        unnest(range(start // $SeqLen, (start + n - 1) // $SeqLen + 1)) AS seq_id
      FROM pos)
    SELECT seq_id, count(*) AS n_docs,
      CAST(sum(CASE WHEN start_seq = seq_id THEN 1 ELSE 0 END) AS BIGINT)
        AS n_doc_starts,
      CAST(sum(least(start + n, (seq_id + 1) * $SeqLen)
        - greatest(start, seq_id * $SeqLen)) AS BIGINT) AS n_tokens
    FROM spans GROUP BY seq_id ORDER BY seq_id"""

  private val PpsSamples = 100L

  /** q178 — weight-proportional (PPS) SYSTEMATIC sampling: pick ~k docs
    * with probability proportional to token count, deterministically and
    * in ONE pass. Classic survey-sampling systematic selection: lay the
    * docs on the cumulative-weight axis (the same two-level cumsum as
    * q174 — bucket-local windows + a tiny bucket-offset prefix, never a
    * corpus-wide single-partition window), take every (total/k)-th weight
    * unit, and keep each doc once per selection point its interval covers
    * (long docs can be hit multiple times — that multiplicity IS the PPS
    * weight, reported as n_hits). All arithmetic is integer, so selection
    * is exact across engines — no ln()/float jitter at the boundaries the
    * way Efraimidis-Spirakis keys would be. A weighted epoch-sampler in a
    * training-data pipeline is exactly this with weight = quality score.
    */
  def q178(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokenCount(col("text")).cast(LongType).as("n"))
      .where(col("n") > 0)
      .withColumn("bucket", expr(s"doc_id DIV $PackBucket"))
    val local = lens.withColumn("cw",
      sum(col("n")).over(Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = lens.groupBy(col("bucket")).agg(sum(col("n")).as("bt"))
      .withColumn("boff",
        sum(col("bt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("bt"))
      .select(col("bucket"), col("boff"))
    val total = lens.agg(sum(col("n")).as("tw"))
    local.join(broadcast(offsets), Seq("bucket"))
      .crossJoin(broadcast(total))
      .withColumn("stride", greatest(expr(s"tw DIV $PpsSamples"), lit(1L)))
      .withColumn("cum", col("boff") + col("cw"))
      .withColumn("n_hits",
        expr("cum DIV stride") - expr("(cum - n) DIV stride"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n").as("weight"),
        col("n_hits").cast(LongType).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  val q178Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(${TextSql.norm}, ' ')) AS BIGINT) AS n
      FROM documents WHERE length(${TextSql.norm}) > 0
    ), pos AS (
      SELECT doc_id, n,
        CAST(sum(n) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        CAST(sum(n) OVER () AS BIGINT) AS tw
      FROM toks)
    SELECT doc_id, n AS weight,
      CAST(cum // greatest(tw // $PpsSamples, 1)
        - (cum - n) // greatest(tw // $PpsSamples, 1) AS BIGINT) AS n_hits
    FROM pos
    WHERE cum // greatest(tw // $PpsSamples, 1)
      - (cum - n) // greatest(tw // $PpsSamples, 1) > 0
    ORDER BY doc_id"""

  /** q181 — inverted-index build statistics: per token, document frequency,
    * collection frequency, and an ORDER-INSENSITIVE postings checksum
    * (bit_xor of the engine-shared hash over each (doc_id, tf) posting).
    * The checksum is the scale decision: a real postings list per token
    * (sort_array(collect_list(...))) concentrates a hot token's entire
    * posting set in one reducer row, while the xor fold is commutative and
    * map-side-combinable — constant reducer state per token, any corpus
    * size, and it still certifies posting-set equality across engines. */
  /** The q181 index body over an arbitrary docs frame — shared with the
    * incremental maintenance path (q186), whose deltas each run this. */
  private def indexOf(docs: DataFrame): DataFrame = {
    // explode_outer: InferFiltersFromGenerate discipline (see q179)
    val toks = docs
      .select(col("doc_id"), explode_outer(Text.tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
    val tf = toks.groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.select(col("word"), col("tf"),
      graft.functions.Hashing.hash32(
        concat_ws(":", col("doc_id"), col("tf"))).as("sig"))
      .groupBy(col("word"))
      .agg(count(lit(1)).cast(LongType).as("df"),
        sum(col("tf")).cast(LongType).as("cf"),
        expr("bit_xor(sig)").cast(LongType).as("postings_sig"))
  }

  def q181(spark: SparkSession, d: String): DataFrame =
    indexOf(Tables.documents(spark, d)).orderBy(col("word"))

  /** q186 — INCREMENTAL inverted-index maintenance, gated the q120 way:
    * the corpus arrives as three disjoint deltas (doc_id mod 3), each
    * builds its own partial index, and the partials MERGE into the final
    * state — which must equal the batch q181 bit-for-bit, because every
    * index statistic is a commutative monoid over disjoint doc sets
    * (df/cf sum, postings checksum xor). This is the property that lets
    * a daily ingest update the index without rescanning the corpus. */
  def q186(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val partials = (0 until 3).map(i =>
      indexOf(docs.filter(col("doc_id") % 3 === i)))
    partials.reduce(_ union _)
      .groupBy(col("word"))
      .agg(sum(col("df")).cast(LongType).as("df"),
        sum(col("cf")).cast(LongType).as("cf"),
        expr("bit_xor(postings_sig)").cast(LongType).as("postings_sig"))
      .orderBy(col("word"))
  }

  val q181Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(${TextSql.norm}, ' ')) AS word
      FROM documents WHERE length(${TextSql.norm}) > 0
    ), tf AS (
      SELECT word, doc_id, count(*) AS tf FROM toks GROUP BY word, doc_id
    )
    SELECT word, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
      CAST(bit_xor(CAST('0x' || substring(md5(
        CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR)), 1, 8) AS BIGINT))
        AS BIGINT) AS postings_sig
    FROM tf GROUP BY word ORDER BY word"""

  /** q188 — word-association mining: pointwise mutual information over
    * adjacent token co-occurrence (the statistic skip-gram embeddings and
    * collocation extractors start from). Score = ilog64 of
    * ((cooc * 2^20) DIV c_a) * T DIV c_b — the PMI ratio in integer
    * arithmetic, quantized by the engine's 64-subdivision base-2 log, so
    * ranking is exact across engines. The division by c_a comes FIRST:
    * cooc <= c_a bounds that quotient by 2^20, so the widest intermediate
    * is 2^20 * T — overflow-safe to ~10^12-token corpora, where the naive
    * cooc*T product of two corpus-linear counts wraps at ~10^9 tokens
    * (and wraps SILENTLY on the Spark side while DuckDB errors).
    * Unordered pairs via least/greatest; co-occurrence support floor of 5
    * keeps the association table vocabulary-bounded. One pair aggregation
    * + two vocabulary-sized broadcast joins — the corpus shuffles once,
    * as (l, r) pair rows. */
  def q188(spark: SparkSession, d: String): DataFrame = {
    val withTok = Tables.documents(spark, d)
      .select(Text.tokens(col("text")).as("t"))
      .select(col("t"), size(col("t")).as("n"))
      .where(col("n") >= 2) // sequence(1, n-1) needs n >= 2 (the [1,0] gotcha)
    val pairs = withTok.select(explode_outer(expr(
        "transform(sequence(1, n - 1), i -> struct(" +
          "least(element_at(t, i), element_at(t, i + 1)) AS l, " +
          "greatest(element_at(t, i), element_at(t, i + 1)) AS r))")).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.l").as("l"), col("p.r").as("r"))
    val words = Tables.documents(spark, d)
      .select(explode_outer(Text.tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
    val cnt = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
    val tot = words.agg(count(lit(1)).as("t_all"))
    def ilog64(x: String) =
      s"64 * (length(bin($x)) - 1) + ($x * 64) DIV CAST(pow(2.0D, length(bin($x)) - 1) AS BIGINT) - 64"
    pairs.groupBy(col("l"), col("r")).agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= 5)
      .join(broadcast(cnt.select(col("word").as("l"), col("c").as("ca"))), Seq("l"))
      .join(broadcast(cnt.select(col("word").as("r"), col("c").as("cb"))), Seq("r"))
      .crossJoin(broadcast(tot))
      .withColumn("x", expr("greatest(((cooc * 1048576) DIV ca) * t_all DIV cb, 1)"))
      .select(col("l"), col("r"), col("cooc").cast(LongType).as("cooc"),
        expr(ilog64("x")).cast(LongType).as("score"))
      .orderBy(col("score").desc, col("l"), col("r"))
      .limit(30)
  }

  val q188Sql: String = {
    def ilog64(x: String) =
      s"64 * (length(bin($x)) - 1) + ($x * 64) // CAST(power(2, length(bin($x)) - 1) AS BIGINT) - 64"
    s"""
    WITH toks AS (
      SELECT string_split(${TextSql.norm}, ' ') AS t FROM documents
      WHERE length(${TextSql.norm}) > 0
    ), words AS (SELECT unnest(t) AS word FROM toks),
    cnt AS (SELECT word, count(*) AS c FROM words GROUP BY word),
    tot AS (SELECT count(*) AS t_all FROM words),
    pairs AS (
      SELECT least(t[i], t[i+1]) AS l, greatest(t[i], t[i+1]) AS r
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2)
    ), co AS (SELECT l, r, count(*) AS cooc FROM pairs GROUP BY l, r
              HAVING count(*) >= 5)
    SELECT l, r, CAST(cooc AS BIGINT) AS cooc,
      CAST(${ilog64("greatest(((cooc * 1048576) // a.c) * t_all // b.c, 1)")} AS BIGINT)
        AS score
    FROM co JOIN cnt a ON a.word = l JOIN cnt b ON b.word = r, tot
    ORDER BY score DESC, l, r LIMIT 30"""
  }

  private val BmQuery = Seq("join", "hash", "filter")
  private val BmTopK = 20

  /** q183 — BM25 ranked retrieval over the inverted-index statistics, in
    * EXACT integer arithmetic: k1 = 6/5 and b = 3/4 are kept as rationals
    * and multiplied through (avgdl = T/N never materializes as a float), so
    * the tf leg is score_tf = 44*T*tf / (20*T*tf + 6*T + 18*dl*N) — one
    * integer division at the end; idf uses the engine's ilog64 quantizer
    * over ((2N-2df+1)*2^20) DIV (2df+1), the same 64-subdivision base-2
    * log q138's naive Bayes scores with. No ln()/libm surface anywhere, so
    * ranking ties break identically across engines.
    *
    * Scale shape: the tf frame is filtered to the query terms BEFORE any
    * aggregation (predicate pushdown to the scan), per-doc length is one
    * map-side agg, and the query-term df/idf frame is query-sized and
    * broadcast. Top-k by (score, doc_id) is the argmax-struct pattern —
    * a total sort of the scored frame bounded by docs matching any term. */
  def q183(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), explode_outer(Text.tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(sum(col("dl")).as("t"), count(lit(1)).as("n"))
    val qtf = toks.filter(col("word").isin(BmQuery: _*))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = qtf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    def ilog64(x: String) =
      s"64 * (length(bin($x)) - 1) + ($x * 64) DIV CAST(pow(2.0D, length(bin($x)) - 1) AS BIGINT) - 64"
    val idf = df.crossJoin(broadcast(totals))
      .withColumn("x", expr("greatest(((2*n - 2*df + 1) * 1048576) DIV (2*df + 1), 1)"))
      .select(col("word"), expr(ilog64("x")).as("idf"))
    qtf.join(broadcast(idf), Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      // overflow ordering (q188's discipline): divide the large corpus-sized
      // product through FIRST — 44*t*tf*1000 DIV denom is in [0, 2200*1000]
      // — then scale by the small idf (< 4096). Multiplying idf into the
      // numerator first would wrap int64 at t*tf ~ 7e10 (a 1e9-token corpus
      // with tf~100); this order holds to t*tf ~ 2e14, i.e. ~1e12-token
      // corpora at tf~100, matching q188's documented headroom.
      .withColumn("term_score",
        expr("idf * ((44 * t * tf * 1000) DIV (20 * t * tf + 6 * t + 18 * dl * n))"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).cast(LongType).as("score"),
        count(lit(1)).cast(LongType).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(BmTopK)
  }

  val q183Sql: String = {
    val terms = BmQuery.map(w => s"'$w'").mkString(", ")
    def ilog64(x: String) =
      s"64 * (length(bin($x)) - 1) + ($x * 64) // CAST(power(2, length(bin($x)) - 1) AS BIGINT) - 64"
    s"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(${TextSql.norm}, ' ')) AS word
      FROM documents WHERE length(${TextSql.norm}) > 0
    ), dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    totals AS (SELECT CAST(sum(dl) AS BIGINT) AS t, count(*) AS n FROM dl),
    qtf AS (SELECT doc_id, word, count(*) AS tf FROM toks
            WHERE word IN ($terms) GROUP BY doc_id, word),
    df AS (SELECT word, count(*) AS df FROM qtf GROUP BY word),
    idf AS (SELECT word,
        ${ilog64("greatest(((2*n - 2*df + 1) * 1048576) // (2*df + 1), 1)")} AS idf
      FROM df, totals),
    scored AS (
      SELECT q.doc_id,
        idf.idf * ((44 * t.t * q.tf * 1000)
          // (20 * t.t * q.tf + 6 * t.t + 18 * dl.dl * t.n)) AS term_score
      FROM qtf q JOIN idf USING (word) JOIN dl USING (doc_id), totals t)
    SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score,
      CAST(count(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT $BmTopK"""
  }

  /** q182 — link-analysis importance ([[graft.operators.RankPropagation]]):
    * integer fixed-point PageRank, three power iterations, over the
    * high-quantity co-supply graph (suppliers sharing an order with
    * l_quantity > 45; symmetric by construction, so no dangling mass).
    * The crawl-pipeline shape: importance scores over a link graph feed
    * source weighting the way q178 consumes per-doc weights. Scaled-integer
    * rank arithmetic (DIV-based damping) keeps the three iterations
    * bit-exact against the oracle's unrolled replay. */
  def q182(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .filter(col("l_quantity") > 45d)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      .distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.s") =!= col("b.s"))
      .select(col("a.s").as("src"), col("b.s").as("dst"))
      .distinct()
    graft.operators.RankPropagation.ranks(edges, iters = 3)
      .select(col("node").cast(LongType).as("supp"),
        col("r").cast(LongType).as("score"))
      .orderBy(col("supp"))
  }

  val q182Sql: String = {
    val S = graft.operators.RankPropagation.Scale
    s"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
      WHERE l_quantity > 45
    ), edges AS MATERIALIZED (
      SELECT DISTINCT a.s AS src, b.s AS dst FROM li a JOIN li b
      ON a.o = b.o AND a.s <> b.s
    ), deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST($S AS BIGINT) AS r FROM deg),
    r1 AS MATERIALIZED (
      SELECT n.node, CAST((15 * $S + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
      FROM (SELECT node FROM r0) n LEFT JOIN (
        SELECT e.dst AS node, sum(r.r // deg.d) AS s FROM edges e
        JOIN r0 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) c USING (node)
    ), r2 AS MATERIALIZED (
      SELECT n.node, CAST((15 * $S + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
      FROM (SELECT node FROM r1) n LEFT JOIN (
        SELECT e.dst AS node, sum(r.r // deg.d) AS s FROM edges e
        JOIN r1 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) c USING (node)
    ), r3 AS MATERIALIZED (
      SELECT n.node, CAST((15 * $S + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
      FROM (SELECT node FROM r2) n LEFT JOIN (
        SELECT e.dst AS node, sum(r.r // deg.d) AS s FROM edges e
        JOIN r2 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) c USING (node)
    )
    SELECT node AS supp, r AS score FROM r3 ORDER BY supp"""
  }

  // ---------------------------------------------- q92/q93 layout utilities

  /** q92 — salted join ([[graft.operators.SaltedJoin]]): lineitem keyed
    * down to 10 hot part-groups (extreme deterministic skew: ~10% of the
    * table per key) joined to a 10-row dim through the salting fan-out.
    * The oracle is the PLAIN join — salting must be invisible in results.
    */
  def q92(spark: SparkSession, d: String): DataFrame = {
    // (l_orderkey, l_linenumber) is the table's unique key: hashing it gives
    // the salt a uniform basis even though the payload columns here (grp,
    // l_quantity) are low-cardinality — salting on payload content alone
    // would collapse a hot key onto ~|distinct payloads| salts.
    val li = Tables.lineitem(spark, d)
      .select((col("l_partkey") % 10).as("grp"), col("l_quantity"),
        xxhash64(col("l_orderkey"), col("l_linenumber")).as("__rid"))
    val dim = Tables.region(spark, d).select(col("r_regionkey"), col("r_name"))
      .unionByName(Tables.nation(spark, d)
        .filter(col("n_nationkey") >= 20)
        .select(col("n_nationkey").as("r_regionkey"), col("n_name").as("r_name")))
      .withColumn("grp", col("r_regionkey") % 10)
      .select(col("grp"), col("r_name").as("grp_name"))
    graft.operators.SaltedJoin.join(li, dim, keys = Seq("grp"), salts = 8,
        rowId = Some("__rid"))
      .groupBy("grp", "grp_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(22,2)")).cast("double").as("sum_qty"))
      .orderBy(col("grp"), col("grp_name"))
  }

  val q92Sql: String = """
    WITH li AS (SELECT l_partkey % 10 AS grp, l_quantity FROM lineitem),
    dim AS (
      SELECT r_regionkey % 10 AS grp, r_name AS grp_name FROM region
      UNION ALL
      SELECT n_nationkey % 10 AS grp, n_name AS grp_name FROM nation
      WHERE n_nationkey >= 20)
    SELECT grp, grp_name, count(*) AS cnt,
      CAST(sum(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS sum_qty
    FROM li JOIN dim USING (grp)
    GROUP BY grp, grp_name ORDER BY grp, grp_name"""

  /** q93 — per-key capped sampling: keep at most 5 documents per language,
    * chosen by a deterministic content-independent hash order (md5 of the
    * id) — the "cap documents per source/domain" step of corpus curation,
    * reproducible across runs and engines. One window pass; at scale the
    * rank pushes down to a per-partition top-k before the shuffle
    * (WindowGroupLimit). */
  def q93(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast(StringType)).as("h"))
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    docs.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= 5)
      .select("lang", "rank", "doc_id")
      .orderBy(col("lang"), col("rank"))
  }

  val q93Sql: String = """
    WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
    r AS (SELECT lang, doc_id,
      CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rank
      FROM h)
    SELECT lang, rank, doc_id FROM r WHERE rank <= 5
    ORDER BY lang, rank"""

  // ---------------------------------------------------------- q59 z-order

  /** q59 — Z-order (Morton) values ([[graft.operators.ZOrder]]): the bit
    * interleave that makes a (partkey, suppkey)-clustered layout prunable
    * on either key. The query materializes the z-value per row (pure
    * shift/mask integer expression, codegen) plus the coarse z-bucket a
    * layout rewrite would range-partition on; the clustering itself is
    * exercised in `ZOrderSpec` (locality measured via partition ids). */
  def q59(spark: SparkSession, d: String): DataFrame = {
    import graft.operators.ZOrder
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    li.withColumn("z_value", ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey"))))
      .withColumn("z_bucket", shiftrightunsigned(col("z_value"), 24))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q59Sql: String = {
    val dims = Seq("l_partkey", "l_suppkey")
    def clamp(c: String) = s"least(greatest(CAST($c AS BIGINT), 0), 65535)"
    val terms = for {
      (c, dIdx) <- dims.zipWithIndex
      i <- 0 until 16
    } yield s"(((${clamp(c)} >> $i) & 1) << ${i * dims.size + dIdx})"
    val z = terms.mkString(" | ")
    s"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      CAST($z AS BIGINT) AS z_value,
      CAST(($z) >> 24 AS BIGINT) AS z_bucket
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber"""
  }

  // ----------------------------------------------------------- q58 PQ ANN

  private val PqSub = 4   // subspaces
  private val PqDim = 16  // dims per subspace (4 x 16 = embedding dim)
  private val PqK = 4     // codes per subspace codebook

  /** q58 — product-quantization ANN: corpus vectors compress to one code
    * per subspace (argmin against the subspace codebook), and each query
    * precomputes a per-subspace distance TABLE to every code; approximate
    * distance to a candidate is then [[PqSub]] array lookups + adds instead
    * of a 64-dim float scan — the asymmetric-distance (ADC) pattern that
    * makes billion-vector search memory-feasible (codes are 4 small ints
    * per vector ~ 10^-2 of corpus bytes).
    *
    * Codebooks here are the seed vectors' subspaces (training is q54's
    * k-means — PQ composes with it); at scale the candidate set comes from
    * the IVF prune (q31) rather than the full corpus, and the broadcast
    * side is the tiny query+table frame, so the scan side never shuffles.
    */
  def q58(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = quantized(spark, d)
    val seeds: Seq[(Int, Seq[Long])] = vecs.where(col("vec_id") < PqK)
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Long](1))).toSeq.sortBy(_._1)
    def subOf(v: Seq[Long], s: Int): Seq[Long] = v.slice(s * PqDim, (s + 1) * PqDim)
    def subCol(s: Int): Column = slice(col("v"), s * PqDim + 1, PqDim)

    val coded = vecs.where(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id") +: (0 until PqSub).map { s =>
        val cands = seeds.map { case (cid, sv) =>
          struct(distTo(subCol(s), subOf(sv, s)).as("dist"), lit(cid).as("cid"))
        }
        array_min(array(cands: _*)).getField("cid").as(s"code$s")
      }: _*)
    val qtabs = vecs.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id") +: (0 until PqSub).map { s =>
        array(seeds.map { case (_, sv) => distTo(subCol(s), subOf(sv, s)) }: _*)
          .as(s"tab$s")
      }: _*)

    val adc = (0 until PqSub)
      .map(s => element_at(col(s"tab$s"), col(s"code$s") + 1)).reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))
    coded.join(broadcast(qtabs))
      .withColumn("adc_dist", adc)
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
      .orderBy(col("query_id"), col("rank"))
  }

  val q58Sql: String = {
    val qv = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    def subDist(a: String, b: String, s: Int) = {
      val off = s * PqDim
      s"CAST(list_sum(list_transform(range(1, ${PqDim + 1}), i -> ($a.v[$off + i] - $b.v[$off + i]) * ($a.v[$off + i] - $b.v[$off + i]))) AS BIGINT)"
    }
    val codeCtes = (0 until PqSub).map { s =>
      s"""d$s AS (SELECT c.vec_id, sd.cid, ${subDist("c", "sd", s)} AS dd
         FROM corpus c CROSS JOIN seeds sd),
    code$s AS (SELECT vec_id, cid AS code FROM
      (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn FROM d$s)
      WHERE rn = 1)"""
    }.mkString(",\n    ")
    val qtabCtes = (0 until PqSub).map { s =>
      s"""qt$s AS (SELECT q.vec_id AS query_id, sd.cid, ${subDist("q", "sd", s)} AS dd
         FROM queries q CROSS JOIN seeds sd)"""
    }.mkString(",\n    ")
    val qtJoins = (0 until PqSub).map { s =>
      s"JOIN qt$s ON qt$s.cid = c$s.code" +
        (if (s == 0) "" else s" AND qt$s.query_id = qt0.query_id")
    }.mkString("\n      ")
    val codeJoins = (1 until PqSub).map(s => s"JOIN code$s c$s USING (vec_id)").mkString(" ")
    s"""
    WITH e AS (SELECT vec_id, $qv AS v FROM embeddings),
    seeds AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < $PqK),
    corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
    queries AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
    $codeCtes,
    $qtabCtes,
    adc AS (
      SELECT qt0.query_id, c0.vec_id AS neighbor_id,
        ${(0 until PqSub).map(s => s"qt$s.dd").mkString(" + ")} AS adc_dist
      FROM code0 c0 $codeJoins
      $qtJoins
    ),
    ranked AS (SELECT query_id, neighbor_id, adc_dist,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rank
      FROM adc)
    SELECT query_id, rank, neighbor_id, adc_dist FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank"""
  }

  // ------------------------------------------------------ q111 SQ8 ANN

  /** q111 — scalar-quantization (SQ8) ANN: every corpus vector compresses
    * to ONE BYTE per dimension against per-dimension [min, max] ranges
    * learned from the corpus — the standard first memory lever (4x vs
    * float32) before IVF/PQ, and the asymmetric-distance discipline: the
    * QUERY stays full precision, candidates are reconstructed from codes.
    *
    * Exactness: runs on the shared fixed-point quantization (floor(x*1e6)
    * longs), codes are integer floor-division, and the distance is scaled
    * by 255 throughout — d = sum_i (255*q_i - (255*mn_i + c_i*rg_i))^2 —
    * a pure-integer monotone image of the reconstruction distance, so the
    * oracle reproduces every score and rank bit-for-bit. Max magnitude:
    * 255 * 1e6-scale diffs squared, times 64 dims < 2^62 — no overflow.
    *
    * Scale shape: the range stats are ONE posexplode agg whose 64-row
    * result ships to the driver and returns as plan literals (the Lloyd's
    * discipline); coding and scoring are map-side projections; queries
    * broadcast. The corpus never shuffles — the only exchange is the
    * final per-query top-k window over candidate rows. */
  def q111(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = quantized(spark, d)
    val corpus = vecs.where(col("vec_id") >= 10)
    val stats = corpus.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val dim = stats.length
    val mnArr = array(stats.map(s => lit(s._2)): _*)
    // a constant dimension (mx == mn) codes to 0 and reconstructs to mn;
    // range 1 keeps the divisor positive without changing any code
    val rgArr = array(stats.map(s => lit(math.max(1L, s._3 - s._2))): _*)
    // code_i = floor((v_i - mn_i) * 255 / rg_i): v <= mx ==> code <= 255.
    // The *255 numerator stays < 2^53, so the double-division floor is
    // exact and matches the oracle's integer floor-division.
    val codes = transform(col("v"), (x, i) =>
      floor(((x - element_at(mnArr, i + 1)) * 255).cast(DoubleType) /
        element_at(rgArr, i + 1)).cast(LongType))
    val coded = corpus.select(col("vec_id").as("neighbor_id"), codes.as("c"))
    val queries = vecs.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val d2 = aggregate(
      transform(sequence(lit(1), lit(dim)), i => {
        val diff = element_at(col("q"), i) * 255 -
          (element_at(mnArr, i) * 255 + element_at(col("c"), i) * element_at(rgArr, i))
        diff * diff
      }), lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("query_id").orderBy(col("sq_dist"), col("neighbor_id"))
    coded.join(broadcast(queries))
      .withColumn("sq_dist", d2)
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id", "sq_dist")
      .orderBy(col("query_id"), col("rank"))
  }

  val q111Sql: String = """
    WITH vq AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings),
    corpus AS (SELECT * FROM vq WHERE vec_id >= 10),
    qs AS (SELECT vec_id AS query_id, v AS q FROM vq WHERE vec_id < 10),
    st AS (SELECT pos, min(x) AS mn,
        CASE WHEN max(x) = min(x) THEN 1 ELSE max(x) - min(x) END AS rg
      FROM (SELECT unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM corpus)
      GROUP BY pos),
    stl AS (SELECT list(mn ORDER BY pos) AS mns, list(rg ORDER BY pos) AS rgs FROM st),
    coded AS (SELECT vec_id AS neighbor_id,
        list_transform(range(1, len(v) + 1), i -> (v[i] - mns[i]) * 255 // rgs[i]) AS c
      FROM corpus, stl),
    scored AS (SELECT query_id, neighbor_id,
        CAST(list_sum(list_transform(range(1, len(q) + 1),
          i -> (q[i]*255 - (mns[i]*255 + c[i]*rgs[i])) * (q[i]*255 - (mns[i]*255 + c[i]*rgs[i]))))
          AS BIGINT) AS sq_dist
      FROM coded CROSS JOIN qs CROSS JOIN stl),
    ranked AS (SELECT query_id, neighbor_id, sq_dist,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY sq_dist, neighbor_id) AS BIGINT) AS rank
      FROM scored)
    SELECT query_id, rank, neighbor_id, sq_dist FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank"""

  // ---------------------------------------------------- q118 IVF-PQ ANN

  private val IvfProbe = 2

  /** q118 — the composed production ANN shape: IVF coarse routing + PQ
    * asymmetric ranking, the two levers (q31's prune, q58's compression)
    * stacked the way a billion-vector index actually runs. A coarse
    * quantizer (per-label element-wise floor-mean of the corpus — one tiny
    * agg to the driver, back as plan literals, the Lloyd's discipline)
    * routes every corpus vector to its nearest cell map-side; each query
    * probes its [[IvfProbe]] nearest cells; candidates are ranked by the
    * PQ asymmetric distance (per-subspace lookup tables against q58's
    * codebooks).
    *
    * Scale shape: the corpus never shuffles — assignment and PQ coding are
    * pure projections against literal centroids/codebooks, the query frame
    * (probe cells + ADC tables) broadcasts, and the cell-membership join
    * IS the prune: only candidates in probed cells reach the per-query
    * top-k window. All arithmetic is the shared fixed-point integer space,
    * so ranks and distances are oracle-exact. */
  def q118(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = quantized(spark, d)
    val corpus = vecs.where(col("vec_id") >= 10)
    // coarse quantizer: per-label integer centroid of the corpus
    val cents: Seq[(Int, Seq[Long])] = corpus
      .join(Tables.embeddings(spark, d).select(col("vec_id"), col("label")), "vec_id")
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(floor(sum(col("x")) / count(lit(1))).cast(LongType).as("cent"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (l, rows) => (l, rows.sortBy(_._2).map(_._3).toSeq) }
      .sortBy(_._1)
    val cells = assign(corpus, cents)
      .select(col("vec_id"), col("v"), col("cluster").as("cell"))
    val seeds: Seq[(Int, Seq[Long])] = vecs.where(col("vec_id") < PqK)
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Long](1))).toSeq.sortBy(_._1)
    def subOf(v: Seq[Long], s: Int): Seq[Long] = v.slice(s * PqDim, (s + 1) * PqDim)
    def subCol(s: Int): Column = slice(col("v"), s * PqDim + 1, PqDim)
    val coded = cells.select(col("vec_id").as("neighbor_id") +: col("cell") +:
      (0 until PqSub).map { s =>
        val cands = seeds.map { case (cid, sv) =>
          struct(distTo(subCol(s), subOf(sv, s)).as("dist"), lit(cid).as("cid"))
        }
        array_min(array(cands: _*)).getField("cid").as(s"code$s")
      }: _*)
    // query frame: probed cells + per-subspace ADC tables, broadcast
    val centCands = cents.map { case (cid, cv) =>
      struct(distTo(col("v"), cv).as("dist"), lit(cid).as("cid"))
    }
    val probed = slice(sort_array(array(centCands: _*)), 1, IvfProbe)
    val qframe = vecs.where(col("vec_id") < 10).select(
      col("vec_id").as("query_id") +:
        transform(probed, p => p.getField("cid")).as("qcells") +:
        (0 until PqSub).map { s =>
          array(seeds.map { case (_, sv) => distTo(subCol(s), subOf(sv, s)) }: _*)
            .as(s"tab$s")
        }: _*)
    val adc = (0 until PqSub)
      .map(s => element_at(col(s"tab$s"), col(s"code$s") + 1)).reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))
    coded.join(broadcast(qframe), array_contains(col("qcells"), col("cell")))
      .withColumn("adc_dist", adc)
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cell").cast(LongType).as("cell"), col("adc_dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q118Sql: String = {
    val qv = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    def subDist(a: String, b: String, s: Int) = {
      val off = s * PqDim
      s"CAST(list_sum(list_transform(range(1, ${PqDim + 1}), i -> ($a.v[$off + i] - $b.v[$off + i]) * ($a.v[$off + i] - $b.v[$off + i]))) AS BIGINT)"
    }
    val codeCtes = (0 until PqSub).map { s =>
      s"""d$s AS (SELECT c.vec_id, sd.cid, ${subDist("c", "sd", s)} AS dd
         FROM corpus c CROSS JOIN seeds sd),
    code$s AS (SELECT vec_id, cid AS code FROM
      (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn FROM d$s)
      WHERE rn = 1)"""
    }.mkString(",\n    ")
    val qtabCtes = (0 until PqSub).map { s =>
      s"""qt$s AS (SELECT q.vec_id AS query_id, sd.cid, ${subDist("q", "sd", s)} AS dd
         FROM queries q CROSS JOIN seeds sd)"""
    }.mkString(",\n    ")
    val qtJoins = (0 until PqSub).map { s =>
      s"JOIN qt$s ON qt$s.cid = c$s.code" +
        (if (s == 0) "" else s" AND qt$s.query_id = qt0.query_id")
    }.mkString("\n      ")
    val codeJoins = (1 until PqSub).map(s => s"JOIN code$s c$s USING (vec_id)").mkString(" ")
    val fullDist =
      "CAST(list_sum(list_transform(range(1, len(a.v)+1), i -> (a.v[i]-ct.cv[i])*(a.v[i]-ct.cv[i]))) AS BIGINT)"
    s"""
    WITH e AS (SELECT vec_id, $qv AS v FROM embeddings),
    corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
    queries AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
    seeds AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < $PqK),
    celems AS (SELECT l.label, unnest(range(1, len(c.v)+1)) AS pos1, unnest(c.v) AS x
               FROM corpus c JOIN embeddings l ON c.vec_id = l.vec_id),
    cent AS (SELECT label, pos1, CAST(floor(CAST(sum(x) AS DOUBLE)/count(*)) AS BIGINT) AS ce
             FROM celems GROUP BY label, pos1),
    centv AS MATERIALIZED (SELECT label, list(ce ORDER BY pos1) AS cv FROM cent GROUP BY label),
    ad AS (SELECT a.vec_id, ct.label AS cell, $fullDist AS dd
           FROM corpus a CROSS JOIN centv ct),
    acell AS (SELECT vec_id, cell FROM
      (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn FROM ad) WHERE rn = 1),
    qd AS (SELECT a.vec_id, ct.label AS cell, $fullDist AS dd
           FROM queries a CROSS JOIN centv ct),
    qprobe AS (SELECT vec_id AS query_id, cell FROM
      (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) AS rn FROM qd) WHERE rn <= $IvfProbe),
    $codeCtes,
    $qtabCtes,
    adc AS (
      SELECT qt0.query_id, c0.vec_id AS neighbor_id, ac.cell,
        ${(0 until PqSub).map(s => s"qt$s.dd").mkString(" + ")} AS adc_dist
      FROM code0 c0 $codeJoins
      JOIN acell ac ON ac.vec_id = c0.vec_id
      $qtJoins
      JOIN qprobe qp ON qp.query_id = qt0.query_id AND qp.cell = ac.cell
    ),
    ranked AS (SELECT query_id, neighbor_id, cell, adc_dist,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rank
      FROM adc)
    SELECT query_id, rank, neighbor_id, CAST(cell AS BIGINT) AS cell, adc_dist
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank"""
  }

  // ------------------------------------------------ q56/q57 as-of variants

  private def asofBase(spark: SparkSession, d: String) =
    Tables.events(spark, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"))

  /** q56 — tolerance as-of: each purchase matches its latest preceding
    * click ONLY if it happened within the last hour (attribution with a
    * staleness bound). Same single-shuffle plan as q34; the tolerance is a
    * post-window null-out. */
  def q56(spark: SparkSession, d: String): DataFrame = {
    val base = asofBase(spark, d)
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms"))
    graft.operators.AsofJoin.asofWithin(purchases, clicks,
        keyCols = Seq("user_id"), leftTs = "ts_ms", rightTs = "ts_ms",
        payload = Seq("ts_ms"), tolerance = 3600000L)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("asof_ts_ms"),
        (col("ts_ms") - col("asof_ts_ms")).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  val q56Sql: String = """
    WITH base AS (SELECT event_id, user_id, event_type,
        epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events)
    SELECT p.event_id, p.user_id, p.ts_ms,
      (SELECT max(c.ts_ms) FROM base c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts_ms < p.ts_ms AND p.ts_ms - c.ts_ms <= 3600000) AS asof_ts_ms,
      p.ts_ms - (SELECT max(c.ts_ms) FROM base c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts_ms < p.ts_ms AND p.ts_ms - c.ts_ms <= 3600000) AS gap_ms
    FROM base p WHERE p.event_type = 'purchase'
    ORDER BY p.event_id"""

  /** q57 — forward as-of: each click matches the EARLIEST strictly-later
    * purchase of the same user (conversion lookup). */
  def q57(spark: SparkSession, d: String): DataFrame = {
    val base = asofBase(spark, d)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"))
    graft.operators.AsofJoin.asofForward(clicks, purchases,
        keyCols = Seq("user_id"), leftTs = "ts_ms", rightTs = "ts_ms",
        payload = Seq("ts_ms"))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("asof_ts_ms"),
        (col("asof_ts_ms") - col("ts_ms")).as("lead_ms"))
      .orderBy(col("event_id"))
  }

  val q57Sql: String = """
    WITH base AS (SELECT event_id, user_id, event_type,
        epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events)
    SELECT c.event_id, c.user_id, c.ts_ms,
      (SELECT min(p.ts_ms) FROM base p
        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          AND p.ts_ms > c.ts_ms) AS asof_ts_ms,
      (SELECT min(p.ts_ms) FROM base p
        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          AND p.ts_ms > c.ts_ms) - c.ts_ms AS lead_ms
    FROM base c WHERE c.event_type = 'click'
    ORDER BY c.event_id"""

  // ---------------------------------------------- q55 incremental aggregate

  /** q55 — incremental aggregate maintenance
    * ([[graft.operators.IncrementalAgg]]): the lineitem table arrives as
    * three disjoint batches; each batch's partial aggregate folds into the
    * state with combine semantics. The oracle is the DIRECT aggregate over
    * the whole table — the equivalence under test is fold == recompute.
    */
  def q55(spark: SparkSession, d: String): DataFrame = {
    import graft.operators.IncrementalAgg
    val keys = Seq("l_returnflag", "l_linestatus")
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val state = (0 until 3)
      .map(i => IncrementalAgg.partial(
        li.filter(col("l_orderkey") % 3 === i), keys, "l_quantity"))
      .reduce((s, p) => IncrementalAgg.merge(s, p, keys))
    IncrementalAgg.finish(state)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q55Sql: String = """
    SELECT l_returnflag, l_linestatus,
      count(*) AS cnt,
      CAST(sum(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS sum_v,
      min(l_quantity) AS min_v,
      max(l_quantity) AS max_v,
      CAST(sum(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) / count(*) AS avg_v
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------- q53 NFC normalize

  /** Decomposed/precomposed probe suffix: NFC must compose e+U+0301 -> é,
    * i+U+0308 -> ï, a+U+0300 -> à (4 combining marks compose, so length
    * shrinks by exactly 4) and leave the precomposed U+00E9 untouched. Same
    * literal flows into both engines. */
  private val DecomposedSuffix =
    " cafe\u0301 nai\u0308ve a\u0300 la carte d\u00e9ja\u0300"

  /** q53 — Unicode NFC canonicalization via the native codegen expression
    * [[NfcNormalize]] (matches DuckDB's `nfc_normalize`). Documents are
    * ASCII, so each gets a decomposed-accent suffix planted; length shrinks
    * exactly by the number of combining marks composed.
    */
  def q53(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val deco = concat(substring(col("text"), 1, 40), lit(DecomposedSuffix))
    docs.select(col("doc_id"), deco.as("raw"))
      .select(
        col("doc_id"),
        length(col("raw")).cast(LongType).as("len_before"),
        length(NfcNormalize.nfcNormalize(col("raw"))).cast(LongType).as("len_after"),
        NfcNormalize.nfcNormalize(col("raw")).as("normalized"))
      .withColumn("composed", col("len_before") - col("len_after"))
      .orderBy(col("doc_id"))
  }

  val q53Sql: String = s"""
    WITH src AS (
      SELECT doc_id, substring(text, 1, 40) || '$DecomposedSuffix' AS raw FROM documents
    )
    SELECT doc_id,
      CAST(length(raw) AS BIGINT) AS len_before,
      CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_after,
      nfc_normalize(raw) AS normalized,
      CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT) AS composed
    FROM src ORDER BY doc_id"""

  // -------------------------------------------------------- q54 k-means

  private val KmeansK = 4
  private val KmeansIters = 2

  private def quantized(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast(DoubleType) * 1000000d).cast(LongType)).as("v"))

  /** Nearest-centroid assignment and squared-L2 distance — the kernels
    * live in operators.IvfIncremental (the incremental index maintains
    * codes with the SAME arithmetic, so one source of truth; q58's PQ
    * subspace distances reuse distTo too). */
  private def assign(vecs: DataFrame, cents: Seq[(Int, Seq[Long])]): DataFrame =
    graft.operators.IvfIncremental.assign(vecs, cents)
  private def distTo(vec: Column, centroid: Seq[Long]): Column =
    graft.operators.IvfIncremental.distTo(vec, centroid)

  /** q54 — Lloyd's k-means over the embedding corpus: k=4 seeds (lowest
    * vec_ids), two assignment passes with one centroid update between them.
    * Quantized-integer arithmetic end-to-end so the oracle agrees exactly.
    *
    * Scale shape: each round is one posexplode + groupBy(cluster, pos) —
    * reducer load is k*dim, independent of corpus size. Only the k*dim
    * centroid scalars ever reach the driver (the standard Lloyd's broadcast
    * pattern; this is NOT a data collect).
    */
  /** Lloyd's training loop shared by q54 and q105: k seeds (lowest
    * vec_ids), `KmeansIters` assignment passes with a centroid update
    * between each. Returns the FINAL centroids; only k*dim scalars ever
    * reach the driver per round (the standard Lloyd's broadcast pattern;
    * this is NOT a data collect). */
  private def trainCentroids(vecs: DataFrame): Seq[(Int, Seq[Long])] = {
    var cents: Seq[(Int, Seq[Long])] = vecs
      .where(col("vec_id") < KmeansK)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1)))
      .sortBy(_._1)
    for (_ <- 1 until KmeansIters) {
      cents = assign(vecs, cents)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(floor(sum("x") * lit(1.0) / count(lit(1))).cast(LongType).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
        }
        .toSeq.sortBy(_._1)
    }
    cents
  }

  def q54(spark: SparkSession, d: String): DataFrame = {
    val vecs = quantized(spark, d)
    assign(vecs, trainCentroids(vecs))
      .select(col("vec_id"), col("cluster").cast(LongType).as("cluster"),
        col("dist"))
      .orderBy(col("vec_id"))
  }

  /** The k-means oracle chain (two assignment passes, one centroid
    * update), parameterized by the final row filter — q54 takes every
    * vector, q105 restricts to its delta. */
  private def kmeansSql(where: String): String = {
    val qv = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    val l2 = "CAST(list_sum(list_transform(range(1, len(e.v) + 1), i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS BIGINT)"
    s"""
    WITH e AS (SELECT vec_id, $qv AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $KmeansK),
    d1 AS (SELECT e.vec_id, c.cid, $l2 AS dist FROM e CROSS JOIN c0 c),
    a1 AS (SELECT vec_id, cid AS cluster, dist FROM
      (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1)
      WHERE rn = 1),
    el AS (SELECT a1.cluster, unnest(range(1, len(e.v) + 1)) AS pos, unnest(e.v) AS x
      FROM a1 JOIN e USING (vec_id)),
    c1 AS (SELECT cid, list(m ORDER BY pos) AS cv FROM
      (SELECT cluster AS cid, pos, CAST(floor(sum(x) * 1.0 / count(*)) AS BIGINT) AS m
       FROM el GROUP BY cluster, pos) GROUP BY cid),
    d2 AS (SELECT e.vec_id, c.cid, $l2 AS dist FROM e CROSS JOIN c1 c),
    a2 AS (SELECT vec_id, cid AS cluster, dist FROM
      (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2)
      WHERE rn = 1)
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist FROM a2
    WHERE $where ORDER BY vec_id"""
  }

  val q54Sql: String = kmeansSql("TRUE")

  /** q105 — incremental IVF index maintenance, gated the q101 way: the
    * incremental path's result must equal the batch result restricted to
    * the delta. Train once (q54's loop), then run the DELTA (every fifth
    * vec_id — the ingest batch) through operators.IvfIncremental's
    * map-side assignment — the path a daily embedding ingest takes, where
    * the corpus is never rescanned and only k*dim centroid literals ship
    * with the plan. The oracle replays the same training chain in SQL and
    * restricts to the delta. */
  def q105(spark: SparkSession, d: String): DataFrame = {
    val vecs = quantized(spark, d)
    val cents = trainCentroids(vecs)
    graft.operators.IvfIncremental
      .codes(vecs.where(col("vec_id") % 5 === 0), cents)
      .orderBy(col("vec_id"))
  }

  val q105Sql: String = kmeansSql("vec_id % 5 = 0")

  /** q180 — prototypicality PRUNING (coreset selection): cluster the
    * embedding corpus (q54's integer Lloyd's), then per cluster drop every
    * vector at or below the cluster's mean distance-to-centroid — the
    * "prototypical" redundant core — keeping the hard/atypical examples
    * that matter at scale (the SSL-style data-pruning recipe: with
    * abundant data, keep HARD examples). The cut uses the integer
    * floor-mean (sum DIV count), never a float average: sums here exceed
    * 2^53, where double-rounded means diverge between engines.
    *
    * Scale shape: the per-cluster stats are a k-row map-side-combinable
    * aggregate; the cut itself is a broadcast join + map-side filter. No
    * per-cluster window (a partitionBy(cluster) window at k=4 would drag
    * the whole corpus into 4 partitions).
    */
  def q180(spark: SparkSession, d: String): DataFrame = {
    val vecs = quantized(spark, d)
    val assigned = assign(vecs, trainCentroids(vecs))
      .select(col("vec_id"), col("cluster").cast(LongType).as("cluster"), col("dist"))
    val cuts = assigned.groupBy(col("cluster"))
      .agg(expr("sum(dist) DIV count(1)").as("mean_dist"))
    assigned.join(broadcast(cuts), Seq("cluster"))
      .filter(col("dist") > col("mean_dist"))
      .select(col("vec_id"), col("cluster"), col("dist"))
      .orderBy(col("vec_id"))
  }

  lazy val q180Sql: String = {
    val base = q54Sql.replace("ORDER BY vec_id", "")
    s"""
    WITH base AS ($base),
    cuts AS (SELECT cluster, CAST(sum(dist) AS BIGINT) // count(*) AS mean_dist
             FROM base GROUP BY cluster)
    SELECT b.vec_id, b.cluster, b.dist FROM base b JOIN cuts USING (cluster)
    WHERE b.dist > mean_dist ORDER BY vec_id"""
  }

  /** q213 — index statistics from the PERSISTED inverted-index store
    * ([[graft.operators.InvIndex]]): the corpus arrives as three disjoint
    * deltas (q186's doc_id mod 3 convention), each marker-committed as
    * its own batch; the report is read FROM the store. The oracle is
    * q181's batch SQL VERBATIM — the q101/q201/q211 equivalence
    * discipline, fourth family member: incrementally-maintained state
    * must equal the batch recompute bit-for-bit.
    *
    * Scale shape: each ingest is O(delta) (tokenize, two keyed aggs, a
    * bucket-partitioned write); the report is one pruned-to-committed
    * postings scan with a map-side-combinable xor fold — constant
    * reducer state per word at any corpus size. */
  def q213(spark: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("invidx").toString
    // measured WITHOUT Tables.parallel (r14): three ingests each re-scan
    // the corpus for admission + postings, and at sandbox scale the
    // per-scan repartition shuffles cost more than the ~300 KB/batch
    // single-task tokenize they would parallelize (5.0 s with vs 3.5 s
    // without at sf0.1/32c)
    val docs = Tables.documents(spark, d)
    (0 until 3).foreach { i =>
      graft.operators.InvIndex.ingest(spark, root,
        docs.filter(col("doc_id") % 3 === i), i.toLong)
    }
    graft.operators.InvIndex.stats(spark, root).orderBy(col("word"))
  }

  /** Same oracle as q181: store-maintained == batch is the claim. */
  lazy val q213Sql: String = q181Sql

  /** q214 — BM25 ranked retrieval SERVED FROM the store: q183's exact
    * integer scoring, but the postings read prunes to the query terms'
    * hash buckets (partition filter from the driver-side bucket mirror),
    * totals come from meta's per-batch rows instead of a corpus rescan,
    * and doc lengths prune to the candidates' dbuckets. The oracle is
    * q183's batch SQL VERBATIM — the online leg of the retrieval family's
    * batch/incremental/online/streaming matrix. */
  def q214(spark: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("invidxbm").toString
    // no Tables.parallel: see q213's measured note
    val docs = Tables.documents(spark, d)
    (0 until 3).foreach { i =>
      graft.operators.InvIndex.ingest(spark, root,
        docs.filter(col("doc_id") % 3 === i), i.toLong)
    }
    graft.operators.InvIndex.search(spark, root, BmQuery, BmTopK)
  }

  /** Same oracle as q183: search-from-store == batch search. */
  lazy val q214Sql: String = q183Sql

  val defs: Map[String, Q] = Map(
    "q46_pii_redaction" -> (q46 _),
    "q47_repetition_signals" -> (q47 _),
    "q48_tfidf_terms" -> (q48 _),
    "q49_corpus_ngram_dedup" -> (q49 _),
    "q53_nfc_normalize" -> (q53 _),
    "q54_kmeans" -> (q54 _),
    "q105_incremental_ivf" -> (q105 _),
    "q55_incremental_agg" -> (q55 _),
    "q56_asof_tolerance" -> (q56 _),
    "q57_asof_forward" -> (q57 _),
    "q58_pq_ann" -> (q58 _),
    "q111_sq8_ann" -> (q111 _),
    "q118_ivfpq_ann" -> (q118 _),
    "q59_zorder" -> (q59 _),
    "q92_salted_join" -> (q92 _),
    "q93_per_key_cap" -> (q93 _),
    "q95_doc_chunking" -> (q95 _),
    "q174_sequence_pack" -> (q174 _),
    "q175_shuffled_pack" -> (q175 _),
    "q178_pps_sample" -> (q178 _),
    "q180_prototype_prune" -> (q180 _),
    "q181_inverted_index" -> (q181 _),
    "q186_incremental_index" -> (q186 _),
    "q188_pmi_associations" -> (q188 _),
    "q182_graph_importance" -> (q182 _),
    "q183_bm25_search" -> (q183 _),
    "q213_index_from_store" -> (q213 _),
    "q214_bm25_from_store" -> (q214 _),
    "q96_semantic_dedup" -> (q96 _))

  val oracles: Map[String, String] = Map(
    "q46_pii_redaction" -> q46Sql,
    "q47_repetition_signals" -> q47Sql,
    "q48_tfidf_terms" -> q48Sql,
    "q49_corpus_ngram_dedup" -> q49Sql,
    "q53_nfc_normalize" -> q53Sql,
    "q54_kmeans" -> q54Sql,
    "q105_incremental_ivf" -> q105Sql,
    "q55_incremental_agg" -> q55Sql,
    "q56_asof_tolerance" -> q56Sql,
    "q57_asof_forward" -> q57Sql,
    "q58_pq_ann" -> q58Sql,
    "q111_sq8_ann" -> q111Sql,
    "q118_ivfpq_ann" -> q118Sql,
    "q59_zorder" -> q59Sql,
    "q92_salted_join" -> q92Sql,
    "q93_per_key_cap" -> q93Sql,
    "q95_doc_chunking" -> q95Sql,
    "q174_sequence_pack" -> q174Sql,
    "q175_shuffled_pack" -> q175Sql,
    "q178_pps_sample" -> q178Sql,
    "q180_prototype_prune" -> q180Sql,
    "q181_inverted_index" -> q181Sql,
    // q186's oracle IS q181's single-pass SQL: the merged partials must
    // equal the batch recompute (disjoint-delta sums + xor are mergeable)
    "q186_incremental_index" -> q181Sql,
    "q188_pmi_associations" -> q188Sql,
    "q182_graph_importance" -> q182Sql,
    "q183_bm25_search" -> q183Sql,
    // q213/q214's oracles ARE the batch legs' SQL: store-maintained state
    // and store-served search must equal the batch recompute (the
    // q101/q201/q211 verbatim-oracle discipline)
    "q213_index_from_store" -> q213Sql,
    "q214_bm25_from_store" -> q214Sql,
    "q96_semantic_dedup" -> q96Sql)
}

/** Shared SQL fragments for text oracles. */
private[queries] object TextSql {
  val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
}
