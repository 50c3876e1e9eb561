package graft.queries

import graft.Tables
import graft.functions.{Converters, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis pipeline over `documents`: language-ID, quality scoring,
  * token statistics, fingerprinting. All pure map-side projections (the only
  * shuffles are the final small aggregations), integer arithmetic throughout
  * for oracle exactness.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private object Sql {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    // DuckDB string_split('', ' ') yields [''] while Text.tokens yields [],
    // so guard the empty string to keep token parity on empty documents.
    val words =
      s"(CASE WHEN $norm = '' THEN CAST([] AS VARCHAR[]) ELSE string_split($norm, ' ') END)"
    def markerCount(markers: Seq[String]) =
      s"len(list_filter($words, t -> t IN (${markers.map(m => s"'$m'").mkString(",")})))"
  }

  /** Language-ID: stopword-profile voting (argmax over per-language marker
    * hits, ties to the alphabetically-first code). */
  /** Attach the marker scores (materialized first — the argmax references
    * each score several times, and lambda-heavy score exprs must not be
    * re-expanded per reference) and the `pred_lang` argmax to a frame with
    * a `text` column. Map-side; shared by q40 and the q143 dataset card. */
  private def withPredLang(docs: DataFrame): DataFrame = {
    val scores = Text.langScores(col("text"))
    val codes = Text.LangMarkers.map(_._1)
    val scored = docs.select(
      (col("*") +: scores.map { case (code, c) => c.cast(LongType).as(s"s_$code") }): _*)
    val pred = codes.foldRight(lit(codes.last)) { (code, rest) =>
      val isMax = codes.filter(_ != code)
        .map(o => col(s"s_$code") >= col(s"s_$o")).reduce(_ && _)
      when(isMax, lit(code)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }

  def q40(spark: SparkSession, d: String): DataFrame =
    withPredLang(Tables.documents(spark, d)
      .select(col("doc_id"), col("lang").as("actual_lang"), col("text")))
      .select(col("doc_id"), col("pred_lang"), col("actual_lang"),
        (col("pred_lang") === col("actual_lang")).as("correct"))
      .orderBy(col("doc_id"))

  /** The marker-score projection + argmax CASE chain, shared by q40's
    * oracle and the q143 dataset card (which inlines the same map-side
    * prediction). */
  private val LangScoreColsSql: String = Text.LangMarkers
    .map { case (code, ms) => s"CAST(${Sql.markerCount(ms)} AS BIGINT) AS s_$code" }
    .mkString(",\n        ")
  private val PredLangCaseSql: String = {
    val codes = Text.LangMarkers.map(_._1)
    codes.dropRight(1).foldRight(s"'${codes.last}'") { (code, rest) =>
      val cond = codes.filter(_ != code).map(o => s"s_$code >= s_$o").mkString(" AND ")
      s"CASE WHEN $cond THEN '$code' ELSE $rest END"
    }
  }

  val q40Sql: String = s"""
    SELECT doc_id, pred_lang, actual_lang, pred_lang = actual_lang AS correct FROM (
      SELECT doc_id, lang AS actual_lang, $PredLangCaseSql AS pred_lang FROM (
        SELECT doc_id, lang, $LangScoreColsSql FROM documents))
    ORDER BY doc_id"""

  /** Quality scoring: token count, stopword permille, chars-per-token
    * permille, punctuation count; `passed` is the corpus filter verdict.
    * Integer arithmetic (floor of scaled ratios) for engine exactness. */
  def q41(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val t = docs.select(col("doc_id"),
      Text.tokenCount(col("text")).cast(LongType).as("n_tokens"),
      Text.stopwordCount(col("text")).cast(LongType).as("n_stop"),
      Text.punctCount(col("text")).cast(LongType).as("n_punct"),
      length(Text.normalize(col("text"))).cast(LongType).as("n_norm_chars"))
    t.select(col("doc_id"), col("n_tokens"), col("n_punct"),
        floor(col("n_stop") * 1000d / col("n_tokens")).cast(LongType).as("stop_permille"),
        floor(col("n_norm_chars") * 1000d / col("n_tokens")).cast(LongType).as("chars_per_token_permille"))
      .withColumn("passed",
        col("n_tokens") >= 10 && col("n_tokens") <= 1000 &&
          col("stop_permille") <= 600)
      .orderBy(col("doc_id"))
  }

  val q41Sql: String = s"""
    SELECT doc_id, n_tokens, n_punct,
      CAST(floor(n_stop * 1000.0 / n_tokens) AS BIGINT) AS stop_permille,
      CAST(floor(n_norm_chars * 1000.0 / n_tokens) AS BIGINT) AS chars_per_token_permille,
      (n_tokens >= 10 AND n_tokens <= 1000
        AND CAST(floor(n_stop * 1000.0 / n_tokens) AS BIGINT) <= 600) AS passed
    FROM (
      SELECT doc_id,
        CAST(len(${Sql.words}) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(${Sql.words}, t -> t IN (${Text.StopWords.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS n_stop,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
        CAST(length(${Sql.norm}) AS BIGINT) AS n_norm_chars
      FROM documents)
    ORDER BY doc_id"""

  /** Token statistics per source: corpus composition report (docs, tokens,
    * subword proxy count, char bounds). */
  def q42(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("source"), col("n_chars"),
        Text.tokenCount(col("text")).cast(LongType).as("n_tokens"),
        Text.subwordCount(col("text")).cast(LongType).as("n_subwords"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_subwords")).as("sum_subwords"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"))
  }

  val q42Sql: String = s"""
    SELECT source, count(*) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(sum(n_subwords) AS BIGINT) AS sum_subwords,
      min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM (
      SELECT source, n_chars,
        CAST(len(${Sql.words}) AS BIGINT) AS n_tokens,
        CAST(len(regexp_extract_all(lower(text), '[a-z]{1,4}'))
           + len(regexp_extract_all(text, '[0-9]{1,3}'))
           + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords
      FROM documents)
    GROUP BY source ORDER BY source"""

  /** Document fingerprints: md5 of normalized text + rolling polynomial
    * hash (Rabin-Karp family, mod 1e9+7). */
  def q43(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"),
        Text.md5Fingerprint(col("text")).as("md5_fp"),
        Text.rollingFingerprint(col("text")).as("rolling_fp"))
      .orderBy(col("doc_id"))
  }

  val q43Sql: String = s"""
    SELECT doc_id, md5(${Sql.norm}) AS md5_fp,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(${Sql.norm}, ''), ch -> CAST(ord(ch) AS BIGINT))),
        (acc, code) -> (acc * 131 + code) % 1000000007) AS rolling_fp
    FROM documents ORDER BY doc_id"""

  /** Deterministic stratified sampling + source mixing: each language
    * stratum keeps a hash-based percentage (reproducible across runs and
    * engines — the sampling decision is a pure function of the row, the
    * pattern for corpus mixing weights). */
  def q44(spark: SparkSession, d: String): DataFrame = {
    val rates = Map("en" -> 60, "de" -> 40, "fr" -> 40, "es" -> 20, "zh" -> 20)
    val rate = coalesce(
      element_at(map(rates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("lang")), lit(10))
    val bucket = pmod(Converters.str2inthash(concat(lit("sample:"), col("doc_id"))), lit(100))
    Tables.documents(spark, d)
      .withColumn("sampled", bucket < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("sampled").cast("long")).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val q44Sql: String = """
    SELECT lang, count(*) AS n_docs,
      CAST(sum(CASE WHEN ((CAST('0x' || substring(md5('sample:' || doc_id), 2, 8) AS BIGINT) - 2147483648) % 100 + 100) % 100 <
        (CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 40 WHEN 'fr' THEN 40
                   WHEN 'es' THEN 20 WHEN 'zh' THEN 20 ELSE 10 END)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents GROUP BY lang ORDER BY lang"""

  /** Context-length packing: per source (ordered by doc id) documents pack
    * greedily into ~2048-token bins via a running token sum — the
    * sequence-packing step of a pretraining pipeline, as one window pass. */
  def q45(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast(LongType).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / 2048d).cast(LongType))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy(col("source"), col("pack_id"))
  }

  val q45Sql: String = s"""
    WITH toks AS (SELECT doc_id, source, CAST(len(${Sql.words}) AS BIGINT) AS n_tokens FROM documents),
    packed AS (SELECT *,
        CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 2048.0) AS BIGINT) AS pack_id
      FROM toks)
    SELECT source, pack_id, count(*) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY source, pack_id
    ORDER BY source, pack_id"""

  /** Deterministic noisy URL per doc: mixed-case scheme/host, optional
    * `WWW.` prefix, default and explicit ports, trailing slashes, tracking
    * params, fragments — every normalization branch exercised. */
  private def noisyUrl(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scheme = when(id % 2 === 0, lit("HTTPS")).otherwise(lit("http"))
    val www = when(id % 3 === 0, lit("WWW.")).otherwise(lit(""))
    val host = concat(www, lit("Example"), (id % 50).cast("string"), lit(".COM"))
    val port = when(id % 5 === 0,
        when(id % 2 === 0, lit(":443")).otherwise(lit(":80")))
      .when(id % 5 === 1, lit(":8080"))
      .otherwise(lit(""))
    val path = concat(lit("/Docs/Page"), (id % 97).cast("string"),
      when(id % 7 === 0, lit("/")).otherwise(lit("")))
    val query = concat(lit("?a="), (id % 11).cast("string"),
      lit("&utm_source=news&b="), (id % 4).cast("string"),
      when(id % 6 === 0, lit("&gclid=xyz")).otherwise(lit("")))
    val frag = when(id % 3 === 1, lit("#Sec2")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** q100 — URL canonicalization under oracle: synth noisy URLs ->
    * [[Text.canonicalizeUrl]] (real `parse_url` + regex normalization) ->
    * canonical key + per-host page counts. The oracle rebuilds the
    * canonical form from the generating formulas WITHOUT parsing, so only
    * a correct parse-and-normalize chain can match. */
  def q100(spark: SparkSession, d: String): DataFrame = {
    val urls = Tables.documents(spark, d)
      .select(col("doc_id"), noisyUrl(col("doc_id")).as("url"))
    urls.select(col("doc_id"),
        graft.functions.Text.canonicalizeUrl(col("url")).as("canonical_url"))
      .withColumn("host", regexp_extract(col("canonical_url"), "^[a-z]+://([^:/?]+)", 1))
      .orderBy(col("doc_id"))
  }

  val q100Sql: String = """
    SELECT doc_id,
      CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END
        || '://example' || (doc_id % 50) || '.com'
        || CASE WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END
        || '/Docs/Page' || (doc_id % 97)
        || '?a=' || (doc_id % 11) || '&b=' || (doc_id % 4) AS canonical_url,
      'example' || (doc_id % 50) || '.com' AS host
    FROM documents ORDER BY doc_id"""

  /** Training-mix construction (data mixing): fill each source's token
    * budget greedily in deterministic doc_id order — the step that turns
    * per-domain mixture weights into an actual document selection. Budget
    * here = half the source's own token mass (scale-free, so the query is
    * meaningful at every SF); a doc is selected while the tokens BEFORE it
    * are under budget, so the doc that crosses the boundary is taken —
    * standard greedy fill. Scale shape: one shuffle keyed by source for
    * the windowed cumulative sum, then a map-side flag + small aggregate;
    * at 100 TB a pathologically dominant source makes the per-source sort
    * the bottleneck — range-bucket the source internally first (the
    * ZOrder/BucketedStore layout tools), the greedy semantics compose over
    * contiguous doc_id ranges. Integer arithmetic throughout. */
  def q102(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, d).select(
      col("doc_id"), col("source"),
      size(Text.tokens(col("text"))).cast(LongType).as("n_tok"))
    val before = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val df = toks
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(before), lit(0L)))
      .withColumn("total_tok",
        sum(col("n_tok")).over(Window.partitionBy(col("source"))))
      .withColumn("selected", col("cum_before") < expr("total_tok DIV 2"))
    df.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("selected").cast(LongType)).as("n_selected"),
        sum(col("n_tok")).as("tokens_total"),
        sum(when(col("selected"), col("n_tok")).otherwise(lit(0L)))
          .as("tokens_selected"))
      .orderBy(col("source"))
  }

  val q102Sql: String = s"""
    WITH toks AS (
      SELECT doc_id, source, CAST(len(${Sql.words}) AS BIGINT) AS n_tok
      FROM documents),
    ext AS (
      SELECT source, n_tok,
        COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        sum(n_tok) OVER (PARTITION BY source) // 2 AS budget
      FROM toks)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN cum_before < budget THEN 1 ELSE 0 END) AS BIGINT)
        AS n_selected,
      CAST(sum(n_tok) AS BIGINT) AS tokens_total,
      CAST(sum(CASE WHEN cum_before < budget THEN n_tok ELSE 0 END) AS BIGINT)
        AS tokens_selected
    FROM ext GROUP BY source ORDER BY source"""

  /** Reproducible global shuffle: the shard-and-order step of training-data
    * preparation. Every doc gets a deterministic pseudorandom key (hash of
    * a seed prefix + doc_id — a pure function of the row, like q44's
    * sampling), a shard by key mod N_SHARDS, and a position from the
    * within-shard key order — rerunning the pipeline reproduces byte-
    * identical shards. Scale shape: one shuffle keyed by shard (each shard
    * sorts independently — no global sort), exactly how numbered training
    * shards are written at 100 TB. */
  def q103(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nShards = 16
    val key = Converters.str2inthash(concat(lit("shuffle:"), col("doc_id")))
    Tables.documents(spark, d)
      .select(col("doc_id"), pmod(key, lit(nShards)).cast(LongType).as("shard"),
        key.as("k"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id")))
        .cast(LongType))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val q103Sql: String = {
    val key = "((CAST('0x' || substring(md5('shuffle:' || doc_id), 2, 8) AS BIGINT) - 2147483648))"
    s"""
    WITH keyed AS (
      SELECT doc_id, (($key % 16) + 16) % 16 AS shard, $key AS k
      FROM documents)
    SELECT doc_id, shard,
      CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM keyed ORDER BY shard, pos"""
  }

  /** Unigram cross-entropy quality score — the CCNet-style LM filter:
    * build the corpus unigram distribution, then score each doc by its
    * mean per-token surprisal under it (gibberish and rare-word soup sit
    * high, boilerplate sits low; filters threshold both tails). Gated in
    * an integer-exact quantization: floor(log2 n) computed as binary bit
    * length minus one (`length(bin(n)) - 1` — EXACT integer arithmetic in
    * both engines, no libm rounding in the compare), so surprisal is an
    * integer per token, per-doc sums are order-independent, and the
    * permille mean uses the same floor-of-scaled-ratio form as q41. A
    * production filter would swap double log-probs into the same plan.
    *
    * Scale shape: per-doc token counts first (map-side-combined groupBy,
    * so the vocab join's left side is distinct (doc, token) rows, not
    * token occurrences), one shuffle on token to build and join the
    * unigram table, one shuffle on doc_id for the final sum; the 1-row
    * corpus total joins broadcast. The vocab table is heavy-tailed but
    * ~vocabulary-sized, orders of magnitude under the corpus. */
  def q104(spark: SparkSession, d: String): DataFrame = {
    // Cached: the corpus tokenize+count feeds THREE consumers (join left,
    // vocab, total) — uncached, Catalyst plans three full corpus scans
    // (the subtrees differ, so ReuseExchange can't kick in). One pass over
    // the corpus, then vocab-/scalar-sized work off the materialized table;
    // Bench's per-query clearCache drops it between measurements.
    val perDoc = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("k"))
      .cache()
    val vocab = perDoc.groupBy(col("tok")).agg(sum(col("k")).as("cnt"))
    val total = perDoc.agg(sum(col("k")).as("total"))
    perDoc.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("surp",
        (length(bin(col("total"))) - length(bin(col("cnt")))).cast(LongType))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("k") * col("surp")).as("surprisal_sum"))
      .withColumn("mean_surprisal_permille",
        floor(col("surprisal_sum") * 1000d / col("n_tokens")).cast(LongType))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_sum"),
        col("mean_surprisal_permille"))
      .orderBy(col("doc_id"))
  }

  val q104Sql: String = s"""
    WITH perdoc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS k
      FROM (SELECT doc_id, unnest(${Sql.words}) AS tok FROM documents)
      GROUP BY doc_id, tok),
    vocab AS (SELECT tok, CAST(sum(k) AS BIGINT) AS cnt FROM perdoc GROUP BY tok),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
    scored AS (
      SELECT doc_id, k,
        CAST(length(bin(total)) - length(bin(cnt)) AS BIGINT) AS surp
      FROM perdoc JOIN vocab USING (tok) CROSS JOIN tot)
    SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
      CAST(sum(k * surp) AS BIGINT) AS surprisal_sum,
      CAST(floor(sum(k * surp) * 1000.0 / sum(k)) AS BIGINT)
        AS mean_surprisal_permille
    FROM scored GROUP BY doc_id ORDER BY doc_id"""

  /** Bigram-LM surprisal (q104's CCNet-style filter, one order deeper):
    * each position i >= 2 scores -log2 p(w_i | w_{i-1}) quantized as
    * bits(count(w_{i-1})) - bits(count(w_{i-1}, w_i)); the first token
    * scores under the unigram model exactly as q104. bits(n) =
    * length(bin(n)) = floor(log2 n)+1, the cross-engine-exact quantizer
    * (libm-free — see q104), so the whole gate is integer arithmetic.
    *
    * Scale shape: per-doc bigram occurrences aggregate map-side before
    * any join (distinct (doc, prev, cur) rows, not positions); the bigram
    * and unigram tables are vocabulary-sized; the corpus total joins
    * broadcast; one shuffle each on pair, prev, and doc_id. */
  def q113(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .cache() // feeds occurrences, the unigram table, and first-token rows
    val bgStruct = StructType(Seq(
      StructField("prev", StringType), StructField("cur", StringType)))
    val occ = toks.select(col("doc_id"), explode(
        when(size(col("t")) > 1, transform(sequence(lit(2), size(col("t"))),
          i => struct(element_at(col("t"), i - 1).as("prev"),
            element_at(col("t"), i).as("cur"))))
        .otherwise(array().cast(ArrayType(bgStruct)))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .groupBy(col("doc_id"), col("prev"), col("cur")).agg(count(lit(1)).as("k"))
      .cache() // feeds the bigram table and the scored join
    val unigrams = toks.select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("ucnt"))
    val bigrams = occ.groupBy(col("prev"), col("cur")).agg(sum(col("k")).as("bcnt"))
    val total = unigrams.agg(sum(col("ucnt")).as("total"))
    val bits = (c: org.apache.spark.sql.Column) => length(bin(c))
    val scoredBi = occ.join(bigrams, Seq("prev", "cur"))
      .join(unigrams.withColumnRenamed("tok", "prev"), Seq("prev"))
      .select(col("doc_id"),
        (col("k") * (bits(col("ucnt")) - bits(col("bcnt"))).cast(LongType)).as("s"),
        col("k"))
    val scoredFirst = toks.select(col("doc_id"), element_at(col("t"), 1).as("tok"))
      .join(unigrams, Seq("tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (bits(col("total")) - bits(col("ucnt"))).cast(LongType).as("s"),
        lit(1L).as("k"))
    scoredBi.unionByName(scoredFirst)
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_tokens"), sum(col("s")).as("surprisal_sum"))
      .withColumn("mean_surprisal_permille",
        floor(col("surprisal_sum") * 1000d / col("n_tokens")).cast(LongType))
      .orderBy(col("doc_id"))
  }

  val q113Sql: String = s"""
    WITH toks AS (SELECT doc_id, ${Sql.words} AS t FROM documents
                  WHERE len(${Sql.words}) > 0),
    occ AS (SELECT doc_id, bg.prev AS prev, bg.cur AS cur,
        CAST(count(*) AS BIGINT) AS k
      FROM (SELECT doc_id, unnest(list_transform(range(2, len(t) + 1),
              i -> struct_pack(prev := t[i-1], cur := t[i]))) AS bg FROM toks)
      GROUP BY doc_id, bg.prev, bg.cur),
    uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS ucnt
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
    big AS (SELECT prev, cur, CAST(sum(k) AS BIGINT) AS bcnt
      FROM occ GROUP BY prev, cur),
    tot AS (SELECT CAST(sum(ucnt) AS BIGINT) AS total FROM uni),
    bs AS (SELECT doc_id, k * (length(bin(ucnt)) - length(bin(bcnt))) AS s, k
      FROM occ JOIN big USING (prev, cur) JOIN uni ON uni.tok = occ.prev),
    fs AS (SELECT doc_id, length(bin(total)) - length(bin(ucnt)) AS s,
        CAST(1 AS BIGINT) AS k
      FROM (SELECT doc_id, t[1] AS tok FROM toks)
      JOIN uni USING (tok) CROSS JOIN tot),
    u AS (SELECT * FROM bs UNION ALL SELECT * FROM fs)
    SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
      CAST(sum(s) AS BIGINT) AS surprisal_sum,
      CAST(floor(sum(s) * 1000.0 / sum(k)) AS BIGINT) AS mean_surprisal_permille
    FROM u GROUP BY doc_id ORDER BY doc_id"""

  /** BPE tokenizer training: learn the first 10 merges from the corpus
    * (frequency-weighted, deterministic tie-break) — see
    * operators.BpeTrainer for the loop and its scale shape. The oracle
    * replays the identical merge chain in SQL: 10 chained MATERIALIZED
    * CTE pairs (argmax -> literal replace), matching the trainer's
    * encoding and replace semantics exactly. */
  def q108(spark: SparkSession, d: String): DataFrame =
    graft.operators.BpeTrainer.mergeTable(
      spark, Tables.parallel(Tables.documents(spark, d)), BpeSteps)

  private val BpeSteps = 10

  /** Shared oracle fragments for the BPE family (q108 training, q112
    * application): the vocab build, the encoded working set, and the
    * chained argmax->replace step CTEs — one copy so both oracles replay
    * the identical merge chain. */
  private val bpeCtes: String = {
    val head = s"""
    vocab AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(${Sql.words}) AS word FROM documents)
      WHERE word NOT LIKE '%;%'
        AND NOT regexp_matches(word, '[^\\x00-\\x7f]')
      GROUP BY word),
    w0 AS MATERIALIZED (SELECT ' ' || array_to_string(
        list_transform(split(word, ''), c -> c || ';'), ' ') AS w, cnt
      FROM vocab)"""
    val stepCtes = (1 to BpeSteps).map { i =>
      s"""
    p$i AS MATERIALIZED (
      SELECT pr.l AS l, pr.r AS r, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_transform(range(1, len(syms)),
                      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS pr, cnt
        FROM (SELECT string_split(trim(replace(w, ';', '')), ' ') AS syms, cnt
              FROM w${i - 1}))
      GROUP BY pr.l, pr.r ORDER BY cnt DESC, l, r LIMIT 1),
    w$i AS MATERIALIZED (SELECT replace(w,
        ' ' || (SELECT l FROM p$i) || '; ' || (SELECT r FROM p$i) || ';',
        ' ' || (SELECT l FROM p$i) || (SELECT r FROM p$i) || ';') AS w, cnt
      FROM w${i - 1})"""
    }.mkString(",")
    s"$head,$stepCtes"
  }

  val q108Sql: String = {
    val union = (1 to BpeSteps).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS step, l AS left_sym, r AS right_sym,
          l || r AS merged, cnt FROM p$i"""
    }.mkString(" UNION ALL ")
    s"WITH $bpeCtes\nSELECT * FROM ($union) ORDER BY step"
  }

  /** BPE APPLICATION — the consumption half of q108: tokenize every
    * document with the learned merge chain and report word vs subword
    * counts. Map-side projection (the merge chain is `BpeSteps` literal
    * replaces in the plan) + one per-doc count aggregation; OOV words
    * (delimiter-carrying or non-ASCII, the exclusions learning applies)
    * count as one opaque token. */
  def q112(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(spark, d))
    val merges = graft.operators.BpeTrainer.train(docs, BpeSteps, batchTop = 8)
    graft.operators.BpeTrainer.subwordCounts(docs, merges)
      .orderBy(col("doc_id"))
  }

  val q112Sql: String = {
    val encCtes = (1 to BpeSteps).map { i =>
      s"""
    enc$i AS (SELECT doc_id, replace(w,
        ' ' || (SELECT l FROM p$i) || '; ' || (SELECT r FROM p$i) || ';',
        ' ' || (SELECT l FROM p$i) || (SELECT r FROM p$i) || ';') AS w
      FROM enc${i - 1})"""
    }.mkString(",")
    s"""WITH $bpeCtes,
    enc0 AS (SELECT doc_id,
        CASE WHEN word LIKE '%;%' OR regexp_matches(word, '[^\\x00-\\x7f]')
             THEN NULL
             ELSE ' ' || array_to_string(
                    list_transform(split(word, ''), c -> c || ';'), ' ') END AS w
      FROM (SELECT doc_id, unnest(${Sql.words}) AS word FROM documents)),$encCtes
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      CAST(sum(CASE WHEN w IS NULL THEN 1
                    ELSE length(w) - length(replace(w, ';', '')) END) AS BIGINT)
        AS n_subwords
    FROM enc$BpeSteps GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Quality-classifier training (batch perceptron + pocket rule): learn
    * to predict the n_chars >= 300 quality cutoff from integer token
    * features — see operators.LinearClassifier for the loop and its scale
    * shape. The raw feature scale makes the margin tiny, so the batch
    * iterate oscillates (realistic hard-data dynamics) and the pocket rule
    * picks the best epoch; the oracle replays the full weight trajectory
    * through chained MATERIALIZED CTEs, integer-exact. */
  def q109(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val norm = Text.normalize(col("text"))
    val feats = Tables.documents(spark, d).select(
      when(col("n_chars") >= 300, 1L).otherwise(-1L).as("y"),
      lit(1L).as("b"),
      size(Text.tokens(col("text"))).cast(LongType).as("nt"),
      length(translate(norm, " ", "")).cast(LongType).as("sl"))
    val run = graft.operators.LinearClassifier.trainBatchPerceptron(
      feats, "y", Seq("b", "nt", "sl"), PerceptronEpochs)
    val pocket = graft.operators.LinearClassifier.pocketEpoch(run)
    run.map(e => (e.epoch, e.w(0), e.w(1), e.w(2), e.nMiss, e.epoch == pocket))
      .toDF("epoch", "w_bias", "w_tokens", "w_sumlen", "n_miss", "is_pocket")
      .orderBy(col("epoch"))
  }

  private val PerceptronEpochs = 8

  /** Shared oracle fragments for the perceptron family (q109 training,
    * q110 inference): the feature CTE, the chained epoch CTEs, and the
    * pocket-epoch selection — one copy so the two oracles replay the
    * identical trajectory. */
  private val perceptronCtes: String = {
    val head = s"""
    f AS MATERIALIZED (SELECT
      CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y,
      CAST(len(${Sql.words}) AS BIGINT) AS nt,
      CAST(length(replace(${Sql.norm}, ' ', '')) AS BIGINT) AS sl
      FROM documents),
    e0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS wb,
      CAST(0 AS BIGINT) AS wt, CAST(0 AS BIGINT) AS ws)"""
    val epochCtes = (1 to PerceptronEpochs).map { i =>
      val p = s"e${i - 1}"
      s"""
    e$i AS MATERIALIZED (
      SELECT
        (SELECT wb FROM $p) + CAST(coalesce(sum(CASE WHEN mis THEN y END), 0) AS BIGINT) AS wb,
        (SELECT wt FROM $p) + CAST(coalesce(sum(CASE WHEN mis THEN y*nt END), 0) AS BIGINT) AS wt,
        (SELECT ws FROM $p) + CAST(coalesce(sum(CASE WHEN mis THEN y*sl END), 0) AS BIGINT) AS ws,
        CAST(count(CASE WHEN mis THEN 1 END) AS BIGINT) AS n_miss
      FROM (SELECT *, y*((SELECT wb FROM $p) + (SELECT wt FROM $p)*nt
                         + (SELECT ws FROM $p)*sl) <= 0 AS mis FROM f))"""
    }.mkString(",")
    val union = (1 to PerceptronEpochs).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS epoch, wb AS w_bias, wt AS w_tokens,
          ws AS w_sumlen, n_miss FROM e$i"""
    }.mkString(" UNION ALL ")
    s"""$head,$epochCtes,
    u AS MATERIALIZED (SELECT * FROM ($union)),
    p AS (SELECT min(epoch) AS pe FROM u WHERE n_miss = (SELECT min(n_miss) FROM u))"""
  }

  val q109Sql: String = s"""WITH $perceptronCtes
    SELECT epoch, w_bias, w_tokens, w_sumlen, n_miss,
      epoch = (SELECT pe FROM p) AS is_pocket
    FROM u ORDER BY epoch"""

  /** Classifier INFERENCE — the deployment half of q109: ship the pocket
    * weights (the iterate entering the pocket epoch) as plan literals and
    * score every document map-side. At 100 TB this is a pure projection
    * over the corpus scan — zero shuffle, which is why fastText-style
    * quality filters are the one model type routinely run over full
    * crawls. Integer dot product, so the oracle reproduces every score
    * bit-for-bit by replaying the training CTEs and applying the same
    * epoch-(pe-1) weights. */
  def q110(spark: SparkSession, d: String): DataFrame = {
    val norm = Text.normalize(col("text"))
    val feats = Tables.documents(spark, d).select(
      col("doc_id"),
      when(col("n_chars") >= 300, 1L).otherwise(-1L).as("y"),
      lit(1L).as("b"),
      size(Text.tokens(col("text"))).cast(LongType).as("nt"),
      length(translate(norm, " ", "")).cast(LongType).as("sl"))
    val run = graft.operators.LinearClassifier.trainBatchPerceptron(
      feats, "y", Seq("b", "nt", "sl"), PerceptronEpochs)
    val w = graft.operators.LinearClassifier.pocketWeights(run)
    val s = graft.operators.LinearClassifier.score(Seq("b", "nt", "sl"), w)
    feats.select(col("doc_id"), s.as("score"), (s > 0).as("keep"),
        (col("y") === 1L).as("actual"))
      .orderBy(col("doc_id"))
  }

  val q110Sql: String = s"""WITH $perceptronCtes,
    uw AS (SELECT CAST(0 AS BIGINT) AS epoch, CAST(0 AS BIGINT) AS w_bias,
             CAST(0 AS BIGINT) AS w_tokens, CAST(0 AS BIGINT) AS w_sumlen
           UNION ALL SELECT epoch, w_bias, w_tokens, w_sumlen FROM u),
    pw AS (SELECT w_bias, w_tokens, w_sumlen FROM uw
           WHERE epoch = (SELECT pe FROM p) - 1),
    fd AS (SELECT doc_id,
      CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y,
      CAST(len(${Sql.words}) AS BIGINT) AS nt,
      CAST(length(replace(${Sql.norm}, ' ', '')) AS BIGINT) AS sl
      FROM documents)
    SELECT doc_id,
      CAST((SELECT w_bias FROM pw) + (SELECT w_tokens FROM pw)*nt
           + (SELECT w_sumlen FROM pw)*sl AS BIGINT) AS score,
      ((SELECT w_bias FROM pw) + (SELECT w_tokens FROM pw)*nt
       + (SELECT w_sumlen FROM pw)*sl) > 0 AS keep,
      y = 1 AS actual
    FROM fd ORDER BY doc_id"""

  /** q189 — classifier CALIBRATION report (reliability diagram): q110's
    * integer scores cut into ten equal-width score-RANGE bins, each bin
    * reporting population and empirical positive rate. Range bins (not
    * rank deciles) keep the computation map-side — the min/max are two
    * broadcast scalars and the bin id is integer arithmetic per row,
    * where an ntile would drag the corpus through one globally-ordered
    * partition. A monotone pos_pm column is what "scores are calibrated"
    * looks like; the report is the gate a filter-threshold change is
    * judged against (q139 ranks, this calibrates). */
  def q189(spark: SparkSession, d: String): DataFrame = {
    // the scorer IS q110 (the q139 reuse pattern) — one training chain,
    // no drift between the inference and calibration views of it
    val scored = q110(spark, d).select(col("score"), col("actual"))
    val bounds = scored.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    scored.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("(score - lo) DIV ((hi - lo) DIV 10 + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("actual").cast(LongType)).cast(LongType).as("n_pos"))
      .withColumn("pos_pm", expr("(n_pos * 1000) DIV n"))
      .orderBy(col("bin"))
  }

  val q189Sql: String = s"""WITH $perceptronCtes,
    uw AS (SELECT CAST(0 AS BIGINT) AS epoch, CAST(0 AS BIGINT) AS w_bias,
             CAST(0 AS BIGINT) AS w_tokens, CAST(0 AS BIGINT) AS w_sumlen
           UNION ALL SELECT epoch, w_bias, w_tokens, w_sumlen FROM u),
    pw AS (SELECT w_bias, w_tokens, w_sumlen FROM uw
           WHERE epoch = (SELECT pe FROM p) - 1),
    fd AS (SELECT doc_id,
      CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y,
      CAST(len(${Sql.words}) AS BIGINT) AS nt,
      CAST(length(replace(${Sql.norm}, ' ', '')) AS BIGINT) AS sl
      FROM documents),
    scored AS (SELECT
      CAST((SELECT w_bias FROM pw) + (SELECT w_tokens FROM pw)*nt
           + (SELECT w_sumlen FROM pw)*sl AS BIGINT) AS score,
      y = 1 AS actual FROM fd),
    bounds AS (SELECT min(score) AS lo, max(score) AS hi FROM scored)
    SELECT (score - lo) // ((hi - lo) // 10 + 1) AS bin,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      (CAST(sum(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        // count(*) AS pos_pm
    FROM scored, bounds GROUP BY 1 ORDER BY bin"""

  /** q139 — classifier RANKING quality: AUC of the q110 scorer via the
    * Mann-Whitney U statistic, integer-exact. Threshold metrics (q137's
    * P/R/F1) evaluate one operating point; a corpus-filter score is used
    * as a RANKER (keep the top-X% by quality), so the eval harness needs
    * the threshold-free ranking metric too. The perceptron margin is an
    * integer (integer weights x integer features), so tie groups are
    * exact: with competition rank r and group size c, a tied doc's
    * doubled average rank is 2r + c - 1, and
    * AUC = (sum_pos 2*avgrank - n_pos(n_pos+1)) / (2 n_pos n_neg),
    * emitted in permille by integer division — no floats anywhere, both
    * engines agree bit-for-bit.
    *
    * Scale shape: one corpus pass for integer margins (map-side), a
    * margin-keyed aggregate (distinct-margin-sized — far below the
    * corpus), a cumulative window over DISTINCT margins only, and a
    * scalar reduce. At 10^9+ distinct margins the cumulative rank would
    * move to a range-partitioned prefix sum; u2*1000 needs
    * n_pos*n_neg < 2^52, i.e. re-scale past ~10^8 docs per class. */
  def q139(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = q110(spark, d)
      .select(col("score"), col("actual").cast(LongType).as("pos"))
    val grp = s.groupBy(col("score"))
      .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grp
      .withColumn("before", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("avg2", lit(2L) * (col("before") + 1L) + col("c") - 1L)
      .agg(sum(col("p") * col("avg2")).as("pr2"),
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"))
      .withColumn("u2", col("pr2") - col("n_pos") * (col("n_pos") + 1L))
      .withColumn("auc_pm",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("(u2 * 1000) DIV (2 * n_pos * n_neg)")).otherwise(500L))
      .select(col("n_pos"), col("n_neg"), col("u2"), col("auc_pm"))
      .orderBy(col("n_pos"))
  }

  val q139Sql: String = s"""
    WITH s AS (${q110Sql.replace("ORDER BY doc_id", "")}),
    g AS (SELECT score, CAST(count(*) AS BIGINT) AS c,
            CAST(sum(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS p
          FROM s GROUP BY 1),
    r AS (SELECT *, coalesce(sum(c) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
          FROM g),
    a AS (SELECT CAST(sum(p * (2 * (bef + 1) + c - 1)) AS BIGINT) AS pr2,
            CAST(sum(p) AS BIGINT) AS n_pos,
            CAST(sum(c - p) AS BIGINT) AS n_neg
          FROM r)
    SELECT n_pos, n_neg,
      pr2 - n_pos * (n_pos + 1) AS u2,
      CASE WHEN n_pos > 0 AND n_neg > 0
           THEN ((pr2 - n_pos * (n_pos + 1)) * 1000) // (2 * n_pos * n_neg)
           ELSE 500 END AS auc_pm
    FROM a ORDER BY n_pos"""

  /** q141 — tokenizer fertility by language: subword-per-word ratio
    * (permille) per lang under the learned BPE table — the standard
    * tokenizer-equity metric (a vocabulary trained on a skewed mix
    * over-fragments under-represented languages; fertility is how that's
    * measured and gated). Second consumer of the BpeEncode expression:
    * the whole merge table rides one plan node here exactly as in q112.
    *
    * Scale shape: q112's map-side tokenize (constant-size plan) + one
    * (doc_id) join to the lang column + a lang-sized aggregate. */
  def q141(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(spark, d))
    val merges = graft.operators.BpeTrainer.train(docs, BpeSteps, batchTop = 8)
    graft.operators.BpeTrainer.subwordCounts(docs, merges)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .withColumn("fertility_pm",
        expr("CASE WHEN n_words > 0 THEN (n_subwords * 1000) DIV n_words ELSE 0 END"))
      .orderBy(col("lang"))
  }

  val q141Sql: String = s"""
    WITH sc AS (${q112Sql.replace("ORDER BY doc_id", "")})
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(sc.n_words) AS BIGINT) AS n_words,
      CAST(sum(sc.n_subwords) AS BIGINT) AS n_subwords,
      (CASE WHEN CAST(sum(sc.n_words) AS BIGINT) > 0
        THEN (CAST(sum(sc.n_subwords) AS BIGINT) * 1000) // CAST(sum(sc.n_words) AS BIGINT)
        ELSE 0 END) AS fertility_pm
    FROM sc JOIN documents d USING (doc_id)
    GROUP BY d.lang ORDER BY d.lang"""

  /** q142 — vocabulary coverage / OOV rate: freeze the top-N training-split
    * tokens as the model vocabulary (count desc, token asc — fully
    * deterministic), then measure the out-of-vocabulary token rate per
    * source on the held-out test split. The tokenizer-coverage gate every
    * corpus refresh runs: a source whose OOV rate jumps is drifting away
    * from the vocabulary the deployed model was trained with.
    *
    * Scale shape: token counts are one token-keyed map-side-combinable
    * aggregate; the vocabulary is N rows, BROADCAST into the test scan
    * (left join + null test — no corpus shuffle on the probe side beyond
    * the final source-sized aggregate). The top-N window runs over the
    * DISTINCT-token table, not the corpus. */
  val VocabN = 24

  def q142(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized: the token arrays feed BOTH the train-count leg and the
    // test-probe leg — unmaterialized, each leg re-runs the tokenize chain
    val base = Tables.documents(spark, d).select(
      col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"),
      graft.functions.Hashing.splitBucket(col("doc_id")).as("b"))
      .localCheckpoint(true)
    val trainToks = base.filter(col("b") < 80)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("tok").asc)
    val vocab = trainToks.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= VocabN).select(col("tok"))
    base.filter(col("b") >= 90)
      .select(col("source"), explode(col("toks")).as("tok"))
      .join(broadcast(vocab.withColumn("in_vocab", lit(1L))), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_pm", expr("(n_oov * 1000) DIV n_tokens"))
      .orderBy(col("source"))
  }

  val q142Sql: String = s"""
    WITH base AS (
      SELECT doc_id, source, ${Sql.words} AS toks,
        ${graft.functions.Hashing.splitBucketSql("doc_id")} AS b
      FROM documents),
    tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(toks) AS tok FROM base WHERE b < 80) GROUP BY 1),
    vocab AS (SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rk FROM tc)
      WHERE rk <= $VocabN),
    te AS (SELECT source, unnest(toks) AS tok FROM base WHERE b >= 90)
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      (CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        // CAST(count(*) AS BIGINT) AS oov_pm
    FROM te LEFT JOIN vocab v USING (tok)
    GROUP BY source ORDER BY source"""

  /** q143 — per-source DATASET CARD: the one-table datasheet a corpus
    * release ships (docs, token mass, exact-duplicate exposure, quality
    * pass rate, modal predicted language, mean length) — every column a
    * rollup of an operator already on the board, composed into the
    * user-facing summary artifact.
    *
    * Scale shape: everything except the duplicate flag is a map-side
    * projection into one source-keyed aggregate. The duplicate flag pays
    * the q20 fingerprint shuffle (group fingerprints, keep those with
    * >= 2 docs corpus-wide, join back on fingerprint) — the honest dedup
    * cost, shared shape with q20. The modal language is a source-keyed
    * count + a window over source x lang rows (dim-sized). */
  def q143(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.parallel(Tables.documents(spark, d))
    val base = withPredLang(docs.select(col("doc_id"), col("source"),
        col("n_chars"), col("text")))
      .select(col("doc_id"), col("source"), col("n_chars"), col("pred_lang"),
        Text.md5Fingerprint(col("text")).as("fp"),
        Text.tokenCount(col("text")).cast(LongType).as("nt"),
        Text.stopwordCount(col("text")).cast(LongType).as("ns"))
      .withColumn("stop_pm",
        when(col("nt") > 0L, floor(col("ns") * 1000d / col("nt")).cast(LongType))
          .otherwise(lit(0L)))
      .withColumn("passed",
        col("nt") >= 10L && col("nt") <= 1000L && col("stop_pm") <= 600L)
      // materialized: three consumers below (dup aggregate, join-back,
      // modal-language aggregate) — unmaterialized, Catalyst re-inlines
      // the lambda-heavy scoring chain into each subtree (the q148
      // lesson; interpreted HOFs get no CSE)
      .localCheckpoint(true)
    val dupFp = base.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2L).select(col("fp"), lit(1L).as("is_dup"))
    val flagged = base.join(dupFp, Seq("fp"), "left")
    val agg = flagged.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("nt")).as("n_tokens"),
      sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_docs"),
      sum(col("passed").cast(LongType)).as("n_passed"),
      sum(col("n_chars")).as("sum_chars"))
    val modal = base.groupBy(col("source"), col("pred_lang"))
      .agg(count(lit(1)).as("lc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("lc").desc, col("pred_lang").asc)))
      .filter(col("rk") === 1)
      .select(col("source"), col("pred_lang").as("top_lang"))
    agg.join(modal, Seq("source"))
      .withColumn("pass_pm", expr("(n_passed * 1000) DIV n_docs"))
      .withColumn("avg_chars", expr("sum_chars DIV n_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_dup_docs"),
        col("pass_pm"), col("top_lang"), col("avg_chars"))
      .orderBy(col("source"))
  }

  val q143Sql: String = s"""
    WITH scored AS (
      SELECT doc_id, source, n_chars, $PredLangCaseSql AS pred_lang,
        md5(${Sql.norm}) AS fp, n_tokens, n_stop
      FROM (
        SELECT doc_id, source, n_chars, text,
          CAST(len(${Sql.words}) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(${Sql.words}, t -> t IN (${Text.StopWords.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS n_stop,
          $LangScoreColsSql
        FROM documents)),
    base AS (
      SELECT *,
        (CASE WHEN n_tokens > 0
              THEN CAST(floor(n_stop * 1000.0 / n_tokens) AS BIGINT) ELSE 0 END) AS stop_pm
      FROM scored),
    flagged AS (
      SELECT base.*, (n_tokens >= 10 AND n_tokens <= 1000 AND stop_pm <= 600) AS passed,
        CASE WHEN fp IN (SELECT fp FROM base GROUP BY fp HAVING count(*) >= 2)
             THEN 1 ELSE 0 END AS is_dup
      FROM base),
    agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
        CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM flagged GROUP BY 1),
    modal AS (
      SELECT source, pred_lang AS top_lang FROM (
        SELECT source, pred_lang, row_number() OVER (
            PARTITION BY source ORDER BY count(*) DESC, pred_lang ASC) AS rk
        FROM base GROUP BY source, pred_lang)
      WHERE rk = 1)
    SELECT a.source, n_docs, n_tokens, n_dup_docs,
      (n_passed * 1000) // n_docs AS pass_pm,
      top_lang,
      sum_chars // n_docs AS avg_chars
    FROM agg a JOIN modal USING (source)
    ORDER BY a.source"""

  /** q147 — HTML main-text extraction under oracle: every document is
    * deterministically wrapped into a full HTML page (head/title, script
    * and style blocks that must be skipped wholesale, inline b/i tags
    * around every 7th token, named + numeric entities, one anchor), then
    * the native `HtmlExtract` expression recovers the visible text and
    * link statistics in ONE codegen'd scan — the crawl pipeline's first
    * operator, the step before any dedup/quality/language stage can run.
    * The oracle recomputes the EXPECTED extraction from the raw text
    * column and the wrapping formula alone (the multimodal-query
    * discipline: the engine side only matches if strip + entity decode +
    * whitespace fold are exactly right — a sloppy scanner cannot pass
    * the hash compare).
    *
    * Scale shape: pure map-side projection (one expression, no UDF
    * boundary, no regex engine); what aggregates is nothing — per-doc
    * rows go straight out. */
  def q147(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(spark, d))
    val id = col("doc_id").cast(StringType)
    val wrapped = transform(Text.tokens(col("text")), (t, i) =>
      when(pmod(i, lit(7)) === 3, concat(lit("<b>"), t, lit("</b>")))
        .when(pmod(i, lit(7)) === 5, concat(lit("<i>"), t, lit("</i>")))
        .otherwise(t))
    val html = concat(
      lit("<html><head><title>T"), id,
      lit("</title><script>var x = "), id,
      lit(";</script><style>p { color: red; }</style></head><body><h1>Doc&nbsp;"), id,
      lit("</h1><p>"), array_join(wrapped, " "),
      lit("</p><p>5 &lt; 7 &amp;&amp; 9 &gt; 2, grade &#65;</p><a href=\"https://example.com/doc/"), id,
      lit("\">ref "), id, lit("</a></body></html>"))
    docs.select(col("doc_id"),
        graft.functions.expressions.HtmlExtract.htmlExtract(html).as("x"),
        length(html).cast(LongType).as("html_chars"))
      .select(col("doc_id"), col("html_chars"),
        length(col("x.text")).cast(LongType).as("text_chars"),
        col("x.n_links").cast(LongType).as("n_links"),
        col("x.link_chars").cast(LongType).as("link_chars"),
        md5(col("x.text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  val q147Sql: String = s"""
    WITH w AS (
      SELECT doc_id, CAST(doc_id AS VARCHAR) AS ids, ${Sql.norm} AS nrm,
        ${Sql.words} AS toks
      FROM documents),
    b AS (
      SELECT doc_id, ids, nrm,
        coalesce(array_to_string(list_transform(range(0, len(toks)), i ->
          CASE WHEN i % 7 = 3 THEN '<b>' || toks[i+1] || '</b>'
               WHEN i % 7 = 5 THEN '<i>' || toks[i+1] || '</i>'
               ELSE toks[i+1] END), ' '), '') AS body
      FROM w),
    e AS (
      SELECT doc_id, ids,
        length('<html><head><title>T' || ids || '</title><script>var x = ' || ids
          || ';</script><style>p { color: red; }</style></head><body><h1>Doc&nbsp;' || ids
          || '</h1><p>' || body
          || '</p><p>5 &lt; 7 &amp;&amp; 9 &gt; 2, grade &#65;</p><a href="https://example.com/doc/' || ids
          || '">ref ' || ids || '</a></body></html>') AS html_chars,
        trim(regexp_replace(
          'T' || ids || ' Doc ' || ids || ' ' || nrm ||
          ' 5 < 7 && 9 > 2, grade A ref ' || ids, '\\s+', ' ', 'g')) AS xt
      FROM b)
    SELECT doc_id, CAST(html_chars AS BIGINT) AS html_chars,
      CAST(length(xt) AS BIGINT) AS text_chars,
      CAST(1 AS BIGINT) AS n_links,
      CAST(3 + length(ids) AS BIGINT) AS link_chars,
      md5(xt) AS text_md5
    FROM e ORDER BY doc_id"""

  /** q148 — pipeline FUNNEL report: the per-stage retention audit every
    * production corpus build publishes (how many documents survived
    * language filtering, then quality, then dedup, then the length cap —
    * and where the mass went). Stages compose operators already on the
    * board: q40's language prediction, q41's quality rule, q20's
    * fingerprint dedup (survivor = min doc_id among docs still alive at
    * that stage), and a length cap. Integer drop rates; stage names make
    * the output a report, not a debug dump.
    *
    * Scale shape: stage flags are ONE map-side projection over the corpus
    * (each stage's predicate ANDs onto the previous), MATERIALIZED before
    * fan-out — the scored frame feeds both the dedup aggregate and the
    * join-back, and without the cut Catalyst inlines the full
    * lambda-heavy scoring chain (tokens/langScores, no CSE in
    * interpreted HOFs) into the canon-side filter: measured 2.2 s -> the
    * checkpoint pays one scoring pass. The dedup stage pays the one
    * fingerprint-keyed aggregate (on stage-2 survivors only), and the
    * funnel itself is a single global aggregate emitting counters that
    * explode into five report rows — corpus-size independent output. */
  def q148(spark: SparkSession, d: String): DataFrame = {
    val base = withPredLang(Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), col("n_chars"), col("text")))
      .select(col("doc_id"), col("n_chars"), col("pred_lang"),
        Text.md5Fingerprint(col("text")).as("fp"),
        Text.tokenCount(col("text")).cast(LongType).as("nt"),
        Text.stopwordCount(col("text")).cast(LongType).as("ns"))
      .withColumn("f1", col("pred_lang") === "en")
      .withColumn("f2", col("f1") && col("nt") >= 20L && col("nt") <= 1000L &&
        when(col("nt") > 0L, floor(col("ns") * 1000d / col("nt")).cast(LongType))
          .otherwise(0L) <= 600L)
      .select(col("doc_id"), col("n_chars"), col("fp"), col("f1"), col("f2"))
      .localCheckpoint(true)
    // dedup runs over stage-2 survivors: canonical = min doc_id per fp
    val canon = base.filter(col("f2")).groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canon_id"))
    val flagged = base.join(canon, Seq("fp"), "left")
      .withColumn("f3", col("f2") && col("doc_id") === col("canon_id"))
      .withColumn("f4", col("f3") && col("n_chars") <= 400L)
    val counters = flagged.agg(
      count(lit(1)).as("n0"),
      sum(col("f1").cast(LongType)).as("n1"),
      sum(col("f2").cast(LongType)).as("n2"),
      sum(col("f3").cast(LongType)).as("n3"),
      sum(col("f4").cast(LongType)).as("n4"))
    counters.select(explode(array(
        struct(lit(1L).as("stage"), lit("language_en").as("stage_name"),
          col("n0").as("n_in"), col("n1").as("n_out")),
        struct(lit(2L).as("stage"), lit("quality").as("stage_name"),
          col("n1").as("n_in"), col("n2").as("n_out")),
        struct(lit(3L).as("stage"), lit("exact_dedup").as("stage_name"),
          col("n2").as("n_in"), col("n3").as("n_out")),
        struct(lit(4L).as("stage"), lit("length_cap").as("stage_name"),
          col("n3").as("n_in"), col("n4").as("n_out")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.stage_name"),
        col("s.n_in"), col("s.n_out"))
      .withColumn("drop_pm",
        when(col("n_in") > 0L, expr("((n_in - n_out) * 1000) DIV n_in"))
          .otherwise(0L))
      .orderBy(col("stage"))
  }

  val q148Sql: String = s"""
    WITH scored AS (
      SELECT doc_id, n_chars, $PredLangCaseSql AS pred_lang,
        md5(${Sql.norm}) AS fp, n_tokens, n_stop
      FROM (
        SELECT doc_id, n_chars, text,
          CAST(len(${Sql.words}) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(${Sql.words}, t -> t IN (${Text.StopWords.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS n_stop,
          $LangScoreColsSql
        FROM documents)),
    base AS (
      SELECT *,
        (pred_lang = 'en') AS f1,
        (pred_lang = 'en' AND n_tokens >= 20 AND n_tokens <= 1000 AND
         (CASE WHEN n_tokens > 0
               THEN CAST(floor(n_stop * 1000.0 / n_tokens) AS BIGINT) ELSE 0 END) <= 600) AS f2
      FROM scored),
    canon AS (
      SELECT fp, min(doc_id) AS canon_id FROM base WHERE f2 GROUP BY fp),
    flagged AS (
      SELECT base.*, (f2 AND doc_id = canon_id) AS f3,
        (f2 AND doc_id = canon_id AND n_chars <= 400) AS f4
      FROM base LEFT JOIN canon USING (fp)),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM flagged),
    stages AS (
      SELECT 1 AS stage, 'language_en' AS stage_name, n0 AS n_in, n1 AS n_out FROM c
      UNION ALL SELECT 2, 'quality', n1, n2 FROM c
      UNION ALL SELECT 3, 'exact_dedup', n2, n3 FROM c
      UNION ALL SELECT 4, 'length_cap', n3, n4 FROM c)
    SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_in, n_out,
      CASE WHEN n_in > 0 THEN ((n_in - n_out) * 1000) // n_in ELSE 0 END AS drop_pm
    FROM stages ORDER BY stage"""

  /** q154 — CURRICULUM ordering: assign every document a training phase
    * by difficulty proxy (length bands — short documents first, the
    * easy-to-hard schedule), with a DETERMINISTIC shuffle inside each
    * phase (hash32(doc_id || ':cur'), doc_id tiebreak — the q103
    * restartable-shuffle discipline: any task subset recomputes the same
    * order). The gate pins the ORDER itself, not just membership: the
    * per-phase checksum sums rank * doc_id over the phase's shuffled
    * sequence, so a single transposition changes the hash.
    *
    * Scale shape: phase assignment is map-side; the within-phase ranking
    * is a phase-partitioned window — the one honest sort curriculum
    * construction pays once per epoch (at 100 TB it runs as a
    * range-partitioned sort per phase, exactly what the window lowers
    * to); output is phase-count-sized. */
  def q154(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("n_chars"))
      .withColumn("phase",
        when(col("n_chars") < 250L, 1L).when(col("n_chars") < 300L, 2L)
          .when(col("n_chars") < 350L, 3L).otherwise(4L))
      .withColumn("h", graft.functions.Hashing.hash32(
        concat(col("doc_id").cast(StringType), lit(":cur"))))
    val w = Window.partitionBy(col("phase"))
      .orderBy(col("h").asc, col("doc_id").asc)
    docs.withColumn("rank", row_number().over(w).cast(LongType))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("rank") * col("doc_id")).as("ord_checksum"))
      .orderBy(col("phase"))
  }

  val q154Sql: String = s"""
    WITH p AS (
      SELECT doc_id, n_chars,
        (CASE WHEN n_chars < 250 THEN 1 WHEN n_chars < 300 THEN 2
              WHEN n_chars < 350 THEN 3 ELSE 4 END) AS phase,
        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':cur'), 1, 8) AS BIGINT) AS h
      FROM documents),
    r AS (
      SELECT phase, doc_id, n_chars,
        CAST(row_number() OVER (PARTITION BY phase ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rank
      FROM p)
    SELECT CAST(phase AS BIGINT) AS phase, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(min(n_chars) AS BIGINT) AS min_chars,
      CAST(max(n_chars) AS BIGINT) AS max_chars,
      CAST(sum(rank * doc_id) AS BIGINT) AS ord_checksum
    FROM r GROUP BY phase ORDER BY phase"""

  /** q155 — per-source SPLIT DRIFT gate: compares the mean token count of
    * each source's train split against its test split (the q125/q138
    * split assignments), emitting the test/train ratio in permille
    * (1000 = no drift) by integer cross-multiplication — the check a
    * training run makes before trusting held-out metrics: a source whose
    * splits differ materially (upstream re-crawl mid-ingest, a
    * doc_id-correlated content change) invalidates its evals. Sources
    * missing either split surface with ratio 0 rather than disappearing.
    *
    * Scale shape: one map-side token-count projection, one
    * (source, split) aggregate, a source-on-source self-join of the
    * dim-sized result. */
  def q155(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(spark, d).select(col("source"),
      Text.tokenCount(col("text")).cast(LongType).as("nt"),
      graft.functions.Hashing.splitBucket(col("doc_id")).as("b"))
    val agg = base
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") >= 90, "test"))
      .filter(col("split").isNotNull)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"), sum(col("nt")).as("tok"))
    val tr = agg.filter(col("split") === "train")
      .select(col("source"), col("n").as("n_train"), col("tok").as("tok_train"))
    val te = agg.filter(col("split") === "test")
      .select(col("source"), col("n").as("n_test"), col("tok").as("tok_test"))
    tr.join(te, Seq("source"), "full")
      .na.fill(0L, Seq("n_train", "tok_train", "n_test", "tok_test"))
      .withColumn("ratio_pm",
        when(col("n_train") > 0L && col("n_test") > 0L && col("tok_train") > 0L,
          expr("(tok_test * n_train * 1000) DIV (tok_train * n_test)"))
          .otherwise(0L))
      .select(col("source"), col("n_train"), col("n_test"),
        col("tok_train"), col("tok_test"), col("ratio_pm"))
      .orderBy(col("source"))
  }

  val q155Sql: String = s"""
    WITH base AS (
      SELECT source, CAST(len(${Sql.words}) AS BIGINT) AS nt,
        ${graft.functions.Hashing.splitBucketSql("doc_id")} AS b
      FROM documents),
    agg AS (
      SELECT source, (CASE WHEN b < 80 THEN 'train' ELSE 'test' END) AS split,
        CAST(count(*) AS BIGINT) AS n, CAST(sum(nt) AS BIGINT) AS tok
      FROM base WHERE b < 80 OR b >= 90
      GROUP BY 1, 2),
    tr AS (SELECT source, n AS n_train, tok AS tok_train FROM agg WHERE split = 'train'),
    te AS (SELECT source, n AS n_test, tok AS tok_test FROM agg WHERE split = 'test')
    SELECT coalesce(tr.source, te.source) AS source,
      coalesce(n_train, 0) AS n_train, coalesce(n_test, 0) AS n_test,
      coalesce(tok_train, 0) AS tok_train, coalesce(tok_test, 0) AS tok_test,
      (CASE WHEN coalesce(n_train, 0) > 0 AND coalesce(n_test, 0) > 0
                 AND coalesce(tok_train, 0) > 0
            THEN (tok_test * n_train * 1000) // (tok_train * n_test)
            ELSE 0 END) AS ratio_pm
    FROM tr FULL JOIN te ON tr.source = te.source
    ORDER BY source"""

  /** q157 — split MANIFEST: the reproducibility artifact a corpus release
    * pins next to its data — per split (the q125 train/valid/test hash
    * assignment): document count, token mass, and two order-independent
    * membership checksums (bit_xor of doc_ids and sum of doc_id^2), so a
    * downstream consumer can verify it reconstructed EXACTLY the same
    * split membership from the published rule — any added, dropped, or
    * substituted doc_id moves at least one checksum.
    *
    * Scale shape: one map-side projection, one 3-row aggregate. */
  def q157(spark: SparkSession, d: String): DataFrame = {
    val b = graft.functions.Hashing.splitBucket(col("doc_id"))
    Tables.documents(spark, d).select(col("doc_id"),
        Text.tokenCount(col("text")).cast(LongType).as("nt"),
        when(b < 80, "train").when(b < 90, "valid").otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(col("doc_id") * col("doc_id")).as("sum_sq_ids"))
      .orderBy(col("split"))
  }

  val q157Sql: String = s"""
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(nt) AS BIGINT) AS n_tokens,
      CAST(bit_xor(doc_id) AS BIGINT) AS xor_ids,
      CAST(sum(doc_id * doc_id) AS BIGINT) AS sum_sq_ids
    FROM (
      SELECT doc_id, CAST(len(${Sql.words}) AS BIGINT) AS nt,
        (CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END) AS split
      FROM (SELECT *, ${graft.functions.Hashing.splitBucketSql("doc_id")} AS b
            FROM documents))
    GROUP BY split ORDER BY split"""

  /** Exact floor(log2(den/num)) for a POSITIVE rational den/num >= 1 —
    * the cross-engine-exact logarithm the LM family's quantizer needs one
    * step beyond integers (q104/q113's bits(n) only quantizes integer
    * counts; interpolated probabilities are rationals). k = bits(den) -
    * bits(num) brackets the ratio into [2^(k-1), 2^(k+1)); one integer
    * comparison (den < num * 2^k) resolves which side — no libm anywhere.
    * Requires num <= den (p <= 1) and num*2^k < 2*den < 2^63. */
  private def rlog2(num: Column, den: Column): Column = {
    val k = (length(bin(den)) - length(bin(num))).cast(LongType)
    (k - when(den < num * pow(lit(2.0), k).cast(LongType), 1L).otherwise(0L))
      .cast(LongType)
  }

  private def rlog2Sql(num: String, den: String): String = {
    val k = s"(length(bin($den)) - length(bin($num)))"
    s"($k - CASE WHEN $den < $num * CAST(2 ** $k AS BIGINT) THEN 1 ELSE 0 END)"
  }

  /** Interpolated trigram LM surprisal (the smoothing axis the LM family
    * was missing; q104 unigram -> q113 bigram -> this): position i >= 3
    * scores -floor(log2 p) with Jelinek-Mercer lambda=1/2 interpolation
    * p = (c3/c12 + c23/c2)/2, expressed as the exact rational
    * (c3*c2 + c23*c12) / (2*c12*c2) and quantized by [[rlog2]] — the
    * whole gate stays integer arithmetic even though the interpolated
    * probability is no longer a single count ratio. Position 2 scores the
    * interpolated bigram+unigram model, position 1 the unigram model.
    *
    * Scale shape (q113's discipline, one order deeper): per-doc trigram
    * occurrences aggregate map-side before any join; the trigram/bigram/
    * unigram tables are vocabulary-sized; the corpus total broadcasts;
    * one shuffle per n-gram order plus the final doc_id fold. Count
    * products stay under 2^63 while corpus token counts stay under ~2^31
    * — past that, compute the three plan-literal-free products in
    * 128-bit (DuckDB HUGEINT / Spark decimal) or shard the LM. */
  def q122(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .cache() // feeds occ3/occ2/occ1 and all three count tables
    val triStruct = StructType(Seq(
      StructField("w1", StringType), StructField("w2", StringType),
      StructField("w3", StringType)))
    val bgStruct = StructType(Seq(
      StructField("prev", StringType), StructField("cur", StringType)))
    val occ3 = toks.select(col("doc_id"), explode(
        when(size(col("t")) > 2, transform(sequence(lit(3), size(col("t"))),
          i => struct(element_at(col("t"), i - 2).as("w1"),
            element_at(col("t"), i - 1).as("w2"),
            element_at(col("t"), i).as("w3"))))
        .otherwise(array().cast(ArrayType(triStruct)))).as("tg"))
      .select(col("doc_id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
      .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("k"))
      .cache() // feeds the trigram table and the scored join
    val bgOcc = toks.select(col("doc_id"), explode(
        when(size(col("t")) > 1, transform(sequence(lit(2), size(col("t"))),
          i => struct(element_at(col("t"), i - 1).as("prev"),
            element_at(col("t"), i).as("cur"))))
        .otherwise(array().cast(ArrayType(bgStruct)))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val tri = occ3.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(sum(col("k")).as("c3"))
    // pinned: the bigram table feeds three legs (two s3 self-joins + s2)
    // and the unigram table four (s3, s2 twice, s1) plus the total — each
    // reference would otherwise re-run its explode + aggregation over the
    // cached corpus (guide §1.2: one pass per n-gram order, as the scale
    // note promises). Both are vocabulary-sized, the scaladoc's bound.
    val bi = bgOcc.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("bcnt"))
      .localCheckpoint(true)
    val uni = toks.select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("ucnt"))
      .localCheckpoint(true)
    val total = uni.agg(sum(col("ucnt")).as("total"))

    val s3 = occ3
      .join(tri, Seq("w1", "w2", "w3"))
      .join(bi.select(col("prev").as("w1"), col("cur").as("w2"),
        col("bcnt").as("c12")), Seq("w1", "w2"))
      .join(bi.select(col("prev").as("w2"), col("cur").as("w3"),
        col("bcnt").as("c23")), Seq("w2", "w3"))
      .join(uni.select(col("tok").as("w2"), col("ucnt").as("c2")), Seq("w2"))
      .select(col("doc_id"),
        (col("k") * rlog2(col("c3") * col("c2") + col("c23") * col("c12"),
          lit(2L) * col("c12") * col("c2"))).as("s"),
        col("k"))
    val s2 = toks.where(size(col("t")) > 1)
      .select(col("doc_id"), element_at(col("t"), 1).as("prev"),
        element_at(col("t"), 2).as("cur"))
      .join(bi, Seq("prev", "cur"))
      .join(uni.select(col("tok").as("prev"), col("ucnt").as("uprev")), Seq("prev"))
      .join(uni.select(col("tok").as("cur"), col("ucnt").as("ucur")), Seq("cur"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        rlog2(col("bcnt") * col("total") + col("ucur") * col("uprev"),
          lit(2L) * col("uprev") * col("total")).as("s"),
        lit(1L).as("k"))
    val s1 = toks.select(col("doc_id"), element_at(col("t"), 1).as("tok"))
      .join(uni, Seq("tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), rlog2(col("ucnt"), col("total")).as("s"),
        lit(1L).as("k"))
    s3.unionByName(s2).unionByName(s1)
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_tokens"), sum(col("s")).as("surprisal_sum"))
      .withColumn("mean_surprisal_permille",
        floor(col("surprisal_sum") * 1000d / col("n_tokens")).cast(LongType))
      .orderBy(col("doc_id"))
  }

  val q122Sql: String = {
    val s3 = rlog2Sql("(c3*c2 + c23*c12)", "(2*c12*c2)")
    val s2 = rlog2Sql("(bcnt*total + ucur*uprev)", "(2*uprev*total)")
    val s1 = rlog2Sql("ucnt", "total")
    s"""
    WITH toks AS (SELECT doc_id, ${Sql.words} AS t FROM documents
                  WHERE len(${Sql.words}) > 0),
    occ3 AS (SELECT doc_id, tg.w1 AS w1, tg.w2 AS w2, tg.w3 AS w3,
        CAST(count(*) AS BIGINT) AS k
      FROM (SELECT doc_id, unnest(list_transform(range(3, len(t) + 1),
              i -> struct_pack(w1 := t[i-2], w2 := t[i-1], w3 := t[i]))) AS tg
            FROM toks)
      GROUP BY doc_id, tg.w1, tg.w2, tg.w3),
    tri AS (SELECT w1, w2, w3, CAST(sum(k) AS BIGINT) AS c3
      FROM occ3 GROUP BY w1, w2, w3),
    bi AS (SELECT bg.prev AS prev, bg.cur AS cur, CAST(count(*) AS BIGINT) AS bcnt
      FROM (SELECT unnest(list_transform(range(2, len(t) + 1),
              i -> struct_pack(prev := t[i-1], cur := t[i]))) AS bg FROM toks)
      GROUP BY bg.prev, bg.cur),
    uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS ucnt
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
    tot AS (SELECT CAST(sum(ucnt) AS BIGINT) AS total FROM uni),
    s3 AS (SELECT doc_id, k * $s3 AS s, k
      FROM occ3
      JOIN tri USING (w1, w2, w3)
      JOIN (SELECT prev AS w1, cur AS w2, bcnt AS c12 FROM bi) b12 USING (w1, w2)
      JOIN (SELECT prev AS w2, cur AS w3, bcnt AS c23 FROM bi) b23 USING (w2, w3)
      JOIN (SELECT tok AS w2, ucnt AS c2 FROM uni) u2 USING (w2)),
    s2 AS (SELECT doc_id, $s2 AS s, CAST(1 AS BIGINT) AS k
      FROM (SELECT doc_id, t[1] AS prev, t[2] AS cur FROM toks WHERE len(t) > 1)
      JOIN bi USING (prev, cur)
      JOIN (SELECT tok AS prev, ucnt AS uprev FROM uni) up USING (prev)
      JOIN (SELECT tok AS cur, ucnt AS ucur FROM uni) uc USING (cur)
      CROSS JOIN tot),
    s1 AS (SELECT doc_id, $s1 AS s, CAST(1 AS BIGINT) AS k
      FROM (SELECT doc_id, t[1] AS tok FROM toks)
      JOIN uni USING (tok) CROSS JOIN tot),
    u AS (SELECT * FROM s3 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s1)
    SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
      CAST(sum(s) AS BIGINT) AS surprisal_sum,
      CAST(floor(sum(s) * 1000.0 / sum(k)) AS BIGINT) AS mean_surprisal_permille
    FROM u GROUP BY doc_id ORDER BY doc_id"""
  }

  /** q124 — the CCNet filtering stage END TO END: LM-score every document
    * (q104's unigram surprisal, reused as the input stage), LEARN the
    * keep-threshold as the corpus p90 from a mergeable histogram (q123's
    * register arithmetic on the score distribution — NOT a global sort),
    * and filter. This is operator composition as a first-class query:
    * score -> sketch-threshold -> filter is the actual production
    * pipeline stage, and every step stays integer-exact so the oracle
    * replays the whole chain (q104's CTEs nested as the input).
    *
    * Scale shape: the score pass is q104's (one corpus pass + vocab-sized
    * joins); the histogram fold is <= 65 register rows; the threshold is
    * ONE broadcast scalar; the final filter is map-side. Nothing sorts
    * the corpus. */
  def q124(spark: SparkSession, d: String): DataFrame = {
    val Bins = 64L
    val P90 = 9000L
    val scores = q104(spark, d)
      .select(col("doc_id"), col("mean_surprisal_permille").as("s"))
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("source"))
    val bounds = scores.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
      .withColumn("width", expr(s"(mx - mn) DIV $Bins + 1"))
    val binned = scores.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("(s - mn) DIV width"))
    val regs = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"), max(col("mn")).as("mn"),
        max(col("width")).as("width"))
    import org.apache.spark.sql.expressions.Window
    val cum = regs
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("k", expr(s"($P90 * n + 9999) DIV 10000"))
    val thr = cum.filter(col("cum") >= col("k"))
      .withColumn("rn", row_number().over(Window.orderBy(col("bin"))))
      .filter(col("rn") === 1)
      .select(expr("mn + bin * width + ((k - (cum - cnt) - 1) * width) DIV cnt")
        .as("threshold"))
    scores.join(docs, Seq("doc_id"))
      .crossJoin(broadcast(thr))
      .withColumn("keep", col("s") <= col("threshold"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast(LongType)).as("n_kept"),
        max(col("threshold")).as("threshold_permille"),
        coalesce(min(when(!col("keep"), col("s"))), lit(-1L))
          .as("min_dropped_score"))
      .orderBy(col("source"))
  }

  val q124Sql: String = s"""
    WITH base AS ($q104Sql),
    scores AS (SELECT doc_id, mean_surprisal_permille AS s FROM base),
    bounds AS (SELECT min(s) AS mn, max(s) AS mx,
        (max(s) - min(s)) // 64 + 1 AS width FROM scores),
    regs AS (SELECT (s - mn) // width AS bin, CAST(count(*) AS BIGINT) AS cnt,
        max(mn) AS mn, max(width) AS width
      FROM scores CROSS JOIN bounds GROUP BY 1),
    cum AS (SELECT *, CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
        CAST(sum(cnt) OVER () AS BIGINT) AS n FROM regs),
    thr AS (SELECT CAST(mn + bin * width + ((k - (cum - cnt) - 1) * width) // cnt AS BIGINT) AS threshold
      FROM (SELECT *, (9000 * n + 9999) // 10000 AS k FROM cum)
      WHERE cum >= k ORDER BY bin LIMIT 1),
    flagged AS (SELECT d.source, s.s, t.threshold, s.s <= t.threshold AS keep
      FROM scores s JOIN documents d USING (doc_id) CROSS JOIN thr t)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      max(threshold) AS threshold_permille,
      CAST(coalesce(min(CASE WHEN NOT keep THEN s END), -1) AS BIGINT)
        AS min_dropped_score
    FROM flagged GROUP BY source ORDER BY source"""

  /** Per-domain document cap — the C4/RefinedWeb "at most K docs per
    * source, best-quality-first" policy. Rank within source by
    * (passed DESC, n_tokens DESC, doc_id) and keep the top K.
    *
    * Scale shape: the `rank <= K` filter over row_number lowers to
    * WindowGroupLimit (Spark 3.5+), so each map task retains at most K
    * rows per source BEFORE the exchange — the shuffle carries
    * O(K * n_sources) rows, not the corpus. `passed` uses the q41 gate
    * with the division replaced by an integer cross-multiply
    * (n_stop*1000 <= 600*n_tokens) so empty documents can't divide by
    * zero on either engine. */
  val CapPerSource = 15

  def q114(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = Tables.documents(spark, d).select(
      col("doc_id"), col("source"),
      size(Text.tokens(col("text"))).cast(LongType).as("n_tokens"),
      Text.stopwordCount(col("text")).cast(LongType).as("n_stop"))
    val g = f.withColumn("passed",
      col("n_tokens") >= 10 && col("n_tokens") <= 1000 &&
        col("n_stop") * 1000L <= col("n_tokens") * 600L)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("passed").desc, col("n_tokens").desc, col("doc_id"))
    g.withColumn("qrank", row_number().over(w))
      .filter(col("qrank") <= CapPerSource)
      .select(col("source"), col("qrank"), col("doc_id"), col("n_tokens"),
        col("passed"))
      .orderBy(col("source"), col("qrank"))
  }

  val q114Sql: String = s"""
    WITH f AS (
      SELECT doc_id, source,
        CAST(len(${Sql.words}) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(${Sql.words}, t -> t IN (${Text.StopWords.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS n_stop
      FROM documents),
    g AS (
      SELECT doc_id, source, n_tokens,
        (n_tokens >= 10 AND n_tokens <= 1000
          AND n_stop * 1000 <= n_tokens * 600) AS passed
      FROM f),
    r AS (
      SELECT source, doc_id, n_tokens, passed,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY passed DESC, n_tokens DESC, doc_id) AS INTEGER) AS qrank
      FROM g)
    SELECT source, qrank, doc_id, n_tokens, passed FROM r
    WHERE qrank <= $CapPerSource
    ORDER BY source, qrank"""

  /** Temperature-weighted language sampling — the multilingual mixing
    * policy (weight each language count^alpha, alpha=1/2, so tail
    * languages are oversampled relative to their natural share). The
    * whole selection is deterministic and integer-exact: weights use an
    * exact integer sqrt (double sqrt + a +/-1 correction), each language
    * gets alloc = T_total*w DIV W, and a doc is kept iff
    * hash32(doc_id) < cutoff where cutoff = alloc*2^32 DIV count —
    * expected-alloc Bernoulli selection by hash threshold.
    *
    * Scale shape: per-language constants are a broadcast of n_langs rows
    * and the keep decision is a pure map-side filter over the corpus
    * scan — no window, no per-group sort, no second shuffle. (An exact-k
    * variant would need a per-group top-k by hash; the threshold form is
    * what 100 TB mixing jobs run.) The cutoff product alloc*2^32 needs
    * 128-bit math once alloc exceeds 2^31 — at that point lift the
    * per-language cutoff computation (n_langs rows, driver-side) to
    * BigInt; the per-row probe compares two longs regardless. */
  def q115(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("lang"))
    val lc = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
    val s0 = floor(sqrt(col("c").cast(DoubleType))).cast(LongType)
    val sw = lc.withColumn("w",
      s0 + when((s0 + 1L) * (s0 + 1L) <= col("c"), 1L).otherwise(0L)
         - when(s0 * s0 > col("c"), 1L).otherwise(0L))
    val tot = sw.agg(sum(col("c")).as("n_total"), sum(col("w")).as("w_total"))
    val alloc = sw.crossJoin(broadcast(tot))
      .withColumn("t_total", expr("n_total DIV 2"))
      .withColumn("alloc", expr("(t_total * w) DIV w_total"))
      .withColumn("cutoff", expr("(alloc * 4294967296) DIV c"))
      .withColumn("natural_bp", expr("(c * 10000) DIV n_total"))
      .withColumn("target_bp", expr("(alloc * 10000) DIV t_total"))
    val h = graft.functions.Hashing.hash32(col("doc_id").cast(StringType))
    docs.withColumn("h", h)
      .join(broadcast(alloc), Seq("lang"))
      .withColumn("keep", col("h") < col("cutoff"))
      .groupBy(col("lang")).agg(
        max(col("c")).as("n_docs"),
        max(col("w")).as("weight"),
        max(col("alloc")).as("alloc"),
        max(col("natural_bp")).as("natural_bp"),
        max(col("target_bp")).as("target_bp"),
        sum(col("keep").cast(LongType)).as("kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(lit(0L)))
          .as("kept_id_sum"))
      .orderBy(col("lang"))
  }

  val q115Sql: String = s"""
    WITH lc AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang),
    sw AS (
      SELECT lang, c,
        s0 + (CASE WHEN (s0+1)*(s0+1) <= c THEN 1 ELSE 0 END)
           - (CASE WHEN s0*s0 > c THEN 1 ELSE 0 END) AS w
      FROM (SELECT lang, c,
              CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS s0 FROM lc)),
    t AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_total,
             CAST(sum(w) AS BIGINT) AS w_total FROM sw),
    a AS (
      SELECT lang, c, w,
        CAST((n_total // 2) * w // w_total AS BIGINT) AS alloc,
        CAST(((n_total // 2) * w // w_total) * 4294967296 // c AS BIGINT) AS cutoff,
        CAST(c * 10000 // n_total AS BIGINT) AS natural_bp,
        CAST(((n_total // 2) * w // w_total) * 10000 // (n_total // 2) AS BIGINT) AS target_bp
      FROM sw, t)
    SELECT d.lang,
      max(a.c) AS n_docs,
      max(a.w) AS weight,
      max(a.alloc) AS alloc,
      max(a.natural_bp) AS natural_bp,
      max(a.target_bp) AS target_bp,
      CAST(sum(CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) < a.cutoff THEN 1 ELSE 0 END) AS BIGINT) AS kept,
      CAST(sum(CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) < a.cutoff THEN d.doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM documents d JOIN a ON d.lang = a.lang
    GROUP BY d.lang
    ORDER BY d.lang"""

  /** q129 — priority sampling (Duffield–Lund–Thorup, JACM 2007): a
    * weight-sensitive sample of k documents without replacement with an
    * unbiased subset-sum estimator. Each doc draws priority
    * p = w * 2^32 DIV u where w = n_chars + 1 (the byte mass a training
    * mix would weight by) and u = hash32(doc_id) + 1 is its deterministic
    * uniform in [1, 2^32]; the sample is the top-k by priority and every
    * kept doc's weight estimate is max(w, tau) with tau the (k+1)-th
    * priority — ZERO when the corpus has at most k docs (the whole corpus
    * is the sample, so est_w = w exactly, per Duffield–Lund–Thorup's
    * definition; min-of-sampled would overstate weights and break
    * unbiasedness on tiny inputs) — sum(est) is unbiased for total corpus
    * weight, which is what lets a 100 TB mix be audited from a 25-row
    * sample.
    *
    * Scale shape: priorities are a pure map-side projection and the
    * top-(k+1) lowers to TakeOrderedAndProject — per-partition partial
    * top-k, O(k) rows to the driver, no global sort, no window over the
    * corpus. The tau extraction and rank run on the k+1 surviving rows.
    * All arithmetic is int64 (w*2^32 <= ~2^45 at any real doc size;
    * integer DIV matches DuckDB //), so the gate is bit-exact. */
  val SampleK = 25

  def q129(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d).select(
      col("doc_id"),
      (col("n_chars") + 1L).as("w"),
      (graft.functions.Hashing.hash32(col("doc_id").cast(StringType)) + 1L).as("u"))
    val p = docs.withColumn("priority", expr("(w * 4294967296) DIV u"))
    // TakeOrderedAndProject: map-side partial top-(k+1), no global sort
    val top = p.orderBy(col("priority").desc, col("doc_id").asc).limit(SampleK + 1)
    val w0 = Window.orderBy(col("priority").desc, col("doc_id").asc)
    val wAll = Window.partitionBy(lit(1))
    top
      .withColumn("rank", row_number().over(w0))
      // tau = the (k+1)-th priority; 0 when the corpus has <= k docs
      // (every doc survives, so est_w = w — the unbiased boundary case)
      .withColumn("tau",
        when(count(lit(1)).over(wAll) <= SampleK, lit(0L))
          .otherwise(min(col("priority")).over(wAll)))
      .filter(col("rank") <= SampleK)
      .select(col("rank"), col("doc_id"), col("w"), col("priority"),
        greatest(col("w"), col("tau")).as("est_w"))
      .orderBy(col("rank"))
  }

  val q129Sql: String = s"""
    WITH p AS (
      SELECT doc_id, n_chars + 1 AS w,
        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1 AS u
      FROM documents),
    pr AS (
      SELECT doc_id, w, (w * 4294967296) // u AS priority FROM p),
    r AS (
      SELECT doc_id, w, priority,
        CAST(row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS INTEGER) AS rank
      FROM pr),
    t AS (SELECT CASE WHEN count(*) <= $SampleK THEN 0
                 ELSE min(priority) END AS tau
          FROM r WHERE rank <= ${SampleK + 1})
    SELECT rank, doc_id, w, priority, greatest(w, tau) AS est_w
    FROM r, t WHERE rank <= $SampleK ORDER BY rank"""

  /** q131 — epoch-repeat data mixing: materialize fractional per-language
    * repeat factors (the DoReMi / Llama-style "source X repeats 2.3
    * epochs" policy, here upsample-to-head: factor = c_max/c in basis
    * points). Every doc yields floor(factor) full copies plus one more
    * iff hash32(doc_id || ':mix') mod 10^4 falls under the fractional
    * part — deterministic expected-fraction selection, the same
    * hash-threshold rule a restartable 100 TB mixing job needs (no RNG
    * state, any subset of tasks can be recomputed).
    *
    * Scale shape: per-language factors are a lang-sized broadcast; the
    * expansion is a map-side `explode(sequence(1, copies))` — zero
    * shuffle until the final lang-sized partial aggregate. The checksum
    * sums doc_id*31+epoch over every emitted row, so the gate proves the
    * exact multiset of (doc, epoch) copies, not just counts. */
  def q131(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("lang"))
    val lc = docs.groupBy(col("lang")).agg(count(lit(1)).cast(LongType).as("c"))
    val mx = lc.agg(max(col("c")).as("c_max"))
    val f = lc.crossJoin(broadcast(mx))
      .withColumn("factor_bp", expr("(c_max * 10000) DIV c"))
    val h = graft.functions.Hashing.hash32(
      concat(col("doc_id").cast(StringType), lit(":mix")))
    val withCopies = docs
      .join(broadcast(f), Seq("lang"))
      .withColumn("copies",
        expr("factor_bp DIV 10000") +
          when(h % 10000L < col("factor_bp") % 10000L, 1L).otherwise(0L))
    val expanded = withCopies.select(
      col("lang"), col("doc_id"), col("c"), col("factor_bp"),
      explode(sequence(lit(1L), col("copies"))).as("epoch"))
    expanded.groupBy(col("lang")).agg(
      max(col("c")).as("n_docs"),
      max(col("factor_bp")).as("factor_bp"),
      count(lit(1)).as("out_rows"),
      (count(lit(1)) - max(col("c")) * expr("max(factor_bp) DIV 10000"))
        .as("n_extra"),
      sum(col("doc_id") * 31L + col("epoch")).as("checksum"))
      .orderBy(col("lang"))
  }

  val q131Sql: String = s"""
    WITH lc AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang),
    m AS (SELECT max(c) AS c_max FROM lc),
    f AS (SELECT lang, c, (c_max * 10000) // c AS factor_bp FROM lc, m),
    dc AS (
      SELECT d.doc_id, d.lang, f.c, f.factor_bp,
        factor_bp // 10000 +
          (CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8) AS BIGINT) % 10000
                     < factor_bp % 10000 THEN 1 ELSE 0 END) AS copies
      FROM documents d JOIN f ON d.lang = f.lang),
    e AS (
      SELECT lang, doc_id, c, factor_bp,
        unnest(range(1, copies + 1)) AS epoch
      FROM dc)
    SELECT lang,
      max(c) AS n_docs,
      max(factor_bp) AS factor_bp,
      CAST(count(*) AS BIGINT) AS out_rows,
      CAST(count(*) - max(c) * (max(factor_bp) // 10000) AS BIGINT) AS n_extra,
      CAST(sum(doc_id * 31 + epoch) AS BIGINT) AS checksum
    FROM e GROUP BY lang ORDER BY lang"""

  /** q135 — distribution matching by rejection sampling: de-bias each
    * source's length distribution toward the global corpus marginal (the
    * CCNet/quality-matching move — keep a source's overlong/overshort tail
    * only at the rate the reference distribution carries it). Per
    * (source, bucket) the target is want = min(c_sb, (c_s * g_b) DIV g) —
    * the source's doc budget allocated by the global bucket share, capped
    * at what the source has (rejection sampling only deletes) — and a doc
    * survives iff hash32(doc_id || ':rs') clears the expected-count
    * threshold (want * 2^32) DIV c_sb: deterministic, RNG-state-free,
    * recomputable per task.
    *
    * Scale shape: three dim-sized aggregates (bucket marginal, source
    * totals, source×bucket cells) broadcast back; the keep decision is a
    * map-side filter over the corpus scan — no window, no per-group sort
    * (the q115 threshold discipline, one level deeper). */
  val LenBuckets = 5L

  def q135(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("source"),
      least(expr("n_chars DIV 100"), lit(LenBuckets)).as("bucket"))
    val g = docs.groupBy(col("bucket")).agg(count(lit(1)).as("gb"))
    val gt = g.agg(sum(col("gb")).as("gtot"))
    val s = docs.groupBy(col("source")).agg(count(lit(1)).as("cs"))
    val sb = docs.groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("csb"))
    val tgt = sb.join(broadcast(s), Seq("source"))
      .join(broadcast(g), Seq("bucket"))
      .crossJoin(broadcast(gt))
      .withColumn("want", least(col("csb"), expr("(cs * gb) DIV gtot")))
      .withColumn("cut", expr("(want * 4294967296) DIV csb"))
    val h = graft.functions.Hashing.hash32(
      concat(col("doc_id").cast(StringType), lit(":rs")))
    docs.withColumn("h", h)
      .join(broadcast(tgt), Seq("source", "bucket"))
      .withColumn("keep", col("h") < col("cut"))
      .groupBy(col("source"), col("bucket")).agg(
        max(col("csb")).as("n_docs"),
        max(col("want")).as("want"),
        sum(col("keep").cast(LongType)).as("kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(lit(0L))).as("kept_id_sum"))
      .orderBy(col("source"), col("bucket"))
  }

  val q135Sql: String = s"""
    WITH d AS (
      SELECT doc_id, source, least(n_chars // 100, $LenBuckets) AS bucket
      FROM documents),
    g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS gb FROM d GROUP BY bucket),
    gt AS (SELECT CAST(sum(gb) AS BIGINT) AS gtot FROM g),
    s AS (SELECT source, CAST(count(*) AS BIGINT) AS cs FROM d GROUP BY source),
    sb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS csb
           FROM d GROUP BY source, bucket),
    tgt AS (
      SELECT sb.source, sb.bucket, csb,
        least(csb, (cs * gb) // gtot) AS want,
        (least(csb, (cs * gb) // gtot) * 4294967296) // csb AS cut
      FROM sb JOIN s USING (source) JOIN g USING (bucket), gt)
    SELECT d.source, d.bucket,
      max(t.csb) AS n_docs,
      max(t.want) AS want,
      CAST(sum(CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':rs'), 1, 8) AS BIGINT) < t.cut THEN 1 ELSE 0 END) AS BIGINT) AS kept,
      CAST(sum(CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':rs'), 1, 8) AS BIGINT) < t.cut THEN d.doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM d JOIN tgt t ON d.source = t.source AND d.bucket = t.bucket
    GROUP BY d.source, d.bucket
    ORDER BY d.source, d.bucket"""

  /** q137 — classifier evaluation for the language-ID filter (q40): per
    * class support, tp/fp/fn, and integer-exact precision/recall/F1 in
    * permille — the eval-harness step that gates whether a filter is fit
    * to run over the corpus at all (the deployment sibling of q109/q110's
    * train/infer pair). F1 chains the integer divisions
    * (2*p*r DIV (p+r)), so the gate needs no libm on either engine.
    *
    * Scale shape: two class-sized conditional aggregates over the scored
    * corpus (tp/fn by actual class, predicted totals by predicted class),
    * FULL-outer-joined class-on-class so a label that is predicted but
    * never appears as an actual class still surfaces (support = 0, its
    * mispredictions counted as fp) — a left join would silently drop
    * those false positives and break the sum(fp) == sum(fn) identity of
    * any single-label eval. The corpus pays one scoring pass and two
    * map-side-combinable aggregations; everything after is dim-sized. */
  def q137(spark: SparkSession, d: String): DataFrame =
    classEval(q40(spark, d))

  /** The per-class eval harness shared by q137 (marker heuristic) and q138
    * (trained model): from a (pred_lang, actual_lang, correct) frame to
    * per-class support/tp/fp/fn and permille P/R/F1. */
  private def classEval(s: DataFrame): DataFrame = {
    val byActual = s.groupBy(col("actual_lang").as("lang")).agg(
      count(lit(1)).as("support"),
      sum(col("correct").cast(LongType)).as("tp"))
    val byPred = s.groupBy(col("pred_lang").as("lang")).agg(count(lit(1)).as("pc"))
    byActual.join(byPred, Seq("lang"), "full")
      .na.fill(0L, Seq("support", "tp", "pc"))
      .withColumn("fp", col("pc") - col("tp"))
      .withColumn("fn", col("support") - col("tp"))
      .withColumn("prec_pm",
        when(col("tp") + col("fp") > 0L, expr("(tp * 1000) DIV (tp + fp)")).otherwise(0L))
      .withColumn("rec_pm",
        when(col("support") > 0L, expr("(tp * 1000) DIV support")).otherwise(0L))
      .withColumn("f1_pm",
        when(col("prec_pm") + col("rec_pm") > 0L,
          expr("(2 * prec_pm * rec_pm) DIV (prec_pm + rec_pm)")).otherwise(0L))
      .select(col("lang"), col("support"), col("tp"), col("fp"), col("fn"),
        col("prec_pm"), col("rec_pm"), col("f1_pm"))
      .orderBy(col("lang"))
  }

  /** SQL mirror of `classEval`: the CTE tail from a `s` CTE with
    * (pred_lang, actual_lang, correct) to the final per-class SELECT. */
  private val ClassEvalSqlTail: String = s"""
    a AS (
      SELECT actual_lang AS lang, CAST(count(*) AS BIGINT) AS support,
        CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM s GROUP BY 1),
    p AS (
      SELECT pred_lang AS lang, CAST(count(*) AS BIGINT) AS pc FROM s GROUP BY 1),
    j AS (
      SELECT coalesce(a.lang, p.lang) AS lang,
        coalesce(support, 0) AS support, coalesce(tp, 0) AS tp,
        coalesce(pc, 0) - coalesce(tp, 0) AS fp,
        coalesce(support, 0) - coalesce(tp, 0) AS fn
      FROM a FULL JOIN p ON a.lang = p.lang),
    m AS (
      SELECT lang, support, tp, fp, fn,
        (CASE WHEN tp + fp > 0 THEN (tp * 1000) // (tp + fp) ELSE 0 END) AS prec_pm,
        (CASE WHEN support > 0 THEN (tp * 1000) // support ELSE 0 END) AS rec_pm
      FROM j)
    SELECT lang, support, tp, fp, fn, prec_pm, rec_pm,
      (CASE WHEN prec_pm + rec_pm > 0
            THEN (2 * prec_pm * rec_pm) // (prec_pm + rec_pm) ELSE 0 END) AS f1_pm
    FROM m ORDER BY lang"""

  val q137Sql: String = s"""
    WITH s AS (${q40Sql.replace("ORDER BY doc_id", "")}),
    $ClassEvalSqlTail"""

  /** q138 — language-ID v2: a TRAINED character-bigram naive-Bayes
    * classifier replacing q40's fixed marker heuristic (which q137
    * honestly measured at ~32% micro-accuracy, BELOW the majority
    * baseline), evaluated on a held-out split with the same per-class
    * harness. Training and inference are both in-engine: counts from the
    * q125 train split (hash32("split:"||doc_id) mod 100 < 80), evaluation
    * on the test split (>= 90), so the audit q125 runs over these exact
    * split assignments covers this model's leakage too.
    *
    * All scoring is INTEGER-exact cross-engine: add-one-smoothed bigram
    * surprisal ilog64(((t+V) * 2^24) DIV (c+1)) with ilog64(x) =
    * 64*floor(log2 x) + (x*64 DIV 2^floor(log2 x)) - 64 — the
    * length(bin(x)) quantizer (q104's libm-free trick) extended with six
    * fractional bits by linear interpolation between powers of two, so
    * class scores rarely tie and no libm rounding can diverge engines.
    * Prediction is argmin total surprisal (sum of per-occurrence weights
    * under a UNIFORM class prior — the lang labels are near-balanced and
    * noisy, and an empirical prior just drags every prediction toward the
    * majority class: measured macro-F1 drops below the baseline at the
    * smallest scale factor with the prior, beats it at every scale
    * without), ties to the lexicographically smaller lang via struct min.
    *
    * Scale shape: the model (lang x bigram counts, per-lang totals, doc
    * priors, vocabulary size) is dim-sized and BROADCAST; the corpus pays
    * one bigram-explode pass per split with map-side-combinable
    * aggregations ((lang,bg), then (doc,lang), then doc); no corpus keyed
    * join anywhere. Test scoring aggregates occurrences to
    * (doc, bigram, n) BEFORE the per-class weight join, so the class
    * count multiplies only the distinct-bigram frame (bounded by
    * charset^2 per doc), not raw occurrences — at a realistic 100-200
    * language model the widest frame in the plan stays corpus-pass-sized.
    * q158 deploys the same trained weights corpus-wide as map-side
    * literals (zero scoring shuffle). On the synthetic corpus (whose lang labels are nearly
    * independent of text — by design) it lifts macro-F1 from the majority
    * baseline's ~126 permille to ~240: the honest win available. */
  val LangIdScale: Long = 1L << 24

  def q138(spark: SparkSession, d: String): DataFrame = {
    val S = LangIdScale
    val nm = Text.normalize(col("text"))
    val bigrams = when(length(col("nm")) >= 2,
      transform(sequence(lit(1), length(col("nm")) - 1),
        i => col("nm").substr(i, lit(2))))
      .otherwise(array().cast(ArrayType(StringType)))
    // one corpus pass builds the bigram arrays for BOTH splits (cached:
    // feeds train counts, vocab size, priors, and test scoring)
    val base = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), col("lang"), nm.as("nm"),
        graft.functions.Hashing.splitBucket(col("doc_id")).as("b"))
      .withColumn("bgs", bigrams)
      .cache()
    val train = base.filter(col("b") < 80)
    val test = base.filter(col("b") >= 90)
    // ilog64 over a named BIGINT column (integer-exact on both engines)
    def ilog64(x: String) =
      s"64 * (length(bin($x)) - 1) + ($x * 64) DIV CAST(pow(2.0D, length(bin($x)) - 1) AS BIGINT) - 64"
    val occ = train.select(col("lang"), explode(col("bgs")).as("bg"))
    // pinned: the (lang, bigram) count table is model-sized (langs x
    // charset^2) and feeds FOUR derived legs (totals, vocab size, the
    // weight broadcast, the default-weight broadcast) — each an eager
    // broadcast build that would otherwise re-run the train explode +
    // aggregation from the cached corpus (guide §1.2: one pass)
    val cnt = occ.groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("t"))
    val vv = cnt.agg(count_distinct(col("bg")).as("v"))
    val weights = cnt.join(tot, Seq("lang")).crossJoin(broadcast(vv))
      .withColumn("x", expr(s"((t + v) * $S) DIV (c + 1)"))
      .select(col("lang").as("ml"), col("bg"),
        expr(ilog64("x")).cast(LongType).as("w"))
    val defw = tot.crossJoin(broadcast(vv))
      .withColumn("x", expr(s"(t + v) * $S"))
      .select(col("lang").as("ml"), expr(ilog64("x")).cast(LongType).as("dw"))
    val langsDf = tot.select(col("lang").as("ml"))
    // score per DISTINCT (doc, bigram) — occurrences aggregate to a count
    // BEFORE the per-class weight join, so the widest frame is
    // distinct-bigram-sized and the class count multiplies only the
    // post-shrink frame, never raw occurrences. Unseen bigrams take the
    // lang's smoothed default weight.
    val tbg = test.select(col("doc_id"), explode(col("bgs")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("nn"))
    val tocc = tbg
      .crossJoin(broadcast(defw))
      .join(broadcast(weights), Seq("ml", "bg"), "left")
      .select(col("doc_id"), col("ml"),
        (coalesce(col("w"), col("dw")) * col("nn")).as("w"))
    val bsum = tocc.groupBy(col("doc_id"), col("ml")).agg(sum(col("w")).as("bs"))
    val scored = test.select(col("doc_id"), col("lang").as("actual_lang"))
      .crossJoin(broadcast(langsDf))
      .join(bsum, Seq("doc_id", "ml"), "left")
      .withColumn("s", coalesce(col("bs"), lit(0L)))
      .groupBy(col("doc_id"), col("actual_lang"))
      .agg(min(struct(col("s"), col("ml"))).as("best"))
      .select(col("doc_id"),
        col("best").getField("ml").as("pred_lang"),
        col("actual_lang"),
        (col("best").getField("ml") === col("actual_lang")).as("correct"))
    classEval(scored)
  }

  val q138Sql: String = {
    val S = LangIdScale
    def ilog64(x: String) =
      s"64 * (length(bin($x)) - 1) + ($x * 64) // CAST(power(2, length(bin($x)) - 1) AS BIGINT) - 64"
    s"""
    WITH base AS (
      SELECT doc_id, lang, ${Sql.norm} AS nm,
        ${graft.functions.Hashing.splitBucketSql("doc_id")} AS b
      FROM documents),
    bg AS (
      SELECT doc_id, lang, b, unnest(list_transform(range(1, length(nm)), i -> substring(nm, i, 2))) AS g
      FROM base),
    cnt AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS c FROM bg WHERE b < 80 GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
    vv AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS v FROM cnt),
    w AS (SELECT lang AS ml, g, CAST(${ilog64(s"(((t + v) * $S) // (c + 1))")} AS BIGINT) AS w
          FROM cnt JOIN tot USING (lang) CROSS JOIN vv),
    defw AS (SELECT lang AS ml, CAST(${ilog64(s"((t + v) * $S)")} AS BIGINT) AS dw
             FROM tot CROSS JOIN vv),
    tocc AS (
      SELECT tb.doc_id, d.ml, coalesce(w.w, d.dw) * tb.nn AS w
      FROM (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS nn
            FROM bg WHERE b >= 90 GROUP BY 1, 2) tb
      CROSS JOIN defw d
      LEFT JOIN w ON w.ml = d.ml AND w.g = tb.g),
    bsum AS (SELECT doc_id, ml, CAST(sum(w) AS BIGINT) AS bs FROM tocc GROUP BY 1, 2),
    sc AS (
      SELECT td.doc_id, td.lang AS actual_lang, p.ml,
        coalesce(bs.bs, 0) AS s
      FROM (SELECT doc_id, lang FROM base WHERE b >= 90) td
      CROSS JOIN (SELECT lang AS ml FROM tot) p
      LEFT JOIN bsum bs ON bs.doc_id = td.doc_id AND bs.ml = p.ml),
    s AS (
      SELECT doc_id,
        (min({'s': s, 'l': ml})).l AS pred_lang,
        actual_lang,
        (min({'s': s, 'l': ml})).l = actual_lang AS correct
      FROM sc GROUP BY doc_id, actual_lang),
    $ClassEvalSqlTail"""
  }

  /** q158 — trained language-ID DEPLOYED corpus-wide: the q138 model
    * (char-bigram naive Bayes trained on the b<80 split) applied to EVERY
    * document — the shape a production funnel actually runs, replacing
    * the q40 heuristic with the trained model (reference's language
    * tagging lives in per-replicator enrichment columns, e.g.
    * lib/webhookdb/replicator/column.rb converter registry; here it's a
    * corpus-wide trained stage).
    *
    * Scale shape — the q110 discipline on a multi-class model: training
    * is the q138 map-side-combinable pass; then the trained weights
    * (langs x charset^2 bigrams — dim-sized by construction, since
    * normalize() collapses the charset) are collected ONCE and shipped
    * back as plan literals: a map bigram -> per-lang weight vector plus a
    * per-lang default vector. Scoring is then a pure PROJECTION —
    * aggregate(bgs, zeros, zip_with(+)) over the literal map — zero
    * scoring shuffle, zero corpus join, class count multiplies only the
    * per-row arithmetic. The widest corpus frame is the one bigram-array
    * projection regardless of language count (the class-count sidecar
    * measures this at 5 vs 50 langs). At a model too big for plan
    * literals (~10^6+ weights) the same scoring drops to one broadcast
    * join against the (bg, weight-vector) frame — still shuffle-free. */
  def q158(spark: SparkSession, d: String): DataFrame = {
    val S = LangIdScale
    val nm = Text.normalize(col("text"))
    val bigrams = when(length(col("nm")) >= 2,
      transform(sequence(lit(1), length(col("nm")) - 1),
        i => col("nm").substr(i, lit(2))))
      .otherwise(array().cast(ArrayType(StringType)))
    val base = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), col("lang"), nm.as("nm"),
        graft.functions.Hashing.splitBucket(col("doc_id")).as("b"))
      .withColumn("bgs", bigrams)
      .cache()
    // ONE training pass over the corpus: the (lang, bigram) count table is
    // dim-sized (langs x charset^2) and collected ONCE; smoothing and the
    // ilog64 quantization happen driver-side in the exact same integer
    // arithmetic the q138 expression (and the SQL oracle) evaluate —
    // floor(log2 x) via leading zeros == length(bin(x)) - 1, truncating
    // long division == DIV. Collecting derived frames separately would
    // recompute the corpus explode once per collect.
    val cntRows = base.filter(col("b") < 80)
      .select(col("lang"), explode(col("bgs")).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c"))
      .collect()
    def ilog64(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      64L * e + (x * 64L) / (1L << e) - 64L
    }
    val byLang = cntRows.groupBy(_.getString(0))
    val langs: Seq[String] = byLang.keys.toSeq.sorted
    val idx = langs.zipWithIndex.toMap
    val v = cntRows.iterator.map(_.getString(1)).toSet.size.toLong
    val tot: Map[String, Long] =
      byLang.map { case (l, rows) => l -> rows.iterator.map(_.getLong(2)).sum }
    val defaults: Seq[Long] = langs.map(l => ilog64((tot(l) + v) * S))
    val wmap: Map[String, Seq[Long]] = cntRows.groupBy(_.getString(1))
      .map { case (bg, rows) =>
        val arr = defaults.toArray
        rows.foreach { r =>
          val l = r.getString(0)
          arr(idx(l)) = ilog64(((tot(l) + v) * S) / (r.getLong(2) + 1L))
        }
        bg -> arr.toSeq
      }
    val wlit = typedlit(wmap)
    val dlit = typedlit(defaults)
    val llit = typedlit(langs)
    val scores = aggregate(col("bgs"), array_repeat(lit(0L), langs.length),
      (acc, bg) => zip_with(acc, coalesce(element_at(wlit, bg), dlit),
        (a, w) => a + w))
    base.select(col("doc_id"),
        array_min(zip_with(scores, llit,
          (s, l) => struct(s.as("s"), l.as("l")))).as("best"))
      .select(col("doc_id"),
        col("best").getField("l").as("pred_lang"),
        col("best").getField("s").as("score"))
      .orderBy(col("doc_id"))
  }

  val q158Sql: String = {
    val S = LangIdScale
    def ilog64(x: String) =
      s"64 * (length(bin($x)) - 1) + ($x * 64) // CAST(power(2, length(bin($x)) - 1) AS BIGINT) - 64"
    s"""
    WITH base AS (
      SELECT doc_id, lang, ${Sql.norm} AS nm,
        ${graft.functions.Hashing.splitBucketSql("doc_id")} AS b
      FROM documents),
    bg AS (
      SELECT doc_id, lang, b, unnest(list_transform(range(1, length(nm)), i -> substring(nm, i, 2))) AS g
      FROM base),
    cnt AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS c FROM bg WHERE b < 80 GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
    vv AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS v FROM cnt),
    w AS (SELECT lang AS ml, g, CAST(${ilog64(s"(((t + v) * $S) // (c + 1))")} AS BIGINT) AS w
          FROM cnt JOIN tot USING (lang) CROSS JOIN vv),
    defw AS (SELECT lang AS ml, CAST(${ilog64(s"((t + v) * $S)")} AS BIGINT) AS dw
             FROM tot CROSS JOIN vv),
    ab AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS nn FROM bg GROUP BY 1, 2),
    tocc AS (
      SELECT a.doc_id, d.ml, coalesce(w.w, d.dw) * a.nn AS w
      FROM ab a CROSS JOIN defw d LEFT JOIN w ON w.ml = d.ml AND w.g = a.g),
    bsum AS (SELECT doc_id, ml, CAST(sum(w) AS BIGINT) AS bs FROM tocc GROUP BY 1, 2),
    sc AS (
      SELECT b.doc_id, p.ml, coalesce(bs.bs, 0) AS s
      FROM base b
      CROSS JOIN (SELECT lang AS ml FROM tot) p
      LEFT JOIN bsum bs ON bs.doc_id = b.doc_id AND bs.ml = p.ml)
    SELECT doc_id,
      (min({'s': s, 'l': ml})).l AS pred_lang,
      (min({'s': s, 'l': ml})).s AS score
    FROM sc GROUP BY doc_id
    ORDER BY doc_id"""
  }

  /** q165 — PII linkage / k-anonymity rollup. q46 detects and REDACTS
    * per-row PII (`operators`-level hygiene); this is the corpus-level
    * privacy GOVERNANCE report a release gate needs on top: which
    * identifier VALUES recur across documents and can therefore link
    * records. Every document is deterministically salted with synthetic
    * PII (emails, a US-style phone, an IPv4 — counts vary by doc_id),
    * the engine extracts the concrete values per class and reports, per
    * class: distinct values, LINKED values (appearing in >= 2 distinct
    * docs), the max document fan-out of any single value, and total
    * occurrences. The salt formula makes the classes genuinely differ:
    * emails embed doc_id (never link), phones collide only mod
    * lcm(900,10000), IPs collide mod 256 — so the report separates
    * k-anonymous classes from linking ones, which is the distinction the
    * operator exists to surface.
    *
    * Scale shape: map-side regex extraction (patterns in the
    * class/bounded-quantifier subset where Java regex and RE2 agree),
    * arrays materialized in a projection before the explode, then ONE
    * shuffle keyed (class, value) — never doc×doc; the per-class rollup
    * is map-side combinable and the output is class-bounded. */
  def q165(spark: SparkSession, d: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\b\\d{3}-555-\\d{4}\\b"
    val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val id = col("doc_id")
    val ids = id.cast(StringType)
    val synth = concat(
      col("text"),
      lit(" contact user"), ids, lit("@mail.example.com"),
      when(id % 3 === 0,
        concat(lit(" cc admin"), ids, lit("@corp.example.org")))
        .otherwise(lit("")),
      when(id % 5 =!= 0,
        concat(lit(" call "), (id % 900 + 100).cast(StringType),
          lit("-555-"), lpad((id % 10000).cast(StringType), 4, "0")))
        .otherwise(lit("")),
      lit(" from 10."), (id % 256).cast(StringType),
      lit("."), ((id * 7) % 256).cast(StringType),
      lit("."), ((id * 13) % 256).cast(StringType))
    val base = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), synth.as("s"))
    def leg(cls: String, pat: String): DataFrame =
      base.select(col("doc_id"),
          regexp_extract_all(col("s"), lit(pat), lit(0)).as("vs"))
        .select(col("doc_id"), lit(cls).as("pii_class"),
          explode(col("vs")).as("v"))
    val vals = leg("email", emailPat)
      .unionByName(leg("phone", phonePat))
      .unionByName(leg("ip", ipPat))
    vals.groupBy(col("pii_class"), col("v"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .groupBy(col("pii_class"))
      .agg(count(lit(1)).as("n_values"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_linked_values"),
        max(col("n_docs")).as("max_doc_fanout"),
        sum(col("n_occ")).as("n_occurrences"))
      .orderBy(col("pii_class"))
  }

  val q165Sql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-555-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    s"""
    WITH s AS (
      SELECT doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
          || (CASE WHEN doc_id % 3 = 0
              THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@corp.example.org'
              ELSE '' END)
          || (CASE WHEN doc_id % 5 <> 0
              THEN ' call ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END)
          || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
          || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
          || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) AS s
      FROM documents),
    vals AS (
      SELECT doc_id, 'email' AS pii_class, unnest(regexp_extract_all(s, '$email')) AS v FROM s
      UNION ALL
      SELECT doc_id, 'phone' AS pii_class, unnest(regexp_extract_all(s, '$phone')) AS v FROM s
      UNION ALL
      SELECT doc_id, 'ip' AS pii_class, unnest(regexp_extract_all(s, '$ip')) AS v FROM s),
    g AS (
      SELECT pii_class, v,
        count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
      FROM vals GROUP BY 1, 2)
    SELECT pii_class,
      CAST(count(*) AS BIGINT) AS n_values,
      CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_linked_values,
      CAST(max(n_docs) AS BIGINT) AS max_doc_fanout,
      CAST(sum(n_occ) AS BIGINT) AS n_occurrences
    FROM g GROUP BY 1 ORDER BY 1"""
  }

  /** q166 — the LINEAR-cost long-document shape for q47's Gopher
    * repetition signals, plus the keep gate. q47 computes top-unigram /
    * top-bigram shares with in-row array HOFs — O(tokens²) PER DOCUMENT,
    * which is the right call for bounded web pages (zero shuffles) but
    * blows up on book/code-file corpora where single documents reach
    * 10^5+ tokens (10^10 comparisons per doc, one task). This variant
    * trades two (doc, gram)-keyed shuffles for per-doc O(tokens):
    * explode → count → per-doc max, so the worst document costs what its
    * length costs. Same permille signals, plus the 300‰/200‰ keep
    * decision a pretraining filter actually applies. Pick q47 under
    * bounded doc length, q166 when the length distribution is heavy-
    * tailed — the crossover is measured in `BENCH_sf1_longdoc.json`.
    *
    * Scale shape: the token arrays materialize ONCE into a cached narrow
    * frame (the r7 explode-of-inline-array trap), then two
    * map-side-combinable (doc, gram) aggregations take a per-doc max —
    * all keyed by doc_id, no corpus-wide state, report is per-doc. */
  def q166(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")).cast(LongType))
      .cache()
    val top1 = base.select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top1"))
    val bigrams = when(col("n") >= 2,
      transform(sequence(lit(1), (col("n") - 1).cast("int")),
        i => concat(element_at(col("t"), i), lit(" "),
          element_at(col("t"), i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    val top2 = base.select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top2"))
    base.select(col("doc_id"), col("n"))
      .join(top1, Seq("doc_id"), "left")
      .join(top2, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top1", "top2"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("top1"), col("top2"),
        expr("CASE WHEN n > 0 THEN top1 * 1000 DIV n ELSE 0 END").as("rep1_pm"),
        expr("CASE WHEN n > 1 THEN top2 * 1000 DIV (n - 1) ELSE 0 END").as("rep2_pm"))
      .withColumn("keep", col("rep1_pm") <= 300 && col("rep2_pm") <= 200)
      .orderBy(col("doc_id"))
  }

  val q166Sql: String = s"""
    WITH b AS (
      SELECT doc_id, ${Sql.words} AS t FROM documents),
    bn AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM b),
    u1 AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top1 FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM bn)
        GROUP BY 1, 2)
      GROUP BY 1),
    u2 AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top2 FROM (
        SELECT doc_id, bg, count(*) AS c
        FROM (SELECT doc_id,
                unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
              FROM bn)
        GROUP BY 1, 2)
      GROUP BY 1)
    SELECT bn.doc_id, n AS n_tokens,
      coalesce(top1, 0) AS top1, coalesce(top2, 0) AS top2,
      (CASE WHEN n > 0 THEN coalesce(top1, 0) * 1000 // n ELSE 0 END) AS rep1_pm,
      (CASE WHEN n > 1 THEN coalesce(top2, 0) * 1000 // (n - 1) ELSE 0 END) AS rep2_pm,
      ((CASE WHEN n > 0 THEN coalesce(top1, 0) * 1000 // n ELSE 0 END) <= 300 AND
       (CASE WHEN n > 1 THEN coalesce(top2, 0) * 1000 // (n - 1) ELSE 0 END) <= 200) AS keep
    FROM bn
    LEFT JOIN u1 USING (doc_id)
    LEFT JOIN u2 USING (doc_id)
    ORDER BY bn.doc_id"""

  val defs: Map[String, Q] = Map(
    "q166_repetition_linear" -> (q166 _),
    "q165_pii_linkage" -> (q165 _),
    "q158_langid_deploy" -> (q158 _),
    "q157_split_manifest" -> (q157 _),
    "q155_split_drift" -> (q155 _),
    "q154_curriculum" -> (q154 _),
    "q148_pipeline_funnel" -> (q148 _),
    "q147_html_extract" -> (q147 _),
    "q143_dataset_card" -> (q143 _),
    "q142_oov_rate" -> (q142 _),
    "q141_tokenizer_fertility" -> (q141 _),
    "q139_classifier_auc" -> (q139 _),
    "q138_langid_v2" -> (q138 _),
    "q137_langid_eval" -> (q137 _),
    "q135_distribution_match" -> (q135 _),
    "q129_priority_sample" -> (q129 _),
    "q131_epoch_mix" -> (q131 _),
    "q114_source_cap" -> (q114 _),
    "q122_trigram_interp" -> (q122 _),
    "q124_perplexity_filter" -> (q124 _),
    "q115_temperature_sample" -> (q115 _),
    "q113_bigram_surprisal" -> (q113 _),
    "q112_bpe_tokenize" -> (q112 _),
    "q110_classifier_inference" -> (q110 _),
    "q189_calibration" -> (q189 _),
    "q109_quality_classifier" -> (q109 _),
    "q108_bpe_merges" -> (q108 _),
    "q104_unigram_surprisal" -> (q104 _),
    "q103_deterministic_shuffle" -> (q103 _),
    "q102_token_budget_mix" -> (q102 _),
    "q40_language_id" -> (q40 _),
    "q41_quality_score" -> (q41 _),
    "q42_token_stats" -> (q42 _),
    "q43_fingerprints" -> (q43 _),
    "q44_stratified_sample" -> (q44 _),
    "q45_sequence_packing" -> (q45 _),
    "q100_url_canonicalize" -> (q100 _))

  val oracles: Map[String, String] = Map(
    "q166_repetition_linear" -> q166Sql,
    "q165_pii_linkage" -> q165Sql,
    "q158_langid_deploy" -> q158Sql,
    "q157_split_manifest" -> q157Sql,
    "q155_split_drift" -> q155Sql,
    "q154_curriculum" -> q154Sql,
    "q148_pipeline_funnel" -> q148Sql,
    "q147_html_extract" -> q147Sql,
    "q143_dataset_card" -> q143Sql,
    "q142_oov_rate" -> q142Sql,
    "q141_tokenizer_fertility" -> q141Sql,
    "q139_classifier_auc" -> q139Sql,
    "q138_langid_v2" -> q138Sql,
    "q137_langid_eval" -> q137Sql,
    "q135_distribution_match" -> q135Sql,
    "q129_priority_sample" -> q129Sql,
    "q131_epoch_mix" -> q131Sql,
    "q114_source_cap" -> q114Sql,
    "q122_trigram_interp" -> q122Sql,
    "q124_perplexity_filter" -> q124Sql,
    "q115_temperature_sample" -> q115Sql,
    "q113_bigram_surprisal" -> q113Sql,
    "q112_bpe_tokenize" -> q112Sql,
    "q110_classifier_inference" -> q110Sql,
    "q189_calibration" -> q189Sql,
    "q109_quality_classifier" -> q109Sql,
    "q108_bpe_merges" -> q108Sql,
    "q104_unigram_surprisal" -> q104Sql,
    "q103_deterministic_shuffle" -> q103Sql,
    "q102_token_budget_mix" -> q102Sql,
    "q40_language_id" -> q40Sql,
    "q41_quality_score" -> q41Sql,
    "q42_token_stats" -> q42Sql,
    "q43_fingerprints" -> q43Sql,
    "q44_stratified_sample" -> q44Sql,
    "q45_sequence_packing" -> q45Sql,
    "q100_url_canonicalize" -> q100Sql)
}
