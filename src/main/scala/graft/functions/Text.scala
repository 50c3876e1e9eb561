package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * shingling, language-ID heuristics, quality scoring, fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen, no UDFs) so they run
  * unchanged at 100 TB and are exactly reproducible by an external SQL oracle.
  */
object Text {

  /** Normalize: lowercase, collapse runs of whitespace, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of normalized text; empty string -> empty array. */
  def tokens(c: Column): Column = {
    val n = normalize(c)
    when(n === "", array().cast(ArrayType(StringType))).otherwise(split(n, " "))
  }

  /** Token count (whitespace tokenization). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy count: word-chunks + digits + punctuation symbols,
    * the standard pre-tokenizer regex family (public GPT-2 style). Counts
    * matches of letter-runs (split every 4 chars, approximating subwords),
    * digit-runs, and single punctuation. */
  def subwordCount(c: Column): Column = {
    val letterChunks = size(regexp_extract_all(lower(c), lit("[a-z]{1,4}"), lit(0)))
    val digitChunks  = size(regexp_extract_all(c, lit("[0-9]{1,3}"), lit(0)))
    val punct        = size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))
    letterChunks + digitChunks + punct
  }

  /** Word n-gram shingles (array of "w1 w2 .. wn" strings), distinct.
    * The unit of MinHash / Jaccard dedup.
    *
    * PERFORMANCE: this form inlines the tokenizer expression into every
    * `element_at` inside the transform lambda — Spark's common-subexpression
    * elimination does not cross higher-order-function boundaries, so the
    * regex normalize+split re-runs n times PER SHINGLE (measured 35 s for a
    * 5k-doc corpus). Only use on tiny inputs; in queries, materialize the
    * token array in a prior projection and call [[shinglesOfTokens]]. */
  def shingles(c: Column, n: Int): Column =
    shinglesOfTokens(tokens(c), normalize(c), n)

  /** [[shingles]] over a PRE-MATERIALIZED token-array column (plus the
    * normalized text for the degenerate short-doc fallback) — the scalable
    * form: each element access is an O(1) array read. */
  def shinglesOfTokens(t: Column, norm: Column, n: Int): Column = {
    val count = size(t) - (n - 1)
    when(count <= 0, array(norm))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(count, lit(1))),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*))))
  }

  /** Character n-gram shingles of normalized text, distinct. */
  def charShingles(c: Column, n: Int): Column = {
    val s = normalize(c)
    when(length(s) < n, array(s))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n)))))
  }

  /** Quality-score features, each in [0,1]-ish ranges, combined linearly.
    * Mirrors the shape of public corpus-filtering heuristics (length,
    * punctuation density, stopword ratio, mean word length). Deterministic
    * integer/decimal arithmetic so an SQL oracle reproduces it exactly. */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  def stopwordCount(c: Column): Column = {
    val sw = StopWords.map(lit(_))
    size(filter(tokens(c), t => t.isin(sw: _*)))
  }

  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Language-ID by stopword-profile voting: score text against per-language
    * marker-word lists, pick argmax (ties broken by language code order).
    * N-gram-profile LangID in the classic public style (Cavnar-Trenkle),
    * reduced to marker tokens so it is exactly SQL-reproducible. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "es"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "que"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta", "men", "zai"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    LangMarkers.map { case (langCode, markers) =>
      langCode -> size(filter(t, x => x.isin(markers.map(lit(_)): _*)))
    }
  }

  /** Rolling polynomial fingerprint (Rabin-Karp family) of normalized text:
    * fold characters into a 61-bit modular hash. Deterministic and cheap;
    * used for exact-dup detection where md5 of the full text is the
    * collision-safe alternative. Implemented with `aggregate` over the
    * char codes — stays in codegen. */
  def rollingFingerprint(c: Column): Column = {
    // Mod kept at 1e9+7 (30 bits) so acc*base+code stays < 2^40: no Long
    // overflow in Spark and no UBIGINT promotion/overflow error in SQL oracles.
    val Mod  = 1000000007L
    val Base = 131L
    val codes = transform(split(normalize(c), ""), ch => ascii(ch).cast(LongType))
    aggregate(codes, lit(0L),
      (acc, code) => pmod(acc * Base + code, lit(Mod)))
  }

  /** Content-defined document fingerprint: md5 of normalized text. */
  def md5Fingerprint(c: Column): Column = md5(normalize(c))

  /** URL canonicalization for web-corpus dedup (the CommonCrawl-style key:
    * two crawls of the same page must collide): lowercase scheme/host,
    * strip a `www.` prefix, drop default ports (80/443), drop the
    * fragment, drop tracking query params (`utm_*`, `fbclid`, `gclid`)
    * while PRESERVING the remaining params in their original order (param
    * reordering changes semantics for some sites — too aggressive for a
    * dedup key), strip one trailing slash from a non-root path. Pure
    * `parse_url` + regex Columns — codegen'd, no UDF. */
  def canonicalizeUrl(c: Column): Column = {
    val scheme = lower(regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val hostRaw = lower(coalesce(parse_url(c, lit("HOST")), lit("")))
    val host = regexp_replace(hostRaw, "^www\\.", "")
    val authority = coalesce(parse_url(c, lit("AUTHORITY")), lit(""))
    val port = regexp_extract(authority, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val pathRaw = coalesce(parse_url(c, lit("PATH")), lit(""))
    val path = when(pathRaw === "/", lit(""))
      .otherwise(regexp_replace(pathRaw, "/$", ""))
    val queryRaw = coalesce(parse_url(c, lit("QUERY")), lit(""))
    val kept = filter(split(queryRaw, "&"),
      p => !(p.rlike("^(utm_[^=]*|fbclid|gclid)=") || p === ""))
    val query = array_join(kept, "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }
}
