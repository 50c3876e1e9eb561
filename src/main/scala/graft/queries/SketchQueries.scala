package graft.queries

import graft.Tables
import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable-sketch operators over the documents corpus: count-min heavy
  * hitters and HyperLogLog distinct registers. Both sketches are built from
  * commutative per-cell reductions (SUM for CMS, MAX for HLL), so the
  * result is independent of partitioning/merge order — which is what makes
  * them oracle-exact AND the 100 TB path: a fixed-size register table per
  * map task, combined map-side, with only O(cells) rows crossing the wire.
  *
  * All hashing rides the engine-shared md5-based hash32 (`Hashing.hash32` /
  * `CAST('0x'||substring(md5(v),1,8) AS BIGINT)`), and all estimator
  * arithmetic is integer-only (scaled fixed-point alpha, integer division)
  * so DuckDB reproduces every estimate bit-for-bit.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  private object Sql {
    val P = Hashing.P
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val words =
      s"(CASE WHEN $norm = '' THEN CAST([] AS VARCHAR[]) ELSE string_split($norm, ' ') END)"
    def hash32(v: String) = s"CAST('0x' || substring(md5($v), 1, 8) AS BIGINT)"
    val th = s"list_transform($words, w -> ${hash32("w")})"
    val shingleHashes = s"""(CASE WHEN len(th) < 3 THEN [nh]
      ELSE list_distinct(list_transform(range(1, len(th) - 1),
        i -> ((th[i] * ${Hashing.C1}) % $P + (th[i+1] * ${Hashing.C2}) % $P + th[i+2]) % $P)) END)"""
    val shBase =
      s"SELECT doc_id, source, $shingleHashes AS sh FROM (SELECT doc_id, source, $th AS th, ${hash32(norm)} AS nh FROM documents)"
  }

  // ---------------------------------------------------------------------
  // q116 — count-min sketch heavy hitters
  // ---------------------------------------------------------------------

  /** CMS geometry: d independent rows of w counters. Row hashes reuse the
    * MinHash permutation constants ((a_r*h + b_r) mod P) mod w. Width is
    * sized DOWN to the synthetic corpus's ~31-token vocabulary so cell
    * collisions (the thing the min-over-rows estimator exists to survive)
    * actually occur in the gate; production geometry is w = 2^16+ with
    * the identical plan shape. */
  // aliased from the shared kernel (operators.CmsSketch — also the
  // streaming loop's arithmetic) so oracle SQL and Spark cannot diverge
  val CmsDepth = graft.operators.CmsSketch.Depth
  val CmsWidth = graft.operators.CmsSketch.Width
  val TopK = 20

  private def cmsCell(r: Int, h: Column): Column =
    graft.operators.CmsSketch.cell(r, h)

  private def cmsCellSql(r: Int, h: String): String =
    graft.operators.CmsSketch.cellSql(r, h)

  /** Count-min heavy hitters: build the d x w register table from the raw
    * token stream (one commutative SUM per cell — at 100 TB each map task
    * carries a 4x256 array and the exchange moves <= 1024 rows per task),
    * then report the true top-K tokens with their CMS estimates
    * (est = min over rows of the probed cell) and the overcount the
    * collisions cost. The exact top-K side is the expensive
    * full-vocabulary aggregate — it exists here to gate the sketch against
    * truth; a production run keeps only the registers. */
  def q116(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .select(col("tok"), Hashing.hash32(col("tok")).as("h"))
    val cells = toks.select(explode(array((0 until CmsDepth).map { r =>
      struct(lit(r).cast(IntegerType).as("r"), cmsCell(r, col("h")).as("j"))
    }: _*)).as("rj"))
    val regs = cells.groupBy(col("rj.r").as("r"), col("rj.j").as("j"))
      .agg(count(lit(1)).as("reg"))
    val top = toks.groupBy(col("tok"), col("h"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok"))
      .limit(TopK)
    val probes = top.select(col("tok"), col("exact_cnt"),
      explode(array((0 until CmsDepth).map { r =>
        struct(lit(r).cast(IntegerType).as("r"), cmsCell(r, col("h")).as("j"))
      }: _*)).as("rj"))
    probes.join(broadcast(regs),
        probes("rj.r") === regs("r") && probes("rj.j") === regs("j"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("reg")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  val q116Sql: String = {
    val cellRows = (0 until CmsDepth)
      .map(r => s"SELECT $r AS r, ${cmsCellSql(r, "h")} AS j, tok FROM wh")
      .mkString(" UNION ALL ")
    val probeRows = (0 until CmsDepth)
      .map(r => s"SELECT tok, exact_cnt, $r AS r, ${cmsCellSql(r, "h")} AS j FROM top")
      .mkString(" UNION ALL ")
    s"""
    WITH toks AS (SELECT unnest(${Sql.words}) AS tok FROM documents),
    wh AS MATERIALIZED (SELECT tok, ${Sql.hash32("tok")} AS h FROM toks),
    regs AS (SELECT r, j, CAST(count(*) AS BIGINT) AS reg
             FROM ($cellRows) GROUP BY r, j),
    top AS (SELECT tok, h, CAST(count(*) AS BIGINT) AS exact_cnt
            FROM wh GROUP BY tok, h
            ORDER BY exact_cnt DESC, tok LIMIT $TopK)
    SELECT p.tok, p.exact_cnt,
      CAST(min(g.reg) AS BIGINT) AS cms_est,
      CAST(min(g.reg) - p.exact_cnt AS BIGINT) AS overcount
    FROM ($probeRows) p JOIN regs g ON p.r = g.r AND p.j = g.j
    GROUP BY p.tok, p.exact_cnt
    ORDER BY p.exact_cnt DESC, p.tok"""
  }

  // ---------------------------------------------------------------------
  // q117 — HyperLogLog distinct registers
  // ---------------------------------------------------------------------

  /** HLL geometry — aliased from the shared kernel so the oracle SQL and
    * the Spark arithmetic can never diverge. */
  val HllB = graft.operators.HllSketch.B
  val HllM = graft.operators.HllSketch.M
  val HllRem = graft.operators.HllSketch.Rem
  val HllAlphaScaled = graft.operators.HllSketch.AlphaScaled

  /** Per-(source, shingle) rows with HLL bucket index and leading-zero
    * rank — the stream both the batch register build (q117) and the
    * incremental fold (q120) consume. Kernel: [[graft.operators.HllSketch]]
    * (one arithmetic shared with the streaming maintenance loop). */
  private def hllRanked(spark: SparkSession, d: String): DataFrame =
    graft.operators.HllSketch.ranked(
      Tables.documents(spark, d).select(col("doc_id"), col("source"), col("text")))

  private def hllFinish(regs: DataFrame, exact: DataFrame): DataFrame =
    graft.operators.HllSketch.finish(regs, exact)

  /** HLL distinct 3-gram shingles per source. Register build is a
    * per-(source, bucket) MAX of the leading-zero rank — commutative, so
    * map-side combine leaves <= m rows per group per task; the register
    * fold and the integer estimate
    * (floor(alpha * m^2 * 2^HllRem / Z_scaled)) are exact on both engines
    * (rank via the cross-engine-exact length(bin(n)) idiom — no libm in
    * the gate). The exact-distinct column is the truth gate: at 100 TB
    * you'd keep only the 64 registers per group. */
  def q117(spark: SparkSession, d: String): DataFrame = {
    val ranked = hllRanked(spark, d)
    val regs = ranked.groupBy(col("source"), col("idx"))
      .agg(max(col("rho")).as("m"))
    val exact = ranked.groupBy(col("source"))
      .agg(countDistinct(col("s")).as("exact_distinct"))
    hllFinish(regs, exact)
  }

  /** q120 — INCREMENTAL sketch maintenance: the corpus arrives as three
    * disjoint deltas (doc_id mod 3), each builds its own register table,
    * and the tables max-merge into the final state — which must equal the
    * single-pass batch registers bit-for-bit, because HLL registers form
    * a commutative idempotent monoid under element-wise MAX. That
    * identity IS the oracle: the SQL is q117's single-pass replay, so the
    * gate proves fold == recompute (the q55 discipline, applied to
    * sketches). At 100 TB this is the daily-ingest path: per-delta
    * register tables are m rows per group, the merge never touches old
    * raw data, and a KeyedStore-style persisted fold keys on
    * (source, idx) with MAX as the combine. */
  def q120(spark: SparkSession, d: String): DataFrame = {
    val ranked = hllRanked(spark, d)
    val deltaRegs = (0 until 3).map { i =>
      ranked.filter(col("doc_id") % 3 === i)
        .groupBy(col("source"), col("idx")).agg(max(col("rho")).as("m"))
    }
    val merged = deltaRegs.reduce(_ union _)
      .groupBy(col("source"), col("idx")).agg(max(col("m")).as("m"))
    // the truth column stays a single exact pass (it exists to gate the
    // estimate, not the fold)
    val exact = ranked.groupBy(col("source"))
      .agg(countDistinct(col("s")).as("exact_distinct"))
    hllFinish(merged, exact)
  }

  val q117Sql: String = {
    val zScale = 1L << (HllRem + 1)
    val estNum = HllAlphaScaled * (HllM.toLong * HllM * (zScale / (1L << 20)))
    s"""
    WITH sh AS (${Sql.shBase}),
    ex AS (SELECT source, unnest(sh) AS s FROM sh),
    hb AS (SELECT source, s,
        ((${Hashing.MinhashA(4)} * s + ${Hashing.MinhashB(4)}) % ${Sql.P}) % 4294967296 AS h2
      FROM ex),
    rk AS (SELECT source, s,
        CAST(h2 // ${1L << HllRem} AS BIGINT) AS idx,
        CASE WHEN h2 % ${1L << HllRem} = 0 THEN ${HllRem + 1}
             ELSE ${HllRem + 1} - length(bin(h2 % ${1L << HllRem})) END AS rho
      FROM hb),
    regs AS (SELECT source, idx, CAST(max(rho) AS BIGINT) AS m
             FROM rk GROUP BY source, idx),
    folded AS (SELECT source,
        CAST(count(*) AS BIGINT) AS n_present,
        CAST(sum(CAST(2 ** (${HllRem + 1} - m) AS BIGINT)) AS BIGINT) AS z_present
      FROM regs GROUP BY source),
    est AS (SELECT source, n_present,
        z_present + ($HllM - n_present) * $zScale AS z_scaled
      FROM folded),
    exact AS (SELECT source, CAST(count(DISTINCT s) AS BIGINT) AS exact_distinct
              FROM rk GROUP BY source)
    SELECT e.source, x.exact_distinct, e.n_present,
      CAST(e.z_scaled AS BIGINT) AS z_scaled,
      CAST($estNum // e.z_scaled AS BIGINT) AS hll_est
    FROM est e JOIN exact x ON e.source = x.source
    ORDER BY e.source"""
  }

  // ---------------------------------------------------------------------
  // q123 — histogram quantile sketch (order statistics)
  // ---------------------------------------------------------------------

  /** Histogram geometry: equi-width bins per group over [min, max]. */
  val HistBins = 64L
  /** Quantiles under test, in basis points. */
  val HistQuantilesBp = Seq(2500L, 5000L, 7500L, 9000L)

  /** q123 — quantile estimation from a mergeable equi-width histogram,
    * completing the sketch triad (CMS = frequencies, HLL = distinct,
    * histogram = order statistics): per (returnflag, bin) counts are
    * commutative SUMs — map-side combined, <= groups x (bins+1) rows per
    * task at any scale — and the quantile read is pure integer
    * interpolation over the tiny register table (est = bin_lo +
    * offset*width DIV bin_count). The exact-kth-value column is the truth
    * gate (a per-group sort — the expensive path the sketch replaces; at
    * 100 TB you'd keep only the registers and the two-scalar bounds).
    * Prices are exact integer cents; bounds come from one tiny
    * min/max agg that broadcasts back. */
  def q123(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, d).select(
      col("l_returnflag").as("rf"),
      round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    val bounds = li.groupBy(col("rf")).agg(
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      .withColumn("width", expr(s"(mx - mn) DIV $HistBins + 1"))
    val binned = li.join(broadcast(bounds), Seq("rf"))
      .withColumn("bin", expr("(cents - mn) DIV width"))
    val regs = binned.groupBy(col("rf"), col("bin"))
      .agg(count(lit(1)).as("cnt"), max(col("mn")).as("mn"),
        max(col("width")).as("width"))
    val wCum = Window.partitionBy(col("rf")).orderBy(col("bin"))
    val cum = regs
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("rf"))))
    val qs = HistQuantilesBp.map(q => lit(q)) // 4 quantile rows
    val targets = cum.crossJoin(
        spark.range(HistQuantilesBp.size).select(
          element_at(array(qs: _*), col("id").cast("int") + 1).as("q_bp")))
      .withColumn("k", expr("(q_bp * n + 9999) DIV 10000"))
    val wPick = Window.partitionBy(col("rf"), col("q_bp")).orderBy(col("bin"))
    val est = targets.filter(col("cum") >= col("k"))
      .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
      .withColumn("est_cents",
        expr("mn + bin * width + ((k - (cum - cnt) - 1) * width) DIV cnt"))
      .select(col("rf"), col("q_bp"), col("n"), col("k"), col("est_cents"))
    val wRank = Window.partitionBy(col("rf")).orderBy(col("cents"))
    val ranked = li.withColumn("rn", row_number().over(wRank))
    // est and ranked both descend from li — alias before the self-join
    est.as("e").join(ranked.as("r"),
        col("e.rf") === col("r.rf") && col("e.k") === col("r.rn"))
      .select(col("e.rf").as("rf"), col("e.q_bp").as("q_bp"),
        col("e.n").as("n"), col("e.est_cents").as("est_cents"),
        col("r.cents").as("exact_cents"))
      .orderBy(col("rf"), col("q_bp"))
  }

  val q123Sql: String = s"""
    WITH li AS (SELECT l_returnflag AS rf,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
    bounds AS (SELECT rf, min(cents) AS mn, max(cents) AS mx,
        (max(cents) - min(cents)) // $HistBins + 1 AS width
      FROM li GROUP BY rf),
    binned AS (SELECT li.rf, cents, mn, width, (cents - mn) // width AS bin
      FROM li JOIN bounds ON li.rf = bounds.rf),
    regs AS (SELECT rf, bin, CAST(count(*) AS BIGINT) AS cnt,
        max(mn) AS mn, max(width) AS width
      FROM binned GROUP BY rf, bin),
    cum AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY rf ORDER BY bin) AS BIGINT) AS cum,
        CAST(sum(cnt) OVER (PARTITION BY rf) AS BIGINT) AS n
      FROM regs),
    targets AS (SELECT cum.*, q.q_bp, (q.q_bp * n + 9999) // 10000 AS k
      FROM cum CROSS JOIN (SELECT unnest([${HistQuantilesBp.mkString(", ")}]) AS q_bp) q),
    est AS (SELECT rf, q_bp, n, k,
        CAST(mn + bin * width + ((k - (cum - cnt) - 1) * width) // cnt AS BIGINT) AS est_cents
      FROM (SELECT *, row_number() OVER (PARTITION BY rf, q_bp ORDER BY bin) AS rn
            FROM targets WHERE cum >= k)
      WHERE rn = 1),
    ranked AS (SELECT rf, cents, row_number() OVER (PARTITION BY rf ORDER BY cents) AS rn
      FROM li)
    SELECT e.rf, CAST(e.q_bp AS BIGINT) AS q_bp, e.n, e.est_cents, r.cents AS exact_cents
    FROM est e JOIN ranked r ON e.rf = r.rf AND e.k = r.rn
    ORDER BY e.rf, e.q_bp"""

  // ---------------------------------------------------------------------
  // q179 — Misra-Gries heavy hitters with exact recount

  private val MgK = 40

  /** q179 — corpus heavy hitters via Misra-Gries candidate pruning
    * ([[graft.operators.MisraGries]], constant k-1-counter state per task)
    * followed by an EXACT recount of the <= k-1 survivors. MG guarantees
    * every token with frequency > n/k is retained by the one-pass prune,
    * so filtering the recount at that threshold reproduces the true
    * heavy-hitter set — the oracle is a plain GROUP BY/HAVING, and the
    * result is independent of the sketch's (bounded) undercount. Where
    * q116's CMS answers point queries on a fixed hash grid, MG answers
    * "which items are frequent" without enumerating the vocabulary: the
    * full-corpus groupBy shuffles every distinct token; this shuffles only
    * the <= k-1 candidates' partial counts. */
  def q179(spark: SparkSession, d: String): DataFrame = {
    // explode_outer: exempt from InferFiltersFromGenerate, so the tokens()
    // regex chain is not duplicated into a pushed-down size() filter;
    // identical rows because null/empty arrays are filtered right after.
    // cached: three passes read this (MG summarize, total count, recount) —
    // uncached, each re-tokenizes the whole corpus (the repeated-pass
    // discipline; bench isolation clears it between queries)
    val toks = Tables.documents(spark, d)
      .select(explode_outer(Text.tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull)
      .cache()
    val candidates = graft.operators.MisraGries.summarize(toks, MgK).map(_._1)
    val n = toks.count()
    toks.filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * MgK > n)
      .select(col("tok"), col("cnt").cast(LongType).as("cnt"),
        floor(col("cnt") * 1000d / n).cast(LongType).as("share_pm"))
      .orderBy(col("tok"))
  }

  val q179Sql: String = s"""
    WITH toks AS (
      SELECT unnest(${Sql.words}) AS tok FROM documents
      WHERE length(${Sql.norm}) > 0
    ), tot AS (SELECT count(*) AS n FROM toks)
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
      CAST(floor(count(*) * 1000.0 / n) AS BIGINT) AS share_pm
    FROM toks, tot GROUP BY tok, n HAVING count(*) * $MgK > n
    ORDER BY tok"""

  // ---------------------------------------------------------------------
  // q190 — exact order statistics by domain binary search

  /** q190 — EXACT median/p90/p99 of the cent-quantized lineitem price via
    * [[graft.operators.DistributedSelect]]: log2(domain) map-side counting
    * passes over a cached column instead of a global sort (the q123
    * histogram sketch's exact companion — sketch for many approximate
    * quantiles in one pass, domain search for one exact rank in ~24).
    * The oracle sorts, the engine never does. */
  def q190(spark: SparkSession, d: String): DataFrame = {
    val v = Tables.lineitem(spark, d)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"))
      .cache()
    val n = v.count()
    // one synchronized search: all three ranks share each round's scan
    val Seq(med, p90, p99) = graft.operators.DistributedSelect.kthMulti(v,
      Seq((n + 1) / 2, (9 * n + 9) / 10, (99 * n + 99) / 100))
    v.unpersist()
    spark.range(1).select(lit(n).as("n"), lit(med).as("median_cents"),
      lit(p90).as("p90_cents"), lit(p99).as("p99_cents"))
  }

  val q190Sql: String = """
    WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 AS cents FROM lineitem),
    nn AS (SELECT count(*) AS n FROM v),
    ranked AS (SELECT cents, row_number() OVER (ORDER BY cents) AS r FROM v)
    SELECT n,
      (SELECT cents FROM ranked, nn WHERE r = (n + 1) // 2) AS median_cents,
      (SELECT cents FROM ranked, nn WHERE r = (9 * n + 9) // 10) AS p90_cents,
      (SELECT cents FROM ranked, nn WHERE r = (99 * n + 99) // 100) AS p99_cents
    FROM nn"""

  /** q192 — per-SOURCE exact median document length via the group-wise
    * domain search ([[graft.operators.DistributedSelect.groupKth]]): all
    * sources share each round's counting scan (broadcast midpoints +
    * one map-side-combinable conditional count), so the whole report
    * costs log2(length domain) scans — no per-source sort, no
    * partitionBy(source) window concentrating each source in one
    * partition. The corpus-relative length reference a per-source
    * filtering policy is calibrated against. */
  def q192(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val lens = Tables.documents(spark, d)
      .select(col("source"), Text.tokenCount(col("text")).cast(LongType).as("ntok"))
      .where(col("ntok") > 0)
      .cache()
    val ns = lens.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val med = graft.operators.DistributedSelect.groupKth(
      lens, ns.map { case (s, n) => s -> ((n + 1) / 2) })
    lens.unpersist()
    med.toSeq.map { case (s, m) => (s, ns(s), m) }
      .toDF("source", "n_docs", "median_tokens")
      .orderBy(col("source"))
  }

  val q192Sql: String = s"""
    WITH lens AS (
      SELECT source, CAST(len(${Sql.words}) AS BIGINT) AS ntok FROM documents
    ), nz AS (SELECT source, ntok FROM lens WHERE ntok > 0),
    ranked AS (
      SELECT source, ntok,
        row_number() OVER (PARTITION BY source ORDER BY ntok) AS r,
        count(*) OVER (PARTITION BY source) AS n
      FROM nz)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
      CAST(ntok AS BIGINT) AS median_tokens
    FROM ranked WHERE r = (n + 1) // 2 ORDER BY source"""

  val defs: Map[String, Q] = Map(
    "q190_exact_percentiles" -> (q190 _),
    "q192_source_median" -> (q192 _),
    "q179_mg_heavy_hitters" -> (q179 _),
    "q123_histogram_quantiles" -> (q123 _),
    "q116_cms_topk" -> (q116 _),
    "q117_hll_distinct" -> (q117 _),
    "q120_incremental_hll" -> (q120 _))

  val oracles: Map[String, String] = Map(
    "q190_exact_percentiles" -> q190Sql,
    "q192_source_median" -> q192Sql,
    "q179_mg_heavy_hitters" -> q179Sql,
    "q123_histogram_quantiles" -> q123Sql,
    "q116_cms_topk" -> q116Sql,
    "q117_hll_distinct" -> q117Sql,
    // q120's oracle IS q117's single-pass SQL: the fold must equal the
    // batch computation (register MAX-merge is a commutative idempotent
    // monoid) — fold == recompute, gated bit-for-bit
    "q120_incremental_hll" -> q117Sql)
}
