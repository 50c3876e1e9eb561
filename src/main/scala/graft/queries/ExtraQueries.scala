package graft.queries

import graft.Tables
import graft.functions.Text
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Additional SQL-surface + pipeline coverage: CUBE grouping sets, exact
  * percentiles, generator (explode) aggregation, top-k ANN, and the
  * multimodal binary feature path under oracle. */
object ExtraQueries {

  type Q = (SparkSession, String) => DataFrame
  private val dec2 = DecimalType(12, 2)

  /** CUBE over (segment x order status): all four grouping sets in one
    * pass (map-side partial aggregation handles the fan-out). */
  def q08(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d).select(col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast(dec2).as("price"))
    val c = Tables.customer(spark, d).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price")).cast("double").as("sum_price"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("segment"), col("status"))
  }

  val q08Sql: String = """
    SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      coalesce(o_orderstatus, 'ALL') AS status,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    ORDER BY segment, status"""

  /** Exact interpolated percentiles per event type (both engines use the
    * p*(n-1) linear-interpolation definition over exact doubles). */
  def q09(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d)
      .select(col("event_type"), col("value").cast(dec2).cast("double").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(v, 0.5)").as("median_value"),
        expr("percentile(v, 0.9)").as("p90_value"))
      .orderBy(col("event_type"))
  }

  val q09Sql: String = """
    SELECT event_type, count(*) AS n,
      quantile_cont(v, 0.5) AS median_value,
      quantile_cont(v, 0.9) AS p90_value
    FROM (SELECT event_type, CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS v FROM events)
    GROUP BY event_type ORDER BY event_type"""

  /** Generator surface (G3/G4): explode tokens -> global top-20 vocabulary.
    * The explode is map-side; one shuffle aggregates counts. */
  def q26(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(explode(Text.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  val q26Sql: String = """
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
          FROM documents)
    GROUP BY word ORDER BY n DESC, word LIMIT 20"""

  /** Top-3 neighbors per query vector (rank windows over the broadcast-join
    * scores — the k>1 ANN surface). */
  def q33(spark: SparkSession, d: String): DataFrame = {
    val quantized = (c: org.apache.spark.sql.Column) =>
      transform(c, x => floor(x.cast("double") * 1000000d).cast(LongType))
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), quantized(col("embedding")).as("qv"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv").as("qv_q"))
    val scored = emb.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.Vectors.dotLong(col("qv_q"), col("qv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("score"))
      .orderBy(col("query_id"), col("rk"))
  }

  val q33Sql: String = """
    WITH q AS (SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS cv
          FROM embeddings WHERE vec_id >= 5),
    scored AS (SELECT query_id, neighbor_id,
        CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) AS BIGINT) AS score
      FROM q CROSS JOIN c),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk
               FROM scored)
    SELECT query_id, rk, neighbor_id, score FROM ranked WHERE rk <= 3
    ORDER BY query_id, rk"""

  /** Multimodal plumbing under oracle: text payload -> binary media column
    * -> partition-wise executor feature extraction (REAL mapPartitions with
    * per-partition digest reuse) -> (size, md5). The oracle recomputes from
    * the source text — byte-level identity across the binary path. */
  def q50(spark: SparkSession, d: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.parallel(Tables.documents(spark, d)).select(col("doc_id"), col("text")),
      "text", "text/plain")
    Multimodal.extractFeatures(media).toDF()
      .select(col("doc_id"), col("n_bytes"), col("md5_hex"))
      .orderBy(col("doc_id"))
  }

  val q50Sql: String = """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS md5_hex
    FROM documents ORDER BY doc_id"""

  /** Exact distinct cardinalities per event type (count-distinct shuffle
    * surface). */
  def q27(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("user_id"), col("event_id")).as("n_user_events"))
      .orderBy(col("event_type"))
  }

  val q27Sql: String = """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
      count(DISTINCT (user_id, event_id)) AS n_user_events
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** Sketch surface: HyperLogLog distinct + quantile sketch. Raw estimates
    * are engine-specific (DuckDB's HLL ≠ Spark's), so the ORACLE-VISIBLE
    * columns are (a) the exact distinct count, recomputable anywhere, and
    * (b) booleans asserting each sketch landed inside its error envelope —
    * the oracle emits literal TRUE, so a sketch drifting out of tolerance
    * hash-fails the gate instead of hiding behind "no oracle".
    * Envelopes: rsd=0.02 HLL gets 3-sigma = 6%; the rank-error median
    * sketch must land between the exact (interpolated) p45 and p55 values
    * — valid for groups of ~12+ rows, where any element whose rank is
    * within the sketch's error of the median lies inside that band. For
    * smaller groups the interpolated band can contain NO actual element
    * (n=2 with values {1,100}: band is [23.3, 55.7], the sketch correctly
    * returns 1), so tiny groups fall back to the [min, max] band. */
  def q28(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).cast("bigint").as("exact_users"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_median"),
        expr("percentile(value, array(0.45, 0.55))").as("band"),
        count(lit(1)).as("n"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
      .select(
        col("event_type"),
        col("exact_users"),
        (abs(col("approx_users").cast("double") - col("exact_users")) <=
          col("exact_users") * lit(0.06)).as("users_ok"),
        (col("approx_median").between(
            element_at(col("band"), 1), element_at(col("band"), 2)) ||
          (col("n") < 16 &&
            col("approx_median").between(col("vmin"), col("vmax")))).as("median_ok"))
      .orderBy(col("event_type"))
  }

  val q28Sql: String = """
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
      TRUE AS users_ok, TRUE AS median_ok
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** As-of join surface: each purchase event gets the latest strictly
    * preceding click of the same user (sessionization lookup). One shuffle
    * on user_id via the union+window composition in `operators.AsofJoin`. */
  def q34(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.events(spark, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms"))
    graft.operators.AsofJoin.asof(purchases, clicks,
        keyCols = Seq("user_id"), leftTs = "ts_ms", rightTs = "ts_ms",
        payload = Seq("ts_ms"))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("asof_ts_ms"),
        (col("ts_ms") - col("asof_ts_ms")).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  val q34Sql: String = """
    WITH base AS (SELECT event_id, user_id, event_type,
        epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events)
    SELECT p.event_id, p.user_id, p.ts_ms,
      (SELECT max(c.ts_ms) FROM base c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts_ms < p.ts_ms) AS asof_ts_ms,
      p.ts_ms - (SELECT max(c.ts_ms) FROM base c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts_ms < p.ts_ms) AS gap_ms
    FROM base p WHERE p.event_type = 'purchase'
    ORDER BY p.event_id"""

  /** G2 under oracle: per-brand price-list JSON documents are built from
    * `part`, run through the real nested-expansion operator
    * (`AwsPricing.expand` — from_json + three explodes), and the oracle
    * recomputes the flat rate rows straight from the table. */
  def q35(spark: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(spark, d).filter(col("p_partkey") <= 200)
    val products = parts.groupBy(col("p_brand")).agg(
      map_from_entries(collect_list(struct(
        concat(lit("SKU-"), col("p_partkey")).as("k"),
        struct(concat(lit("SKU-"), col("p_partkey")).as("sku"),
          col("p_type").as("productFamily"),
          map(lit("size"), col("p_size").cast("string")).as("attributes")).as("v"))))
        .as("products"),
      map_from_entries(collect_list(struct(
        concat(lit("SKU-"), col("p_partkey")).as("k"),
        map(lit(concat(lit("SKU-"), col("p_partkey"), lit(".T1"))),
          struct(lit("T1").as("offerTermCode"),
            concat(lit("SKU-"), col("p_partkey")).as("sku"),
            lit("2024-01-01").as("effectiveDate"),
            map(lit(concat(lit("SKU-"), col("p_partkey"), lit(".T1.R1"))),
              struct(concat(lit("SKU-"), col("p_partkey"), lit(".T1.R1")).as("rateCode"),
                lit("per unit").as("description"),
                lit("0").as("beginRange"), lit("Inf").as("endRange"),
                lit("Units").as("unit"),
                map(lit("USD"), col("p_retailprice").cast("decimal(12,2)").cast("string"))
                  .as("pricePerUnit"),
                array().cast("array<string>").as("appliesTo"))).as("priceDimensions")))
          .as("v")))).as("by_sku"))
      .select(col("p_brand"),
        to_json(struct(lit("2024-06-01T00:00:00Z").as("publicationDate"),
          lit("1").as("version"), col("products"),
          struct(col("by_sku").as("OnDemand")).as("terms"))).as("json"))
    graft.replicators.AwsPricing.expand(products.select(col("json")))
      .select(col("rate_code"), col("sku"), col("product_family"),
        col("price_per_unit_currency"),
        col("price_per_unit_amount").cast("double").as("price_per_unit_amount"),
        col("term_type"))
      .orderBy(col("rate_code"))
  }

  val q35Sql: String = """
    SELECT 'SKU-' || p_partkey || '.T1.R1' AS rate_code,
      'SKU-' || p_partkey AS sku,
      p_type AS product_family,
      'USD' AS price_per_unit_currency,
      CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_per_unit_amount,
      'OnDemand' AS term_type
    FROM part WHERE p_partkey <= 200
    ORDER BY rate_code"""

  /** Gap-based sessionization: a session starts when a user's inter-event
    * gap exceeds 30 minutes; per-user session ids via a running sum of
    * session-start flags — two window passes, one shuffle. */
  def q36(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val flagged = e.withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
      .withColumn("is_start",
        (col("prev_ts").isNull || (col("ts_ms") - col("prev_ts") > 1800000L)).cast("int"))
    flagged.withColumn("session_idx",
        sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q36Sql: String = """
    WITH base AS (SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events),
    flagged AS (SELECT *,
        CASE WHEN lag(ts_ms) OVER w IS NULL
          OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_start
      FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
    sess AS (SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM flagged)
    SELECT user_id, session_idx, count(*) AS n_events,
      min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms
    FROM sess GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx"""

  /** q184 — fuzzy (edit-distance <= 3) self-join over part names WITHOUT
    * an all-pairs comparison: deletion-neighborhood blocking (FastSS
    * family). Candidates are pairs sharing any <=3-deletion variant —
    * COMPLETE for Levenshtein <= 3, because an optimal alignment yields a
    * common string reachable from each side by deleting at most the
    * alignment's edited positions — then verified by exact levenshtein.
    * The oracle is the brute-force all-pairs join, so the gate proves the
    * blocking lost nothing. Signature count is O(len^3) per NAME (the
    * distinct-name table, usually dictionary-sized), never pairs-of-names;
    * the join shuffles (variant, name) rows only — the entity-resolution
    * shape that survives a billion-row record table with a bounded
    * dictionary. */
  def q184(spark: SparkSession, d: String): DataFrame =
    fuzzyNameStages(
      Tables.part(spark, d).select(col("p_name").as("name")).distinct())._3
      .orderBy(col("name_a"), col("name_b"))

  /** q184's blocking pipeline over an arbitrary distinct-name frame,
    * exposed so the ER scale sidecar can record the per-stage volumes the
    * design claim is about (signatures and candidates track the NAME
    * DICTIONARY, never the record table): returns
    * (deletion-neighborhood signatures, candidate pairs, verified pairs). */
  private[graft] def fuzzyNameStages(names: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val del = "transform(sequence(1, length(variant)), i -> " +
      "concat(substring(variant, 1, i - 1), substring(variant, i + 1, length(variant))))"
    def expand(v: DataFrame): DataFrame = v
      .select(col("name"), explode_outer(expr(del)).as("variant"))
      .filter(col("variant").isNotNull)
    val d0 = names.select(col("name"), col("name").as("variant"))
    val d1 = expand(d0)
    val d2 = expand(d1)
    val sigs = d0.union(d1).union(d2).union(expand(d2)).distinct()
    val cands = sigs.select(col("variant"), col("name").as("name_a"))
      .join(sigs.select(col("variant"), col("name").as("name_b")), Seq("variant"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"))
      .distinct()
    // banded verify (graft.functions.expressions.LevenshteinWithin):
    // exact for dist <= 3 — the only distances the filter keeps — and
    // O(k*len) with early exit instead of the full O(len^2) DP per
    // candidate, which is what the verify leg costs at a
    // millions-of-names dictionary
    val verified = cands
      .withColumn("dist",
        graft.functions.expressions.LevenshteinWithin(
          col("name_a"), col("name_b"), 3))
      .filter(col("dist") <= 3)
    (sigs, cands, verified)
  }

  val q184Sql: String = """
    WITH p AS (SELECT DISTINCT p_name AS name FROM part)
    SELECT a.name AS name_a, b.name AS name_b,
      CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM p a JOIN p b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 3
    ORDER BY name_a, name_b"""

  /** q191 — entity resolution CAPSTONE: canonical entity ids over the
    * fuzzy-match graph. q184's deletion-neighborhood pairs become edges;
    * `DupClusters.assignStar` contracts them to connected components in
    * O(log^2 n) rounds (name-variant chains are exactly the chainy-graph
    * case star contraction exists for: A~B~C where A!~C). Each name maps
    * to its component's lexicographic minimum — the survivorship rule of
    * a dedup/ER pipeline. Oracle: recursive-CTE closure over the
    * all-pairs edge list. String ids ride through the contraction
    * unchanged (min/least on strings is the same total order in both
    * engines for ASCII names). */
  def q191(spark: SparkSession, d: String): DataFrame = {
    val pairs = q184(spark, d).select(col("name_a").as("doc_a"), col("name_b").as("doc_b"))
    graft.operators.DupClusters.assignStar(pairs)
      .select(col("doc_id").as("name"), col("cluster_id").as("canonical"))
      .orderBy(col("name"))
  }

  val q191Sql: String = """
    WITH RECURSIVE p AS (SELECT DISTINCT p_name AS name FROM part),
    pairs AS (
      SELECT a.name AS name_a, b.name AS name_b FROM p a JOIN p b
      ON a.name < b.name AND levenshtein(a.name, b.name) <= 3),
    edges AS (SELECT name_a AS u, name_b AS v FROM pairs
              UNION ALL SELECT name_b, name_a FROM pairs),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u)
    SELECT u AS name, min(r) AS canonical FROM reach GROUP BY u ORDER BY name"""

  /** q185 — trailing-window anomaly detection over the event stream: an
    * event is anomalous when its value sits more than two standard
    * deviations above/below the mean of the user's previous 10 events
    * (at least 5 of history). The z-score test is kept in INTEGER
    * arithmetic by clearing denominators — (n*v - s)^2 > 4*(n*q - s^2)
    * with cent-quantized values, trailing sum s and sum-of-squares q —
    * so no sqrt/float variance surface exists. Per-user row-frame
    * windows: the shuffle is keyed by user_id (high cardinality), never
    * a global order. */
  def q185(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d).select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("ts_ms"),
      (col("value").cast(dec2) * 100).cast(LongType).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(-10, -1)
    e.withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("q", sum(col("v") * col("v")).over(w))
      .filter(col("n") >= 5 &&
        (col("n") * col("v") - col("s")) * (col("n") * col("v") - col("s")) >
          lit(4L) * (col("n") * col("q") - col("s") * col("s")))
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("v"),
        col("n").cast(LongType).as("hist_n"))
      .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
  }

  val q185Sql: String = """
    WITH base AS (
      SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      FROM events),
    stats AS (
      SELECT *, count(*) OVER w AS n, sum(v) OVER w AS s,
        sum(v * v) OVER w AS q
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id, ts_ms, v, CAST(n AS BIGINT) AS hist_n
    FROM stats
    WHERE n >= 5 AND (n*v - s) * (n*v - s) > 4 * (n*q - s*s)
    ORDER BY user_id, ts_ms, event_id"""

  /** q187 — k-anonymity audit (privacy governance, the release-gate
    * counterpart of q165's PII linkage): group the customer table by its
    * quasi-identifier tuple (nation, market segment, account-balance
    * bucket) and report every equivalence class smaller than k=5 — the
    * classes where a joined external dataset could re-identify members.
    * Bucketing is integer (cents DIV 100000), never a float division whose
    * floor could straddle engines. One map-side-combinable aggregation;
    * output is bounded by the quasi-identifier domain, not the table. */
  def q187(spark: SparkSession, d: String): DataFrame = {
    Tables.customer(spark, d)
      .select(col("c_nationkey").cast(LongType).as("nation"),
        col("c_mktsegment").as("segment"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100000")
          .as("bal_bucket"))
      .groupBy(col("nation"), col("segment"), col("bal_bucket"))
      .agg(count(lit(1)).cast(LongType).as("n"))
      .filter(col("n") < 5)
      .orderBy(col("nation"), col("segment"), col("bal_bucket"))
  }

  val q187Sql: String = """
    SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
      CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000 AS bal_bucket,
      CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY 1, 2, 3 HAVING count(*) < 5
    ORDER BY nation, segment, bal_bucket"""

  /** q193 — time-decayed trending scores: per event type, the sum of
    * cent-quantized values halved once per day of age (half-life = 1 day,
    * anchored at the table's max timestamp). The decay is EXACT integer
    * arithmetic — v DIV 2^age_days, with 2^age exact in a double up to
    * 2^52 and the age capped at 62 — so no float decay product ever
    * enters the sum. Map-side: one broadcast max-ts scalar, one
    * map-side-combinable aggregate; the recency-weighted popularity
    * signal a feed ranker or trending report starts from. */
  def q193(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d).select(col("event_type"),
      unix_millis(col("ts")).as("ts_ms"),
      (col("value").cast(dec2) * 100).cast(LongType).as("v"))
    val mx = e.agg(max(col("ts_ms")).as("mx"))
    e.crossJoin(broadcast(mx))
      .withColumn("age_d", expr("least((mx - ts_ms) DIV 86400000, 62)"))
      .withColumn("dv", expr("v DIV CAST(pow(2.0D, age_d) AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(sum(col("dv")).cast(LongType).as("decayed_score"),
        count(lit(1)).cast(LongType).as("n_events"))
      .orderBy(col("event_type"))
  }

  val q193Sql: String = """
    WITH base AS (
      SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      FROM events),
    mx AS (SELECT max(ts_ms) AS mx FROM base)
    SELECT event_type,
      CAST(sum(v // CAST(power(2, least((mx - ts_ms) // 86400000, 62)) AS BIGINT))
        AS BIGINT) AS decayed_score,
      CAST(count(*) AS BIGINT) AS n_events
    FROM base, mx GROUP BY event_type ORDER BY event_type"""

  /** Table profiling (data-quality QA): row count, per-column null and
    * distinct cardinalities, numeric bounds — one aggregation pass. */
  def q67(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).agg(
      count(lit(1)).as("n_rows"),
      count(col("props")).as("props_nonnull"),
      countDistinct(col("event_type")).as("event_type_distinct"),
      countDistinct(col("user_id")).as("user_id_distinct"),
      min(col("value").cast(dec2)).cast("double").as("value_min"),
      max(col("value").cast(dec2)).cast("double").as("value_max"),
      sum(col("value").cast(dec2)).cast("double").as("value_sum"))
  }

  val q67Sql: String = """
    SELECT count(*) AS n_rows,
      count(props) AS props_nonnull,
      count(DISTINCT event_type) AS event_type_distinct,
      count(DISTINCT user_id) AS user_id_distinct,
      CAST(min(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_min,
      CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_max,
      CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
    FROM events"""

  /** The streaming windowed aggregation (EventAggregates) as a batch plan
    * under oracle: daily tumbling windows per event type. The same code
    * serves `readStream` with a watermark. */
  def q68(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d).select(col("ts"), col("event_type"), col("value"))
    graft.streaming.EventAggregates
      .windowedTypeStats(e, "1 day", "1 day", "1 hour")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start_ms"), col("event_type"))
  }

  val q68Sql: String = """
    SELECT epoch_ms(date_trunc('day', CAST(ts AS TIMESTAMP))) AS window_start_ms,
      event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2 ORDER BY window_start_ms, event_type"""

  /** Pure interval join (NO equi key): count events falling inside each
    * 5-minute error window. Spark would plan the raw inequality join as
    * BroadcastNestedLoopJoin; [[graft.operators.RangeJoin.pointInInterval]]
    * rewrites it to a binned equi-join + residual filter (bin width = the
    * window span, so each interval lands in at most 2 bins). */
  def q69(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val points = e.select(unix_micros(col("ts")).as("p_us"))
    val windows = e.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"), unix_micros(col("ts")).as("lo_us"),
        (unix_micros(col("ts")) + lit(300000000L)).as("hi_us"))
    graft.operators.RangeJoin
      .pointInInterval(points, "p_us", windows, "lo_us", "hi_us", 300000000L)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("window_id"))
  }

  val q69Sql: String = """
    SELECT w.window_id, count(*) AS n_events
    FROM (SELECT event_id AS window_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS lo_us,
            epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS hi_us
          FROM events WHERE event_type = 'error') w
    JOIN (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS p_us FROM events) e
      ON e.p_us >= w.lo_us AND e.p_us <= w.hi_us
    GROUP BY w.window_id ORDER BY w.window_id"""

  /** Converter surface under oracle (E6/E8/E10/E11/E12/E13/E14/E15): each
    * converter runs over strings built deterministically from `customer`
    * columns, so DuckDB can recompute every result with its own string/
    * regex/date functions — the cross-engine parity check the reference
    * does against live Postgres (`shared_examples_for_columns.rb:3-30`). */
  def q85(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Converters
    val c = Tables.customer(spark, d).select(
      col("c_custkey").cast("long").as("k"),
      col("c_name"), col("c_mktsegment"),
      // phone-shaped multi-part string, derivable in any engine
      format_string("%d-%d-%d", (col("c_custkey") % 90 + 10).cast("long"),
        (col("c_custkey") % 900 + 100).cast("long"),
        (col("c_custkey") % 9000 + 1000).cast("long")).as("phone"))
    val csv = concat_ws("", col("c_mktsegment"), lit(" , "), col("phone"), lit(", ,"))
    val jsonArr = concat(lit("[{\"v\":\""), col("c_mktsegment"),
      lit("\"},{\"v\":\""), col("phone"), lit("\"}]"))
    val dateStr = format_string("%02d-%02d-2020",
      (col("k") % 28 + 1).cast("int"), (col("k") % 12 + 1).cast("int"))
    c.select(
      col("k"),
      Converters.fromRegex(col("c_name"), "([0-9]+)$", LongType).as("name_num"),
      Converters.gsub(col("c_name"), "^Customer#0*", "cust:").as("cust_label"),
      array_join(Converters.commaSep(csv), "|").as("seg_items"),
      Converters.arrayElement(col("phone"), "-", 2, DoubleType).as("phone_part"),
      array_join(Converters.arrayPluck(jsonArr, "v"), "|").as("plucked"),
      date_format(Converters.strpdate(dateStr, "dd-MM-yyyy"), "yyyy-MM-dd").as("parsed_date"),
      Converters.mapLookup(col("c_mktsegment"),
        Map("BUILDING" -> "b2b", "AUTOMOBILE" -> "auto")).as("seg_mapped"))
      .orderBy(col("k"))
  }

  val q85Sql: String = """
    WITH c AS (
      SELECT *, printf('%d-%d-%d', c_custkey % 90 + 10, c_custkey % 900 + 100,
        c_custkey % 9000 + 1000) AS phone
      FROM customer)
    SELECT CAST(c_custkey AS BIGINT) AS k,
      CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
      regexp_replace(c_name, '^Customer#0*', 'cust:') AS cust_label,
      array_to_string(list_filter(list_transform(string_split(
        c_mktsegment || ' , ' || phone || ', ,', ','), x -> trim(x)), x -> x <> ''), '|')
        AS seg_items,
      CAST(string_split(phone, '-')[3] AS DOUBLE) AS phone_part,
      c_mktsegment || '|' || phone AS plucked,
      strftime(strptime(printf('%02d-%02d-2020',
        CAST(c_custkey % 28 + 1 AS INT), CAST(c_custkey % 12 + 1 AS INT)),
        '%d-%m-%Y'), '%Y-%m-%d') AS parsed_date,
      CASE c_mktsegment WHEN 'BUILDING' THEN 'b2b' WHEN 'AUTOMOBILE' THEN 'auto'
        ELSE c_mktsegment END AS seg_mapped
    FROM c ORDER BY k"""

  /** E4/E5 under oracle: round-trip timestamps/dates through their string
    * forms and the tolerant parse converters (`try_cast` semantics — garbage
    * parses to null, never throws). */
  def q87(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Converters
    val e = Tables.events(spark, d).select(col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso"),
      date_format(col("ts"), "yyyy-MM-dd").as("dstr"))
    e.select(
      col("event_id"),
      unix_millis(Converters.parseTime(col("iso"))).as("parsed_ms"),
      date_format(Converters.parseDate(col("dstr")), "yyyy-MM-dd").as("parsed_date"),
      Converters.parseTime(concat(lit("not-a-time-"), col("iso"))).isNull.as("garbage_is_null"))
      .orderBy(col("event_id"))
  }

  val q87Sql: String = """
    SELECT event_id,
      epoch_ms(strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
        '%Y-%m-%d %H:%M:%S')) AS parsed_ms,
      strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS parsed_date,
      TRUE AS garbage_is_null
    FROM events ORDER BY event_id"""

  /** q205 — retention COHORT matrix over the event stream: users are
    * cohorted by the epoch-week of their first event, and every event
    * lands in the (cohort_week, weeks_since_cohort) cell — the standard
    * "did week-N signups come back in week N+k" product-analytics
    * report. Week = floor(epoch_seconds / 604800) on BOTH engines (a
    * pure integer floor — no calendar/locale week-start semantics to
    * diverge on; both operands are exact in double far below 2^53).
    *
    * Scale shape: one user-keyed aggregate (min week — map-side partial,
    * one shuffle on user_id), a user-keyed join back (same key, so AQE
    * reuses the hash partitioning; the cohort side is |users| rows, not
    * |events|), then a cell-keyed aggregate whose output is
    * weeks x weeks — report-sized. No window, no events x events. */
  def q205(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d).select(
      col("user_id"), col("event_id"),
      floor(unix_timestamp(col("ts")).cast("double") / 604800d)
        .cast("long").as("wk"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    ev.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(col("event_id")).cast("long").as("event_id_sum"))
      .orderBy(col("cohort_wk"), col("wk_offset"))
  }

  val q205Sql: String = """
    WITH e AS (
      SELECT user_id, event_id,
        CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS wk
      FROM events),
    c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
    SELECT c.cohort_wk, e.wk - c.cohort_wk AS wk_offset,
      CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(sum(e.event_id) AS BIGINT) AS event_id_sum
    FROM e JOIN c ON e.user_id = c.user_id
    GROUP BY 1, 2 ORDER BY 1, 2"""

  val defs: Map[String, Q] = Map(
    "q205_retention_cohorts" -> (q205 _),
    "q87_parse_datetime" -> (q87 _),
    "q85_converter_surface" -> (q85 _),
    "q08_cube_segment_status" -> (q08 _),
    "q09_percentiles" -> (q09 _),
    "q26_token_vocabulary" -> (q26 _),
    "q33_ann_top3" -> (q33 _),
    "q50_multimodal_features" -> (q50 _),
    "q27_distinct_counts" -> (q27 _),
    "q28_sketches" -> (q28 _),
    "q34_asof_click_purchase" -> (q34 _),
    "q35_pricing_expand" -> (q35 _),
    "q36_sessionization" -> (q36 _),
    "q184_fuzzy_join" -> (q184 _),
    "q185_event_anomaly" -> (q185 _),
    "q187_k_anonymity" -> (q187 _),
    "q191_entity_clusters" -> (q191 _),
    "q193_decayed_trending" -> (q193 _),
    "q67_table_profile" -> (q67 _),
    "q68_windowed_event_stats" -> (q68 _),
    "q69_interval_join" -> (q69 _))

  val oracles: Map[String, String] = Map(
    "q205_retention_cohorts" -> q205Sql,
    "q87_parse_datetime" -> q87Sql,
    "q85_converter_surface" -> q85Sql,
    "q08_cube_segment_status" -> q08Sql,
    "q09_percentiles" -> q09Sql,
    "q26_token_vocabulary" -> q26Sql,
    "q33_ann_top3" -> q33Sql,
    "q50_multimodal_features" -> q50Sql,
    "q27_distinct_counts" -> q27Sql,
    "q28_sketches" -> q28Sql,
    "q34_asof_click_purchase" -> q34Sql,
    "q35_pricing_expand" -> q35Sql,
    "q36_sessionization" -> q36Sql,
    "q184_fuzzy_join" -> q184Sql,
    "q185_event_anomaly" -> q185Sql,
    "q187_k_anonymity" -> q187Sql,
    "q191_entity_clusters" -> q191Sql,
    "q193_decayed_trending" -> q193Sql,
    "q67_table_profile" -> q67Sql,
    "q68_windowed_event_stats" -> q68Sql,
    "q69_interval_join" -> q69Sql)
}
