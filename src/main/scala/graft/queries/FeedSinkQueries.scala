package graft.queries

import graft.Tables
import graft.operators.{ColumnSpec, Pipeline, Projection, Reconcile, ReplicatorSpec}
import graft.replicators.Replicators
import graft.sources.{AtomXml, Backfiller, Enrichment}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feed/enrichment/retention operators under the oracle gate, closing the
  * remaining ScalaTest-only rows of SURVEY §2:
  *  - q73: S5/G4/U3 — Atom feed parse -> entries -> merge, with a v2 refetch
  *    exercising set-once `row_created_at` and the data-diff update guard;
  *  - q74: S9 — per-partition enrichment lookup + `fromEnrichment` digs;
  *  - q75: R6 — audit retention (truncate old bodies, delete ancient rows);
  *  - q76: S8 — per-parent incremental watermarks as a grouped aggregation.
  */
object FeedSinkQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- q73: atom feed vertical ----

  /** Deterministic Atom feed for customer k; rev > 0 revises entry j=0
    * (new title, updated +30min). */
  private def atomFeed(k: Long, rev: Int): String = {
    val day = 1 + k % 27
    def entry(j: Int): String = {
      val revised = rev > 0 && j == 0
      val hour = j
      val minute = if (revised) 30 else 0
      val title = if (revised) s"Entry $k-$j rev" else s"Entry $k-$j"
      f"""<entry>
         |<id>urn:e-$k-$j</id>
         |<updated>2024-03-$day%02dT$hour%02d:$minute%02d:00Z</updated>
         |<published>2024-03-$day%02dT00:00:00Z</published>
         |<title>$title</title>
         |<georss:point>${k % 90}.5 ${k % 180}.25</georss:point>
         |</entry>""".stripMargin
    }
    s"""<?xml version="1.0"?>
       |<feed xmlns="http://www.w3.org/2005/Atom" xmlns:georss="http://www.georss.org/georss">
       |<title>feed-$k</title>
       |${(0 until 3).map(entry).mkString("\n")}
       |</feed>""".stripMargin
  }

  def q73(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val spec = Replicators.atomSingleFeedV1
    def batch(rev: Int): DataFrame = {
      val entries = Tables.parallel(Tables.customer(spark, d)
        .select(col("c_custkey").cast("long"))).as[Long]
        .flatMap { k =>
          AtomXml.entriesAsJson(atomFeed(k, rev)).zipWithIndex
            .map { case (b, i) => (b, k * 100 + i) }
        }
      entries.toDF("body", Projection.IngestSeqCol)
    }
    val t1 = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), batch(0))
    val t2 = Pipeline.upsertBatch(spec, t1, batch(1)) // full-feed refetch (S5)
    t2.select(
      col("entry_id"),
      unix_millis(col("row_created_at")).as("created_ms"), // set-once: v1 value
      unix_millis(col("updated")).as("updated_ms"),
      unix_millis(col("published")).as("published_ms"),
      col("title"),
      col("geo_lat").cast("double").as("geo_lat"),
      col("geo_lng").cast("double").as("geo_lng"))
      .orderBy(col("entry_id"))
  }

  private val q73Sql: String = """
    WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
    e AS (
      SELECT k, j,
        epoch_ms(TIMESTAMP '2024-03-01 00:00:00') + (k % 27) * 86400000 AS day_ms
      FROM c CROSS JOIN (SELECT unnest(range(3)) AS j) s
    )
    SELECT
      'urn:e-' || k || '-' || j AS entry_id,
      day_ms + j * 3600000 AS created_ms,
      day_ms + j * 3600000 + CASE WHEN j = 0 THEN 1800000 ELSE 0 END AS updated_ms,
      day_ms AS published_ms,
      'Entry ' || k || '-' || j || CASE WHEN j = 0 THEN ' rev' ELSE '' END AS title,
      CAST((k % 90) + 0.5 AS DOUBLE) AS geo_lat,
      CAST((k % 180) + 0.25 AS DOUBLE) AS geo_lng
    FROM e ORDER BY entry_id"""

  // ---- q74: enrichment lookup ----

  private val enrichedSpec = ReplicatorSpec(
    name = "enriched_order_v1",
    remoteKeyCol = "order_id",
    columns = Seq(
      ColumnSpec("order_id", LongType, Seq("id")),
      ColumnSpec("status", StringType, Seq("status")),
      ColumnSpec("tier", StringType, Seq("tier"), fromEnrichment = true),
      ColumnSpec("score", LongType, Seq("score"), fromEnrichment = true)),
    usesEnrichment = true)

  def q74(spark: SparkSession, d: String): DataFrame = {
    val webhooks = Tables.parallel(Tables.orders(spark, d).select(
      concat(lit("""{"id":"""), col("o_orderkey"),
        lit(""","status":""""), col("o_orderstatus"), lit(""""}""")).as("body"),
      col("o_orderkey").cast("long").as(Projection.IngestSeqCol)))
    // the "external service": deterministic per-id lookup; ids divisible by
    // 7 get no enrichment (the tolerated-404 path -> null columns)
    val idRe = """"id":(\d+)""".r
    val enriched = Enrichment.withEnrichment(webhooks, () => body => {
      val id = idRe.findFirstMatchIn(body).map(_.group(1).toLong).get
      if (id % 7 == 0) None
      else Some(s"""{"tier":"${if (id % 3 == 0) "gold" else "basic"}","score":${id % 100}}""")
    })
    Pipeline.upsertBatch(enrichedSpec,
        Pipeline.emptyTarget(enrichedSpec, spark), enriched)
      .select(col("order_id"), col("status"), col("tier"), col("score"))
      .orderBy(col("order_id"))
  }

  private val q74Sql: String = """
    SELECT CAST(o_orderkey AS BIGINT) AS order_id,
      o_orderstatus AS status,
      CASE WHEN o_orderkey % 7 = 0 THEN NULL
           WHEN o_orderkey % 3 = 0 THEN 'gold' ELSE 'basic' END AS tier,
      CASE WHEN o_orderkey % 7 = 0 THEN NULL
           ELSE CAST(o_orderkey % 100 AS BIGINT) END AS score
    FROM orders ORDER BY order_id"""

  // ---- q75: audit retention ----

  def q75(spark: SparkSession, d: String): DataFrame = {
    val log = Tables.events(spark, d).select(
      col("event_id"), col("ts"), col("props").as("body"))
    Reconcile.auditRetention(log, "ts", "body",
        truncateBefore = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")),
        deleteBefore = lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
      .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("body"))
      .orderBy(col("event_id"))
  }

  private val q75Sql: String = """
    SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
      CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN NULL ELSE props END AS body
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
    ORDER BY event_id"""

  // ---- q76: per-parent incremental watermarks ----

  def q76(spark: SparkSession, d: String): DataFrame =
    Backfiller.perParentWatermarks(Tables.events(spark, d), "user_id", "ts",
        marginDays = 2)
      .select(col("user_id"),
        date_format(col("backfill_start"), "yyyy-MM-dd").as("backfill_start"))
      .orderBy(col("user_id"))

  private val q76Sql: String = """
    SELECT user_id,
      strftime(CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) - 2, '%Y-%m-%d') AS backfill_start
    FROM events GROUP BY user_id ORDER BY user_id"""

  // ---- q77: dependency-DAG cascade (S11) ----

  private val parentSpec = ReplicatorSpec(
    name = "customer_root_v1",
    remoteKeyCol = "cust_id",
    columns = Seq(
      ColumnSpec("cust_id", LongType, Seq("id")),
      ColumnSpec("name", StringType, Seq("name")),
      ColumnSpec("segment", StringType, Seq("seg"))))

  private val childSpec = ReplicatorSpec(
    name = "customer_rollup_v1",
    remoteKeyCol = "rollup_id",
    columns = Seq(
      ColumnSpec("rollup_id", LongType, Seq("id")),
      ColumnSpec("segment", StringType, Seq("seg")),
      ColumnSpec("flagged", BooleanType, Seq("seg"),
        convert = c => c === "VIP")),
    dependsOn = Some("customer_root_v1"))

  /** S11 — parent upsert cascades its CHANGED rows to the dependent table
    * (`base.rb:1249-1260` via `DependencyDag.cascade`): bootstrap every
    * customer, then a v2 wave flips k%4=0 customers to the VIP segment;
    * only those rows re-flow into the child (row-diff suppression). */
  def q77(spark: SparkSession, d: String): DataFrame = {
    def parentBatch(vip: Boolean): DataFrame =
      Tables.parallel(Tables.customer(spark, d).select(
        concat(lit("""{"id":"""), col("c_custkey"),
          lit(""","name":""""), col("c_name"),
          lit("""","seg":""""),
          when(lit(vip) && col("c_custkey") % 4 === 0, lit("VIP"))
            .otherwise(col("c_mktsegment")),
          lit(""""}""")).as("body"),
        col("c_custkey").cast("long").as(Projection.IngestSeqCol)))

    val snapshots = scala.collection.mutable.Map.empty[String, DataFrame]
    val store = new graft.operators.DependencyDag.TableStore {
      def read(spec: ReplicatorSpec): DataFrame =
        snapshots.getOrElse(spec.name, Pipeline.emptyTarget(spec, spark))
      def write(spec: ReplicatorSpec, snapshot: DataFrame): Unit =
        snapshots(spec.name) = snapshot
    }
    def childBatchFor(child: ReplicatorSpec, changed: DataFrame): DataFrame =
      changed.select(
        to_json(struct(col("cust_id").as("id"), col("segment").as("seg"))).as("body"),
        col("cust_id").as(Projection.IngestSeqCol))

    val specs = Seq(parentSpec, childSpec)
    graft.operators.DependencyDag.cascade(specs, "customer_root_v1",
      parentBatch(vip = false), store, childBatchFor)
    graft.operators.DependencyDag.cascade(specs, "customer_root_v1",
      parentBatch(vip = true), store, childBatchFor)
    snapshots("customer_rollup_v1")
      .select(col("rollup_id"), col("segment"), col("flagged"))
      .orderBy(col("rollup_id"))
  }

  private val q77Sql: String = """
    SELECT CAST(c_custkey AS BIGINT) AS rollup_id,
      CASE WHEN c_custkey % 4 = 0 THEN 'VIP' ELSE c_mktsegment END AS segment,
      c_custkey % 4 = 0 AS flagged
    FROM customer ORDER BY rollup_id"""

  val defs: Map[String, Q] = Map(
    "q73_atom_feed_refetch" -> (q73 _),
    "q74_enrichment_lookup" -> (q74 _),
    "q75_audit_retention" -> (q75 _),
    "q76_per_parent_watermarks" -> (q76 _),
    "q77_dependency_cascade" -> (q77 _))

  val oracles: Map[String, String] = Map(
    "q73_atom_feed_refetch" -> q73Sql,
    "q74_enrichment_lookup" -> q74Sql,
    "q75_audit_retention" -> q75Sql,
    "q76_per_parent_watermarks" -> q76Sql,
    "q77_dependency_cascade" -> q77Sql)
}
