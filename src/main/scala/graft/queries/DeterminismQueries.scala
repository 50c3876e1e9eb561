package graft.queries

import graft.Tables
import graft.functions.Converters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle closure for the two converter families that were previously
  * ScalaTest-only because their default forms are nondeterministic:
  *
  *  - E19 defaulters (q90) — run with an INJECTED clock instead of
  *    wall-clock `now()`, the replay seam, so the filled values are pure
  *    functions of the input;
  *  - E9 int-or-sequence (q91) — run with the deterministic sink-side
  *    sequence (base + running count in key order), reproducing the
  *    reference's DB-sequence assignment instead of unique-only surrogates.
  */
object DeterminismQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q90 — E19 defaulters under a fixed clock. Nulls are carved out of the
    * orders table deterministically; each defaulter family fills them:
    * now (injected clock), tofalse, from-another-field. */
  def q90(spark: SparkSession, d: String): DataFrame = {
    val clock = lit("2024-01-15 12:00:00").cast("timestamp")
    val src = Tables.orders(spark, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 3 === 0, lit(null).cast("timestamp"))
        .otherwise(col("o_orderdate").cast("timestamp")).as("maybe_ts"),
      when(col("o_orderkey") % 2 === 0, lit(null).cast("boolean"))
        .otherwise(lit(true)).as("maybe_flag"),
      when(col("o_orderkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("maybe_src"),
      col("o_orderpriority"))
    src.select(
      col("o_orderkey"),
      date_format(Converters.defaultNowAt(col("maybe_ts"), clock),
        "yyyy-MM-dd HH:mm:ss").as("filled_ts"),
      Converters.defaultFalse(col("maybe_flag")).as("filled_flag"),
      Converters.default(col("maybe_src"), col("o_orderpriority")).as("filled_src"))
      .orderBy(col("o_orderkey"))
  }

  val q90Sql: String = """
    WITH src AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE CAST(o_orderdate AS TIMESTAMP) END AS maybe_ts,
        CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE true END AS maybe_flag,
        CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS maybe_src,
        o_orderpriority
      FROM orders
    )
    SELECT o_orderkey,
      strftime(COALESCE(maybe_ts, TIMESTAMP '2024-01-15 12:00:00'), '%Y-%m-%d %H:%M:%S') AS filled_ts,
      COALESCE(maybe_flag, false) AS filled_flag,
      COALESCE(maybe_src, o_orderpriority) AS filled_src
    FROM src ORDER BY o_orderkey"""

  /** q91 — E9 with the deterministic sequence: ids parse out of the external
    * key when present; sequence-needing rows draw `base + running count` in
    * key order (the reference's serial DB-sequence semantics, made
    * replayable). */
  def q91(spark: SparkSession, d: String): DataFrame = {
    val src = Tables.orders(spark, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 3 === 0, lit("pending"))
        .otherwise(concat(lit("id-"), col("o_orderkey").cast("string"))).as("ext"))
    src.select(
      col("o_orderkey"), col("ext"),
      Converters.intOrSequenceOrdered(col("ext"), "id-(\\d+)", 5000000L,
        col("o_orderkey")).cast("long").as("assigned_id"))
      .orderBy(col("o_orderkey"))
  }

  val q91Sql: String = """
    WITH src AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 3 = 0 THEN 'pending'
             ELSE 'id-' || CAST(o_orderkey AS VARCHAR) END AS ext
      FROM orders
    ), cap AS (
      SELECT o_orderkey, ext,
        TRY_CAST(NULLIF(regexp_extract(ext, 'id-(\d+)', 1), '') AS BIGINT) AS captured
      FROM src
    ), seq AS (
      SELECT o_orderkey, ext, captured,
        count(CASE WHEN captured IS NULL THEN 1 END)
          OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM cap
    )
    SELECT o_orderkey, ext,
      CAST(COALESCE(captured, 5000000 - 1 + run) AS BIGINT) AS assigned_id
    FROM seq ORDER BY o_orderkey"""

  val defs: Map[String, Q] = Map(
    "q90_defaulters" -> (q90 _),
    "q91_int_or_seq" -> (q91 _))

  val oracles: Map[String, String] = Map(
    "q90_defaulters" -> q90Sql,
    "q91_int_or_seq" -> q91Sql)
}
