package graft.replicators

import graft.SparkSpec
import graft.operators.{Pipeline, Projection}
import org.apache.spark.sql.functions._

/** Port of the reference's shared replicator contracts
  * (`spec_helpers/shared_examples_for_replicators.rb`): golden-row upsert,
  * event-wrapped unwrap, "prevents overwriting new data with old",
  * set-once columns, schema-evolution backfill. */
class ReplicatorContractSpec extends SparkSpec {
  import spark.implicits._

  // Fixture modeled on the reference's recorded Stripe payloads
  // (FIXTURES.md A2; spec/data/stripe).
  private val chargeResource =
    """{"id":"ch_1","object":"charge","amount":888,"balance_transaction":"txn_1",
       |"created":1560506164,"customer":"cus_1","invoice":null,"receipt_email":"a@b.co",
       |"status":"succeeded","billing_details":{"email":"bill@b.co"},
       |"payment_method_details":{"type":"card"}}""".stripMargin.replaceAll("\n", "")

  private def eventWrapped(resource: String, created: Long) =
    s"""{"object":"event","type":"charge.updated","created":$created,"data":{"object":$resource}}"""

  private def webhookDf(bodies: String*) =
    bodies.zipWithIndex.map { case (b, i) => (b, i.toLong) }
      .toDF("body", Projection.IngestSeqCol)

  private val spec = Replicators.stripeChargeV1

  test("a replicator: golden-row insert from a plain resource payload") {
    val out = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark),
      webhookDf(chargeResource))
    val row = out.collect()(0)
    assert(out.count() == 1)
    assert(row.getAs[String]("stripe_id") == "ch_1")
    assert(row.getAs[Long]("amount") == 888L)
    assert(row.getAs[String]("billing_email") == "bill@b.co")
    assert(row.getAs[String]("payment_type") == "card")
    assert(row.getAs[String]("invoice") == null)
    assert(row.getAs[java.sql.Timestamp]("created").getTime == 1560506164000L)
    // updated falls back to resource's created for non-event payloads
    assert(row.getAs[java.sql.Timestamp]("updated").getTime == 1560506164000L)
    assert(row.getAs[String]("data").contains("\"id\":\"ch_1\""))
  }

  test("event-wrapped payloads unwrap data.object and take updated from the envelope") {
    val out = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark),
      webhookDf(eventWrapped(chargeResource, 1560509999L)))
    val row = out.collect()(0)
    assert(row.getAs[String]("stripe_id") == "ch_1")
    assert(row.getAs[java.sql.Timestamp]("updated").getTime == 1560509999000L)
    // data holds the unwrapped resource, not the envelope
    assert(!row.getAs[String]("data").contains("\"object\":\"event\""))
  }

  test("prevents overwriting new data with old (U2 contract)") {
    val newer = eventWrapped(chargeResource.replace("\"status\":\"succeeded\"",
      "\"status\":\"refunded\""), 1560600000L)
    val older = eventWrapped(chargeResource, 1560506164L)
    val t1 = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), webhookDf(newer))
    val t2 = Pipeline.upsertBatch(spec, t1, webhookDf(older))
    val row = t2.collect()(0)
    assert(t2.count() == 1)
    assert(row.getAs[String]("status") == "refunded") // old event did not win
    assert(row.getAs[java.sql.Timestamp]("updated").getTime == 1560600000000L)
  }

  test("in-batch duplicates collapse last-wins before merge (U4)") {
    val v1 = eventWrapped(chargeResource, 1560600001L)
    val v2 = eventWrapped(chargeResource.replace("888", "999"), 1560600002L)
    val out = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark),
      webhookDf(v1, v2))
    assert(out.count() == 1)
    assert(out.collect()(0).getAs[Long]("amount") == 999L)
  }

  test("transistor episode stats: compound key + dd-MM-yyyy date + conditional update") {
    val tspec = Replicators.transistorEpisodeStatsV1
    val page = """{"episode_id":"ep-1","date":"03-01-2024","downloads":12}"""
    val out = Pipeline.upsertBatch(tspec, Pipeline.emptyTarget(tspec, spark), webhookDf(page))
    val row = out.collect()(0)
    assert(row.getAs[String]("compound_identity") == "ep-1-2024-01-03")
    assert(row.getAs[java.sql.Date]("date").toString == "2024-01-03")
    assert(row.getAs[Long]("downloads") == 12L)
    // same downloads -> no change; different downloads -> update
    val same = Pipeline.changedBatch(tspec, out, webhookDf(page))
    assert(same.count() == 0)
    val changed = Pipeline.changedBatch(tspec, out,
      webhookDf(page.replace("12", "15")))
    assert(changed.count() == 1)
  }

  test("atom feed: set-once row_created_at survives updates (U3)") {
    val aspec = Replicators.atomSingleFeedV1
    val e1 = """{"id":"urn:e1","title":"T","updated":"2024-01-05T10:00:00Z","published":"2024-01-04T10:00:00Z","georss:point":"45.256 -71.92"}"""
    val e2 = """{"id":"urn:e1","title":"T2","updated":"2024-02-05T10:00:00Z","published":"2024-01-04T10:00:00Z","georss:point":"45.256 -71.92"}"""
    val t1 = Pipeline.upsertBatch(aspec, Pipeline.emptyTarget(aspec, spark), webhookDf(e1))
    val t2 = Pipeline.upsertBatch(aspec, t1, webhookDf(e2))
    val row = t2.collect()(0)
    assert(row.getAs[String]("title") == "T2")
    assert(row.getAs[java.sql.Timestamp]("row_created_at").getTime ==
      java.time.Instant.parse("2024-01-05T10:00:00Z").toEpochMilli) // set once
    assert(row.getAs[java.math.BigDecimal]("geo_lat").doubleValue() == 45.256)
    assert(row.getAs[java.math.BigDecimal]("geo_lng").doubleValue() == -71.92)
  }

  test("schema evolution: backfillColumn re-derives from stored data (§1.3)") {
    val stored = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark),
      webhookDf(chargeResource))
    val evolved = Pipeline.backfillColumn(stored,
      graft.operators.ColumnSpec("charge_prefix", org.apache.spark.sql.types.StringType,
        Seq("id"), convert = c => substring(c, 1, 2)))
    assert(evolved.collect()(0).getAs[String]("charge_prefix") == "ch")
  }
}
