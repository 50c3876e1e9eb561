package graft.sources

import graft.SparkSpec
import graft.operators.{ColumnSpec, Pipeline, Projection, ReplicatorSpec}
import org.apache.spark.sql.types._

/** S9 contract ("uses enrichments", `shared_examples_for_replicators.rb:508`):
  * the lookup stage runs partition-wise, errors tolerate to null, and
  * `fromEnrichment` columns dig the fetched JSON; the enrichment itself is
  * stored alongside the row. Modeled on the github-repo languages
  * enrichment (`github_repo_v1_mixin.rb:217-235`). */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private val spec = ReplicatorSpec(
    name = "fake_repo_v1",
    remoteKeyCol = "repo_id",
    columns = Seq(
      ColumnSpec("repo_id", StringType, Seq("id")),
      ColumnSpec("name", StringType, Seq("name")),
      ColumnSpec("primary_language", StringType, Seq("language"), fromEnrichment = true)),
    usesEnrichment = true)

  private def webhooks = Seq(
    ("""{"id":"r1","name":"alpha"}""", 1L),
    ("""{"id":"r2","name":"beta"}""", 2L),
    ("""{"id":"r-fail","name":"gamma"}""", 3L))
    .toDF("body", Projection.IngestSeqCol)

  test("partition-wise fetch adds enrichment; tolerated statuses null out") {
    val enriched = Enrichment.withEnrichment(webhooks, () => { body =>
      if (body.contains("r-fail")) throw new Enrichment.Tolerated(403)
      else if (body.contains("r2")) None // 404: no enrichment available
      else Some("""{"language":"Scala","stars":10}""")
    })
    val merged = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), enriched)
    val byId = merged.collect().map(r =>
      r.getAs[String]("repo_id") ->
        (r.getAs[String]("primary_language"), r.getAs[String]("enrichment"))).toMap
    assert(byId("r1") == (("Scala", """{"language":"Scala","stars":10}""")))
    assert(byId("r2") == ((null, null)))
    assert(byId("r-fail") == ((null, null))) // 403 tolerated, row still lands
    assert(merged.columns.contains("enrichment"))
  }

  test("a non-tolerated fetch error fails the batch, like the reference raises") {
    // expired tokens / deleted rows tolerate to null; an outage must NOT
    // silently store nulls — the job fails and retries
    val enriched = Enrichment.withEnrichment(webhooks, () => { _ =>
      throw new RuntimeException("connection reset")
    })
    val err = intercept[org.apache.spark.SparkException](enriched.collect())
    assert(err.getMessage.contains("connection reset") ||
      Option(err.getCause).exists(_.getMessage.contains("connection reset")))
  }

  test("projection without an enrichment column leaves fromEnrichment null") {
    val merged = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), webhooks)
    assert(merged.collect().forall(_.getAs[String]("primary_language") == null))
  }
}
