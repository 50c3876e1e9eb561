package graft.sources

import graft.SparkSpec
import graft.operators.{Pipeline, Projection}
import graft.replicators.Replicators

/** S5 end-to-end: Atom XML feed -> entry maps -> JSON bodies -> the atom
  * replicator's projection/merge (FIXTURES.md A5 shape). */
class AtomXmlSpec extends SparkSpec {
  import spark.implicits._

  private val feedXml =
    """<?xml version="1.0" encoding="utf-8"?>
      |<feed xmlns="http://www.w3.org/2005/Atom" xmlns:georss="http://www.georss.org/georss">
      |  <title>Quake Feed</title>
      |  <updated>2024-01-05T12:00:00Z</updated>
      |  <link rel="self" href="https://x/feed.atom"/>
      |  <entry>
      |    <id>urn:uuid:entry-1</id>
      |    <title>M 3.1 Quake</title>
      |    <updated>2024-01-05T10:00:00Z</updated>
      |    <published>2024-01-04T10:00:00Z</published>
      |    <georss:point>45.256 -71.92</georss:point>
      |    <category term="quake" label="Earthquake"/>
      |    <content type="html">&lt;p&gt;details&lt;/p&gt;</content>
      |  </entry>
      |  <entry>
      |    <id>urn:uuid:entry-2</id>
      |    <title>M 2.0 Quake</title>
      |    <updated>2024-01-06T10:00:00Z</updated>
      |    <published>2024-01-05T10:00:00Z</published>
      |    <georss:point>44.1 -70.5</georss:point>
      |  </entry>
      |</feed>""".stripMargin

  test("feed parses: namespaced keys, spec attrs, content raw value") {
    val (meta, entries) = AtomXml.parseFeed(feedXml)
    assert(meta("title") == "Quake Feed")
    assert(meta("link").asInstanceOf[Map[String, String]]("href") == "https://x/feed.atom")
    assert(entries.size == 2)
    val e1 = entries.head
    assert(e1("id") == "urn:uuid:entry-1")
    assert(e1("georss:point") == "45.256 -71.92")
    assert(e1("category").asInstanceOf[Map[String, String]]("term") == "quake")
    assert(e1("content").asInstanceOf[Map[String, String]]("value").contains("details"))
  }

  test("entries flow through the atom replicator pipeline") {
    val spec = Replicators.atomSingleFeedV1
    val bodies = AtomXml.entriesAsJson(feedXml)
    val webhooks = bodies.zipWithIndex.map { case (b, i) => (b, i.toLong) }
      .toDF("body", Projection.IngestSeqCol)
    val out = Pipeline.upsertBatch(spec, Pipeline.emptyTarget(spec, spark), webhooks)
      .orderBy("entry_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("entry_id") == "urn:uuid:entry-1")
    assert(out(0).getAs[java.math.BigDecimal]("geo_lat").doubleValue() == 45.256)
    assert(out(0).getAs[java.math.BigDecimal]("geo_lng").doubleValue() == -71.92)
    assert(out(1).getAs[java.sql.Timestamp]("updated").getTime ==
      java.time.Instant.parse("2024-01-06T10:00:00Z").toEpochMilli)
  }
}
