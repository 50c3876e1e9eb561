package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction: every category detected and replaced; clean text passes
  * through byte-identical; counts match the planted spans. */
class PiiSpec extends SparkSpec {

  private def redactOne(s: String): (String, Map[String, Long]) = {
    import spark.implicits._
    val df = Seq(s).toDF("t")
    val red = df.select(Pii.redact(col("t"))).as[String].collect()(0)
    val counts = Pii.counts(col("t"))
    val row = df.select(counts.map { case (n, c) => c.as(n) }: _*).collect()(0)
    (red, Pii.Categories.map(_._1).zipWithIndex.map { case (n, i) => n -> row.getLong(i) }.toMap)
  }

  test("each category redacts and counts") {
    val (red, counts) = redactOne(
      "mail a.b-c_1@sub.example.co.uk from 192.168.0.1 call 555-123-4567 ssn 123-45-6789 end")
    assert(red == "mail <EMAIL> from <IP> call <PHONE> ssn <SSN> end")
    assert(counts == Map("email" -> 1L, "ipv4" -> 1L, "phone" -> 1L, "ssn" -> 1L))
  }

  test("clean text is untouched and counts zero") {
    val s = "Customer#000000042 ordered 17 parts for 1234.56 on 1995-03-15"
    val (red, counts) = redactOne(s)
    assert(red == s)
    assert(counts.values.forall(_ == 0L))
  }

  test("phone and ssn shapes do not cross-match") {
    val (red, counts) = redactOne("tel 555-123-4567 and ssn 321-54-9876")
    assert(red == "tel <PHONE> and ssn <SSN>")
    assert(counts("phone") == 1L && counts("ssn") == 1L)
  }

  test("multiple spans of one category all redact") {
    val (red, counts) = redactOne("a@b.co c@d.org and 1.2.3.4 5.6.7.8")
    assert(red == "<EMAIL> <EMAIL> and <IP> <IP>")
    assert(counts("email") == 2L && counts("ipv4") == 2L)
  }
}
