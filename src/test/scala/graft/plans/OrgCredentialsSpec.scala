package graft.plans

import graft.SparkSpec

/** §2.10 credential rolling: tokens gate the org SQL surface; rolling
  * revokes the old token; tokens never cross orgs. */
class OrgCredentialsSpec extends SparkSpec {
  import spark.implicits._

  // fresh warehouse state for the meta + org databases this spec touches
  Seq("credco", "othco").foreach(OrgNamespace.drop(spark, _))
  spark.sql(s"DROP DATABASE IF EXISTS ${OrgCredentials.MetaDb} CASCADE")
  Seq(s"spark-warehouse/${OrgCredentials.MetaDb}.db",
    "spark-warehouse/org_credco.db", "spark-warehouse/org_othco.db")
    .map(java.nio.file.Paths.get(_)).filter(java.nio.file.Files.exists(_))
    .foreach { dir =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

  test("issue/authenticate/roll lifecycle gates the org SQL surface") {
    val t1 = OrgCredentials.issue(spark, "credco")
    OrgNamespace.registerTable(spark, "credco", "charges",
      Seq(("c1", 10L)).toDF("id", "amount"))
    assert(t1.startsWith("gsk_"))

    val ok = OrgCredentials.runReadonly(spark, "credco", t1,
      "SELECT amount FROM charges")
    assert(ok.df.collect()(0).getLong(0) == 10L)

    intercept[OrgCredentials.Unauthorized] {
      OrgCredentials.runReadonly(spark, "credco", "gsk_wrong", "SELECT 1")
    }

    // rolling revokes the old token immediately
    val t2 = OrgCredentials.roll(spark, "credco")
    assert(t2 != t1)
    intercept[OrgCredentials.Unauthorized] {
      OrgCredentials.runReadonly(spark, "credco", t1, "SELECT 1")
    }
    assert(OrgCredentials.runReadonly(spark, "credco", t2,
      "SELECT count(*) AS n FROM charges").df.collect()(0).getLong(0) == 1L)

    // a valid token for one org cannot query another
    val other = OrgCredentials.issue(spark, "othco")
    assert(!OrgCredentials.authenticate(spark, "credco", other))
    intercept[OrgCredentials.Unauthorized] {
      OrgCredentials.runReadonly(spark, "credco", other, "SELECT 1")
    }
  }

  test("connstr header authenticates AND selects the org (api/connstr_auth.rb)") {
    def sha256Hex(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val tok = OrgCredentials.issue(spark, "credco")
    OrgNamespace.registerTable(spark, "credco", "charges2",
      Seq(("c1", 7L)).toDF("id", "amount"))
    // the client knows the revealed connection string and sends its hash
    val connstr = OrgCredentials.connectionString("credco", tok)
    val headers = Map(OrgCredentials.ConnstrHeader -> sha256Hex(connstr))
    assert(OrgCredentials.findConnstrAuthed(spark, headers).contains("credco"))
    val out = OrgCredentials.runReadonlyConnstr(spark, headers,
      "SELECT amount FROM charges2")
    assert(out.df.collect()(0).getLong(0) == 7L)

    // wrong/missing header: no org resolves, surface rejects
    assert(OrgCredentials.findConnstrAuthed(spark,
      Map(OrgCredentials.ConnstrHeader -> "deadbeef")).isEmpty)
    intercept[OrgCredentials.Unauthorized] {
      OrgCredentials.runReadonlyConnstr(spark, Map.empty, "SELECT 1")
    }

    // rolling the credential rolls the connstr: the old header value dies
    OrgCredentials.roll(spark, "credco")
    assert(OrgCredentials.findConnstrAuthed(spark, headers).isEmpty)

    // another org's connstr hash never resolves to this org
    val otherTok = OrgCredentials.issue(spark, "othco")
    val otherHeaders = Map(OrgCredentials.ConnstrHeader ->
      sha256Hex(OrgCredentials.connectionString("othco", otherTok)))
    assert(OrgCredentials.findConnstrAuthed(spark, otherHeaders).contains("othco"))
  }
}
