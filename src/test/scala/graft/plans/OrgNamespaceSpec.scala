package graft.plans

import graft.SparkSpec

/** Tenancy contracts (§2.10, `db_builder.rb:95-215`): per-org namespace,
  * cross-org invisibility, in-namespace views, table migration. */
class OrgNamespaceSpec extends SparkSpec {
  import spark.implicits._

  // fresh warehouse state: the in-memory catalog forgets tables between
  // sessions but managed-table directories persist on disk
  Seq("acme", "globex", "initech").foreach { org =>
    OrgNamespace.drop(spark, org)
    val dir = java.nio.file.Paths.get(s"spark-warehouse/org_$org.db")
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("same-named tables resolve per-org; cross-org references rejected") {
    OrgNamespace.provision(spark, "acme")
    OrgNamespace.provision(spark, "globex")
    OrgNamespace.registerTable(spark, "acme", "charges",
      Seq(("a1", 100L), ("a2", 200L)).toDF("id", "amount"))
    OrgNamespace.registerTable(spark, "globex", "charges",
      Seq(("g1", 999L)).toDF("id", "amount"))

    val acme = OrgNamespace.runReadonly(spark, "acme",
      "SELECT sum(amount) AS s FROM charges")
    assert(acme.df.collect()(0).getLong(0) == 300L)
    val globex = OrgNamespace.runReadonly(spark, "globex",
      "SELECT sum(amount) AS s FROM charges")
    assert(globex.df.collect()(0).getLong(0) == 999L)

    // a qualified reference into another org's namespace is invisible
    intercept[OrgNamespace.CrossOrgAccess] {
      OrgNamespace.runReadonly(spark, "acme",
        "SELECT * FROM org_globex.charges")
    }
    intercept[OrgNamespace.CrossOrgAccess] {
      OrgNamespace.runReadonly(spark, "acme",
        "SELECT * FROM charges WHERE amount > (SELECT max(amount) FROM org_globex.charges)")
    }
    intercept[OrgNamespace.CrossOrgAccess] {
      OrgNamespace.runReadonly(spark, "acme",
        "WITH x AS (SELECT * FROM spark_catalog.org_globex.charges) SELECT * FROM x")
    }
    // CTE names and own-namespace qualification stay legal
    val cte = OrgNamespace.runReadonly(spark, "acme",
      "WITH x AS (SELECT amount FROM org_acme.charges) SELECT count(*) AS n FROM x")
    assert(cte.df.collect()(0).getLong(0) == 2L)
  }

  test("DDL/DML rejected inside the org surface; saved views run in-namespace") {
    intercept[ReadonlyGuard.RejectedSql] {
      OrgNamespace.runReadonly(spark, "acme", "DROP TABLE charges")
    }
    OrgNamespace.createView(spark, "acme", "big_charges",
      "SELECT * FROM charges WHERE amount >= 200")
    val v = OrgNamespace.runReadonly(spark, "acme", "SELECT id FROM big_charges")
    assert(v.df.collect().map(_.getString(0)).toSeq == Seq("a2"))
    // view DDL itself cannot escape the namespace
    intercept[OrgNamespace.CrossOrgAccess] {
      OrgNamespace.createView(spark, "acme", "evil",
        "SELECT * FROM org_globex.charges")
    }
    assert(OrgNamespace.tables(spark, "acme").toSet == Set("charges", "big_charges"))
  }

  test("table migration moves a replica between org namespaces") {
    OrgNamespace.provision(spark, "initech")
    OrgNamespace.registerTable(spark, "initech", "events",
      Seq((1L, "x")).toDF("id", "v"))
    OrgNamespace.migrateTable(spark, "initech", "acme", "events")
    assert(OrgNamespace.tables(spark, "acme").contains("events"))
    assert(!OrgNamespace.tables(spark, "initech").contains("events"))
    val got = OrgNamespace.runReadonly(spark, "acme", "SELECT v FROM events")
    assert(got.df.collect()(0).getString(0) == "x")
  }
}
