package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Structural invariants of the curation governance family — the
  * properties that make each operator trustworthy as a DECISION, beyond
  * the value-level oracle gate: budget conservation (q198), the
  * leakage-free guarantee (q194), and block conservation through the
  * boilerplate rewrite (q199). */
class CurationQueriesSpec extends SparkSpec {

  test("q198: largest-remainder quotas sum to the budget exactly") {
    val out = CurationQueries.q198(spark, sfDir).collect()
    val totalTokens = Tables.documents(spark, sfDir)
      .select(sum(size(Text.tokens(col("text")))).cast("long")).head().getLong(0)
    val budget = totalTokens / 3
    assert(out.map(_.getAs[Long]("alloc")).sum == budget,
      s"sum(alloc) must equal budget $budget exactly — float quotas drift")
    out.foreach { r =>
      assert(Set(0L, 1L).contains(r.getAs[Long]("extra")))
      assert(r.getAs[Long]("alloc") ==
        r.getAs[Long]("base_alloc") + r.getAs[Long]("extra"))
    }
  }

  test("q194: cluster-aware split covers every doc and leaks zero pairs") {
    val out = CurationQueries.q194(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "splits must partition the corpus")
    // the property the operator exists for: no verified near-dup pair
    // straddles splits under cluster-keyed assignment
    assert(out.forall(_.getAs[Long]("n_cross_pairs") == 0L),
      s"cross-split near-dup pairs: ${out.mkString(", ")}")
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "valid"))
  }

  test("q199: block accounting conserves the corpus and finds the footer") {
    val out = CurationQueries.q199(spark, sfDir)
    val byDoc = out.collect()
    // conservation: n_blocks per doc == ceil(tokens(text + footer) / 2)
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(Text.tokens(concat(col("text"), lit(" copyright footer "),
          col("source"), lit(" all rights reserved")))).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) + 1) / 2).toMap
    byDoc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_blocks") == expected(id),
        s"doc $id block count diverged from ceil(tokens/2)")
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_blocks"))
    }
    // the planted per-source footer must be detected somewhere in every
    // source (each source shares its footer blocks across all its docs)
    val bySource = byDoc.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_dropped")).sum).toMap
    bySource.foreach { case (s, dropped) =>
      assert(dropped > 0L, s"source $s: planted footer not detected")
    }
  }
}
