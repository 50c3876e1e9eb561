package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavior checks for the round-4 pipeline operators. Value-level equality
  * is gated by the DuckDB oracle (Verify); these pin the semantics that the
  * oracle can't see — differential recomputation and internal invariants. */
class PipelineQueriesSpec extends SparkSpec {

  test("q46: planted PII is fully redacted; redaction and counts agree") {
    val out = PipelineQueries.q46(spark, sfDir).cache()
    // Redacted text must carry exactly as many tokens as counted.
    val bad = out.filter(
      size(split(col("redacted"), "<EMAIL>", -1)) - 1 =!= col("n_email") ||
        size(split(col("redacted"), "<IP>", -1)) - 1 =!= col("n_ipv4") ||
        size(split(col("redacted"), "<PHONE>", -1)) - 1 =!= col("n_phone") ||
        size(split(col("redacted"), "<SSN>", -1)) - 1 =!= col("n_ssn"))
      .count()
    assert(bad == 0)
    // No raw PII survives redaction.
    val leaked = out.filter(
      col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("redacted").rlike("\\d{3}-\\d{2,3}-\\d{4}")).count()
    assert(leaked == 0)
    // Planting scheme: key%4==0 rows are clean, key%4==3 rows have all four.
    assert(out.filter(col("c_custkey") % 4 === 0 && col("n_total") =!= 0).count() == 0)
    assert(out.filter(col("c_custkey") % 4 === 3 && col("n_total") =!= 4).count() == 0)
    out.unpersist()
  }

  test("q47: signals match a brute-force recomputation") {
    val got = PipelineQueries.q47(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val t = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val n = t.length
      val wc = t.groupBy(identity).map(_._2.length)
      val bg = t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val topBg: Long = if (n >= 2) bg.groupBy(identity).map(_._2.length).max.toLong else 0L
      val dup = t.count(w => t.count(_ == w) >= 2)
      val expect = (n.toLong,
        math.floor(wc.max * 1000d / n).toLong,
        if (n >= 2) math.floor(topBg * 1000d / (n - 1)).toLong else 0L,
        math.floor(dup * 1000d / n).toLong)
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("q48: three terms per doc, scores non-increasing, rarity wins") {
    val out = PipelineQueries.q48(spark, sfDir).cache()
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("k"),
      max("rank").as("mx")).filter(col("k") =!= 3 || col("mx") =!= 3).count()
    assert(perDoc == 0)
    val disordered = out
      .withColumn("prev", lag("score", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("rank")))
      .filter(col("prev").isNotNull && col("prev") < col("score")).count()
    assert(disordered == 0)
    out.unpersist()
  }

  test("q49: dup fraction is consistent and keep matches the threshold") {
    val out = PipelineQueries.q49(spark, sfDir)
    val bad = out.filter(
      col("dup_shingles") > col("n_shingles") ||
        col("dup_permille") =!= floor(col("dup_shingles") * 1000d / col("n_shingles"))
          .cast("long") ||
        col("keep") =!= (col("dup_permille") <= 500)).count()
    assert(bad == 0)
  }

  test("q95: chunks match a plain sliding-window recomputation") {
    val got = PipelineQueries.q95(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(20)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    docs.foreach { case (id, text) =>
      val t = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val want = Iterator.from(0)
        .map(i => (i, 1 + i * 16))
        .takeWhile { case (_, start) => start <= t.length }
        .filter { case (i, start) => i == 0 || start + 16 <= t.length }
        .map { case (i, start) =>
          val chunk = t.slice(start - 1, math.min(start - 1 + 32, t.length))
          (id, i.toLong) -> (chunk.length.toLong, md5hex(chunk.mkString(" ")))
        }.toMap
      want.foreach { case (k, v) => assert(got(k) == v, s"chunk $k") }
      assert(!got.contains((id, want.size.toLong)), s"doc $id has extra chunks")
    }
  }

  test("q54: every vector sits with its nearest final centroid (differential)") {
    val out = PipelineQueries.q54(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000d).toLong).toArray))
      .toMap
    // Recompute Lloyd's with plain Scala.
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Seq[(Int, Array[Long])] =
      (0 until 4).map(i => i -> vecs(i.toLong))
    for (_ <- 0 until 1) {
      val assigned = vecs.toSeq.map { case (id, v) =>
        val (cid, _) = cents.map { case (c, cv) => (c, dist(v, cv)) }
          .minBy { case (c, dd) => (dd, c) }
        (id, cid, v)
      }
      cents = assigned.groupBy(_._2).toSeq.sortBy(_._1).map { case (cid, rows) =>
        val dim = rows.head._3.length
        cid -> Array.tabulate(dim) { p =>
          math.floor(rows.map(_._3(p)).sum * 1.0 / rows.size).toLong
        }
      }
    }
    out.foreach { case (id, cluster, d) =>
      val (cid, dd) = cents.map { case (c, cv) => (c, dist(vecs(id), cv)) }
        .minBy { case (c, x) => (x, c) }
      assert(cluster == cid.toLong && d == dd, s"vec $id")
    }
  }

  test("q174: packing conserves tokens, fills every non-final window") {
    val rows = PipelineQueries.q174(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // windows are contiguous from 0
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // every window but the last holds exactly 512 tokens; the last <= 512
    rows.init.foreach { case (s, _, _, nt) => assert(nt == 512L, s"seq $s") }
    assert(rows.last._4 <= 512L && rows.last._4 > 0L)
    // token conservation: windows sum to the corpus token count
    val corpusToks = Tables.documents(spark, sfDir)
      .select(graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(rows.map(_._4).sum == corpusToks)
    // each window's docs = starts + at most one carry-in from the previous
    rows.foreach { case (s, nd, nds, _) =>
      assert(nd == nds || nd == nds + 1, s"seq $s")
    }
  }

  test("q175: shuffled packing preserves window geometry, reorders content") {
    val id = PipelineQueries.q174(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val sh = PipelineQueries.q175(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // same corpus, same window length -> same window count and token fill
    assert(sh.map(_._1).toSeq == id.map(_._1).toSeq)
    assert(sh.map(_._3).sum == id.map(_._3).sum)
    sh.init.foreach { case (s, _, nt) => assert(nt == 512L, s"seq $s") }
    // the shuffle actually reorders: per-window doc counts must differ
    // somewhere (doc-id order and hash order agreeing everywhere would
    // mean the hash is degenerate)
    assert(sh.map(_._2).toSeq != id.map(_._2).toSeq)
  }
}
