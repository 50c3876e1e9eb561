package graft

import graft.functions.Hashing
import graft.operators.IncrementalSplit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for the round-11 incremental split refresh (q201): a
  * split REFRESH on a grown corpus must cost the DELTA, not the corpus.
  * Two axes, one point per claim (the r10 two-axis discipline):
  *
  *  - CORPUS axis (fixed ~500-doc delta, corpus 1x -> COPIESx): batch
  *    recompute grows with the corpus while refresh stays near-flat —
  *    its only corpus-sized component is the narrow signature-store scan
  *    of the LSH probe (at warehouse scale that leg is bucketed by band,
  *    see IncrementalSplit's scaladoc; here it is one columnar scan).
  *  - DELTA axis (fixed COPIESx corpus, delta 500 -> 10%): refresh grows
  *    with the delta — the signature/verify work is delta-proportional.
  *
  * Corpus geometry is ScaleCorpus's (known pair structure, unique
  * material dominating distinct rows); the fixed delta is
  * `pmod(doc_id, 10*copies) = 0` (~500 docs at every scale), the
  * proportional delta `pmod(doc_id, 10) = 0` (10%). Report rows are
  * hashed (bit_xor of xxhash64) so Catalyst cannot prune the work to a
  * row count (round-8 lesson).
  *
  * Emits ONE JSON line and writes `BENCH_sf1_inc_split.json` in the cwd. */
object BenchIncSplitScale {

  private def splitOf(c: org.apache.spark.sql.Column) = {
    val b = Hashing.splitBucket(c)
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale_incsplit")
    val spark = ScaleCorpus.session()
    import ScaleCorpus.fmt

    val base = Tables.documents(spark, sfDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

    def consume(df: DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect().head.getLong(0)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    /** init (untimed-claim sunk cost, still reported) + timed refresh +
      * report consumption for one (corpus, delta) point. */
    def refreshPoint(root: String, docs: DataFrame, deltaMod: Long): (Long, Double, Double, Long) = {
      val v1 = docs.filter(pmod(col("doc_id"), lit(deltaMod)) =!= 0L)
      val delta = docs.filter(pmod(col("doc_id"), lit(deltaMod)) === 0L)
      val nDelta = delta.count()
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val initSec = timed { IncrementalSplit.ingest(spark, root, v1, v1) }
      val refreshSec = timed {
        IncrementalSplit.ingest(spark, root, docs, delta)
        val assigned = IncrementalSplit
          .assignments(spark, root, docs.select(col("doc_id")))
          .select(col("doc_id"), col("rep"), splitOf(col("rep")).as("split"))
        consume(assigned.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), countDistinct(col("rep")).as("n_clusters"))
          .orderBy(col("split")))
      }
      val pairsRows = IncrementalSplit.pairs(spark, root).count()
      (nDelta, initSec, refreshSec, pairsRows)
    }

    val rounds = Seq(1, copies).map { c =>
      val dir = s"$scaleDir/${c}x"
      ScaleCorpus.scaledDocs(base, c)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count()

      // batch: the full-corpus recompute a non-incremental snapshot pays
      MemoRegistry.resetAll(); spark.catalog.clearCache()
      val batchSec = timed { consume(queries.CurationQueries.q194(spark, dir)) }

      // corpus axis: fixed ~500-doc delta at every scale
      val (fd, fInit, fRefresh, fPairs) =
        refreshPoint(s"$dir/stores_fixed", docs, 10L * c)
      // delta axis: proportional 10% delta (only meaningful beyond 1x,
      // where it coincides with the fixed point)
      val prop = if (c > 1) Some(refreshPoint(s"$dir/stores_prop", docs, 10L))
      else None
      (c, nDocs, batchSec, (fd, fInit, fRefresh, fPairs), prop)
    }

    val parts = rounds.map { case (c, n, b, (fd, fi, fr, fp), prop) =>
      val fixed =
        s""""fixed_delta":{"delta_docs":$fd,"init":${fmt(fi)},"refresh":${fmt(fr)},"pairs":$fp}"""
      val propPart = prop.map { case (pd, pi, pr, pp) =>
        s""","prop_delta":{"delta_docs":$pd,"init":${fmt(pi)},"refresh":${fmt(pr)},"pairs":$pp}"""
      }.getOrElse("")
      s""""${c}x":{"docs":$n,"batch":${fmt(b)},$fixed$propPart}"""
    }
    val line =
      s"""{"metric":"inc_split_scale","unit":"sec",${parts.mkString(",")},"sf":"$sfDir"}"""
    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_sf1_inc_split.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
