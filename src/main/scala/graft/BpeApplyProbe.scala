package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-evidence sidecar for BPE tokenizer APPLICATION at production merge
  * counts: trains >= 1000 real merges on a synthetic corpus whose vocabulary
  * is rich enough to sustain them, then applies the learned table corpus-wide
  * two ways:
  *
  *  - `expr`: the `BpeEncode` expression — ONE plan node carrying the whole
  *    table; plan-build time and execution wall must be flat in the merge
  *    count (measured at 10 vs the full table);
  *  - `literal`: the definitional nested-replace chain — plan work grows
  *    with the merge count (measured at 10/100/250; planning only at
  *    500/1000, where execution is no longer a reasonable plan).
  *
  * The vocabulary is deterministic (fixed LCG): ~4000 distinct 8-12 char
  * words over a 12-letter alphabet, zipf-ish document sampling, so adjacent-
  * pair statistics stay deep enough for 1000+ merges. Emits ONE JSON line
  * and writes `BENCH_sf1_bpe_apply.json` in the cwd.
  */
object BpeApplyProbe {

  def main(args: Array[String]): Unit = {
    val spark = ScaleCorpus.session()
    import spark.implicits._

    // deterministic synthetic corpus ------------------------------------
    var seed = 0x2545f4914f6cdd1dL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val alpha = "abcdefghijkl"
    val vocab = Array.tabulate(4000) { _ =>
      val len = 8 + nextInt(5)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append(alpha(nextInt(alpha.length))))
      sb.toString
    }
    def zipfWord(): String = {
      // bias toward low ranks: square the uniform draw
      val u = nextInt(vocab.length)
      vocab(nextInt(u + 1))
    }
    val nDocs = 10000
    val wordsPerDoc = 60
    val docs = (0 until nDocs).map { i =>
      (i.toLong, (0 until wordsPerDoc).map(_ => zipfWord()).mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint(true)
    val nWords = nDocs.toLong * wordsPerDoc

    // train ---------------------------------------------------------------
    val tTrain0 = System.nanoTime()
    val merges = BpeTrainer.train(docs, 1000)
    val trainSec = (System.nanoTime() - tTrain0) / 1e9
    println(s"trained ${merges.size} merges in $trainSec s")
    require(merges.size >= 1000, s"corpus exhausted at ${merges.size} merges")

    // measurement helpers -------------------------------------------------
    def planAndRun(mk: () => DataFrame, execute: Boolean): (Double, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = mk()
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      val tExec = if (execute) {
        val t1 = System.nanoTime()
        df.agg(sum(col("n_subwords"))).collect()
        (System.nanoTime() - t1) / 1e9
      } else -1d
      (tPlan, tExec)
    }
    def med(f: () => (Double, Double)): (Double, Double) = {
      val runs = Seq(f(), f(), f())
      (runs.map(_._1).sorted.apply(1), runs.map(_._2).sorted.apply(1))
    }

    val exprRounds = Seq(10, merges.size).map { k =>
      val (p, e) = med(() =>
        planAndRun(() => BpeTrainer.subwordCounts(docs, merges.take(k)), execute = true))
      (k, p, e)
    }
    val litExec = Seq(10, 100, 250).map { k =>
      val (p, e) = med(() =>
        planAndRun(() => BpeTrainer.subwordCountsLiteral(docs, merges.take(k)), execute = true))
      (k, p, e)
    }
    val litPlanOnly = Seq(500, 1000).map { k =>
      val (p, _) = med(() =>
        planAndRun(() => BpeTrainer.subwordCountsLiteral(docs, merges.take(k)), execute = false))
      (k, p, -1d)
    }

    import ScaleCorpus.fmt
    def part(tag: String, rs: Seq[(Int, Double, Double)]) = rs.map { case (k, p, e) =>
      val exec = if (e < 0) "null" else fmt(e)
      s""""${tag}_$k":{"plan_sec":${fmt(p)},"exec_sec":$exec}"""
    }.mkString(",")
    val line =
      s"""{"metric":"bpe_apply_scale","unit":"sec","merges":${merges.size},"train_sec":${fmt(trainSec)},"corpus_words":$nWords,${part("expr", exprRounds)},${part("lit", litExec ++ litPlanOnly)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_sf1_bpe_apply.json"),
      (line + "\n").getBytes)
    println(line)
    spark.stop()
  }
}
