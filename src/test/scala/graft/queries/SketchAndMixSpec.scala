package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode

/** Contract tests for the mixing (q114/q115) and sketch (q116/q117) and
  * composed-ANN (q118) operators: the SCALE-SHAPE claims their scaladocs
  * make must hold in the physical plan, and the sketch estimators must obey
  * their mathematical one-sided/bounded-error guarantees on real data (the
  * oracle gate proves determinism; these prove the shapes and properties).
  */
class SketchAndMixSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q114: the per-source cap lowers to a map-side WindowGroupLimit") {
    val p = plan(TextQueries.q114(spark, sfDir))
    // Partial before the exchange: each map task retains <= K rows/source
    assert(p.contains("WindowGroupLimit"), "rank filter must lower to WindowGroupLimit")
    assert(p.contains("row_number(), 15, Partial"), s"expected a Partial group limit:\n$p")
  }

  test("q115: temperature sampling is a broadcast-join + filter — no window, no per-group sort") {
    val p = plan(TextQueries.q115(spark, sfDir))
    assert(!p.contains("WindowGroupLimit") && !p.contains("windowspecdefinition"),
      s"selection must not need a window:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "per-language constants must broadcast")
  }

  test("q115: allocation oversamples tail languages and undersamples the head") {
    val rows = TextQueries.q115(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(rows.length > 1)
    // alpha = 1/2 flattens the distribution: the head language's target
    // share must drop below its natural share, the rarest must rise
    val head = rows.maxBy(_._2)
    val tail = rows.minBy(_._2)
    assert(head._3 >= tail._3 * 2 || head._2 == tail._2,
      "precondition: the corpus is actually skewed")
    assert(head._4 < head._3, s"head ${head._1}: target_bp ${head._4} !< natural_bp ${head._3}")
    assert(tail._4 > tail._3, s"tail ${tail._1}: target_bp ${tail._4} !> natural_bp ${tail._3}")
  }

  test("q116: count-min never undercounts, and some probe collides at this geometry") {
    val rows = SketchQueries.q116(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS undercounted $tok: $est < $exact")
    }
    // geometry is sized so collisions actually exercise the min-estimator
    assert(rows.exists { case (_, exact, est) => est > exact },
      "expected at least one colliding cell at w=16")
  }

  test("q117: HLL estimate lands within its error regime for every source") {
    val rows = SketchQueries.q117(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, exact, est) =>
      // m=64 gives ~13% standard error; assert a generous 2x envelope so
      // testdata regens can't flake this, while still catching a broken
      // register fold (which is off by orders of magnitude)
      assert(est >= exact / 2 && est <= exact * 2,
        s"$src: hll_est $est vs exact $exact outside [x0.5, x2]")
    }
  }

  test("q118: the corpus side reaches the probe join without an exchange; the query frame broadcasts") {
    val p = plan(PipelineQueries.q118(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "cell-membership probe must broadcast the query frame")
    // the only exchanges allowed are the top-k window's single shuffle and
    // the final presentation sort
    val exchanges = "(?m)^\\s*\\+?-? ?Exchange ".r.findAllIn(p).length
    assert(exchanges <= 2, s"corpus must not shuffle before the probe join:\n$p")
    assert(p.contains("row_number(), 3, Partial"),
      "per-query top-k must retain candidates map-side")
  }

  test("q119: the first document is fully novel, and novelty is a real spread") {
    val rows = DedupQueries.q119(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val first = rows.minBy(_._1)
    assert(first._4 == 1000L, s"doc ${first._1} (corpus-first) must be fully novel")
    rows.foreach { case (id, nSh, nNew, pm) =>
      assert(nNew <= nSh && pm <= 1000, s"doc $id: $nNew/$nSh -> $pm")
    }
    // the synthetic corpus shares vocabulary heavily: later docs must not
    // all be fully novel (a broken join would score everything 1000)
    assert(rows.count(_._4 < 1000) > rows.length / 2,
      "expected most non-first docs to repeat earlier shingles")
  }

  test("q120: the incremental register fold equals the batch sketch exactly") {
    val batch = SketchQueries.q117(spark, sfDir).collect().map(_.toSeq)
    val folded = SketchQueries.q120(spark, sfDir).collect().map(_.toSeq)
    assert(batch.nonEmpty)
    assert(folded.toSeq == batch.toSeq,
      "HLL max-merge must be exactly order/partition independent")
  }

  test("q123: every quantile estimate lands within one bin width of the exact value") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfDir).select(
      col("l_returnflag").as("rf"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val widths = li.groupBy(col("rf"))
      .agg(((max(col("cents")) - min(col("cents"))) / SketchQueries.HistBins + 1)
        .cast("long").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SketchQueries.q123(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(rows.length == 3 * SketchQueries.HistQuantilesBp.size)
    rows.foreach { case (rf, q, est, exact) =>
      // est interpolates inside the bin that CONTAINS the exact kth value,
      // so the error is bounded by the bin width by construction
      assert(math.abs(est - exact) <= widths(rf),
        s"$rf q=$q: |$est - $exact| > width ${widths(rf)}")
    }
  }

  test("q118: probed-cell candidates rank by true ADC distance (plain recomputation)") {
    import org.apache.spark.sql.functions._
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1000000d).toLong).toArray, r.getInt(2))))
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // centroids: per-label element-wise floor-mean over the corpus
    val corpus = vecs.filter(_._1 >= 10)
    val cents: Map[Int, Array[Long]] = corpus.values.groupBy(_._2).map {
      case (l, vs) =>
        val dim = vs.head._1.length
        l -> Array.tabulate(dim) { i =>
          val xs = vs.map(_._1(i))
          math.floor(xs.sum.toDouble / xs.size).toLong
        }
    }
    def nearestCells(v: Array[Long], k: Int): Seq[Int] =
      cents.toSeq.map { case (l, c) => (d2(v, c), l) }.sorted.take(k).map(_._2)
    val got = PipelineQueries.q118(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (qid, _, nid, cell, _) =>
      val probed = nearestCells(vecs(qid)._1, 2)
      assert(probed.contains(cell.toInt), s"query $qid neighbor $nid cell $cell not probed")
      assert(nearestCells(vecs(nid)._1, 1).head == cell.toInt,
        s"neighbor $nid assigned to wrong cell")
    }
  }
}
