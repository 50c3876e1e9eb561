package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed batch-perceptron training for corpus quality classifiers —
  * the supervised half of a training-data filtering pipeline (a fastText-
  * style quality filter reduced to its integer-exact core so an external
  * SQL oracle can replay every epoch bit-for-bit).
  *
  * Algorithm: full-batch perceptron. Per epoch, with integer weights w:
  * a row (y, x) is misclassified when y * (w . x) <= 0; the epoch update
  * is w += sum over misclassified of y*x. All arithmetic is 64-bit
  * integer — no learning rate, no floats — so the weight trajectory is
  * exactly reproducible anywhere. On non-separable (or tiny-margin) data
  * the batch iterate oscillates; the standard answer is the POCKET rule:
  * keep the iterate with the fewest misclassifications (earliest epoch on
  * ties). `n_miss` reports the count under the weights ENTERING the epoch.
  *
  * Scale shape (the Lloyd's/BPE discipline): the feature table is built
  * map-side and cached; each epoch is one filter + partial-aggregated sum
  * whose single result row reaches the driver; weights ship back as plan
  * literals. Epoch cost is one cheap corpus pass; driver traffic is
  * O(epochs * n_features) scalars.
  */
object LinearClassifier {

  final case class Epoch(epoch: Long, w: Seq[Long], nMiss: Long)

  /** Train on `features` — a DataFrame with an integer label column
    * (+1/-1) and integer feature columns. Returns one Epoch per round with
    * the OUTGOING weights and the incoming-weight misclassification
    * count. */
  def trainBatchPerceptron(features: DataFrame, labelCol: String,
                           featureCols: Seq[String], epochs: Int): Seq[Epoch] = {
    val f = features.cache()
    try {
      var w = Seq.fill(featureCols.size)(0L)
      (1 to epochs).map { ep =>
        val y = col(labelCol)
        val dot = featureCols.zip(w)
          .map { case (c, wi) => col(c) * lit(wi) }
          .reduce(_ + _)
        val mis = f.filter(y * dot <= 0)
        val sums = featureCols.map(c => sum(y * col(c)))
        val agg = mis.agg(count(lit(1)), sums: _*).head()
        val nMiss = agg.getLong(0)
        w = w.zipWithIndex.map { case (wi, i) =>
          wi + (if (agg.isNullAt(i + 1)) 0L else agg.getLong(i + 1))
        }
        Epoch(ep.toLong, w, nMiss)
      }
    } finally { f.unpersist(); () }
  }

  /** The pocket epoch: fewest incoming misclassifications, earliest on
    * ties — the iterate a non-separable run would ship. */
  def pocketEpoch(run: Seq[Epoch]): Long = {
    val mm = run.map(_.nMiss).min
    run.filter(_.nMiss == mm).map(_.epoch).min
  }

  /** The pocket WEIGHTS — the iterate whose misclassification count the
    * pocket epoch reports, i.e. the weights ENTERING that epoch (each
    * Epoch row carries OUTGOING weights, so this is the previous row's w;
    * the zero vector for epoch 1). These are what inference ships. */
  def pocketWeights(run: Seq[Epoch]): Seq[Long] = {
    val e = pocketEpoch(run).toInt
    if (e <= 1) Seq.fill(run.head.w.size)(0L) else run(e - 2).w
  }

  /** Map-side scoring column: the integer dot product w . x. Inference
    * over a corpus is a pure projection — the trained weights ride the
    * plan as literals, so filtering 100 TB by classifier score shuffles
    * nothing (the fastText-quality-filter deployment shape). */
  def score(featureCols: Seq[String], weights: Seq[Long]): org.apache.spark.sql.Column = {
    require(featureCols.size == weights.size, "one weight per feature column")
    featureCols.zip(weights).map { case (c, w) => col(c) * lit(w) }.reduce(_ + _)
  }
}
