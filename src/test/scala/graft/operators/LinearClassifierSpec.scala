package graft.operators

import graft.SparkSpec

/** Batch perceptron + pocket: integer-exact training dynamics. */
class LinearClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("the exact hand-computed update trajectory (batch semantics, ties miss)") {
    // y = sign(x - 2.5) with features [bias, x]
    val f = Seq((1L, 1L, 4L), (1L, 1L, 3L), (-1L, 1L, 2L), (-1L, 1L, 1L))
      .toDF("y", "b", "x")
    val run = LinearClassifier.trainBatchPerceptron(f, "y", Seq("b", "x"), 3)
    // epoch 1: all 4 misclassified at w=0 (y*(0)<=0): update = sum y*[1,x]
    assert(run.head == LinearClassifier.Epoch(1, Seq(0L, 4L), 4))
    // w=(0,4): y*(4x)<=0 only for the two negatives -> update sum y*[1,x] = (-2,-3)
    assert(run(1) == LinearClassifier.Epoch(2, Seq(-2L, 1L), 2))
    // w=(-2,1): margins y*(x-2): +2,+1,0(tie->miss),+1 -> x=2 row updates (-1,-2)
    assert(run(2) == LinearClassifier.Epoch(3, Seq(-3L, -1L), 1))
    // NOTE batch perceptron CYCLES even on separable data (sequential
    // perceptron's convergence theorem does not apply to batch updates) —
    // which is exactly why pocketEpoch exists; no convergence asserted.
  }

  test("a margin-scaled separable feature converges and then freezes") {
    // single feature z with a wide margin: one batch update separates
    val f = Seq((1L, 10L), (1L, 8L), (-1L, -9L), (-1L, -11L)).toDF("y", "z")
    val run = LinearClassifier.trainBatchPerceptron(f, "y", Seq("z"), 4)
    assert(run.head == LinearClassifier.Epoch(1, Seq(38L), 4))
    // converged: every later epoch reports 0 miss and identical weights
    assert(run.tail.forall(e => e.nMiss == 0 && e.w == Seq(38L)))
  }

  test("pocket picks the minimum-miss epoch, earliest on ties") {
    val run = Seq(
      LinearClassifier.Epoch(1, Seq(0L), 10),
      LinearClassifier.Epoch(2, Seq(1L), 3),
      LinearClassifier.Epoch(3, Seq(2L), 7),
      LinearClassifier.Epoch(4, Seq(3L), 3))
    assert(LinearClassifier.pocketEpoch(run) == 2L)
  }

  test("corpus run is deterministic across replays") {
    val q = graft.queries.TextQueries.defs("q109_quality_classifier")
    val a = q(spark, sfDir).collect().toSeq
    val b = q(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.size == 8)
    assert(a.count(_.getBoolean(5)) == 1, "exactly one pocket epoch")
  }

  test("pocket weights are the iterate ENTERING the pocket epoch") {
    val run = Seq(
      LinearClassifier.Epoch(1, Seq(5L, 1L), 10),  // entered with zeros
      LinearClassifier.Epoch(2, Seq(7L, 2L), 3),   // entered with (5, 1)
      LinearClassifier.Epoch(3, Seq(9L, 3L), 7))   // entered with (7, 2)
    assert(LinearClassifier.pocketWeights(run) == Seq(5L, 1L),
      "epoch 2 reports n_miss under epoch 1's outgoing weights")
    // pocket at epoch 1 means the zero vector was never improved upon
    val runZero = Seq(LinearClassifier.Epoch(1, Seq(5L, 1L), 0))
    assert(LinearClassifier.pocketWeights(runZero) == Seq(0L, 0L))
  }

  test("score is the exact integer dot product, shipped as literals") {
    val f = Seq((2L, 3L), (-1L, 4L)).toDF("a", "b")
    val s = f.select(LinearClassifier.score(Seq("a", "b"), Seq(10L, -2L)).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(s == Seq(2L * 10 - 3 * 2, -1L * 10 - 4 * 2))
    // inference is a pure projection: no exchange in the plan
    val plan = f.select(LinearClassifier.score(Seq("a", "b"), Seq(1L, 1L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-side only, got:\n$plan")
  }
}
