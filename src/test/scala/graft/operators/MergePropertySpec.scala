package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Differential property test for the central merge (U1-U4, E20): random
  * target snapshots and source batches are merged via `Merge.mergeBatch`
  * and compared against a naive per-key map reference implementing the same
  * contract — last-wins in-batch dedup by orderCol, monotonic updateWhere,
  * set-once and skip-nil column policies, and the change marker. */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  // row: (key, seq, ts, a, b) — a is set-once, b is skip-nil
  private type R = (Long, Long, Long, Option[String], Option[String])

  private val rowGen: Gen[R] = for {
    key <- Gen.chooseNum(0L, 30L) // small key space forces collisions
    seq <- Gen.chooseNum(0L, 1000000L)
    ts <- Gen.chooseNum(0L, 50L)
    a <- Gen.option(Gen.oneOf("a1", "a2", "a3"))
    b <- Gen.option(Gen.oneOf("b1", "b2", "b3"))
  } yield (key, seq, ts, a, b)

  private val spec = MergeSpec(
    keyCols = Seq("key"), orderCol = "seq",
    updateWhere = (t, s) => s("ts") > t("ts"),
    coalesceOnUpdate = Seq("a"),
    skipNilCols = Seq("b"))

  /** Naive reference: dedup source last-wins by (key, max seq) — seq ties
    * broken by max content hash, the retry-deterministic rule the merge
    * implements — then per-key insert/update/keep with the column policies.
    * `hash` supplies Spark's xxhash64 per row (the one piece of the
    * contract a naive model can't recompute natively). */
  private def reference(target: Seq[R], source: Seq[R],
                        hash: R => Long): Map[Long, (R, String)] = {
    val dedup = source.groupBy(_._1).view
      .mapValues(_.maxBy(r => (r._2, hash(r)))).toMap
    val tgt = target.map(r => r._1 -> r).toMap
    val out = scala.collection.mutable.Map.empty[Long, (R, String)]
    tgt.foreach { case (k, t) =>
      dedup.get(k) match {
        case Some(s) if s._3 > t._3 => // monotonic update
          val a = t._4.orElse(s._4)    // set-once: keep target unless null
          val b = s._5.orElse(t._5)    // skip-nil: source null keeps target
          out(k) = ((k, s._2, s._3, a, b), "update")
        case _ => out(k) = (t, "keep")
      }
    }
    dedup.foreach { case (k, s) =>
      if (!tgt.contains(k)) out(k) = (s, "insert")
    }
    out.toMap
  }

  test("merge matches the naive per-key reference on 40 random batch pairs") {
    val seed = org.scalacheck.rng.Seed(31L)
    val cases = Gen.listOfN(40,
      Gen.zip(Gen.listOfN(25, rowGen), Gen.listOfN(40, rowGen)))
      .apply(Gen.Parameters.default, seed).get
    cases.zipWithIndex.foreach { case ((targetRaw, source), i) =>
      // a valid target snapshot has unique keys
      val target = targetRaw.groupBy(_._1).values.map(_.head).toSeq
      val got = Merge.mergeBatch(
        target.toDF("key", "seq", "ts", "a", "b"),
        source.toDF("key", "seq", "ts", "a", "b"), spec)
        .collect()
        .map { r =>
          r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getLong(2),
            Option(r.getString(3)), Option(r.getString(4))), r.getString(5))
        }.toMap
      // the tie-break hash, computed once through Spark (sorted col order)
      val hashes: Map[R, Long] = source.toDF("key", "seq", "ts", "a", "b")
        .withColumn("__h", xxhash64(Seq("a", "b", "key", "seq", "ts").map(col): _*))
        .collect().map { r =>
          ((r.getLong(0), r.getLong(1), r.getLong(2),
            Option(r.getString(3)), Option(r.getString(4))), r.getLong(5))
        }.toMap
      val want = reference(target, source, hashes)
      assert(got == want, s"\ncase $i\n got=${got.toSeq.sortBy(_._1).take(5)}" +
        s"\nwant=${want.toSeq.sortBy(_._1).take(5)}")
    }
  }
}
