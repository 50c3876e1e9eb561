package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based fuzzing of the versioned snapshot store — the storage
  * analogue of [[StoreFuzzSpec]]. A seeded random schedule interleaves
  * `mergeInto` batches (fresh, stale, and duplicate-key rows),
  * `compact`/`maybeCompact`, retention `vacuum`, `readAt` time travel,
  * and version `diff`s, and checks EVERY state against an in-memory
  * reference model (a plain Map): the committed snapshot equals the
  * model after every operation, every retained version replays its
  * recorded model state, every pairwise diff equals the model diff,
  * vacuum retains exactly the documented window, and a vacuumed
  * version's readAt raises rather than resurrecting.
  *
  * The merge semantics modeled are the reference's conditional-upsert
  * discipline: in-batch last-wins by the order column (U4), and a
  * matched row overwrites only when strictly newer (U2 monotonic
  * updateWhere) — stale replays land as no-ops, inserts are
  * unconditional. Schedules are deterministic per seed and failures
  * print the schedule. */
class SnapshotFuzzSpec extends SparkSpec {
  import spark.implicits._

  private case class V(ord: Long, v: Long)

  private val mspec = MergeSpec(
    keyCols = Seq("k"), orderCol = "ord",
    updateWhere = (t, s) => s("ord") > t("ord"))

  private def df(rows: Seq[(String, Long, Long)]): DataFrame =
    rows.toDF("k", "ord", "v")

  private def readModel(d: DataFrame, ctx: => String): Map[String, V] = {
    val rows = d.select("k", "ord", "v").collect()
      .map(r => (r.getString(0), V(r.getLong(1), r.getLong(2)))).toSeq
    assert(rows.map(_._1).distinct.size == rows.size,
      s"$ctx: duplicate keys in snapshot: $rows")
    rows.toMap
  }

  for (seed <- Seq(11L, 23L)) {
    test(s"snapshot store: random merge/compact/vacuum/time-travel schedule matches the model (seed $seed)") {
      val r = new java.util.Random(seed)
      val dir = java.nio.file.Files.createTempDirectory("snapfuzz").toString
      val keys = (0 until 30).map(i => f"key$i%02d")
      var ordSeq = 0L
      // random batch: mostly fresh monotone ords, ~1/4 stale (must land as
      // no-ops against a newer stored row), duplicate keys WITHIN a batch
      // allowed (the in-batch last-wins path) but (k, ord) kept unique so
      // the max-ord winner is well-defined
      def batch(n: Int): Seq[(String, Long, Long)] = {
        val raw = (0 until n).map { _ =>
          val k = keys(r.nextInt(keys.size))
          val ord =
            if (ordSeq > 0 && r.nextInt(4) == 0) r.nextInt(ordSeq.toInt).toLong
            else { ordSeq += 1; ordSeq }
          (k, ord, r.nextInt(1000).toLong)
        }
        raw.groupBy(x => (x._1, x._2)).values.map(_.head).toSeq
      }
      var model = Map.empty[String, V]
      var hist = Map.empty[Long, Map[String, V]]
      var steps = List.empty[String]
      def ctx = s"seed=$seed schedule=${steps.reverse.mkString(",")}"
      def version: Long = PartitionedStore.currentManifest(dir).get.version
      def applyBatch(rows: Seq[(String, Long, Long)]): Unit =
        rows.groupBy(_._1).foreach { case (k, rs) =>
          val w = rs.maxBy(_._2) // in-batch last-wins by ord
          model.get(k) match {
            case None => model += k -> V(w._2, w._3)
            case Some(st) if w._2 > st.ord => model += k -> V(w._2, w._3)
            case _ => () // stale replay: strictly-newer-only overwrite
          }
        }
      def checkCurrent(): Unit = {
        assert(readModel(PartitionedStore.read(spark, dir), ctx) == model,
          s"$ctx: committed snapshot != model")
        hist += version -> model
      }

      // genesis snapshot: unique keys (write() is a raw full snapshot)
      val init = batch(8).groupBy(_._1).values.map(_.maxBy(_._2)).toSeq
      PartitionedStore.write(df(init), dir, "k", 8)
      applyBatch(init)
      steps ::= "write"
      checkCurrent()

      for (_ <- 0 until 14) {
        r.nextInt(10) match {
          case 0 | 1 | 2 | 3 | 4 =>
            val b = batch(r.nextInt(6) + 1)
            PartitionedStore.mergeInto(spark, dir, df(b), mspec, "k", 8)
            applyBatch(b)
            steps ::= s"merge(${b.size})"
            checkCurrent()
          case 5 =>
            PartitionedStore.compact(spark, dir)
            steps ::= "compact"
            checkCurrent() // same data, maybe a new version
          case 6 =>
            PartitionedStore.maybeCompact(spark, dir, maxEpochs = 3)
            steps ::= "maybeCompact"
            checkCurrent()
          case 7 =>
            val retain = r.nextInt(3) + 1
            val before = PartitionedStore.versions(dir)
            PartitionedStore.vacuum(dir, retain)
            steps ::= s"vacuum($retain)"
            val after = PartitionedStore.versions(dir)
            assert(after == before.takeRight(retain + 1),
              s"$ctx: vacuum retained $after, expected ${before.takeRight(retain + 1)}")
            val dropped = before.dropRight(retain + 1)
            hist = hist.view.filterKeys(after.toSet).toMap
            dropped.lastOption.foreach { v =>
              intercept[IllegalArgumentException] {
                PartitionedStore.readAt(spark, dir, v)
              }
            }
            checkCurrent()
          case 8 =>
            val vs = PartitionedStore.versions(dir).filter(hist.contains)
            val v = vs(r.nextInt(vs.size))
            steps ::= s"readAt($v)"
            assert(readModel(PartitionedStore.readAt(spark, dir, v), ctx) == hist(v),
              s"$ctx: readAt($v) != recorded model state")
          case _ =>
            val vs = PartitionedStore.versions(dir).filter(hist.contains)
            val a = vs(r.nextInt(vs.size)); val b = vs(r.nextInt(vs.size))
            val (from, to) = if (a <= b) (a, b) else (b, a)
            steps ::= s"diff($from,$to)"
            val exp: Set[(String, String)] =
              (hist(from).keySet ++ hist(to).keySet).flatMap { k =>
                (hist(from).get(k), hist(to).get(k)) match {
                  case (None, Some(_)) => Some(k -> "added")
                  case (Some(_), None) => Some(k -> "removed")
                  case (Some(x), Some(y)) if x != y => Some(k -> "changed")
                  case _ => None
                }
              }
            val got = PartitionedStore.diff(spark, dir, from, to, Seq("k"))
              .collect().map(x => x.getString(0) -> x.getString(1)).toSet
            assert(got == exp, s"$ctx: diff($from,$to) $got != model $exp")
        }
      }
    }
  }

  test("concurrent writers: every merge lands, final state is interleaving-independent") {
    // With strictly-newer-only overwrite, unconditional insert, and
    // GLOBALLY UNIQUE order values, per-key merge outcomes commute: the
    // final snapshot is the per-key argmax-ord row over the union of all
    // batches, whatever order the writer lock grants. So N parallel
    // writers have ONE deterministic expected state — any divergence
    // means a lost update, a torn manifest, or a lock failure. The
    // version count additionally proves no merge was silently dropped.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("snapconc").toString
    val keys = (0 until 20).map(i => f"key$i%02d")
    val init = keys.take(6).zipWithIndex.map { case (k, i) => (k, i.toLong, 0L) }
    PartitionedStore.write(df(init), dir, "k", 8)
    val writers = 4; val rounds = 3
    // thread t, round j draws from its own seeded rng and its own
    // disjoint ord block — deterministic content, racy schedule
    def mkBatch(t: Int, j: Int): Seq[(String, Long, Long)] = {
      val r = new java.util.Random(t * 100L + j)
      val base = 1000L + (t * rounds + j) * 100L
      (0 until r.nextInt(5) + 2).zipWithIndex.map { case (_, i) =>
        (keys(r.nextInt(keys.size)), base + i, r.nextInt(1000).toLong)
      }
    }
    val all = for (t <- 0 until writers; j <- 0 until rounds) yield mkBatch(t, j)
    val fs = (0 until writers).map { t =>
      Future {
        (0 until rounds).foreach { j =>
          PartitionedStore.mergeInto(spark, dir, df(mkBatch(t, j)), mspec, "k", 8)
        }
      }
    }
    Await.result(Future.sequence(fs), 5.minutes)
    val expected = (init ++ all.flatten).groupBy(_._1).map { case (k, rs) =>
      val w = rs.maxBy(_._2); k -> V(w._2, w._3)
    }
    assert(readModel(PartitionedStore.read(spark, dir), "concurrent") == expected)
    assert(PartitionedStore.currentManifest(dir).get.version ==
      1L + writers * rounds,
      "every concurrent merge must land as exactly one committed version")
  }
}
