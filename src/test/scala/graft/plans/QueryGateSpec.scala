package graft.plans

import graft.SparkSpec
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** The readonly connection cap (db_builder.rb:62,131): admission-gated
  * concurrency with a hint on rejection, no queueing. */
class QueryGateSpec extends SparkSpec {
  import spark.implicits._

  test("over-limit queries are rejected with a hint; slots free on completion") {
    Seq(1, 2, 3).toDF("id").createOrReplaceTempView("gate_t")
    val gate = new ReadonlyGuard.QueryGate(limit = 2)

    val inGate = new CountDownLatch(2)
    val go = new CountDownLatch(1)
    val blockers = (1 to 2).map { _ =>
      val t = new Thread(() => {
        val r = gate.withSlot {
          inGate.countDown()
          go.await(10, TimeUnit.SECONDS)
          Right(())
        }
        assert(r.isRight)
      })
      t.start(); t
    }
    assert(inGate.await(10, TimeUnit.SECONDS))
    assert(gate.inFlight == 2)

    // both slots held: a real query is rejected, not queued
    val rejected = gate.run(spark, "SELECT id FROM gate_t")
    assert(rejected.isLeft)
    assert(rejected.swap.toOption.get.kind == "too_many_connections")

    go.countDown()
    blockers.foreach(_.join(10000))
    assert(gate.inFlight == 0)
    // slots released: admission works again, and the query actually runs
    val ok = gate.run(spark, "SELECT id FROM gate_t ORDER BY id")
    assert(ok.isRight)
    assert(ok.toOption.get.df.count() == 3)
  }
}
