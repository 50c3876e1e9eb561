package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming replay filter (§2.11 at scale): webhook redelivery is
  * at-least-once, and while the idempotent merge makes replays harmless
  * (U1/U2 — correctness never depends on this operator), every replayed row
  * still pays projection + shuffle + merge. At 100 TB the cheap fix is a
  * keyed pre-filter in front of the merge: `flatMapGroupsWithState` keeps
  * ONE long per key (the highest ingest sequence seen) and drops rows at or
  * below it. State is bounded by (distinct keys in the timeout window) x
  * 8 bytes, and a processing-time timeout evicts idle keys — the merge
  * behind it remains the correctness backstop for anything evicted.
  */
object StatefulDedup {

  /** (remote key, ingest seq, body). */
  type Keyed = (String, Long, String)

  val DefaultTimeout: String = "30 minutes"

  /** Drop rows whose (key, seq) is not strictly newer than the last seen
    * seq for the key. Works on both streaming and batch Datasets (Spark
    * runs mapGroupsWithState per-batch in batch mode).
    *
    * `idleTimeout = Some(d)` evicts idle keys after `d` (bounded state for
    * long-running queries; note a processing-time timeout makes the engine
    * schedule timeout-check batches even with no data). `None` keeps state
    * for the query lifetime — right for AvailableNow/batch-style runs. */
  def dropReplays(events: Dataset[Keyed],
                  idleTimeout: Option[String] = Some(DefaultTimeout)): Dataset[Keyed] = {
    implicit val stringEnc: Encoder[String] = Encoders.STRING
    implicit val keyedEnc: Encoder[Keyed] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.STRING)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Long, Keyed](OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[Keyed], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val lastSeen = state.getOption.getOrElse(Long.MinValue)
            // within the batch: keep ascending-seq rows once each (the
            // in-batch last-wins dedup downstream still applies U4)
            var high = lastSeen
            val fresh = rows.toSeq.sortBy(_._2).filter { r =>
              val keep = r._2 > high
              if (keep) high = r._2
              keep
            }
            if (high > lastSeen) state.update(high)
            idleTimeout.foreach(state.setTimeoutDuration)
            fresh.iterator
          }
      }
  }
}
