package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One purchase event on the wire (cents pre-floored to the money
  * convention so the fold is integer end to end). */
case class SpendEvent(user_id: Long, ts_us: Long, event_id: Long,
    cents: Long)

/** A lifetime-spend threshold crossing: WHICH milestone, WHEN, and the
  * exact cumulative at the crossing row. */
case class MilestoneHit(user_id: Long, threshold_cents: Long, ts_us: Long,
    cum_cents: Long)

/** Arbitrary stateful processing on Spark 4's `transformWithState`
  * API (the successor of `flatMapGroupsWithState` — typed state
  * handles, TTL, timers): per-user LIFETIME spend accumulated in a
  * [[ValueState]] across micro-batches, emitting one row the instant
  * the running total first crosses each fixed milestone. This is the
  * loyalty-tier / budget-alert primitive — and unlike a windowed
  * aggregation, the state is ONE long per user forever (bounded by
  * the user universe, not the stream), exactly what the new API's
  * typed value state is for.
  *
  * Determinism: within a micro-batch the input iterator's order is an
  * engine artifact, so the fold SORTS the batch's rows by
  * (ts_us, event_id) before accumulating — with event-time-ordered
  * arrivals across batches (the replay harness guarantees it; a
  * production deployment would pair this with watermarked
  * event-time ordering upstream) the emitted crossings equal the
  * batch cumulative-sum oracle row for row. Milestones fire at most
  * once by construction: the state can only grow, and a crossing
  * requires `prev < T ≤ next`. */
class SpendMilestones(thresholds: Seq[Long])
    extends StatefulProcessor[Long, SpendEvent, MilestoneHit] {

  @transient private var cum: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[SpendEvent],
      timers: TimerValues): Iterator[MilestoneHit] = {
    var c = if (cum.exists()) cum.get() else 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[MilestoneHit]
    rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).foreach { r =>
      val nc = c + r.cents
      thresholds.foreach { t =>
        if (c < t && nc >= t) out += MilestoneHit(key, t, r.ts_us, nc)
      }
      c = nc
    }
    cum.update(c)
    out.iterator
  }
}
