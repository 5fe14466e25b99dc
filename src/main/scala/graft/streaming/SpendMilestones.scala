package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** One purchase event on the wire (cents pre-floored to the money
  * convention so the fold is integer end to end). */
case class SpendEvent(user_id: Long, ts_us: Long, event_id: Long,
    cents: Long)

/** A lifetime-spend threshold crossing: WHICH milestone, WHEN, the
  * exact cumulative at the crossing row, and the crossing event's id —
  * the id makes any cross-engine diff name its rows (the round-11
  * driver-gate red was a hash-only mismatch on 179 equal-count rows;
  * without the id a differing row couldn't be traced to its event). */
case class MilestoneHit(user_id: Long, threshold_cents: Long, ts_us: Long,
    event_id: Long, cum_cents: Long)

/** Arbitrary stateful processing on Spark 4's `transformWithState`
  * API (the successor of `flatMapGroupsWithState` — typed state
  * handles, TTL, timers): per-user LIFETIME spend, emitting one row
  * the instant the running total first crosses each fixed milestone.
  * This is the loyalty-tier / budget-alert primitive.
  *
  * Determinism — ARRIVAL-ORDER-INDEPENDENT by construction (the round-10
  * gate flake was exactly an order dependence: the old processor folded
  * eagerly per micro-batch and relied on event-time-ordered arrival
  * ACROSS batches, so a multi-batch replay in file order could stamp a
  * crossing with the wrong row). The fix is the event-time-timer
  * pattern proven by [[FollowupTimers]]:
  *
  *   - `handleInputRows` only BUFFERS events in a [[ListState]] and
  *     registers an event-time timer just past the batch's max event
  *     time — it never folds, so within-batch iterator order and batch
  *     boundaries are irrelevant.
  *   - `handleExpiredTimer` folds, in (ts_us, event_id) order, exactly
  *     the buffered prefix the WATERMARK has sealed (`ts_ms <
  *     currentWatermark`): the watermark proves no earlier event can
  *     still arrive, so the fold prefix is complete and the emitted
  *     crossings equal the batch cumulative-sum oracle row for row no
  *     matter how the replay batches. Folded events are dropped from
  *     the buffer; only the one cumulative long survives — at
  *     steady-state the state is `cum` plus the un-sealed tail (≤ the
  *     watermark delay of events), not the user's full history.
  *
  * The query-side contract that makes every real row foldable on a
  * finite replay: a watermark delay LONGER than the corpus's event-time
  * span (no real row can ever be late-dropped, whatever order files
  * replay in) plus a sentinel row far enough past max event time that
  * the final watermark seals every real event (see
  * `ScaleQueries.streamMilestones`).
  *
  * Milestones fire at most once: the sealed fold is a prefix of the
  * user's total event-time order, the cumulative only grows, and a
  * crossing requires `prev < T ≤ next`. */
class SpendMilestones(thresholds: Seq[Long])
    extends StatefulProcessor[Long, SpendEvent, MilestoneHit] {

  @transient private var cum: ValueState[Long] = _
  @transient private var buf: ListState[SpendEvent] = _
  @transient private var lastTimerMs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
      TTLConfig.NONE)
    buf = getHandle.getListState[SpendEvent]("buf",
      Encoders.product[SpendEvent], TTLConfig.NONE)
    lastTimerMs = getHandle.getValueState[Long]("lastTimerMs",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[SpendEvent],
      timers: TimerValues): Iterator[MilestoneHit] = {
    var maxTsUs = Long.MinValue
    rows.foreach { r =>
      buf.appendValue(r)
      if (r.ts_us > maxTsUs) maxTsUs = r.ts_us
    }
    // One timer just past the batch's newest event: it fires once the
    // watermark seals that event, pulling the fold forward. Guard the
    // re-registration EXPLICITLY (a ValueState of the last expiry)
    // rather than leaning on TimerStateImpl's undocumented warn-skip of
    // duplicate (key, expiry) registrations. Skipping an expiry we
    // already registered is always safe: if that timer has since FIRED,
    // every event in this batch (ts ≤ maxTs < watermark) would have
    // been late-dropped before reaching us, so we cannot be here.
    if (maxTsUs != Long.MinValue) {
      val expiry = maxTsUs / 1000 + 1
      if (!lastTimerMs.exists() || lastTimerMs.get() != expiry) {
        getHandle.registerTimer(expiry)
        lastTimerMs.update(expiry)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[MilestoneHit] = {
    val sealedMs = timers.getCurrentWatermarkInMs()
    val all = buf.get().toSeq
    val (ready, later) = all.partition(_.ts_us / 1000 < sealedMs)
    if (ready.isEmpty) return Iterator.empty
    var c = if (cum.exists()) cum.get() else 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[MilestoneHit]
    ready.sortBy(r => (r.ts_us, r.event_id)).foreach { r =>
      val nc = c + r.cents
      thresholds.foreach { t =>
        if (c < t && nc >= t)
          out += MilestoneHit(key, t, r.ts_us, r.event_id, nc)
      }
      c = nc
    }
    cum.update(c)
    if (later.isEmpty) buf.clear()
    else buf.put(later.toArray)
    out.iterator
  }
}
