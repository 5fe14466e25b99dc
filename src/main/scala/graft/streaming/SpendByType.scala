package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** One event on the wire (any type, cents pre-floored). */
case class TypedEvent(user_id: Long, ts_us: Long, event_type: String,
    cents: Long)

/** The per-(user, type) lifetime rollup a flush emits. */
case class TypeTotal(user_id: Long, event_type: String, n_events: Long,
    cents: Long)

/** Running tally per event type. */
case class Tally(n: Long, cents: Long)

/** MAP STATE on Spark 4's `transformWithState` — the third typed-state
  * shape of the processor family (q281 folds a ValueState + buffer,
  * q285 replays a ListState under timers): one `MapState[event_type →
  * Tally]` per user, accumulating the per-type lifetime engagement
  * profile (counts + spend). The map is the natural state for keyed
  * sub-aggregates a windowed groupBy cannot hold per entity forever —
  * per-user per-category counters, feature-store rows, rate-limit
  * ledgers — and the point of MapState over a ValueState[Map] is
  * per-entry updates: the store touches ONE (type → tally) entry per
  * event, never rewriting the whole map.
  *
  * Determinism: counts and cent sums are commutative-associative, so
  * the final map is a pure function of the event SET — arrival order
  * and batch boundaries cannot change it. Emission happens exactly
  * once per user, at a fixed far-future event-time timer only the
  * replay's flush sentinel can seal (`flushAtMs` sits above every
  * real event but below the sentinel-driven final watermark), so the
  * output equals the batch GROUP BY oracle row for row. */
class SpendByType(flushAtMs: Long)
    extends StatefulProcessor[Long, TypedEvent, TypeTotal] {

  @transient private var totals: MapState[String, Tally] = _
  @transient private var flushArmed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getMapState[String, Tally]("totals",
      Encoders.STRING, Encoders.product[Tally], TTLConfig.NONE)
    flushArmed = getHandle.getValueState[Boolean]("flushArmed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
      timers: TimerValues): Iterator[TypeTotal] = {
    rows.foreach { r =>
      val cur =
        if (totals.containsKey(r.event_type)) totals.getValue(r.event_type)
        else Tally(0L, 0L)
      totals.updateValue(r.event_type,
        Tally(cur.n + 1L, cur.cents + r.cents))
    }
    // Arm the single flush timer ONCE per key (explicit ValueState
    // guard): re-registering the same (key, expiry) every micro-batch
    // leaned on TimerStateImpl's undocumented warn-skip of duplicates.
    // The flush expiry is fixed and only the sentinel-driven final
    // watermark can reach it, so events can never arrive after it fired.
    if (!flushArmed.exists()) {
      getHandle.registerTimer(flushAtMs)
      flushArmed.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[TypeTotal] = {
    val out = totals.iterator().map { case (t, tally) =>
      TypeTotal(key, t, tally.n, tally.cents)
    }.toVector
    totals.clear()
    out.iterator
  }
}
