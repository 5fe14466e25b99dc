package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One purchase on the wire. */
case class PurchaseTick(user_id: Long, ts_us: Long)

/** The report a purchase's timer emits exactly `window` after it: how
  * many follow-up purchases the user made inside the window. */
case class FollowupReport(user_id: Long, purchase_ts_us: Long,
    followups: Long)

/** EVENT-TIME TIMERS on Spark 4's `transformWithState` — the API
  * surface q281's milestone processor doesn't touch: every purchase
  * registers a timer at `ts + window`; when the event-time watermark
  * passes it, [[handleExpiredTimer]] emits the purchase's
  * follow-up-window report (`count of the user's purchases in
  * (ts, ts+window]`). This is the delayed-evaluation primitive —
  * "N days after X, summarize what happened since" (retention
  * check-ins, return-window audits, label maturation for churn
  * models) — and the WATERMARK is what makes it sound: a timer fires
  * only once the watermark proves the window closed, so the count is
  * complete regardless of how the replay batches (an event inside the
  * window arriving after the timer fired would have to be later than
  * the watermark — excluded by watermark semantics).
  *
  * State: the user's purchase history in a [[ListState]] (appended on
  * arrival) and the timers themselves. Timers live in MILLISECONDS;
  * registration uses `ts_us div 1000 + window_ms`, and expiry recovers
  * its anchor purchases by matching stored micros at ms granularity —
  * two same-millisecond purchases share a timer and each emits its own
  * report (timer registration is idempotent per (key, expiry)).
  *
  * Determinism: reports are a pure function of the user's event-time
  * history; batch boundaries only affect WHEN a report emits, never
  * its content. The q267 sentinel row pushes the final watermark past
  * every real timer so the finite replay emits all of them; the
  * sentinel's own timer never fires (the watermark stops short of it)
  * and is the one row the replay intentionally leaves in state. */
class FollowupTimers(windowUs: Long)
    extends StatefulProcessor[Long, PurchaseTick, FollowupReport] {
  require(windowUs % 1000 == 0, "window must be whole milliseconds")

  @transient private var hist: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getListState[Long]("hist", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[PurchaseTick],
      timers: TimerValues): Iterator[FollowupReport] = {
    val ts = rows.map(_.ts_us).toSeq
    ts.foreach(t => hist.appendValue(t))
    ts.map(t => t / 1000 + windowUs / 1000).distinct
      .foreach(getHandle.registerTimer)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[FollowupReport] = {
    val fireMs = expired.getExpiryTimeInMs
    val anchorMs = fireMs - windowUs / 1000
    val all = hist.get().toSeq
    all.filter(_ / 1000 == anchorMs).map { t =>
      FollowupReport(key, t, all.count(x => x > t && x <= t + windowUs))
    }.iterator
  }
}
