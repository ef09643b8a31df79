package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Abandoned-click detection on EVENT-TIME TIMERS — the Spark 4
  * `transformWithState` showcase (the arbitrary-stateful-processing v2
  * API: typed state + registered timers + watermark-driven expiry).
  *
  * Semantics: a click is ABANDONED iff the same user makes no purchase
  * in the hour after it (click_ts < purchase_ts ≤ click_ts + 1h). The
  * batch twin (`stream_abandoned_clicks` in StreamingOps) is a
  * range-residual ANTI join; the inverse readout (purchases and the
  * clicks that preceded them) is the LEFT OUTER interval join — this op
  * completes the triptych with the TIMER rendering: the decision for a
  * click becomes final once the watermark passes click_ts + 1h (every
  * in-range purchase must have arrived), which is when its registered
  * timer — pinned at click_ts + 1h + 1 ms so the boundary purchase is
  * decided by construction, not by a Spark strictness convention —
  * fires. Nothing else in Structured Streaming emits ON state expiry;
  * flatMapGroupsWithState only reacts to input or group-timeout, not
  * per-element deadlines.
  *
  * State per user: pending (click_id, click_ts) list + an in-horizon
  * purchase-ts list, both bounded by the 1h window + watermark delay
  * (a purchase is dropped once the watermark passes it — any click it
  * could cover must already have arrived, or would be late beyond the
  * watermark contract and excluded by definition). One timer per
  * distinct click expiry. Out-of-order arrivals inside the watermark
  * are handled by construction: coverage is re-checked from state at
  * expiry, not at arrival. Scale: one shuffle on user_id; state and
  * timer count per key are window-bounded regardless of stream length.
  *
  * StreamingSpec replays the corpus through MemoryStream + RocksDB
  * state store and asserts (a) the emitted set equals the batch anti
  * join and (b) nothing emits before the watermark passes a click's
  * deadline.
  */
object AbandonedClicks {

  /** (event_id, user_id, event_type, event time) — the Timestamp rides
    * into the typed Dataset so the upstream watermark column survives
    * (TimeMode.EventTime requires it).
    */
  type Ev = (Long, Long, String, java.sql.Timestamp)
  /** (user_id, click_id, click_ts ms). */
  type Abandoned = (Long, Long, Long)

  val WindowMs: Long = 3600L * 1000

  class Processor extends StatefulProcessor[Long, Ev, Abandoned] {
    @transient private var pending: ListState[(Long, Long)] = _
    @transient private var purchases: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[(Long, Long)](
        "pending", Encoders.product[(Long, Long)], TTLConfig.NONE)
      purchases = getHandle.getListState[Long](
        "purchases", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Abandoned] = {
      val batch = rows.toArray
      val newClicks = batch.collect {
        case (id, _, "click", ts) => (id, ts.getTime)
      }
      val newPurch = batch.collect {
        case (_, _, "purchase", ts) => ts.getTime
      }
      if (newClicks.nonEmpty) {
        newClicks.foreach { case (_, ts) =>
          // +1 ms: the decision point is STRICTLY after the last
          // admissible purchase timestamp (p_ts <= ts + WindowMs), so
          // correctness never depends on Spark's strictness pairing
          // between timer firing (watermark vs expiry) and late-row
          // admission (row ts vs watermark) at the exact boundary
          // (ADVICE r17): when this timer fires, watermark >= expiry
          // > ts + WindowMs, so every boundary purchase is either in
          // state already or late-beyond-watermark by contract.
          getHandle.registerTimer(ts + WindowMs + 1)
        }
        pending.appendList(newClicks)
      }
      if (newPurch.nonEmpty) {
        // same EXACT prune as the timer phase (see below) — keeps the
        // purchase list window-bounded for purchase-heavy users whose
        // keys never register timers. Clicks whose timers fire later in
        // THIS batch are still in `pending`, so nothing they need drops.
        val wm = timerValues.getCurrentWatermarkInMs
        val pend = pending.get().toArray
        val kept = (purchases.get() ++ newPurch.iterator).toArray.distinct
          .filter(p => p >= wm ||
            pend.exists { case (_, ts) => ts < p && p <= ts + WindowMs })
        purchases.clear()
        if (kept.nonEmpty) purchases.put(kept)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Abandoned] = {
      val expiry = expiredTimerInfo.getExpiryTimeInMs
      val purch = purchases.get().toArray
      val (due, rest) = pending.get().toArray
        .partition { case (_, ts) => ts + WindowMs < expiry }
      pending.clear()
      if (rest.nonEmpty) pending.put(rest)
      // prune purchases EXACTLY against what can still need them: a
      // remaining pending click (coverage re-checked at ITS expiry) or
      // a future click, whose event time the watermark bounds below —
      // late rows under the watermark never reach the processor. An
      // arrival-time prune would race a multi-hour watermark jump
      // (input processes before this batch's timers, and dropping a
      // purchase there could orphan a click whose timer fires moments
      // later in the same micro-batch).
      val wm = timerValues.getCurrentWatermarkInMs
      val keptP = purch.distinct.filter(p => p >= wm ||
        rest.exists { case (_, ts) => ts < p && p <= ts + WindowMs })
      purchases.clear()
      if (keptP.nonEmpty) purchases.put(keptP)
      due.iterator.filterNot { case (_, ts) =>
        purch.exists(p => p > ts && p <= ts + WindowMs)
      }.map { case (id, ts) => (key, id, ts) }
    }
  }

  /** The streaming plan over a watermarked typed event stream — the
    * spec feeds a MemoryStream through this so the query and replay
    * share one construction.
    */
  def plan(events: Dataset[Ev]): Dataset[Abandoned] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e._3 == "click" || e._3 == "purchase")
      .groupByKey(_._2)
      .transformWithState(new Processor,
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[Abandoned])
  }
}
