package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One funnel-relevant event: `step` is the 1-based index of the event's
  * type in the funnel definition (the caller maps types → indices).
  */
final case class FunnelEvent(user: String, ts: java.sql.Timestamp,
                             eventId: Long, step: Int)

/** A finalized funnel transition: the user reached `step` at `ts`. */
final case class FunnelHit(user: String, step: Int, ts: java.sql.Timestamp)

/** Streaming funnel matching (transformWithState): the continuous form of
  * `operators/Funnel.funnelTimes` — greedy earliest-occurrence step
  * times, each step emitted exactly once, the moment the watermark
  * guarantees no earlier event can still arrive.
  *
  * Mechanics: events buffer in keyed state with a timer at ts+1; when the
  * watermark passes, the ready prefix is drained in (ts, eventId) order
  * against the user's filled-step prefix: an event of step j+1 strictly
  * after t_j (or any step-1 event when nothing is filled) extends the
  * prefix and emits a [[FunnelHit]]. Because the drain is in event-time
  * order, the first qualifying occurrence IS the greedy-earliest one, so
  * stream ≡ batch on the same rows (spec-pinned, out-of-order arrivals
  * included) — greedy is optimal for reachability, see the batch
  * operator's doc.
  *
  * State per key: IN-FLIGHT users carry the pending buffer (bounded by
  * the watermark horizon × arrival rate, not by history) plus at most k
  * longs of step times. On COMPLETION (step k finalized) the processor
  * clears all three states and collapses the user to one 8-byte `done`
  * stamp — later events for a done user are dropped on arrival, never
  * buffered, so each step still emits exactly once ever (the stamp is the
  * information-theoretic minimum for that guarantee; the reference's
  * idempotency store keeps the same marker,
  * BaseEventConsumer.java:188-196). Store TTLConfig cannot expire any of
  * this: Spark only permits it in ProcessingTime mode and this processor
  * is event-time — expiry is therefore timer-driven. With `idleTimeout =
  * Some(d)`: a watermark-driven timer clears an in-flight user's state
  * after `d` of event-time silence, AND expires a completed user's `done`
  * stamp `d` past completion — keyed state is then O(active users), the
  * reference's expire-everything posture. Trade-off: a user who returns
  * after `d` restarts the funnel from step 1 and may re-emit hits, the
  * standard session-expiry semantics.
  */
object TwsFunnel {

  /** Default idle timeout: the reference's 7-day event max-age
    * (`BaseEventConsumer.java:153-154`, `Duration.ofDays(7)`) — the same
    * horizon its idempotency store expires on. With this default, keyed
    * state is bounded at O(users active in the last 7 event-time days)
    * out of the box; pass `idleTimeoutMs = None` explicitly to retain
    * forever (exactly-once step emission across ANY gap, unbounded done
    * stamps — the pre-r9 default, now opt-in).
    */
  val DefaultIdleTimeoutMs: Long = 7L * 24 * 60 * 60 * 1000

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  final class Processor(k: Int, idleTimeoutMs: Option[Long] = Some(DefaultIdleTimeoutMs))
      extends StatefulProcessor[String, FunnelEvent, FunnelHit] {
    @transient private var pending: ListState[(Long, Long, Int, java.sql.Timestamp)] = _
    @transient private var times: ListState[Long] = _
    @transient private var lastSeen: ValueState[Long] = _
    @transient private var done: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[(Long, Long, Int, java.sql.Timestamp)](
        "pending",
        Encoders.product[(Long, Long, Int, java.sql.Timestamp)], TTLConfig.NONE)
      times = getHandle.getListState[Long]("times",
        Encoders.scalaLong, TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long]("lastSeen",
        Encoders.scalaLong, TTLConfig.NONE)
      // completion stamp (event-time ms of step k): the only state a
      // finished user keeps; expired by timer when idleTimeoutMs is set
      done = getHandle.getValueState[Long]("done",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[FunnelHit] = {
      // a completed user's events are dropped on arrival — nothing can
      // emit past step k, so buffering them would be pure state growth
      if (done.exists()) return Iterator.empty
      val timers = scala.collection.mutable.Set.empty[Long]
      var maxTs = 0L
      rows.foreach { e =>
        if (e.step >= 1 && e.step <= k) {
          pending.appendValue((micros(e.ts), e.eventId, e.step, e.ts))
          timers += e.ts.getTime + 1L
          if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
        }
      }
      idleTimeoutMs.foreach { idle =>
        if (maxTs > 0L) {
          if (!lastSeen.exists() || maxTs > lastSeen.get()) lastSeen.update(maxTs)
          timers += lastSeen.get() + idle
        }
      }
      timers.foreach(getHandle.registerTimer)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelHit] = {
      val wm = timerValues.getCurrentWatermarkInMs * 1000L
      val (ready, rest) = pending.get().toVector.partition(_._1 <= wm)
      val hits =
        if (ready.isEmpty) Vector.empty[FunnelHit]
        else {
          if (rest.isEmpty) pending.clear() else pending.put(rest.toArray)
          var filled = times.get().toVector
          val before = filled.length
          val out = ready.sortBy(e => (e._1, e._2)).flatMap {
            case (tsMic, _, step, tsRaw) =>
              val j = filled.length
              if (j < k && step == j + 1 && (j == 0 || tsMic > filled(j - 1))) {
                filled = filled :+ tsMic
                Some(FunnelHit(key, step, tsRaw))
              } else None
          }
          if (filled.length > before) {
            if (filled.length == k) {
              // funnel COMPLETE — terminal: no event can ever extend past
              // step k, so the buffer and the k step times are dead
              // weight. Collapse to the 8-byte done stamp (and schedule
              // its own expiry when an idle timeout is configured).
              val doneMs = filled.last / 1000L
              pending.clear(); times.clear(); lastSeen.clear()
              done.update(doneMs)
              idleTimeoutMs.foreach(idle => getHandle.registerTimer(doneMs + idle))
            } else times.put(filled.toArray)
          }
          out
        }
      idleTimeoutMs.foreach { idle =>
        // Idle expiry: the cleanup timer armed at lastSeen+idle has fired,
        // the watermark confirms the silence, and nothing is still buffered
        // — drop the user's whole footprint. (A later-armed timer from
        // renewed activity will find wm < lastSeen+idle here and no-op.)
        if (!done.exists() && rest.isEmpty && lastSeen.exists() &&
            timerValues.getCurrentWatermarkInMs >= lastSeen.get() + idle) {
          pending.clear(); times.clear(); lastSeen.clear()
        }
        // Done-stamp expiry: `idle` past completion, forget the user
        // entirely — state returns to O(in-flight + recently-done), the
        // reference idempotency store's expire-everything posture. A user
        // returning later restarts from step 1 (documented trade-off).
        if (done.exists() &&
            timerValues.getCurrentWatermarkInMs >= done.get() + idle) {
          done.clear()
        }
      }
      hits.iterator
    }
  }

  /** Match `ds` (already watermarked on `ts`, steps pre-mapped to 1..k)
    * against a k-step funnel; emits each reached step once, finalized.
    * `idleTimeoutMs`: drop a user's state after this much event-time
    * silence past the watermark (defaults to the reference's 7-day
    * max-age, [[DefaultIdleTimeoutMs]]; None = retain forever, opt-in —
    * see class doc).
    */
  def funnel(ds: Dataset[FunnelEvent], k: Int,
             idleTimeoutMs: Option[Long] = Some(DefaultIdleTimeoutMs)): Dataset[FunnelHit] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.user)
      .transformWithState(new Processor(k, idleTimeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
