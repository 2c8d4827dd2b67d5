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
  * State per key: the pending buffer (bounded by the watermark horizon ×
  * arrival rate, not by history) plus at most k longs of step times.
  * WITHOUT `idleTimeout`, the k-long prefix is retained forever, so keyed
  * state grows with the USER POPULATION (store TTLConfig cannot help:
  * Spark only permits it in ProcessingTime mode, and this processor is
  * event-time). With `idleTimeout = Some(d)`, a watermark-driven timer
  * clears a user's state once they have been silent for `d` past the
  * watermark — state then tracks the ACTIVE population. Trade-off: a user
  * who returns after `d` of silence restarts the funnel from step 1 and
  * may re-emit hits, the standard session-expiry semantics.
  */
object TwsFunnel {

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  final class Processor(k: Int, idleTimeoutMs: Option[Long] = None)
      extends StatefulProcessor[String, FunnelEvent, FunnelHit] {
    @transient private var pending: ListState[(Long, Long, Int, java.sql.Timestamp)] = _
    @transient private var times: ListState[Long] = _
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[(Long, Long, Int, java.sql.Timestamp)](
        "pending",
        Encoders.product[(Long, Long, Int, java.sql.Timestamp)], TTLConfig.NONE)
      times = getHandle.getListState[Long]("times",
        Encoders.scalaLong, TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long]("lastSeen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[FunnelHit] = {
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
          if (filled.length > before) times.put(filled.toArray)
          out
        }
      // Idle expiry: the cleanup timer armed at lastSeen+idle has fired,
      // the watermark confirms the silence, and nothing is still buffered
      // — drop the user's whole footprint. (A later-armed timer from
      // renewed activity will find wm < lastSeen+idle here and no-op.)
      idleTimeoutMs.foreach { idle =>
        if (rest.isEmpty && lastSeen.exists() &&
            timerValues.getCurrentWatermarkInMs >= lastSeen.get() + idle) {
          pending.clear(); times.clear(); lastSeen.clear()
        }
      }
      hits.iterator
    }
  }

  /** Match `ds` (already watermarked on `ts`, steps pre-mapped to 1..k)
    * against a k-step funnel; emits each reached step once, finalized.
    * `idleTimeoutMs`: drop a user's state after this much event-time
    * silence past the watermark (None = retain forever; see class doc).
    */
  def funnel(ds: Dataset[FunnelEvent], k: Int,
             idleTimeoutMs: Option[Long] = None): Dataset[FunnelHit] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.user)
      .transformWithState(new Processor(k, idleTimeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
