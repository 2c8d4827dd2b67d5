package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One raw event in a user's stream. */
final case class SessEvent(user: String, ts: java.sql.Timestamp, eventId: Long)

/** The event with its assigned session label (1-based per-user ordinal). */
final case class SessLabeled(user: String, eventId: Long,
                             ts: java.sql.Timestamp, sessionId: Long)

/** Streaming row-level sessionization (transformWithState): the
  * continuous form of `operators/Sessionize.withSessionIds` — every event
  * gets its gap-based session ordinal, assigned once the watermark
  * guarantees no earlier event can still arrive.
  *
  * Mechanics: events buffer in keyed state with a timer at ts+1; when the
  * watermark passes, the ready prefix is drained in (ts, eventId) order
  * through two scalars of durable state — the last emitted timestamp and
  * the running session count. A gap >= `gapSeconds` since the last
  * emitted event starts a new session, exactly the batch operator's
  * `lag`-based predicate, so stream == batch on the same rows
  * (spec-pinned).
  *
  * State per key: the pending buffer (bounded by watermark lag x arrival
  * rate — NOT by history) plus two longs. At 100 TB of events the state
  * is the in-flight horizon only; completed sessions occupy zero state,
  * unlike a buffered session_window aggregate, and the per-event label
  * lets downstream session-scoped joins run without re-aggregating.
  */
object TwsSessionize {

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  final class Processor(gapMicros: Long)
      extends StatefulProcessor[String, SessEvent, SessLabeled] {
    @transient private var pending: ListState[(Long, Long, java.sql.Timestamp)] = _
    @transient private var lastTs: ValueState[Long] = _
    @transient private var sessions: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[(Long, Long, java.sql.Timestamp)]("pending",
        Encoders.product[(Long, Long, java.sql.Timestamp)], TTLConfig.NONE)
      lastTs = getHandle.getValueState[Long]("lastTs",
        Encoders.scalaLong, TTLConfig.NONE)
      sessions = getHandle.getValueState[Long]("sessions",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[SessEvent],
                                 timerValues: TimerValues): Iterator[SessLabeled] = {
      val timers = scala.collection.mutable.Set.empty[Long]
      rows.foreach { e =>
        pending.appendValue((micros(e.ts), e.eventId, e.ts))
        timers += e.ts.getTime + 1L
      }
      timers.foreach(getHandle.registerTimer)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessLabeled] = {
      val wm = timerValues.getCurrentWatermarkInMs * 1000L
      val (ready, rest) = pending.get().toVector.partition(_._1 <= wm)
      if (ready.isEmpty) return Iterator.empty
      if (rest.isEmpty) pending.clear() else pending.put(rest.toArray)

      var last: Option[Long] = if (lastTs.exists()) Some(lastTs.get()) else None
      var count: Long = if (sessions.exists()) sessions.get() else 0L
      val out = ready.sortBy(e => (e._1, e._2)).map { case (tsMic, id, tsRaw) =>
        if (last.forall(l => tsMic - l >= gapMicros)) count += 1L
        last = Some(tsMic)
        SessLabeled(key, id, tsRaw, count)
      }
      lastTs.update(last.get)
      sessions.update(count)
      out.iterator
    }
  }

  /** Label `ds` (already watermarked on `ts`) with per-user gap sessions. */
  def sessionize(ds: Dataset[SessEvent], gapSeconds: Long): Dataset[SessLabeled] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.user)
      .transformWithState(new Processor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
