package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One tagged record of the as-of stream: left rows are the events to
  * enrich, right rows the versioned reference data ("config updates").
  * Payloads ride as strings (JSON via `to_json` for structured sides) —
  * the same envelope discipline as the other typed streaming operators.
  */
final case class AsofEvent(key: String, ts: java.sql.Timestamp,
                           isLeft: Boolean, payload: String)

/** A left row filled with the latest right at-or-before its event time
  * (`fill_ts`/`fill` null when no such right exists — left-join
  * semantics, same contract as the batch `AsofJoin.latestAtOrBefore`).
  */
final case class AsofFilled(key: String, ts: java.sql.Timestamp,
                            payload: String, fill_ts: java.sql.Timestamp,
                            fill: String)

/** STREAMING as-of enrichment — the fourth member of the as-of family
  * (composition / native Catalyst / hot-key ranged are the batch forms):
  * "latest config at event time" over two live streams, on Spark 4's
  * `transformWithState`.
  *
  * Correct event-time semantics under out-of-order arrival: a left row
  * is held in state until the WATERMARK passes its timestamp — only then
  * can no earlier-or-equal right still arrive (the engine drops
  * later-than-horizon rows) — and is emitted exactly once, filled from
  * the buffered right timeline. Per-key state is the pending-left buffer
  * plus the right timeline, and the timeline is evicted on every timer
  * firing down to the single latest right at-or-before the watermark
  * (all earlier rights are unreachable by any future left, whose ts must
  * exceed the watermark) — so state is bounded by the watermark horizon,
  * not the stream length. Emission is driven by event-time timers, so a
  * key with no further traffic still flushes when the watermark moves.
  *
  * Tie semantics match the batch operator (inclusive: a right at exactly
  * the left's timestamp fills); rights must be unique per (key, ts), the
  * same precondition both engines document. Stream ≡ batch is pinned by
  * TwsAsofSpec against `AsofJoin.latestAtOrBefore`.
  */
object TwsAsof {

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  final class Processor(toleranceMicros: Long)
      extends StatefulProcessor[String, AsofEvent, AsofFilled] {
    @transient private var rights: ListState[(Long, String)] = _
    @transient private var pending: ListState[(Long, java.sql.Timestamp, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      rights = getHandle.getListState[(Long, String)]("rights",
        Encoders.product[(Long, String)], TTLConfig.NONE)
      pending = getHandle.getListState[(Long, java.sql.Timestamp, String)]("pending",
        Encoders.product[(Long, java.sql.Timestamp, String)], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[AsofEvent],
                                 timerValues: TimerValues): Iterator[AsofFilled] = {
      val timers = scala.collection.mutable.Set.empty[Long]
      rows.foreach { e =>
        if (e.isLeft) {
          pending.appendValue((micros(e.ts), e.ts, e.payload))
          // fire strictly after the watermark passes the left's ts
          timers += e.ts.getTime + 1L
        } else {
          rights.appendValue((micros(e.ts), e.payload))
        }
      }
      timers.foreach(getHandle.registerTimer)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[AsofFilled] = {
      val wm = timerValues.getCurrentWatermarkInMs * 1000L
      val (ready, rest) = pending.get().toVector.partition(_._1 <= wm)
      if (ready.isEmpty) return Iterator.empty
      if (rest.isEmpty) pending.clear() else pending.put(rest.toArray)

      val timeline = rights.get().toVector.sortBy(_._1)
      // evict: every right except the latest at-or-before the watermark is
      // unreachable by any future left (future ts > wm >= evicted ts)
      val (old, live) = timeline.partition(_._1 <= wm)
      val kept = old.lastOption.toVector ++ live
      if (kept.length != timeline.length) {
        if (kept.isEmpty) rights.clear() else rights.put(kept.toArray)
      }

      ready.iterator.map { case (ts, tsRaw, payload) =>
        // latest right at-or-before (inclusive tie, batch parity)
        var fill: (Long, String) = null
        var i = 0
        while (i < timeline.length && timeline(i)._1 <= ts) {
          fill = timeline(i); i += 1
        }
        // staleness bound, batch parity: a right older than the
        // tolerance no longer fills
        if (fill != null && toleranceMicros >= 0 &&
            ts - fill._1 > toleranceMicros) fill = null
        if (fill == null) AsofFilled(key, tsRaw, payload, null, null)
        else {
          // micros-exact reconstruction of the right timestamp
          val ft = new java.sql.Timestamp(fill._1 / 1000000L * 1000L)
          ft.setNanos(((fill._1 % 1000000L) * 1000L).toInt)
          AsofFilled(key, tsRaw, payload, ft, fill._2)
        }
      }
    }
  }

  /** Enrich the left rows of a WATERMARKED `AsofEvent` stream (caller
    * applies `.withWatermark("ts", delay)`; the delay is the lateness
    * bound for both sides).
    */
  def enrich(events: Dataset[AsofEvent],
             toleranceMicros: Long = -1L): Dataset[AsofFilled] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.groupByKey(_.key)
      .transformWithState(new Processor(toleranceMicros),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
