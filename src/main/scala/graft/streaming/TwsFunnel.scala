package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Continuous funnel tracking — the streaming form of
  * [[graft.operators.Funnel]]: per-user state advances through the step
  * list as matching events arrive, emitting one row per advance. State is
  * (depth, ts-of-last-match) — two fixed-width fields per in-flight user,
  * hash-partitioned by the user key; nothing about a user's event history
  * is retained.
  *
  * Ordering contract: within a micro-batch rows are sorted by event time
  * before the state machine runs, so intra-batch disorder is free; ACROSS
  * batches the machine is causal — a step-1 event arriving in a later
  * batch than a step-2 event cannot retroactively re-anchor the funnel
  * (batch [[graft.operators.Funnel.funnelTimes]] would). Stream == batch
  * whenever cross-batch arrival respects event-time order, the same
  * contract the watermarked pipelines already state; TwsFunnelSpec pins
  * the equality on ordered batches with intra-batch shuffling.
  */
object TwsFunnel {

  final case class FunnelEvent(user_id: Long, event_type: String,
                               ts: java.sql.Timestamp)
  /** One row per funnel advance: `step` is 1-based depth just reached. */
  final case class FunnelAdvance(user_id: Long, step: Int,
                                 ts: java.sql.Timestamp)
  final case class FunnelState(depth: Int, tsMicros: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  final class Processor(steps: Array[String])
      extends StatefulProcessor[Long, FunnelEvent, FunnelAdvance] {
    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[FunnelAdvance] = {
      var st = if (state.exists()) state.get() else FunnelState(0, Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
      rows.toArray.sortBy(e => micros(e.ts)).foreach { e =>
        if (st.depth < steps.length && e.event_type == steps(st.depth) &&
            (st.depth == 0 || micros(e.ts) > st.tsMicros)) {
          st = FunnelState(st.depth + 1, micros(e.ts))
          out += FunnelAdvance(key, st.depth, e.ts)
        }
      }
      state.update(st)
      out.iterator
    }
  }

  /** Advance stream for `steps` over a stream of [[FunnelEvent]]. */
  def advances(ds: Dataset[FunnelEvent], steps: Seq[String]): Dataset[FunnelAdvance] = {
    val sp = ds.sparkSession
    import sp.implicits._
    // TimeMode.None: the processor registers no timers, and the
    // processing-time mode would keep scheduling (empty) micro-batches to
    // give timers a chance to fire — under it, processAllAvailable never
    // settles on an idle source
    ds.groupByKey(_.user_id)
      .transformWithState(new Processor(steps.toArray),
        TimeMode.None(), OutputMode.Append())
  }
}
