package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate extension (SURVEY §2.9): the reference's
  * `EventStatistics` rollup (`model/EventStatistics.java:16-25`) as an
  * `Aggregator[IN, BUF, OUT]` — the user-facing custom-aggregate hook the
  * engine exposes beside built-in SQL aggregates.
  *
  * The buffer is a flat product (counts + sum + max-epoch-micros), so
  * partial aggregation and merge distribute exactly like built-ins: the
  * map side combines, only buffers shuffle.
  */
object EventStatsAggregator {

  final case class EventIn(eventType: String, valid: Boolean, procMs: Double,
                           tsMicros: Long)
  final case class Buf(total: Long, successful: Long, failed: Long,
                       sumProcMs: Double, maxTsMicros: Long)
  final case class Stats(totalEvents: Long, successful: Long, failed: Long,
                         avgProcMs: Double, lastEventMicros: Long)

  val aggregator: Aggregator[EventIn, Buf, Stats] =
    new Aggregator[EventIn, Buf, Stats] {
      override def zero: Buf = Buf(0L, 0L, 0L, 0.0, Long.MinValue)
      override def reduce(b: Buf, e: EventIn): Buf = Buf(
        b.total + 1,
        b.successful + (if (e.valid && e.eventType != "error") 1 else 0),
        b.failed + (if (e.eventType == "error") 1 else 0),
        b.sumProcMs + e.procMs,
        math.max(b.maxTsMicros, e.tsMicros))
      override def merge(a: Buf, b: Buf): Buf = Buf(
        a.total + b.total, a.successful + b.successful, a.failed + b.failed,
        a.sumProcMs + b.sumProcMs, math.max(a.maxTsMicros, b.maxTsMicros))
      override def finish(b: Buf): Stats = Stats(
        b.total, b.successful, b.failed,
        if (b.total == 0) 0.0 else b.sumProcMs / b.total,
        b.maxTsMicros)
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }
}
