package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One observed series point: `seq` is the point's position in its
  * per-key series (day index, batch id, offset — anything totally
  * ordered); points are folded in `seq` order.
  */
final case class SeriesPoint(key: String, seq: Long, x: Double)

/** A smoothed point: `ewma` after folding `x`, `anomaly` = the raw value
  * deviated from the PRE-update smoothed level by more than the band.
  */
final case class EwmaPoint(key: String, seq: Long, x: Double,
                           ewma: Double, anomaly: Boolean)

/** Streaming EWMA via `transformWithState`: the continuous form of the
  * batch `ts_ewma` query — per-key exponential smoothing with the same
  * recursive definition (`e_0 = x_0`, `e_t = a*x_t + (1-a)*e_{t-1}`),
  * carried across micro-batches in one double of keyed state.
  *
  * Batch-boundary invariance is the operator's contract: feeding the
  * series one point per micro-batch or all points in one batch yields the
  * identical output (spec-pinned), because the fold order is `seq`, not
  * arrival. State is a single double per key, hash-partitioned by key —
  * at 100 TB of history the state size is |keys|, not |points|.
  *
  * Anomaly flags compare each raw value against the pre-update smoothed
  * level: |x - e_prev| > band * max(|e_prev|, 1). The first point of a
  * key has no level yet and is never anomalous.
  */
object TwsEwma {

  final class Processor(alpha: Double, band: Double)
      extends StatefulProcessor[String, SeriesPoint, EwmaPoint] {
    @transient private var level: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      level = getHandle.getValueState[Double]("level",
        Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SeriesPoint],
                                 timerValues: TimerValues): Iterator[EwmaPoint] = {
      // buffer is one key's slice of one micro-batch (bounded by batch
      // cadence, not history) — needed to fold in seq order
      val sorted = rows.toIndexedSeq.sortBy(_.seq)
      var cur: Option[Double] = if (level.exists()) Some(level.get()) else None
      val out = sorted.map { p =>
        val anomaly = cur.exists(prev =>
          math.abs(p.x - prev) > band * math.max(math.abs(prev), 1.0))
        val e = cur match {
          case None       => p.x
          case Some(prev) => alpha * p.x + (1 - alpha) * prev
        }
        cur = Some(e)
        EwmaPoint(p.key, p.seq, p.x, e, anomaly)
      }
      cur.foreach(level.update)
      out.iterator
    }
  }

  /** Smooth `ds` per key with EWMA(alpha); flag deviations beyond
    * `band` (relative to the smoothed level).
    */
  def ewmaByKey(ds: Dataset[SeriesPoint], alpha: Double,
                band: Double = 0.5): Dataset[EwmaPoint] = {
    val sp = ds.sparkSession
    import sp.implicits._
    // TimeMode.None: the fold uses no timers and no state TTL, so the
    // query must not schedule processing-time tick batches (with
    // ProcessingTime every trigger runs a no-data batch forever just to
    // advance the clock — pure overhead for a clock-free operator)
    ds.groupByKey(_.key)
      .transformWithState(new Processor(alpha, band),
        TimeMode.None(), OutputMode.Append())
  }
}
