package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A Holt-smoothed point: level/trend after folding `x`, and the
  * one-step-ahead forecast `level + trend`.
  */
final case class HoltPoint(key: String, seq: Long, x: Double,
                           level: Double, trend: Double, forecast: Double)

/** Streaming Holt linear-trend smoothing via `transformWithState`: the
  * continuous form of the batch `ts_holt` query — the same recursion
  * (l₁=x₁, b₁=0; lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁);
  * bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁) carried across micro-batches in TWO
  * doubles of keyed state — where TwsEwma carries one.
  *
  * Contract as TwsEwma's: batch-boundary invariance (fold order is `seq`,
  * not arrival; spec-pinned against the DuckDB-verified batch rows), state
  * size |keys| not |points|, TimeMode.None (clock-free fold ⇒ no
  * perpetual tick batches).
  */
object TwsHolt {

  final class Processor(alpha: Double, beta: Double)
      extends StatefulProcessor[String, SeriesPoint, HoltPoint] {
    @transient private var st: ValueState[(Double, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Double, Double)]("holt",
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SeriesPoint],
                                 timerValues: TimerValues): Iterator[HoltPoint] = {
      val sorted = rows.toIndexedSeq.sortBy(_.seq)
      var cur: Option[(Double, Double)] = if (st.exists()) Some(st.get()) else None
      val out = sorted.map { p =>
        val next = cur match {
          case None => (p.x, 0.0)
          case Some((pl, pb)) =>
            // the level expression is recomputed inside the trend update —
            // the same tree the batch fold and the recursive-CTE oracle use
            val nl = alpha * p.x + (1 - alpha) * (pl + pb)
            val nb = beta * ((alpha * p.x + (1 - alpha) * (pl + pb)) - pl) +
              (1 - beta) * pb
            (nl, nb)
        }
        cur = Some(next)
        HoltPoint(p.key, p.seq, p.x, next._1, next._2, next._1 + next._2)
      }
      cur.foreach(st.update)
      out.iterator
    }
  }

  /** Smooth `ds` per key with Holt(alpha, beta). */
  def holtByKey(ds: Dataset[SeriesPoint], alpha: Double,
                beta: Double): Dataset[HoltPoint] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new Processor(alpha, beta),
        TimeMode.None(), OutputMode.Append())
  }
}
