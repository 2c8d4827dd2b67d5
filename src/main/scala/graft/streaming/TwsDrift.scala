package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One binned observation: `window` is the monitoring window key (e.g.
  * hour-bucket of event time) and `bin` the value-histogram bin 0..nBins-1
  * (computed upstream with the same integer binning the batch
  * `dq_psi_value` query uses).
  */
final case class BinRow(window: Long, bin: Int)

/** The running drift verdict for one window as of this emission. */
final case class DriftRow(window: Long, n: Long, psi: Double, drifted: Boolean)

/** Streaming PSI drift monitor on `transformWithState` — the continuous
  * form of the batch `dq_psi_value` check: per monitoring window the
  * state is EXACTLY nBins long counters; each micro-batch folds its rows
  * in and emits the window's current population-stability index against
  * a fixed reference distribution (trained offline, broadcast as plain
  * constructor state). PSI = Σ (p−q)·ln(p/q) with Laplace-smoothed
  * shares, so empty bins contribute finitely and the number is defined
  * from the very first event.
  *
  * Scale shape: state is nBins longs per window key — never proportional
  * to event volume; windows ride IN the grouping key so retired windows
  * stop being touched (production adds a store TTL of a few window
  * widths). The alert threshold (0.2 — the conventional "significant
  * shift" line) ships with the row so the sink can route on it.
  */
object TwsDrift {

  final case class Counts(c: Array[Long])

  final class Processor(refCounts: Array[Long], threshold: Double)
      extends StatefulProcessor[Long, BinRow, DriftRow] {
    private val nBins = refCounts.length
    private val refTotal = refCounts.sum
    @transient private var st: ValueState[Counts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Counts]("bins",
        Encoders.product[Counts], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[BinRow],
                                 timerValues: TimerValues): Iterator[DriftRow] = {
      val c = if (st.exists()) st.get().c.clone() else new Array[Long](nBins)
      var n = c.sum
      rows.foreach { r =>
        if (r.bin >= 0 && r.bin < nBins) { c(r.bin) += 1; n += 1 }
      }
      st.update(Counts(c))
      var psi = 0.0d
      var i = 0
      while (i < nBins) {
        val p = (refCounts(i) + 1).toDouble / (refTotal + nBins).toDouble
        val q = (c(i) + 1).toDouble / (n + nBins).toDouble
        psi += (p - q) * math.log(p / q)
        i += 1
      }
      Iterator.single(DriftRow(key, n, psi, psi > threshold))
    }
  }

  /** Monitor `ds` against `refCounts`; emits each touched window's
    * current (n, psi, drifted) per micro-batch.
    */
  def monitor(ds: Dataset[BinRow], refCounts: Array[Long],
              threshold: Double = 0.2): Dataset[DriftRow] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.window)
      .transformWithState(new Processor(refCounts, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
