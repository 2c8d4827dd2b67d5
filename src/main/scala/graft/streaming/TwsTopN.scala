package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One scored candidate: `score` is any deterministic ranking key — for
  * the streaming weighted-sample use it is the A-ES key
  * `uniformDraw(key, salt)^(1/w)` computed as a column before the stream,
  * so the stream operator itself is a generic order statistic.
  */
final case class ScoredRow(group: String, key: Long, score: Double)

/** A current top-N member: `rank` within its group as of this emission. */
final case class TopNRow(group: String, key: Long, score: Double, rank: Int)

/** Streaming per-group top-N by (score DESC, key ASC) via
  * `transformWithState` — the continuous form of the batch
  * `Sampling.weightedSample` / `capPerGroupWeighted` draw: because the
  * A-ES key is a pure function of (key, salt, weight), maintaining the
  * running top-N of the key IS maintaining a weight-proportional
  * without-replacement sample of everything seen so far.
  *
  * State is the top-N buffer only (two primitive arrays, ≤ n entries per
  * group) — |groups|·n, never |stream|. Each micro-batch emits the
  * group's full current top-N; the final emission equals the batch draw
  * over the union of all batches (spec-pinned, arrival-order invariant:
  * merge-sort-truncate is associative and the (score, key) order is
  * total).
  */
object TwsTopN {

  /** Bounded buffer state: parallel arrays sorted by (score desc, key). */
  final case class TopBuf(scores: Array[Double], keys: Array[Long])

  final class Processor(n: Int)
      extends StatefulProcessor[String, ScoredRow, TopNRow] {
    @transient private var buf: ValueState[TopBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[TopBuf]("topn",
        Encoders.product[TopBuf], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ScoredRow],
                                 timerValues: TimerValues): Iterator[TopNRow] = {
      val prev: Seq[(Double, Long)] =
        if (buf.exists()) { val b = buf.get(); b.scores.zip(b.keys).toSeq }
        else Seq.empty
      val merged = (prev ++ rows.map(r => (r.score, r.key)))
        .sortBy { case (s, k) => (-s, k) }
        .take(n)
      buf.update(TopBuf(merged.map(_._1).toArray, merged.map(_._2).toArray))
      merged.iterator.zipWithIndex.map { case ((s, k), i) =>
        TopNRow(key, k, s, i + 1)
      }
    }
  }

  /** Running per-group top-`n` of `ds` by (score desc, key). */
  def topNByKey(ds: Dataset[ScoredRow], n: Int): Dataset[TopNRow] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.group)
      .transformWithState(new Processor(n), TimeMode.None(), OutputMode.Append())
  }
}
