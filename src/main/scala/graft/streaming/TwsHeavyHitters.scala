package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One token occurrence. `seq` is the deterministic processing order —
  * space-saving is order-dependent, so the processor sorts each
  * micro-batch by (seq) and the spec feeds seq-contiguous batches; any
  * monotone ingestion key (Kafka offset, event id) serves in production.
  */
final case class TokRow(group: String, seq: Long, token: String)

/** A current heavy-hitter table entry as of this emission. `count` is the
  * space-saving estimate (an OVERestimate), `err` its maximum
  * overestimation: `count − err ≤ true ≤ count`.
  */
final case class HHRow(group: String, token: String, count: Long, err: Long,
                       rank: Int)

/** Streaming heavy hitters per group via the space-saving algorithm
  * (Metwally et al. 2005) on Spark 4 `transformWithState` — the
  * bounded-state streaming twin of the batch CMS sketch arm
  * (`scale/Sketches.cmsVocabCheck`): where CMS answers point queries from
  * fixed-width counters, space-saving maintains the candidate top table
  * itself with `k` counters per group, and guarantees every item with
  * true frequency > N/k is IN the table with
  * `count − err ≤ true ≤ count`.
  *
  * Scale shape: state per group is exactly `k` (token, count, err)
  * triples — three parallel arrays, never a map that grows with the
  * vocabulary. A 1000-executor deployment tracking 10⁶ groups × k=64
  * counters holds ~GBs of state for an unbounded token stream; eviction
  * (min-count replacement, inherit the evicted count as the error bound)
  * is O(k) per NEW token and O(1) amortized for repeats of tracked
  * tokens, which at heavy-hitter workloads is almost all of the stream.
  * `TimeMode.None` keeps the spec deterministic; production adds a store
  * TTL to retire idle groups.
  */
object TwsHeavyHitters {

  /** Bounded counter table: parallel arrays, insertion order (the
    * algorithm's identity is the multiset of (token, count, err), not the
    * array order — emissions re-sort deterministically).
    */
  final case class HHBuf(tokens: Array[String], counts: Array[Long],
                         errs: Array[Long])

  final class Processor(k: Int)
      extends StatefulProcessor[String, TokRow, HHRow] {
    @transient private var buf: ValueState[HHBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[HHBuf]("hh",
        Encoders.product[HHBuf], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TokRow],
                                 timerValues: TimerValues): Iterator[HHRow] = {
      val (tokens, counts, errs) =
        if (buf.exists()) {
          val b = buf.get()
          (scala.collection.mutable.ArrayBuffer(b.tokens: _*),
            scala.collection.mutable.ArrayBuffer(b.counts: _*),
            scala.collection.mutable.ArrayBuffer(b.errs: _*))
        } else (scala.collection.mutable.ArrayBuffer.empty[String],
          scala.collection.mutable.ArrayBuffer.empty[Long],
          scala.collection.mutable.ArrayBuffer.empty[Long])

      // deterministic order inside the micro-batch; contiguous-seq batch
      // boundaries make the stream replay the single-pass run exactly
      rows.toArray.sortBy(_.seq).foreach { r =>
        val idx = tokens.indexOf(r.token)
        if (idx >= 0) counts(idx) += 1
        else if (tokens.length < k) {
          tokens += r.token; counts += 1L; errs += 0L
        } else {
          // evict a min-count entry; tie-break smallest token so the
          // replay is deterministic (the guarantee holds for ANY choice)
          var mi = 0
          var i = 1
          while (i < counts.length) {
            if (counts(i) < counts(mi) ||
                (counts(i) == counts(mi) && tokens(i) < tokens(mi))) mi = i
            i += 1
          }
          val evicted = counts(mi)
          tokens(mi) = r.token
          counts(mi) = evicted + 1
          errs(mi) = evicted
        }
      }
      buf.update(HHBuf(tokens.toArray, counts.toArray, errs.toArray))
      tokens.indices
        .map(i => (tokens(i), counts(i), errs(i)))
        .sortBy { case (t, c, e) => (-c, e, t) }
        .iterator.zipWithIndex
        .map { case ((t, c, e), i) => HHRow(key, t, c, e, i + 1) }
    }
  }

  /** Running per-group space-saving table with `k` counters. */
  def heavyHitters(ds: Dataset[TokRow], k: Int): Dataset[HHRow] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.group)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Append())
  }
}
