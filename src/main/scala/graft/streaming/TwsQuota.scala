package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** Per-tenant admission quota on Spark 4 `transformWithState`: at most
  * `limit` events admitted per (tenant, hour-bucket) key, decided in
  * deterministic `(seq, eventId)` order within AND across micro-batches —
  * the streaming enforcement of the throttling the reference applies at
  * the producer edge (`config/KafkaConfig.java` producer limits /
  * `service/EventPublisher.java` backpressure), and the exact streaming
  * twin of the batch `evt_quota_admission` query's
  * `row_number() OVER (PARTITION BY tenant, bucket ORDER BY seq) <= limit`
  * semantics (TwsQuotaSpec pins stream ≡ batch across a 3-batch split).
  *
  * Scale shape: state per key is ONE long (admitted-so-far). The time
  * bucket rides IN the grouping key, so there is no per-tenant map that
  * grows with history — each (tenant, bucket) key is touched only while
  * that bucket's events flow, and a production config adds a store
  * `TTLConfig` of a few bucket widths to retire old buckets inside
  * RocksDB compaction (TimeMode.None here keeps the spec deterministic).
  */
object TwsQuota {

  /** One event offered for admission. `seq` is the deterministic
    * within-bucket order (the batch twin orders by the same columns).
    */
  final case class In(tenant: Long, bucket: Long, seq: Long, eventId: Long)

  /** The admission decision for one event. */
  final case class Decision(eventId: Long, tenant: Long, bucket: Long,
                            admitted: Boolean)

  final class Processor(limit: Long)
      extends StatefulProcessor[(Long, Long), In, Decision] {
    @transient private var used: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      used = getHandle.getValueState[Long]("used",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Long, Long), rows: Iterator[In],
                                 timerValues: TimerValues): Iterator[Decision] = {
      // deterministic admission order inside the micro-batch; the count
      // carried in state makes the order deterministic ACROSS batches too
      val sorted = rows.toArray.sortBy(r => (r.seq, r.eventId))
      var u = if (used.exists()) used.get() else 0L
      val out = new Array[Decision](sorted.length)
      var i = 0
      while (i < sorted.length) {
        val r = sorted(i)
        val ok = u < limit
        if (ok) u += 1
        out(i) = Decision(r.eventId, r.tenant, r.bucket, ok)
        i += 1
      }
      used.update(u)
      out.iterator
    }
  }

  /** Admit at most `limit` events per (tenant, bucket) key. */
  def admit(ds: Dataset[In], limit: Long): Dataset[Decision] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(r => (r.tenant, r.bucket))
      .transformWithState(new Processor(limit),
        TimeMode.None(), OutputMode.Append())
  }
}
