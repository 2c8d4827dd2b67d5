package graft.streaming

import java.time.Duration
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[TtlDedup]] on Spark 4's `transformWithState` API — the same Redis
  * `SET EX` idempotency contract (first occurrence admitted, duplicates
  * dropped while the entry lives, key re-admitted after expiry;
  * `service/BaseEventConsumer.java:175-204`), with the TTL delegated to the
  * state store's native `TTLConfig` instead of hand-armed timers.
  *
  * Differences from the `flatMapGroupsWithState` form that matter at scale:
  * state eviction happens inside the store (RocksDB compaction-time drop),
  * so expired keys cost no timer firings and no empty micro-batches per
  * key; and the value is never updated on duplicates, so the original
  * expiry holds — exactly `SET ... EX` + `EXISTS`, not `GETEX`-style
  * sliding renewal. State per in-flight key is one boolean + TTL
  * bookkeeping, hash-partitioned by the dedup key.
  */
object TwsDedup {

  /** One-boolean-per-key processor: admit on absent state, drop on
    * present; the store's TTL re-opens the key.
    */
  final class Processor[T](ttl: Duration)
      extends StatefulProcessor[String, T, T] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[T],
                                 timerValues: TimerValues): Iterator[T] =
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        rows.take(1)
      }
  }

  /** Deduplicate `ds` by `key` with a processing-time TTL window. */
  def dedupWithTtl[T](ds: Dataset[T], key: T => String, ttl: Duration)
                     (implicit enc: Encoder[T]): Dataset[T] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(key)
      .transformWithState(new Processor[T](ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
