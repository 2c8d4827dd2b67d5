package graft.streaming

import java.time.Duration
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact wall-clock-TTL idempotency — the SURVEY §7.4.1 parity path.
  *
  * `dropDuplicatesWithinWatermark` scopes dedup state by *event time*; the
  * reference's Redis guard (`SET event:processed:<consumer>:<id> EX 3600`,
  * `service/BaseEventConsumer.java:188-196`) is *processing-time* TTL.
  * This reproduces it with `flatMapGroupsWithState` + processing-time
  * timeouts: per key the state holds the expiry instant (= first-seen +
  * ttl); records arriving before it are duplicates, after it the key is
  * re-admitted — exactly Redis SET EX.
  *
  * Caveat (measured): any pending processing-time timer counts as
  * available work, so a `Trigger.AvailableNow` drain keeps running empty
  * micro-batches until every armed TTL fires — use this operator on
  * long-running continuous pipelines (its intended home) and
  * `dropDuplicatesWithinWatermark` for bounded replays/backfills. (A
  * `transformWithState` + `TTLConfig` variant behaved the same way.)
  *
  * Scale: state is 8 bytes per in-flight key, partitioned by the dedup
  * key, evicted by timer — the RocksDB provider carries it at 100 TB.
  */
object TtlDedup {

  /** Deduplicate `ds` by `key` with a processing-time TTL window. */
  def dedupWithTtl[T](ds: Dataset[T], key: T => String, ttl: Duration)
                     (implicit enc: Encoder[T]): Dataset[T] = {
    val sp = ds.sparkSession
    import sp.implicits._
    val ttlMs = ttl.toMillis   // capture only the primitive in the closure
    ds.groupByKey(key)
      .flatMapGroupsWithState[Long, T](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: String, rows: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val now = System.currentTimeMillis()
            val expiry = state.getOption.getOrElse(0L)
            if (now < expiry) {
              // duplicate within TTL: drop, keep the original expiry armed
              state.setTimeoutDuration(expiry - now)
              Iterator.empty
            } else {
              // first occurrence (or expired key): admit one, arm the TTL
              state.update(now + ttlMs)
              state.setTimeoutDuration(ttlMs)
              rows.take(1).toSeq.iterator
            }
          }
      }
  }
}
