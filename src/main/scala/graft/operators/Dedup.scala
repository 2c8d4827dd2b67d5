package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotency / deduplication (SURVEY §2.4 D1-D3).
  *
  * Reference: Redis `event:processed:<Consumer>:<eventId>` keys with a
  * 3600 s TTL (`service/BaseEventConsumer.java:175-204`). The Spark-native
  * equivalent keeps the dedup state *inside* the engine:
  *
  *   - streaming: `withWatermark(ts, ttl).dropDuplicatesWithinWatermark(keys)`
  *     — RocksDB-backed state, evicted exactly at the watermark horizon, no
  *     remote round-trip per record (see graft.streaming.ConsumePipeline);
  *   - batch (oracle-checkable): keep the *first* record per key in event-time
  *     order, which is what the Redis SETNX-style guard converges to.
  *
  * Keep-first needs a total order to be deterministic: ties on `ts` are
  * broken by the full key ordering supplied by the caller.
  */
object Dedup {

  /** D1 batch form: keep the first row per `keyCols` ordered by `orderCols`.
    * Implemented as a min_by hash-aggregate rather than `dropDuplicates`
    * (which keeps an arbitrary row — breaks oracle hashing) or a window
    * rank (which shuffles every duplicate and sorts per key): the struct
    * comparison is lexicographic over `orderCols`, duplicates collapse in
    * the map-side partial aggregate, and only one survivor per key crosses
    * the wire — the keep-first shape that holds at any duplicate ratio.
    * Deterministic for the same reason the window form was: the caller
    * supplies a total order.
    */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val all = df.columns.toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(all.map(col): _*),
        struct(orderCols.map(col): _*)).as("__r"))
      .select(all.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** D3: idempotency scope is (consumer, event_id) — the reference namespaces
    * the Redis key by consumer class (`BaseEventConsumer.java:201-204`).
    */
  def keepFirstScoped(df: DataFrame, consumerCol: String, eventIdCol: String,
                      orderCols: Seq[String]): DataFrame =
    keepFirst(df, Seq(consumerCol, eventIdCol), orderCols)

  /** Builds the duplicate-injection fixture (FIXTURES.md §C): every 10th
    * event re-emitted 1 hour later with the same event id — deterministic,
    * reproducible in DuckDB with the same UNION ALL.
    */
  def withInjectedDuplicates(env: DataFrame): DataFrame = {
    val dupes = env
      .filter(col("event_id") % 10 === 0)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
    env.unionByName(dupes)
  }
}
