package graft.streaming

import graft.operators.{Dedup, Retry, Validation}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** The consume path (SURVEY §3.2) as one Structured Streaming pipeline:
  *
  *   decode -> validate (F3/F4) -> dedup (D1-D3) -> process -> route
  *   {processed | invalid->DLQ | failed->retry/DLQ (E1)}
  *
  * Reference: `service/BaseEventConsumer.java:53-105` — per-record
  * synchronous loop with Redis idempotency and manual ack. Spark-native
  * architecture:
  *
  *   - idempotency state lives *in* the engine:
  *     `withWatermark(ts, ttl).dropDuplicatesWithinWatermark(keys)` — RocksDB
  *     state store at scale, horizon = the reference's 3600 s Redis TTL
  *     (W4), no per-record remote round-trip;
  *   - the manual ack is the checkpoint commit: a micro-batch that fails
  *     reprocesses from the last committed offsets, and the idempotent
  *     dedup + deterministic routing make the replay safe;
  *   - multi-sink fan-out (processed + DLQ + retry) happens inside one
  *     `foreachBatch`, the transactional-ish unit.
  *
  * The same column logic (Validation/Retry/Dedup operators) drives the
  * batch oracle queries — streaming and batch forms cannot drift.
  */
object ConsumePipeline {

  final case class Config(
      dedupTtl: String = "1 hour",     // reference idempotency TTL (W4)
      maxRetries: Int = Retry.MaxRetries,
      eventIdCol: String = "event_id_s",
      tsCol: String = "ts")

  /** Routed micro-batch: the three output branches of the consume loop. */
  final case class Routed(processed: DataFrame, dlq: DataFrame, retry: DataFrame)

  /** Splits one (already deduplicated) batch into processed / DLQ / retry,
    * mirroring BaseEventConsumer.onMessage's control flow:
    * invalid -> DLQ (E5); failed processing -> retry topic while
    * retry_count < max else DLQ (E1); rest -> processed.
    */
  def route(batch: DataFrame, cfg: Config = Config(),
            failurePredicate: org.apache.spark.sql.Column = lit(false)): Routed = {
    val valid = Validation.isValid(col(cfg.eventIdCol), col("props"))
    val invalid = batch.filter(!valid)
      .withColumn("route_topic", Retry.dlqTopic(col("topic")))
      .withColumn("error_message", lit("Invalid event"))
    val viable = batch.filter(valid).withColumn("failed", failurePredicate)
    val ok = viable.filter(!col("failed")).drop("failed")
    val (retryBranch, dlqExhausted) = Retry.split(viable.filter(col("failed")))
    val dlqAll = invalid.unionByName(
      dlqExhausted.withColumn("error_message", lit("Max retries exceeded"))
        .drop("failed"),
      allowMissingColumns = true)
    Routed(ok, dlqAll, retryBranch.drop("failed"))
  }

  /** Kafka-shaped (topic, value BINARY) records → the flat envelope frame
    * the pipeline operators key on, via the ONE-PASS wire decode
    * (`graft_proto_struct`): event_id_s/ts/tenant/user/priority/
    * retry_count from the EventMetadata envelope, headers surfaced as the
    * JSON `props` payload. This is the §3.2 consume path from RAW bytes
    * up, matching the reference's deserialize-then-validate order
    * (`service/BaseEventConsumer.java:53-105`). Compose with
    * `KafkaIO.stripConfluentProtobufPrefix` upstream for registry-framed
    * values.
    */
  def fromWire(kafka: DataFrame): DataFrame = {
    graft.functions.Hashing.register(kafka.sparkSession)
    // the SAFE decode: corrupt bytes -> null struct -> null event_id /
    // props -> the invalid branch (DLQ) — one poison pill cannot kill the
    // stream (E7, the reference's ErrorHandlingDeserializer contract)
    kafka
      .withColumn("m", org.apache.spark.sql.functions.call_function(
        "graft_proto_struct_safe", org.apache.spark.sql.functions.col("value")))
      .withColumn("event_id_s", col("m.event_id"))
      .withColumn("ts", col("m.timestamp"))
      .withColumn("correlation_id", col("m.correlation_id"))
      .withColumn("source_service", col("m.source_service"))
      .withColumn("tenant_id", col("m.tenant_id"))
      .withColumn("user_s", col("m.user_id"))
      .withColumn("priority", col("m.priority"))
      .withColumn("retry_count", col("m.retry_count"))
      .withColumn("props", to_json(col("m.headers")))
      .drop("m")
  }

  /** [[start]] from raw wire bytes: decode-once, then the standard
    * watermarked-dedup + route pipeline.
    */
  def startFromWire(kafka: DataFrame, outDir: String, cfg: Config = Config(),
                    failurePredicate: org.apache.spark.sql.Column = lit(false),
                    availableNow: Boolean = true): StreamingQuery =
    start(fromWire(kafka), outDir, cfg, failurePredicate, availableNow)

  /** Streaming form: watermarked dedup then per-micro-batch routing; each
    * branch lands as parquet under `outDir/{processed,dlq,retry}`.
    *
    * `availableNow = true` gives the bounded backfill/replay trigger
    * (Trigger.AvailableNow — the §3.3 replay job shape).
    */
  def start(envelopedStream: DataFrame, outDir: String, cfg: Config = Config(),
            failurePredicate: org.apache.spark.sql.Column = lit(false),
            availableNow: Boolean = true): StreamingQuery = {
    val deduped = envelopedStream
      .withWatermark(cfg.tsCol, cfg.dedupTtl)
      .dropDuplicatesWithinWatermark(cfg.eventIdCol)
    val writer: DataStreamWriter[Row] = deduped.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val routed = route(batch, cfg, failurePredicate)
        routed.processed.write.mode("append").parquet(s"$outDir/processed")
        routed.dlq.write.mode("append").parquet(s"$outDir/dlq")
        routed.retry.write.mode("append").parquet(s"$outDir/retry")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
