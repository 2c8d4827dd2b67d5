package graft.streaming

import graft.operators.{Envelope, Headers, PartitionKeys}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The publish path (SURVEY §3.1) as a declarative projection pipeline:
  *
  *   event -> auto-metadata (S2) -> partition key (P1) -> headers (F9)
  *         -> kafka-record shape (S1)
  *
  * Reference: `service/EventPublisher.java:51-117` + `:230-242`. The whole
  * path is one narrow Project — Catalyst fuses it into a single codegen
  * stage with no shuffle (the Kafka sink's key column handles placement).
  *
  * S2's generated fields (UUID event id, now()) are nondeterministic by
  * nature; `autoMetadata` takes injectable id/clock columns so tests and
  * oracle queries can pin them (SURVEY §7.4.6), with uuid()/
  * current_timestamp() as the production defaults.
  */
object PublishPipeline {

  /** Partition strategies (enums/PartitionStrategy.java:6-15). */
  sealed trait Strategy
  case object TenantBased extends Strategy
  case object UserBased extends Strategy
  case object CorrelationBased extends Strategy
  case object PriorityBased extends Strategy
  case object EventTypeBased extends Strategy
  case object Composite extends Strategy
  case object RoundRobin extends Strategy
  case object Custom extends Strategy

  def keyFor(strategy: Strategy): Column = strategy match {
    case TenantBased      => PartitionKeys.tenantBased(col("tenant_id"))
    case UserBased        => PartitionKeys.userBased(col("user_s"), col("tenant_id"))
    case CorrelationBased => PartitionKeys.correlationBased(col("correlation_id"), col("event_id_s"))
    case PriorityBased    => PartitionKeys.priorityBased(col("priority"))
    case EventTypeBased   => PartitionKeys.eventTypeBased(col("event_type"))
    case Composite        => PartitionKeys.composite(col("tenant_id"), col("user_s"))
    case RoundRobin       => PartitionKeys.roundRobin()
    case Custom           => PartitionKeys.custom(col("event_type"), col("tenant_id"),
                               col("user_s"), col("correlation_id"), col("event_id_s"))
  }

  /** S2: generate EventMetadata fields (EventPublisher.java:230-242) —
    * injectable id/clock for determinism.
    */
  def autoMetadata(df: DataFrame,
                   idCol: Column = expr("uuid()"),
                   clockCol: Column = current_timestamp()): DataFrame =
    df.withColumn("event_id_s", idCol)
      .withColumn("correlation_id", idCol)
      .withColumn("ts", clockCol)
      .withColumn("version", lit(1))
      .withColumn("priority", lit("PRIORITY_MEDIUM"))
      .withColumn("retry_count", lit(0))

  /** S1: project to the Kafka record shape (key, value, topic, headers) —
    * value as JSON here; [[toKafkaRecordsProto]] is the wire-format form.
    */
  def toKafkaRecords(enveloped: DataFrame, strategy: Strategy = TenantBased): DataFrame =
    enveloped
      .withColumn("key", keyFor(strategy))
      .withColumn("headers", Headers.fromMetadata(
        col("event_id_s"), col("correlation_id"), col("source_service"),
        col("tenant_id"), col("user_s"), col("priority"), col("version")))
      .select(
        col("key"),
        encode(to_json(struct(Envelope.metadataStruct.as("metadata"),
          col("event_type"), col("value"), col("props"))), "UTF-8").as("value"),
        col("topic"), col("headers"))

  /** S1, PROTO wire form: the value is the proto3-encoded event envelope
    * (`graft_proto_encode` over the metadata struct — the reference's
    * actual value format, `config/KafkaConfig.java:73-75`), everything
    * else as [[toKafkaRecords]]. The event BODY (event_type, value, props)
    * rides in the envelope's wire headers map as `event.type` /
    * `event.value` / `event.props`, so the full record survives the
    * `ConsumePipeline.fromWire` round trip (which surfaces that map as the
    * JSON `props` payload) — the envelope alone would drop the body. The
    * round trip through the consumer's one-pass decode is oracle-pinned
    * (q:f14_proto_publish); compose with
    * `KafkaIO.toConfluentProtobufWireFormat` for registry framing.
    */
  def toKafkaRecordsProto(enveloped: DataFrame,
                          strategy: Strategy = TenantBased): DataFrame = {
    graft.functions.Hashing.register(enveloped.sparkSession)
    enveloped
      .withColumn("key", keyFor(strategy))
      .withColumn("headers", Headers.fromMetadata(
        col("event_id_s"), col("correlation_id"), col("source_service"),
        col("tenant_id"), col("user_s"), col("priority"), col("version")))
      .select(
        col("key"),
        graft.schema.ProtoSchemas.encode(
          struct(struct(
            col("event_id_s").as("event_id"),
            col("correlation_id"),
            col("source_service"),
            col("ts").cast("timestamp").as("timestamp"),
            col("version").cast("int").as("version"),
            // NULL props => the event.props entry is OMITTED (a wire map
            // can't carry null values; encoding "" would conflate null and
            // empty across the round trip — the consumer's element_at on a
            // missing key restores NULL)
            when(col("props").isNotNull, map(
                lit("event.type"), col("event_type"),
                lit("event.value"), col("value").cast("string"),
                lit("event.props"), col("props")))
              .otherwise(map(
                lit("event.type"), col("event_type"),
                lit("event.value"), col("value").cast("string"))).as("headers"),
            col("tenant_id"),
            col("user_s").as("user_id"),
            col("priority"),
            col("retry_count").cast("int").as("retry_count")).as("metadata")),
          graft.schema.ProtoSchemas.tenantCreated.take(1)).as("value"),
        col("topic"), col("headers"))
  }
}
