package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic event-envelope synthesis over the `events` fixture table.
  *
  * The reference's unit of data is a keyed, timestamped, schema'd event whose
  * payload embeds an `EventMetadata` message (reference
  * `common.proto:38-49`; populated at `service/EventPublisher.java:230-242`
  * with UUID ids, now(), version=1). UUIDs and wall clocks are
  * nondeterministic, so the fixture envelope derives every metadata field
  * arithmetically from `event_id`/`user_id`/`ts` (FIXTURES.md §B) — the
  * DuckDB oracle reproduces the same derivations via [[Envelope.oracleCte]].
  *
  * Fixture quirks baked in on purpose (each exercises a §2 operator):
  *   - 1/20 events have an empty `event_id` (F3 validity reject path)
  *   - 1/17 users are empty (P1b user-key fallback to tenant)
  *   - 1/13 correlation ids empty (P1c fallback to event id)
  *   - 1/11 priorities empty (P1d default PRIORITY_MEDIUM)
  *   - 1/40 topics are `_internal.*` (F8 internal-topic filter)
  *   - retry_count cycles 0..4 (E1 retry-vs-DLQ split at max 3)
  */
object Envelope {

  /** Priority enum names, reference `common.proto:25-31`. */
  val priorities: Seq[String] = Seq(
    "PRIORITY_UNSPECIFIED", "PRIORITY_LOW", "PRIORITY_MEDIUM",
    "PRIORITY_HIGH", "PRIORITY_CRITICAL")

  /** Adds the flat envelope columns to a normalized `events` frame. */
  def withEnvelope(events: DataFrame): DataFrame = {
    val id   = col("event_id")
    val user = col("user_id")
    val prio = id % 5
    events
      .withColumn("event_id_s",
        when(id % 20 === 0, lit("")).otherwise(id.cast("string")))
      .withColumn("tenant_id",
        concat(lit("tenant-"), (user % 50).cast("string")))
      .withColumn("user_s",
        when(user % 17 === 0, lit(""))
          .otherwise(concat(lit("user-"), user.cast("string"))))
      .withColumn("correlation_id",
        when(id % 13 === 0, lit(""))
          .otherwise(concat(lit("corr-"), (id % 100).cast("string"))))
      .withColumn("priority",
        when(id % 11 === 0, lit("")).otherwise(
          when(prio === 0, priorities(0))
            .when(prio === 1, priorities(1))
            .when(prio === 2, priorities(2))
            .when(prio === 3, priorities(3))
            .otherwise(priorities(4))))
      .withColumn("retry_count", (id % 5).cast("int"))
      .withColumn("version", (id % 3 + 1).cast("int"))
      .withColumn("source_service", concat(lit("svc-"), col("event_type")))
      .withColumn("topic",
        when(id % 40 === 0, lit("_internal.metrics"))
          .otherwise(concat(lit("nnipa.events."), col("event_type"), lit(".recorded"))))
      .withColumn("proc_ms", col("value"))
  }

  /** The envelope packed as the reference's `EventMetadata` struct
    * (`common.proto:38-49`) — the typed data-model view used by pipelines.
    */
  def metadataStruct: Column = struct(
    col("event_id_s").as("event_id"),
    col("correlation_id"),
    col("source_service"),
    col("ts").as("timestamp"),
    col("version"),
    col("tenant_id"),
    col("user_s").as("user_id"),
    col("priority"),
    col("retry_count"))

  /** DuckDB-dialect CTE reproducing [[withEnvelope]] verbatim for the oracle.
    * Every envelope-based oracle query starts with this prefix.
    */
  val oracleCte: String =
    """WITH env AS (
      |  SELECT
      |    event_id,
      |    CAST(ts AS TIMESTAMP) AS ts,
      |    user_id, event_type, value, props,
      |    CASE WHEN event_id % 20 = 0 THEN '' ELSE CAST(event_id AS STRING) END AS event_id_s,
      |    'tenant-' || CAST(user_id % 50 AS STRING) AS tenant_id,
      |    CASE WHEN user_id % 17 = 0 THEN '' ELSE 'user-' || CAST(user_id AS STRING) END AS user_s,
      |    CASE WHEN event_id % 13 = 0 THEN '' ELSE 'corr-' || CAST(event_id % 100 AS STRING) END AS correlation_id,
      |    CASE WHEN event_id % 11 = 0 THEN ''
      |         ELSE CASE event_id % 5
      |           WHEN 0 THEN 'PRIORITY_UNSPECIFIED' WHEN 1 THEN 'PRIORITY_LOW'
      |           WHEN 2 THEN 'PRIORITY_MEDIUM' WHEN 3 THEN 'PRIORITY_HIGH'
      |           ELSE 'PRIORITY_CRITICAL' END
      |    END AS priority,
      |    CAST(event_id % 5 AS INT) AS retry_count,
      |    CAST(event_id % 3 + 1 AS INT) AS version,
      |    'svc-' || event_type AS source_service,
      |    CASE WHEN event_id % 40 = 0 THEN '_internal.metrics'
      |         ELSE 'nnipa.events.' || event_type || '.recorded' END AS topic,
      |    value AS proc_ms
      |  FROM events
      |)""".stripMargin
}
