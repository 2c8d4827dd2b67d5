package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-key derivation (SURVEY §2.3 P1-P3) — the reference's "shuffle".
  *
  * Reference: `service/PartitionKeyExtractor.java:24-148` + enum
  * `enums/PartitionStrategy.java:6-15`. The key decides Kafka partition
  * placement, i.e. co-location and per-key ordering — exactly the role of the
  * sink `key` column / `repartition` expression in Spark.
  *
  * Empty-string handling matters: the reference treats empty like missing
  * (e.g. `:28-34` falls back to "default-tenant" for null OR blank), hence
  * the blank-to-null normalization inside every `coalesce`.
  */
object PartitionKeys {

  private def blankToNull(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  /** P1a TENANT_BASED: tenant id, default "default-tenant" (`:28-34`). */
  def tenantBased(tenantId: Column): Column =
    coalesce(blankToNull(tenantId), lit("default-tenant"))

  /** P1b USER_BASED: user id, fallback tenant id (`:36-42`). */
  def userBased(userId: Column, tenantId: Column): Column =
    coalesce(blankToNull(userId), blankToNull(tenantId), lit("default-tenant"))

  /** P1c CORRELATION_BASED: correlation id, fallback event id (`:44-50`). */
  def correlationBased(correlationId: Column, eventId: Column): Column =
    coalesce(blankToNull(correlationId), blankToNull(eventId), lit("unknown"))

  /** P1d PRIORITY_BASED: priority name, default PRIORITY_MEDIUM (`:52-56`). */
  def priorityBased(priority: Column): Column =
    coalesce(blankToNull(priority), lit("PRIORITY_MEDIUM"))

  /** P1e EVENT_TYPE_BASED: the event class simple name (`:58-61`). */
  def eventTypeBased(eventType: Column): Column = eventType

  /** P1f COMPOSITE: "tenant:user" with defaults (`:63-70`). */
  def composite(tenantId: Column, userId: Column): Column =
    concat_ws(":",
      coalesce(blankToNull(tenantId), lit("default")),
      coalesce(blankToNull(userId), lit("system")))

  /** P1g ROUND_ROBIN: random UUID (`:72-75`) — nondeterministic by design;
    * excluded from oracle-hashed queries.
    */
  def roundRobin(): Column = expr("uuid()")

  /** P1h CUSTOM: event-type-name pattern dispatch (`:98-116`). */
  def custom(eventType: Column, tenantId: Column, userId: Column,
             correlationId: Column, eventId: Column): Column =
    when(lower(eventType).contains("tenant"), tenantBased(tenantId))
      .when(lower(eventType).contains("user") || lower(eventType).contains("auth"),
            composite(tenantId, userId))
      .when(lower(eventType).contains("notification"), userBased(userId, tenantId))
      .otherwise(correlationBased(correlationId, eventId))

  /** P2: partition number = abs(java String.hashCode) % n, 0 for null/blank
    * (`service/PartitionKeyExtractor.java:122-135`). Pure Catalyst
    * higher-order functions (whole-stage codegen'd, no UDF): h = 31*h + c
    * over UTF-16 code units, with int32 wraparound simulated in long
    * arithmetic (mod 2^32, recentred to the signed range).
    *
    * Assumes BMP-only keys — true for every key shape the reference derives.
    * Kafka's own default partitioner is murmur2, a third hash family; see
    * SURVEY §7.4.3.
    */
  def javaHashPartition(key: Column, numPartitions: Int): Column = {
    val hUnsigned = aggregate(
      transform(sequence(lit(1), length(key)), i => ascii(key.substr(i, lit(1)))),
      lit(0L),
      (acc, c) => pmod(acc * 31 + c, lit(4294967296L)))
    val hSigned =
      when(hUnsigned >= 2147483648L, hUnsigned - 4294967296L).otherwise(hUnsigned)
    // Java semantics, including the Integer.MIN_VALUE edge: Math.abs keeps
    // MIN_VALUE negative and Java % keeps the dividend's sign, so the
    // placement can be negative for that one hash — reproduced exactly
    // (matches Hashing.javaHashPartition and the reference's
    // Math.abs(key.hashCode()) % n).
    val hAbs = when(hSigned === -2147483648L, hSigned).otherwise(abs(hSigned))
    when(key.isNull || key === "", lit(0))
      .otherwise((hAbs % numPartitions.toLong).cast("int"))
  }

  /** P3 key-balance heuristic: length >= 8 and not all digits (`:140-148`). */
  def isBalancedKey(key: Column): Column =
    (length(key) >= 8) && !key.rlike("^[0-9]+$")
}
