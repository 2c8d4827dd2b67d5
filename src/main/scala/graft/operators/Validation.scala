package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-record validity predicates (SURVEY §2.2 F3/F4/E5).
  *
  * Reference semantics (`service/BaseEventConsumer.java:136-163`):
  *   - reject a null event / missing payload;
  *   - reject a missing or empty `event_id` (metadata first, header
  *     fallback);
  *   - events older than 7 days are *flagged* (warned), not dropped
  *     (`:150-159`).
  *
  * All predicates are pure `Column`s so they compose into both the batch
  * oracle queries and the streaming consume pipeline, and Catalyst can push
  * them into the scan.
  */
object Validation {

  /** F3: event has a payload and a non-empty event id. */
  def isValid(eventId: Column, payload: Column): Column =
    payload.isNotNull && eventId.isNotNull && eventId =!= ""

  /** F3 age flag: older than `maxAgeDays` relative to `now` — observe, don't
    * drop (reference logs a warning and continues, `BaseEventConsumer.java:157`).
    */
  def isTooOld(ts: Column, now: Column, maxAgeDays: Int = 7): Column =
    ts < (now - expr(s"INTERVAL $maxAgeDays DAY"))

  /** F4 example domain predicate (TenantEventConsumer.java:61-74): the
    * tenant field must be present and non-empty.
    */
  def tenantValid(tenantId: Column): Column =
    tenantId.isNotNull && tenantId =!= ""

  /** Splits a frame into (valid, invalid) — the E5 invalid branch feeds the
    * DLQ sink with an IllegalArgumentException-style reason.
    */
  def partition(df: DataFrame, valid: Column): (DataFrame, DataFrame) =
    (df.filter(valid),
     df.filter(!valid).withColumn("error_message", lit("Invalid event")))

  /** F7: effective retry count — metadata value, header fallback, else 0
    * (`service/BaseEventConsumer.java:303-323`).
    */
  def effectiveRetryCount(metaRetry: Column, headerRetry: Column): Column =
    coalesce(metaRetry, headerRetry.cast("int"), lit(0))
}
