package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Kafka-header map operators (SURVEY §2.2 F1/F9, §2.5 E3).
  *
  * The Kafka record carries `headers ARRAY<STRUCT<key STRING, value BINARY>>`;
  * the reference converts to `Map<String,String>` UTF-8 on consume
  * (`service/BaseEventConsumer.java:290-298`) and projects EventMetadata into
  * 7 headers on publish (`service/EventPublisher.java:244-254`).
  */
object Headers {

  /** F1: Kafka header array -> string map (UTF-8 decode of values). */
  def toMap(headers: Column): Column =
    map_from_entries(transform(headers,
      h => struct(h.getField("key"), decode(h.getField("value"), "UTF-8"))))

  /** F9 publish-side enrichment: EventMetadata -> the 7 standard headers. */
  def fromMetadata(eventId: Column, correlationId: Column, sourceService: Column,
                   tenantId: Column, userId: Column, priority: Column,
                   version: Column): Column =
    map(
      lit("event.id"), eventId,
      lit("correlation.id"), correlationId,
      lit("source.service"), sourceService,
      lit("tenant.id"), tenantId,
      lit("user.id"), userId,
      lit("priority"), priority,
      lit("version"), version.cast("string"))

  /** E3: remove + re-add `retry.count`, stamp `retry.timestamp`
    * (`service/BaseEventConsumer.java:337-344`).
    */
  def bumpRetryCount(headerMap: Column, newCount: Column, now: Column): Column =
    map_concat(
      map_filter(headerMap, (k, _) => k =!= "retry.count" && k =!= "retry.timestamp"),
      map(lit("retry.count"), newCount.cast("string"),
          lit("retry.timestamp"), now.cast("string")))

  /** S5 DLQ error headers (`service/EventPublisher.java:170-181`): original
    * topic + error message/class/timestamp, stacktrace truncated to 1000
    * chars (the 10-frame truncation happens before stringification).
    */
  def dlqHeaders(originalTopic: Column, errorMessage: Column, errorClass: Column,
                 errorTs: Column, stacktrace: Column): Column =
    map(
      lit("original.topic"), originalTopic,
      lit("error.message"), errorMessage,
      lit("error.class"), errorClass,
      lit("error.timestamp"), errorTs.cast("string"),
      lit("error.stacktrace"), substring(stacktrace, 1, 1000))
}
