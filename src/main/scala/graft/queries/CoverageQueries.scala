package graft.queries

import graft.QueryDef
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 operator rows as oracle-checked queries: F2 metadata
  * projection, P4 routing rules, E3/E4 retry-header + error classification,
  * S5 DLQ record assembly, and the whole consume path (§3.2) in batch form.
  */
object CoverageQueries {

  private val cte = Envelope.oracleCte

  private def env(s: SparkSession, dir: String): DataFrame =
    Envelope.withEnvelope(Tables.events(s, dir))

  val defs: Map[String, QueryDef] = Map(

    // F2: project through the typed EventMetadata struct and back — the
    // reflective metadata extraction (BaseEventConsumer.java:115-131) as a
    // plain struct projection.
    "f2_metadata_projection" -> QueryDef(
      build = (s, dir) =>
        env(s, dir)
          .select(col("event_id"), Envelope.metadataStruct.as("metadata"))
          .select(
            col("event_id"),
            col("metadata.event_id").as("meta_event_id"),
            col("metadata.tenant_id").as("meta_tenant"),
            col("metadata.priority").as("meta_priority"),
            col("metadata.retry_count").as("meta_retry"),
            col("metadata.version").as("meta_version"))
          .orderBy("event_id"),
      oracle = Some(
        s"""$cte
           |SELECT event_id, event_id_s AS meta_event_id, tenant_id AS meta_tenant,
           |       priority AS meta_priority, retry_count AS meta_retry,
           |       version AS meta_version
           |FROM env ORDER BY event_id""".stripMargin),
      doc = "F2 metadata struct projection round-trip"),

    // P4: declarative routing rules — filter condition + transformations +
    // topic retarget, fanned out as a union (EventRoutingRule model).
    "p4_routing_rules" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val highValue = Routing.RoutingRule(
          sourceTopic = "nnipa.events.purchase.recorded",
          targetTopic = "nnipa.events.purchase.highvalue",
          condition = "value >= 100.0",
          transformations = Seq("event_id", "tenant_id", "value", "topic"))
        val errorAudit = Routing.RoutingRule(
          sourceTopic = "nnipa.events.error.recorded",
          targetTopic = "nnipa.commands.audit.log",
          condition = "retry_count >= 2",
          transformations = Seq("event_id", "tenant_id", "value", "topic"))
        Routing.applyRule(e, highValue)
          .unionByName(Routing.applyRule(e, errorAudit))
          .orderBy("event_id")
      },
      oracle = Some(
        s"""$cte
           |SELECT event_id, tenant_id, value, 'nnipa.events.purchase.highvalue' AS topic
           |FROM env WHERE topic = 'nnipa.events.purchase.recorded' AND value >= 100.0
           |UNION ALL
           |SELECT event_id, tenant_id, value, 'nnipa.commands.audit.log' AS topic
           |FROM env WHERE topic = 'nnipa.events.error.recorded' AND retry_count >= 2
           |ORDER BY event_id""".stripMargin),
      doc = "P4 routing rules: condition + projection + topic retarget fan-out"),

    // P7: executable EventSubscription (model/EventSubscription.java:15-24)
    // — the last declared reference model with no engine analog. Four
    // subscriptions (typed filter, wildcard type, INACTIVE, custom
    // consumer group) applied to the envelope; the inactive one must
    // surface with zero matches, so the static subscription frame is the
    // left side of the join.
    "p7_subscriptions" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val e = env(s, dir)
        val subs = Seq(
          Routing.Subscription("sub-1", "svc-billing",
            "nnipa.events.purchase.recorded", "purchase", "value >= 50.0"),
          Routing.Subscription("sub-2", "svc-analytics",
            "nnipa.events.click.recorded", "*"),
          Routing.Subscription("sub-3", "svc-legacy",
            "nnipa.events.view.recorded", "view", active = false),
          Routing.Subscription("sub-4", "svc-alerts",
            "nnipa.events.error.recorded", "error", "retry_count >= 3",
            consumerConfig = Some(Routing.ConsumerGroupConfig(
              "alerts-cg", "nnipa.events.error.recorded"))))
        val matched = subs.map(sub =>
            Routing.applySubscription(e, sub)
              .select(col("subscription_id"), col("event_id"), col("value")))
          .reduce(_ unionByName _)
        val counts = matched.groupBy("subscription_id")
          .agg(count(lit(1)).as("n_matched"),
               round(sum("value"), 2).as("matched_value"))
        val subsDf = subs.map(x =>
            (x.subscriptionId, x.subscriberService, x.groupId, x.active))
          .toDF("subscription_id", "subscriber_service", "group_id", "active")
        subsDf.join(counts, Seq("subscription_id"), "left")
          .select(col("subscription_id"), col("subscriber_service"),
            col("group_id"), col("active"),
            coalesce(col("n_matched"), lit(0L)).as("n_matched"),
            coalesce(col("matched_value"), lit(0.0)).as("matched_value"))
          .orderBy("subscription_id")
      },
      oracle = Some(
        s"""$cte, m AS (
           |  SELECT 'sub-1' AS subscription_id, event_id, value FROM env
           |  WHERE topic = 'nnipa.events.purchase.recorded'
           |    AND event_type = 'purchase' AND value >= 50.0
           |  UNION ALL
           |  SELECT 'sub-2', event_id, value FROM env
           |  WHERE topic = 'nnipa.events.click.recorded'
           |  UNION ALL
           |  SELECT 'sub-4', event_id, value FROM env
           |  WHERE topic = 'nnipa.events.error.recorded'
           |    AND event_type = 'error' AND retry_count >= 3),
           |subs(subscription_id, subscriber_service, group_id, active) AS (
           |  VALUES ('sub-1', 'svc-billing', 'svc-billing-group', TRUE),
           |         ('sub-2', 'svc-analytics', 'svc-analytics-group', TRUE),
           |         ('sub-3', 'svc-legacy', 'svc-legacy-group', FALSE),
           |         ('sub-4', 'svc-alerts', 'alerts-cg', TRUE))
           |SELECT s.subscription_id, s.subscriber_service, s.group_id, s.active,
           |  COUNT(m.event_id) AS n_matched,
           |  COALESCE(ROUND(SUM(m.value), 2), 0.0) AS matched_value
           |FROM subs s LEFT JOIN m ON s.subscription_id = m.subscription_id
           |GROUP BY 1, 2, 3, 4 ORDER BY s.subscription_id""".stripMargin),
      doc = "P7 executable subscriptions: filtered views per subscriber, inactive = zero"),

    // E4: retryable-exception classification driving the retry-vs-DLQ fork
    // (ErrorHandlingConfig.java:73-84) — error class synthesized
    // deterministically from the envelope.
    "e4_error_classes" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir).withColumn("error_class",
          when(col("event_id") % 4 === 0, "TimeoutException")
            .when(col("event_id") % 4 === 1, "NetworkException")
            .when(col("event_id") % 4 === 2, "IllegalArgumentException")
            .otherwise("DeserializationException"))
        e.withColumn("retryable", Retry.isRetryable(col("error_class")))
          .groupBy("error_class", "retryable")
          .agg(count(lit(1)).as("n"))
          .orderBy("error_class")
      },
      oracle = Some(
        s"""$cte, classed AS (
           |  SELECT CASE event_id % 4
           |    WHEN 0 THEN 'TimeoutException' WHEN 1 THEN 'NetworkException'
           |    WHEN 2 THEN 'IllegalArgumentException' ELSE 'DeserializationException'
           |  END AS error_class FROM env)
           |SELECT error_class,
           |  error_class IN ('NetworkException','TimeoutException','ListenerExecutionFailedException') AS retryable,
           |  COUNT(*) AS n
           |FROM classed GROUP BY 1, 2 ORDER BY error_class""".stripMargin),
      doc = "E4 retryable-exception classification"),

    // S5/E3: assembled DLQ records — renamed topic, error headers (with the
    // 1000-char stacktrace truncation), bumped retry bookkeeping.
    "s5_dlq_records" -> QueryDef(
      build = (s, dir) => {
        val failed = env(s, dir)
          .filter(col("retry_count") >= 3 && !col("topic").startsWith("_"))
          .withColumn("stacktrace",
            concat(lit("java.lang.RuntimeException at "), repeat(lit("frame."), 250)))
        failed
          .withColumn("hdrs", Headers.dlqHeaders(
            col("topic"), lit("processing failed"), lit("RuntimeException"),
            col("ts"), col("stacktrace")))
          .select(
            col("event_id"),
            Retry.dlqTopic(col("topic")).as("dlq_topic"),
            element_at(col("hdrs"), "original.topic").as("h_original_topic"),
            element_at(col("hdrs"), "error.class").as("h_error_class"),
            length(element_at(col("hdrs"), "error.stacktrace")).as("stack_len"))
          .orderBy("event_id")
      },
      oracle = Some(
        s"""$cte
           |SELECT event_id,
           |  regexp_replace(topic, '^nnipa\\.events\\.', 'nnipa.dlq.') AS dlq_topic,
           |  topic AS h_original_topic,
           |  'RuntimeException' AS h_error_class,
           |  1000 AS stack_len
           |FROM env
           |WHERE retry_count >= 3 AND topic NOT LIKE '\\_%' ESCAPE '\\'
           |ORDER BY event_id""".stripMargin),
      doc = "S5 DLQ record assembly with truncated error headers"),

    // §3.2 whole consume path, batch form: validate -> dedup -> retry-split
    // -> route, reduced to branch counts per topic (the streaming form is
    // the same operators inside foreachBatch — ConsumePipelineSpec).
    "pipeline_consume_counts" -> QueryDef(
      build = (s, dir) => {
        val deduped = Dedup.keepFirst(
          Dedup.withInjectedDuplicates(env(s, dir)), Seq("event_id"), Seq("ts"))
        val classified = deduped.withColumn("branch",
          when(col("event_id_s") === "", "dlq_invalid")
            .when(col("event_type") === "error" && col("retry_count") >= 3, "dlq_exhausted")
            .when(col("event_type") === "error", "retry")
            .otherwise("processed"))
        classified.groupBy("topic", "branch")
          .agg(count(lit(1)).as("n"))
          .orderBy("topic", "branch")
      },
      oracle = Some(
        s"""$cte, dup AS (
           |  SELECT * FROM env
           |  UNION ALL
           |  SELECT * REPLACE (ts + INTERVAL 1 HOUR AS ts) FROM env WHERE event_id % 10 = 0),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn FROM dup),
           |classified AS (
           |  SELECT topic,
           |    CASE WHEN event_id_s = '' THEN 'dlq_invalid'
           |         WHEN event_type = 'error' AND retry_count >= 3 THEN 'dlq_exhausted'
           |         WHEN event_type = 'error' THEN 'retry'
           |         ELSE 'processed' END AS branch
           |  FROM ranked WHERE rn = 1)
           |SELECT topic, branch, COUNT(*) AS n
           |FROM classified GROUP BY topic, branch ORDER BY topic, branch""".stripMargin),
      doc = "Whole consume path (validate+dedup+retry split) branch counts")
  )
}
