package graft.queries

import graft.QueryDef
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Management-plane analytics (SURVEY §2.6 A1-A10) as oracle-checked batch
  * queries. The reference computes these imperatively over AdminClient /
  * Micrometer state; here each is a grouped aggregation over deterministic
  * frames derived from the event envelope (FIXTURES.md §C: lag frame,
  * schema-catalog frame, counter frame).
  */
object StatsQueries {

  private val cte = Envelope.oracleCte

  private def env(s: SparkSession, dir: String): DataFrame =
    Envelope.withEnvelope(Tables.events(s, dir))

  private def dec(c: Column) = c.cast(DecimalType(12, 2))

  /** The synthesized consumer-lag frame (FIXTURES.md §C "lag frame"):
    * per (topic, kafka partition): end offset = max event id, committed =
    * max event id among the "already processed" subset (event_id % 3 != 0).
    */
  private def lagFrame(s: SparkSession, dir: String): DataFrame =
    env(s, dir)
      .filter(!col("topic").startsWith("_"))
      .withColumn("part", (col("user_id") % 6).cast("int"))
      .groupBy("topic", "part")
      .agg(
        max("event_id").as("end_offset"),
        max(when(col("event_id") % 3 =!= 0, col("event_id"))).as("committed"))

  private val lagCte =
    s"""$cte, lagf AS (
       |  SELECT topic, CAST(user_id % 6 AS INT) AS part,
       |         MAX(event_id) AS end_offset,
       |         MAX(CASE WHEN event_id % 3 <> 0 THEN event_id END) AS committed
       |  FROM env WHERE topic NOT LIKE '\\_%' ESCAPE '\\'
       |  GROUP BY 1, 2)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // A1: per-partition consumer lag = log-end offset - committed offset
    // (service/TopicManagementService.java:325-353).
    "a1_consumer_lag" -> QueryDef(
      build = (s, dir) =>
        lagFrame(s, dir)
          .select(col("topic"), col("part"),
            (col("end_offset") - col("committed")).as("lag"))
          .orderBy("topic", "part"),
      oracle = Some(
        s"""$lagCte
           |SELECT topic, part, end_offset - committed AS lag
           |FROM lagf ORDER BY topic, part""".stripMargin),
      doc = "A1 consumer lag per partition"),

    // A2: lag rollup per topic + health thresholds (warn >10k, unhealthy
    // >100k — scaled to the fixture range).
    "a2_lag_rollup" -> QueryDef(
      build = (s, dir) =>
        lagFrame(s, dir)
          .groupBy("topic")
          .agg(sum(col("end_offset") - col("committed")).as("total_lag"))
          .withColumn("health",
            when(col("total_lag") > 100, "UNHEALTHY")
              .when(col("total_lag") > 10, "WARN")
              .otherwise("OK"))
          .orderBy("topic"),
      oracle = Some(
        s"""$lagCte
           |SELECT topic, CAST(SUM(end_offset - committed) AS BIGINT) AS total_lag,
           |  CASE WHEN SUM(end_offset - committed) > 100 THEN 'UNHEALTHY'
           |       WHEN SUM(end_offset - committed) > 10 THEN 'WARN'
           |       ELSE 'OK' END AS health
           |FROM lagf GROUP BY topic ORDER BY topic""".stripMargin),
      doc = "A2 per-topic lag rollup with health flags"),

    // A3/S9: topic message counts from offset ranges
    // (getTopicStatistics / getOffsetRange).
    "a3_offset_ranges" -> QueryDef(
      build = (s, dir) =>
        env(s, dir)
          .withColumn("part", (col("user_id") % 6).cast("int"))
          .groupBy("topic", "part")
          .agg(min("event_id").as("earliest"), max("event_id").as("latest"),
               count(lit(1)).as("n_messages"))
          .orderBy("topic", "part"),
      oracle = Some(
        s"""$cte
           |SELECT topic, CAST(user_id % 6 AS INT) AS part,
           |  MIN(event_id) AS earliest, MAX(event_id) AS latest,
           |  COUNT(*) AS n_messages
           |FROM env GROUP BY 1, 2 ORDER BY topic, part""".stripMargin),
      doc = "A3/S9 per-partition offset ranges + message counts"),

    // A5: metrics summary — filtered sums over the counter family
    // (metrics/EventStreamingMetrics.java:192-223).
    "a5_metrics_summary" -> QueryDef(
      build = (s, dir) => {
        val counters = env(s, dir).select(
          concat(lit("published.success."), col("topic")).as("name"), lit(1L).as("cnt"))
          .unionByName(env(s, dir).filter(col("event_id_s") =!= "").select(
            concat(lit("consumed."), col("topic")).as("name"), lit(1L).as("cnt")))
          .unionByName(env(s, dir).filter(col("event_type") === "error").select(
            concat(lit("errors."), col("topic")).as("name"), lit(1L).as("cnt")))
          .unionByName(env(s, dir).filter(col("event_id_s") === "").select(
            concat(lit("dlq."), col("topic")).as("name"), lit(1L).as("cnt")))
        counters.agg(
          sum(when(col("name").startsWith("published.success."), col("cnt"))).as("total_published"),
          sum(when(col("name").startsWith("consumed."), col("cnt"))).as("total_consumed"),
          sum(when(col("name").startsWith("errors."), col("cnt"))).as("total_errors"),
          sum(when(col("name").startsWith("dlq."), col("cnt"))).as("total_dlq"))
      },
      oracle = Some(
        s"""$cte, counters AS (
           |  SELECT 'published.success.' || topic AS name, 1 AS cnt FROM env
           |  UNION ALL SELECT 'consumed.' || topic, 1 FROM env WHERE event_id_s <> ''
           |  UNION ALL SELECT 'errors.' || topic, 1 FROM env WHERE event_type = 'error'
           |  UNION ALL SELECT 'dlq.' || topic, 1 FROM env WHERE event_id_s = '')
           |SELECT
           |  CAST(SUM(CASE WHEN name LIKE 'published.success.%' THEN cnt END) AS BIGINT) AS total_published,
           |  CAST(SUM(CASE WHEN name LIKE 'consumed.%' THEN cnt END) AS BIGINT) AS total_consumed,
           |  CAST(SUM(CASE WHEN name LIKE 'errors.%' THEN cnt END) AS BIGINT) AS total_errors,
           |  CAST(SUM(CASE WHEN name LIKE 'dlq.%' THEN cnt END) AS BIGINT) AS total_dlq
           |FROM counters""".stripMargin),
      doc = "A5 counter-family rollup"),

    // A6: schema-registry statistics by subject kind
    // (service/SchemaRegistryService.java:324-366).
    "a6_schema_stats" -> QueryDef(
      build = (s, dir) => {
        val subjects = env(s, dir).select(
          concat(col("topic"),
            when(col("event_id") % 2 === 0, "-value").otherwise("-key")).as("subject"),
          (col("event_id") % 4 + 1).cast("int").as("version"))
        val perSubject = subjects.groupBy("subject")
          .agg(countDistinct("version").as("n_versions"))
          .withColumn("kind",
            when(col("subject").endsWith("-value"), "value")
              .when(col("subject").endsWith("-key"), "key")
              .otherwise("other"))
        perSubject.groupBy("kind")
          .agg(count(lit(1)).as("n_subjects"),
               sum("n_versions").as("total_versions"),
               max("n_versions").as("max_versions"),
               round(sum("n_versions").cast("double") / count(lit(1)), 4).as("avg_versions"))
          .orderBy("kind")
      },
      oracle = Some(
        s"""$cte, subjects AS (
           |  SELECT topic || CASE WHEN event_id % 2 = 0 THEN '-value' ELSE '-key' END AS subject,
           |         CAST(event_id % 4 + 1 AS INT) AS version
           |  FROM env),
           |per_subject AS (
           |  SELECT subject, COUNT(DISTINCT version) AS n_versions,
           |    CASE WHEN subject LIKE '%-value' THEN 'value'
           |         WHEN subject LIKE '%-key' THEN 'key' ELSE 'other' END AS kind
           |  FROM subjects GROUP BY subject)
           |SELECT kind, COUNT(*) AS n_subjects,
           |  CAST(SUM(n_versions) AS BIGINT) AS total_versions,
           |  MAX(n_versions) AS max_versions,
           |  ROUND(CAST(SUM(n_versions) AS DOUBLE) / COUNT(*), 4) AS avg_versions
           |FROM per_subject GROUP BY kind ORDER BY kind""".stripMargin),
      doc = "A6 schema statistics by subject kind"),

    // A7: latest schema version per subject (max over versions).
    "a7_latest_versions" -> QueryDef(
      build = (s, dir) =>
        env(s, dir).select(
            concat(col("topic"),
              when(col("event_id") % 2 === 0, "-value").otherwise("-key")).as("subject"),
            (col("event_id") % 4 + 1).cast("int").as("version"))
          .groupBy("subject").agg(max("version").as("latest_version"))
          .orderBy("subject"),
      oracle = Some(
        s"""$cte
           |SELECT topic || CASE WHEN event_id % 2 = 0 THEN '-value' ELSE '-key' END AS subject,
           |       MAX(CAST(event_id % 4 + 1 AS INT)) AS latest_version
           |FROM env GROUP BY 1 ORDER BY subject""".stripMargin),
      doc = "A7 latest schema version per subject"),

    // A8: processing-time percentiles p50/p95/p99 per event type (exact
    // interpolated percentile — matches DuckDB quantile_cont bit-for-bit on
    // identical sorted doubles; approx_percentile is the 100 TB scale path,
    // see BenchQueries).
    "a8_latency_percentiles" -> QueryDef(
      build = (s, dir) =>
        env(s, dir).groupBy("event_type")
          .agg(
            round(expr("percentile(proc_ms, 0.5)"), 6).as("p50"),
            round(expr("percentile(proc_ms, 0.95)"), 6).as("p95"),
            round(expr("percentile(proc_ms, 0.99)"), 6).as("p99"))
          .orderBy("event_type"),
      oracle = Some(
        s"""$cte
           |SELECT event_type,
           |  ROUND(quantile_cont(proc_ms, 0.5), 6) AS p50,
           |  ROUND(quantile_cont(proc_ms, 0.95), 6) AS p95,
           |  ROUND(quantile_cont(proc_ms, 0.99), 6) AS p99
           |FROM env GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "A8 latency percentiles per event type"),

    // A10: consumer groups whose offsets touch a topic — left-semi join
    // (service/TopicManagementService.java:689-718).
    "a10_groups_for_topic" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val groupOffsets = e.select(
          concat(lit("cg-"), (col("user_id") % 10).cast("string")).as("grp"),
          col("topic")).distinct()
        val topics = Routing.visibleTopics(e).filter(col("topic").contains("purchase") ||
          col("topic").contains("signup"))
        groupOffsets.join(topics, Seq("topic"), "left_semi")
          .distinct()
          .orderBy("topic", "grp")
      },
      oracle = Some(
        s"""$cte, group_offsets AS (
           |  SELECT DISTINCT 'cg-' || CAST(user_id % 10 AS STRING) AS grp, topic FROM env),
           |topics AS (
           |  SELECT DISTINCT topic FROM env
           |  WHERE topic NOT LIKE '\\_%' ESCAPE '\\'
           |    AND (topic LIKE '%purchase%' OR topic LIKE '%signup%'))
           |SELECT topic, grp FROM group_offsets
           |WHERE topic IN (SELECT topic FROM topics)
           |ORDER BY topic, grp""".stripMargin),
      doc = "A10 groups-for-topic semi-join"),

    // A11: consumer-group offset reset targets — the three reset strategies
    // (earliest / latest / to-timestamp) as one computation per (topic,
    // partition), ≙ resetConsumerGroupOffsets over AdminClient
    // (service/TopicManagementService.java:258-412).
    "a11_offset_reset" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir).withColumn("part", (col("user_id") % 6).cast("int"))
        val cutoff = e.agg((min("ts") + expr("INTERVAL 15 DAY")).as("cutoff_ts"))
        e.crossJoin(broadcast(cutoff))
          .groupBy("topic", "part")
          .agg(
            min("event_id").as("reset_earliest"),
            (max("event_id") + 1).as("reset_latest"),
            min(when(col("ts") >= col("cutoff_ts"), col("event_id"))).as("reset_to_ts"))
          .orderBy("topic", "part")
      },
      oracle = Some(
        s"""$cte, c AS (SELECT min(ts) + INTERVAL 15 DAY AS cutoff_ts FROM env)
           |SELECT topic, CAST(user_id % 6 AS INT) AS part,
           |  MIN(event_id) AS reset_earliest,
           |  MAX(event_id) + 1 AS reset_latest,
           |  MIN(CASE WHEN ts >= cutoff_ts THEN event_id END) AS reset_to_ts
           |FROM env, c GROUP BY 1, 2 ORDER BY topic, part""".stripMargin),
      doc = "A11 offset-reset targets: earliest/latest/to-timestamp per partition"),

    // A13: per-topic message rates (TopicManagementService.java:657-718's
    // messagesPerSecond rollup — which the reference stubs to 0 pending a
    // JMX reporter; here the rate is computed from the data itself):
    // hourly tumbling count per topic ÷ window seconds, rolled up to
    // avg / peak rate. One shuffle to the (topic, hour) grain, then a
    // near-free re-agg to topic.
    "a13_topic_rates" -> QueryDef(
      build = (s, dir) =>
        env(s, dir)
          .filter(!col("topic").startsWith("_"))
          .groupBy(col("topic"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
          .groupBy("topic")
          .agg(
            round(avg(col("n") / 3600.0), 6).as("avg_msgs_per_sec"),
            round(max(col("n") / 3600.0), 6).as("peak_msgs_per_sec"),
            sum("n").as("n_messages"),
            countDistinct("hour").as("n_windows"))
          .orderBy("topic"),
      oracle = Some(
        s"""$cte, w AS (
           |  SELECT topic, date_trunc('hour', ts) AS hour, COUNT(*) AS n
           |  FROM env WHERE topic NOT LIKE '\\_%' ESCAPE '\\'
           |  GROUP BY 1, 2)
           |SELECT topic,
           |  ROUND(AVG(n / 3600.0), 6) AS avg_msgs_per_sec,
           |  ROUND(MAX(n / 3600.0), 6) AS peak_msgs_per_sec,
           |  CAST(SUM(n) AS BIGINT) AS n_messages,
           |  COUNT(DISTINCT hour) AS n_windows
           |FROM w GROUP BY topic ORDER BY topic""".stripMargin),
      doc = "A13 per-topic message rates: hourly windows rolled up to avg/peak msgs/sec"),

    // A14: lag TREND — the reference's "is the consumer keeping up" health
    // question (health/EventStreamingHealthIndicator.java:140-146 surfaces
    // lag totals; TopicManagementService's HealthStatus carries
    // lagByTopic) answered by joining the A2 lag frame with the A13 rate
    // frame: per topic, the backlog (total lag), the average arrival rate,
    // and the consumer's DEMONSTRATED peak service rate (best hourly
    // consumed count — the committed-offset subset). Headroom = peak
    // service - avg arrival: positive means the consumer can drain the
    // backlog (DRAINING, with an ETA), negative means it falls further
    // behind (GROWING). One extra near-free re-agg over the two frames
    // both already computed at the (topic, hour) / (topic, part) grain.
    "a14_lag_trend" -> QueryDef(
      build = (s, dir) => {
        val w = env(s, dir)
          .filter(!col("topic").startsWith("_"))
          .groupBy(col("topic"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n_in"),
            sum(when(col("event_id") % 3 =!= 0, 1L).otherwise(0L)).as("n_out"))
        val rates = w.groupBy("topic").agg(
          round(avg(col("n_in") / 3600.0), 6).as("in_per_sec"),
          round(max(col("n_out") / 3600.0), 6).as("peak_out_per_sec"))
        val lag = lagFrame(s, dir).groupBy("topic")
          .agg(sum(col("end_offset") - col("committed")).as("total_lag"))
        lag.join(rates, "topic")
          .withColumn("headroom_per_sec",
            round(col("peak_out_per_sec") - col("in_per_sec"), 6))
          .withColumn("trend",
            when(col("headroom_per_sec") > 0, "DRAINING")
              .when(col("headroom_per_sec") < 0, "GROWING")
              .otherwise("STABLE"))
          .withColumn("drain_eta_sec",
            when(col("headroom_per_sec") > 0,
              round(col("total_lag") / col("headroom_per_sec"), 2)))
          .orderBy("topic")
      },
      oracle = Some(
        s"""$lagCte, w AS (
           |  SELECT topic, date_trunc('hour', ts) AS hour, COUNT(*) AS n_in,
           |    SUM(CASE WHEN event_id % 3 <> 0 THEN 1 ELSE 0 END) AS n_out
           |  FROM env WHERE topic NOT LIKE '\\_%' ESCAPE '\\'
           |  GROUP BY 1, 2),
           |rates AS (
           |  SELECT topic, ROUND(AVG(n_in / 3600.0), 6) AS in_per_sec,
           |    ROUND(MAX(n_out / 3600.0), 6) AS peak_out_per_sec
           |  FROM w GROUP BY topic),
           |lagt AS (
           |  SELECT topic, CAST(SUM(end_offset - committed) AS BIGINT) AS total_lag
           |  FROM lagf GROUP BY topic),
           |joined AS (
           |  SELECT l.topic, l.total_lag, r.in_per_sec, r.peak_out_per_sec,
           |    ROUND(r.peak_out_per_sec - r.in_per_sec, 6) AS headroom_per_sec
           |  FROM lagt l JOIN rates r ON l.topic = r.topic)
           |SELECT topic, total_lag, in_per_sec, peak_out_per_sec, headroom_per_sec,
           |  CASE WHEN headroom_per_sec > 0 THEN 'DRAINING'
           |       WHEN headroom_per_sec < 0 THEN 'GROWING'
           |       ELSE 'STABLE' END AS trend,
           |  CASE WHEN headroom_per_sec > 0
           |       THEN ROUND(total_lag / headroom_per_sec, 2) END AS drain_eta_sec
           |FROM joined ORDER BY topic""".stripMargin),
      doc = "A14 lag trend: backlog joined with arrival vs demonstrated service rate -> DRAINING/GROWING + drain ETA"),

    // F1/F9 round-trip: metadata -> 7 kafka headers -> map -> extracted back.
    "f9_header_roundtrip" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val withHdrs = e.withColumn("hdrs", Headers.fromMetadata(
          col("event_id_s"), col("correlation_id"), col("source_service"),
          col("tenant_id"), col("user_s"), col("priority"), col("version")))
        withHdrs.select(
            col("event_id"),
            element_at(col("hdrs"), "event.id").as("h_event_id"),
            element_at(col("hdrs"), "tenant.id").as("h_tenant"),
            element_at(col("hdrs"), "priority").as("h_priority"),
            element_at(col("hdrs"), "version").as("h_version"))
          .orderBy("event_id")
      },
      oracle = Some(
        s"""$cte
           |SELECT event_id, event_id_s AS h_event_id, tenant_id AS h_tenant,
           |       priority AS h_priority, CAST(version AS STRING) AS h_version
           |FROM env ORDER BY event_id""".stripMargin),
      doc = "F9 header enrichment round-trip through a Spark map column")
  )
}
