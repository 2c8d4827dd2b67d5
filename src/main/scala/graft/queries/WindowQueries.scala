package graft.queries

import graft.QueryDef
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-window semantics (SURVEY §2.7) and the replay path (§2.1 S7-S10,
  * §3.3) in deterministic batch form.
  *
  * The reference has no windowed aggregation (Kafka Streams disabled) — the
  * tumbling/sliding/session windows here are the idiomatic Spark superset
  * the engine exposes for per-tenant/per-type rates, built on the *same*
  * `window()`/`session_window()` operators the streaming pipelines use.
  */
object WindowQueries {

  private val cte = Envelope.oracleCte

  private def env(s: SparkSession, dir: String): DataFrame =
    Envelope.withEnvelope(Tables.events(s, dir))

  private def dec(c: Column) = c.cast(DecimalType(12, 2))

  val defs: Map[String, QueryDef] = Map(

    // W: tumbling 1 h per-tenant counts — "events per tenant per hour",
    // the rate statistic the reference approximates with counters (A4/A8).
    "w_tumbling_hourly" -> QueryDef(
      build = (s, dir) =>
        env(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("tenant_id"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
          .select(col("w.start").as("window_start"), col("tenant_id"), col("n"), col("sum_value"))
          .orderBy("window_start", "tenant_id"),
      oracle = Some(
        s"""$cte
           |SELECT date_trunc('hour', ts) AS window_start, tenant_id, COUNT(*) AS n,
           |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
           |FROM env GROUP BY 1, 2 ORDER BY window_start, tenant_id""".stripMargin),
      doc = "W tumbling 1h window per tenant"),

    // W: sliding 2 h window, 1 h slide, per event type.
    "w_sliding_2h" -> QueryDef(
      build = (s, dir) =>
        env(s, dir)
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("window_start"), col("event_type"), col("n"))
          .orderBy("window_start", "event_type"),
      oracle = Some(
        s"""$cte
           |SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
           |       event_type, COUNT(*) AS n
           |FROM env CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
           |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      doc = "W sliding 2h/1h window per event type"),

    // W: session windows, 30 min inactivity gap, per user. Spark
    // session_window end = last event + gap, exclusive; the oracle
    // reproduces it with gaps-and-islands (new session when diff >= gap,
    // matching the exclusive window end).
    "w_session_30m" -> QueryDef(
      build = (s, dir) =>
        env(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
                  col("user_id"), col("n_events"))
          .orderBy("user_id", "session_start"),
      oracle = Some(
        s"""$cte, d AS (
           |  SELECT user_id, ts,
           |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
           |         THEN 1 ELSE 0 END AS new_s
           |  FROM env),
           |g AS (
           |  SELECT user_id, ts,
           |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           |                          ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM d)
           |SELECT MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           |       user_id, COUNT(*) AS n_events
           |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin),
      doc = "W session windows (30 min gap) per user"),

    // Key-equal interval join (operators/IntervalJoin): every purchase
    // attributed to the same user's clicks in the preceding hour. The same
    // function joins two watermarked streams (stream-stream inner join with
    // provably bounded state) — IntervalJoinSpec pins stream ≡ batch; this
    // is the deterministic batch form.
    "w_click_attribution" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("click_ts"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        IntervalJoin.attribute(clicks, purchases, "user_id",
            "click_ts", "purchase_ts", horizonSeconds = 3600)
          .select(col("purchase_id"), col("click_id"), col("user_id"),
            (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
              .as("micros_between"))
          .orderBy("purchase_id", "click_id")
      },
      oracle = Some(
        """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
          |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts FROM ev WHERE event_type = 'click'),
          |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts FROM ev WHERE event_type = 'purchase')
          |SELECT p.purchase_id, c.click_id, c.user_id,
          |  date_diff('microsecond', c.click_ts, p.purchase_ts) AS micros_between
          |FROM c JOIN p ON c.user_id = p.user_id
          | AND p.purchase_ts >= c.click_ts
          | AND p.purchase_ts <= c.click_ts + INTERVAL 3600 SECOND
          |ORDER BY purchase_id, click_id""".stripMargin),
      doc = "Interval join: purchases attributed to same-user clicks within 1h"),

    // S7/F5/F6: time-bounded replay with a user filter — the bounded batch
    // read + re-publish projection (service/EventReplayService.java:45-147).
    "s7_replay_window" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val bounds = e.agg(
          (min("ts") + expr("INTERVAL 1 DAY")).as("from_ts"),
          (min("ts") + expr("INTERVAL 3 DAY")).as("to_ts"))
        e.crossJoin(broadcast(bounds))
          .filter(col("ts").between(col("from_ts"), col("to_ts")))   // F6
          .filter(col("value") >= 10.0)                              // F5 user filter
          .select(
            col("event_id"), col("topic"),
            concat(col("topic"), lit(".replay")).as("replay_target"),
            col("event_id").as("replay_original_offset"))
          .orderBy("event_id")
      },
      oracle = Some(
        s"""$cte, bounds AS (
           |  SELECT min(ts) + INTERVAL 1 DAY AS from_ts, min(ts) + INTERVAL 3 DAY AS to_ts FROM env)
           |SELECT event_id, topic, topic || '.replay' AS replay_target,
           |       event_id AS replay_original_offset
           |FROM env, bounds
           |WHERE ts BETWEEN from_ts AND to_ts AND value >= 10.0
           |ORDER BY event_id""".stripMargin),
      doc = "S7 time-bounded replay read + S10 re-publish projection"),

    // A9: replay result accumulation — replayed/skipped/failed counters.
    "a9_replay_result" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val bounds = e.agg(
          (min("ts") + expr("INTERVAL 1 DAY")).as("from_ts"),
          (min("ts") + expr("INTERVAL 3 DAY")).as("to_ts"))
        e.crossJoin(broadcast(bounds))
          .filter(col("ts").between(col("from_ts"), col("to_ts")))
          .agg(
            count(when(col("value") >= 10.0 && col("event_id_s") =!= "", 1)).as("replayed"),
            count(when(col("value") < 10.0, 1)).as("skipped"),
            count(when(col("value") >= 10.0 && col("event_id_s") === "", 1)).as("failed"))
      },
      oracle = Some(
        s"""$cte, bounds AS (
           |  SELECT min(ts) + INTERVAL 1 DAY AS from_ts, min(ts) + INTERVAL 3 DAY AS to_ts FROM env)
           |SELECT
           |  COUNT(CASE WHEN value >= 10.0 AND event_id_s <> '' THEN 1 END) AS replayed,
           |  COUNT(CASE WHEN value < 10.0 THEN 1 END) AS skipped,
           |  COUNT(CASE WHEN value >= 10.0 AND event_id_s = '' THEN 1 END) AS failed
           |FROM env, bounds WHERE ts BETWEEN from_ts AND to_ts""".stripMargin),
      doc = "A9 replay result counters"),

    // S8: offset-bounded replay of a single partition.
    "s8_replay_offsets" -> QueryDef(
      build = (s, dir) =>
        env(s, dir)
          .withColumn("part", (col("user_id") % 6).cast("int"))
          .filter(col("part") === 2 &&
                  col("event_id").between(100L, 500L))
          .select(col("event_id"), col("part"), col("topic"), col("ts"))
          .orderBy("event_id"),
      oracle = Some(
        s"""$cte
           |SELECT event_id, CAST(user_id % 6 AS INT) AS part, topic, ts
           |FROM env
           |WHERE CAST(user_id % 6 AS INT) = 2 AND event_id BETWEEN 100 AND 500
           |ORDER BY event_id""".stripMargin),
      doc = "S8 offset-bounded single-partition replay")
  )
}
