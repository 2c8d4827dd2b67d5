package graft.queries

import graft.QueryDef
import graft.operators.Behavior
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics queries over the event stream (operators/Behavior):
  * transition matrix, session path mining, rate anomaly, RFM segmentation.
  * Follows the EventQueries determinism conventions — decimal money sums,
  * explicit tie-breaks, total ORDER BY, rounded ratio columns.
  */
object BehaviorQueries {

  val defs: Map[String, QueryDef] = Map(

    // Where do users go next: event-type Markov transition matrix.
    "evt_transitions" -> QueryDef(
      build = (s, dir) => Behavior.transitionMatrix(
          Tables.events(s, dir), "user_id", "event_type", "ts", "event_id")
        .orderBy("prev_type", "next_type"),
      oracle = Some(
        """WITH seq AS (
          |  SELECT event_type,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          |  FROM events)
          |SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
          |  ROUND(CAST(COUNT(*) AS DOUBLE)
          |    / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
          |FROM seq WHERE prev_type IS NOT NULL
          |GROUP BY prev_type, event_type
          |ORDER BY prev_type, next_type""".stripMargin),
      doc = "Markov transition matrix over consecutive per-user event types"),

    // What whole sessions look like: top-20 session paths (1-day gap so the
    // fixture's sparse per-user stream forms multi-event sessions).
    "evt_session_paths" -> QueryDef(
      build = (s, dir) => Behavior.sessionPaths(
          Tables.events(s, dir), "user_id", "event_type", "ts", "event_id",
          gapSeconds = 86400L, maxSteps = 5)
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20),
      oracle = Some(
        """WITH d AS (
          |  SELECT user_id, event_id, event_type, ts,
          |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |              >= INTERVAL 1 DAY
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |g AS (
          |  SELECT user_id, event_id, event_type, ts,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                     ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM d),
          |r AS (
          |  SELECT user_id, session_id, event_type,
          |    row_number() OVER (PARTITION BY user_id, session_id
          |                       ORDER BY ts, event_id) AS rn
          |  FROM g),
          |paths AS (
          |  SELECT user_id, session_id, string_agg(event_type, '>' ORDER BY rn) AS path
          |  FROM r WHERE rn <= 5 GROUP BY user_id, session_id)
          |SELECT path, COUNT(*) AS n_sessions
          |FROM paths GROUP BY path
          |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin),
      doc = "Top-20 per-session event-type paths (first 5 steps, 1-day gap sessions)"),

    // Daily per-type event-rate anomaly: z-score vs the trailing 7-day
    // window (sum/sum-of-squares form — exact integer partials, so the
    // double arithmetic is the identical expression tree in both engines).
    "evt_rate_anomaly" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
        val zRaw = (col("n").cast("double") - col("s1").cast("double") / col("cnt")) /
          sqrt((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("cnt"))
            / (col("cnt") - 1))
        daily
          .withColumn("s1", sum("n").over(w))
          .withColumn("s2", sum(col("n") * col("n")).over(w))
          .withColumn("cnt", count("n").over(w))
          .filter(col("cnt") >= 3)
          .withColumn("var_ok",
            col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("cnt") > 0)
          .select(
            date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("n"),
            when(col("var_ok"), round(zRaw, 4)).as("z"),
            (col("var_ok") && abs(zRaw) > 2.0).as("anomaly"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |win AS (
          |  SELECT event_type, d, n,
          |    CAST(SUM(n) OVER w AS BIGINT) AS s1,
          |    CAST(SUM(n * n) OVER w AS BIGINT) AS s2,
          |    CAST(COUNT(n) OVER w AS BIGINT) AS cnt
          |  FROM daily
          |  WINDOW w AS (PARTITION BY event_type ORDER BY d
          |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
          |SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n,
          |  CASE WHEN CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt > 0
          |    THEN ROUND((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / cnt)
          |      / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1)), 4)
          |  END AS z,
          |  (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt > 0
          |   AND abs((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / cnt)
          |     / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1))) > 2.0) AS anomaly
          |FROM win WHERE cnt >= 3
          |ORDER BY event_type, day""".stripMargin),
      doc = "Daily event-rate z-score vs trailing 7-day window, anomaly flag at |z|>2"),

    // Who is worth keeping: RFM quartile segmentation on purchase events.
    "evt_rfm" -> QueryDef(
      build = (s, dir) => Behavior.rfm(
          Tables.events(s, dir), "user_id", "event_type", "ts", "value", "purchase")
        .orderBy("user_id"),
      oracle = Some(
        """WITH p AS (
          |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS frequency,
          |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS monetary,
          |    CAST(max(ts) AS DATE) AS last_day
          |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          |mx AS (SELECT CAST(max(ts) AS DATE) AS global_last FROM events)
          |SELECT user_id,
          |  CAST(date_diff('day', last_day, global_last) AS INT) AS recency_days,
          |  frequency, monetary,
          |  CAST(ntile(4) OVER (ORDER BY date_diff('day', last_day, global_last), user_id) AS INT) AS r_q,
          |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_q,
          |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m_q
          |FROM p, mx ORDER BY user_id""".stripMargin),
      doc = "RFM segmentation: per-user recency/frequency/monetary + exact quartiles"),

    // DAU / trailing-28-day MAU stickiness. The MAU side avoids a range
    // join (BNLJ at scale): each (user, day) activity row is exploded to
    // the 28 days it contributes to — a bounded 28x expansion of the
    // already-distinct-collapsed activity set, then one exact distinct
    // aggregation shuffled on the day key.
    "evt_stickiness" -> QueryDef(
      build = (s, dir) => {
        val activity = Tables.events(s, dir)
          .select(col("user_id").as("u"), to_date(col("ts")).as("d")).distinct()
        val dau = activity.groupBy(col("d").as("day"))
          .agg(countDistinct("u").as("dau"))
        val mau = activity
          .select(col("u"), explode(sequence(col("d"), date_add(col("d"), 27))).as("day"))
          .groupBy("day").agg(countDistinct("u").as("mau"))
        dau.join(mau, "day")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("mau"),
            round(col("dau").cast("double") / col("mau").cast("double"), 6)
              .as("stickiness"))
          .orderBy("day")
      },
      oracle = Some(
        """WITH activity AS (
          |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
          |dau AS (SELECT d AS day, COUNT(DISTINCT u) AS dau FROM activity GROUP BY d),
          |mau AS (
          |  SELECT dau.day, COUNT(DISTINCT a.u) AS mau
          |  FROM dau JOIN activity a ON a.d BETWEEN dau.day - 27 AND dau.day
          |  GROUP BY dau.day)
          |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, mau,
          |  ROUND(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6) AS stickiness
          |FROM dau JOIN mau ON dau.day = mau.day
          |ORDER BY day""".stripMargin),
      doc = "DAU / trailing-28d MAU stickiness (shuffle-friendly explode, no range join)"),

    // Cohort lifetime value: cumulative purchase revenue per first-activity
    // cohort by day offset — the revenue complement of retention_cohorts.
    // All money stays DECIMAL through the cumulative window; the cast to
    // double happens on the exact running totals.
    "evt_cohort_ltv" -> QueryDef(
      build = (s, dir) => {
        val events = Tables.events(s, dir)
        val firstDay = events.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("cohort_day"))
        val purch = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("d"),
            col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)).as("v"))
        val w = Window.partitionBy("cohort_day").orderBy("offset_days")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        purch.join(firstDay, "user_id")
          .groupBy(col("cohort_day"),
            datediff(col("d"), col("cohort_day")).as("offset_days"))
          .agg(sum("v").as("rev_dec"))
          .withColumn("cum_dec", sum("rev_dec").over(w))
          .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
            col("offset_days"),
            col("rev_dec").cast("double").as("revenue"),
            col("cum_dec").cast("double").as("cum_revenue"))
          .orderBy("cohort_day", "offset_days")
      },
      oracle = Some(
        """WITH firstday AS (
          |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
          |  FROM events GROUP BY user_id),
          |purch AS (
          |  SELECT user_id, CAST(ts AS DATE) AS d, CAST(value AS DECIMAL(12,2)) AS v
          |  FROM events WHERE event_type = 'purchase'),
          |per AS (
          |  SELECT cohort_day, (d - cohort_day) AS offset_days, SUM(v) AS rev
          |  FROM purch JOIN firstday USING (user_id)
          |  GROUP BY cohort_day, d - cohort_day)
          |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, offset_days,
          |  CAST(rev AS DOUBLE) AS revenue,
          |  CAST(SUM(rev) OVER (PARTITION BY cohort_day ORDER BY offset_days
          |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
          |FROM per ORDER BY cohort_day, offset_days""".stripMargin),
      doc = "Cohort LTV: cumulative purchase revenue per cohort x day offset"),

    // Pareto concentration: what share of all events the top 1% / 10% /
    // 50% most-active users generate (Lorenz-curve points). Exact-integer
    // cumulative sums; the rank window runs over USERS (bounded by
    // |users|, not event volume — events pre-aggregate per user first).
    "evt_pareto" -> QueryDef(
      build = (s, dir) => {
        val perUser = Tables.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("n").desc, col("user_id"))
        val tot = perUser.agg(sum("n").as("total"), count(lit(1)).as("n_users"))
        perUser
          .withColumn("r", row_number().over(w).cast("long"))
          .withColumn("cum", sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(tot))
          .filter(col("r") === ceil(col("n_users") * 0.01).cast("long") ||
            col("r") === ceil(col("n_users") * 0.1).cast("long") ||
            col("r") === ceil(col("n_users") * 0.5).cast("long"))
          .select(col("r").as("top_users"), col("cum").as("covered_events"),
            round(col("cum").cast("double") / col("total").cast("double"), 6)
              .as("share"))
          .orderBy("top_users")
      },
      oracle = Some(
        """WITH peruser AS (
          |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id),
          |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_users FROM peruser),
          |ranked AS (
          |  SELECT CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS r,
          |    CAST(SUM(n) OVER (ORDER BY n DESC, user_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          |  FROM peruser)
          |SELECT r AS top_users, cum AS covered_events,
          |  ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
          |FROM ranked, tot
          |WHERE r = CAST(CEIL(n_users * 0.01) AS BIGINT)
          |   OR r = CAST(CEIL(n_users * 0.1) AS BIGINT)
          |   OR r = CAST(CEIL(n_users * 0.5) AS BIGINT)
          |ORDER BY top_users""".stripMargin),
      doc = "Pareto/Lorenz points: event share of the top 1/10/50% most-active users"),

    // Feature-engineering capstone: the per-user ML feature table a churn
    // model trains on, composing the behavioral operators — RFM base,
    // session counts (1-day-gap Sessionize), activity span/diversity,
    // error rate, and a recent-vs-prior momentum ratio. One pass of
    // conditional aggregates on the user key plus the sessionizer's
    // single window; every numeric either exact-integer, exact-decimal,
    // or a rounded ratio of those.
    "evt_user_features" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val gmax = ev.agg(max(to_date(col("ts"))).as("gmax"))
        val sess = graft.operators.Sessionize.withSessionIds(
            ev, "user_id", "ts", "event_id", gapSeconds = 86400L)
          .groupBy("user_id").agg(max("session_id").as("n_sessions"))
        val base = ev.crossJoin(broadcast(gmax))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct("event_type").as("n_types"),
            countDistinct(to_date(col("ts"))).as("active_days"),
            datediff(max(col("gmax")), max(to_date(col("ts")))).cast("int")
              .as("recency_days"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            sum(when(col("event_type") === "purchase",
              col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
              .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(12, 2))))
              .cast("double").as("monetary"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
            sum(when(to_date(col("ts")) > date_sub(col("gmax"), 7), 1L)
              .otherwise(0L)).as("last7"),
            sum(when(to_date(col("ts")) <= date_sub(col("gmax"), 7) &&
              to_date(col("ts")) > date_sub(col("gmax"), 14), 1L)
              .otherwise(0L)).as("prev7"))
        base.join(sess, "user_id")
          .withColumn("err_rate",
            round(col("n_errors").cast("double") / col("n_events").cast("double"), 6))
          .withColumn("momentum",
            when(col("prev7") > 0,
              round(col("last7").cast("double") / col("prev7").cast("double"), 6)))
          .select("user_id", "n_events", "n_types", "active_days", "recency_days",
            "n_sessions", "n_purchases", "monetary", "n_errors", "err_rate",
            "last7", "prev7", "momentum")
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH gmax AS (SELECT MAX(CAST(ts AS DATE)) AS gmax FROM events),
          |d AS (
          |  SELECT user_id, event_id, ts,
          |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |              >= INTERVAL 1 DAY THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |sess AS (
          |  SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions
          |  FROM d GROUP BY user_id),
          |base AS (
          |  SELECT user_id,
          |    CAST(COUNT(*) AS BIGINT) AS n_events,
          |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
          |    CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
          |    CAST(date_diff('day', MAX(CAST(ts AS DATE)), MAX(gmax)) AS INT) AS recency_days,
          |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
          |    CAST(SUM(CASE WHEN event_type = 'purchase'
          |      THEN CAST(value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS monetary,
          |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
          |    CAST(SUM(CASE WHEN CAST(ts AS DATE) > gmax - 7 THEN 1 ELSE 0 END) AS BIGINT) AS last7,
          |    CAST(SUM(CASE WHEN CAST(ts AS DATE) <= gmax - 7
          |      AND CAST(ts AS DATE) > gmax - 14 THEN 1 ELSE 0 END) AS BIGINT) AS prev7
          |  FROM events, gmax GROUP BY user_id)
          |SELECT base.user_id, n_events, n_types, active_days, recency_days,
          |  n_sessions, n_purchases, monetary, n_errors,
          |  ROUND(CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE), 6) AS err_rate,
          |  last7, prev7,
          |  CASE WHEN prev7 > 0
          |    THEN ROUND(CAST(last7 AS DOUBLE) / CAST(prev7 AS DOUBLE), 6) END AS momentum
          |FROM base JOIN sess ON base.user_id = sess.user_id
          |ORDER BY base.user_id""".stripMargin),
      doc = "Per-user ML feature table: RFM + sessions + diversity + error rate + momentum"),

    // Session-level stats: one row per (user, session) — event count,
    // exact-microsecond duration, distinct types, conversion flag. The
    // session-scoped aggregation the row-level labels exist to enable
    // (a session_window aggregate could not also give the labels back).
    "evt_session_stats" -> QueryDef(
      build = (s, dir) => {
        val labeled = graft.operators.Sessionize.withSessionIds(
          Tables.events(s, dir), "user_id", "ts", "event_id", gapSeconds = 86400L)
        labeled.groupBy("user_id", "session_id")
          .agg(
            count(lit(1)).as("n_events"),
            ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .cast("double") / 1e6).as("duration_s"),
            countDistinct("event_type").as("n_types"),
            max((col("event_type") === "purchase").cast("int")).cast("boolean")
              .as("converted"))
          .withColumn("duration_s", round(col("duration_s"), 6))
          .orderBy("user_id", "session_id")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT user_id, event_id, event_type, ts,
          |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |              >= INTERVAL 1 DAY THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |g AS (
          |  SELECT user_id, event_id, event_type, ts,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                     ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM d)
          |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
          |  CAST(COUNT(*) AS BIGINT) AS n_events,
          |  ROUND(CAST(date_diff('microseconds', MIN(ts), MAX(ts)) AS DOUBLE) / 1e6, 6)
          |    AS duration_s,
          |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
          |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS converted
          |FROM g GROUP BY user_id, session_id
          |ORDER BY user_id, session_id""".stripMargin),
      doc = "Per-session stats: events, exact duration, type diversity, conversion flag"),

    // Behavioral entropy per user: Shannon entropy of the event-type
    // distribution (+ normalized by ln(k)) — the diversity feature next
    // to evt_user_features' count ratios. The per-user term list is
    // sorted ascending before an in-order fold (sort_array ⇄ list(ORDER
    // BY)), so no cross-row double sum exists; equal counts are
    // interchangeable in the fold. One (user, type) aggregation then a
    // user-key aggregation — two shuffles on user-sized keys.
    "evt_entropy" -> QueryDef(
      build = (s, dir) => {
        val pc = graft.sources.Tables.events(s, dir)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        pc.groupBy("user_id")
          .agg(expr("sort_array(collect_list(CAST(c AS DOUBLE)))").as("xs"),
            sum(col("c")).as("n_events"), count(lit(1)).as("n_types"))
          .filter(col("n_types") > 1)
          .select(col("user_id"), col("n_events"), col("n_types"),
            expr("""round(-aggregate(transform(xs,
                  x -> (x / CAST(n_events AS DOUBLE)) * ln(x / CAST(n_events AS DOUBLE))),
                  0D, (a, b) -> a + b), 6)""").as("entropy"),
            expr("""round(-aggregate(transform(xs,
                  x -> (x / CAST(n_events AS DOUBLE)) * ln(x / CAST(n_events AS DOUBLE))),
                  0D, (a, b) -> a + b) / ln(CAST(n_types AS DOUBLE)), 6)""")
              .as("entropy_norm"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH pc AS (
          |  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
          |arr AS (
          |  SELECT user_id, list(CAST(c AS DOUBLE) ORDER BY c) AS xs,
          |    CAST(SUM(c) AS BIGINT) AS n_events, CAST(COUNT(*) AS BIGINT) AS n_types
          |  FROM pc GROUP BY 1)
          |SELECT user_id, n_events, n_types,
          |  ROUND(-list_reduce(list_transform(xs,
          |      x -> (x / CAST(n_events AS DOUBLE)) * ln(x / CAST(n_events AS DOUBLE))),
          |    (a, b) -> a + b), 6) AS entropy,
          |  ROUND(-list_reduce(list_transform(xs,
          |      x -> (x / CAST(n_events AS DOUBLE)) * ln(x / CAST(n_events AS DOUBLE))),
          |    (a, b) -> a + b) / ln(CAST(n_types AS DOUBLE)), 6) AS entropy_norm
          |FROM arr WHERE n_types > 1 ORDER BY user_id""".stripMargin),
      doc = "Per-user Shannon entropy of event types, sorted in-order fold - no cross-row double sum"),

    // Peak burst rate per user: the max number of events in any sliding
    // 1-hour window anchored at an event. The window join is EXPLICITLY
    // bucketed — each anchor probes exactly its own and the next hour
    // bucket (explode ×2), so Spark plans an equi-join on (user, hour)
    // and the per-key fan-out is events-per-user-hour, never
    // events-per-user² (the naive non-equi spelling would shuffle-join on
    // user alone and go quadratic in per-user history).
    "evt_burst_windows" -> QueryDef(
      build = (s, dir) => {
        val e = graft.sources.Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("unix_micros(ts) div 3600000000").as("h"))
        val aExp = e.withColumn("hb", explode(array(col("h"), col("h") + 1)))
          .select(col("user_id"), col("event_id"), col("ts"), col("hb"))
        val cnt = aExp.as("a").join(e.as("b"),
            col("b.user_id") === col("a.user_id") && col("b.h") === col("a.hb") &&
              col("b.ts") >= col("a.ts") &&
              col("b.ts") < col("a.ts") + expr("INTERVAL 1 HOUR"))
          .groupBy(col("a.user_id").as("user_id"), col("a.event_id").as("event_id"))
          .agg(count(lit(1)).as("cnt"))
        cnt.groupBy("user_id").agg(max(col("cnt")).as("burst_max"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, event_id, ts,
          |    epoch_us(ts) // 3600000000 AS h
          |  FROM events),
          |a_exp AS (
          |  SELECT user_id, event_id, ts, unnest([h, h + 1]) AS hb FROM e),
          |cnt AS (
          |  SELECT a.user_id, a.event_id, COUNT(*) AS cnt
          |  FROM a_exp a JOIN e b
          |    ON b.user_id = a.user_id AND b.h = a.hb
          |   AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
          |  GROUP BY 1, 2)
          |SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS burst_max
          |FROM cnt GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Peak events in any sliding hour per user - hour-bucketed equi-join, never quadratic"),

    // Linear multi-touch attribution: every click/view in the 24 h before
    // a purchase shares that purchase's credit equally. The per-touch
    // credit is floor(1e9 / n) — an exact BIGINT, so channel totals are
    // order-independent integer sums scaled back once at the end (decimal
    // division semantics differ across engines; integer micro-credits
    // don't). Same day-bucketed equi-join shape as evt_burst_windows:
    // each purchase probes its own and the previous day bucket.
    "evt_attribution_linear" -> QueryDef(
      build = (s, dir) => {
        val e = graft.sources.Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
            expr("unix_micros(ts) div 86400000000").as("d"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            col("ts").as("p_ts"), col("d"))
          .withColumn("db", explode(array(col("d") - 1, col("d"))))
        val touch = e.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("event_type").as("channel"),
            col("ts").as("t_ts"), col("d").as("td"))
        val pairs = purch.join(touch,
            purch("user_id") === touch("user_id") && col("td") === col("db") &&
              col("t_ts") < col("p_ts") &&
              col("t_ts") >= col("p_ts") - expr("INTERVAL 1 DAY"))
          .select(col("p_id"), col("channel"))
        val nPer = pairs.groupBy("p_id").agg(count(lit(1)).as("n"))
        pairs.join(nPer, "p_id")
          .withColumn("cr", expr("1000000000L div n"))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_touches"),
            round(sum(col("cr")).cast("double") / 1e9, 6).as("credit"))
          .orderBy("channel")
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, event_id, event_type, ts,
          |    epoch_us(ts) // 86400000000 AS d
          |  FROM events),
          |purch AS (SELECT user_id, event_id, ts, d FROM e
          |          WHERE event_type = 'purchase'),
          |touch AS (SELECT user_id, event_type, ts, d FROM e
          |          WHERE event_type IN ('click', 'view')),
          |p_exp AS (
          |  SELECT user_id, event_id, ts, unnest([d - 1, d]) AS db FROM purch),
          |pairs AS (
          |  SELECT p.event_id AS p_id, t.event_type AS channel
          |  FROM p_exp p JOIN touch t
          |    ON t.user_id = p.user_id AND t.d = p.db
          |   AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 1 DAY),
          |n_per AS (SELECT p_id, COUNT(*) AS n FROM pairs GROUP BY 1),
          |credit AS (
          |  SELECT pr.channel, (1000000000 // np.n) AS cr
          |  FROM pairs pr JOIN n_per np USING (p_id))
          |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
          |  ROUND(CAST(SUM(cr) AS DOUBLE) / 1e9, 6) AS credit
          |FROM credit GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Linear multi-touch attribution: integer micro-credits, day-bucketed window join"),

    // Inter-event gap statistics per user: median / max / mean of the
    // microsecond gaps between consecutive events — engagement-cadence
    // features. Gaps are exact BIGINT micros; the median is an indexed
    // pick from the sorted integer list and the mean is an exact integer
    // sum, so the only doubles are the final scaled projections.
    "evt_gap_stats" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        graft.sources.Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("gap_us",
            expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(w))
          .filter(col("gap_us").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"),
            expr("element_at(array_sort(collect_list(gap_us)), CAST((count(1) + 1) div 2 AS INT))")
              .as("med_us"),
            max(col("gap_us")).as("max_us"), sum(col("gap_us")).as("sum_us"))
          .select(col("user_id"), col("n_gaps"),
            round(col("med_us").cast("double") / 1e6, 6).as("median_gap_s"),
            round(col("max_us").cast("double") / 1e6, 6).as("max_gap_s"),
            round(col("sum_us").cast("double") / col("n_gaps") / 1e6, 6)
              .as("mean_gap_s"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH g AS (
          |  SELECT user_id,
          |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
          |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events
          |  QUALIFY gap_us IS NOT NULL)
          |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
          |  ROUND(CAST(list(gap_us ORDER BY gap_us)[CAST((COUNT(*) + 1) // 2 AS INT)]
          |        AS DOUBLE) / 1e6, 6) AS median_gap_s,
          |  ROUND(CAST(MAX(gap_us) AS DOUBLE) / 1e6, 6) AS max_gap_s,
          |  ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_gap_s
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Per-user inter-event gap median/max/mean - exact integer micros throughout")
  )
}
