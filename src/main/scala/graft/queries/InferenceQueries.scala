package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation: statistical-inference and incremental-pipeline
  * operators — the hypothesis-testing / uncertainty layer a training-data
  * platform runs BESIDE the prep dataflow (cohort comparisons before a
  * mixture change ships, churn curves for retention policy, snapshot
  * deltas for incremental re-processing).
  *
  * Reference anchors: the statistics endpoints
  * (`service/EventStatisticsService.java`) expose count/rate rollups;
  * these are the inferential companions computed from the same event
  * stream. Conventions as everywhere else in the repo:
  *
  *  - exact BIGINT arithmetic everywhere it is cheap (rank sums, tie
  *    terms, at-risk counts, resample weights); doubles only in a final
  *    expression tree written identically for Spark and DuckDB;
  *  - order-dependent double folds go through either (a) a per-term
  *    quantize-to-BIGINT then exact sum, or (b) an explicit ordered
  *    left-fold (`aggregate` ⇄ `list_reduce`) over a collected frame —
  *    never a bare SUM/AVG of doubles;
  *  - windows without PARTITION BY run only over pre-aggregated
  *    value-domain-sized frames (distinct cents / distinct lifetimes),
  *    never over the event stream itself.
  */
object InferenceQueries {

  val defs: Map[String, QueryDef] = Map(

    // Mann–Whitney U between the id-parity cohorts' value distributions —
    // the rank-sum companion of evt_ab_ztest (means) and stats_ks_test
    // (distribution shape). Everything is integer-exact until the final z:
    // 2·U = Σ_v (2·c0·cum1< + c0·c1) over per-value counts (ties
    // contribute the half-count without ever introducing a 0.5 double),
    // and the tie-corrected variance's Σ(t³−t) is a BIGINT too. The
    // cumulative window runs over the pre-aggregated value domain
    // (distinct cents), not the event stream.
    "stats_mannwhitney" -> QueryDef(
      build = (s, dir) => {
        val v = Tables.events(s, dir).filter(col("value").isNotNull)
          .select((col("user_id") % 2).as("cohort"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val pts = v.groupBy("cents").agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c1"))
        val wBefore = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val terms = pts
          .withColumn("cum1b", coalesce(sum(col("c1")).over(wBefore), lit(0L)))
          .withColumn("t", col("c0") + col("c1"))
        terms.agg(
            sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
            sum(col("c0") * col("cum1b") * 2L + col("c0") * col("c1")).as("u2"),
            sum(col("t") * col("t") * col("t") - col("t")).as("ties3"))
          .select(col("n0"), col("n1"),
            round(col("u2").cast("double") / 2.0d, 2).as("u0"),
            round(
              (col("u2").cast("double") / 2.0d -
                col("n0").cast("double") * col("n1").cast("double") / 2.0d) /
                sqrt(col("n0").cast("double") * col("n1").cast("double") / 12.0d *
                  ((col("n0") + col("n1") + 1).cast("double") -
                    col("ties3").cast("double") /
                      ((col("n0") + col("n1")).cast("double") *
                        (col("n0") + col("n1") - 1).cast("double")))),
              6).as("z"))
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT user_id % 2 AS cohort,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
          |  FROM events WHERE value IS NOT NULL),
          |pts AS (
          |  SELECT cents,
          |    SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS c0,
          |    SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS c1
          |  FROM v GROUP BY 1),
          |terms AS (
          |  SELECT c0, c1,
          |    COALESCE(SUM(c1) OVER (ORDER BY cents
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum1b,
          |    c0 + c1 AS t
          |  FROM pts),
          |agg AS (
          |  SELECT SUM(c0) AS n0, SUM(c1) AS n1,
          |    SUM(c0 * cum1b * 2 + c0 * c1) AS u2,
          |    SUM(t * t * t - t) AS ties3
          |  FROM terms)
          |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
          |  ROUND(CAST(u2 AS DOUBLE) / 2.0, 2) AS u0,
          |  ROUND((CAST(u2 AS DOUBLE) / 2.0
          |         - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
          |    / SQRT(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 *
          |        (CAST(n0 + n1 + 1 AS DOUBLE)
          |         - CAST(ties3 AS DOUBLE)
          |           / (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 - 1 AS DOUBLE)))),
          |    6) AS z
          |FROM agg""".stripMargin),
      doc = "Mann-Whitney U + tie-corrected z between cohorts - integer-exact rank sums"),

    // Gini coefficient of per-user event concentration, per event type —
    // the scalar complement of evt_pareto's Lorenz points. With counts
    // sorted ascending and 1-based ranks, G = (2·Σ i·xᵢ − (n+1)·Σx)/(n·Σx)
    // — every term an exact BIGINT product, one rank window per type over
    // the per-user aggregate (users-sized, not events-sized).
    "stats_gini" -> QueryDef(
      build = (s, dir) => {
        val pu = Tables.events(s, dir)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy("event_type").orderBy(col("x"), col("user_id"))
        pu.withColumn("i", row_number().over(w).cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"), sum(col("x")).as("total_events"),
            sum(col("i") * col("x")).as("six"))
          .select(col("event_type"), col("n_users"), col("total_events"),
            round((col("six") * 2L - (col("n_users") + 1L) * col("total_events"))
                .cast("double") /
              (col("n_users") * col("total_events")).cast("double"), 6).as("gini"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH pu AS (
          |  SELECT event_type, user_id, COUNT(*) AS x
          |  FROM events GROUP BY 1, 2),
          |rk AS (
          |  SELECT event_type, x,
          |    row_number() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i
          |  FROM pu),
          |agg AS (
          |  SELECT event_type, COUNT(*) AS n_users, SUM(x) AS total_events,
          |    SUM(i * x) AS six
          |  FROM rk GROUP BY 1)
          |SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
          |  CAST(total_events AS BIGINT) AS total_events,
          |  ROUND(CAST(six * 2 - (n_users + 1) * total_events AS DOUBLE)
          |        / CAST(n_users * total_events AS DOUBLE), 6) AS gini
          |FROM agg ORDER BY event_type""".stripMargin),
      doc = "Gini concentration of per-user event counts - exact-integer Lorenz scalar"),

    // Kaplan–Meier survival curve of user lifetimes (product-limit
    // estimator): lifetime = days between a user's first and last event;
    // users whose last event falls within 7 days of the corpus end are
    // right-censored (still alive), the rest are churn events. At-risk
    // counts and death/censor tallies are exact BIGINTs over the distinct
    // lifetime domain; Ŝ(t) = Π(1 − dᵢ/nᵢ) is the ONE ordered double fold,
    // spelled as the same explicit left-fold on both engines
    // (`aggregate` ⇄ `list_prepend`+`list_reduce`) — never a product
    // aggregate whose order the engine picks.
    "ts_kaplan_meier" -> QueryDef(
      build = (s, dir) => {
        val byDay = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val users = byDay.groupBy("user_id")
          .agg(min(col("day")).as("f"), max(col("day")).as("l"))
        val end = byDay.agg(max(col("day")).as("endd"))
        val lt = users.crossJoin(broadcast(end))
          .select(datediff(col("l"), col("f")).cast("long").as("t"),
            when(datediff(col("endd"), col("l")) >= 7, 1L).otherwise(0L).as("ev"))
        val byT = lt.groupBy("t")
          .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
        val tot = lt.agg(count(lit(1)).as("nu"))
        val wBefore = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        byT.crossJoin(broadcast(tot))
          .withColumn("removed_b",
            coalesce(sum(col("d") + col("c")).over(wBefore), lit(0L)))
          .withColumn("n_risk", col("nu") - col("removed_b"))
          .withColumn("factor",
            lit(1.0d) - col("d").cast("double") / col("n_risk").cast("double"))
          .withColumn("fs", collect_list(col("factor")).over(wCum))
          .select(col("t").as("t_days"), col("n_risk"),
            col("d").as("d_churn"), col("c").as("c_cens"),
            round(expr("aggregate(fs, CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)"), 6)
              .as("km"))
          .orderBy("t_days")
      },
      oracle = Some(
        """WITH byday AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
          |users AS (
          |  SELECT user_id, MIN(day) AS f, MAX(day) AS l FROM byday GROUP BY 1),
          |endd AS (SELECT MAX(day) AS endd FROM byday),
          |lt AS (
          |  SELECT date_diff('day', f, l) AS t,
          |    CASE WHEN date_diff('day', l, endd) >= 7 THEN 1 ELSE 0 END AS ev
          |  FROM users CROSS JOIN endd),
          |byt AS (SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM lt GROUP BY 1),
          |tot AS (SELECT COUNT(*) AS nu FROM lt),
          |risk AS (
          |  SELECT t, d, c,
          |    nu - COALESCE(SUM(d + c) OVER (ORDER BY t
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
          |  FROM byt CROSS JOIN tot),
          |fct AS (
          |  SELECT t, n_risk, d, c,
          |    CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
          |      AS factor
          |  FROM risk)
          |SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
          |  CAST(d AS BIGINT) AS d_churn, CAST(c AS BIGINT) AS c_cens,
          |  ROUND(list_reduce(
          |    list_prepend(CAST(1.0 AS DOUBLE), list(factor) OVER (ORDER BY t
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |    (a, b) -> a * b), 6) AS km
          |FROM fct ORDER BY t_days""".stripMargin),
      doc = "Kaplan-Meier churn survival - exact at-risk counts, ordered product fold")
  )
}
