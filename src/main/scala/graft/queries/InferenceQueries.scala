package graft.queries

import graft.QueryDef
import graft.scale.TextOps
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation: statistical-inference and incremental-pipeline
  * operators — the hypothesis-testing / uncertainty layer a training-data
  * platform runs BESIDE the prep dataflow (cohort comparisons before a
  * mixture change ships, churn curves for retention policy, snapshot
  * deltas for incremental re-processing).
  *
  * Reference anchors: the statistics surface
  * (`service/TopicManagementService.java`, `model/EventStatistics.java`)
  * exposes count/rate rollups;
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

  /** DuckDB replay of the native rolling hash (`graft_poly_hash`) — same
    * fragment ScaleQueries uses for the sampling oracles.
    */
  private def sqlPolyHash(e: String, m: Long): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $m)"

  private val P: Long = graft.scale.TextOps.P

  /** Poisson(1) inverse-CDF thresholds (cumulative e⁻¹·Σ 1/k!), written as
    * identical decimal literals on both engines; draws above the last
    * threshold take weight 7.
    */
  private val poissonCdf = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712")

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
      doc = "Kaplan-Meier churn survival - exact at-risk counts, ordered product fold"),

    // Incremental snapshot delta — the op an incremental re-processing
    // pipeline runs before touching anything: classify every doc as
    // added / removed / changed / unchanged between two corpus snapshots
    // by DIGEST comparison on the id key. The old snapshot is derived
    // deterministically from the fixture (decade digit (doc_id/10)%10: 7 absent from old => added, 4 absent
    // from new => removed, 3 text-mutated => changed - the decade digit
    // varies WITHIN each source, so every source shows a status mix). Digests are projected BEFORE the join, so raw text never
    // shuffles — the full-outer join carries (id, source, 64-char hash)
    // only, and at 100 TB both sides partition on the id key.
    "corpus_snapshot_diff" -> QueryDef(
      build = (s, dir) => {
        val d = Tables.documents(s, dir)
        val oldSnap = d.filter((col("doc_id") / 10).cast("long") % 10 =!= 7)
          .select(col("doc_id"), col("source").as("osrc"),
            sha2(encode(
              when((col("doc_id") / 10).cast("long") % 10 === 3,
                concat(col("text"), lit(" legacy-rev"))).otherwise(col("text")),
              "UTF-8"), 256).as("old_digest"))
        val newSnap = d.filter((col("doc_id") / 10).cast("long") % 10 =!= 4)
          .select(col("doc_id"), col("source").as("nsrc"),
            sha2(encode(col("text"), "UTF-8"), 256).as("new_digest"))
        newSnap.join(oldSnap, Seq("doc_id"), "full_outer")
          .select(coalesce(col("nsrc"), col("osrc")).as("source"),
            when(col("old_digest").isNull, "added")
              .when(col("new_digest").isNull, "removed")
              .when(col("new_digest") =!= col("old_digest"), "changed")
              .otherwise("unchanged").as("status"),
            col("doc_id"))
          .groupBy("source", "status")
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
          .orderBy("source", "status")
      },
      oracle = Some(
        """WITH oldsnap AS (
          |  SELECT doc_id, source,
          |    sha256(CASE WHEN (doc_id // 10) % 10 = 3 THEN text || ' legacy-rev'
          |                ELSE text END) AS old_digest
          |  FROM documents WHERE (doc_id // 10) % 10 <> 7),
          |newsnap AS (
          |  SELECT doc_id, source, sha256(text) AS new_digest
          |  FROM documents WHERE (doc_id // 10) % 10 <> 4),
          |j AS (
          |  SELECT COALESCE(n.source, o.source) AS source,
          |    CASE WHEN o.old_digest IS NULL THEN 'added'
          |         WHEN n.new_digest IS NULL THEN 'removed'
          |         WHEN n.new_digest <> o.old_digest THEN 'changed'
          |         ELSE 'unchanged' END AS status,
          |    COALESCE(n.doc_id, o.doc_id) AS doc_id
          |  FROM newsnap n FULL OUTER JOIN oldsnap o ON n.doc_id = o.doc_id)
          |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
          |FROM j GROUP BY 1, 2 ORDER BY source, status""".stripMargin),
      doc = "Snapshot delta (added/removed/changed/unchanged) by digest - text never shuffles"),

    // Jensen–Shannon divergence between per-language token distributions —
    // the domain-shift / mixture-drift measure. No full-outer and no
    // cross join: the overlap part is ONE token-key equi-join of the
    // per-lang count table with itself (lang_a < lang_b fans each token
    // out to ≤ C(L,2) pairs, L = language count — bounded by the catalog,
    // not the corpus), and the disjoint-support mass contributes exactly
    // ln2·(1−Σp + 1−Σq), recovered from the overlap sums. Every Σ over
    // the vocabulary is a quantized-BIGINT sum (terms at 1e-12, masses at
    // 1e-15), so the result is independent of reduction order.
    "stats_jsd_langs" -> QueryDef(
      build = (s, dir) => {
        import graft.scale.TextOps
        val cnt = Tables.documents(s, dir)
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy("lang").agg(sum(col("c")).as("t"))
        val withP = cnt.join(broadcast(tot), "lang")
        val a = withP.select(col("lang").as("la"), col("tok"),
          col("c").as("ca"), col("t").as("ta"))
        val b = withP.select(col("lang").as("lb"), col("tok"),
          col("c").as("cb"), col("t").as("tb"))
        a.join(b, Seq("tok")).filter(col("la") < col("lb"))
          .withColumn("p", col("ca").cast("double") / col("ta").cast("double"))
          .withColumn("q", col("cb").cast("double") / col("tb").cast("double"))
          .withColumn("m", (col("p") + col("q")) / 2.0d)
          .withColumn("qterm",
            expr("CAST(ROUND((p * ln(p / m) + q * ln(q / m)) * 1e12, 0) AS BIGINT)"))
          .withColumn("qp", expr("CAST(ROUND(p * 1e15, 0) AS BIGINT)"))
          .withColumn("qq", expr("CAST(ROUND(q * 1e15, 0) AS BIGINT)"))
          .groupBy("la", "lb")
          .agg(count(lit(1)).as("n_overlap"), sum(col("qterm")).as("ts"),
            sum(col("qp")).as("sp"), sum(col("qq")).as("sq"))
          .select(col("la").as("lang_a"), col("lb").as("lang_b"), col("n_overlap"),
            round((col("ts").cast("double") / 1e12 +
              lit(0.6931471805599453d) *
                ((lit(1.0d) - col("sp").cast("double") / 1e15) +
                  (lit(1.0d) - col("sq").cast("double") / 1e15))) * 0.5d, 6).as("jsd"))
          .orderBy("lang_a", "lang_b")
      },
      oracle = Some(
        """WITH cnt AS (
          |  SELECT lang, unnest(string_split(text, ' ')) AS tok
          |  FROM documents),
          |cc AS (SELECT lang, tok, COUNT(*) AS c FROM cnt GROUP BY 1, 2),
          |tot AS (SELECT lang, SUM(c) AS t FROM cc GROUP BY 1),
          |wp AS (SELECT cc.lang, cc.tok, cc.c, tot.t FROM cc JOIN tot USING (lang)),
          |ov AS (
          |  SELECT a.lang AS la, b.lang AS lb,
          |    CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE) AS p,
          |    CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE) AS q
          |  FROM wp a JOIN wp b ON a.tok = b.tok AND a.lang < b.lang),
          |terms AS (
          |  SELECT la, lb,
          |    CAST(ROUND((p * ln(p / ((p + q) / 2.0)) + q * ln(q / ((p + q) / 2.0)))
          |      * 1e12, 0) AS BIGINT) AS qterm,
          |    CAST(ROUND(p * 1e15, 0) AS BIGINT) AS qp,
          |    CAST(ROUND(q * 1e15, 0) AS BIGINT) AS qq
          |  FROM ov)
          |SELECT la AS lang_a, lb AS lang_b, CAST(COUNT(*) AS BIGINT) AS n_overlap,
          |  ROUND((CAST(SUM(qterm) AS DOUBLE) / 1e12 +
          |    0.6931471805599453 *
          |      ((CAST(1.0 AS DOUBLE) - CAST(SUM(qp) AS DOUBLE) / 1e15) +
          |       (CAST(1.0 AS DOUBLE) - CAST(SUM(qq) AS DOUBLE) / 1e15))) * 0.5, 6)
          |    AS jsd
          |FROM terms GROUP BY 1, 2 ORDER BY lang_a, lang_b""".stripMargin),
      doc = "Jensen-Shannon divergence between language token distributions - quantized-exact sums"),

    // Stupid-backoff bigram scoring against a HELD-OUT LM (train = even
    // doc_ids, score = odd): S(w2|w1) = c(w1w2)/c(w1) if the bigram was
    // seen, else 0.4·c(w2)/T, else the 0.4/T floor — the web-scale LM
    // smoothing that needs no discount tuning (Brants et al. 2007). The
    // count tables shuffle on token keys only; per-doc scores are
    // quantized-BIGINT sums, so reduction order can't perturb the mean.
    "txt_stupid_backoff" -> QueryDef(
      build = (s, dir) => {
        import graft.scale.TextOps
        val ts = TextOps.tokens(col("text"))
        val docs = Tables.documents(s, dir)
        val train = docs.filter(col("doc_id") % 2 === 0)
        val uni = train.select(explode(ts).as("w")).groupBy("w")
          .agg(count(lit(1)).as("cu"))
        val tot = uni.agg(sum(col("cu")).as("tt"))
        val bi = train.select(
            explode(zip_with(
              slice(ts, lit(1), size(ts) - 1),
              slice(ts, lit(2), size(ts) - 1),
              (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
          .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .agg(count(lit(1)).as("cb"))
        val pairs = docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"),
            explode(zip_with(
              slice(ts, lit(1), size(ts) - 1),
              slice(ts, lit(2), size(ts) - 1),
              (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        pairs
          .join(bi, Seq("w1", "w2"), "left")
          .join(uni.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"), "left")
          .join(uni.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("sc", expr(
            """CASE WHEN cb IS NOT NULL
              |       THEN ln(CAST(cb AS DOUBLE) / CAST(cu1 AS DOUBLE))
              |     WHEN cu2 IS NOT NULL
              |       THEN ln(CAST(0.4 AS DOUBLE) * CAST(cu2 AS DOUBLE)
              |               / CAST(tt AS DOUBLE))
              |     ELSE ln(CAST(0.4 AS DOUBLE) / CAST(tt AS DOUBLE)) END""".stripMargin))
          .withColumn("qs", expr("CAST(ROUND(sc * 1e9, 0) AS BIGINT)"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_pairs"), sum(col("qs")).as("ss"))
          .select(col("doc_id"), col("n_pairs"),
            round(col("ss").cast("double") / 1e9 / col("n_pairs").cast("double"), 6)
              .as("avg_backoff_lp"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          |uni AS (
          |  SELECT unnest(ts) AS w FROM t WHERE doc_id % 2 = 0),
          |unic AS (SELECT w, COUNT(*) AS cu FROM uni GROUP BY 1),
          |tot AS (SELECT SUM(cu) AS tt FROM unic),
          |bi AS (
          |  SELECT ts[i] AS w1, ts[i + 1] AS w2
          |  FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
          |  WHERE doc_id % 2 = 0),
          |bic AS (SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY 1, 2),
          |pairs AS (
          |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          |  FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
          |  WHERE doc_id % 2 = 1),
          |sc AS (
          |  SELECT p.doc_id,
          |    CAST(ROUND(
          |      CASE WHEN bic.cb IS NOT NULL
          |             THEN ln(CAST(bic.cb AS DOUBLE) / CAST(u1.cu AS DOUBLE))
          |           WHEN u2.cu IS NOT NULL
          |             THEN ln(CAST(0.4 AS DOUBLE) * CAST(u2.cu AS DOUBLE)
          |                     / CAST(tot.tt AS DOUBLE))
          |           ELSE ln(CAST(0.4 AS DOUBLE) / CAST(tot.tt AS DOUBLE)) END
          |      * 1e9, 0) AS BIGINT) AS qs
          |  FROM pairs p
          |  LEFT JOIN bic ON p.w1 = bic.w1 AND p.w2 = bic.w2
          |  LEFT JOIN unic u1 ON p.w1 = u1.w
          |  LEFT JOIN unic u2 ON p.w2 = u2.w
          |  CROSS JOIN tot)
          |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          |  ROUND(CAST(SUM(qs) AS DOUBLE) / 1e9 / CAST(COUNT(*) AS DOUBLE), 6)
          |    AS avg_backoff_lp
          |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin),
      doc = "Stupid-backoff bigram LM vs held-out split - token-key joins, quantized sums"),

    // Poisson bootstrap CI for the mean order value — THE bootstrap that
    // works at 100 TB: instead of B full resamples, each row draws an
    // independent Poisson(1) weight per replicate from the deterministic
    // salted hash (inverse CDF on the uniform draw), so all B=32
    // replicates run in ONE scan with map-side-combinable integer
    // aggregates (Σw, Σw·cents are exact BIGINTs; the replicate mean is
    // the only division). The CI is the indexed min/max pick from the
    // sorted replicate means — reproducible from (salt, key) alone.
    "stats_bootstrap_ci" -> QueryDef(
      build = (s, dir) => {
        import graft.scale.TextOps
        graft.functions.Hashing.register(s)
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        val rep = o.withColumn("b", explode(array((0 until 32).map(lit): _*)))
        val h = TextOps.polyHash(concat(lit("boot"), col("b").cast("string"),
          lit(":"), col("o_orderkey").cast("string")))
        val u = (((h * h) % P).cast("double") + lit(1.0d)) / lit(P.toDouble + 1.0d)
        val w = poissonCdf.zipWithIndex.foldRight(lit(7L)) { case ((thr, k), els) =>
          when(u < expr(s"CAST($thr AS DOUBLE)"), k.toLong).otherwise(els)
        }
        val means = rep.withColumn("w", w)
          .groupBy("b")
          .agg(sum(col("w")).as("sw"), sum(col("w") * col("cents")).as("swc"))
          .select(col("b"),
            (col("swc").cast("double") / col("sw").cast("double")).as("mean_b"))
        val point = o.agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sc"))
        means.agg(sort_array(collect_list(col("mean_b"))).as("ms"),
            count(lit(1)).as("n_reps"))
          .crossJoin(broadcast(point))
          .select(col("n_orders"), col("n_reps"),
            round(col("sc").cast("double") / col("n_orders").cast("double"), 4)
              .as("point_mean_cents"),
            round(element_at(col("ms"), 1), 4).as("ci_lo_cents"),
            round(element_at(col("ms"), 32), 4).as("ci_hi_cents"))
      },
      oracle = Some {
        val hh = sqlPolyHash(
          "'boot' || CAST(b AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)", P)
        val cases = poissonCdf.zipWithIndex
          .map { case (thr, k) => s"WHEN u < CAST($thr AS DOUBLE) THEN $k" }
          .mkString(" ")
        s"""WITH o AS (
           |  SELECT o_orderkey,
           |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
           |  FROM orders),
           |rep AS (
           |  SELECT o_orderkey, cents, b,
           |    (CAST((($hh) * ($hh)) % $P AS DOUBLE) + 1.0)
           |      / ${P.toDouble + 1.0d} AS u
           |  FROM o CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bs),
           |wtd AS (
           |  SELECT b, cents, CASE $cases ELSE 7 END AS w FROM rep),
           |means AS (
           |  SELECT b, CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
           |    AS mean_b
           |  FROM wtd GROUP BY 1),
           |pt AS (SELECT COUNT(*) AS n_orders, SUM(cents) AS sc FROM o),
           |ms AS (SELECT list_sort(list(mean_b)) AS ms, COUNT(*) AS n_reps FROM means)
           |SELECT CAST(pt.n_orders AS BIGINT) AS n_orders,
           |  CAST(ms.n_reps AS BIGINT) AS n_reps,
           |  ROUND(CAST(pt.sc AS DOUBLE) / CAST(pt.n_orders AS DOUBLE), 4)
           |    AS point_mean_cents,
           |  ROUND(ms.ms[1], 4) AS ci_lo_cents,
           |  ROUND(ms.ms[32], 4) AS ci_hi_cents
           |FROM ms CROSS JOIN pt""".stripMargin
      },
      doc = "Poisson bootstrap CI of mean order value - one scan, exact integer replicates"),

    // Two-proportion power analysis: the sample size per arm needed to
    // detect the OBSERVED error-rate gap between the id-parity cohorts at
    // α=0.05 (two-sided), power=0.80 — the "how long must this A/B run"
    // companion of evt_ab_ztest. Counts exact; the classic formula
    // n = (z_α·√(2p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / (p₁−p₂)²
    // with p̄ = (p₁+p₂)/2 is one shared double tree, z quantiles as
    // shared literals.
    "stats_power_twoprop" -> QueryDef(
      build = (s, dir) => {
        val za = "1.959963984540054"
        val zb = "0.8416212335729143"
        Tables.events(s, dir)
          .agg(
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("user_id") % 2 === 0 && col("event_type") === "error", 1L)
              .otherwise(0L)).as("k1"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("user_id") % 2 === 1 && col("event_type") === "error", 1L)
              .otherwise(0L)).as("k2"))
          .withColumn("p1", col("k1").cast("double") / col("n1").cast("double"))
          .withColumn("p2", col("k2").cast("double") / col("n2").cast("double"))
          .select(col("n1"), col("k1"), col("n2"), col("k2"),
            round(col("p1"), 6).as("rate1"), round(col("p2"), 6).as("rate2"),
            expr(
              s"""CAST(CEIL(
                 |  POWER($za * SQRT(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
                 |        + $zb * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2.0)
                 |  / POWER(p1 - p2, 2.0)) AS BIGINT)""".stripMargin).as("n_per_arm"))
      },
      oracle = Some {
        val za = "1.959963984540054"
        val zb = "0.8416212335729143"
        s"""WITH agg AS (
           |  SELECT
           |    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n1,
           |    SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'error'
           |             THEN 1 ELSE 0 END) AS k1,
           |    SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n2,
           |    SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'error'
           |             THEN 1 ELSE 0 END) AS k2
           |  FROM events),
           |p AS (
           |  SELECT n1, k1, n2, k2,
           |    CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
           |    CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2
           |  FROM agg)
           |SELECT CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
           |  CAST(n2 AS BIGINT) AS n2, CAST(k2 AS BIGINT) AS k2,
           |  ROUND(p1, 6) AS rate1, ROUND(p2, 6) AS rate2,
           |  CAST(CEIL(
           |    POWER($za * SQRT(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
           |          + $zb * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2.0)
           |    / POWER(p1 - p2, 2.0)) AS BIGINT) AS n_per_arm
           |FROM p""".stripMargin
      },
      doc = "Two-proportion power analysis - required n per arm for the observed gap"),

    // Welch's unequal-variance t-test on cohort order values — the
    // mean-difference test that does NOT assume equal variances,
    // completing the cohort suite (z for proportions, MWU for ranks, KS
    // for shape, t for means). n, Σx, Σx² are exact BIGINTs (Σx² of
    // cents stays well under 2⁶³); means/variances and the
    // Welch–Satterthwaite df are one shared double tree — note Σx is
    // squared only AFTER the double cast (its square would overflow
    // BIGINT at corpus scale).
    "stats_ttest_welch" -> QueryDef(
      build = (s, dir) => {
        val a = Tables.events(s, dir).filter(col("value").isNotNull)
          .select((col("user_id") % 2).as("cohort"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("x"))
          .groupBy("cohort")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("m", col("sx").cast("double") / col("n").cast("double"))
          .withColumn("v",
            (col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") /
                col("n").cast("double")) / (col("n") - 1).cast("double"))
          .withColumn("vn", col("v") / col("n").cast("double"))
        val w = a.filter(col("cohort") === 0)
          .select(col("n").as("n1"), col("m").as("m1"), col("vn").as("vn1"))
          .crossJoin(broadcast(a.filter(col("cohort") === 1)
            .select(col("n").as("n2"), col("m").as("m2"), col("vn").as("vn2"))))
        w.select(col("n1"), col("n2"),
          round(col("m1"), 4).as("mean1_cents"), round(col("m2"), 4).as("mean2_cents"),
          round((col("m1") - col("m2")) / sqrt(col("vn1") + col("vn2")), 6).as("t"),
          round((col("vn1") + col("vn2")) * (col("vn1") + col("vn2")) /
            (col("vn1") * col("vn1") / (col("n1") - 1).cast("double") +
              col("vn2") * col("vn2") / (col("n2") - 1).cast("double")), 2).as("df"))
      },
      oracle = Some(
        """WITH a AS (
          |  SELECT user_id % 2 AS cohort, COUNT(*) AS n,
          |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS sx,
          |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
          |        * CAST(ROUND(value * 100, 0) AS BIGINT)) AS sxx
          |  FROM events WHERE value IS NOT NULL GROUP BY 1),
          |st AS (
          |  SELECT cohort, n,
          |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m,
          |    (CAST(sxx AS DOUBLE)
          |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |      / CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE) AS vn
          |  FROM a),
          |j AS (
          |  SELECT a0.n AS n1, a0.m AS m1, a0.vn AS vn1,
          |         a1.n AS n2, a1.m AS m2, a1.vn AS vn2
          |  FROM (SELECT * FROM st WHERE cohort = 0) a0
          |  CROSS JOIN (SELECT * FROM st WHERE cohort = 1) a1)
          |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          |  ROUND(m1, 4) AS mean1_cents, ROUND(m2, 4) AS mean2_cents,
          |  ROUND((m1 - m2) / SQRT(vn1 + vn2), 6) AS t,
          |  ROUND((vn1 + vn2) * (vn1 + vn2) /
          |    (vn1 * vn1 / CAST(n1 - 1 AS DOUBLE)
          |     + vn2 * vn2 / CAST(n2 - 1 AS DOUBLE)), 2) AS df
          |FROM j""".stripMargin),
      doc = "Welch t-test on cohort values - exact moment sums, Welch-Satterthwaite df"),

    // Bayesian A/B on the cohort error rates via DETERMINISTIC Monte
    // Carlo: P(θA > θB) estimated from 64 paired posterior draws, where
    // each z comes from the Irwin–Hall 12-uniform sum (Σu − 6 ≈ N(0,1))
    // and every uniform is the salted mid-square hash draw the samplers
    // use — so the "random" simulation is a pure function both engines
    // replay bit-for-bit (no erf / inverse-CDF needed, which neither
    // engine exposes compatibly). Posterior ≈ Normal(p̂, p̂(1−p̂)/n), the
    // large-n Beta approximation. The draw table is 64 rows joined to a
    // 1-row aggregate — the heavy work stays the one counting scan.
    "stats_bayes_ab" -> QueryDef(
      build = (s, dir) => {
        graft.functions.Hashing.register(s)
        def uSum(arm: String): String = {
          val key = s"concat('bayes:$arm:', CAST(d AS STRING), ':', CAST(j AS STRING))"
          val h = s"graft_poly_hash($key, CAST($P AS BIGINT))"
          s"""aggregate(sequence(1, 12), CAST(0 AS DOUBLE),
             |  (acc, j) -> acc + ((CAST((($h) * ($h)) % $P AS DOUBLE)
             |    + CAST(1 AS DOUBLE)) / CAST(${P + 1} AS DOUBLE)))""".stripMargin
        }
        val stats = Tables.events(s, dir).agg(
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("user_id") % 2 === 0 && col("event_type") === "error", 1L)
            .otherwise(0L)).as("k1"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("user_id") % 2 === 1 && col("event_type") === "error", 1L)
            .otherwise(0L)).as("k2"))
        val draws = s.range(64).select(col("id").as("d"))
          .crossJoin(broadcast(stats))
          .withColumn("pa", col("k1").cast("double") / col("n1").cast("double"))
          .withColumn("pb", col("k2").cast("double") / col("n2").cast("double"))
          .withColumn("sea",
            sqrt(col("pa") * (lit(1.0d) - col("pa")) / col("n1").cast("double")))
          .withColumn("seb",
            sqrt(col("pb") * (lit(1.0d) - col("pb")) / col("n2").cast("double")))
          .withColumn("ta",
            col("pa") + (expr(uSum("a")) - lit(6.0d)) * col("sea"))
          .withColumn("tb",
            col("pb") + (expr(uSum("b")) - lit(6.0d)) * col("seb"))
        draws
          .agg(sum(when(col("ta") > col("tb"), 1L).otherwise(0L)).as("wins"),
            count(lit(1)).as("nd"))
          .crossJoin(broadcast(stats))
          .select(col("n1"), col("k1"), col("n2"), col("k2"),
            round(col("k1").cast("double") / col("n1").cast("double"), 6)
              .as("rate_a"),
            round(col("k2").cast("double") / col("n2").cast("double"), 6)
              .as("rate_b"),
            col("wins"),
            round(col("wins").cast("double") / col("nd").cast("double"), 6)
              .as("p_a_gt_b"))
      },
      oracle = Some {
        def uSum(arm: String): String = {
          val key = s"'bayes:$arm:' || CAST(d AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
          val h = sqlPolyHash(key, P)
          s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |  list_transform(generate_series(1, 12),
             |    j -> ((CAST((($h) * ($h)) % $P AS DOUBLE)
             |      + CAST(1 AS DOUBLE)) / CAST(${P + 1} AS DOUBLE)))),
             |  (a, b) -> a + b)""".stripMargin
        }
        s"""WITH stats AS (
           |  SELECT
           |    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n1,
           |    SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'error'
           |             THEN 1 ELSE 0 END) AS k1,
           |    SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n2,
           |    SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'error'
           |             THEN 1 ELSE 0 END) AS k2
           |  FROM events),
           |draws AS (
           |  SELECT d,
           |    CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS pa,
           |    CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS pb,
           |    SQRT((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           |      * (CAST(1.0 AS DOUBLE) - CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           |      / CAST(n1 AS DOUBLE)) AS sea,
           |    SQRT((CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
           |      * (CAST(1.0 AS DOUBLE) - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
           |      / CAST(n2 AS DOUBLE)) AS seb,
           |    ${uSum("a")} AS ua,
           |    ${uSum("b")} AS ub
           |  FROM (SELECT unnest(generate_series(0, 63)) AS d) ds
           |  CROSS JOIN stats),
           |sim AS (
           |  SELECT d, pa + (ua - CAST(6.0 AS DOUBLE)) * sea AS ta,
           |         pb + (ub - CAST(6.0 AS DOUBLE)) * seb AS tb
           |  FROM draws),
           |p AS (
           |  SELECT SUM(CASE WHEN ta > tb THEN 1 ELSE 0 END) AS wins,
           |    COUNT(*) AS nd
           |  FROM sim)
           |SELECT CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
           |  CAST(n2 AS BIGINT) AS n2, CAST(k2 AS BIGINT) AS k2,
           |  ROUND(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate_a,
           |  ROUND(CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS rate_b,
           |  CAST(wins AS BIGINT) AS wins,
           |  ROUND(CAST(wins AS DOUBLE) / CAST(nd AS DOUBLE), 6) AS p_a_gt_b
           |FROM p CROSS JOIN stats""".stripMargin
      },
      doc = "Bayesian A/B via deterministic Monte Carlo - Irwin-Hall hash draws, replayed"),

    // Next-event prediction EVAL: score the Markov top-1 predictor
    // (argmax transition count per previous type, ties to the lower
    // type) against what actually happened — per-prev-type accuracy plus
    // the majority-class baseline it must beat. The model and the eval
    // run in the same two scans: transition counts, then a lead-window
    // pass over the stream. Exact integer counts end to end.
    "evt_next_pred_eval" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val seq0 = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("prev_type"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .filter(col("next_type").isNotNull)
        val seq = graft.Caches.lazyBarrier(seq0)
        val cnt = seq.groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
        val pred = cnt.withColumn("rn", row_number().over(
            Window.partitionBy("prev_type").orderBy(col("n").desc, col("next_type"))))
          .filter(col("rn") === 1)
          .select(col("prev_type"), col("next_type").as("predicted"))
        seq.join(broadcast(pred), Seq("prev_type"))
          .groupBy("prev_type")
          .agg(max(col("predicted")).as("predicted"),
            count(lit(1)).as("n_transitions"),
            sum(when(col("next_type") === col("predicted"), 1L).otherwise(0L))
              .as("n_correct"))
          .select(col("prev_type"), col("predicted"), col("n_transitions"),
            col("n_correct"),
            round(col("n_correct").cast("double") /
              col("n_transitions").cast("double"), 6).as("accuracy"))
          .orderBy("prev_type")
      },
      oracle = Some(
        """WITH seq AS (
          |  SELECT event_type AS prev_type,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS next_type
          |  FROM events),
          |sq AS (SELECT * FROM seq WHERE next_type IS NOT NULL),
          |cnt AS (
          |  SELECT prev_type, next_type, COUNT(*) AS n FROM sq GROUP BY 1, 2),
          |pred AS (
          |  SELECT prev_type, next_type AS predicted FROM (
          |    SELECT prev_type, next_type,
          |      row_number() OVER (PARTITION BY prev_type
          |        ORDER BY n DESC, next_type) AS rn
          |    FROM cnt) WHERE rn = 1)
          |SELECT sq.prev_type, MAX(pred.predicted) AS predicted,
          |  CAST(COUNT(*) AS BIGINT) AS n_transitions,
          |  CAST(SUM(CASE WHEN sq.next_type = pred.predicted THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_correct,
          |  ROUND(CAST(SUM(CASE WHEN sq.next_type = pred.predicted
          |                      THEN 1 ELSE 0 END) AS DOUBLE)
          |        / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
          |FROM sq JOIN pred USING (prev_type)
          |GROUP BY sq.prev_type ORDER BY sq.prev_type""".stripMargin),
      doc = "Markov top-1 next-event predictor scored on the stream - exact counts"),

    // Language-ID confusion matrix: the n-gram-marker predictor
    // (txt_quality_lang's classifier) evaluated as a MODEL — per
    // (true, predicted) cell counts and in-language share. The argmax
    // fold and its CASE/greatest oracle mirror are generated from the
    // same marker table, so classifier and eval cannot drift.
    "txt_lang_confusion" -> QueryDef(
      build = (s, dir) => {
        import graft.scale.TextOps
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            TextOps.predictedLang(col("text")).as("predicted"))
        val tot = d.groupBy("lang").agg(count(lit(1)).as("t"))
        d.groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
          .join(broadcast(tot), "lang")
          .select(col("lang"), col("predicted"), col("n"),
            round(col("n").cast("double") / col("t").cast("double"), 6)
              .as("share_of_lang"))
          .orderBy("lang", "predicted")
      },
      oracle = {
        import graft.scale.TextOps
        val langs = TextOps.langMarkers.keys.toSeq.sorted
        val scoreCols = langs.map { l =>
          val markers = TextOps.langMarkers(l).map(w => s"'$w'").mkString(", ")
          s"len(list_filter(string_split(text, ' '), t -> t IN ($markers))) AS s_$l"
        }.mkString(",\n           |    ")
        val m = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
        val pred = "CASE " +
          langs.map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ") + " END"
        Some(
          s"""WITH scored AS (
             |  SELECT doc_id, lang,
             |    $scoreCols
             |  FROM documents),
             |p AS (SELECT doc_id, lang, $pred AS predicted FROM scored),
             |tot AS (SELECT lang, COUNT(*) AS t FROM p GROUP BY 1)
             |SELECT p.lang, p.predicted, CAST(COUNT(*) AS BIGINT) AS n,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(tot.t) AS DOUBLE), 6)
             |    AS share_of_lang
             |FROM p JOIN tot USING (lang)
             |GROUP BY p.lang, p.predicted ORDER BY p.lang, p.predicted""".stripMargin)
      },
      doc = "Lang-ID confusion matrix - classifier and eval generated from one marker table"),

    // Capture–recapture population estimate (Lincoln–Petersen + the
    // Chapman small-sample correction): treat the even/odd event-id
    // streams as two independent sightings of the user population and
    // estimate total distinct users from overlap — the estimator used
    // when the full population can't be enumerated. Here the fixture CAN
    // be enumerated, so the true count ships alongside as the honesty
    // column. Exact integer counts; two semi-join-free conditional
    // aggregates on the user key.
    "stats_capture_recapture" -> QueryDef(
      build = (s, dir) => {
        val u = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(max(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("in1"),
            max(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("in2"))
        u.agg(sum(col("in1")).as("n1"), sum(col("in2")).as("n2"),
            sum(col("in1") * col("in2")).as("m"),
            count(lit(1)).as("true_n"))
          .select(col("n1"), col("n2"), col("m"), col("true_n"),
            round(col("n1").cast("double") * col("n2").cast("double") /
              col("m").cast("double"), 4).as("lincoln_petersen"),
            round((col("n1") + 1L).cast("double") * (col("n2") + 1L).cast("double") /
              (col("m") + 1L).cast("double") - lit(1.0d), 4).as("chapman"))
      },
      oracle = Some(
        """WITH u AS (
          |  SELECT user_id,
          |    MAX(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS in1,
          |    MAX(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS in2
          |  FROM events GROUP BY 1),
          |agg AS (
          |  SELECT SUM(in1) AS n1, SUM(in2) AS n2, SUM(in1 * in2) AS m,
          |    COUNT(*) AS true_n
          |  FROM u)
          |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          |  CAST(m AS BIGINT) AS m, CAST(true_n AS BIGINT) AS true_n,
          |  ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(m AS DOUBLE), 4)
          |    AS lincoln_petersen,
          |  ROUND(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
          |        / CAST(m + 1 AS DOUBLE) - CAST(1.0 AS DOUBLE), 4) AS chapman
          |FROM agg""".stripMargin),
      doc = "Capture-recapture distinct-user estimate vs ground truth - exact overlap counts"),

    // Sequential probability ratio test (Wald) over the daily cohort
    // error streams: cumulative log-likelihood ratio of H1 (each arm at
    // its own global rate) vs H0 (both at the pooled rate), with the
    // α=β=0.05 decision bounds ±ln(19) — "when could this A/B have
    // stopped". Per-day LLR increments are quantized to BIGINTs and the
    // cumulative sum runs over the 30-row day domain; the ln() calls
    // touch only the three global-rate scalars. (H1 uses the observed
    // final rates, so this is the retrospective efficiency diagnostic,
    // not a pre-registered test — stated on the tin.)
    "stats_sprt" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir).select(to_date(col("ts")).as("day"),
          (col("user_id") % 2).as("arm"),
          when(col("event_type") === "error", 1L).otherwise(0L).as("err"))
        val g = e.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("gn1"),
          sum(when(col("arm") === 0, col("err")).otherwise(0L)).as("gk1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("gn2"),
          sum(when(col("arm") === 1, col("err")).otherwise(0L)).as("gk2"))
        val daily = e.groupBy("day").agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("err")).otherwise(0L)).as("k1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1, col("err")).otherwise(0L)).as("k2"))
        val wc = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        daily.crossJoin(broadcast(g))
          .withColumn("p1", col("gk1").cast("double") / col("gn1").cast("double"))
          .withColumn("p2", col("gk2").cast("double") / col("gn2").cast("double"))
          .withColumn("p0", (col("gk1") + col("gk2")).cast("double") /
            (col("gn1") + col("gn2")).cast("double"))
          .withColumn("qterm", expr(
            """CAST(ROUND((
              |    k1 * (ln(p1) - ln(p0))
              |  + (n1 - k1) * (ln(CAST(1.0 AS DOUBLE) - p1) - ln(CAST(1.0 AS DOUBLE) - p0))
              |  + k2 * (ln(p2) - ln(p0))
              |  + (n2 - k2) * (ln(CAST(1.0 AS DOUBLE) - p2) - ln(CAST(1.0 AS DOUBLE) - p0))
              |) * 1e9, 0) AS BIGINT)""".stripMargin))
          .withColumn("qcum", sum(col("qterm")).over(wc))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            round(col("qcum").cast("double") / 1e9, 6).as("cum_llr"),
            when(col("qcum") >= 2944438979L, "accept_h1")
              .when(col("qcum") <= -2944438979L, "accept_h0")
              .otherwise("continue").as("decision"))
          .orderBy("day")
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
          |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
          |  FROM events),
          |g AS (
          |  SELECT
          |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS gn1,
          |    SUM(CASE WHEN arm = 0 THEN err ELSE 0 END) AS gk1,
          |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS gn2,
          |    SUM(CASE WHEN arm = 1 THEN err ELSE 0 END) AS gk2
          |  FROM e),
          |daily AS (
          |  SELECT day,
          |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n1,
          |    SUM(CASE WHEN arm = 0 THEN err ELSE 0 END) AS k1,
          |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n2,
          |    SUM(CASE WHEN arm = 1 THEN err ELSE 0 END) AS k2
          |  FROM e GROUP BY 1),
          |t AS (
          |  SELECT day, n1, k1, n2, k2,
          |    CAST(gk1 AS DOUBLE) / CAST(gn1 AS DOUBLE) AS p1,
          |    CAST(gk2 AS DOUBLE) / CAST(gn2 AS DOUBLE) AS p2,
          |    CAST(gk1 + gk2 AS DOUBLE) / CAST(gn1 + gn2 AS DOUBLE) AS p0
          |  FROM daily CROSS JOIN g),
          |q AS (
          |  SELECT day,
          |    CAST(ROUND((
          |        k1 * (ln(p1) - ln(p0))
          |      + (n1 - k1) * (ln(CAST(1.0 AS DOUBLE) - p1) - ln(CAST(1.0 AS DOUBLE) - p0))
          |      + k2 * (ln(p2) - ln(p0))
          |      + (n2 - k2) * (ln(CAST(1.0 AS DOUBLE) - p2) - ln(CAST(1.0 AS DOUBLE) - p0))
          |    ) * 1e9, 0) AS BIGINT) AS qterm
          |  FROM t),
          |c AS (
          |  SELECT day, SUM(qterm) OVER (ORDER BY day
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qcum
          |  FROM q)
          |SELECT strftime(day, '%Y-%m-%d') AS day,
          |  ROUND(CAST(qcum AS DOUBLE) / 1e9, 6) AS cum_llr,
          |  CASE WHEN qcum >= 2944438979 THEN 'accept_h1'
          |       WHEN qcum <= -2944438979 THEN 'accept_h0'
          |       ELSE 'continue' END AS decision
          |FROM c ORDER BY day""".stripMargin),
      doc = "Wald SPRT over daily cohort error streams - quantized LLR, ln(19) bounds"),

    // One-way ANOVA across event types on order values — the k-group
    // extension of the Welch pair test: F = (SSB/(k−1)) / (SSW/(N−k))
    // from per-group moment sums. Per-group n/Σx/Σx² are exact BIGINTs;
    // the (Σx)² terms must square AFTER the double cast (BIGINT overflow)
    // and the k per-group doubles are quantized before the cross-group
    // sum, so no reduction order leaks in.
    "stats_anova" -> QueryDef(
      build = (s, dir) => {
        val g = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("qb", expr(
            """CAST(ROUND(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              |  / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT)""".stripMargin))
          .withColumn("qw", expr(
            """CAST(ROUND((CAST(sxx AS DOUBLE)
              |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              |  * 1e6, 0) AS BIGINT)""".stripMargin))
        g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
            sum(col("sx")).as("gsx"), sum(col("qb")).as("sqb"),
            sum(col("qw")).as("ssw_q"))
          .select(col("k"), col("nn").as("n_total"),
            round((col("sqb").cast("double") / 1e6 -
              col("gsx").cast("double") * col("gsx").cast("double") /
                col("nn").cast("double")) / 100.0, 2).as("ssb_dollars2"),
            round(col("ssw_q").cast("double") / 1e6 / 100.0, 2).as("ssw_dollars2"),
            round(((col("sqb").cast("double") / 1e6 -
              col("gsx").cast("double") * col("gsx").cast("double") /
                col("nn").cast("double")) / (col("k") - 1).cast("double")) /
              ((col("ssw_q").cast("double") / 1e6) /
                (col("nn") - col("k")).cast("double")), 6).as("f_stat"))
      },
      oracle = Some(
        """WITH g AS (
          |  SELECT event_type, COUNT(*) AS n,
          |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS sx,
          |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
          |        * CAST(ROUND(value * 100, 0) AS BIGINT)) AS sxx
          |  FROM events WHERE value IS NOT NULL GROUP BY 1),
          |q AS (
          |  SELECT n, sx,
          |    CAST(ROUND(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          |      / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT) AS qb,
          |    CAST(ROUND((CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |      * 1e6, 0) AS BIGINT) AS qw
          |  FROM g),
          |agg AS (
          |  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(sx) AS gsx,
          |    SUM(qb) AS sqb, SUM(qw) AS ssw_q
          |  FROM q)
          |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n_total,
          |  ROUND((CAST(sqb AS DOUBLE) / 1e6
          |    - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) / CAST(nn AS DOUBLE))
          |    / 100.0, 2) AS ssb_dollars2,
          |  ROUND(CAST(ssw_q AS DOUBLE) / 1e6 / 100.0, 2) AS ssw_dollars2,
          |  ROUND(((CAST(sqb AS DOUBLE) / 1e6
          |    - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) / CAST(nn AS DOUBLE))
          |    / CAST(k - 1 AS DOUBLE))
          |    / ((CAST(ssw_q AS DOUBLE) / 1e6) / CAST(nn - k AS DOUBLE)), 6)
          |    AS f_stat
          |FROM agg""".stripMargin),
      doc = "One-way ANOVA F across event types - quantized per-group moment terms"),

    // Behavioral predictability: how much does knowing the PREVIOUS event
    // type tell you about the next one? H(next), the conditional
    // H(next|prev), and their difference (mutual information of the
    // transition pair) — the scalar that says whether evt_transitions'
    // matrix carries signal or is just the marginal repeated. Every
    // entropy term comes from exact counts and is quantized before the
    // cell sum (≤|types|² cells).
    "evt_markov_infogain" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("prev_type"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .filter(col("next_type").isNotNull)
          .groupBy("prev_type", "next_type").agg(count(lit(1)).as("nij"))
        val cells = graft.Caches.lazyBarrier(pairs)
        val rows = cells.groupBy("prev_type").agg(sum(col("nij")).as("ni"))
        val cols_ = cells.groupBy("next_type").agg(sum(col("nij")).as("nj"))
        val tot = cells.agg(sum(col("nij")).as("nn"))
        val hcond = cells.join(broadcast(rows), "prev_type")
          .crossJoin(broadcast(tot))
          .withColumn("q", expr(
            """CAST(ROUND(-(CAST(nij AS DOUBLE) / CAST(nn AS DOUBLE))
              |  * ln(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE)) * 1e12, 0)
              |  AS BIGINT)""".stripMargin))
          .agg(sum(col("q")).as("qc"))
        val hnext = cols_.crossJoin(broadcast(tot))
          .withColumn("q", expr(
            """CAST(ROUND(-(CAST(nj AS DOUBLE) / CAST(nn AS DOUBLE))
              |  * ln(CAST(nj AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e12, 0)
              |  AS BIGINT)""".stripMargin))
          .agg(sum(col("q")).as("qn"))
        hcond.crossJoin(broadcast(hnext)).crossJoin(broadcast(tot))
          .select(col("nn").as("n_transitions"),
            round(col("qn").cast("double") / 1e12, 6).as("h_next"),
            round(col("qc").cast("double") / 1e12, 6).as("h_next_given_prev"),
            round((col("qn") - col("qc")).cast("double") / 1e12, 6).as("info_gain"))
      },
      oracle = Some(
        """WITH seq AS (
          |  SELECT event_type AS prev_type,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS next_type
          |  FROM events),
          |cells AS (
          |  SELECT prev_type, next_type, COUNT(*) AS nij
          |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
          |rows_ AS (SELECT prev_type, SUM(nij) AS ni FROM cells GROUP BY 1),
          |cols_ AS (SELECT next_type, SUM(nij) AS nj FROM cells GROUP BY 1),
          |tot AS (SELECT SUM(nij) AS nn FROM cells),
          |hcond AS (
          |  SELECT SUM(CAST(ROUND(-(CAST(nij AS DOUBLE) / CAST(nn AS DOUBLE))
          |    * ln(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE)) * 1e12, 0)
          |    AS BIGINT)) AS qc
          |  FROM cells JOIN rows_ USING (prev_type) CROSS JOIN tot),
          |hnext AS (
          |  SELECT SUM(CAST(ROUND(-(CAST(nj AS DOUBLE) / CAST(nn AS DOUBLE))
          |    * ln(CAST(nj AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e12, 0)
          |    AS BIGINT)) AS qn
          |  FROM cols_ CROSS JOIN tot)
          |SELECT CAST(tot.nn AS BIGINT) AS n_transitions,
          |  ROUND(CAST(qn AS DOUBLE) / 1e12, 6) AS h_next,
          |  ROUND(CAST(qc AS DOUBLE) / 1e12, 6) AS h_next_given_prev,
          |  ROUND(CAST(qn - qc AS DOUBLE) / 1e12, 6) AS info_gain
          |FROM hcond CROSS JOIN hnext CROSS JOIN tot""".stripMargin),
      doc = "Markov mutual information: H(next) - H(next|prev) from exact transition counts"),

    // Effect sizes — the MAGNITUDE layer the significance tests
    // (z/t/U/χ²) deliberately don't report: Cohen's d on the value gap,
    // rank-biserial r = 2U/(n0·n1) − 1 from the exact Mann–Whitney 2U,
    // and Cramér's V from the type×cohort χ² (2 cohort levels ⇒
    // V = √(χ²/N)). Same exact-integer machinery as the tests they
    // accompany; all three on one output row.
    "stats_effect_sizes" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        // Cohen's d from cohort moment sums
        val mo = ev.filter(col("value").isNotNull)
          .select((col("user_id") % 2).as("cohort"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("x"))
          .groupBy("cohort").agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("m", col("sx").cast("double") / col("n").cast("double"))
          .withColumn("v",
            (col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") /
                col("n").cast("double")) / (col("n") - 1).cast("double"))
        val d = mo.filter(col("cohort") === 0)
          .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
          .crossJoin(broadcast(mo.filter(col("cohort") === 1)
            .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))))
          .select(((col("m1") - col("m2")) /
            sqrt(((col("n1") - 1).cast("double") * col("v1") +
              (col("n2") - 1).cast("double") * col("v2")) /
              (col("n1") + col("n2") - 2).cast("double"))).as("cohens_d"))
        // rank-biserial from the exact 2U
        val pts = ev.filter(col("value").isNotNull)
          .select((col("user_id") % 2).as("cohort"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
          .groupBy("cents").agg(
            sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c0"),
            sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c1"))
        val wB = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
        val rb = pts
          .withColumn("cum1b", coalesce(sum(col("c1")).over(wB), lit(0L)))
          .agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
            sum(col("c0") * col("cum1b") * 2L + col("c0") * col("c1")).as("u2"))
          .select((col("u2").cast("double") /
            (col("n0").cast("double") * col("n1").cast("double")) - lit(1.0d))
            .as("rank_biserial"))
        // Cramér's V from the type×cohort chi-squared
        val cells = ev.select(col("event_type"), (col("user_id") % 2).as("cohort"))
          .groupBy("event_type", "cohort").agg(count(lit(1)).as("o"))
        val rT = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
        val cT = cells.groupBy("cohort").agg(sum(col("o")).as("c"))
        val nT = cells.agg(sum(col("o")).as("nn"))
        val chi = cells.join(broadcast(rT), "event_type")
          .join(broadcast(cT), "cohort").crossJoin(broadcast(nT))
          .withColumn("q", expr(
            """CAST(ROUND(CAST((o * nn - r * c) AS DOUBLE)
              |  * CAST((o * nn - r * c) AS DOUBLE)
              |  / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
              |  * 1e6, 0) AS BIGINT)""".stripMargin))
          .agg(sum(col("q")).as("qchi"), max(col("nn")).as("nn"))
          .select(sqrt((col("qchi").cast("double") / 1e6) /
            col("nn").cast("double")).as("cramers_v"))
        d.crossJoin(broadcast(rb)).crossJoin(broadcast(chi))
          .select(round(col("cohens_d"), 6).as("cohens_d"),
            round(col("rank_biserial"), 6).as("rank_biserial"),
            round(col("cramers_v"), 6).as("cramers_v"))
      },
      oracle = Some(
        """WITH mo AS (
          |  SELECT user_id % 2 AS cohort, COUNT(*) AS n,
          |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS sx,
          |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
          |        * CAST(ROUND(value * 100, 0) AS BIGINT)) AS sxx
          |  FROM events WHERE value IS NOT NULL GROUP BY 1),
          |st AS (
          |  SELECT cohort, n,
          |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m,
          |    (CAST(sxx AS DOUBLE)
          |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |      / CAST(n - 1 AS DOUBLE) AS v
          |  FROM mo),
          |d AS (
          |  SELECT (a0.m - a1.m) / SQRT(
          |    (CAST(a0.n - 1 AS DOUBLE) * a0.v + CAST(a1.n - 1 AS DOUBLE) * a1.v)
          |    / CAST(a0.n + a1.n - 2 AS DOUBLE)) AS cohens_d
          |  FROM (SELECT * FROM st WHERE cohort = 0) a0
          |  CROSS JOIN (SELECT * FROM st WHERE cohort = 1) a1),
          |pts AS (
          |  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
          |    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS c0,
          |    SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS c1
          |  FROM events WHERE value IS NOT NULL GROUP BY 1),
          |terms AS (
          |  SELECT c0, c1,
          |    COALESCE(SUM(c1) OVER (ORDER BY cents
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum1b
          |  FROM pts),
          |rb AS (
          |  SELECT CAST(SUM(c0 * cum1b * 2 + c0 * c1) AS DOUBLE)
          |    / (CAST(SUM(c0) AS DOUBLE) * CAST(SUM(c1) AS DOUBLE))
          |    - CAST(1.0 AS DOUBLE) AS rank_biserial
          |  FROM terms),
          |cells AS (
          |  SELECT event_type, user_id % 2 AS cohort, COUNT(*) AS o
          |  FROM events GROUP BY 1, 2),
          |rt AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
          |ct AS (SELECT cohort, SUM(o) AS c FROM cells GROUP BY 1),
          |nt AS (SELECT SUM(o) AS nn FROM cells),
          |chi AS (
          |  SELECT SQRT((CAST(SUM(CAST(ROUND(
          |      CAST((o * nn - r * c) AS DOUBLE) * CAST((o * nn - r * c) AS DOUBLE)
          |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
          |      * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6)
          |    / CAST(MAX(nn) AS DOUBLE)) AS cramers_v
          |  FROM cells JOIN rt USING (event_type) JOIN ct USING (cohort)
          |  CROSS JOIN nt)
          |SELECT ROUND(cohens_d, 6) AS cohens_d,
          |  ROUND(rank_biserial, 6) AS rank_biserial,
          |  ROUND(cramers_v, 6) AS cramers_v
          |FROM d CROSS JOIN rb CROSS JOIN chi""".stripMargin),
      doc = "Effect sizes: Cohen's d, rank-biserial from exact 2U, Cramer's V - magnitude beside significance"),

    // Wald–Wolfowitz runs test on the daily error-rate sequence: is the
    // above/below-median pattern random, or does it trend/oscillate?
    // The median is an indexed pick from the sorted 30-value day domain
    // (both engines divide the same exact counts, so the rate doubles
    // are identical); runs, n_above, n_below are exact integers and the
    // z-statistic is one shared double tree. Ties at the median count as
    // "below" (stated, deterministic).
    "stats_runs_test" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("k"))
          .withColumn("rate", col("k").cast("double") / col("n").cast("double"))
        val med = daily.agg(
          expr("element_at(array_sort(collect_list(rate)), CAST((count(1) + 1) div 2 AS INT))")
            .as("med"))
        val wd = Window.orderBy("day")
        val signs = daily.crossJoin(broadcast(med))
          .withColumn("above", when(col("rate") > col("med"), 1L).otherwise(0L))
          .withColumn("prev", lag(col("above"), 1).over(wd))
        signs.agg(
            count(lit(1)).as("n_days"),
            sum(col("above")).as("n1"),
            sum(lit(1L) - col("above")).as("n2"),
            (sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
              .otherwise(0L))).as("runs"))
          .select(col("n_days"), col("n1"), col("n2"), col("runs"),
            round((col("runs").cast("double") -
              (lit(2.0d) * col("n1").cast("double") * col("n2").cast("double") /
                (col("n1") + col("n2")).cast("double") + lit(1.0d))) /
              sqrt(lit(2.0d) * col("n1").cast("double") * col("n2").cast("double") *
                (lit(2.0d) * col("n1").cast("double") * col("n2").cast("double") -
                  (col("n1") + col("n2")).cast("double")) /
                ((col("n1") + col("n2")).cast("double") *
                  (col("n1") + col("n2")).cast("double") *
                  (col("n1") + col("n2") - 1).cast("double"))), 6).as("z"))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
          |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS k
          |  FROM events GROUP BY 1),
          |r AS (
          |  SELECT day, CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate FROM daily),
          |med AS (
          |  SELECT list_sort(list(rate))[CAST((COUNT(*) + 1) // 2 AS INT)] AS med
          |  FROM r),
          |signs AS (
          |  SELECT day,
          |    CASE WHEN rate > med THEN 1 ELSE 0 END AS above,
          |    lag(CASE WHEN rate > med THEN 1 ELSE 0 END)
          |      OVER (ORDER BY day) AS prev
          |  FROM r CROSS JOIN med),
          |agg AS (
          |  SELECT COUNT(*) AS n_days, SUM(above) AS n1, SUM(1 - above) AS n2,
          |    SUM(CASE WHEN prev IS NULL OR prev <> above THEN 1 ELSE 0 END)
          |      AS runs
          |  FROM signs)
          |SELECT CAST(n_days AS BIGINT) AS n_days, CAST(n1 AS BIGINT) AS n1,
          |  CAST(n2 AS BIGINT) AS n2, CAST(runs AS BIGINT) AS runs,
          |  ROUND((CAST(runs AS DOUBLE)
          |    - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
          |       / CAST(n1 + n2 AS DOUBLE) + 1.0))
          |   / SQRT(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
          |     * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
          |        - CAST(n1 + n2 AS DOUBLE))
          |     / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
          |        * CAST(n1 + n2 - 1 AS DOUBLE))), 6) AS z
          |FROM agg""".stripMargin),
      doc = "Wald-Wolfowitz runs test on daily error rates - indexed-pick median, exact runs"),

    // Mann–Kendall trend test per event type: S = Σ_{i<j} sign(xⱼ−xᵢ)
    // over the daily-count series with the tie-corrected variance and
    // continuity-corrected z — the nonparametric trend TEST beside the
    // Theil–Sen slope ESTIMATE (same O(days²) pair set, bounded by the
    // calendar, never the corpus). S, the tie term and both counts are
    // exact BIGINTs.
    "stats_mann_kendall" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val a = daily.select(col("event_type"), col("day").as("di"), col("n").as("xi"))
        val b = daily.select(col("event_type"), col("day").as("dj"), col("n").as("xj"))
        val sS = a.join(b, Seq("event_type")).filter(col("di") < col("dj"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("xj") > col("xi"), 1L)
              .when(col("xj") < col("xi"), -1L).otherwise(0L)).as("s"))
        val ties = daily.groupBy("event_type", "n").agg(count(lit(1)).as("t"))
          .groupBy("event_type")
          .agg(sum(col("t") * (col("t") - 1L) * (col("t") * 2L + 5L)).as("tt"),
            sum(col("t")).as("nd"))
        sS.join(ties, "event_type")
          .withColumn("varS",
            ((col("nd") * (col("nd") - 1L) * (col("nd") * 2L + 5L) - col("tt"))
              .cast("double")) / lit(18.0d))
          .select(col("event_type"), col("nd").as("n_days"), col("s"),
            round(
              when(col("s") > 0, (col("s") - 1L).cast("double") / sqrt(col("varS")))
                .when(col("s") < 0, (col("s") + 1L).cast("double") / sqrt(col("varS")))
                .otherwise(lit(0.0d)), 6).as("z"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
          |  FROM events GROUP BY 1, 2),
          |pr AS (
          |  SELECT a.event_type,
          |    SUM(CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END)
          |      AS s,
          |    COUNT(*) AS n_pairs
          |  FROM daily a JOIN daily b
          |    ON a.event_type = b.event_type AND a.day < b.day
          |  GROUP BY 1),
          |ties AS (
          |  SELECT event_type,
          |    SUM(t * (t - 1) * (t * 2 + 5)) AS tt, SUM(t) AS nd
          |  FROM (SELECT event_type, n, COUNT(*) AS t FROM daily GROUP BY 1, 2)
          |  GROUP BY 1),
          |j AS (
          |  SELECT pr.event_type, nd, s,
          |    CAST(nd * (nd - 1) * (nd * 2 + 5) - tt AS DOUBLE) / 18.0 AS varS
          |  FROM pr JOIN ties USING (event_type))
          |SELECT event_type, CAST(nd AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s,
          |  ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / SQRT(varS)
          |             WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / SQRT(varS)
          |             ELSE CAST(0.0 AS DOUBLE) END, 6) AS z
          |FROM j ORDER BY event_type""".stripMargin),
      doc = "Mann-Kendall trend test per type - exact S and tie term, calendar-bounded pairs"),

    // Ljung–Box portmanteau test per event type: Q = n(n+2)·Σ r²ₖ/(n−k)
    // over lags 1..7 of the daily-count series — "is there ANY
    // autocorrelation left" (the residual-whiteness check behind
    // ts_acf's per-lag view). Each rₖ is assembled from exact integer
    // sums via the centered-sum identity (Σxₜxₜ₊ₖ, window-head/tail
    // sums, global moments); the 7 per-lag terms are quantized before
    // summing.
    "ts_ljung_box" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val rn = daily.withColumn("rn",
          row_number().over(Window.partitionBy("event_type").orderBy("day")))
        val g = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
        val withLag = rn
          .withColumn("k", explode(array((1 to 7).map(lit): _*)))
          .select(col("event_type"), col("rn"), col("k"), col("x").as("xt"))
        val pairs = withLag.as("a").join(rn.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("b.rn") === col("a.rn") + col("a.k"))
          .select(col("a.event_type").as("event_type"), col("a.k").as("k"),
            col("a.xt").as("xt"), col("b.x").as("xk"))
        val perLag = pairs.groupBy("event_type", "k")
          .agg(count(lit(1)).as("npk"), sum(col("xt") * col("xk")).as("spk"),
            sum(col("xt")).as("shd"), sum(col("xk")).as("stl"))
        perLag.join(broadcast(g), "event_type")
          .withColumn("m", col("sx").cast("double") / col("n").cast("double"))
          .withColumn("rk",
            (col("spk").cast("double") - col("m") * (col("shd") + col("stl")).cast("double")
              + col("npk").cast("double") * col("m") * col("m")) /
              (col("sxx").cast("double") - col("sx").cast("double") * col("m")))
          .withColumn("qt", expr(
            "CAST(ROUND(rk * rk / CAST(n - k AS DOUBLE) * 1e9, 0) AS BIGINT)"))
          .groupBy("event_type")
          .agg(max(col("n")).as("n_days"), sum(col("qt")).as("qs"))
          .select(col("event_type"), col("n_days").cast("long").as("n_days"),
            lit(7).as("df"),
            round(col("n_days").cast("double") * (col("n_days") + 2L).cast("double") *
              (col("qs").cast("double") / 1e9), 6).as("q_stat"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
          |  FROM events GROUP BY 1, 2),
          |rn AS (
          |  SELECT event_type, x,
          |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
          |  FROM daily),
          |g AS (
          |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
          |  FROM daily GROUP BY 1),
          |pairs AS (
          |  SELECT a.event_type, l.k, a.x AS xt, b.x AS xk
          |  FROM rn a
          |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS k) l
          |  JOIN rn b ON b.event_type = a.event_type AND b.rn = a.rn + l.k),
          |perlag AS (
          |  SELECT event_type, k, COUNT(*) AS npk, SUM(xt * xk) AS spk,
          |    SUM(xt) AS shd, SUM(xk) AS stl
          |  FROM pairs GROUP BY 1, 2),
          |rks AS (
          |  SELECT p.event_type, g.n, p.k,
          |    (CAST(spk AS DOUBLE)
          |     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |       * CAST(shd + stl AS DOUBLE)
          |     + CAST(npk AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
          |    / (CAST(sxx AS DOUBLE)
          |       - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
          |      AS rk
          |  FROM perlag p JOIN g USING (event_type)),
          |terms AS (
          |  SELECT event_type, n,
          |    CAST(ROUND(rk * rk / CAST(n - k AS DOUBLE) * 1e9, 0) AS BIGINT) AS qt
          |  FROM rks)
          |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
          |  CAST(7 AS INT) AS df,
          |  ROUND(CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) + 2 AS DOUBLE)
          |        * (CAST(SUM(qt) AS DOUBLE) / 1e9), 6) AS q_stat
          |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "Ljung-Box Q per type over lags 1..7 - centered-sum r_k from exact sums"),

    // Kruskal–Wallis H across the THREE id-residue cohorts — the k-group
    // generalization of stats_mannwhitney, same exactness discipline:
    // doubled midranks (2r = 2·cumbefore + t + 1) keep every rank sum a
    // BIGINT (no 0.5 doubles), the three per-group rank sums are pivoted
    // to columns by conditional aggregation (never a cross-row double
    // SUM), and H plus its tie correction are a single scalar expression
    // tree written from one shared fragment on both engines. The
    // cumulative window runs over the distinct-cents value domain, not
    // the event stream.
    "stats_kruskal" -> QueryDef(
      build = (s, dir) => {
        val v = Tables.events(s, dir).filter(col("value").isNotNull)
          .select((col("user_id") % 3).as("cohort"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val pts = v.groupBy("cents").agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c1"),
          sum(when(col("cohort") === 2, 1L).otherwise(0L)).as("c2"))
        val wB = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val terms = pts
          .withColumn("t", col("c0") + col("c1") + col("c2"))
          .withColumn("cumb", coalesce(sum(col("t")).over(wB), lit(0L)))
          .withColumn("r2", col("cumb") * 2L + col("t") + 1L)
        terms.agg(
            sum("c0").as("n0"), sum("c1").as("n1"), sum("c2").as("n2"),
            sum(col("c0") * col("r2")).as("r20"),
            sum(col("c1") * col("r2")).as("r21"),
            sum(col("c2") * col("r2")).as("r22"),
            sum(col("t") * col("t") * col("t") - col("t")).as("ties3"))
          .select(col("n0"), col("n1"), col("n2"),
            expr(s"ROUND($sqlKwH, 6) + 0.0").as("h"),
            expr(s"ROUND(($sqlKwH) / $sqlKwC, 6) + 0.0").as("h_adj"))
      },
      oracle = Some(
        s"""WITH v AS (
           |  SELECT user_id % 3 AS cohort,
           |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           |  FROM events WHERE value IS NOT NULL),
           |pts AS (
           |  SELECT cents,
           |    CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
           |    CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           |    CAST(SUM(CASE WHEN cohort = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
           |  FROM v GROUP BY 1),
           |terms AS (
           |  SELECT c0, c1, c2, c0 + c1 + c2 AS t,
           |    COALESCE(SUM(c0 + c1 + c2) OVER (ORDER BY cents
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
           |  FROM pts),
           |t2 AS (SELECT *, cumb * 2 + t + 1 AS r2 FROM terms),
           |agg AS (
           |  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
           |    CAST(SUM(c2) AS BIGINT) AS n2,
           |    CAST(SUM(c0 * r2) AS BIGINT) AS r20,
           |    CAST(SUM(c1 * r2) AS BIGINT) AS r21,
           |    CAST(SUM(c2 * r2) AS BIGINT) AS r22,
           |    CAST(SUM(t * t * t - t) AS BIGINT) AS ties3
           |  FROM t2)
           |SELECT n0, n1, n2,
           |  ROUND($sqlKwH, 6) + 0.0 AS h,
           |  ROUND(($sqlKwH) / $sqlKwC, 6) + 0.0 AS h_adj
           |FROM agg""".stripMargin),
      doc = "Kruskal-Wallis H + tie correction across 3 cohorts - doubled-midrank BIGINT sums"),

    // Two-sample permutation test for the cohort mean difference, with
    // HASH-SEEDED label reassignment (poly hash of user_id:replicate) so
    // every replicate is reproducible under retries and identical on
    // both engines — the exchangeability-based companion of
    // evt_ab_ztest that needs no normality assumption. Exactness: the
    // per-user totals are cents BIGINTs, each replicate's group sums are
    // integer conditional aggregations, and each diff-of-means is one
    // double expression over exact integers — so the |diff| >= |obs|
    // comparisons agree bit-for-bit. Scale shape: the 200-replicate
    // fan-out explodes the per-USER aggregate (not the event stream),
    // and each replicate reduces map-side to four integers.
    "stats_permutation" -> QueryDef(
      build = (s, dir) => {
        graft.functions.Hashing.register(s)
        val pu = Tables.events(s, dir).filter(col("value").isNotNull)
          .groupBy("user_id")
          .agg(sum(expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).as("cents"))
        val obs = pu.agg(
          (sum(when(col("user_id") % 2 === 0, col("cents")).otherwise(0L))
            .cast("double") /
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).cast("double") -
            sum(when(col("user_id") % 2 === 1, col("cents")).otherwise(0L))
              .cast("double") /
              sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).cast("double"))
            .as("obs_d"))
        val reps = pu.select(col("user_id"), col("cents"),
            explode(sequence(lit(0), lit(199))).as("r"))
          .withColumn("g", TextOps.polyHash(
            concat(col("user_id").cast("string"), lit(":"),
              col("r").cast("string")), P) % 2)
        val pr = reps.groupBy("r").agg(
          (sum(when(col("g") === 0, col("cents")).otherwise(0L)).cast("double") /
            sum(when(col("g") === 0, 1L).otherwise(0L)).cast("double") -
            sum(when(col("g") === 1, col("cents")).otherwise(0L)).cast("double") /
              sum(when(col("g") === 1, 1L).otherwise(0L)).cast("double")).as("diff"))
        pr.crossJoin(broadcast(obs))
          .agg(
            sum(when(abs(col("diff")) >= abs(col("obs_d")), 1L).otherwise(0L))
              .as("n_ge"),
            min(col("obs_d")).as("od"))
          .select((round(col("od"), 6) + lit(0.0)).as("obs_diff"), col("n_ge"),
            round((col("n_ge") + lit(1L)).cast("double") / 201.0, 6).as("p_value"))
      },
      oracle = Some(
        s"""WITH pu AS (
           |  SELECT user_id,
           |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
           |  FROM events WHERE value IS NOT NULL GROUP BY 1),
           |obs AS (
           |  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN cents ELSE 0 END) AS DOUBLE)
           |      / CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           |    - CAST(SUM(CASE WHEN user_id % 2 = 1 THEN cents ELSE 0 END) AS DOUBLE)
           |      / CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |    AS obs_d
           |  FROM pu),
           |reps AS (
           |  SELECT user_id, cents, unnest(generate_series(0, 199)) AS r FROM pu),
           |g AS (
           |  SELECT r, cents,
           |    ${sqlPolyHash("CAST(user_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)", P)} % 2 AS g
           |  FROM reps),
           |pr AS (
           |  SELECT r,
           |    CAST(SUM(CASE WHEN g = 0 THEN cents ELSE 0 END) AS DOUBLE)
           |      / CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           |    - CAST(SUM(CASE WHEN g = 1 THEN cents ELSE 0 END) AS DOUBLE)
           |      / CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS diff
           |  FROM g GROUP BY 1)
           |SELECT ROUND(MIN(obs_d), 6) + 0.0 AS obs_diff,
           |  CAST(SUM(CASE WHEN ABS(diff) >= ABS(obs_d) THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_ge,
           |  ROUND(CAST(SUM(CASE WHEN ABS(diff) >= ABS(obs_d) THEN 1 ELSE 0 END) + 1
           |        AS DOUBLE) / 201.0, 6) AS p_value
           |FROM pr, obs""".stripMargin),
      doc = "Hash-seeded two-sample permutation test (200 replicates) - exact integer group sums"),

    // Benjamini–Hochberg FDR over the per-type weekend-rate z-tests: each
    // event type's weekend share vs the corpus-wide share, two-sided
    // normal p via the Abramowitz–Stegun 26.2.17 polynomial (the SAME
    // fragment text is compiled by Spark's `expr` and by DuckDB, so the
    // arithmetic tree is identical), then the step-up rule at q = 0.10.
    // Day-of-week comes from epoch-day mod 7 (engine-neutral; 0 =
    // Thursday, weekend = {2, 3}), the ok-rank maximum is a broadcast
    // scalar join, and every count stays BIGINT until the final
    // expressions.
    "stats_fdr_bh" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("dow",
            pmod(datediff(to_date(col("ts")), to_date(lit("1970-01-01"))), lit(7)))
          .withColumn("wk", when(col("dow").isin(2, 3), 1L).otherwise(0L))
        val types = e.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("wk")).as("k"))
        val tot = e.agg(count(lit(1)).as("nt"), sum(col("wk")).as("kt"))
        val zed = types.crossJoin(broadcast(tot))
          .withColumn("z", expr(
            "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) " +
              "/ SQRT(CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE) " +
              "* (1.0 - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) / CAST(n AS DOUBLE))"))
          .withColumn("p_raw", expr(sqlNormTwoSidedP("z")))
        val ranked = zed.withColumn("rank",
          row_number().over(Window.orderBy(col("p_raw"), col("event_type"))))
        val m = ranked.agg(count(lit(1)).as("m"))
        val ok = ranked.crossJoin(broadcast(m))
          .withColumn("ok",
            col("p_raw") <= lit(0.10) * col("rank").cast("double") / col("m").cast("double"))
        val thr = ok.agg(max(when(col("ok"), col("rank")).otherwise(0)).as("maxok"))
        ok.crossJoin(broadcast(thr))
          .select(col("event_type"), col("n"), col("k"),
            (round(col("z"), 6) + lit(0.0)).as("z"), round(col("p_raw"), 6).as("p"),
            col("rank"), (col("rank") <= col("maxok")).as("rejected"))
          .orderBy("rank")
      },
      oracle = Some(
        s"""WITH e AS (
           |  SELECT event_type,
           |    CASE WHEN (CAST(ts AS DATE) - DATE '1970-01-01') % 7 IN (2, 3)
           |      THEN 1 ELSE 0 END AS wk
           |  FROM events),
           |types AS (
           |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(wk) AS BIGINT) AS k
           |  FROM e GROUP BY 1),
           |tot AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS nt, CAST(SUM(wk) AS BIGINT) AS kt
           |  FROM e),
           |zed AS (
           |  SELECT event_type, n, k,
           |    (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) / SQRT(CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE) * (1.0 - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) / CAST(n AS DOUBLE)) AS z
           |  FROM types, tot),
           |pz AS (SELECT *, ${sqlNormTwoSidedP("z")} AS p_raw FROM zed),
           |ranked AS (
           |  SELECT *, ROW_NUMBER() OVER (ORDER BY p_raw, event_type) AS rank
           |  FROM pz),
           |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ranked),
           |ok AS (
           |  SELECT ranked.*,
           |    p_raw <= 0.10 * CAST(rank AS DOUBLE) / CAST(m AS DOUBLE) AS ok
           |  FROM ranked, mm),
           |thr AS (SELECT MAX(CASE WHEN ok THEN rank ELSE 0 END) AS maxok FROM ok)
           |SELECT event_type, n, k, ROUND(z, 6) + 0.0 AS z, ROUND(p_raw, 6) AS p, rank,
           |  rank <= maxok AS rejected
           |FROM ok, thr ORDER BY rank""".stripMargin),
      doc = "Benjamini-Hochberg FDR step-up over per-type weekend-rate z-tests at q=0.10"),

    // Single changepoint by binary segmentation over the daily event
    // count series: the split maximizing the between-segment sum-of-
    // squares reduction, scored as (S1·n2 − S2·n1)²/(n1·n2) from exact
    // prefix sums (the numerator is cast to double BEFORE squaring so
    // the op never overflows BIGINT at any corpus size). One window pass
    // over the days-sized series, one scalar broadcast for the totals;
    // top-3 splits reported with deterministic day tie-break.
    "ts_changepoint" -> QueryDef(
      build = (s, dir) => {
        val d = Tables.events(s, dir).groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy("day")
        val c = d
          .withColumn("s1", sum(col("n")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("i", row_number().over(w).cast("long"))
        val tot = d.agg(sum(col("n")).as("tt"), count(lit(1)).as("dd"))
        val sc = c.crossJoin(broadcast(tot)).filter(col("i") < col("dd"))
          .withColumn("num",
            (col("s1") * (col("dd") - col("i")) - (col("tt") - col("s1")) * col("i"))
              .cast("double"))
          .withColumn("score", col("num") * col("num") /
            (col("i").cast("double") * (col("dd") - col("i")).cast("double")))
        sc.select(date_format(col("day"), "yyyy-MM-dd").as("split_day"),
            round(col("s1").cast("double") / col("i").cast("double"), 4)
              .as("mean_before"),
            round((col("tt") - col("s1")).cast("double") /
              (col("dd") - col("i")).cast("double"), 4).as("mean_after"),
            round(col("score"), 4).as("score"))
          .orderBy(col("score").desc, col("split_day"))
          .limit(3)
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1),
          |c AS (
          |  SELECT day, n,
          |    CAST(SUM(n) OVER (ORDER BY day
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
          |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
          |  FROM d),
          |tot AS (
          |  SELECT CAST(SUM(n) AS BIGINT) AS tt, CAST(COUNT(*) AS BIGINT) AS dd
          |  FROM d),
          |sc AS (
          |  SELECT day, s1, i, tt, dd,
          |    CAST(s1 * (dd - i) - (tt - s1) * i AS DOUBLE) AS num
          |  FROM c, tot WHERE i < dd)
          |SELECT strftime(day, '%Y-%m-%d') AS split_day,
          |  ROUND(CAST(s1 AS DOUBLE) / CAST(i AS DOUBLE), 4) AS mean_before,
          |  ROUND(CAST(tt - s1 AS DOUBLE) / CAST(dd - i AS DOUBLE), 4) AS mean_after,
          |  ROUND(num * num / (CAST(i AS DOUBLE) * CAST(dd - i AS DOUBLE)), 4) AS score
          |FROM sc ORDER BY score DESC, split_day LIMIT 3""".stripMargin),
      doc = "Binary-segmentation changepoint over daily counts - exact prefix sums, top-3 splits"),

    // Calibration of the corpus quality score as a predictor of lang=en,
    // with expected calibration error: decile reliability bins where the
    // per-bin mean score is held EXACT (the 6-dp score is lifted to
    // integer millionths before summation) and the ECE numerator is a
    // BIGINT Σ|psum_b − 10⁶·pos_b| — so the headline calibration number
    // involves no cross-row double fold at all. The model-eval
    // counterpart of txt_quality_filter: before a filter threshold
    // ships, this is the "is the score a probability" check.
    "cal_reliability" -> QueryDef(
      build = (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("q", TextOps.qualityScore(col("text")))
          .withColumn("pm", expr("CAST(ROUND(q * 1000000, 0) AS BIGINT)"))
          .withColumn("bin", least(expr("pm DIV 100000"), lit(9L)))
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
        val bins = d.groupBy("bin").agg(
            count(lit(1)).as("n"), sum(col("y")).as("pos"), sum(col("pm")).as("psum"))
          .withColumn("gapnum", col("psum") - lit(1000000L) * col("pos"))
        val ece = bins.agg(
          sum(abs(col("gapnum"))).as("enum1"), sum(col("n")).as("nt"))
        bins.crossJoin(broadcast(ece))
          .select(col("bin"), col("n"), col("pos"),
            round(col("psum").cast("double") /
              (lit(1000000.0) * col("n").cast("double")), 6).as("avg_p"),
            round(col("pos").cast("double") / col("n").cast("double"), 6)
              .as("frac_pos"),
            (round(col("gapnum").cast("double") /
              (lit(1000000.0) * col("n").cast("double")), 6) + lit(0.0)).as("gap"),
            round(col("enum1").cast("double") /
              (lit(1000000.0) * col("nt").cast("double")), 6).as("ece"))
          .orderBy("bin")
      },
      oracle = Some(
        s"""WITH sc AS (
           |  SELECT lang,
           |    CAST(ROUND(($sqlQualityFragDuck) * 1000000, 0) AS BIGINT) AS pm
           |  FROM documents),
           |b AS (
           |  SELECT LEAST(pm // 100000, 9) AS bin,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, pm
           |  FROM sc),
           |bins AS (
           |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos,
           |    CAST(SUM(pm) AS BIGINT) AS psum
           |  FROM b GROUP BY 1),
           |g AS (SELECT *, psum - 1000000 * pos AS gapnum FROM bins),
           |ece AS (
           |  SELECT CAST(SUM(ABS(gapnum)) AS BIGINT) AS enum1,
           |    CAST(SUM(n) AS BIGINT) AS nt
           |  FROM g)
           |SELECT bin, n, pos,
           |  ROUND(CAST(psum AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)), 6) AS avg_p,
           |  ROUND(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
           |  ROUND(CAST(gapnum AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)), 6) + 0.0
           |    AS gap,
           |  ROUND(CAST(enum1 AS DOUBLE) / (1000000.0 * CAST(nt AS DOUBLE)), 6) AS ece
           |FROM g, ece ORDER BY bin""".stripMargin),
      doc = "Reliability bins + integer-exact ECE for the quality score vs lang=en"),

    // Off-policy evaluation by replay (Li et al., WSDM'11): score a
    // DETERMINISTIC target policy (context = user_id % 5 → one of the 5
    // event types) against the logged stream under a uniform logging
    // propensity. IPS re-weights matching events by 1/propensity = 5;
    // SNIPS self-normalizes by the realized match mass. Rewards are
    // cents BIGINTs end to end, so both estimators are one double
    // division over exact integer sums — the counterfactual "what would
    // this policy have earned" gate before an interleaving experiment.
    "evt_ips_offpolicy" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"), col("event_type"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
          .withColumn("target", expr(
            "CASE CAST(user_id % 5 AS INT) WHEN 0 THEN 'click' WHEN 1 THEN 'error' " +
              "WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' ELSE 'view' END"))
          .withColumn("m", when(col("event_type") === col("target"), 1L)
            .otherwise(0L))
        e.agg(count(lit(1)).as("n"), sum(col("m")).as("n_match"),
            sum(col("cents")).as("tot_cents"),
            sum(col("m") * col("cents")).as("match_cents"))
          .select(col("n"), col("n_match"),
            round(col("tot_cents").cast("double") /
              (lit(100.0) * col("n").cast("double")), 6).as("behavior_value"),
            round(lit(5.0) * col("match_cents").cast("double") /
              (lit(100.0) * col("n").cast("double")), 6).as("ips_value"),
            round(col("match_cents").cast("double") /
              (lit(100.0) * col("n_match").cast("double")), 6).as("snips_value"))
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, event_type,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
          |    CASE CAST(user_id % 5 AS INT) WHEN 0 THEN 'click' WHEN 1 THEN 'error'
          |      WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' ELSE 'view' END AS target
          |  FROM events WHERE value IS NOT NULL),
          |m AS (
          |  SELECT cents,
          |    CASE WHEN event_type = target THEN 1 ELSE 0 END AS m
          |  FROM e),
          |agg AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |    CAST(SUM(m) AS BIGINT) AS n_match,
          |    CAST(SUM(cents) AS BIGINT) AS tot_cents,
          |    CAST(SUM(m * cents) AS BIGINT) AS match_cents
          |  FROM m)
          |SELECT n, n_match,
          |  ROUND(CAST(tot_cents AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6)
          |    AS behavior_value,
          |  ROUND(5.0 * CAST(match_cents AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6)
          |    AS ips_value,
          |  ROUND(CAST(match_cents AS DOUBLE) / (100.0 * CAST(n_match AS DOUBLE)), 6)
          |    AS snips_value
          |FROM agg""".stripMargin),
      doc = "Off-policy replay eval: IPS + SNIPS value of a deterministic target policy, cents-exact"),

    // Point-in-time-correct training-example assembly — the feature-store
    // discipline that prevents label leakage: every purchase event
    // becomes one example whose features are computed from STRICTLY
    // earlier events only. f_last_click rides the asof pattern (last
    // click value before the label, IGNORE NULLS over the 1-PRECEDING
    // frame); f_err_7d is a trailing range frame in exact epoch micros
    // ending 1 µs before the label. One per-user window pass over the
    // unioned stream — at scale this is the standard sort-merge PIT
    // join, user-partitioned, no event ever joins forward in time.
    "feat_pit_assembly" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("click_cents",
            when(col("event_type") === "click", col("cents")))
          .withColumn("err", when(col("event_type") === "error", 1L)
            .otherwise(0L))
        val wPrev = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wRange = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-604800000000L, -1L)
        e.withColumn("f_last_click",
            last(col("click_cents"), ignoreNulls = true).over(wPrev))
          .withColumn("f_err_7d", sum(col("err")).over(wRange))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("label_ts"),
            col("cents").as("label_cents"), col("f_last_click"),
            coalesce(col("f_err_7d"), lit(0L)).as("f_err_7d"))
          .orderBy("event_id")
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT event_id, user_id, ts, event_type,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
          |    epoch_us(ts) AS us,
          |    CASE WHEN event_type = 'click'
          |      THEN CAST(ROUND(value * 100, 0) AS BIGINT) END AS click_cents,
          |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
          |  FROM events),
          |f AS (
          |  SELECT event_id, user_id, ts, event_type, cents,
          |    last_value(click_cents IGNORE NULLS) OVER (
          |      PARTITION BY user_id ORDER BY us, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS f_last_click,
          |    SUM(err) OVER (PARTITION BY user_id ORDER BY us
          |      RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) AS f_err_7d
          |  FROM e)
          |SELECT event_id, user_id,
          |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS label_ts,
          |  cents AS label_cents, f_last_click,
          |  CAST(COALESCE(f_err_7d, 0) AS BIGINT) AS f_err_7d
          |FROM f WHERE event_type = 'purchase'
          |ORDER BY event_id""".stripMargin),
      doc = "Point-in-time feature assembly for purchase labels - strictly-before frames, no leakage"),

    // Hash-based negative sampling for recommendation training pairs:
    // every customer draws 15 deterministic part candidates
    // (poly hash of cust:slot mod |parts|), rejects any part they
    // actually ordered (the positives anti-join) and any within-user
    // duplicate draw (keep the lowest slot), and keeps the first 5
    // survivors in slot order. The rejection-sampling shape is the
    // scale-safe one: candidate volume is a CONSTANT per user (never
    // |users|×|parts|), the positives join is key-equi on (cust, part),
    // and everything replays from the salt.
    "rec_negative_sampling" -> QueryDef(
      build = (s, dir) => {
        graft.functions.Hashing.register(s)
        val pos = Tables.orders(s, dir).select(col("o_custkey").as("cust"),
            col("o_orderkey"))
          .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
            col("l_partkey").as("part")),
            col("o_orderkey") === col("l_orderkey"))
          .select("cust", "part").distinct()
        val nParts = Tables.part(s, dir).agg(count(lit(1)).as("np"))
        val cands = Tables.customer(s, dir).select(col("c_custkey").as("cust"))
          .crossJoin(broadcast(nParts))
          .select(col("cust"), col("np"),
            explode(sequence(lit(0), lit(14))).as("slot"))
          .withColumn("part", TextOps.polyHash(
            concat(col("cust").cast("string"), lit(":"),
              col("slot").cast("string")), P) % col("np"))
        val novel = cands.join(pos, Seq("cust", "part"), "left_anti")
          .groupBy("cust", "part").agg(min(col("slot")).as("slot"))
        novel
          .withColumn("rank", row_number().over(
            Window.partitionBy("cust").orderBy(col("slot"), col("part"))))
          .filter(col("rank") <= 5)
          .select(col("cust"), col("rank"), col("part").as("neg_part"))
          .orderBy("cust", "rank")
      },
      oracle = Some(
        s"""WITH pos AS (
           |  SELECT DISTINCT o_custkey AS cust, l_partkey AS part
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM part),
           |cands AS (
           |  SELECT c_custkey AS cust, slot,
           |    ${sqlPolyHash("CAST(c_custkey AS VARCHAR) || ':' || CAST(slot AS VARCHAR)", P)} % np AS part
           |  FROM customer, np, (SELECT unnest(generate_series(0, 14)) AS slot) s),
           |novel AS (
           |  SELECT cust, part, CAST(MIN(slot) AS BIGINT) AS slot
           |  FROM cands ANTI JOIN pos USING (cust, part)
           |  GROUP BY 1, 2),
           |ranked AS (
           |  SELECT cust, part, slot,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY cust ORDER BY slot, part) AS INT)
           |      AS rank
           |  FROM novel)
           |SELECT cust, rank, part AS neg_part FROM ranked
           |WHERE rank <= 5 ORDER BY cust, rank""".stripMargin),
      doc = "Deterministic hash rejection-sampled recommendation negatives (5 per customer)"),

    // CUPED variance reduction (Deng et al., WSDM'13) for the id-parity
    // A/B: per-user PRE-period value total as the covariate, θ =
    // cov(pre, post)/var(pre) pooled, adjusted outcome y − θ(x − x̄).
    // Every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact cents BIGINT;
    // θ, the adjusted cohort means, and the variance-reduction ratio are
    // single double trees over those integers. The period split is the
    // exact midpoint of the event-time range (integer micros). This is
    // the pre-experiment power tool: same decision, smaller n.
    "stats_cuped" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val mid = e.agg(((min(col("us")) + max(col("us"))) / lit(2L)).as("mid"))
        val pu = e.crossJoin(broadcast(mid))
          .groupBy("user_id")
          .agg(sum(when(col("us") < col("mid"), col("cents")).otherwise(0L))
            .as("x"),
            sum(when(col("us") >= col("mid"), col("cents")).otherwise(0L))
              .as("y"))
          .withColumn("g", col("user_id") % 2)
        val m = pu.agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("g") === 0, col("x")).otherwise(0L)).as("sx0"),
          sum(when(col("g") === 0, col("y")).otherwise(0L)).as("sy0"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("g") === 1, col("x")).otherwise(0L)).as("sx1"),
          sum(when(col("g") === 1, col("y")).otherwise(0L)).as("sy1"))
        m.select(col("n"),
          expr(s"ROUND($sqlCupedTheta, 6)").as("theta"),
          expr("ROUND((CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) " +
            "- CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 100.0, 6)")
            .as("diff_raw"),
          expr(s"ROUND(((CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) " +
            s"- ($sqlCupedTheta) * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) " +
            s"- CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) " +
            s"- (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) " +
            s"- ($sqlCupedTheta) * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) " +
            s"- CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) / 100.0, 6)")
            .as("diff_cuped"),
          expr(s"ROUND(($sqlCupedTheta) * ($sqlCupedTheta) " +
            s"* (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) " +
            s"/ (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)")
            .as("var_reduction"))
      },
      oracle = Some(
        s"""WITH e AS (
           |  SELECT user_id, epoch_us(ts) AS us,
           |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           |  FROM events WHERE value IS NOT NULL),
           |mid AS (SELECT (MIN(us) + MAX(us)) / 2 AS mid FROM e),
           |pu AS (
           |  SELECT user_id, user_id % 2 AS g,
           |    CAST(SUM(CASE WHEN us < mid THEN cents ELSE 0 END) AS BIGINT) AS x,
           |    CAST(SUM(CASE WHEN us >= mid THEN cents ELSE 0 END) AS BIGINT) AS y
           |  FROM e, mid GROUP BY 1, 2),
           |m AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           |    CAST(SUM(x * y) AS BIGINT) AS sxy,
           |    CAST(SUM(x * x) AS BIGINT) AS sxx,
           |    CAST(SUM(y * y) AS BIGINT) AS syy,
           |    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           |    CAST(SUM(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
           |    CAST(SUM(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
           |    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |    CAST(SUM(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
           |    CAST(SUM(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
           |  FROM pu)
           |SELECT n, ROUND($sqlCupedTheta, 6) AS theta,
           |  ROUND((CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
           |    - CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 100.0, 6) AS diff_raw,
           |  ROUND(((CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
           |    - ($sqlCupedTheta) * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)
           |    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           |    - (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           |    - ($sqlCupedTheta) * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           |    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) / 100.0, 6) AS diff_cuped,
           |  ROUND(($sqlCupedTheta) * ($sqlCupedTheta)
           |    * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           |    / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
           |    AS var_reduction
           |FROM m""".stripMargin),
      doc = "CUPED variance-reduced A/B estimate - exact cents moments, theta one shared fragment"),

    // Difference-in-differences over the same 2×2 design (id-parity
    // group × before/after the exact time midpoint): the four cell
    // means from conditional cents aggregations, DiD = (T_post − T_pre)
    // − (C_post − C_pre). The quasi-experiment companion of the A/B
    // tests for when assignment wasn't randomized; the parallel-trends
    // diagnostic is diff_pre itself, reported alongside.
    "evt_did" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val mid = e.agg(((min(col("us")) + max(col("us"))) / lit(2L)).as("mid"))
        val cells = e.crossJoin(broadcast(mid))
          .withColumn("g", col("user_id") % 2)
          .withColumn("post", (col("us") >= col("mid")).cast("int"))
          .groupBy("g", "post")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
          .withColumn("mean_val",
            round(col("sc").cast("double") / (lit(100.0) * col("n").cast("double")), 6))
        val wide = cells
          .withColumn("cell", concat(col("g"), lit("_"), col("post")))
          .groupBy().pivot("cell", Seq("0_0", "0_1", "1_0", "1_1"))
          .agg(first(col("mean_val")))
        wide.select(
          col("0_0").as("treat_pre"), col("0_1").as("treat_post"),
          col("1_0").as("ctrl_pre"), col("1_1").as("ctrl_post"),
          expr("ROUND(`0_0` - `1_0`, 6) + 0.0").as("diff_pre"),
          expr("ROUND((`0_1` - `0_0`) - (`1_1` - `1_0`), 6) + 0.0").as("did"))
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS us,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
          |  FROM events WHERE value IS NOT NULL),
          |mid AS (SELECT (MIN(us) + MAX(us)) / 2 AS mid FROM e),
          |cells AS (
          |  SELECT user_id % 2 AS g,
          |    CASE WHEN us >= mid THEN 1 ELSE 0 END AS post,
          |    ROUND(CAST(SUM(cents) AS DOUBLE) / (100.0 * CAST(COUNT(*) AS DOUBLE)), 6)
          |      AS mean_val
          |  FROM e, mid GROUP BY 1, 2),
          |wide AS (
          |  SELECT
          |    MAX(CASE WHEN g = 0 AND post = 0 THEN mean_val END) AS treat_pre,
          |    MAX(CASE WHEN g = 0 AND post = 1 THEN mean_val END) AS treat_post,
          |    MAX(CASE WHEN g = 1 AND post = 0 THEN mean_val END) AS ctrl_pre,
          |    MAX(CASE WHEN g = 1 AND post = 1 THEN mean_val END) AS ctrl_post
          |  FROM cells)
          |SELECT treat_pre, treat_post, ctrl_pre, ctrl_post,
          |  ROUND(treat_pre - ctrl_pre, 6) + 0.0 AS diff_pre,
          |  ROUND((treat_post - treat_pre) - (ctrl_post - ctrl_pre), 6) + 0.0 AS did
          |FROM wide""".stripMargin),
      doc = "Difference-in-differences over group x time-midpoint cells, cents-exact means"),

    // Exact tie-corrected ROC-AUC of a score against a binary label — the
    // classifier-eval primitive every model-quality gate needs, computed
    // with the Mann–Whitney doubled-rank machinery (AUC = U/(n₁n₀); ties
    // contribute half-credit WITHOUT ever introducing a 0.5 double:
    // 2·U = Σ_v (2·c1·cum0< + c1·c0) over per-value counts). Score =
    // order total price in cents, label = urgent/high priority. The
    // cumulative window runs over the pre-aggregated distinct-cents value
    // domain, never the order stream — at 100 TB the rank pass is one
    // map-side-combinable count shuffle plus a domain-sized window.
    // Inter-annotator agreement (round 8): Cohen's kappa between two
    // deterministic length-class annotators over documents — one from the
    // char count, one from the whitespace word count, so their
    // disagreement is real data variation (char-dense vs word-dense
    // docs), not synthetic noise. Everything is exact BIGINT counts (the
    // confusion diagonal and the marginal products) through one final
    // double expression written identically for both engines; the
    // marginal-product join runs on the |classes|-row tables. The op a
    // labeling pipeline runs before trusting a rater pool or an
    // LLM-judge pair.
    "eval_kappa" -> QueryDef(
      build = (s, dir) => {
        val d = graft.Caches.lazyBarrier(Tables.documents(s, dir).select(
          when(col("n_chars") < 300, "short")
            .when(col("n_chars") < 900, "med").otherwise("long").as("ann_a"),
          when(size(split(col("text"), " ")) < 60, "short")
            .when(size(split(col("text"), " ")) < 180, "med").otherwise("long")
            .as("ann_b")))
        graft.scale.Agreement.cohenKappa(d, "ann_a", "ann_b")
      },
      oracle = Some(
        """WITH lab AS (
          |  SELECT
          |    CASE WHEN n_chars < 300 THEN 'short'
          |         WHEN n_chars < 900 THEN 'med' ELSE 'long' END AS ann_a,
          |    CASE WHEN len(string_split(text, ' ')) < 60 THEN 'short'
          |         WHEN len(string_split(text, ' ')) < 180 THEN 'med' ELSE 'long' END AS ann_b
          |  FROM documents),
          |tot AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |    CAST(SUM(CASE WHEN ann_a = ann_b THEN 1 ELSE 0 END) AS BIGINT) AS agree
          |  FROM lab),
          |ma AS (SELECT ann_a AS cls, CAST(COUNT(*) AS BIGINT) AS na FROM lab GROUP BY 1),
          |mb AS (SELECT ann_b AS cls, CAST(COUNT(*) AS BIGINT) AS nb FROM lab GROUP BY 1),
          |pe AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS pe_num FROM ma JOIN mb USING (cls))
          |SELECT n, agree,
          |  ROUND(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
          |  ROUND(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
          |  ROUND((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
          |      - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
          |    / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
          |    AS kappa
          |FROM tot, pe""".stripMargin),
      doc = "Cohen's kappa between two deterministic annotators: exact confusion counts, chance-corrected agreement"),

    // Krippendorff's alpha, nominal metric, 3 raters, complete data — the
    // kappa row's multi-rater generalization (the agreement statistic
    // labeling platforms standardize on because it extends to missing
    // data and other metrics). Exact integer pair counts end to end: per
    // unit, agreeing pairs = Σ_c C(n_uc,2) of C(3,2)=3; expected
    // disagreement from pooled label counts over N(N−1) ordered pairs;
    // one final double expression. Third rater classes the CHAR-PER-WORD
    // density, so the three raters disagree on real document shape.
    "eval_krippendorff" -> QueryDef(
      build = (s, dir) => {
        val words = size(split(col("text"), " "))
        val lab = Tables.documents(s, dir).select(col("doc_id"),
          when(col("n_chars") < 300, "short")
            .when(col("n_chars") < 900, "med").otherwise("long").as("ann_a"),
          when(words < 60, "short").when(words < 180, "med").otherwise("long")
            .as("ann_b"),
          when(col("n_chars") * 10 < words * 45, "short")
            .when(col("n_chars") * 10 < words * 60, "med").otherwise("long")
            .as("ann_c"))
        val melt = graft.Caches.lazyBarrier(lab.select(col("doc_id"),
          explode(array(col("ann_a"), col("ann_b"), col("ann_c"))).as("cls")))
        graft.scale.Agreement.krippendorffAlpha(melt, "doc_id", "cls", m = 3)
      },
      oracle = Some(
        """WITH lab AS (
          |  SELECT doc_id,
          |    CASE WHEN n_chars < 300 THEN 'short'
          |         WHEN n_chars < 900 THEN 'med' ELSE 'long' END AS ann_a,
          |    CASE WHEN len(string_split(text, ' ')) < 60 THEN 'short'
          |         WHEN len(string_split(text, ' ')) < 180 THEN 'med' ELSE 'long' END AS ann_b,
          |    CASE WHEN n_chars * 10 < len(string_split(text, ' ')) * 45 THEN 'short'
          |         WHEN n_chars * 10 < len(string_split(text, ' ')) * 60 THEN 'med'
          |         ELSE 'long' END AS ann_c
          |  FROM documents),
          |melt AS (
          |  SELECT doc_id, unnest([ann_a, ann_b, ann_c]) AS cls FROM lab),
          |per_unit AS (
          |  SELECT doc_id, CAST(SUM((k * (k - 1)) // 2) AS BIGINT) AS agree_pairs
          |  FROM (SELECT doc_id, cls, COUNT(*) AS k FROM melt GROUP BY 1, 2)
          |  GROUP BY doc_id),
          |obs AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
          |    CAST(SUM(3 - agree_pairs) AS BIGINT) AS dis_pairs
          |  FROM per_unit),
          |ex AS (
          |  SELECT CAST(SUM(nc) AS BIGINT) AS nn,
          |    CAST(SUM(nc * (nc - 1)) AS BIGINT) AS agree_ord
          |  FROM (SELECT cls, COUNT(*) AS nc FROM melt GROUP BY cls))
          |SELECT n_units, dis_pairs, nn AS n_values,
          |  ROUND(CAST(dis_pairs AS DOUBLE) / (3.0 * CAST(n_units AS DOUBLE)), 6) AS d_obs,
          |  ROUND((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0) - CAST(agree_ord AS DOUBLE))
          |    / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)), 6) AS d_exp,
          |  ROUND(1.0 - (CAST(dis_pairs AS DOUBLE) / (3.0 * CAST(n_units AS DOUBLE)))
          |    / ((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0) - CAST(agree_ord AS DOUBLE))
          |      / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))), 6) AS alpha
          |FROM obs, ex""".stripMargin),
      doc = "Krippendorff's alpha (nominal, 3 raters): exact pair-count disagreement vs pooled expectation"),

    // Fleiss' kappa over the same 3 deterministic raters — the third
    // member of the standard agreement trio (Cohen pairwise, Fleiss
    // fixed-m, Krippendorff general). Per item: agreeing ordered pairs
    // Σ_c n_ic(n_ic−1) of m(m−1)=6; chance from squared pooled category
    // shares. Exact integer pair counts and an exact-rational P_e
    // numerator (Σ (N_c)² over (3n)²) until one final double expression.
    "eval_fleiss" -> QueryDef(
      build = (s, dir) => {
        val words = size(split(col("text"), " "))
        val lab = Tables.documents(s, dir).select(col("doc_id"),
          when(col("n_chars") < 300, "short")
            .when(col("n_chars") < 900, "med").otherwise("long").as("ann_a"),
          when(words < 60, "short").when(words < 180, "med").otherwise("long")
            .as("ann_b"),
          when(col("n_chars") * 10 < words * 45, "short")
            .when(col("n_chars") * 10 < words * 60, "med").otherwise("long")
            .as("ann_c"))
        val melt = graft.Caches.lazyBarrier(lab.select(col("doc_id"),
          explode(array(col("ann_a"), col("ann_b"), col("ann_c"))).as("cls")))
        graft.scale.Agreement.fleissKappa(melt, "doc_id", "cls", m = 3)
      },
      oracle = Some(
        """WITH lab AS (
          |  SELECT doc_id,
          |    CASE WHEN n_chars < 300 THEN 'short'
          |         WHEN n_chars < 900 THEN 'med' ELSE 'long' END AS ann_a,
          |    CASE WHEN len(string_split(text, ' ')) < 60 THEN 'short'
          |         WHEN len(string_split(text, ' ')) < 180 THEN 'med' ELSE 'long' END AS ann_b,
          |    CASE WHEN n_chars * 10 < len(string_split(text, ' ')) * 45 THEN 'short'
          |         WHEN n_chars * 10 < len(string_split(text, ' ')) * 60 THEN 'med'
          |         ELSE 'long' END AS ann_c
          |  FROM documents),
          |melt AS (SELECT doc_id, unnest([ann_a, ann_b, ann_c]) AS cls FROM lab),
          |per_unit AS (
          |  SELECT doc_id, CAST(SUM(k * (k - 1)) AS BIGINT) AS agree_ord
          |  FROM (SELECT doc_id, cls, COUNT(*) AS k FROM melt GROUP BY 1, 2)
          |  GROUP BY doc_id),
          |obs AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
          |    CAST(SUM(agree_ord) AS BIGINT) AS agree_sum FROM per_unit),
          |ex AS (
          |  SELECT CAST(SUM(nc) AS BIGINT) AS nn,
          |    CAST(SUM(nc * nc) AS BIGINT) AS sq_sum
          |  FROM (SELECT cls, COUNT(*) AS nc FROM melt GROUP BY cls))
          |SELECT n_units,
          |  ROUND(CAST(agree_sum AS DOUBLE) / (6.0 * CAST(n_units AS DOUBLE)), 6) AS p_bar,
          |  ROUND(CAST(sq_sum AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS p_e,
          |  ROUND((CAST(agree_sum AS DOUBLE) / (6.0 * CAST(n_units AS DOUBLE))
          |      - CAST(sq_sum AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
          |    / (1.0 - CAST(sq_sum AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))), 6)
          |    AS fleiss_kappa
          |FROM obs, ex""".stripMargin),
      doc = "Fleiss' kappa (3 raters): exact per-item pair counts vs squared pooled category shares"),

    "eval_auc" -> QueryDef(
      build = (s, dir) => {
        val v = Tables.orders(s, dir).select(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("pos"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        val pts = v.groupBy("cents").agg(
          sum(when(col("pos") === 1L, 1L).otherwise(0L)).as("c1"),
          sum(when(col("pos") === 0L, 1L).otherwise(0L)).as("c0"))
        val wB = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val terms = pts
          .withColumn("cum0b", coalesce(sum(col("c0")).over(wB), lit(0L)))
        terms.agg(
            sum("c1").as("n_pos"), sum("c0").as("n_neg"),
            sum(col("c1") * col("cum0b") * 2L + col("c1") * col("c0")).as("u2"))
          .select(col("n_pos"), col("n_neg"),
            (round(col("u2").cast("double") /
              (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
              6) + lit(0.0)).as("auc"),
            (round(col("u2").cast("double") /
              (col("n_pos").cast("double") * col("n_neg").cast("double")) - lit(1.0),
              6) + lit(0.0)).as("gini"))
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |              THEN 1 ELSE 0 END AS pos,
          |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
          |  FROM orders),
          |pts AS (
          |  SELECT cents,
          |    SUM(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS c1,
          |    SUM(CASE WHEN pos = 0 THEN 1 ELSE 0 END) AS c0
          |  FROM v GROUP BY 1),
          |terms AS (
          |  SELECT c1, c0,
          |    COALESCE(SUM(c0) OVER (ORDER BY cents
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0b
          |  FROM pts),
          |agg AS (
          |  SELECT SUM(c1) AS n_pos, SUM(c0) AS n_neg,
          |    SUM(c1 * cum0b * 2 + c1 * c0) AS u2
          |  FROM terms)
          |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
          |  ROUND(CAST(u2 AS DOUBLE)
          |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) + 0.0 AS auc,
          |  ROUND(CAST(u2 AS DOUBLE)
          |    / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) - 1.0, 6) + 0.0 AS gini
          |FROM agg""".stripMargin),
      doc = "Exact tie-corrected ROC-AUC + Gini via doubled rank sums over the value domain"),

    // Robust means: 5%-per-side trimmed and winsorized means of the event
    // value distribution, computed EXACTLY over the distinct-cents value
    // domain — each value's kept multiplicity is an integer rank-range
    // intersection (clip(cum..cum+c to [lo+1, n−lo])), so Σkept·cents is
    // a BIGINT and the only double is the final division. Winsorization
    // adds the clamped tails analytically (lo·min_kept + lo·max_kept)
    // instead of rewriting rows. The PARTITION-less window runs over the
    // pre-aggregated value domain per the repo's window discipline.
    "stats_trimmed_mean" -> QueryDef(
      build = (s, dir) => {
        val v = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val pts = v.groupBy("cents").agg(count(lit(1)).as("c"))
        val wB = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val t = pts.withColumn("cumb", coalesce(sum("c").over(wB), lit(0L)))
        val tot = t.agg(sum("c").as("n"))
        val k = t.crossJoin(broadcast(tot))
          .withColumn("lo", expr("n DIV 20"))
          .withColumn("kept", greatest(lit(0L),
            least(col("cumb") + col("c"), col("n") - col("lo"))
              - greatest(col("cumb"), col("lo"))))
        k.agg(
            max("n").as("n"),
            sum(col("c") * col("cents")).as("sum_all"),
            sum(col("kept") * col("cents")).as("sum_kept"),
            sum("kept").as("n_kept"),
            min(when(col("kept") > 0, col("cents"))).as("lo_val"),
            max(when(col("kept") > 0, col("cents"))).as("hi_val"))
          .select(col("n"), col("n_kept"),
            round(col("sum_all").cast("double")
              / (col("n").cast("double") * 100.0), 6).as("mean_all"),
            round(col("sum_kept").cast("double")
              / (col("n_kept").cast("double") * 100.0), 6).as("trimmed_mean"),
            round((col("sum_kept")
                + expr("n DIV 20") * col("lo_val")
                + expr("n DIV 20") * col("hi_val")).cast("double")
              / (col("n").cast("double") * 100.0), 6).as("winsorized_mean"))
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
          |  FROM events WHERE value IS NOT NULL),
          |pts AS (SELECT cents, COUNT(*) AS c FROM v GROUP BY 1),
          |t AS (
          |  SELECT cents, c, COALESCE(SUM(c) OVER (ORDER BY cents
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
          |  FROM pts),
          |tot AS (SELECT SUM(c) AS n FROM t),
          |k AS (
          |  SELECT cents, c, cumb, n, n // 20 AS lo,
          |    GREATEST(0, LEAST(cumb + c, n - (n // 20))
          |      - GREATEST(cumb, n // 20)) AS kept
          |  FROM t, tot),
          |agg AS (
          |  SELECT MAX(n) AS n, SUM(c * cents) AS sum_all,
          |    SUM(kept * cents) AS sum_kept, SUM(kept) AS n_kept,
          |    MIN(CASE WHEN kept > 0 THEN cents END) AS lo_val,
          |    MAX(CASE WHEN kept > 0 THEN cents END) AS hi_val
          |  FROM k)
          |SELECT CAST(n AS BIGINT) AS n, CAST(n_kept AS BIGINT) AS n_kept,
          |  ROUND(CAST(sum_all AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 6)
          |    AS mean_all,
          |  ROUND(CAST(sum_kept AS DOUBLE) / (CAST(n_kept AS DOUBLE) * 100.0), 6)
          |    AS trimmed_mean,
          |  ROUND(CAST(sum_kept + (n // 20) * lo_val + (n // 20) * hi_val AS DOUBLE)
          |    / (CAST(n AS DOUBLE) * 100.0), 6) AS winsorized_mean
          |FROM agg""".stripMargin),
      doc = "Exact 5%-per-side trimmed + winsorized means via integer rank-range clipping"),

    // Per-type skewness and excess kurtosis from EXACT raw power sums:
    // Σc, Σc², Σc³, Σc⁴ over integer cents accumulate in 128-bit space
    // (Spark DECIMAL(38,0) ≡ DuckDB HUGEINT — c⁴ overflows BIGINT at
    // cents ≥ ~10⁵), so the sums are reduction-order-independent at any
    // scale and the only doubles are the closed-form central-moment
    // expressions, spelled identically on both engines. The
    // shape-of-distribution companion of evt_ab_ztest (means) and
    // stats_ks_test; one map-side-combinable shuffle at type cardinality.
    "stats_moments" -> QueryDef(
      build = (s, dir) => {
        val c = expr("CAST(ROUND(value * 100, 0) AS DECIMAL(20,0))")
        val agg = Tables.events(s, dir).filter(col("value").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(c).as("s1"), sum(c * c).as("s2"),
            sum(c * c * c).as("s3"), sum(c * c * c * c).as("s4"))
        agg.select(col("event_type"), col("n"),
            expr("""ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) + 0.0""").as("mean"),
            expr(
              """ROUND(SQRT(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2)) / 100.0, 6) + 0.0""".stripMargin).as("sd"),
            expr(
              """ROUND((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                |  + 2.0 * POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 3))
                | / POW(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2), 1.5), 6) + 0.0""".stripMargin).as("skewness"),
            expr(
              """ROUND((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                |  + 6.0 * POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                |  - 3.0 * POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 4))
                | / POW(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2), 2) - 3.0, 6) + 0.0""".stripMargin).as("ex_kurtosis"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT event_type,
          |    CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS HUGEINT) AS c
          |  FROM events WHERE value IS NOT NULL),
          |agg AS (
          |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          |    SUM(c) AS s1, SUM(c * c) AS s2,
          |    SUM(c * c * c) AS s3, SUM(c * c * c * c) AS s4
          |  FROM v GROUP BY 1)
          |SELECT event_type, n,
          |  ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) + 0.0 AS mean,
          |  ROUND(SQRT(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          |    - POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2)) / 100.0, 6) + 0.0 AS sd,
          |  ROUND((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
          |    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
          |    + 2.0 * POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 3))
          |   / POW(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          |    - POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2), 1.5), 6) + 0.0 AS skewness,
          |  ROUND((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
          |    - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
          |    + 6.0 * POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
          |    - 3.0 * POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 4))
          |   / POW(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          |    - POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2), 2) - 3.0, 6) + 0.0 AS ex_kurtosis
          |FROM agg ORDER BY event_type""".stripMargin),
      doc = "Skewness + excess kurtosis per type from 128-bit-exact raw power sums"),

    // Split-conformal prediction interval (α=0.1) — the distribution-free
    // uncertainty wrapper a prediction service ships around ANY point
    // model: train a (type, dow)-mean predictor on the first half of the
    // span, take q̂ = the ⌈0.9·(n+1)⌉-th smallest |residual| on the
    // third-quarter calibration window (an EXACT order statistic via
    // row_number — no interpolation ambiguity), and report empirical
    // coverage of ŷ ± q̂ on the held-out fourth quarter. Time quarters
    // are integer arithmetic ((us−us0)·4 DIV span), the predictor is a
    // cents-sum ratio, and the residual order has a total (resid,
    // event_id) tie-break — every stage engine-exact. Scale shape: one
    // grouped mean at (type × dow) cardinality; calibration is a salted
    // 1-in-20 SAMPLE (split-conformal needs only thousands of points),
    // so the order-statistic sort stays bounded; q̂ broadcasts.
    "eval_conformal" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"),
            pmod(datediff(to_date(col("ts")), to_date(lit("1970-01-01"))),
              lit(7)).cast("int").as("dow"),
            unix_micros(col("ts")).as("us"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val mm = e.agg(min("us").as("us0"), max("us").as("us1"))
        val q = e.crossJoin(broadcast(mm))
          .withColumn("quarter",
            expr("CAST(((us - us0) * 4) DIV (us1 - us0 + 1) AS INT)"))
        val means = q.filter(col("quarter") < 2)
          .groupBy("event_type", "dow")
          .agg(sum("cents").as("sc"), count(lit(1)).as("cn"))
          .withColumn("yhat", col("sc").cast("double") / col("cn").cast("double"))
          .select("event_type", "dow", "yhat")
        // calibration is a salted 1-in-20 sample: split-conformal needs
        // only thousands of calibration points for a tight q̂, so the
        // global order-statistic sort stays bounded at any corpus size
        val calib = q.filter(col("quarter") === 2 && col("event_id") % 20 === 0)
          .join(means, Seq("event_type", "dow"))
          .withColumn("resid", abs(col("cents").cast("double") - col("yhat")))
        val nCalib = calib.agg(count(lit(1)).as("n_calib"))
        val qhat = calib.crossJoin(broadcast(nCalib))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("resid"), col("event_id"))))
          .filter(col("rk") ===
            ceil((col("n_calib") + 1).cast("double") * 0.9).cast("long"))
          .select(col("n_calib"), col("resid").as("qhat"))
        val test = q.filter(col("quarter") === 3)
          .join(means, Seq("event_type", "dow"))
          .crossJoin(broadcast(qhat))
          .withColumn("covered",
            (abs(col("cents").cast("double") - col("yhat")) <= col("qhat"))
              .cast("long"))
        val nTrain = q.filter(col("quarter") < 2)
          .agg(count(lit(1)).as("n_train"))
        test.groupBy("n_calib", "qhat")
          .agg(count(lit(1)).as("n_test"), sum("covered").as("n_covered"))
          .crossJoin(broadcast(nTrain))
          .select(col("n_train"), col("n_calib"),
            col("n_test"), col("n_covered"),
            round(col("qhat") / 100.0, 6).as("qhat"),
            round(col("n_covered").cast("double") / col("n_test").cast("double"),
              6).as("coverage"))
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT event_id, event_type,
          |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
          |      AS INT) AS dow,
          |    epoch_us(ts) AS us,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
          |  FROM events WHERE value IS NOT NULL),
          |mm AS (SELECT MIN(us) AS us0, MAX(us) AS us1 FROM e),
          |q AS (
          |  SELECT e.*, CAST(((us - us0) * 4) // (us1 - us0 + 1) AS INT) AS quarter
          |  FROM e, mm),
          |means AS (
          |  SELECT event_type, dow,
          |    CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS yhat
          |  FROM q WHERE quarter < 2 GROUP BY 1, 2),
          |calib AS (
          |  SELECT q.event_id, ABS(CAST(q.cents AS DOUBLE) - m.yhat) AS resid
          |  FROM q JOIN means m USING (event_type, dow)
          |  WHERE q.quarter = 2 AND q.event_id % 20 = 0),
          |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_calib FROM calib),
          |qhat AS (
          |  SELECT n_calib, resid AS qhat FROM (
          |    SELECT c.resid, nc.n_calib,
          |      row_number() OVER (ORDER BY c.resid, c.event_id) AS rk
          |    FROM calib c, nc) r
          |  WHERE rk = CAST(CEIL(CAST(n_calib + 1 AS DOUBLE) * 0.9) AS BIGINT)),
          |test AS (
          |  SELECT CASE WHEN ABS(CAST(q.cents AS DOUBLE) - m.yhat) <= h.qhat
          |    THEN 1 ELSE 0 END AS covered, h.n_calib, h.qhat
          |  FROM q JOIN means m USING (event_type, dow)
          |  CROSS JOIN qhat h WHERE q.quarter = 3),
          |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM q WHERE quarter < 2)
          |SELECT tr.n_train, t.n_calib,
          |  CAST(COUNT(*) AS BIGINT) AS n_test,
          |  CAST(SUM(covered) AS BIGINT) AS n_covered,
          |  ROUND(t.qhat / 100.0, 6) AS qhat,
          |  ROUND(CAST(SUM(covered) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          |    AS coverage
          |FROM test t, tr GROUP BY tr.n_train, t.n_calib, t.qhat""".stripMargin),
      doc = "Split-conformal interval (alpha=0.1): exact order-statistic qhat + held-out coverage"),

    // Brown–Forsythe / Levene variance-homogeneity test — the diagnostic
    // that licenses (or vetoes) the pooled-variance assumptions behind
    // ANOVA/t: one-way F on z = |x − median_g|, median-centered for
    // robustness. Everything integer until the closed form: the
    // per-cohort median is the exact (k1, k2) order-statistic pair over
    // the value domain (med2 = lower+upper median in cents, so
    // z2 = |2x − med2| needs no halves), and the F machinery reuses the
    // ANOVA discipline (per-group quantize-to-BIGINT before any
    // cross-group sum). One value-domain window + two grouped
    // aggregates; medians broadcast.
    "stats_levene" -> QueryDef(
      build = (s, dir) => {
        val v = Tables.events(s, dir).filter(col("value").isNotNull)
          .select((col("user_id") % 3).as("cohort"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val pts = v.groupBy("cohort", "cents").agg(count(lit(1)).as("c"))
        val wB = Window.partitionBy("cohort").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val t = pts.withColumn("cumb", coalesce(sum("c").over(wB), lit(0L)))
        val nTot = t.groupBy("cohort").agg(sum("c").as("n"))
        val med = t.join(nTot, "cohort")
          .withColumn("k1", expr("(n + 1) DIV 2"))
          .withColumn("k2", expr("(n + 2) DIV 2"))
          .groupBy("cohort").agg(
            sum(when(col("cumb") < col("k1") &&
              col("k1") <= col("cumb") + col("c"), col("cents"))
              .otherwise(0L)).as("m1"),
            sum(when(col("cumb") < col("k2") &&
              col("k2") <= col("cumb") + col("c"), col("cents"))
              .otherwise(0L)).as("m2"))
          .select(col("cohort"), (col("m1") + col("m2")).as("med2"))
        val g = v.join(broadcast(med), "cohort")
          .select(col("cohort"), abs(col("cents") * 2 - col("med2")).as("z"))
          .groupBy("cohort")
          .agg(count(lit(1)).as("n"), sum("z").as("sx"),
            sum(col("z") * col("z")).as("sxx"))
          .withColumn("qb", expr(
            """CAST(ROUND(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              |  / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT)""".stripMargin))
          .withColumn("qw", expr(
            """CAST(ROUND((CAST(sxx AS DOUBLE)
              |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              |  * 1e6, 0) AS BIGINT)""".stripMargin))
        g.join(broadcast(med), "cohort")
          .agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
            sum(col("sx")).as("gsx"), sum(col("qb")).as("sqb"),
            sum(col("qw")).as("ssw_q"),
            max(when(col("cohort") === 0, col("med2"))).as("md0"),
            max(when(col("cohort") === 1, col("med2"))).as("md1"),
            max(when(col("cohort") === 2, col("med2"))).as("md2"))
          .select(col("k"), col("nn").as("n_total"),
            round(col("md0").cast("double") / 200.0, 6).as("med_0"),
            round(col("md1").cast("double") / 200.0, 6).as("med_1"),
            round(col("md2").cast("double") / 200.0, 6).as("med_2"),
            round(((col("sqb").cast("double") / 1e6 -
              col("gsx").cast("double") * col("gsx").cast("double") /
                col("nn").cast("double")) / (col("k") - 1).cast("double")) /
              ((col("ssw_q").cast("double") / 1e6) /
                (col("nn") - col("k")).cast("double")), 6).as("w_stat"))
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT user_id % 3 AS cohort,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
          |  FROM events WHERE value IS NOT NULL),
          |pts AS (SELECT cohort, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
          |t AS (
          |  SELECT cohort, cents, c, COALESCE(SUM(c) OVER (PARTITION BY cohort
          |    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |    0) AS cumb
          |  FROM pts),
          |nt AS (SELECT cohort, SUM(c) AS n FROM t GROUP BY 1),
          |med AS (
          |  SELECT t.cohort,
          |    SUM(CASE WHEN cumb < (n + 1) // 2 AND (n + 1) // 2 <= cumb + c
          |        THEN cents ELSE 0 END)
          |    + SUM(CASE WHEN cumb < (n + 2) // 2 AND (n + 2) // 2 <= cumb + c
          |        THEN cents ELSE 0 END) AS med2
          |  FROM t JOIN nt ON t.cohort = nt.cohort GROUP BY 1),
          |z AS (
          |  SELECT v.cohort, ABS(v.cents * 2 - m.med2) AS z
          |  FROM v JOIN med m ON v.cohort = m.cohort),
          |g AS (
          |  SELECT cohort, COUNT(*) AS n, SUM(z) AS sx, SUM(z * z) AS sxx
          |  FROM z GROUP BY 1),
          |q AS (
          |  SELECT g.cohort, n, sx, m.med2,
          |    CAST(ROUND(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          |      / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT) AS qb,
          |    CAST(ROUND((CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |      * 1e6, 0) AS BIGINT) AS qw
          |  FROM g JOIN med m ON g.cohort = m.cohort),
          |agg AS (
          |  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(sx) AS gsx,
          |    SUM(qb) AS sqb, SUM(qw) AS ssw_q,
          |    MAX(CASE WHEN cohort = 0 THEN med2 END) AS md0,
          |    MAX(CASE WHEN cohort = 1 THEN med2 END) AS md1,
          |    MAX(CASE WHEN cohort = 2 THEN med2 END) AS md2
          |  FROM q)
          |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n_total,
          |  ROUND(CAST(md0 AS DOUBLE) / 200.0, 6) AS med_0,
          |  ROUND(CAST(md1 AS DOUBLE) / 200.0, 6) AS med_1,
          |  ROUND(CAST(md2 AS DOUBLE) / 200.0, 6) AS med_2,
          |  ROUND(((CAST(sqb AS DOUBLE) / 1e6
          |    - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) / CAST(nn AS DOUBLE))
          |    / CAST(k - 1 AS DOUBLE))
          |   / ((CAST(ssw_q AS DOUBLE) / 1e6) / CAST(nn - k AS DOUBLE)), 6)
          |    AS w_stat
          |FROM agg""".stripMargin),
      doc = "Brown-Forsythe/Levene W: one-way F on |x - group median|, exact integer medians + ANOVA quantize discipline"),
  )

  /** Kruskal–Wallis H from the pivoted agg row (n0..n2, r20..r22) — one
    * fragment interpolated into BOTH the Spark `expr` and the oracle.
    */
  private def sqlKwH: String =
    "12.0 / (CAST(n0 + n1 + n2 AS DOUBLE) * (CAST(n0 + n1 + n2 AS DOUBLE) + 1.0)) * " +
      "(CAST(r20 AS DOUBLE) * CAST(r20 AS DOUBLE) / (4.0 * CAST(n0 AS DOUBLE)) + " +
      "CAST(r21 AS DOUBLE) * CAST(r21 AS DOUBLE) / (4.0 * CAST(n1 AS DOUBLE)) + " +
      "CAST(r22 AS DOUBLE) * CAST(r22 AS DOUBLE) / (4.0 * CAST(n2 AS DOUBLE))) - " +
      "3.0 * (CAST(n0 + n1 + n2 AS DOUBLE) + 1.0)"

  /** Kruskal–Wallis tie correction 1 − Σ(t³−t)/(N³−N), N as double. */
  private def sqlKwC: String =
    "(1.0 - CAST(ties3 AS DOUBLE) / (CAST(n0 + n1 + n2 AS DOUBLE) * " +
      "CAST(n0 + n1 + n2 AS DOUBLE) * CAST(n0 + n1 + n2 AS DOUBLE) - " +
      "CAST(n0 + n1 + n2 AS DOUBLE)))"

  /** CUPED θ = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) from the pooled moment
    * row — one fragment compiled by both engines.
    */
  private def sqlCupedTheta: String =
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) " +
      "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"

  /** Two-sided normal p-value 2(1−Φ(|z|)) via Abramowitz–Stegun 26.2.17
    * (Horner form, t = 1/(1+0.2316419|z|) inlined). `z` must be a plain
    * column name; the identical text is compiled by Spark and DuckDB.
    */
  private def sqlNormTwoSidedP(z: String): String = {
    val t = s"(1.0 / (1.0 + 0.2316419 * ABS($z)))"
    s"(2.0 * (EXP(-(($z) * ($z)) / 2.0) * 0.3989422804014327) * " +
      s"($t * (0.319381530 + $t * (-0.356563782 + $t * (1.781477937 + " +
      s"$t * (-1.821255978 + $t * 1.330274429))))))"
  }

  /** The composite quality score (= TextOps.qualityScore) in DuckDB spelling (list HOFs + regexp_extract_all). */
  private def sqlQualityFragDuck: String =
    "ROUND(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 " +
      "+ (1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN (" +
      TextOps.stopwords.map(w => s"'$w'").mkString(", ") +
      "))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4 " +
      "+ (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) " +
      "/ CAST(length(text) AS DOUBLE)) * 0.2, 6)"
}
