package graft.queries

import graft.QueryDef
import graft.scale.TextOps
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 widening of the analytic SQL surface: window-frame functions,
  * CUBE grouping sets, pivot, time-series gap-fill/LOCF and EWMA, and two
  * more text-pipeline ops (bigram-LM perplexity, chunk-level sub-document
  * dedup).
  *
  * Conventions as everywhere else: decimal-exact money, total ORDER BY,
  * rounded doubles, and float expressions written as the *same* operation
  * tree on both engines so the only doubles compared are bit-identical.
  */
object AnalyticsQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  val defs: Map[String, QueryDef] = Map(

    // Window-frame function coverage: first/last/nth over explicit
    // unbounded frames plus percent_rank/cume_dist, per-customer order
    // history. One shuffle on the partition key; the 1997 filter is pushed
    // to the scan.
    "w_frame_funcs" -> QueryDef(
      build = (s, dir) => {
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        val wOrd = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ord.select(
            col("o_custkey"), col("o_orderkey"),
            dec(col("o_totalprice")).cast("double").as("price"),
            row_number().over(wOrd).as("rn"),
            round(percent_rank().over(wOrd), 6).as("pct_rank"),
            round(cume_dist().over(wOrd), 6).as("cume"),
            dec(first_value(col("o_totalprice")).over(wFull)).cast("double").as("first_price"),
            dec(last_value(col("o_totalprice")).over(wFull)).cast("double").as("last_price"),
            dec(nth_value(col("o_totalprice"), 2).over(wFull)).cast("double").as("second_price"))
          .orderBy("o_custkey", "rn")
      },
      oracle = Some(
        """SELECT o_custkey, o_orderkey,
          |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
          |  CAST(row_number() OVER w AS BIGINT) AS rn,
          |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
          |  ROUND(cume_dist() OVER w, 6) AS cume,
          |  CAST(CAST(first_value(o_totalprice) OVER wf AS DECIMAL(12,2)) AS DOUBLE) AS first_price,
          |  CAST(CAST(last_value(o_totalprice) OVER wf AS DECIMAL(12,2)) AS DOUBLE) AS last_price,
          |  CAST(CAST(nth_value(o_totalprice, 2) OVER wf AS DECIMAL(12,2)) AS DOUBLE) AS second_price
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          |WINDOW
          |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
          |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |ORDER BY o_custkey, rn""".stripMargin),
      doc = "Window-frame functions: first/last/nth value, percent_rank, cume_dist"),

    // CUBE over (status, priority) with GROUPING ids. Same two-level
    // discipline as rollup_revenue: aggregate to the 15 base groups first,
    // then Expand multiplies 15 pre-aggregated rows (x4 grouping sets)
    // instead of every order — at 100 TB the cube costs one ordinary
    // aggregation plus epsilon.
    "cube_order_mix" -> QueryDef(
      build = (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        s.sql(
          """WITH base AS (
            |  SELECT o_orderstatus, o_orderpriority,
            |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev, COUNT(*) AS cnt
            |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
            |SELECT o_orderstatus, o_orderpriority,
            |  CAST(SUM(rev) AS DOUBLE) AS revenue,
            |  SUM(cnt) AS n_orders,
            |  CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_s,
            |  CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_p
            |FROM base
            |GROUP BY CUBE(o_orderstatus, o_orderpriority)
            |ORDER BY g_s, g_p, o_orderstatus, o_orderpriority""".stripMargin)
      },
      oracle = Some(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders,
          |  CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_s,
          |  CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_p
          |FROM orders
          |GROUP BY CUBE(o_orderstatus, o_orderpriority)
          |ORDER BY g_s, g_p, o_orderstatus, o_orderpriority""".stripMargin),
      doc = "CUBE grouping sets over order status x priority with GROUPING ids"),

    // Pivot: order counts per status with priorities fanned out to
    // columns. The Spark relational pivot and the oracle's conditional
    // aggregation are the same plan shape (one grouped aggregate, the
    // pivot values are a CASE fan-out inside it — no extra shuffle).
    "pivot_priority" -> QueryDef(
      build = (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .select(col("o_orderstatus"),
            col("`1-URGENT`").as("p_urgent"), col("`2-HIGH`").as("p_high"),
            col("`3-MEDIUM`").as("p_medium"),
            col("`4-NOT SPECIFIED`").as("p_notspec"), col("`5-LOW`").as("p_low"))
          .orderBy("o_orderstatus"),
      oracle = Some(
        """SELECT o_orderstatus,
          |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
          |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
          |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
          |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec,
          |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      doc = "Pivot: priority classes fanned out to columns per order status"),

    // RANGE-interval frame: trailing-7-DAY sums keyed by the time VALUE,
    // not row position — over sparse series ROWS frames silently widen
    // their span across gaps; RANGE frames stay correct. Both engines run
    // the identical RANGE INTERVAL spec via the SQL surface.
    "w_range_frame" -> QueryDef(
      build = (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_rf")
        s.sql(
          """WITH daily AS (
            |  SELECT event_type, CAST(ts AS DATE) AS day,
            |    COUNT(*) AS n,
            |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS rev
            |  FROM events_rf GROUP BY event_type, CAST(ts AS DATE))
            |SELECT event_type, date_format(day, 'yyyy-MM-dd') AS day, n,
            |  SUM(n) OVER w AS n_7d,
            |  CAST(SUM(rev) OVER w AS DOUBLE) AS rev_7d,
            |  COUNT(*) OVER w AS days_in_frame
            |FROM daily
            |WINDOW w AS (PARTITION BY event_type ORDER BY day
            |  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
            |ORDER BY event_type, day""".stripMargin)
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |    CAST(COUNT(*) AS BIGINT) AS n,
          |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS rev
          |  FROM events GROUP BY event_type, CAST(ts AS DATE))
          |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
          |  CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
          |  CAST(SUM(rev) OVER w AS DOUBLE) AS rev_7d,
          |  CAST(COUNT(*) OVER w AS BIGINT) AS days_in_frame
          |FROM daily
          |WINDOW w AS (PARTITION BY event_type ORDER BY day
          |  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
          |ORDER BY event_type, day""".stripMargin),
      doc = "RANGE INTERVAL window frame: value-keyed trailing-7-day sums (gap-correct)"),

    // Time-series gap fill: the full (type x hour) grid via sequence()
    // explode, missing hours carried forward (LOCF). The grid is
    // |types| x |hours| — it scales with time span and cardinality of the
    // key, NOT with event volume, so the explode is safe at 100 TB; the
    // LOCF is one window over the grid.
    "ts_gap_fill" -> QueryDef(
      build = (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
        val bounds = hourly.agg(min("h").as("lo"), max("h").as("hi"))
        val grid = hourly.select("event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
        val w = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"),
            date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
            col("n"),
            last(col("n"), ignoreNulls = true).over(w).as("filled"),
            col("n").isNull.as("is_gap"))
          .orderBy("event_type", "hour")
      },
      oracle = Some(
        """WITH hourly AS (
          |  SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
          |grid AS (
          |  SELECT t.event_type, g.h
          |  FROM (SELECT DISTINCT event_type FROM hourly) t,
          |       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g)
          |SELECT grid.event_type, strftime(grid.h, '%Y-%m-%d %H:00') AS hour, d.n,
          |  last_value(d.n IGNORE NULLS) OVER (PARTITION BY grid.event_type
          |    ORDER BY grid.h ROWS UNBOUNDED PRECEDING) AS filled,
          |  d.n IS NULL AS is_gap
          |FROM grid LEFT JOIN hourly d
          |  ON d.event_type = grid.event_type AND d.h = grid.h
          |ORDER BY grid.event_type, hour""".stripMargin),
      doc = "Hourly gap fill over the type x hour grid, missing counts carried forward"),

    // EWMA (alpha=0.2) over the daily per-type count series, 30-row
    // trailing frame. Computed as a LEFT FOLD over the frame's list on
    // BOTH engines (Spark aggregate(), DuckDB list_reduce() — which seeds
    // the fold with the first element, mirrored via slice+element_at), so
    // the double operations happen in the identical order and the rounded
    // results are bit-equal. The frame bounds the list at 30 elements —
    // state is O(frame), not O(history).
    "ts_ewma" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("double").as("n"))
        val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-29, 0)
        daily
          .withColumn("xs", collect_list("n").over(w))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"),
            expr("""round(aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),
                          element_at(xs, 1),
                          (acc, x) -> 0.2d * x + 0.8d * acc), 4)""").as("ewma"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
          |  ROUND(list_reduce(list(n) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
          |    (acc, x) -> 0.2 * x + 0.8 * acc), 4) AS ewma
          |FROM daily ORDER BY event_type, day""".stripMargin),
      doc = "EWMA(0.2) of daily event rates via identical left-fold on both engines"),

    // Exact rolling median (lower median) over a trailing 15-row frame:
    // sort the frame's list, index the middle — exact integers end to end,
    // and the frame bounds the sort at 15 elements per row. (The
    // streaming-scale arm of quantiles is a8's approx sketch; this is the
    // windowed exact form.)
    "ts_rolling_median" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-14, 0)
        daily
          .withColumn("xs", collect_list("n").over(w))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"),
            expr("element_at(array_sort(xs), cast((size(xs) + 1) div 2 AS INT))")
              .as("roll_median_lo"),
            size(col("xs")).as("win_n"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |framed AS (
          |  SELECT event_type, day, n,
          |    list(n) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS xs
          |  FROM daily)
          |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
          |  list_sort(xs)[CAST((len(xs) + 1) // 2 AS INT)] AS roll_median_lo,
          |  CAST(len(xs) AS INT) AS win_n
          |FROM framed ORDER BY event_type, day""".stripMargin),
      doc = "Exact rolling lower-median of daily rates over a trailing 15-day frame"),

    // Day-of-week seasonality profile: per (type, dow) day-count, total
    // and mean, plus the dow's rank within the type. dow computed as
    // days-since-epoch mod 7 on BOTH engines — never a locale-/engine-
    // sensitive dayofweek().
    "ts_dow_profile" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("total").desc, col("dow"))
        daily
          .withColumn("dow",
            pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)).cast("int"))
          .groupBy("event_type", "dow")
          .agg(count(lit(1)).as("n_days"), sum("n").as("total"))
          .withColumn("avg_n",
            round(col("total").cast("double") / col("n_days").cast("double"), 4))
          .withColumn("dow_rank", dense_rank().over(w).cast("int"))
          .orderBy("event_type", "dow")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |prof AS (
          |  SELECT event_type,
          |    CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow,
          |    CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(n) AS BIGINT) AS total
          |  FROM daily GROUP BY 1, 2)
          |SELECT event_type, dow, n_days, total,
          |  ROUND(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE), 4) AS avg_n,
          |  CAST(dense_rank() OVER (PARTITION BY event_type
          |    ORDER BY total DESC, dow) AS INT) AS dow_rank
          |FROM prof ORDER BY event_type, dow""".stripMargin),
      doc = "Day-of-week seasonality profile with engine-neutral dow arithmetic"),


    // Running EWMA from series start — the batch twin of the STREAMING
    // TwsEwma fold (same recursion, unbounded instead of the 30-frame
    // ts_ewma): EwmaSurfaceSpec pins that TwsEwma over the same daily
    // series emits exactly these rows, closing the loop between the
    // oracle-checked batch surface and the stateful streaming one.
    "ts_ewma_run" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("double").as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("xs", collect_list("n").over(w))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"),
            expr("""round(aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),
                          element_at(xs, 1),
                          (acc, x) -> 0.2d * x + 0.8d * acc), 6)""").as("ewma"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
          |  ROUND(list_reduce(list(n) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS UNBOUNDED PRECEDING),
          |    (acc, x) -> 0.2 * x + 0.8 * acc), 6) AS ewma
          |FROM daily ORDER BY event_type, day""".stripMargin),
      doc = "Running EWMA from series start (the batch twin of streaming TwsEwma)"),

    // Bigram corpus LM with add-1 smoothing: per-doc average
    // log P(w2|w1) = ln((c(w1,w2)+1)/(c(w1)+V)) and the perplexity.
    // Adjacent pairs come from a zip_with over the token array (no
    // self-join); the count tables shuffle on token keys only.
    "txt_bigram_lm" -> QueryDef(
      build = (s, dir) => {
        val ts = TextOps.tokens(col("text"))
        // barrier: the pair frame feeds both the bigram counts and the
        // scoring join — unbarriered, the zip_with explode runs twice
        val bi = graft.Caches.lazyBarrier(Tables.documents(s, dir).select(col("doc_id"),
          explode(zip_with(
            slice(ts, lit(1), size(ts) - 1),
            slice(ts, lit(2), size(ts) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
        val biC = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val uniC = Tables.documents(s, dir)
          .select(explode(ts).as("w1"))
          .groupBy("w1").agg(count(lit(1)).as("c1"))
        val vocab = uniC.agg(count(lit(1)).as("v"))
        bi.join(biC, Seq("w1", "w2")).join(uniC, "w1")
          .crossJoin(broadcast(vocab))
          .withColumn("lp",
            log((col("c2").cast("double") + 1.0d) /
              (col("c1").cast("double") + col("v").cast("double"))))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round(avg("lp"), 6).as("avg_logprob"),
            round(exp(-avg("lp")), 4).as("ppl"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          |bi AS (
          |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          |  FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)),
          |bic AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bi GROUP BY w1, w2),
          |unic AS (
          |  SELECT t AS w1, CAST(COUNT(*) AS BIGINT) AS c1
          |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
          |  GROUP BY t),
          |voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM unic)
          |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          |  ROUND(AVG(ln((CAST(c2 AS DOUBLE) + 1.0) / (CAST(c1 AS DOUBLE) + v))), 6) AS avg_logprob,
          |  ROUND(exp(-AVG(ln((CAST(c2 AS DOUBLE) + 1.0) / (CAST(c1 AS DOUBLE) + v)))), 4) AS ppl
          |FROM bi JOIN bic USING (w1, w2) JOIN unic USING (w1), voc
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Bigram LM with add-1 smoothing: per-doc avg log-prob + perplexity"),

    // STL-lite decomposition: value = trend + seasonal + residual. Trend
    // is a centered 7-day rolling mean (exact-integer window sums divided
    // once), seasonal is the day-of-week mean of the detrended series
    // (rounded before the residual so the subtraction chain is pinned),
    // residual is what's left. One window + one small grouped aggregate.
    "ts_decompose" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val wT = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
        val d3 = daily
          .withColumn("tsum", sum("n").over(wT))
          .withColumn("tcnt", count("n").over(wT))
          .withColumn("trend", col("tsum").cast("double") / col("tcnt"))
          .withColumn("dow",
            pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)).cast("int"))
          // detr = n - tsum/tcnt held EXACT as a BIGINT in units of
          // 1/420: tcnt from a +-3-row frame is always in 1..7, and every
          // value in 1..7 divides 420, so (n*tcnt - tsum) * (420 DIV tcnt)
          // is integral — the seasonal mean below is then a single double
          // division, order-independent across rows.
          .withColumn("dnum", expr("(n * tcnt - tsum) * (420 DIV tcnt)"))
        val seas = d3.groupBy("event_type", "dow")
          .agg((round(sum("dnum").cast("double") / (lit(420.0) * count(lit(1))), 4)
            + lit(0.0)).as("seasonal"))
        d3.join(seas, Seq("event_type", "dow"))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), (round(col("trend"), 4) + lit(0.0)).as("trend"), col("seasonal"),
            (round(col("n").cast("double") - col("trend") - col("seasonal"), 4)
              + lit(0.0)).as("resid"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |d2 AS (
          |  SELECT event_type, day, n,
          |    CAST(SUM(n) OVER w AS BIGINT) AS tsum,
          |    CAST(COUNT(n) OVER w AS BIGINT) AS tcnt,
          |    CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow
          |  FROM daily
          |  WINDOW w AS (PARTITION BY event_type ORDER BY day
          |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          |d3 AS (
          |  SELECT *, CAST(tsum AS DOUBLE) / tcnt AS trend,
          |    (n * tcnt - tsum) * (420 // tcnt) AS dnum
          |  FROM d2),
          |seas AS (
          |  SELECT event_type, dow,
          |    ROUND(CAST(SUM(dnum) AS DOUBLE) / (420.0 * COUNT(*)), 4) + 0.0 AS seasonal
          |  FROM d3 GROUP BY 1, 2)
          |SELECT d3.event_type, strftime(day, '%Y-%m-%d') AS day, n,
          |  ROUND(trend, 4) + 0.0 AS trend, seasonal,
          |  ROUND(n - trend - seasonal, 4) + 0.0 AS resid
          |FROM d3 JOIN seas ON d3.event_type = seas.event_type AND d3.dow = seas.dow
          |ORDER BY d3.event_type, day""".stripMargin),
      doc = "STL-lite: centered-mean trend + dow seasonal + residual per type/day"),

    // Exact (interpolated) quantiles per event type: Spark's sort-based
    // `percentile` against DuckDB's `quantile_cont` — both implement the
    // same linear interpolation (1-g)*a[k] + g*a[k+1] over the sorted
    // values, so the rounded doubles agree. The exact arm beside a8's
    // approx sketch; Spark's implementation spills per group, but at
    // true corpus scale the approx arm is the one that ships.
    "scalar_quantiles_exact" -> QueryDef(
      build = (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            round(expr("percentile(cast(value as double), 0.25)"), 6).as("p25"),
            round(expr("percentile(cast(value as double), 0.5)"), 6).as("p50"),
            round(expr("percentile(cast(value as double), 0.9)"), 6).as("p90"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      oracle = Some(
        """SELECT event_type,
          |  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.25), 6) AS p25,
          |  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
          |  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
          |  COUNT(*) AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "Exact interpolated quantiles per type (percentile vs quantile_cont parity)"),

    // Zipf-law fit: least-squares slope of ln(freq) over ln(rank) across
    // the vocabulary (natural corpora sit near -1; a synthetic flat vocab
    // sits near 0 — a corpus-health diagnostic). The closed-form slope
    // runs over |V| pairs — vocab-sized, not corpus-sized.
    "txt_zipf_fit" -> QueryDef(
      build = (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
        val xy = vocab
          .withColumn("r", row_number().over(
            Window.orderBy(col("c").desc, col("t"))))
          .select(log(col("r").cast("double")).as("x"),
            log(col("c").cast("double")).as("y"))
        xy.agg(count(lit(1)).cast("long").as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("n").as("n_terms"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"),
            round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"), 4)
              .as("intercept"))
      },
      oracle = Some(
        """WITH vocab AS (
          |  SELECT t, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
          |  GROUP BY t),
          |xy AS (
          |  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, t) AS DOUBLE)) AS x,
          |    ln(CAST(c AS DOUBLE)) AS y
          |  FROM vocab),
          |s AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
          |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
          |  FROM xy)
          |SELECT n AS n_terms,
          |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
          |  ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4) AS intercept
          |FROM s""".stripMargin),
      doc = "Zipf-law least-squares fit over the vocabulary (corpus-health diagnostic)"),

    // Positional phrase search: exact token-adjacency match ("value
    // table") with occurrence counts and first position — the inverted-
    // index-with-positions verb. One per-doc higher-order pass, no
    // explode: positions stay inside the row's array until the tiny
    // result projection.
    "txt_phrase_search" -> QueryDef(
      build = (s, dir) => {
        // fused native kernel (graft_phrase_positions): one linear token
        // pass per doc inside codegen — the interpreted HOF form
        // (filter over a position sequence with per-index element_at)
        // measured ~2.4 s at sf0.1 vs sub-second for the kernel;
        // kernel == HOF equivalence is spec-pinned (AnalyticsSpec)
        graft.functions.Hashing.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            call_function("graft_phrase_positions", col("text"),
              lit("value table")).as("pos"))
          .filter(size(col("pos")) > 0)
          .select(col("doc_id"), size(col("pos")).as("n_occ"),
            element_at(col("pos"), 1).cast("int").as("first_pos"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          |h AS (
          |  SELECT doc_id, list_filter(generate_series(1, greatest(len(ts) - 1, 1)),
          |    i -> ts[i] = 'value' AND ts[i + 1] = 'table') AS pos
          |  FROM t)
          |SELECT doc_id, CAST(len(pos) AS INT) AS n_occ,
          |  CAST(pos[1] AS INT) AS first_pos
          |FROM h WHERE len(pos) > 0 ORDER BY doc_id""".stripMargin),
      doc = "Exact positional phrase search with occurrence counts and first position"),

    // Vocabulary coverage curve: what fraction of all token occurrences
    // the top-k vocabulary covers, at k = 5/10/20/30 (the fixture vocab is 31 tokens) — the statistic
    // that sizes a tokenizer vocab. The global rank runs over the VOCAB
    // (|V| << corpus; the heavy explode+count shuffles on token keys and
    // map-side combines), so the single-partition window is bounded.
    "txt_vocab_coverage" -> QueryDef(
      build = (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("c").desc, col("t"))
        val total = vocab.agg(sum("c").as("total"))
        vocab
          .withColumn("r", row_number().over(w).cast("int"))
          .withColumn("cum", sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("r").isin(5, 10, 20, 30))
          .crossJoin(broadcast(total))
          .select(col("r").as("k"), col("cum").as("covered_tokens"),
            round(col("cum").cast("double") / col("total").cast("double"), 6)
              .as("coverage"))
          .orderBy("k")
      },
      oracle = Some(
        """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
          |vocab AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY t),
          |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
          |ranked AS (
          |  SELECT CAST(row_number() OVER (ORDER BY c DESC, t) AS INT) AS r,
          |    CAST(SUM(c) OVER (ORDER BY c DESC, t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          |  FROM vocab)
          |SELECT r AS k, cum AS covered_tokens,
          |  ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS coverage
          |FROM ranked, tot WHERE r IN (5, 10, 20, 30)
          |ORDER BY k""".stripMargin),
      doc = "Top-k vocabulary coverage curve (tokenizer-sizing statistic)"),

    // Sub-document (chunk-level) dedup: split every doc into fixed
    // 32-token chunks, keep only the globally-FIRST occurrence of each
    // exact chunk (order = doc_id, chunk idx), reassemble the survivors.
    // The keep/drop decision shuffles (doc_id, idx, sha256) ONLY — the
    // digest is the dedup key, so the h-window exchange and the per-doc
    // flag aggregation carry ints+digests; chunk text is then rebuilt
    // from the original token arrays in the single id-keyed re-entry
    // join (raw text moves exactly once, never through the decision).
    "dedup_chunks" -> QueryDef(
      build = (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
          .withColumn("nc", ceil(size(col("toks")) / lit(32.0)).cast("int"))
        val keys = d.select(col("doc_id"), expr(
            """explode(transform(sequence(0, nc - 1),
              |  i -> struct(i AS idx,
              |    sha2(encode(array_join(slice(toks, i * 32 + 1, 32), ' '), 'UTF-8'), 256) AS h)))
              |""".stripMargin).as("c"))
          .select(col("doc_id"), col("c.idx").as("idx"), col("c.h").as("h"))
        val wFirst = Window.partitionBy("h").orderBy("doc_id", "idx")
        val perDoc = keys
          .withColumn("keep", row_number().over(wFirst) === 1)
          .groupBy("doc_id")
          .agg(
            count(lit(1)).cast("int").as("n_chunks"),
            sum(when(col("keep"), 1).otherwise(0)).cast("int").as("n_kept"),
            sort_array(collect_list(when(col("keep"), col("idx"))))
              .as("kept_idx"))
        d.join(perDoc, "doc_id")
          .select(col("doc_id"), col("n_chunks"), col("n_kept"),
            sha2(encode(array_join(expr(
              "transform(kept_idx, i -> array_join(slice(toks, i * 32 + 1, 32), ' '))"),
              " "), "UTF-8"), 256).as("dedup_hash"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |c AS (SELECT doc_id, toks, CAST(CEIL(len(toks) / 32.0) AS INT) AS nc FROM t),
          |ch AS (
          |  SELECT doc_id, CAST(i AS INT) AS idx,
          |    array_to_string(list_slice(toks, i * 32 + 1, LEAST(i * 32 + 32, len(toks))), ' ') AS chunk
          |  FROM c, UNNEST(range(0, nc)) AS g(i)),
          |k AS (
          |  SELECT doc_id, idx, chunk,
          |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) = 1 AS keep
          |  FROM ch)
          |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_chunks,
          |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
          |  sha256(COALESCE(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE keep), '')) AS dedup_hash
          |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Chunk-level sub-document dedup: keep globally-first 32-token chunks, reassemble"),

    // Rolling 14-day Pearson correlation between the click and error
    // daily rates — the co-movement monitor beside ts_linfit's
    // single-series drift. All five window sums (Σa, Σb, Σab, Σa², Σb²)
    // are exact BIGINTs over the zero-filled day grid, so r is one
    // double tree per day; rows need a full 14-day frame and positive
    // variance on both sides (integer predicates). Window runs over the
    // calendar-sized grid, never the event stream.
    "ts_rolling_corr" -> QueryDef(
      build = (s, dir) => {
        val daily = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "error"))
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("b"))
        val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
        val grid = bounds
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val g = grid.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("a"), lit(0L)).as("a"),
            coalesce(col("b"), lit(0L)).as("b"))
        val w = Window.orderBy("day").rowsBetween(-13, 0)
        val ww = Window.orderBy("day")
        g.withColumn("i", row_number().over(ww))
          .withColumn("cnt", count(lit(1)).over(w))
          .withColumn("sa", sum(col("a")).over(w))
          .withColumn("sb", sum(col("b")).over(w))
          .withColumn("sab", sum(col("a") * col("b")).over(w))
          .withColumn("saa", sum(col("a") * col("a")).over(w))
          .withColumn("sbb", sum(col("b") * col("b")).over(w))
          .withColumn("den1", col("cnt") * col("saa") - col("sa") * col("sa"))
          .withColumn("den2", col("cnt") * col("sbb") - col("sb") * col("sb"))
          .filter(col("i") >= 14 && col("den1") > 0 && col("den2") > 0)
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("a"), col("b"),
            (round((col("cnt") * col("sab") - col("sa") * col("sb")).cast("double") /
              sqrt(col("den1").cast("double") * col("den2").cast("double")), 6)
              + lit(0.0)).as("r"))
          .orderBy("day")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS day,
          |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
          |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS b
          |  FROM events WHERE event_type IN ('click', 'error') GROUP BY 1),
          |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
          |grid AS (
          |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
          |  FROM bounds),
          |g AS (
          |  SELECT grid.day, COALESCE(a, 0) AS a, COALESCE(b, 0) AS b
          |  FROM grid LEFT JOIN daily ON grid.day = daily.day),
          |wsum AS (
          |  SELECT day, a, b,
          |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
          |    CAST(COUNT(*) OVER w AS BIGINT) AS cnt,
          |    CAST(SUM(a) OVER w AS BIGINT) AS sa,
          |    CAST(SUM(b) OVER w AS BIGINT) AS sb,
          |    CAST(SUM(a * b) OVER w AS BIGINT) AS sab,
          |    CAST(SUM(a * a) OVER w AS BIGINT) AS saa,
          |    CAST(SUM(b * b) OVER w AS BIGINT) AS sbb
          |  FROM g WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
          |d AS (
          |  SELECT *, cnt * saa - sa * sa AS den1, cnt * sbb - sb * sb AS den2
          |  FROM wsum)
          |SELECT strftime(day, '%Y-%m-%d') AS day, a, b,
          |  ROUND(CAST(cnt * sab - sa * sb AS DOUBLE)
          |    / SQRT(CAST(den1 AS DOUBLE) * CAST(den2 AS DOUBLE)), 6) + 0.0 AS r
          |FROM d WHERE i >= 14 AND den1 > 0 AND den2 > 0
          |ORDER BY day""".stripMargin),
      doc = "Rolling 14-day click-error Pearson r from exact BIGINT window sums over the day grid"),

    // Periodogram of the daily event-count series at harmonics k=1..7:
    // C_k = Σ xₜ·cos(2πkt/N), S_k likewise, power P_k = (C²+S²)/N —
    // the spectral companion of ts_acf/ts_season_strength (is the
    // weekly cycle the dominant frequency, or an alias?). Every
    // cos/sin term is quantized to 1e-6 BIGINT units BEFORE the
    // cross-row sum, so engine libm last-ulp drift cannot leak into
    // the fold; the trig argument is one shared expression. The t
    // index and day domain are calendar-sized at any corpus scale.
    "ts_periodogram" -> QueryDef(
      build = (s, dir) => {
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("t",
            (row_number().over(Window.orderBy("day")) - 1).cast("long"))
        val n = d.agg(count(lit(1)).as("nn"))
        val terms = d.crossJoin(broadcast(n))
          .select(col("x"), col("t"), col("nn"),
            explode(sequence(lit(1), lit(7))).as("k"))
          .withColumn("c9", expr(
            "CAST(ROUND(CAST(x AS DOUBLE) * COS(6.283185307179586 " +
              "* CAST(k * t AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6, 0) AS BIGINT)"))
          .withColumn("s9", expr(
            "CAST(ROUND(CAST(x AS DOUBLE) * SIN(6.283185307179586 " +
              "* CAST(k * t AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6, 0) AS BIGINT)"))
        terms.groupBy("k")
          .agg(max(col("nn")).as("nn"), sum("c9").as("sc9"), sum("s9").as("ss9"))
          .select(col("k"),
            expr("ROUND(CAST(nn AS DOUBLE) / CAST(k AS DOUBLE), 2)")
              .as("period_days"),
            expr("ROUND(((CAST(sc9 AS DOUBLE) / 1e6) * (CAST(sc9 AS DOUBLE) / 1e6) " +
              "+ (CAST(ss9 AS DOUBLE) / 1e6) * (CAST(ss9 AS DOUBLE) / 1e6)) " +
              "/ CAST(nn AS DOUBLE), 4)").as("power"))
          .orderBy("k")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
          |  FROM events GROUP BY 1),
          |idx AS (
          |  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t
          |  FROM d),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM d),
          |terms AS (
          |  SELECT k, nn,
          |    CAST(ROUND(CAST(x AS DOUBLE) * COS(6.283185307179586
          |      * CAST(k * t AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6, 0) AS BIGINT) AS c9,
          |    CAST(ROUND(CAST(x AS DOUBLE) * SIN(6.283185307179586
          |      * CAST(k * t AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6, 0) AS BIGINT) AS s9
          |  FROM idx, n, (SELECT unnest(generate_series(1, 7)) AS k) ks),
          |agg AS (
          |  SELECT k, MAX(nn) AS nn,
          |    CAST(SUM(c9) AS BIGINT) AS sc9, CAST(SUM(s9) AS BIGINT) AS ss9
          |  FROM terms GROUP BY 1)
          |SELECT k, ROUND(CAST(nn AS DOUBLE) / CAST(k AS DOUBLE), 2) AS period_days,
          |  ROUND(((CAST(sc9 AS DOUBLE) / 1e6) * (CAST(sc9 AS DOUBLE) / 1e6)
          |    + (CAST(ss9 AS DOUBLE) / 1e6) * (CAST(ss9 AS DOUBLE) / 1e6))
          |    / CAST(nn AS DOUBLE), 4) AS power
          |FROM agg ORDER BY k""".stripMargin),
      doc = "Periodogram at harmonics k=1..7 - 1e-6-quantized trig terms, calendar-sized domain"),
  )
}
