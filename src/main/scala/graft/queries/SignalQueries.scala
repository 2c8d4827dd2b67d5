package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 continuation: signal-analysis and catalog-statistics operators.
  *
  *  - `ts_acf` / `ts_cusum`: autocorrelation and change-point scoring of
  *    the per-type daily event-rate series — the monitoring math behind
  *    the reference's statistics endpoints (rate seasonality, regime
  *    shifts), computed from exact integer sums so both engines round the
  *    same doubles.
  *  - `stats_histogram` / `stats_histogram_depth`: equi-width and
  *    equi-depth value histograms — optimizer/catalog statistics. The
  *    equi-depth form deliberately avoids a global sort (no single-task
  *    ntile): exact interpolated decile edges from one `percentile`
  *    aggregation, broadcast back, bucket assignment by comparison — the
  *    only shape that survives 100 TB.
  *  - `scd2_intervals`: slowly-changing-dimension type-2 build over the
  *    per-user event-type change feed (validity intervals via lag/lead).
  *  - `emb_dim_stats`: per-dimension corpus statistics of the embedding
  *    column on a 1e-6 quantized grid — integer-exact across engines.
  *  - `unpivot_metrics`: relational melt (Spark `unpivot` ⇄ UNION ALL).
  *
  * Conventions as everywhere else: integer sums wherever exactness is
  * cheap, doubles derived by the *same* operation tree on both engines,
  * total ORDER BY, explicit casts so schemas hash-match.
  */
object SignalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  /** Daily event counts per type — the shared series for ts_acf/ts_cusum. */
  private def dailyCounts(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  private val sqlDaily =
    """daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Exact upper-triangle product sums of the 1e-6-quantized embedding
    * dimensions: (i, j, sp = Σ vqᵢ·vqⱼ, n), i ≤ j — the shared input of
    * emb_dim_cov and emb_pca_power. The per-row product generation is the
    * fused native `graft_tri_products` kernel (one loop, primitive longs;
    * the nested-transform HOF form it replaced was interpreted per
    * element); k-order maps back to (i, j) through a broadcast 2080-row
    * position table.
    */
  private def triPairSums(s: org.apache.spark.sql.SparkSession,
                          embs: org.apache.spark.sql.DataFrame,
                          ndims: Int): org.apache.spark.sql.DataFrame = {
    graft.functions.Hashing.register(s)
    val pm = s.range(ndims).select(col("id").cast("int").as("i"))
      .crossJoin(broadcast(s.range(ndims).select(col("id").cast("int").as("j"))))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"),
        expr(s"CAST(i * $ndims - (i * (i + 1)) div 2 + j AS INT)").as("pos"))
    embs.select(posexplode(expr("graft_tri_products(embedding)")).as(Seq("pos", "p")))
      .groupBy("pos").agg(sum(col("p")).as("sp"), count(lit(1)).as("n"))
      .join(broadcast(pm), "pos")
      .select("i", "j", "sp", "n")
  }

  val defs: Map[String, QueryDef] = Map(

    // Autocorrelation of the daily event-rate series at lags 1..7, per
    // event type. Pearson r is assembled from integer sums (counts are
    // exact BIGINTs; np·sxy etc. stay well under 2^63), so the only double
    // math is the final identical expression tree on both engines. The
    // lag pairing is a broadcast-free self-join on (type, row_number−k):
    // the daily series is pre-aggregated (tiny at any corpus scale), so
    // the join cost is nil while the scan+count underneath is the one
    // full-data pass.
    "ts_acf" -> QueryDef(
      build = (s, dir) => {
        val rn = dailyCounts(s, dir).withColumn("rn",
          row_number().over(Window.partitionBy("event_type").orderBy("day")))
        val withLag = rn
          .withColumn("lag", explode(array((1 to 7).map(lit): _*)))
          .select(col("event_type"), col("rn"), col("lag"), col("n").as("x"))
        val pairs = withLag.as("a").join(rn.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.rn") === col("a.rn") - col("a.lag"))
          .select(col("a.event_type").as("event_type"), col("a.lag").as("lag"),
            col("a.x").as("x"), col("b.n").as("y"))
        pairs.groupBy("event_type", "lag")
          .agg(count(lit(1)).as("np"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("lag").cast("int").as("lag"),
            col("np").cast("long").as("n_pairs"),
            round((col("np") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("np") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("np") * col("syy") - col("sy") * col("sy")).cast("double")),
              6).as("acf"))
          .orderBy("event_type", "lag")
      },
      oracle = Some(
        s"""WITH $sqlDaily,
           |rn AS (
           |  SELECT event_type, n,
           |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
           |  FROM daily),
           |lagged AS (
           |  SELECT a.event_type, l.lag, a.n AS x, b.n AS y
           |  FROM rn a
           |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
           |  JOIN rn b ON b.event_type = a.event_type AND b.rn = a.rn - l.lag),
           |agg AS (
           |  SELECT event_type, lag, COUNT(*) AS np,
           |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
           |    SUM(x * x) AS sxx, SUM(y * y) AS syy
           |  FROM lagged GROUP BY 1, 2)
           |SELECT event_type, CAST(lag AS INT) AS lag, CAST(np AS BIGINT) AS n_pairs,
           |  ROUND(CAST(np * sxy - sx * sy AS DOUBLE)
           |        / SQRT(CAST(np * sxx - sx * sx AS DOUBLE)
           |               * CAST(np * syy - sy * sy AS DOUBLE)), 6) AS acf
           |FROM agg ORDER BY event_type, lag""".stripMargin),
      doc = "Autocorrelation (lags 1-7) of daily event rates from exact integer sums"),

    // CUSUM change-point estimate per event type: s_t = Σ_{i≤t}(x_i − x̄)
    // peaks at the regime shift. Scaled by n_days it is integer-exact
    // (n·cum_t − t·sx), so the argmax — and therefore the reported
    // change-point day — is deterministic; only the final reported
    // magnitude is a double. One aggregation + two windows over the tiny
    // daily series.
    "ts_cusum" -> QueryDef(
      build = (s, dir) => {
        val wOrd = Window.partitionBy("event_type").orderBy("day")
        val wAll = Window.partitionBy("event_type")
        val scored = dailyCounts(s, dir)
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .withColumn("cum", sum(col("n")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("nd", count(lit(1)).over(wAll).cast("long"))
          .withColumn("sx", sum(col("n")).over(wAll))
          .withColumn("score", col("nd") * col("cum") - col("t") * col("sx"))
        scored
          .withColumn("pick", row_number().over(Window.partitionBy("event_type")
            .orderBy(abs(col("score")).desc, col("day"))))
          .filter(col("pick") === 1)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
            col("nd").as("n_days"),
            round(abs(col("score")).cast("double") / col("nd").cast("double"), 6)
              .as("cusum_max"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH $sqlDaily,
           |scored AS (
           |  SELECT event_type, day,
           |    CAST(COUNT(*) OVER w AS BIGINT) AS nd,
           |    CAST(COUNT(*) OVER w AS BIGINT)
           |      * SUM(n) OVER (PARTITION BY event_type ORDER BY day
           |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    - CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
           |      * SUM(n) OVER w AS score
           |  FROM daily WINDOW w AS (PARTITION BY event_type)),
           |picked AS (
           |  SELECT *, row_number() OVER (
           |      PARTITION BY event_type ORDER BY ABS(score) DESC, day) AS pick
           |  FROM scored)
           |SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day, nd AS n_days,
           |  ROUND(CAST(ABS(score) AS DOUBLE) / CAST(nd AS DOUBLE), 6) AS cusum_max
           |FROM picked WHERE pick = 1 ORDER BY event_type""".stripMargin),
      doc = "CUSUM change-point day + peak magnitude per event type, integer-exact argmax"),

    // Equi-width histogram of order value: 12 × $50k buckets over integer
    // cents. One scan, map-side combine into ≤12 groups — the catalog
    // statistic that costs an ordinary aggregation at any scale.
    "stats_histogram" -> QueryDef(
      build = (s, dir) =>
        Tables.orders(s, dir)
          .select(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"),
            col("o_totalprice"))
          .withColumn("bucket", least(expr("cents div 5000000"), lit(11L)).cast("int"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("cnt"),
            min(dec(col("o_totalprice"))).cast("double").as("min_price"),
            max(dec(col("o_totalprice"))).cast("double").as("max_price"),
            dec(sum(dec(col("o_totalprice")))).cast("double").as("rev"))
          .withColumn("lo_dollars", (col("bucket") * 50000L).cast("long"))
          .select("bucket", "lo_dollars", "cnt", "min_price", "max_price", "rev")
          .orderBy("bucket"),
      oracle = Some(
        """WITH c AS (
          |  SELECT CAST(LEAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) // 5000000,
          |              11) AS INT) AS bucket, o_totalprice
          |  FROM orders)
          |SELECT bucket,
          |  CAST(bucket * 50000 AS BIGINT) AS lo_dollars,
          |  CAST(COUNT(*) AS BIGINT) AS cnt,
          |  CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
          |  CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
          |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS DOUBLE) AS rev
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Equi-width order-value histogram (12 x $50k) over integer cents"),

    // Equi-depth histogram WITHOUT a global sort: exact interpolated
    // decile edges from one `percentile` aggregation (== DuckDB
    // quantile_cont, the parity scalar_quantiles_exact pins), broadcast as
    // a single row, bucket = |{edges < value}|. ntile() would funnel every
    // row through one ordered partition; this shape is scan + tiny
    // broadcast + 10-group aggregation at any corpus size.
    "stats_histogram_depth" -> QueryDef(
      build = (s, dir) => {
        val c = Tables.orders(s, dir)
          .select(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        val edges = c.agg(expr(
          "percentile(cents, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
          .as("edges"))
        c.crossJoin(broadcast(edges))
          .select(col("cents"),
            expr("CAST(size(filter(edges, e -> CAST(cents AS DOUBLE) > e)) AS INT)")
              .as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("cnt"),
            min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
          .orderBy("bucket")
      },
      oracle = Some(
        """WITH c AS (
          |  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
          |e AS (
          |  SELECT quantile_cont(cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges
          |  FROM c)
          |SELECT
          |  CAST(len(list_filter(e.edges, x -> CAST(c.cents AS DOUBLE) > x)) AS INT) AS bucket,
          |  CAST(COUNT(*) AS BIGINT) AS cnt,
          |  MIN(c.cents) AS min_cents, MAX(c.cents) AS max_cents
          |FROM c, e GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Equi-depth histogram via broadcast decile edges - no global sort"),

    // SCD type-2 build: per-user event_type treated as a changing
    // dimension attribute; collapse the event feed to change rows, then
    // lag/lead gives [valid_from, valid_to) validity intervals and the
    // current-row flag. Two windows over the same (user, ts) partitioning
    // — one shuffle; the change filter drops same-value repeats before the
    // interval window touches them.
    "scd2_intervals" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val changes = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        val w2 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        changes
          .withColumn("version", row_number().over(w2))
          .withColumn("valid_to_ts", lead(col("ts"), 1).over(w2))
          .select(col("user_id"),
            col("version"),
            col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
            coalesce(date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
              lit("9999-12-31 00:00:00.000000")).as("valid_to"),
            col("valid_to_ts").isNull.as("is_current"))
          .orderBy("user_id", "version")
      },
      oracle = Some(
        """WITH changes AS (
          |  SELECT user_id, event_type, ts, event_id,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM events
          |  QUALIFY prev IS NULL OR prev <> event_type),
          |iv AS (
          |  SELECT user_id, event_type, ts,
          |    CAST(row_number() OVER w AS INT) AS version,
          |    lead(ts) OVER w AS valid_to_ts
          |  FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT user_id, version, event_type,
          |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
          |  COALESCE(strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S.%f'),
          |           '9999-12-31 00:00:00.000000') AS valid_to,
          |  valid_to_ts IS NULL AS is_current
          |FROM iv ORDER BY user_id, version""".stripMargin),
      doc = "SCD type-2 validity intervals from the per-user event-type change feed"),

    // Per-dimension corpus statistics of the embedding column on a 1e-6
    // quantized grid: floor(v·1e6) is computed identically by both engines
    // (float→double cast is exact, one rounded multiply, floor), so every
    // sum is an exact BIGINT and mean/variance are bit-identical derived
    // doubles. The whitening / feature-selection precursor: posexplode →
    // 64-group aggregation, map-side combined.
    "emb_dim_stats" -> QueryDef(
      build = (s, dir) =>
        Tables.embeddings(s, dir)
          .select(posexplode(col("embedding")).as(Seq("dim", "vf")))
          .select(col("dim"),
            expr("CAST(FLOOR(CAST(vf AS DOUBLE) * 1000000D) AS BIGINT)").as("vq"))
          .groupBy("dim")
          .agg(count(lit(1)).as("n"),
            sum(col("vq")).as("sx"),
            sum(col("vq") * col("vq")).as("sxx"),
            min(col("vq")).as("min_q"), max(col("vq")).as("max_q"))
          .select(col("dim"), col("n"),
            round(col("sx").cast("double") / col("n").cast("double") / 1e6, 6)
              .as("mean"),
            round((col("sxx").cast("double") / col("n").cast("double") -
              (col("sx").cast("double") / col("n").cast("double")) *
                (col("sx").cast("double") / col("n").cast("double"))) / 1e12, 6)
              .as("variance"),
            round(col("min_q").cast("double") / 1e6, 6).as("min_v"),
            round(col("max_q").cast("double") / 1e6, 6).as("max_v"))
          .orderBy("dim"),
      oracle = Some(
        """WITH dims AS (SELECT unnest(generate_series(1,
          |    (SELECT MAX(len(embedding)) FROM embeddings))) AS i),
          |ex AS (
          |  SELECT CAST(i - 1 AS INT) AS dim,
          |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vq
          |  FROM embeddings, dims WHERE i <= len(embedding)),
          |agg AS (
          |  SELECT dim, COUNT(*) AS n, SUM(vq) AS sx, SUM(vq * vq) AS sxx,
          |    MIN(vq) AS min_q, MAX(vq) AS max_q
          |  FROM ex GROUP BY dim)
          |SELECT dim, CAST(n AS BIGINT) AS n,
          |  ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6) AS mean,
          |  ROUND((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
          |         - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e12, 6) AS variance,
          |  ROUND(CAST(min_q AS DOUBLE) / 1e6, 6) AS min_v,
          |  ROUND(CAST(max_q AS DOUBLE) / 1e6, 6) AS max_v
          |FROM agg ORDER BY dim""".stripMargin),
      doc = "Per-dimension embedding mean/variance/range, integer-exact on a 1e-6 grid"),

    // Holt's linear-trend (double exponential) smoothing of the daily
    // series, α=0.3 β=0.1, init (l₁=x₁, b₁=0). Two-component state rules
    // out the scalar `list_reduce` EWMA trick, so the engines diverge in
    // spelling while computing the identical tree: Spark folds a
    // named_struct accumulator over the ordered prefix (deterministic
    // in-order per-row fold); DuckDB replays the recursion as a
    // recursive CTE. The level expression is deliberately recomputed
    // inside the trend update on BOTH engines so every intermediate
    // double is bit-identical.
    "ts_holt" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dailyCounts(s, dir)
          .withColumn("xs", collect_list(col("n").cast("double")).over(w))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
            expr("""aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),
                  named_struct('l', CAST(element_at(xs, 1) AS DOUBLE), 'b', 0D),
                  (acc, x) -> named_struct(
                    'l', 0.3D * x + 0.7D * (acc.l + acc.b),
                    'b', 0.1D * ((0.3D * x + 0.7D * (acc.l + acc.b)) - acc.l)
                         + 0.9D * acc.b))""").as("st"))
          .select(col("event_type"), col("day"), col("n"),
            round(col("st.l"), 6).as("level"),
            round(col("st.b"), 6).as("trend"),
            round(col("st.l") + col("st.b"), 6).as("forecast"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
          |  FROM events GROUP BY 1, 2),
          |rn AS (
          |  SELECT event_type, day, n, CAST(n AS DOUBLE) AS x,
          |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
          |  FROM daily),
          |holt AS (
          |  SELECT event_type, rn, day, n, x, x AS l, CAST(0 AS DOUBLE) AS b
          |  FROM rn WHERE rn = 1
          |  UNION ALL
          |  SELECT r.event_type, r.rn, r.day, r.n, r.x,
          |    0.3 * r.x + 0.7 * (h.l + h.b) AS l,
          |    0.1 * ((0.3 * r.x + 0.7 * (h.l + h.b)) - h.l) + 0.9 * h.b AS b
          |  FROM holt h JOIN rn r ON r.event_type = h.event_type AND r.rn = h.rn + 1)
          |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
          |  ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
          |  ROUND(l + b, 6) AS forecast
          |FROM holt ORDER BY event_type, day""".stripMargin),
      doc = "Holt linear-trend smoothing: struct-fold vs recursive-CTE, bit-identical state"),

    // Holt–Winters ADDITIVE-SEASONAL smoothing (m=7, α=0.3 β=0.1 γ=0.2) —
    // the seasonal completion of ts_holt: state is (level, trend, 7-slot
    // seasonal ring), the ring rotating one slot per step so s[1] is
    // always s_{t−m}. Init: level = ordered-fold mean of the first
    // season, seasonals = first-season residuals, trend 0; emission
    // starts after the warmup season. The Spark side is one struct fold
    // over the cumulative prefix (the ts_ewma/ts_holt idiom — windows
    // only over the per-type day domain); the oracle replays the same
    // recursion as a recursive CTE carrying the ring as a LIST. Every
    // double op is spelled identically, so state is bit-equal and the
    // table hash-checks.
    "ts_holtwinters" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val lp = "0.3D * (x - element_at(acc.s, 1)) + 0.7D * (acc.l + acc.b)"
        dailyCounts(s, dir)
          .withColumn("xs", collect_list(col("n").cast("double")).over(w))
          .withColumn("st", expr(
            s"""CASE WHEN size(xs) >= 8 THEN
               |  aggregate(
               |    slice(xs, 8, size(xs) - 7),
               |    named_struct(
               |      'l', aggregate(slice(xs, 1, 7), 0D, (a, x) -> a + x) / 7.0D,
               |      'b', 0D,
               |      's', transform(slice(xs, 1, 7),
               |        x -> x - aggregate(slice(xs, 1, 7), 0D, (a, x) -> a + x) / 7.0D)),
               |    (acc, x) -> named_struct(
               |      'l', $lp,
               |      'b', 0.1D * (($lp) - acc.l) + 0.9D * acc.b,
               |      's', concat(slice(acc.s, 2, 6), array(
               |        0.2D * (x - ($lp)) + 0.8D * element_at(acc.s, 1)))))
               |ELSE NULL END""".stripMargin))
          .filter(col("st").isNotNull)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
            (round(col("st.l"), 6) + lit(0.0)).as("level"),
            (round(col("st.b"), 6) + lit(0.0)).as("trend"),
            (round(element_at(col("st.s"), 7), 6) + lit(0.0)).as("seasonal"),
            (round(col("st.l") + col("st.b") + element_at(col("st.s"), 1), 6)
              + lit(0.0)).as("forecast"))
          .orderBy("event_type", "day")
      },
      oracle = Some {
        val lp = "0.3 * (r.x - h.s[1]) + 0.7 * (h.l + h.b)"
        s"""WITH RECURSIVE daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
           |  FROM events GROUP BY 1, 2),
           |rn AS (
           |  SELECT event_type, day, n, CAST(n AS DOUBLE) AS x,
           |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
           |  FROM daily),
           |init AS (
           |  SELECT event_type,
           |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |      list(x ORDER BY rn)), (a, b) -> a + b) / 7.0 AS l0,
           |    list(x ORDER BY rn) AS xs7
           |  FROM rn WHERE rn <= 7 GROUP BY event_type),
           |seed AS (
           |  SELECT event_type, 7 AS rn, CAST(NULL AS DATE) AS day,
           |    CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS x,
           |    l0 AS l, CAST(0 AS DOUBLE) AS b,
           |    list_transform(xs7, x -> x - l0) AS s
           |  FROM init),
           |hw AS (
           |  SELECT * FROM seed
           |  UNION ALL
           |  SELECT r.event_type, CAST(r.rn AS INT), r.day, r.n, r.x,
           |    $lp AS l,
           |    0.1 * (($lp) - h.l) + 0.9 * h.b AS b,
           |    list_append(h.s[2:7],
           |      0.2 * (r.x - ($lp)) + 0.8 * h.s[1]) AS s
           |  FROM hw h JOIN rn r
           |    ON r.event_type = h.event_type AND r.rn = h.rn + 1)
           |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           |  ROUND(l, 6) + 0.0 AS level, ROUND(b, 6) + 0.0 AS trend,
           |  ROUND(s[7], 6) + 0.0 AS seasonal,
           |  ROUND(l + b + s[1], 6) + 0.0 AS forecast
           |FROM hw WHERE rn >= 8 ORDER BY event_type, day""".stripMargin
      },
      doc = "Holt-Winters additive seasonal (m=7): ring-buffer struct fold vs recursive list CTE"),

    // Deterministic Lloyd k-means (k=8, 3 rounds, k-lowest-id seeds) —
    // fully oracle-checked clustering, the property the mllib fit can't
    // give (its recall arm is rows-only). Integer-exact centroid state +
    // per-row in-order distance folds make every round bit-reproducible;
    // the oracle replays all 3 rounds as generated CTE pairs. See
    // scale/KMeansLloyd for the exactness scheme and the broadcast-
    // centroid scale shape.
    "emb_kmeans" -> QueryDef(
      build = (s, dir) =>
        graft.scale.KMeansLloyd.assign(Tables.embeddings(s, dir),
            "vec_id", "embedding", k = 8, iterations = 3)
          .select(col("vec_id"), col("cid"),
            round(col("dist") / 1e12, 6).as("dist"))
          .orderBy("vec_id"),
      oracle = Some(graft.scale.KMeansLloyd.oracleSql(k = 8, iterations = 3,
        "SELECT vec_id, cid, ROUND(dist / 1e12, 6) AS dist FROM a3 ORDER BY vec_id")),
      doc = "Lloyd k-means assignments after 3 bit-reproducible rounds, unrolled-CTE oracle"),

    // Full covariance/correlation matrix of the embedding dimensions
    // (upper triangle incl. diagonal, 64·65/2 = 2080 entries) — the PCA /
    // whitening precursor. All pair products are generated PER ROW by a
    // nested-transform HOF (one scan, no self-join, no pre-aggregation
    // shuffle); every sum is an exact BIGINT on the 1e-6 grid, and
    // cov/corr are identical double trees over those integers. The
    // oracle replays via a dims×dims self-join — same sums, different
    // spelling.
    "emb_dim_cov" -> QueryDef(
      build = (s, dir) => {
        val embs = Tables.embeddings(s, dir)
        // schema-class scalar (embedding width) — one probe job per
        // session, not per run (r13: same memo class as the band plan)
        val ndims = graft.Caches.sessionMemo(s, s"ndims:$dir")(
          embs.select(size(col("embedding"))).head.getInt(0))
        val sp = triPairSums(s, embs, ndims)
        // per-dim sums; the squared sums (sxxᵢ) are the DIAGONAL of sp —
        // the oracle's SUM(a.vq*a.vq) over pair rows is the same integer
        val dimSums = embs
          .select(posexplode(expr(
            "transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000D) AS BIGINT))"))
            .as(Seq("d", "vq")))
          .groupBy("d").agg(sum(col("vq")).as("sx"))
        val diag = sp.filter(col("i") === col("j"))
          .select(col("i").as("d"), col("sp").as("sqsum"))
        val withSums = sp
          .join(broadcast(dimSums.select(col("d").as("i"), col("sx").as("sx"))), "i")
          .join(broadcast(dimSums.select(col("d").as("j"), col("sx").as("sy"))), "j")
          .join(broadcast(diag.select(col("d").as("i"), col("sqsum").as("sxx"))), "i")
          .join(broadcast(diag.select(col("d").as("j"), col("sqsum").as("syy"))), "j")
        withSums
          .select(col("i"), col("j"), col("n"),
            (round((col("sp").cast("double") / col("n") -
              (col("sx").cast("double") / col("n")) *
                (col("sy").cast("double") / col("n"))) / 1e12, 6)
              + lit(0.0)).as("cov"),
            (round((col("n") * col("sp") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double")),
              6) + lit(0.0)).as("corr"))
          .orderBy("i", "j")
      },
      oracle = Some(
        """WITH dims AS (SELECT unnest(generate_series(1,
          |    (SELECT MAX(len(embedding)) FROM embeddings))) AS i),
          |ex AS (
          |  SELECT vec_id, CAST(i - 1 AS INT) AS d,
          |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vq
          |  FROM embeddings, dims WHERE i <= len(embedding)),
          |agg AS (
          |  SELECT a.d AS i, b.d AS j, COUNT(*) AS n,
          |    SUM(a.vq) AS sx, SUM(b.vq) AS sy, SUM(a.vq * b.vq) AS sxy,
          |    SUM(a.vq * a.vq) AS sxx, SUM(b.vq * b.vq) AS syy
          |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.d <= b.d
          |  GROUP BY 1, 2)
          |SELECT i, j, CAST(n AS BIGINT) AS n,
          |  ROUND((CAST(sxy AS DOUBLE) / n
          |         - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) / 1e12,
          |        6) + 0.0 AS cov,
          |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
          |        / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
          |               * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0.0 AS corr
          |FROM agg ORDER BY i, j""".stripMargin),
      doc = "Embedding covariance/correlation matrix (upper triangle), integer-exact"),

    // Per-priority 2-D Pareto front of orders (maximize price, minimize
    // date): a row is dominated iff some strictly-higher-priced order in
    // the same priority is strictly earlier. The dominance test is ONE
    // numeric-RANGE window (min date over price_cents ≥ current+1) — no
    // quadratic dominance self-join; the window is partitioned by
    // priority, and the distributive skyline-merge property (skyline of a
    // union ⊆ union of skylines) gives the partition-then-merge path if a
    // single group ever outgrows one task.
    "skyline_orders" -> QueryDef(
      build = (s, dir) => {
        val o = Tables.orders(s, dir).select(
          col("o_orderpriority"), col("o_orderkey"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("dd"),
          col("o_orderdate"), col("o_totalprice"))
        // Spark's shrinking RANGE-frame (k FOLLOWING → UNBOUNDED FOLLOWING)
        // recomputes the aggregate per row — O(n²), measured 97 s at
        // sf0.1. Same semantics in O(n): collapse ties to one row per
        // price, take the RUNNING min over strictly-higher prices (rows
        // ABOVE in DESC order — a growing frame Spark maintains
        // incrementally), join back on the price key. The oracle keeps
        // the declarative RANGE spelling.
        val perPrice = o.groupBy("o_orderpriority", "cents")
          .agg(min(col("dd")).as("dd_at"))
        val wDesc = Window.partitionBy("o_orderpriority")
          .orderBy(col("cents").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val bound = perPrice.withColumn("min_dd_higher", min(col("dd_at")).over(wDesc))
          .select("o_orderpriority", "cents", "min_dd_higher")
        o.join(bound, Seq("o_orderpriority", "cents"))
          .filter(col("min_dd_higher").isNull || col("min_dd_higher") >= col("dd"))
          .select(col("o_orderpriority"), col("o_orderkey"),
            dec(col("o_totalprice")).cast("double").as("price"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
          .withColumn("pos", row_number().over(Window
            .partitionBy("o_orderpriority")
            .orderBy(col("price").desc, col("o_orderkey"))).cast("int"))
          .orderBy("o_orderpriority", "pos")
      },
      oracle = Some(
        """WITH o AS (
          |  SELECT o_orderpriority, o_orderkey,
          |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
          |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dd,
          |    o_orderdate, o_totalprice
          |  FROM orders),
          |sk AS (
          |  SELECT *, MIN(dd) OVER (PARTITION BY o_orderpriority ORDER BY cents
          |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS min_dd_higher
          |  FROM o
          |  QUALIFY min_dd_higher IS NULL OR min_dd_higher >= dd)
          |SELECT o_orderpriority, o_orderkey,
          |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
          |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
          |  CAST(row_number() OVER (PARTITION BY o_orderpriority
          |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) DESC,
          |               o_orderkey) AS INT) AS pos
          |FROM sk ORDER BY o_orderpriority, pos""".stripMargin),
      doc = "Per-priority Pareto front (max price, min date) via one RANGE window"),

    // Forecast skill evaluation: one-step-ahead Holt errors vs the naive
    // lag-1 forecaster, per type. Both error streams derive from the same
    // recursion ts_holt pins, so the doubles are engine-identical; the
    // |error| values are then quantized to exact 1e-6 BIGINTs so the MAE
    // sums are order-independent, and MASE is the final identical double
    // ratio. MASE < 1 on every fixture series — the model genuinely beats
    // naive, measured, not assumed.
    "ts_forecast_eval" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wOrd = Window.partitionBy("event_type").orderBy("day")
        val holt = dailyCounts(s, dir)
          .withColumn("xs", collect_list(col("n").cast("double")).over(w))
          .select(col("event_type"), col("day"),
            col("n").cast("double").as("x"),
            expr("""aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),
                  named_struct('l', CAST(element_at(xs, 1) AS DOUBLE), 'b', 0D),
                  (acc, x) -> named_struct(
                    'l', 0.3D * x + 0.7D * (acc.l + acc.b),
                    'b', 0.1D * ((0.3D * x + 0.7D * (acc.l + acc.b)) - acc.l)
                         + 0.9D * acc.b))""").as("st"))
        holt
          .withColumn("fc_prev", lag(col("st.l") + col("st.b"), 1).over(wOrd))
          .withColumn("x_prev", lag(col("x"), 1).over(wOrd))
          .filter(col("fc_prev").isNotNull)
          .select(col("event_type"),
            expr("CAST(ROUND(ABS(x - fc_prev) * 1e6, 0) AS BIGINT)").as("qh"),
            expr("CAST(ROUND(ABS(x - x_prev) * 1e6, 0) AS BIGINT)").as("qn"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_steps"), sum(col("qh")).as("sh"),
            sum(col("qn")).as("sn"))
          .select(col("event_type"), col("n_steps"),
            round(col("sh").cast("double") / col("n_steps") / 1e6, 6).as("mae_holt"),
            round(col("sn").cast("double") / col("n_steps") / 1e6, 6).as("mae_naive"),
            round(col("sh").cast("double") / col("sn").cast("double"), 6).as("mase"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
          |  FROM events GROUP BY 1, 2),
          |rn AS (
          |  SELECT event_type, day, n, CAST(n AS DOUBLE) AS x,
          |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
          |  FROM daily),
          |holt AS (
          |  SELECT event_type, rn, x, x AS l, CAST(0 AS DOUBLE) AS b
          |  FROM rn WHERE rn = 1
          |  UNION ALL
          |  SELECT r.event_type, r.rn, r.x,
          |    0.3 * r.x + 0.7 * (h.l + h.b),
          |    0.1 * ((0.3 * r.x + 0.7 * (h.l + h.b)) - h.l) + 0.9 * h.b
          |  FROM holt h JOIN rn r ON r.event_type = h.event_type AND r.rn = h.rn + 1),
          |err AS (
          |  SELECT c.event_type,
          |    CAST(ROUND(ABS(c.x - (p.l + p.b)) * 1e6, 0) AS BIGINT) AS qh,
          |    CAST(ROUND(ABS(c.x - p.x) * 1e6, 0) AS BIGINT) AS qn
          |  FROM holt c JOIN holt p
          |    ON p.event_type = c.event_type AND p.rn = c.rn - 1)
          |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_steps,
          |  ROUND(CAST(SUM(qh) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mae_holt,
          |  ROUND(CAST(SUM(qn) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mae_naive,
          |  ROUND(CAST(SUM(qh) AS DOUBLE) / CAST(SUM(qn) AS DOUBLE), 6) AS mase
          |FROM err GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Holt vs naive one-step forecast MAE + MASE, quantized-exact error sums"),

    // Theil–Sen robust trend: the LOWER MEDIAN of all pairwise slopes per
    // type — the outlier-immune complement to ts_linfit's OLS. Slopes are
    // exact integer ratios (identical doubles), the median is an indexed
    // pick from the sorted per-type slope list (the ts_rolling_median
    // idiom), so no cross-row double arithmetic exists at all. Pairs are
    // O(T²) in SERIES length — T is days, not events, so the quadratic
    // term is bounded by the calendar, never the corpus.
    "ts_theilsen" -> QueryDef(
      build = (s, dir) => {
        val rn = dailyCounts(s, dir).withColumn("t",
          row_number().over(Window.partitionBy("event_type").orderBy("day"))
            .cast("long"))
        rn.as("a").join(rn.as("b"),
            col("a.event_type") === col("b.event_type") && col("b.t") > col("a.t"))
          .select(col("a.event_type").as("event_type"),
            ((col("b.n") - col("a.n")).cast("double") /
              (col("b.t") - col("a.t")).cast("double")).as("slope"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"),
            expr("element_at(array_sort(collect_list(slope)), CAST((count(1) + 1) div 2 AS INT))")
              .as("med"))
          .select(col("event_type"), col("n_pairs"),
            round(col("med"), 6).as("theil_slope"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH $sqlDaily,
           |rn AS (
           |  SELECT event_type, n,
           |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t
           |  FROM daily),
           |sl AS (
           |  SELECT a.event_type,
           |    CAST(b.n - a.n AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
           |  FROM rn a JOIN rn b ON a.event_type = b.event_type AND b.t > a.t),
           |arr AS (SELECT event_type, list(slope ORDER BY slope) AS xs,
           |    COUNT(*) AS np FROM sl GROUP BY 1)
           |SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
           |  ROUND(xs[CAST((np + 1) // 2 AS INT)], 6) AS theil_slope
           |FROM arr ORDER BY event_type""".stripMargin),
      doc = "Theil-Sen robust slope: lower median of pairwise slopes, calendar-bounded quadratic"),

    // MAD outlier days: |x − median| > 3·MAD per type — the robust-stats
    // anomaly gate next to evt_rate_anomaly's z-score (a z-score's mean
    // and stddev are themselves dragged by the outlier; medians aren't).
    // Integer-exact end to end: both medians are indexed picks from
    // sorted integer lists, deviations are integer |x − med|, and the
    // 3·MAD comparison never leaves BIGINT.
    "ts_mad_outliers" -> QueryDef(
      build = (s, dir) => {
        val daily = dailyCounts(s, dir)
        val med = daily.groupBy("event_type")
          .agg(expr("element_at(array_sort(collect_list(n)), CAST((count(1) + 1) div 2 AS INT))")
            .as("med"))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("ad", abs(col("n") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("element_at(array_sort(collect_list(ad)), CAST((count(1) + 1) div 2 AS INT))")
            .as("mad"))
        dev.join(broadcast(mad), "event_type")
          .filter(abs(col("n") - col("med")) > lit(3) * col("mad"))
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), col("med"), col("mad"),
            (abs(col("n") - col("med")) > lit(3) * col("mad")).as("outlier"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        s"""WITH $sqlDaily,
           |med AS (
           |  SELECT event_type,
           |    list(n ORDER BY n)[CAST((COUNT(*) + 1) // 2 AS INT)] AS med
           |  FROM daily GROUP BY 1),
           |dev AS (
           |  SELECT d.event_type, d.day, d.n, m.med, ABS(d.n - m.med) AS ad
           |  FROM daily d JOIN med m USING (event_type)),
           |mad AS (
           |  SELECT event_type,
           |    list(ad ORDER BY ad)[CAST((COUNT(*) + 1) // 2 AS INT)] AS mad
           |  FROM dev GROUP BY 1)
           |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n, d.med, m.mad,
           |  ABS(d.n - d.med) > 3 * m.mad AS outlier
           |FROM dev d JOIN mad m USING (event_type)
           |WHERE ABS(d.n - d.med) > 3 * m.mad
           |ORDER BY d.event_type, day""".stripMargin),
      doc = "Median/MAD outlier days per type - robust anomaly gate, integer-exact"),

    // Seasonal-strength (Hyndman-style): 1 − Var(residual)/Var(detrended)
    // per type, where trend = centered 7-day mean over full windows and
    // seasonal = per-dow mean of the detrended series. Worked in units of
    // 1/7 so the detrended values are exact ints (7x − s7); residuals are
    // identical doubles quantized to a 1e-3 grid, so both variances come
    // from exact integer sums (the 1e-3 grid keeps squared sums far from
    // BIGINT range at any realistic daily magnitude).
    "ts_season_strength" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
        val win = dailyCounts(s, dir)
          .withColumn("s7", sum(col("n")).over(w))
          .withColumn("c7", count(lit(1)).over(w))
          .withColumn("dow", expr(
            "CAST(datediff(to_date(day), DATE '1970-01-01') AS BIGINT) % 7"))
          .filter(col("c7") === 7)
          .withColumn("d7", lit(7) * col("n") - col("s7"))
        val sea = win.groupBy("event_type", "dow")
          .agg(sum(col("d7")).as("sd"), count(lit(1)).as("cnt"))
        val resid = win.join(broadcast(sea), Seq("event_type", "dow"))
          .select(col("event_type"), col("d7").cast("long").as("d7q"),
            expr("""CAST(ROUND((CAST(d7 AS DOUBLE)
                  - CAST(sd AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1e3, 0) AS BIGINT)""")
              .as("rq"))
        resid.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("d7q")).as("sx"), sum(col("d7q") * col("d7q")).as("sxx"),
            sum(col("rq")).as("rx"), sum(col("rq") * col("rq")).as("rxx"))
          .select(col("event_type"), col("n").cast("long").as("n_days"),
            round(greatest(lit(0.0),
              lit(1.0) - ((col("n") * col("rxx") - col("rx") * col("rx"))
                .cast("double") / 1e6) /
                (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")),
              4).as("seasonal_strength"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH $sqlDaily,
           |win AS (
           |  SELECT event_type, day, n,
           |    SUM(n) OVER w AS s7, COUNT(*) OVER w AS c7,
           |    CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) % 7 AS dow
           |  FROM daily
           |  WINDOW w AS (PARTITION BY event_type ORDER BY day
           |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
           |interior AS (
           |  SELECT event_type, day, dow, 7 * n - s7 AS d7 FROM win WHERE c7 = 7),
           |sea AS (
           |  SELECT event_type, dow, SUM(d7) AS sd, COUNT(*) AS cnt
           |  FROM interior GROUP BY 1, 2),
           |resid AS (
           |  SELECT i.event_type,
           |    CAST(i.d7 AS BIGINT) AS d7q,
           |    CAST(ROUND((CAST(i.d7 AS DOUBLE)
           |          - CAST(s.sd AS DOUBLE) / CAST(s.cnt AS DOUBLE)) * 1e3, 0) AS BIGINT) AS rq
           |  FROM interior i JOIN sea s
           |    ON s.event_type = i.event_type AND s.dow = i.dow),
           |agg AS (
           |  SELECT event_type, COUNT(*) AS n,
           |    SUM(d7q) AS sx, SUM(d7q * d7q) AS sxx,
           |    SUM(rq) AS rx, SUM(rq * rq) AS rxx
           |  FROM resid GROUP BY 1)
           |SELECT event_type, CAST(n AS BIGINT) AS n_days,
           |  ROUND(GREATEST(0.0, 1.0
           |    - (CAST(n * rxx - rx * rx AS DOUBLE) / 1e6)
           |      / CAST(n * sxx - sx * sx AS DOUBLE)), 4) AS seasonal_strength
           |FROM agg ORDER BY event_type""".stripMargin),
      doc = "Seasonal strength 1 - Var(resid)/Var(detrended), quantized-exact variances"),

    // Chi-squared independence test: is event type independent of
    // day-of-week? χ² = Σ (O·T − R·C)²/(R·C·T) over the contingency
    // cells, every numerator/denominator an exact BIGINT product cast
    // once — the classical categorical association test joining the
    // correlation (ts_acf/spearman) and entropy (evt_entropy) families.
    "evt_chi2_dow" -> QueryDef(
      build = (s, dir) => {
        val obs = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT) % 7")
              .as("dow"))
          .agg(count(lit(1)).as("o"))
        val rt = obs.groupBy("event_type").agg(sum(col("o")).as("r"))
        val ct = obs.groupBy("dow").agg(sum(col("o")).as("c"))
        val tot = obs.agg(sum(col("o")).as("t"))
        val nR = rt.count; val nC = ct.count
        obs.join(broadcast(rt), "event_type").join(broadcast(ct), "dow")
          .crossJoin(broadcast(tot))
          .select(pow((col("o") * col("t") - col("r") * col("c")).cast("double"), 2)
            ./(col("r").cast("double") * col("c").cast("double") *
              col("t").cast("double")).as("term"))
          .agg(count(lit(1)).as("n_cells"),
            round(sum(col("term")), 6).as("chi2"))
          .select(col("n_cells"),
            lit((nR - 1) * (nC - 1)).cast("long").as("dof"), col("chi2"))
      },
      oracle = Some(
        """WITH obs AS (
          |  SELECT event_type,
          |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) % 7 AS dow,
          |    COUNT(*) AS o
          |  FROM events GROUP BY 1, 2),
          |rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
          |ct AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY 1),
          |tot AS (SELECT SUM(o) AS t FROM obs),
          |cells AS (
          |  SELECT o.event_type, o.dow, o.o, rt.r, ct.c, tot.t,
          |    POW(CAST(o.o * tot.t - rt.r * ct.c AS DOUBLE), 2)
          |      / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE)
          |         * CAST(tot.t AS DOUBLE)) AS term
          |  FROM obs o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
          |  CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
          |    * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof,
          |  ROUND(SUM(term), 6) AS chi2
          |FROM cells""".stripMargin),
      doc = "Chi-squared type x day-of-week independence test, exact integer cell products"),

    // Two-proportion z-test: error rate between the user_id-parity
    // cohorts (the A/B-experiment readout primitive). Counts are exact
    // integers; the pooled-variance z is one identical double tree over
    // them. One scan into a 2-row aggregate — margins broadcast-free.
    "evt_ab_ztest" -> QueryDef(
      build = (s, dir) => {
        val agg = Tables.events(s, dir)
          .groupBy((col("user_id") % 2).as("cohort"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("x"))
        val a = agg.filter(col("cohort") === 0)
          .select(col("n").as("n0"), col("x").as("x0"))
        val b = agg.filter(col("cohort") === 1)
          .select(col("n").as("n1"), col("x").as("x1"))
        a.crossJoin(broadcast(b))
          .select(col("n0"), col("x0"), col("n1"), col("x1"),
            round(col("x0").cast("double") / col("n0").cast("double"), 6).as("p0"),
            round(col("x1").cast("double") / col("n1").cast("double"), 6).as("p1"),
            round((col("x0").cast("double") / col("n0").cast("double") -
              col("x1").cast("double") / col("n1").cast("double")) /
              sqrt(((col("x0") + col("x1")).cast("double") /
                (col("n0") + col("n1")).cast("double")) *
                (lit(1.0) - (col("x0") + col("x1")).cast("double") /
                  (col("n0") + col("n1")).cast("double")) *
                (lit(1.0) / col("n0").cast("double") +
                  lit(1.0) / col("n1").cast("double"))), 6).as("z"))
      },
      oracle = Some(
        """WITH agg AS (
          |  SELECT user_id % 2 AS cohort, COUNT(*) AS n,
          |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x
          |  FROM events GROUP BY 1),
          |w AS (
          |  SELECT a.n AS n0, a.x AS x0, b.n AS n1, b.x AS x1
          |  FROM agg a JOIN agg b ON a.cohort = 0 AND b.cohort = 1)
          |SELECT CAST(n0 AS BIGINT) AS n0, CAST(x0 AS BIGINT) AS x0,
          |  CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
          |  ROUND(CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS p0,
          |  ROUND(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p1,
          |  ROUND((CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)
          |         - CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          |    / SQRT((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
          |      * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
          |      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 6) AS z
          |FROM w""".stripMargin),
      doc = "Two-proportion z-test between id-parity cohorts - the A/B readout primitive"),

    // Benford first-digit audit of order values: observed first-digit
    // distribution vs log10(1 + 1/d) — the data-quality screen for
    // fabricated/synthetic numeric columns (the uniform fixture prices
    // fail it loudly, which is exactly the point). First digit taken
    // from the integer's decimal string — no log10 on the data path.
    "stats_benford" -> QueryDef(
      build = (s, dir) => {
        val obs = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 0)
          .select(expr(
            "CAST(substring(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS STRING), 1, 1) AS INT)")
            .as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("observed"))
        val tot = obs.agg(sum(col("observed")).as("t"))
        obs.crossJoin(broadcast(tot))
          .select(col("digit"), col("observed"),
            round(col("observed").cast("double") / col("t").cast("double"), 6)
              .as("p_obs"),
            round(expr("LN(1.0D + 1.0D / CAST(digit AS DOUBLE)) / LN(10.0D)"), 6)
              .as("p_benford"),
            round(col("observed").cast("double") / col("t").cast("double") -
              expr("LN(1.0D + 1.0D / CAST(digit AS DOUBLE)) / LN(10.0D)"), 6)
              .as("delta"))
          .orderBy("digit")
      },
      oracle = Some(
        """WITH c AS (
          |  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders
          |  WHERE o_totalprice > 0),
          |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit FROM c),
          |obs AS (SELECT digit, COUNT(*) AS o FROM d GROUP BY 1),
          |tot AS (SELECT SUM(o) AS t FROM obs)
          |SELECT digit, CAST(o AS BIGINT) AS observed,
          |  ROUND(CAST(o AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS p_obs,
          |  ROUND(LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0), 6) AS p_benford,
          |  ROUND(CAST(o AS DOUBLE) / CAST(tot.t AS DOUBLE)
          |    - LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0), 6) AS delta
          |FROM obs CROSS JOIN tot ORDER BY digit""".stripMargin),
      doc = "Benford first-digit audit via decimal-string digits - synthetic-data screen"),

    // Two-sample Kolmogorov–Smirnov D between the id-parity cohorts'
    // value distributions — the distribution-equality test next to the
    // mean-difference z (evt_ab_ztest). Fully integer-exact argmax: at
    // each distinct value |F0−F1| is compared as |cum0·n1 − cum1·n0|
    // (exact BIGINT), so the D location is deterministic and only the
    // final reported ratio is a double. The cumulative window runs over
    // the PRE-AGGREGATED per-value frame (value-domain-sized, not
    // event-count-sized — the same collapse skyline_orders uses).
    "stats_ks_test" -> QueryDef(
      build = (s, dir) => {
        val v = Tables.events(s, dir).filter(col("value").isNotNull)
          .select((col("user_id") % 2).as("cohort"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        val n = v.agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n1"))
        val pts = v.groupBy("cents").agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c1"))
        val wCum = Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = pts
          .withColumn("f0", sum(col("c0")).over(wCum))
          .withColumn("f1", sum(col("c1")).over(wCum))
        cum.crossJoin(broadcast(n))
          .withColumn("dnum", abs(col("f0") * col("n1") - col("f1") * col("n0")))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("dnum").desc, col("cents"))))
          .filter(col("rk") === 1)
          .select(col("n0"), col("n1"), col("cents").as("d_at_cents"),
            round(col("dnum").cast("double") /
              (col("n0").cast("double") * col("n1").cast("double")), 6).as("ks_d"))
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT user_id % 2 AS cohort,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
          |  FROM events WHERE value IS NOT NULL),
          |n AS (
          |  SELECT SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS n0,
          |    SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS n1
          |  FROM v),
          |pts AS (
          |  SELECT cents,
          |    SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS c0,
          |    SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS c1
          |  FROM v GROUP BY 1),
          |cum AS (
          |  SELECT cents,
          |    SUM(c0) OVER (ORDER BY cents) AS f0,
          |    SUM(c1) OVER (ORDER BY cents) AS f1
          |  FROM pts),
          |d AS (
          |  SELECT cents, ABS(f0 * n.n1 - f1 * n.n0) AS dnum, n.n0, n.n1
          |  FROM cum CROSS JOIN n),
          |pick AS (
          |  SELECT *, row_number() OVER (ORDER BY dnum DESC, cents) AS rk FROM d)
          |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
          |  CAST(cents AS BIGINT) AS d_at_cents,
          |  ROUND(CAST(dnum AS DOUBLE)
          |        / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6) AS ks_d
          |FROM pick WHERE rk = 1""".stripMargin),
      doc = "Two-sample KS D between cohorts - integer-exact argmax over the value domain"),

    // Hour-of-day activity profile per event type (peak-hour detection) —
    // the finer-grained companion of ts_dow_profile; hour from epoch
    // micros (never locale-dependent extraction), exact integer counts
    // and shares rounded from them.
    "ts_hod_profile" -> QueryDef(
      build = (s, dir) => {
        val hod = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("CAST((unix_micros(ts) div 3600000000) % 24 AS INT)").as("hod"))
          .agg(count(lit(1)).as("n"))
        val tot = hod.groupBy("event_type").agg(sum(col("n")).as("t"))
        hod.join(broadcast(tot), "event_type")
          .select(col("event_type"), col("hod"), col("n"),
            round(col("n").cast("double") / col("t").cast("double"), 6).as("share"))
          .withColumn("peak_rank", row_number().over(Window
            .partitionBy("event_type").orderBy(col("n").desc, col("hod"))).cast("int"))
          .orderBy("event_type", "hod")
      },
      oracle = Some(
        """WITH hod AS (
          |  SELECT event_type,
          |    CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hod,
          |    COUNT(*) AS n
          |  FROM events GROUP BY 1, 2),
          |tot AS (SELECT event_type, SUM(n) AS t FROM hod GROUP BY 1)
          |SELECT h.event_type, h.hod, h.n,
          |  ROUND(CAST(h.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS share,
          |  CAST(row_number() OVER (PARTITION BY h.event_type
          |    ORDER BY h.n DESC, h.hod) AS INT) AS peak_rank
          |FROM hod h JOIN tot USING (event_type)
          |ORDER BY h.event_type, h.hod""".stripMargin),
      doc = "Hour-of-day profile + peak rank per type - epoch-derived hours, never locale"),

    // Spearman rank correlation of daily count vs time per type — the
    // distribution-free monotone-trend test completing the trio with
    // ts_linfit (parametric) and ts_theilsen (robust slope). Defined with
    // MIN-rank ties (rank()), so both rank columns are exact BIGINTs and
    // the whole statistic reduces to the same integer-sum Pearson tree
    // ts_acf uses.
    "ts_spearman" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("event_type")
        val rk = dailyCounts(s, dir).select(col("event_type"),
          row_number().over(w.orderBy("day")).cast("long").as("rt"),
          rank().over(w.orderBy("n")).cast("long").as("rn"))
        rk.groupBy("event_type")
          .agg(count(lit(1)).as("np"),
            sum(col("rt")).as("sx"), sum(col("rn")).as("sy"),
            sum(col("rt") * col("rn")).as("sxy"),
            sum(col("rt") * col("rt")).as("sxx"),
            sum(col("rn") * col("rn")).as("syy"))
          .select(col("event_type"), col("np").cast("long").as("n_days"),
            round((col("np") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("np") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("np") * col("syy") - col("sy") * col("sy")).cast("double")),
              6).as("spearman"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH $sqlDaily,
           |rk AS (
           |  SELECT event_type,
           |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS rt,
           |    CAST(rank() OVER (PARTITION BY event_type ORDER BY n) AS BIGINT) AS rn
           |  FROM daily),
           |agg AS (
           |  SELECT event_type, COUNT(*) AS np, SUM(rt) AS sx, SUM(rn) AS sy,
           |    SUM(rt * rn) AS sxy, SUM(rt * rt) AS sxx, SUM(rn * rn) AS syy
           |  FROM rk GROUP BY 1)
           |SELECT event_type, CAST(np AS BIGINT) AS n_days,
           |  ROUND(CAST(np * sxy - sx * sy AS DOUBLE)
           |        / SQRT(CAST(np * sxx - sx * sx AS DOUBLE)
           |               * CAST(np * syy - sy * sy AS DOUBLE)), 6) AS spearman
           |FROM agg ORDER BY event_type""".stripMargin),
      doc = "Spearman rank correlation (min-rank ties) - distribution-free trend test, integer-exact"),

    // OLS trend line per event type: slope/intercept/r² of daily count vs
    // day index, assembled from exact integer sums (same discipline as
    // ts_acf) — the drift detector next to ts_cusum's level-shift
    // detector. One tiny aggregation over the pre-aggregated series.
    "ts_linfit" -> QueryDef(
      build = (s, dir) => {
        val rn = dailyCounts(s, dir).withColumn("t",
          row_number().over(Window.partitionBy("event_type").orderBy("day"))
            .cast("long"))
        rn.groupBy("event_type")
          .agg(count(lit(1)).as("np"),
            sum(col("t")).as("st"), sum(col("n")).as("sy"),
            sum(col("t") * col("n")).as("sty"),
            sum(col("t") * col("t")).as("stt"),
            sum(col("n") * col("n")).as("syy"))
          .select(col("event_type"), col("np").cast("long").as("n_days"),
            round((col("np") * col("sty") - col("st") * col("sy")).cast("double") /
              (col("np") * col("stt") - col("st") * col("st")).cast("double"), 6)
              .as("slope"),
            round((col("sy").cast("double") -
              (col("np") * col("sty") - col("st") * col("sy")).cast("double") /
                (col("np") * col("stt") - col("st") * col("st")).cast("double") *
                col("st").cast("double")) / col("np").cast("double"), 6)
              .as("intercept"),
            round(pow((col("np") * col("sty") - col("st") * col("sy")).cast("double"), 2) /
              ((col("np") * col("stt") - col("st") * col("st")).cast("double") *
                (col("np") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
              .as("r2"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH $sqlDaily,
           |rn AS (
           |  SELECT event_type, n,
           |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t
           |  FROM daily),
           |agg AS (
           |  SELECT event_type, COUNT(*) AS np, SUM(t) AS st, SUM(n) AS sy,
           |    SUM(t * n) AS sty, SUM(t * t) AS stt, SUM(n * n) AS syy
           |  FROM rn GROUP BY 1)
           |SELECT event_type, CAST(np AS BIGINT) AS n_days,
           |  ROUND(CAST(np * sty - st * sy AS DOUBLE)
           |        / CAST(np * stt - st * st AS DOUBLE), 6) AS slope,
           |  ROUND((CAST(sy AS DOUBLE)
           |         - CAST(np * sty - st * sy AS DOUBLE)
           |           / CAST(np * stt - st * st AS DOUBLE) * CAST(st AS DOUBLE))
           |        / CAST(np AS DOUBLE), 6) AS intercept,
           |  ROUND(POW(CAST(np * sty - st * sy AS DOUBLE), 2)
           |        / (CAST(np * stt - st * st AS DOUBLE)
           |           * CAST(np * syy - sy * sy AS DOUBLE)), 6) AS r2
           |FROM agg ORDER BY event_type""".stripMargin),
      doc = "OLS slope/intercept/r-squared of daily rates from exact integer sums"),

    // Bitwise scalar + aggregate surface: bit_and/bit_or/bit_xor
    // aggregates and masked/shifted sums over event ids — the checksum /
    // id-space-diagnostic family. All-integer end to end.
    "scalar_bitwise_funcs" -> QueryDef(
      build = (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events")
        s.sql(
          """SELECT event_type,
            |  bit_and(event_id) AS all_and, bit_or(event_id) AS all_or,
            |  bit_xor(event_id) AS all_xor,
            |  SUM(event_id & 255) AS sum_low8,
            |  SUM(shiftright(event_id, 8)) AS sum_hi,
            |  COUNT(*) AS n
            |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      oracle = Some(
        """SELECT event_type,
          |  bit_and(event_id) AS all_and, bit_or(event_id) AS all_or,
          |  bit_xor(event_id) AS all_xor,
          |  CAST(SUM(event_id & 255) AS BIGINT) AS sum_low8,
          |  CAST(SUM(event_id >> 8) AS BIGINT) AS sum_hi,
          |  CAST(COUNT(*) AS BIGINT) AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "Bitwise aggregate/scalar coverage: bit_and/or/xor, masked and shifted sums"),

    // Top principal direction of the embedding cloud: 3 power-iteration
    // rounds v←Cv from the e₁ seed over the exact-integer covariance
    // matrix (the emb_dim_cov machinery), normalized at the end. Every
    // matrix·vector product is a PER-ROW in-order fold over one centroid
    // row (aggregate/zip_with ⇄ list_reduce/list_transform) — never a
    // cross-row double sum — so all 3 rounds are bit-reproducible. The
    // C build is one scan + integer aggregation; each round then touches
    // only the 64-row matrix table.
    "emb_pca_power" -> QueryDef(
      build = (s, dir) => {
        val embs = Tables.embeddings(s, dir)
        val ndims = graft.Caches.sessionMemo(s, s"ndims:$dir")(
          embs.select(size(col("embedding"))).head.getInt(0))
        // Exact product sums over the UPPER TRIANGLE only via the fused
        // graft_tri_products kernel, then mirror: IEEE multiplication
        // commutes bit-exactly, so c_ji built from the same (sp, sx, sy,
        // n) equals the oracle's full-square c_ji. Per-dim sums come from
        // a separate 64-group aggregation.
        val quant =
          "transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000D) AS BIGINT))"
        val sp = triPairSums(s, embs, ndims)
        val dimSums = embs
          .select(posexplode(expr(quant)).as(Seq("d", "vq")))
          .groupBy("d").agg(sum(col("vq")).as("sx"))
        val upper = sp
          .join(broadcast(dimSums.select(col("d").as("i"), col("sx").as("sxi"))), "i")
          .join(broadcast(dimSums.select(col("d").as("j"), col("sx").as("sxj"))), "j")
        val covUpper = upper.select(col("i"), col("j"),
          ((col("sp").cast("double") / col("n") -
            (col("sxi").cast("double") / col("n")) *
              (col("sxj").cast("double") / col("n"))) / 1e12).as("c"))
        val cov = covUpper.unionByName(
          covUpper.filter(col("i") =!= col("j"))
            .select(col("j").as("i"), col("i").as("j"), col("c")))
        val crows = graft.Caches.lazyBarrier(cov.groupBy("i")
          .agg(expr("transform(array_sort(collect_list(struct(j, c))), p -> p.c)")
            .as("carr")))
        var v = crows.sparkSession.range(1).select(expr(
          s"transform(sequence(0, ${ndims - 1}), j -> CASE WHEN j = 0 THEN 1.0D ELSE 0.0D END)")
          .as("v"))
        for (_ <- 1 to 3) {
          v = crows.crossJoin(broadcast(v))
            .select(col("i"), expr(
              "aggregate(zip_with(carr, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
              .as("val"))
            .groupBy()
            .agg(expr("transform(array_sort(collect_list(struct(i, val))), p -> p.val)")
              .as("v"))
        }
        v.select(expr(
            "sqrt(aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x))")
            .as("nv"), col("v"))
          .select(col("nv"), posexplode(col("v")).as(Seq("dim", "comp")))
          .select(col("dim"), round(col("comp") / col("nv"), 6).as("component"))
          .orderBy("dim")
      },
      oracle = Some {
        def iterCte(t: Int) =
          s"""v$t AS (
             |  SELECT list(val ORDER BY i) AS v FROM (
             |    SELECT c.i AS i,
             |      list_reduce(list_transform(generate_series(1, len(c.carr)),
             |          j -> c.carr[j] * p.v[j]), (x, y) -> x + y) AS val
             |    FROM crows c CROSS JOIN v${t - 1} p))""".stripMargin
        s"""WITH dims AS (SELECT unnest(generate_series(1,
           |    (SELECT MAX(len(embedding)) FROM embeddings))) AS i),
           |ex AS (
           |  SELECT vec_id, CAST(i AS INT) AS d,
           |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vq
           |  FROM embeddings, dims WHERE i <= len(embedding)),
           |cov AS (
           |  SELECT a.d AS i, b.d AS j,
           |    (CAST(SUM(a.vq * b.vq) AS DOUBLE) / COUNT(*)
           |     - (CAST(SUM(a.vq) AS DOUBLE) / COUNT(*))
           |       * (CAST(SUM(b.vq) AS DOUBLE) / COUNT(*))) / 1e12 AS c
           |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
           |  GROUP BY 1, 2),
           |crows AS (SELECT i, list(c ORDER BY j) AS carr FROM cov GROUP BY i),
           |v0 AS (SELECT list_transform(generate_series(1,
           |    (SELECT MAX(len(embedding)) FROM embeddings)),
           |    j -> CASE WHEN j = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) AS v),
           |${iterCte(1)},
           |${iterCte(2)},
           |${iterCte(3)},
           |nrm AS (SELECT SQRT(list_reduce(list_transform(v, x -> x * x),
           |    (x, y) -> x + y)) AS nv, v FROM v3)
           |SELECT CAST(d.i - 1 AS INT) AS dim, ROUND(n.v[d.i] / n.nv, 6) AS component
           |FROM nrm n CROSS JOIN dims d ORDER BY dim""".stripMargin
      },
      doc = "Top principal direction: 3 bit-reproducible power-iteration rounds over exact-int covariance"),

    // Whitened cosine top-k: standardize every dimension ((v−μ)/σ from
    // the exact-integer stats) then brute-force cosine top-5 for the 10
    // lowest-id query vectors — the stats being USED: whitening removes
    // per-dimension scale bias before similarity. μ/σ live in two
    // broadcast one-row arrays; whitening is a per-row transform; every
    // dot/norm is an in-order fold. The 10-row query side is broadcast
    // (bruteForceTopK's shape) — the corpus is never broadcast.
    "emb_whiten_topk" -> QueryDef(
      build = (s, dir) => {
        val embs = Tables.embeddings(s, dir)
        val quant =
          "transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000D) AS BIGINT))"
        val st = embs.select(posexplode(expr(quant)).as(Seq("d", "vq")))
          .groupBy("d").agg(sum(col("vq")).as("sx"),
            sum(col("vq") * col("vq")).as("sxx"), count(lit(1)).as("n"))
        val stats = st.groupBy()
          .agg(
            expr("""transform(array_sort(collect_list(struct(d,
                  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 AS m))), p -> p.m)""")
              .as("means"),
            expr("""transform(array_sort(collect_list(struct(d,
                  SQRT((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e12) AS sd))),
                  p -> p.sd)""").as("stds"))
        val wv = embs.crossJoin(broadcast(stats))
          .select(col("vec_id"), expr(
            """transform(embedding, (v, j) ->
              |  (CAST(FLOOR(CAST(v AS DOUBLE) * 1000000D) AS BIGINT) / 1e6
              |   - element_at(means, j + 1)) / element_at(stds, j + 1))"""
              .stripMargin).as("w"))
        val q = wv.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("w").as("qw"))
        wv.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            round(expr("aggregate(zip_with(qw, w, (a, b) -> a * b), 0D, (x, y) -> x + y)") /
              (sqrt(expr("aggregate(transform(qw, x -> x * x), 0D, (x, y) -> x + y)")) *
                sqrt(expr("aggregate(transform(w, x -> x * x), 0D, (x, y) -> x + y)"))),
              6).as("cos"))
          .withColumn("rk", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("cos").desc, col("cand_id"))).cast("int"))
          .filter(col("rk") <= 5)
          .orderBy("query_id", "rk")
      },
      oracle = Some(
        """WITH dims AS (SELECT unnest(generate_series(1,
          |    (SELECT MAX(len(embedding)) FROM embeddings))) AS i),
          |ex AS (
          |  SELECT vec_id, CAST(i AS INT) AS d,
          |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vq
          |  FROM embeddings, dims WHERE i <= len(embedding)),
          |st AS (
          |  SELECT d, SUM(vq) AS sx, SUM(vq * vq) AS sxx, COUNT(*) AS n
          |  FROM ex GROUP BY 1),
          |stats AS (
          |  SELECT list(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 ORDER BY d) AS means,
          |    list(SQRT((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
          |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e12) ORDER BY d) AS stds
          |  FROM st),
          |wv AS (
          |  SELECT e.vec_id,
          |    list_transform(generate_series(1, len(e.embedding)),
          |      j -> (CAST(FLOOR(CAST(e.embedding[j] AS DOUBLE) * 1000000) AS BIGINT) / 1e6
          |            - s.means[j]) / s.stds[j]) AS w
          |  FROM embeddings e CROSS JOIN stats s),
          |pairs AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
          |    ROUND(list_reduce(list_transform(generate_series(1, len(q.w)),
          |        j -> q.w[j] * c.w[j]), (x, y) -> x + y)
          |      / (SQRT(list_reduce(list_transform(q.w, x -> x * x), (x, y) -> x + y))
          |         * SQRT(list_reduce(list_transform(c.w, x -> x * x), (x, y) -> x + y))),
          |      6) AS cos
          |  FROM wv q JOIN wv c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
          |SELECT query_id, cand_id, cos, CAST(rk AS INT) AS rk FROM (
          |  SELECT *, row_number() OVER (
          |      PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
          |  FROM pairs) WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin),
      doc = "Whitened brute-force cosine top-5: per-dim standardization from exact-int stats"),

    // Farthest-point coreset: 8 Gonzalez rounds — the diversity-
    // maximizing selection complement to emb_kmeans' density clustering
    // (coreset/data-pruning selection for training mixes). Radii shrink
    // monotonically (the k-center covering property); every round's
    // argmax is deterministic (identical distance doubles from exact
    // integer differences, ties to the lower id). Oracle = 8 unrolled
    // MATERIALIZED CTEs (inlined CTEs re-evaluate predecessors
    // exponentially).
    "emb_coreset_fps" -> QueryDef(
      build = (s, dir) =>
        graft.scale.FarthestPoint.select(Tables.embeddings(s, dir),
            "vec_id", "embedding", k = 8)
          .select(col("rank"), col("vec_id"),
            round(col("radius") / 1e12, 6).as("radius"))
          .orderBy("rank"),
      oracle = Some(graft.scale.FarthestPoint.oracleSql(k = 8)),
      doc = "Farthest-point (k-center) coreset: 8 deterministic Gonzalez rounds"),

    // Maximal Marginal Relevance: 8 greedy rounds trading relevance to a
    // query vector against diversity to the already-selected set
    // (λ = 0.5) — FPS's relevance-aware sibling and the RAG-reranking
    // staple. Same quantized-exact distance folds, ≤k-row broadcasts,
    // vec_id tie-breaks; oracle = unrolled MATERIALIZED CTEs.
    "emb_mmr_select" -> QueryDef(
      build = (s, dir) =>
        graft.scale.MmrSelect.select(Tables.embeddings(s, dir),
            "vec_id", "embedding", k = 8)
          .select(col("rank"), col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy("rank"),
      oracle = Some(graft.scale.MmrSelect.oracleSql(k = 8)),
      doc = "MMR selection: 8 rounds of relevance-vs-diversity greedy picks"),

    // Coreset-diversity evidence: mean/min pairwise distance of the
    // 8-point FPS coreset vs the naive lowest-id-8 baseline — the
    // selection's value measured, not assumed (FPS must win both). All
    // pairwise distances are the same quantized in-order folds; the
    // C(8,2) aggregations are over 28 rounded terms.
    "emb_coreset_diversity" -> QueryDef(
      build = (s, dir) => {
        val embs = Tables.embeddings(s, dir)
        val ev = graft.scale.KMeansLloyd.quantized(embs, "vec_id", "embedding")
        val fps = graft.scale.FarthestPoint.select(embs, "vec_id", "embedding", 8)
          .select("vec_id").join(ev, "vec_id")
        val base = ev.orderBy("vec_id").limit(8)
        def pairDists(d: org.apache.spark.sql.DataFrame) = {
          val a = d.select(col("vec_id").as("ida"), col("vqs").as("va"))
          val b = d.select(col("vec_id").as("idb"), col("vqs").as("vb"))
          a.crossJoin(broadcast(b)).filter(col("ida") < col("idb"))
            .select(round(expr(
              """aggregate(zip_with(va, vb, (a, b) -> pow(CAST(a - b AS DOUBLE), 2D)),
                |  0D, (x, y) -> x + y)""".stripMargin) / 1e12, 6).as("d"))
        }
        def summary(d: org.apache.spark.sql.DataFrame, name: String) =
          pairDists(d).agg(count(lit(1)).as("n_pairs"),
              round(sum(col("d")) / count(lit(1)), 6).as("mean_pair_dist"),
              round(min(col("d")), 6).as("min_pair_dist"))
            .select(lit(name).as("method"), col("n_pairs"),
              col("mean_pair_dist"), col("min_pair_dist"))
        summary(fps, "fps").unionByName(summary(base, "lowest_id"))
          .orderBy("method")
      },
      oracle = Some {
        val d = (e: String, c: String) =>
          s"""list_reduce(list_transform(generate_series(1, len($e.vqs)),
             |    j -> pow(CAST($e.vqs[j] - $c.vqs[j] AS DOUBLE), 2)),
             |  (x, y) -> x + y)""".stripMargin
        val fpsCtes = graft.scale.FarthestPoint.oracleSql(8)
        // reuse the FPS oracle's WITH chain, swap its final projection
        val prefix = fpsCtes.substring(0, fpsCtes.lastIndexOf("SELECT CAST(rank"))
        s"""${prefix.trim.stripSuffix(",")}
           |, base AS MATERIALIZED (SELECT vec_id, vqs FROM ev ORDER BY vec_id LIMIT 8),
           |fps_p AS (
           |  SELECT ROUND(${d("a", "b")} / 1e12, 6) AS d
           |  FROM c8 a JOIN c8 b ON a.vec_id < b.vec_id),
           |base_p AS (
           |  SELECT ROUND(${d("a", "b")} / 1e12, 6) AS d
           |  FROM base a JOIN base b ON a.vec_id < b.vec_id),
           |s AS (
           |  SELECT 'fps' AS method, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |    ROUND(SUM(d) / COUNT(*), 6) AS mean_pair_dist,
           |    ROUND(MIN(d), 6) AS min_pair_dist
           |  FROM fps_p
           |  UNION ALL
           |  SELECT 'lowest_id', CAST(COUNT(*) AS BIGINT),
           |    ROUND(SUM(d) / COUNT(*), 6), ROUND(MIN(d), 6)
           |  FROM base_p)
           |SELECT * FROM s ORDER BY method""".stripMargin
      },
      doc = "FPS coreset vs lowest-id baseline: mean/min pairwise spread, FPS wins both"),

    // Market-basket affinity: part pairs co-ordered in the same order,
    // support ≥ 3, ranked by lift = n_ab·N/(n_a·n_b) — the association-
    // rule primitive. The pair join fans out C(items-per-order, 2) per
    // order (TPC-H ≈ 4 items ⇒ ~6 pairs), never parts² — the same
    // bounded-blocking shape as PMI, keyed by the natural basket.
    "basket_affinity" -> QueryDef(
      build = (s, dir) => {
        // barrier: the distinct basket frame feeds FOUR consumers (the
        // total, the part frequencies, both self-join sides) — without
        // it the distinct's shuffle replays per consumer (round-8 fix:
        // 2.5 s -> ~1.4 s at sf0.1). r13 note: a group-and-enumerate
        // rewrite (collect_set per order + in-group pair HOF, the
        // jaccardPairsCapped shape) was MEASURED SLOWER here (1.7 →
        // 1.9 s): the interpreted nested-transform pair enumeration loses
        // more than the removed self-join saves on TPC-H's ~4-item
        // baskets — the codegen'd join wins at this fan-out.
        val i = graft.Caches.lazyBarrier(Tables.lineitem(s, dir)
          .select("l_orderkey", "l_partkey").distinct())
        val n = i.agg(countDistinct(col("l_orderkey")).as("t"))
        val pf = i.groupBy("l_partkey").agg(count(lit(1)).as("np"))
        val a = i.select(col("l_orderkey"), col("l_partkey").as("pa"))
        val b = i.select(col("l_orderkey"), col("l_partkey").as("pb"))
        a.join(b, Seq("l_orderkey")).filter(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("nab"))
          .filter(col("nab") >= 3)
          .join(broadcast(pf.select(col("l_partkey").as("pa"), col("np").as("na"))), "pa")
          .join(broadcast(pf.select(col("l_partkey").as("pb"), col("np").as("nb"))), "pb")
          .crossJoin(broadcast(n))
          .select(col("pa"), col("pb"), col("nab").as("support"),
            round(col("nab").cast("double") * col("t").cast("double") /
              (col("na").cast("double") * col("nb").cast("double")), 6).as("lift"))
          .orderBy(col("support").desc, col("lift").desc, col("pa"), col("pb"))
          .limit(50)
      },
      oracle = Some(
        """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |n AS (SELECT COUNT(DISTINCT l_orderkey) AS t FROM i),
          |pf AS (SELECT l_partkey, COUNT(*) AS np FROM i GROUP BY 1),
          |pairs AS (
          |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS nab
          |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
          |    AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2),
          |sup AS (
          |  SELECT pa, pb, nab, fa.np AS na, fb.np AS nb
          |  FROM pairs JOIN pf fa ON fa.l_partkey = pa
          |             JOIN pf fb ON fb.l_partkey = pb
          |  WHERE nab >= 3)
          |SELECT pa, pb, CAST(nab AS BIGINT) AS support,
          |  ROUND(CAST(nab AS DOUBLE) * CAST(n.t AS DOUBLE)
          |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS lift
          |FROM sup CROSS JOIN n
          |ORDER BY support DESC, lift DESC, pa, pb LIMIT 50""".stripMargin),
      doc = "Market-basket part affinity: support + lift, basket-bounded pair join"),

    // Stationary distribution of the event-type Markov chain: π ← πP for
    // 10 rounds from uniform, P the row-normalized transition counts
    // evt_transitions exposes — "where does a user's attention settle".
    // The chain is |types|² and tiny at any corpus scale (the heavy part
    // is the one transition-count scan); rounds are lineage-barriered
    // every second step, the pageRank cadence.
    "evt_markov_stationary" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val seq = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull)
        val tm = seq.groupBy(col("event_type").as("i"), col("nxt").as("j"))
          .agg(count(lit(1)).as("c"))
        val rt = tm.groupBy("i").agg(sum(col("c")).as("r"))
        val p = graft.Caches.lazyBarrier(tm.join(rt, "i")
          .select(col("i"), col("j"),
            (col("c").cast("double") / col("r").cast("double")).as("v")))
        // Uniform seed derived from the state count (1/|states|), not a
        // literal — the initial vector is a distribution for ANY number
        // of event types. One-row scalar broadcast, no extra shuffle.
        val nStates = rt.agg(count(lit(1)).cast("double").as("ns"))
        var pi = rt.crossJoin(broadcast(nStates))
          .select(col("i"), (lit(1.0) / col("ns")).as("pv"))
        for (t <- 1 to 10) {
          val next = p.join(pi, "i")
            .groupBy(col("j")).agg(sum(col("v") * col("pv")).as("pv"))
            .select(col("j").as("i"), col("pv"))
          pi = if (t % 2 == 0 || t == 10) graft.Caches.lazyBarrier(next) else next
        }
        pi.select(col("i").as("event_type"), round(col("pv"), 6).as("pi"))
          .orderBy("event_type")
      },
      oracle = Some {
        val iters = (1 to 10).map { t =>
          s"""pi$t AS MATERIALIZED (
             |  SELECT p.j AS i, SUM(p.v * pr.pv) AS pv FROM (
             |    SELECT tm.i, tm.j, CAST(tm.c AS DOUBLE) / CAST(rt.r AS DOUBLE) AS v
             |    FROM tm JOIN rt USING (i)) p
             |  JOIN pi${t - 1} pr ON pr.i = p.i
             |  GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH seq AS (
           |  SELECT user_id, event_type,
           |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           |  FROM events),
           |tm AS (
           |  SELECT event_type AS i, nxt AS j, COUNT(*) AS c FROM seq
           |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
           |rt AS (SELECT i, SUM(c) AS r FROM tm GROUP BY 1),
           |pi0 AS (SELECT i,
           |  CAST(1.0 AS DOUBLE) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM rt) AS pv
           |  FROM rt),
           |$iters
           |SELECT i AS event_type, ROUND(pv, 6) AS pi FROM pi10 ORDER BY i""".stripMargin
      },
      doc = "Markov stationary distribution: 10 unrolled pi <- pi P rounds over the transition chain"),

    // Relational melt: the wide per-type metrics row unpivoted to
    // (event_type, metric, value) via Spark's native Unpivot node (Expand
    // — no shuffle beyond the source aggregation). Oracle replays as
    // UNION ALL, the portable spelling of the same op.
    "unpivot_metrics" -> QueryDef(
      build = (s, dir) => {
        val wide = Tables.events(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n_events"),
            countDistinct(col("user_id")).cast("double").as("n_users"),
            round(dec(sum(dec(col("value")))).cast("double"), 2).as("total_value"))
        wide.unpivot(Array(col("event_type")),
            Array(col("n_events"), col("n_users"), col("total_value")),
            "metric", "value")
          .orderBy("event_type", "metric")
      },
      oracle = Some(
        """WITH wide AS (
          |  SELECT event_type,
          |    CAST(COUNT(*) AS DOUBLE) AS n_events,
          |    CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users,
          |    ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(12,2))
          |          AS DOUBLE), 2) AS total_value
          |  FROM events GROUP BY 1)
          |SELECT event_type, metric, value FROM (
          |  SELECT event_type, 'n_events' AS metric, n_events AS value FROM wide
          |  UNION ALL
          |  SELECT event_type, 'n_users', n_users FROM wide
          |  UNION ALL
          |  SELECT event_type, 'total_value', total_value FROM wide)
          |ORDER BY event_type, metric""".stripMargin),
      doc = "Wide-to-long melt via Spark unpivot, UNION ALL oracle"),

    // Time-weighted average value per user (TWAP): each observation is
    // weighted by how long it "held" — the gap in whole seconds to the
    // user's next event (last event carries no weight). The metric behind
    // price/sensor averaging where plain means over-count bursts. Both
    // Σ(cents·Δsec) and ΣΔsec are exact BIGINTs (seconds, not micros, so
    // the product sum stays far under 2⁶³ at any per-user history), one
    // lead window + one user-key aggregate.
    "evt_twap" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
          .withColumn("nxt", lead(col("ts"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .withColumn("dsec",
            expr("(unix_micros(nxt) - unix_micros(ts)) div 1000000"))
        e.groupBy("user_id")
          .agg(count(lit(1)).as("n_weighted"),
            sum(col("cents") * col("dsec")).as("swc"),
            sum(col("dsec")).as("sw"), sum(col("cents")).as("sc"))
          .filter(col("sw") > 0)
          .select(col("user_id"), col("n_weighted"),
            round(col("swc").cast("double") / col("sw").cast("double"), 4)
              .as("twap_cents"),
            round(col("sc").cast("double") / col("n_weighted").cast("double"), 4)
              .as("mean_cents"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, ts, event_id,
          |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
          |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          |  FROM events WHERE value IS NOT NULL),
          |g AS (
          |  SELECT user_id, cents,
          |    (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS dsec
          |  FROM e WHERE nxt IS NOT NULL),
          |agg AS (
          |  SELECT user_id, COUNT(*) AS n_weighted,
          |    SUM(cents * dsec) AS swc, SUM(dsec) AS sw, SUM(cents) AS sc
          |  FROM g GROUP BY 1)
          |SELECT user_id, CAST(n_weighted AS BIGINT) AS n_weighted,
          |  ROUND(CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE), 4) AS twap_cents,
          |  ROUND(CAST(sc AS DOUBLE) / CAST(n_weighted AS DOUBLE), 4) AS mean_cents
          |FROM agg WHERE sw > 0 ORDER BY user_id""".stripMargin),
      doc = "Time-weighted average value per user - exact integer second-weighted sums"),

    // Per-day error rate with a Wilson 95% interval — the uncertainty
    // band the health dashboard should draw instead of bare rates (Wilson
    // stays inside [0,1] and behaves at small n, unlike the normal
    // interval). Counts are exact; the interval is one identical double
    // tree on both engines with z as a shared literal.
    "evt_error_wilson" -> QueryDef(
      build = (s, dir) => {
        val z = "1.959963984540054"
        val d = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("k"))
        d.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), col("k"),
            round(col("k").cast("double") / col("n").cast("double"), 6).as("rate"),
            expr(
              s"""round((k / CAST(n AS DOUBLE) + $z * $z / (2.0 * n)
                 |  - $z * sqrt((k / CAST(n AS DOUBLE)) * (1.0 - k / CAST(n AS DOUBLE)) / n
                 |              + $z * $z / (4.0 * n * n)))
                 | / (1.0 + $z * $z / n), 6)""".stripMargin).as("wilson_lo"),
            expr(
              s"""round((k / CAST(n AS DOUBLE) + $z * $z / (2.0 * n)
                 |  + $z * sqrt((k / CAST(n AS DOUBLE)) * (1.0 - k / CAST(n AS DOUBLE)) / n
                 |              + $z * $z / (4.0 * n * n)))
                 | / (1.0 + $z * $z / n), 6)""".stripMargin).as("wilson_hi"))
          .orderBy("day")
      },
      oracle = Some {
        val z = "1.959963984540054"
        s"""WITH d AS (
           |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
           |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS k
           |  FROM events GROUP BY 1)
           |SELECT strftime(day, '%Y-%m-%d') AS day,
           |  CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           |  ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
           |  ROUND((k / CAST(n AS DOUBLE) + $z * $z / (2.0 * n)
           |    - $z * SQRT((k / CAST(n AS DOUBLE)) * (1.0 - k / CAST(n AS DOUBLE)) / n
           |                + $z * $z / (4.0 * n * n)))
           |   / (1.0 + $z * $z / n), 6) AS wilson_lo,
           |  ROUND((k / CAST(n AS DOUBLE) + $z * $z / (2.0 * n)
           |    + $z * SQRT((k / CAST(n AS DOUBLE)) * (1.0 - k / CAST(n AS DOUBLE)) / n
           |                + $z * $z / (4.0 * n * n)))
           |   / (1.0 + $z * $z / n), 6) AS wilson_hi
           |FROM d ORDER BY day""".stripMargin
      },
      doc = "Per-day error rate with Wilson 95% CI - exact counts, shared z literal"),

    // Flesch-style readability per document — a corpus quality signal
    // built entirely from integer counts: words (tokens), sentences
    // (1 + terminal punctuation), syllables proxied by vowel runs
    // (regexp_count of [aeiou]+ — the standard cheap estimator). The
    // score is one shared double tree; everything else is exact.
    "txt_readability" -> QueryDef(
      build = (s, dir) => {
        import graft.scale.TextOps
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_words"),
            (size(expr("regexp_extract_all(text, '[.!?]', 0)")).cast("long") + 1L)
              .as("n_sents"),
            size(expr("regexp_extract_all(text, '[aeiou]+', 0)")).cast("long")
              .as("n_syll"))
          .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
            round(lit(206.835d)
              - lit(1.015d) * col("n_words").cast("double") /
                  col("n_sents").cast("double")
              - lit(84.6d) * col("n_syll").cast("double") /
                  col("n_words").cast("double"), 4).as("flesch"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH c AS (
          |  SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          |    CAST(len(regexp_extract_all(text, '[.!?]')) + 1 AS BIGINT) AS n_sents,
          |    CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_syll
          |  FROM documents)
          |SELECT doc_id, n_words, n_sents, n_syll,
          |  ROUND(CAST(206.835 AS DOUBLE)
          |    - CAST(1.015 AS DOUBLE) * CAST(n_words AS DOUBLE)
          |        / CAST(n_sents AS DOUBLE)
          |    - CAST(84.6 AS DOUBLE) * CAST(n_syll AS DOUBLE)
          |        / CAST(n_words AS DOUBLE), 4) AS flesch
          |FROM c ORDER BY doc_id""".stripMargin),
      doc = "Flesch readability from integer counts - vowel-run syllable proxy"),

    // Embedding distribution drift: split the corpus into id-parity
    // halves and measure per-label centroid displacement — the embedding-
    // space companion of stats_jsd_langs (token space). Centroids are
    // rounded from exact BIGINT dim sums onto the 1e-6 grid, so the
    // squared displacement is an exact BIGINT and only the final √ is a
    // double. Tiny (labels × dims) aggregate after one corpus pass.
    "emb_centroid_drift" -> QueryDef(
      build = (s, dir) => {
        val ex = Tables.embeddings(s, dir)
          .select(col("label"), (col("vec_id") % 2).as("h"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .withColumn("vq",
            expr("CAST(ROUND(CAST(v AS DOUBLE) * 1e6, 0) AS BIGINT)"))
        val cent = ex.groupBy("label", "h", "pos")
          .agg(expr(
            "CAST(ROUND(CAST(SUM(vq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT)")
            .as("mq"),
            count(lit(1)).as("n"))
        cent.groupBy("label", "pos")
          .agg(sum(when(col("h") === 0, col("mq"))).as("m0"),
            sum(when(col("h") === 1, col("mq"))).as("m1"),
            max(when(col("h") === 0, col("n"))).as("n0"),
            max(when(col("h") === 1, col("n"))).as("n1"))
          .groupBy("label")
          .agg(max(col("n0")).as("n_even"), max(col("n1")).as("n_odd"),
            sum((col("m0") - col("m1")) * (col("m0") - col("m1"))).as("d2"))
          .select(col("label"), col("n_even"), col("n_odd"),
            round(sqrt(col("d2").cast("double")) / 1e6, 6).as("centroid_drift"))
          .orderBy("label")
      },
      oracle = Some(
        """WITH dims AS (SELECT unnest(generate_series(1,
          |    (SELECT MAX(len(embedding)) FROM embeddings))) AS i),
          |ex AS (
          |  SELECT label, vec_id % 2 AS h, CAST(i - 1 AS INT) AS pos,
          |    CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS vq
          |  FROM embeddings, dims WHERE i <= len(embedding)),
          |cent AS (
          |  SELECT label, h, pos,
          |    CAST(ROUND(CAST(SUM(vq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 0)
          |      AS BIGINT) AS mq,
          |    COUNT(*) AS n
          |  FROM ex GROUP BY 1, 2, 3),
          |w AS (
          |  SELECT label, pos,
          |    SUM(CASE WHEN h = 0 THEN mq END) AS m0,
          |    SUM(CASE WHEN h = 1 THEN mq END) AS m1,
          |    MAX(CASE WHEN h = 0 THEN n END) AS n0,
          |    MAX(CASE WHEN h = 1 THEN n END) AS n1
          |  FROM cent GROUP BY 1, 2)
          |SELECT label, CAST(MAX(n0) AS BIGINT) AS n_even,
          |  CAST(MAX(n1) AS BIGINT) AS n_odd,
          |  ROUND(SQRT(CAST(SUM((m0 - m1) * (m0 - m1)) AS DOUBLE)) / 1e6, 6)
          |    AS centroid_drift
          |FROM w GROUP BY 1 ORDER BY label""".stripMargin),
      doc = "Per-label centroid drift between id-parity halves - exact integer displacement"),

    // ABC inventory classification: parts ranked by revenue, class A =
    // the head covering 80% of cumulative revenue, B to 95%, C the tail —
    // the classic catalog rollup. Revenue is exact integer cents; class
    // boundaries are INTEGER comparisons (cum·5 ≤ total·4 etc.), so no
    // double ever decides a class; the cumulative window runs over the
    // pre-aggregated part domain.
    "orders_abc_analysis" -> QueryDef(
      build = (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .select(col("l_partkey"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
          .groupBy("l_partkey").agg(sum(col("cents")).as("rev"))
        val tot = rev.agg(sum(col("rev")).as("t"))
        val wc = Window.orderBy(col("rev").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, 0)
        rev.withColumn("cum", sum(col("rev")).over(wc))
          .crossJoin(broadcast(tot))
          .withColumn("cls",
            when(col("cum") * 5L <= col("t") * 4L, "A")
              .when(col("cum") * 20L <= col("t") * 19L, "B")
              .otherwise("C"))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("revenue_cents"))
          .crossJoin(broadcast(tot))
          .select(col("cls"), col("n_parts"), col("revenue_cents"),
            round(col("revenue_cents").cast("double") / col("t").cast("double"), 6)
              .as("revenue_share"))
          .orderBy("cls")
      },
      oracle = Some(
        """WITH rev AS (
          |  SELECT l_partkey,
          |    SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS rev
          |  FROM lineitem GROUP BY 1),
          |tot AS (SELECT SUM(rev) AS t FROM rev),
          |c AS (
          |  SELECT l_partkey, rev,
          |    SUM(rev) OVER (ORDER BY rev DESC, l_partkey
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM rev),
          |cls AS (
          |  SELECT CASE WHEN cum * 5 <= t * 4 THEN 'A'
          |              WHEN cum * 20 <= t * 19 THEN 'B'
          |              ELSE 'C' END AS cls, rev
          |  FROM c CROSS JOIN tot)
          |SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
          |  CAST(SUM(rev) AS BIGINT) AS revenue_cents,
          |  ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(tot.t) AS DOUBLE), 6)
          |    AS revenue_share
          |FROM cls CROSS JOIN tot
          |GROUP BY cls ORDER BY cls""".stripMargin),
      doc = "ABC revenue classification - integer class boundaries, part-domain window"),

    // Point-in-time lookup against the SCD2 validity intervals: "which
    // event type was current for each user at time T" for a bounded
    // probe set (four weekly boundaries) — the temporal-table read path
    // that makes scd2_intervals useful. The probe set broadcasts (4
    // rows, the scalar-broadcast BNLJ class the plan audit allows); a
    // large probe stream would route through operators/IntervalJoin
    // instead. Interval containment is half-open [from, to).
    "scd2_asof_lookup" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val changes = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
        val probesDf = {
          import s.implicits._
          Seq("2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29")
            .toDF("probe_date")
            .withColumn("p", to_timestamp(col("probe_date")))
        }
        changes.join(broadcast(probesDf),
            col("ts") <= col("p") &&
              (col("valid_to_ts").isNull || col("valid_to_ts") > col("p")))
          .groupBy("probe_date", "event_type")
          .agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("sum_uids"))
          .orderBy("probe_date", "event_type")
      },
      oracle = Some(
        """WITH ch AS (
          |  SELECT user_id, event_type, ts, event_id,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS prev
          |  FROM events
          |  QUALIFY prev IS NULL OR prev <> event_type),
          |changes AS (
          |  SELECT user_id, event_type, ts,
          |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS valid_to_ts
          |  FROM ch),
          |probes AS (
          |  SELECT unnest(['2024-01-08', '2024-01-15', '2024-01-22',
          |                 '2024-01-29']) AS probe_date)
          |SELECT p.probe_date, c.event_type,
          |  CAST(COUNT(*) AS BIGINT) AS n_users,
          |  CAST(SUM(c.user_id) AS BIGINT) AS sum_uids
          |FROM changes c JOIN probes p
          |  ON c.ts <= CAST(p.probe_date || ' 00:00:00' AS TIMESTAMP)
          | AND (c.valid_to_ts IS NULL
          |      OR c.valid_to_ts > CAST(p.probe_date || ' 00:00:00' AS TIMESTAMP))
          |GROUP BY 1, 2 ORDER BY probe_date, event_type""".stripMargin),
      doc = "SCD2 point-in-time lookup at weekly probes - bounded broadcast, half-open intervals"),

    // Rolling 7-day active users (WAU) per day + the DAU/WAU engagement
    // ratio — the windowed form next to evt_stickiness's DAU/MAU.
    // Distinct-count-over-window can't ride a frame, so the shape is the
    // bounded grid join: distinct (user, day) activity × the day domain
    // with a 0..6-day gap — fan-out ≤ 7 per activity row, keyed by day,
    // never users². Exact integer counts.
    "evt_wau_rolling" -> QueryDef(
      build = (s, dir) => {
        val act = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val days = act.select(col("day").as("d")).distinct()
        // each active (user, day) contributes to the 7 windows ENDING at
        // day..day+6: explode the bounded offset instead of a non-equi
        // day-grid join — O(7N) rows through an equi-shuffle on d, vs the
        // O(N·D) nested-loop the range join degenerates to at scale
        val win = act
          .select(col("user_id"), col("day"),
            explode(sequence(lit(0), lit(6))).as("off"))
          .withColumn("d", date_add(col("day"), col("off")))
        win.groupBy("d")
          .agg(countDistinct(when(col("off") === 0, col("user_id")))
              .as("dau"),
            countDistinct(col("user_id")).as("wau"))
          // restrict to OBSERVED days (day+off can fall past the last
          // active day); the aggregated side is one row per day, the
          // grid is calendar-bounded — broadcast it
          .join(broadcast(days), "d")
          .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau").cast("double"), 6)
              .as("dau_wau_ratio"))
          .orderBy("day")
      },
      oracle = Some(
        """WITH act AS (
          |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
          |days AS (SELECT DISTINCT day AS d FROM act)
          |SELECT strftime(d, '%Y-%m-%d') AS day,
          |  CAST(COUNT(DISTINCT CASE WHEN act.day = d THEN user_id END)
          |    AS BIGINT) AS dau,
          |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
          |  ROUND(CAST(COUNT(DISTINCT CASE WHEN act.day = d THEN user_id END)
          |      AS DOUBLE)
          |    / CAST(COUNT(DISTINCT user_id) AS DOUBLE), 6) AS dau_wau_ratio
          |FROM act JOIN days
          |  ON date_diff('day', act.day, d) >= 0
          | AND date_diff('day', act.day, d) <= 6
          |GROUP BY d ORDER BY day""".stripMargin),
      doc = "Rolling 7-day WAU + DAU/WAU ratio - bounded day-grid join, exact counts"),

    // Weekly growth accounting: every active (user, week) is NEW
    // (first-ever week), RETAINED (also active the prior week) or
    // RESURRECTED (returning after a gap); CHURNED counts arrive one
    // week later (active at w−1, absent at w). The quick ratio
    // (new+resurrected)/churned is the growth-health scalar. Weeks are
    // epoch-week indices (days-since-epoch div 7 — never locale weeks);
    // everything is distinct-set algebra on (user, week) keys, exact
    // counts, and the week domain is calendar-sized.
    "evt_lifecycle_weeks" -> QueryDef(
      build = (s, dir) => {
        val act = Tables.events(s, dir)
          .select(col("user_id"),
            expr("datediff(to_date(ts), DATE'1970-01-01') div 7").as("w"))
          .distinct()
        val first = act.groupBy("user_id").agg(min(col("w")).as("fw"))
        val prev = act.select(col("user_id"), (col("w") + 1L).as("w"),
          lit(1L).as("had_prev"))
        val st = act.join(first, "user_id")
          .join(prev, Seq("user_id", "w"), "left")
          .withColumn("stage",
            when(col("w") === col("fw"), "new")
              .when(col("had_prev").isNotNull, "retained")
              .otherwise("resurrected"))
          .groupBy("w").agg(
            sum(when(col("stage") === "new", 1L).otherwise(0L)).as("n_new"),
            sum(when(col("stage") === "retained", 1L).otherwise(0L)).as("n_retained"),
            sum(when(col("stage") === "resurrected", 1L).otherwise(0L))
              .as("n_resurrected"))
        val maxw = act.agg(max(col("w")).as("mw"))
        val churn = act.select(col("user_id"), (col("w") + 1L).as("w"))
          .join(act, Seq("user_id", "w"), "left_anti")
          .crossJoin(broadcast(maxw)).filter(col("w") <= col("mw"))
          .groupBy("w").agg(count(lit(1)).as("n_churned"))
        st.join(churn, Seq("w"), "full_outer")
          .select(
            expr("date_format(date_add(DATE'1970-01-01', CAST(w * 7 AS INT)), 'yyyy-MM-dd')")
              .as("week_start"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"),
            coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
            coalesce(col("n_churned"), lit(0L)).as("n_churned"))
          .withColumn("quick_ratio",
            when(col("n_churned") > 0,
              round((col("n_new") + col("n_resurrected")).cast("double") /
                col("n_churned").cast("double"), 4)))
          .orderBy("week_start")
      },
      oracle = Some(
        """WITH act AS (
          |  SELECT DISTINCT user_id,
          |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS w
          |  FROM events),
          |fst AS (SELECT user_id, MIN(w) AS fw FROM act GROUP BY 1),
          |st AS (
          |  SELECT a.w,
          |    SUM(CASE WHEN a.w = fst.fw THEN 1 ELSE 0 END) AS n_new,
          |    SUM(CASE WHEN a.w <> fst.fw AND p.user_id IS NOT NULL
          |             THEN 1 ELSE 0 END) AS n_retained,
          |    SUM(CASE WHEN a.w <> fst.fw AND p.user_id IS NULL
          |             THEN 1 ELSE 0 END) AS n_resurrected
          |  FROM act a
          |  JOIN fst ON a.user_id = fst.user_id
          |  LEFT JOIN act p ON p.user_id = a.user_id AND p.w = a.w - 1
          |  GROUP BY 1),
          |mw AS (SELECT MAX(w) AS mw FROM act),
          |churn AS (
          |  SELECT a.w + 1 AS w, COUNT(*) AS n_churned
          |  FROM act a CROSS JOIN mw
          |  LEFT JOIN act n ON n.user_id = a.user_id AND n.w = a.w + 1
          |  WHERE n.user_id IS NULL AND a.w + 1 <= mw.mw
          |  GROUP BY 1)
          |SELECT
          |  strftime(DATE '1970-01-01' + INTERVAL (COALESCE(st.w, churn.w) * 7) DAY,
          |    '%Y-%m-%d') AS week_start,
          |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
          |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
          |  CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
          |  CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned,
          |  CASE WHEN COALESCE(n_churned, 0) > 0
          |       THEN ROUND(CAST(COALESCE(n_new, 0) + COALESCE(n_resurrected, 0)
          |                       AS DOUBLE)
          |                  / CAST(n_churned AS DOUBLE), 4) END AS quick_ratio
          |FROM st FULL OUTER JOIN churn ON st.w = churn.w
          |ORDER BY week_start""".stripMargin),
      doc = "Weekly growth accounting: new/retained/resurrected/churned + quick ratio"),
  )
}
