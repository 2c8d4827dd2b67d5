package graft.queries

import graft.QueryDef
import graft.operators.Envelope
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function and set-operation surface (SURVEY §2.8): the string /
  * date-time / set primitives the reference uses imperatively, exercised as
  * hash-checked columns. Functions chosen for exact cross-engine parity
  * (no locale- or week-numbering-sensitive ops).
  */
object ScalarQueries {

  private val cte = Envelope.oracleCte

  private def env(s: SparkSession, dir: String): DataFrame =
    Envelope.withEnvelope(Tables.events(s, dir))

  val defs: Map[String, QueryDef] = Map(

    "scalar_string_funcs" -> QueryDef(
      build = (s, dir) =>
        env(s, dir).filter(col("event_id") < 200)
          .select(
            col("event_id"),
            substring(col("topic"), 1, 12).as("sub"),
            upper(col("event_type")).as("up"),
            regexp_replace(col("topic"), "\\.", "/").as("rep"),
            col("topic").startsWith("nnipa").as("starts"),
            col("topic").endsWith("recorded").as("ends"),
            reverse(col("event_type")).as("rev"),
            lpad(col("event_id").cast("string"), 8, "0").as("padded"),
            expr("split_part(topic, '.', 2)").as("second_seg"),
            length(col("source_service")).as("svc_len"),
            concat_ws("|", col("event_type"), col("tenant_id")).as("joined"))
          .orderBy("event_id"),
      oracle = Some(
        s"""$cte
           |SELECT event_id,
           |  substring(topic, 1, 12) AS sub,
           |  upper(event_type) AS up,
           |  regexp_replace(topic, '\\.', '/', 'g') AS rep,
           |  starts_with(topic, 'nnipa') AS starts,
           |  ends_with(topic, 'recorded') AS ends,
           |  reverse(event_type) AS rev,
           |  lpad(CAST(event_id AS STRING), 8, '0') AS padded,
           |  split_part(topic, '.', 2) AS second_seg,
           |  length(source_service) AS svc_len,
           |  concat_ws('|', event_type, tenant_id) AS joined
           |FROM env WHERE event_id < 200 ORDER BY event_id""".stripMargin),
      doc = "String scalar surface: substring/replace/pad/split/affix tests"),

    "scalar_datetime_funcs" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val minTs = e.agg(min("ts").as("min_ts"))
        e.crossJoin(broadcast(minTs))
          .filter(col("event_id") < 200)
          .select(
            col("event_id"),
            unix_millis(col("ts")).as("epoch_ms"),
            year(col("ts")).as("y"),
            month(col("ts")).as("mo"),
            dayofmonth(col("ts")).as("d"),
            hour(col("ts")).as("h"),
            minute(col("ts")).as("mi"),
            (col("ts") + expr("INTERVAL 90 MINUTE")).as("plus_90m"),
            date_trunc("day", col("ts")).as("day_start"),
            ((unix_millis(col("ts")) - unix_millis(col("min_ts"))) / 1000)
              .cast("long").as("secs_since_start"))
          .orderBy("event_id")
      },
      oracle = Some(
        s"""$cte, m AS (SELECT min(ts) AS min_ts FROM env)
           |SELECT event_id,
           |  epoch_ms(ts) AS epoch_ms,
           |  CAST(year(ts) AS INT) AS y,
           |  CAST(month(ts) AS INT) AS mo,
           |  CAST(day(ts) AS INT) AS d,
           |  CAST(hour(ts) AS INT) AS h,
           |  CAST(minute(ts) AS INT) AS mi,
           |  ts + INTERVAL 90 MINUTE AS plus_90m,
           |  date_trunc('day', ts) AS day_start,
           |  (epoch_ms(ts) - epoch_ms(min_ts)) // 1000 AS secs_since_start
           |FROM env, m WHERE event_id < 200 ORDER BY event_id""".stripMargin),
      doc = "Date-time scalar surface: epoch, fields, interval arithmetic"),

    "set_ops_tenants" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val purchasers = e.filter(col("event_type") === "purchase")
          .select("tenant_id").distinct()
        val erroring = e.filter(col("event_type") === "error")
          .select("tenant_id").distinct()
        purchasers.intersect(erroring).withColumn("op", lit("both"))
          .unionByName(purchasers.except(erroring).withColumn("op", lit("purchase_only")))
          .orderBy("op", "tenant_id")
      },
      oracle = Some(
        s"""$cte, purchasers AS (
           |  SELECT DISTINCT tenant_id FROM env WHERE event_type = 'purchase'),
           |erroring AS (
           |  SELECT DISTINCT tenant_id FROM env WHERE event_type = 'error')
           |SELECT tenant_id, 'both' AS op
           |FROM (SELECT tenant_id FROM purchasers INTERSECT SELECT tenant_id FROM erroring)
           |UNION ALL
           |SELECT tenant_id, 'purchase_only' AS op
           |FROM (SELECT tenant_id FROM purchasers EXCEPT SELECT tenant_id FROM erroring)
           |ORDER BY op, tenant_id""".stripMargin),
      doc = "Set operations: INTERSECT / EXCEPT over derived tenant sets"),

    // Bag-semantics set operations: Spark's native intersectAll/exceptAll
    // against SQL INTERSECT ALL / EXCEPT ALL — multiplicities matter
    // (min(m,n) copies intersect; m-n copies survive the except). Run over
    // per-user daily event-type bags so duplicates genuinely occur.
    "set_ops_bag" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.events(s, dir)
        def bag(t: String) = e.filter(col("event_type") === t &&
            to_date(col("ts")) < lit("2024-01-16"))
          .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
        val clicks = bag("click")
        val views = bag("view")
        clicks.intersectAll(views).withColumn("op", lit("both"))
          .unionByName(clicks.exceptAll(views).withColumn("op", lit("click_surplus")))
          .groupBy("op", "user_id")
          .agg(count(lit(1)).as("n"))
          .orderBy("op", "user_id")
      },
      oracle = Some(
        """WITH clicks AS (
          |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events
          |  WHERE event_type = 'click' AND CAST(ts AS DATE) < DATE '2024-01-16'),
          |views AS (
          |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events
          |  WHERE event_type = 'view' AND CAST(ts AS DATE) < DATE '2024-01-16'),
          |both_rows AS (SELECT * FROM clicks INTERSECT ALL SELECT * FROM views),
          |surplus AS (SELECT * FROM clicks EXCEPT ALL SELECT * FROM views)
          |SELECT op, user_id, CAST(COUNT(*) AS BIGINT) AS n FROM (
          |  SELECT user_id, 'both' AS op FROM both_rows
          |  UNION ALL
          |  SELECT user_id, 'click_surplus' AS op FROM surplus)
          |GROUP BY op, user_id ORDER BY op, user_id""".stripMargin),
      doc = "Bag-semantics INTERSECT ALL / EXCEPT ALL with multiplicity counts"),

    // Array / higher-order-function surface: build a per-order sorted
    // quantity array, then exercise aggregate (fold), filter, transform,
    // slice, zip_with and reverse — all over exact integers, so the two
    // engines' results are identical by construction. The collect_list
    // is bounded by lines-per-order (~7), not data volume.
    "scalar_array_funcs" -> QueryDef(
      build = (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_orderkey") % 100 === 0)
          .groupBy("l_orderkey")
          .agg(sort_array(collect_list(col("l_quantity").cast("int"))).as("arr"))
          .select(col("l_orderkey"),
            size(col("arr")).as("n"),
            expr("aggregate(arr, 0L, (a, x) -> a + x)").as("total"),
            expr("size(filter(arr, x -> x > 25))").as("n_big"),
            expr("array_max(transform(arr, x -> x * 2))").as("doubled_max"),
            expr("aggregate(slice(arr, 1, 3), 0L, (a, x) -> a + x)").as("low3_sum"),
            expr("""aggregate(zip_with(arr, reverse(arr),
                   (a, b) -> cast(a AS bigint) * b), 0L, (acc, x) -> acc + x)""")
              .as("pal_dot"))
          .orderBy("l_orderkey"),
      oracle = Some(
        """WITH arrs AS (
          |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS arr
          |  FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey)
          |SELECT l_orderkey, CAST(len(arr) AS INT) AS n,
          |  CAST(list_aggregate(arr, 'sum') AS BIGINT) AS total,
          |  CAST(len(list_filter(arr, x -> x > 25)) AS INT) AS n_big,
          |  CAST(list_max(list_transform(arr, x -> x * 2)) AS INT) AS doubled_max,
          |  CAST(list_aggregate(list_slice(arr, 1, 3), 'sum') AS BIGINT) AS low3_sum,
          |  CAST(list_aggregate(list_transform(list_zip(arr, list_reverse(arr)),
          |    s -> s[1] * s[2]), 'sum') AS BIGINT) AS pal_dot
          |FROM arrs ORDER BY l_orderkey""".stripMargin),
      doc = "Array + higher-order functions: fold/filter/transform/zip_with on exact ints")
  )
}
