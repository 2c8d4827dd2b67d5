package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Subquery surface (SURVEY §2.8 generalization): semi-join IN subqueries
  * with HAVING, and correlated scalar subqueries — shapes Catalyst
  * decorrelates into joins, which is precisely what must keep working at
  * 100 TB (a per-row re-execution would not).
  */
object SubqueryQueries {

  private def dec(c: Column) = c.cast(DecimalType(12, 2))

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q6-style: single-pass filtered aggregate.
    "q6_forecast_revenue" -> QueryDef(
      build = (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                  col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
                  col("l_discount").between(0.05, 0.07) &&
                  col("l_quantity") < 24)
          .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n")),
      oracle = Some(
        """SELECT
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |  AND l_discount BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin),
      doc = "Q6 filtered single-pass aggregate"),

    // TPC-H Q18-style: IN subquery with HAVING — large-quantity orders.
    "q18_large_orders" -> QueryDef(
      build = (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderkey, o_orderdate,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
            |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            |WHERE o_orderkey IN (
            |  SELECT l_orderkey FROM lineitem
            |  GROUP BY l_orderkey
            |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180)
            |GROUP BY o_orderkey, o_orderdate
            |ORDER BY o_orderkey""".stripMargin)
      },
      oracle = Some(
        """SELECT o_orderkey, o_orderdate,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE o_orderkey IN (
          |  SELECT l_orderkey FROM lineitem
          |  GROUP BY l_orderkey
          |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180)
          |GROUP BY o_orderkey, o_orderdate
          |ORDER BY o_orderkey""".stripMargin),
      doc = "Q18 IN-subquery with HAVING (decorrelated to a semi-join)"),

    // Anti-join: consumer groups whose offsets touch NO visible topic of
    // interest (complement of A10's semi-join).
    "a10_orphan_groups" -> QueryDef(
      build = (s, dir) => {
        val e = graft.operators.Envelope.withEnvelope(Tables.events(s, dir))
        val groupOffsets = e.select(
          concat(lit("cg-"), (col("user_id") % 10).cast("string")).as("grp"),
          col("topic")).distinct()
        val topics = graft.operators.Routing.visibleTopics(e)
          .filter(col("topic").contains("purchase") || col("topic").contains("signup"))
        groupOffsets.join(topics, Seq("topic"), "left_anti")
          .select("grp", "topic").distinct()
          .orderBy("grp", "topic")
      },
      oracle = Some(
        s"""${graft.operators.Envelope.oracleCte}, group_offsets AS (
           |  SELECT DISTINCT 'cg-' || CAST(user_id % 10 AS STRING) AS grp, topic FROM env),
           |topics AS (
           |  SELECT DISTINCT topic FROM env
           |  WHERE topic NOT LIKE '\\_%' ESCAPE '\\'
           |    AND (topic LIKE '%purchase%' OR topic LIKE '%signup%'))
           |SELECT grp, topic FROM group_offsets
           |WHERE topic NOT IN (SELECT topic FROM topics)
           |ORDER BY grp, topic""".stripMargin),
      doc = "Anti-join complement of A10 (left_anti)"),

    // Outer-join surface: per-customer order counts keeping order-less
    // customers (left outer + coalesce).
    "join_outer_customers" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir)
        val ord = Tables.orders(s, dir)
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey", "c_mktsegment")
          .agg(count(col("o_orderkey")).as("n_orders"),
               coalesce(sum(dec(col("o_totalprice"))).cast("double"), lit(0.0))
                 .as("total_spent"))
          .orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey, c_mktsegment,
          |  COUNT(o_orderkey) AS n_orders,
          |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS total_spent
          |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey, c_mktsegment
          |ORDER BY c_custkey""".stripMargin),
      doc = "Left-outer join keeping order-less customers"),

    // Correlated scalar subquery: customers above their nation's average
    // balance (decimal-exact average for cross-engine determinism).
    "corr_above_nation_avg" -> QueryDef(
      build = (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer")
        s.sql(
          """SELECT c_custkey, c_nationkey, c_acctbal
            |FROM customer c
            |WHERE c_acctbal > (
            |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
            |ORDER BY c_custkey""".stripMargin)
      },
      oracle = Some(
        """SELECT c_custkey, c_nationkey, c_acctbal
          |FROM customer c
          |WHERE c_acctbal > (
          |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
          |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin),
      doc = "Correlated scalar subquery (decorrelated to an aggregate join)")
  )
}
