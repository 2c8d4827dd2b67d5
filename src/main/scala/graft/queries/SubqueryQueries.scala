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
