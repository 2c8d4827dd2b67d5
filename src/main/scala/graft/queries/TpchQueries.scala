package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Star-schema analytics queries (SURVEY §2.8's "free generalization"):
  * joins, grouped aggregates, top-k — the batch query surface the engine
  * exposes beyond the reference's per-record dataflow.
  *
  * Scale notes (100 TB posture):
  *   - dimension tables (region/nation/customer/supplier/part) are
  *     broadcast-joined — no shuffle of the fact table on their account;
  *   - all double sums run through exact DECIMAL so plans can be
  *     re-partitioned/AQE-replanned freely without changing results;
  *   - filters are plain column predicates → pushed to the parquet scan.
  */
object TpchQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
  private def one = lit(1).cast(DecimalType(4, 2))

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q1-style pricing summary — the flagship scan+agg.
    "q1_pricing" -> QueryDef(
      build = (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
                * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
            round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
            round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
            round(sum(dec(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      oracle = Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
          |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
          |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
          |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
          |  COUNT(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "Q1 pricing summary: scan + grouped decimal aggregates"),

    // Q3-style shipping-priority revenue: 3-way join, top 10.
    "q3_revenue" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15 00:00:00")))
        // orders/customer scale with the fact table — no broadcast hint;
        // AQE picks broadcast at small SF and shuffle join at 100 TB.
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      oracle = Some(
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey
          |LIMIT 10""".stripMargin),
      doc = "Q3 revenue top-k: broadcast joins + top-10"),

    // Q5-style regional revenue: 6-way star join.
    "q5_region_revenue" -> QueryDef(
      build = (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        val cust = Tables.customer(s, dir)
        val supp = Tables.supplier(s, dir)
        val nat = Tables.nation(s, dir)
        val reg = Tables.region(s, dir)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      oracle = Some(
        """SELECT r_name, n_name,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY r_name, n_name
          |ORDER BY r_name, n_name""".stripMargin),
      doc = "Q5 star join: broadcast dims, single fact shuffle")
  )
}
