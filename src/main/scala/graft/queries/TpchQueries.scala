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
      doc = "Q5 star join: broadcast dims, single fact shuffle"),

    // Q7-style bilateral volume shipping: supplier-nation x customer-nation
    // revenue by ship year for one nation pair. The nation dims are
    // filtered to the two target nations BEFORE the join, so the inner
    // joins themselves carry the selectivity down to the fact scan.
    "q7_nation_volume" -> QueryDef(
      build = (s, dir) => {
        // A 4-nation set rather than TPC-H's single pair: the synthetic
        // fixture's trade matrix is sparse at sf0.001 and one exact pair
        // can be empty there; any cross-pair within the set is the same
        // bilateral-volume semantics.
        val pair = Seq("NATION_1", "NATION_2", "NATION_11", "NATION_12")
        val n1 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      oracle = Some(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |  CAST(year(l_shipdate) AS INT) AS l_year,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_11', 'NATION_12')
          |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_11', 'NATION_12')
          |  AND n1.n_name <> n2.n_name
          |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      doc = "Q7 bilateral nation trade volume by year"),

    // Q8-style market share: one nation's share of supply volume into a
    // region's customers, per order year. Share is a ratio of two exact
    // decimal sums, so partial-aggregation order cannot move it.
    "q8_market_share" -> QueryDef(
      build = (s, dir) => {
        val custNat = Tables.nation(s, dir)
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
        val suppNat = Tables.nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val reg = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val vol = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir).filter(col("p_type") === "STANDARD")
            .select("p_partkey"), col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(custNat), col("c_nationkey") === col("c_nk"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(suppNat), col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_2", vol)).cast("double")
              / sum(vol).cast("double"), 6).as("mkt_share"))
          .orderBy("o_year")
      },
      oracle = Some(
        """WITH vol AS (
          |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
          |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
          |    n2.n_name AS supp_nation
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
          |  JOIN region ON n1.n_regionkey = r_regionkey
          |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
          |  JOIN part ON l_partkey = p_partkey
          |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD')
          |SELECT o_year,
          |  ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume END) AS DOUBLE)
          |        / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
          |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin),
      doc = "Q8 national market share of a region's supply volume by year"),

    // Q9-style product profit by supplier nation and year. The fixture has
    // no partsupp, so supply cost is modeled as 10% of the part's retail
    // price per unit — all arithmetic stays in exact DECIMAL.
    "q9_product_profit" -> QueryDef(
      build = (s, dir) => {
        val cost = dec(col("p_retailprice")) * dec(col("l_quantity")) *
          lit(0.1).cast(DecimalType(4, 2))
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir).filter(col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) - cost)
            .cast("double").as("profit"))
          .orderBy("nation", "o_year")
      },
      oracle = Some(
        """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
          |         - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(4,2))) AS DOUBLE) AS profit
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%red%'
          |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin),
      doc = "Q9 profit by supplier nation x year (retail-price cost model)"),

    // Q10-style returned-item losers: top-20 customers by returned revenue
    // in one quarter. TakeOrderedAndProject keeps the top-k a bounded heap.
    "q10_returned_items" -> QueryDef(
      build = (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                    col("o_orderdate") < to_timestamp(lit("1997-04-01 00:00:00"))),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20),
      oracle = Some(
        """SELECT c_custkey, c_name, c_acctbal, n_name,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE l_returnflag = 'R'
          |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          |GROUP BY c_custkey, c_name, c_acctbal, n_name
          |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      doc = "Q10 top-20 customers by returned-item revenue in a quarter"),

    // Q14-style promo share: one scalar, ratio of two exact decimal sums
    // over a single month of shipments.
    "q14_promo_revenue" -> QueryDef(
      build = (s, dir) => {
        val vol = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01 00:00:00")) &&
                  col("l_shipdate") < to_timestamp(lit("1997-10-01 00:00:00")))
          .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", vol)).cast("double")
              / sum(vol).cast("double"), 6).as("promo_share"))
      },
      oracle = Some(
        """SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
          |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
          |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6) AS promo_share
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin),
      doc = "Q14 promo revenue share over one ship month"),

    // Q15-style top supplier: max quarterly revenue via a broadcast scalar
    // (the classic view + scalar-subquery decorrelated to one tiny join);
    // equality on the exact DECIMAL revenue, never on a double.
    "q15_top_supplier" -> QueryDef(
      build = (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                  col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
          .groupBy(col("l_suppkey"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .as("total_rev"))
        val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
        rev.crossJoin(broadcast(maxRev))
          .filter(col("total_rev") === col("max_rev"))
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      oracle = Some(
        """WITH rev AS (
          |  SELECT l_suppkey AS supplier_no,
          |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
          |FROM supplier JOIN rev ON s_suppkey = supplier_no
          |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
          |ORDER BY s_suppkey""".stripMargin),
      doc = "Q15 supplier(s) with maximum quarterly revenue"),

    // Q22-style churned high-balance customers: above-average balance in a
    // nation set, no order in the final two years. The average comparison
    // is decorrelated as bal * cnt > sum (exact decimal both sides — a
    // double AVG threshold could flip rows between engines); the recency
    // check is a shuffled anti-join on the customer key.
    "q22_idle_customers" -> QueryDef(
      build = (s, dir) => {
        val sel = Tables.customer(s, dir)
          .filter(col("c_nationkey").isin(1, 2, 3, 10, 17, 21))
          .select(col("c_custkey"), col("c_nationkey"),
            dec(col("c_acctbal")).as("bal"))
        val pos = sel.filter(col("bal") > 0)
          .agg(sum(col("bal")).as("s"), count(lit(1)).as("cnt"))
        val recent = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-06-01 00:00:00")))
          .select("o_custkey")
        sel.crossJoin(broadcast(pos))
          .filter(col("bal") * col("cnt") > col("s"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal")).cast("double").as("totacctbal"))
          .orderBy("c_nationkey")
      },
      oracle = Some(
        """WITH sel AS (
          |  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
          |  FROM customer WHERE c_nationkey IN (1, 2, 3, 10, 17, 21)),
          |pos AS (
          |  SELECT SUM(bal) AS s, COUNT(*) AS cnt FROM sel WHERE bal > 0),
          |recent AS (
          |  SELECT DISTINCT o_custkey FROM orders
          |  WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
          |SELECT c_nationkey, COUNT(*) AS numcust, CAST(SUM(bal) AS DOUBLE) AS totacctbal
          |FROM sel, pos
          |WHERE bal * cnt > s
          |  AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      doc = "Q22 churned high-balance customers by nation (exact-decimal avg threshold)"),

    // Q4-style order-priority checking. The fixture has no
    // l_commitdate/l_receiptdate, so "late" is adapted to a line shipped
    // more than 60 days after the order date — same shape: quarter filter
    // + EXISTS semi-join on a condition spanning both tables.
    "q4_priority_count" -> QueryDef(
      build = (s, dir) => {
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-07-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-10-01 00:00:00")))
        val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      oracle = Some(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin),
      doc = "Q4 order-priority counts over late-shipped orders (EXISTS semi-join)"),

    // Q12-style shipping-mode analysis. No l_shipmode in the fixture, so
    // the grouping key is l_returnflag and "late" is ship > order + 30 d;
    // the CASE-sum high/low priority split is the Q12 signature.
    "q12_late_lines" -> QueryDef(
      build = (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
              .as("low_line_count"))
          .orderBy("l_returnflag")
      },
      oracle = Some(
        """SELECT l_returnflag,
          |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin),
      doc = "Q12 high/low-priority late-line counts by return flag (CASE-sum split)"),

    // Q13-style customer order-count distribution: LEFT join with an
    // ON-clause filter (priority stands in for the comment pattern), then
    // a distribution over the per-customer counts.
    "q13_custdist" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir).select("c_custkey")
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select("o_custkey", "o_orderkey")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      oracle = Some(
        """WITH c_orders AS (
          |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
          |  FROM customer LEFT JOIN orders
          |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
          |  GROUP BY c_custkey)
          |SELECT c_count, COUNT(*) AS custdist
          |FROM c_orders GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      doc = "Q13 customer order-count distribution (filtered LEFT join, double grouping)"),

    // Q16-style supplier counts per part attribute. No partsupp table, so
    // the part-supplier relation is the DISTINCT (l_partkey, l_suppkey)
    // projection of lineitem; negative-balance suppliers stand in for the
    // "complaints" NOT IN exclusion.
    "q16_supplier_cnt" -> QueryDef(
      build = (s, dir) => {
        val ps = Tables.lineitem(s, dir)
          .select("l_partkey", "l_suppkey").distinct()
        val badSup = Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        val p = Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
        ps.join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      oracle = Some(
        """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
          |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
          |JOIN part ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#5'
          |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
      doc = "Q16 distinct-supplier counts per part attribute (lineitem-derived partsupp)"),

    // Q17-style small-quantity revenue. The correlated 0.2*avg(qty)
    // threshold is decorrelated to exact-decimal form (5*qty*cnt < sum)
    // so no double-precision avg can flip a row between engines.
    "q17_small_qty" -> QueryDef(
      build = (s, dir) => {
        val p = Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#23").select("p_partkey")
        val li = Tables.lineitem(s, dir)
        val perPart = li.groupBy(col("l_partkey").as("pp_key"))
          .agg(sum(dec(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("cnt"))
        li.join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .join(perPart, col("pp_key") === col("l_partkey"))
          .filter(dec(col("l_quantity")) * lit(5) * col("cnt") < col("sum_qty"))
          .agg(round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 4)
            .as("avg_yearly"))
      },
      oracle = Some(
        """WITH perpart AS (
          |  SELECT l_partkey AS pp_key,
          |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
          |    COUNT(*) AS cnt
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
          |FROM lineitem
          |JOIN part ON p_partkey = l_partkey
          |JOIN perpart ON pp_key = l_partkey
          |WHERE p_brand = 'Brand#23'
          |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty""".stripMargin),
      doc = "Q17 small-quantity-order revenue (decorrelated exact-decimal avg threshold)"),

    // Q19-style disjunctive-predicate revenue: three OR'd brand/size/
    // quantity bands over the part join — the classic pushdown stressor.
    "q19_disjunctive" -> QueryDef(
      build = (s, dir) => {
        val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
        val li = Tables.lineitem(s, dir)
        val bands =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        li.join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .filter(bands)
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
      },
      oracle = Some(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      doc = "Q19 disjunctive brand/size/quantity-band revenue"),

    // Q21-style suppliers-who-kept-orders-waiting. Adapted to shipdate
    // lateness (no receipt/commit dates): in a finished multi-supplier
    // order, this supplier's line is late while no other supplier's is —
    // the EXISTS + NOT EXISTS double-correlation shape.
    "q21_waiting" -> QueryDef(
      build = (s, dir) => {
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderdate")
        val li = Tables.lineitem(s, dir)
        val l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
        val l2 = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
        val l3 = li.select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"),
          col("l_shipdate").as("ld3"))
        val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
        l1.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .join(l2, col("lo2") === col("l_orderkey") && col("ls2") =!= col("l_suppkey"),
            "left_semi")
          .join(l3, col("lo3") === col("l_orderkey") && col("ls3") =!= col("l_suppkey") &&
            col("ld3") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_anti")
          .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      oracle = Some(
        """SELECT s_name, COUNT(*) AS numwait
          |FROM supplier, lineitem l1, orders
          |WHERE s_suppkey = l1.l_suppkey
          |  AND o_orderkey = l1.l_orderkey
          |  AND o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 20""".stripMargin),
      doc = "Q21 sole-late supplier per finished multi-supplier order (EXISTS/NOT EXISTS)"),

    // Q2-style minimum-cost supplier. No partsupp, so "supply cost" is the
    // minimum extended price ever quoted by that supplier for that part
    // (lineitem-derived); the correlated min subquery and the 4-table
    // dimension chain are the Q2 signature. Decimal cost equality — no
    // double can split the min.
    "q2_min_cost" -> QueryDef(
      build = (s, dir) => {
        val ps = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(dec(col("l_extendedprice"))).as("cost"))
        val eu = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
        val pc = ps.join(broadcast(eu), col("s_suppkey") === col("l_suppkey"))
        val mp = pc.groupBy(col("l_partkey").as("mp_key"))
          .agg(min("cost").as("mincost"))
        val p = Tables.part(s, dir)
          .filter(col("p_size").isin(15, 25, 35)).select("p_partkey")
        pc.join(mp, col("mp_key") === col("l_partkey") && col("cost") === col("mincost"))
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .select(dec(col("s_acctbal")).cast("double").as("acctbal"),
            col("s_name"), col("n_name"), col("p_partkey"))
          .orderBy(col("acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      oracle = Some(
        """WITH ps AS (
          |  SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
          |  FROM lineitem GROUP BY 1, 2),
          |eu AS (
          |  SELECT s_suppkey, s_acctbal, s_name, n_name
          |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
          |pc AS (SELECT ps.*, eu.s_acctbal, eu.s_name, eu.n_name
          |       FROM ps JOIN eu ON eu.s_suppkey = ps.l_suppkey),
          |mp AS (SELECT l_partkey, MIN(cost) AS mincost FROM pc GROUP BY 1)
          |SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
          |  s_name, n_name, p_partkey
          |FROM pc JOIN mp ON pc.l_partkey = mp.l_partkey AND pc.cost = mp.mincost
          |JOIN part ON p_partkey = pc.l_partkey
          |WHERE p_size IN (15, 25, 35)
          |ORDER BY acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin),
      doc = "Q2 min-cost supplier per sized part (lineitem-derived costs, correlated min)"),

    // Q11-style important stock. Share threshold is RELATIVE (a part
    // holding > 3x the average share), so the predicate is SF-invariant —
    // TPC-H's fixed fraction divided by SF is exactly this normalization.
    // value*np and 3*t are exact decimals; no double threshold.
    "q11_important_parts" -> QueryDef(
      build = (s, dir) => {
        val natSup = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
              .filter(col("n_name").isin("NATION_3", "NATION_7"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val vals = Tables.lineitem(s, dir)
          .join(broadcast(natSup), col("s_suppkey") === col("l_suppkey"))
          .groupBy("l_partkey")
          .agg(sum(dec(col("l_extendedprice"))).as("value"))
        val tot = vals.agg(sum("value").as("t"), count(lit(1)).as("np"))
        vals.crossJoin(broadcast(tot))
          .filter(col("value") * col("np") > col("t") * 3)
          .select(col("l_partkey").as("p_partkey"),
            col("value").cast("double").as("value"))
          .orderBy(col("value").desc, col("p_partkey"))
      },
      oracle = Some(
        """WITH val AS (
          |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
          |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  WHERE n_name IN ('NATION_3', 'NATION_7') GROUP BY 1),
          |tot AS (SELECT SUM(value) AS t, COUNT(*) AS np FROM val)
          |SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
          |FROM val, tot WHERE value * np > 3 * t
          |ORDER BY value DESC, p_partkey""".stripMargin),
      doc = "Q11 important parts: nation-supplied value above 3x the average share"),

    // Q20-style excess suppliers: a supplier holding > 10% of a 'small'
    // part's total shipped quantity, restricted to two regions — the
    // nested-aggregate threshold + semi-join chain of Q20 (availqty
    // stands in as shipped quantity; no partsupp in the fixture).
    "q20_excess_suppliers" -> QueryDef(
      build = (s, dir) => {
        val smallParts = Tables.part(s, dir)
          .filter(col("p_name").like("small%")).select("p_partkey")
        val sp = Tables.lineitem(s, dir)
          .join(broadcast(smallParts), col("p_partkey") === col("l_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(dec(col("l_quantity"))).as("qty"))
        val pt = sp.groupBy(col("l_partkey").as("pt_key"))
          .agg(sum("qty").as("total"))
        val regSup = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)
              .filter(col("r_name").isin("AFRICA", "EUROPE"))),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name")
        sp.join(pt, col("pt_key") === col("l_partkey"))
          .filter(col("qty") * 10 > col("total"))
          .join(broadcast(regSup), col("s_suppkey") === col("l_suppkey"))
          .select("s_name").distinct()
          .orderBy("s_name")
      },
      oracle = Some(
        """WITH sp AS (
          |  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
          |  FROM lineitem JOIN part ON p_partkey = l_partkey
          |  WHERE p_name LIKE 'small%' GROUP BY 1, 2),
          |pt AS (SELECT l_partkey, SUM(qty) AS total FROM sp GROUP BY 1)
          |SELECT DISTINCT s_name FROM sp JOIN pt USING (l_partkey)
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE qty * 10 > total AND r_name IN ('AFRICA', 'EUROPE')
          |ORDER BY s_name""".stripMargin),
      doc = "Q20 excess suppliers: >10% of a small part's shipped quantity, two regions")
  )
}
