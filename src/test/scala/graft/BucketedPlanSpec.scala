package graft

import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._

/** Pins the whole point of bucketing: joins and aggregations on the bucket
  * key plan with NO Exchange — the shuffle happened once, at write time.
  */
class BucketedPlanSpec extends SparkSpec {

  private def withNoBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
  }

  test("co-bucketed join and bucket-key aggregation plan with zero Exchange") {
    Bucketing.writeBucketed(
      Tables.orders(spark, sf()).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_bkt", "o_orderkey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf())
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "lineitem_bkt", "o_orderkey", buckets = 4)

    withNoBroadcast {
      val joined = Bucketing.coLocatedJoin(spark, "orders_bkt", "lineitem_bkt", "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must not shuffle:\n${plan.take(2500)}")
      // and it still computes the right thing
      val viaShuffle = Tables.orders(spark, sf())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .join(Tables.lineitem(spark, sf())
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")), "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      assert(joined.exceptAll(viaShuffle).isEmpty && viaShuffle.exceptAll(joined).isEmpty)
    }
  }

  test("a non-bucketed copy of the same join does shuffle (control)") {
    withNoBroadcast {
      val plan = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
        .join(Tables.lineitem(spark, sf())
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")), "o_orderkey")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), s"control join should shuffle:\n${plan.take(1500)}")
    }
  }
}
