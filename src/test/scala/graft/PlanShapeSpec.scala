package graft

import graft.operators.Envelope
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the 100 TB levers must actually appear
  * in the plan, not just in comments: bucketed co-located joins (no
  * shuffle), partition pruning, filter pushdown.
  */
class PlanShapeSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val env = Envelope.withEnvelope(Tables.events(spark, sf()))
      env.select("event_id", "tenant_id", "value")
        .write.mode("overwrite").bucketBy(8, "tenant_id").sortBy("tenant_id")
        .option("path", s"$wh/t_left").saveAsTable("t_left")
      env.select(col("tenant_id"), col("event_type"))
        .write.mode("overwrite").bucketBy(8, "tenant_id").sortBy("tenant_id")
        .option("path", s"$wh/t_right").saveAsTable("t_right")

      val joined = spark.table("t_left").join(spark.table("t_right"), "tenant_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS t_left")
      spark.sql("DROP TABLE IF EXISTS t_right")
    }
  }

  test("partition pruning: event-type filter prunes partitioned scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Envelope.withEnvelope(Tables.events(spark, sf()))
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(2000))
    assert(scan.contains("event_type"), scan.take(2000))
    // only the click partition's rows come back
    val total = Envelope.withEnvelope(Tables.events(spark, sf()))
      .filter(col("event_type") === "click").count()
    assert(q.count() == total)
  }

  test("predicate pushdown reaches the parquet scan for q1") {
    val plan = SparkEntry.registry("q1_pricing").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan.take(2000))
  }
}
