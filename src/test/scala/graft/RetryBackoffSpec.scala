package graft

import graft.operators.Retry
import org.apache.spark.sql.functions._

/** E2 backoff properties (SURVEY §5.1): deterministic core
  * min(1000*2^(n-1), 60000) plus the jitter bound U(0, 0.1*delay) —
  * reference `service/BaseEventConsumer.java:267-276`.
  */
class RetryBackoffSpec extends SparkSpec {

  private def delayOf(n: Int): Long = {
    import spark.implicits._
    Seq(n).toDF("n").select(Retry.backoffDelayMs(col("n")).as("d"))
      .collect()(0).getLong(0)
  }

  test("E2 deterministic ladder: 1s, 2s, 4s ... capped at 60s") {
    assert(delayOf(1) == 1000L)
    assert(delayOf(2) == 2000L)
    assert(delayOf(3) == 4000L)
    assert(delayOf(6) == 32000L)
    assert(delayOf(7) == 60000L)   // 64s capped
    assert(delayOf(20) == 60000L)
  }

  test("E2 monotone non-decreasing and bounded (property over 1..100)") {
    import spark.implicits._
    val ds = (1 to 100).toDF("n")
      .select(col("n"), Retry.backoffDelayMs(col("n")).as("d"))
      .orderBy("n").collect().map(_.getLong(1))
    assert(ds.forall(d => d >= 1000L && d <= 60000L))
    assert(ds.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("E2 jitter upper bound is a tenth of the delay") {
    import spark.implicits._
    val rows = Seq(1, 3, 7).toDF("n").select(
      Retry.backoffDelayMs(col("n")).as("d"),
      Retry.backoffJitterUpperBound(col("n")).as("j")).collect()
    rows.foreach(r => assert(r.getDouble(1) == r.getLong(0) * 0.1))
  }

  test("E3 retry-header bump replaces retry.count and stamps retry.timestamp") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
      .withColumn("hdrs", map(
        lit("retry.count"), lit("1"),
        lit("event.id"), lit("e-1")))
      .select(graft.operators.Headers.bumpRetryCount(
        col("hdrs"), lit(2), lit("2024-01-01 00:00:00")).as("h"))
    val m = df.collect()(0).getAs[Map[String, String]]("h")
    assert(m("retry.count") == "2")
    assert(m("event.id") == "e-1")
    assert(m("retry.timestamp") == "2024-01-01 00:00:00")
  }

  test("E1 split: retry below max, DLQ at max, topics renamed") {
    import spark.implicits._
    val df = Seq((0, "nnipa.events.tenant.created"), (2, "nnipa.events.auth.login"),
      (3, "nnipa.events.tenant.created"), (4, "other.topic"))
      .toDF("retry_count", "topic")
    val (retries, dlq) = Retry.split(df)
    val retryRows = retries.select("retry_count", "route_topic").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(retryRows == Set(
      (0, "nnipa.events.tenant.created.retry.1"),
      (2, "nnipa.events.auth.login.retry.3")))
    val dlqRows = dlq.select("retry_count", "route_topic").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(dlqRows == Set(
      (3, "nnipa.dlq.tenant.created"),
      (4, "nnipa.dlq.other.topic")))
  }
}
