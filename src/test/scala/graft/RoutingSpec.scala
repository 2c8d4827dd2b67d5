package graft

import graft.operators.Routing
import org.apache.spark.sql.functions._

/** Executable EventSubscription semantics (model/EventSubscription.java:15-24). */
class RoutingSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "nnipa.events.purchase.recorded", "purchase", 120.0, 0),
      (2L, "nnipa.events.purchase.recorded", "purchase", 10.0, 1),
      (3L, "nnipa.events.purchase.recorded", "refund", 120.0, 2),
      (4L, "nnipa.events.click.recorded", "click", 1.0, 3))
      .toDF("event_id", "topic", "event_type", "value", "retry_count")
  }

  test("subscription filters by topic, event type, and SQL predicate") {
    val sub = Routing.Subscription("s1", "svc-billing",
      "nnipa.events.purchase.recorded", "purchase", "value >= 50.0")
    val got = Routing.applySubscription(fixture, sub).collect()
    assert(got.map(_.getAs[Long]("event_id")).toSeq == Seq(1L))
    assert(got.head.getAs[String]("subscription_id") == "s1")
    assert(got.head.getAs[String]("subscriber_service") == "svc-billing")
    // no consumerConfig -> derived default group id
    assert(got.head.getAs[String]("group_id") == "svc-billing-group")
  }

  test("wildcard event type subscribes to the whole topic") {
    val sub = Routing.Subscription("s2", "svc-any",
      "nnipa.events.purchase.recorded", "*")
    val ids = Routing.applySubscription(fixture, sub)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("inactive subscription matches nothing; config group id wins") {
    val cfg = Routing.ConsumerGroupConfig("custom-cg", "nnipa.events.click.recorded")
    val inactive = Routing.Subscription("s3", "svc-off",
      "nnipa.events.click.recorded", "click", active = false,
      consumerConfig = Some(cfg))
    assert(Routing.applySubscription(fixture, inactive).isEmpty)
    assert(inactive.groupId == "custom-cg")
  }
}
