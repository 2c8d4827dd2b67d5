package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Topic routing and listing (SURVEY §2.3 P4-P6, §2.2 F8).
  *
  * Reference: `model/EventRoutingRule.java:16-24` declares
  * (sourceTopic -> targetTopic, condition, transformations) — the reference
  * ships the model with no engine; here a rule is a real executable stage.
  */
object Routing {

  /** P4: declarative routing rule — filter by `condition`, project
    * `transformations`, stamp the target topic. Multi-route fan-out is a
    * union of applied rules (the Kafka sink reads the per-row `topic` col).
    */
  final case class RoutingRule(sourceTopic: String, targetTopic: String,
                               condition: String, transformations: Seq[String])

  def applyRule(df: DataFrame, rule: RoutingRule): DataFrame = {
    val base = df.filter(col("topic") === rule.sourceTopic).filter(expr(rule.condition))
    val projected = if (rule.transformations.isEmpty) base
                    else base.selectExpr(rule.transformations: _*)
    projected.withColumn("topic", lit(rule.targetTopic))
  }

  /** Consumer-group tuning knobs carried by a subscription
    * (`model/ConsumerGroupConfig.java:15-24`) — data for the consumer
    * launcher, not evaluated by the engine.
    */
  final case class ConsumerGroupConfig(groupId: String, topic: String,
                                       consumerCount: Int = 1,
                                       autoCommit: Boolean = false,
                                       offsetReset: String = "earliest",
                                       maxPollRecords: Int = 500,
                                       sessionTimeoutMs: Long = 30000L,
                                       heartbeatIntervalMs: Long = 10000L)

  /** Executable EventSubscription (`model/EventSubscription.java:15-24`):
    * the reference declares the model with no engine behind it; here
    * applying one yields the subscriber's filtered view. `eventType`
    * `"*"` subscribes to every type; `filter` is a SQL predicate over the
    * event columns.
    */
  final case class Subscription(subscriptionId: String, subscriberService: String,
                                topic: String, eventType: String,
                                filter: String = "true", active: Boolean = true,
                                consumerConfig: Option[ConsumerGroupConfig] = None) {
    def groupId: String =
      consumerConfig.map(_.groupId).getOrElse(s"$subscriberService-group")
  }

  /** Apply one subscription: topic + event-type + predicate filter, the
    * subscription identity and consumer group stamped per row (what a
    * consumer launcher needs to run it). An INACTIVE subscription matches
    * nothing — same plan shape, empty view.
    */
  def applySubscription(df: DataFrame, sub: Subscription): DataFrame = {
    val typed =
      if (sub.eventType == "*") df.filter(col("topic") === sub.topic)
      else df.filter(col("topic") === sub.topic)
             .filter(col("event_type") === sub.eventType)
    val matched =
      (if (sub.active) typed.filter(expr(sub.filter)) else typed.filter(lit(false)))
    matched
      .withColumn("subscription_id", lit(sub.subscriptionId))
      .withColumn("subscriber_service", lit(sub.subscriberService))
      .withColumn("group_id", lit(sub.groupId))
  }

  /** F8: drop Kafka-internal topics (leading underscore), sort names
    * (`service/TopicManagementService.java:135-150`).
    */
  def visibleTopics(df: DataFrame, topicCol: String = "topic"): DataFrame =
    df.select(col(topicCol)).distinct()
      .filter(!col(topicCol).startsWith("_"))
      .orderBy(col(topicCol))
}
