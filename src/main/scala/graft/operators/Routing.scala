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

  /** F8: drop Kafka-internal topics (leading underscore), sort names
    * (`service/TopicManagementService.java:135-150`).
    */
  def visibleTopics(df: DataFrame, topicCol: String = "topic"): DataFrame =
    df.select(col(topicCol)).distinct()
      .filter(!col(topicCol).startsWith("_"))
      .orderBy(col(topicCol))
}
