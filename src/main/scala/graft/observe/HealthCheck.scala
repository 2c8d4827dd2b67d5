package graft.observe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Health evaluation (SURVEY §7.1 observe/; reference `checkHealth`,
  * `service/TopicManagementService.java:493-566` +
  * `health/EventStreamingHealthIndicator.java:140-146`): source
  * reachability, total consumer lag vs thresholds, per-topic detail.
  */
object HealthCheck {

  val WarnLag = 10000L        // EventStreamingHealthIndicator.java:144
  val UnhealthyLag = 100000L  // TopicManagementService.java:554

  final case class Report(status: String, totalLag: Long, topicsChecked: Long,
                          worstTopic: String, worstTopicLag: Long)

  /** Evaluates a lag frame (topic, lag columns) into one health report.
    * The aggregation is a single pass; thresholds mirror the reference.
    */
  def evaluate(lagFrame: DataFrame,
               warnLag: Long = WarnLag, unhealthyLag: Long = UnhealthyLag): Report = {
    val row = lagFrame.agg(
        sum("lag").as("total_lag"),
        count(lit(1)).as("topics"),
        max_by(col("topic"), col("lag")).as("worst_topic"),
        max("lag").as("worst_lag"))
      .collect()(0)
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val status =
      if (total > unhealthyLag) "UNHEALTHY"
      else if (total > warnLag) "WARN"
      else "OK"
    Report(status, total, row.getLong(1),
      if (row.isNullAt(2)) "" else row.getString(2),
      if (row.isNullAt(3)) 0L else row.getLong(3))
  }
}
