package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error handling / retry / DLQ control flow (SURVEY §2.5 E1-E5, §2.3 P5/P6).
  *
  * Reference: `service/BaseEventConsumer.java:209-276` (retry-or-DLQ
  * decision, exponential backoff with jitter) and
  * `service/EventPublisher.java:163-224` (DLQ sink with error headers).
  *
  * In Spark these are column derivations plus a two-way split inside
  * `foreachBatch` — there is no delayed-delivery primitive, so the retry
  * topic carries a computed `next_attempt_ts` and the retry reader filters
  * on it per micro-batch (SURVEY §7.4.2; the reference's own scheduler is
  * commented out at `BaseEventConsumer.java:253-257`).
  */
object Retry {

  val MaxRetries = 3          // event-streaming.consumer.max-retries default
  val BaseDelayMs = 1000L     // calculateBackoffDelay base
  val MaxDelayMs = 60000L     // calculateBackoffDelay cap

  /** E1 decision: retry while retry_count < max, else dead-letter. */
  def shouldRetry(retryCount: Column, maxRetries: Int = MaxRetries): Column =
    retryCount < maxRetries

  /** E2 deterministic backoff core: min(1000 * 2^(n-1), 60000) ms
    * (`BaseEventConsumer.java:267-276`). The uniform jitter term
    * (+U(0, 0.1*delay)) is nondeterministic and therefore exposed
    * separately via [[backoffJitterUpperBound]] for bound tests.
    */
  def backoffDelayMs(retryCount: Column): Column =
    least(lit(BaseDelayMs) * pow(lit(2.0), retryCount.cast("double") - 1),
          lit(MaxDelayMs.toDouble)).cast("long")

  def backoffJitterUpperBound(retryCount: Column): Column =
    (backoffDelayMs(retryCount).cast("double") * 0.1)

  /** E2 retry gate: the earliest instant a retried record may be re-read. */
  def nextAttemptTs(failedAt: Column, retryCount: Column): Column =
    timestamp_millis(unix_millis(failedAt) + backoffDelayMs(retryCount))

  /** P6 retry-topic naming: `<topic>.retry.<n>` (`BaseEventConsumer.java:245`). */
  def retryTopic(topic: Column, nextRetryCount: Column): Column =
    concat(topic, lit(".retry."), nextRetryCount.cast("string"))

  /** P5 DLQ-topic rename: `nnipa.events.X` -> `nnipa.dlq.X`; anything else
    * gets the `nnipa.dlq.` prefix (`EventPublisher.java:168`).
    */
  def dlqTopic(topic: Column): Column =
    when(topic.startsWith("nnipa.events."),
         regexp_replace(topic, "^nnipa\\.events\\.", "nnipa.dlq."))
      .otherwise(concat(lit("nnipa.dlq."), topic))

  /** E1 split: (retryBranch with bumped count + routing, dlqBranch). */
  def split(df: DataFrame, retryCountCol: String = "retry_count",
            topicCol: String = "topic"): (DataFrame, DataFrame) = {
    val retries = df.filter(shouldRetry(col(retryCountCol)))
      .withColumn("next_retry_count", col(retryCountCol) + 1)
      .withColumn("route_topic", retryTopic(col(topicCol), col("next_retry_count")))
    val dlq = df.filter(!shouldRetry(col(retryCountCol)))
      .withColumn("route_topic", dlqTopic(col(topicCol)))
    (retries, dlq)
  }

  /** E4 retryable-exception classification (`config/ErrorHandlingConfig.java:73-84`). */
  def isRetryable(errorClass: Column): Column =
    errorClass.isin("NetworkException", "TimeoutException", "ListenerExecutionFailedException")
}
