package graft.observe

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming metrics (SURVEY §2.6 A8/A9): `Dataset.observe` counters wired
  * to a StreamingQueryListener — the engine-native replacement for the
  * reference's Micrometer counters/timers
  * (`metrics/EventStreamingMetrics.java:26-187`).
  *
  * Metrics ride inside the query plan (no second pass over the data); the
  * listener harvests them per micro-batch from the progress event.
  */
object MetricsObserver {

  val ObservationName = "consume_metrics"

  /** Attach the A5/A9-shaped counters to a (batch or streaming) frame. */
  def instrument(df: DataFrame): DataFrame =
    df.observe(ObservationName,
      count(lit(1)).as("events"),
      count(when(col("event_id_s") === "", 1)).as("invalid"),
      count(when(col("event_type") === "error", 1)).as("errors"),
      sum(col("value")).as("sum_value"))

  /** Accumulating listener: totals across micro-batches, keyed by metric. */
  final class Accumulating extends StreamingQueryListener {
    private val totals = new ConcurrentHashMap[String, Long]()

    def snapshot: Map[String, Long] = totals.asScala.toMap

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val obs = event.progress.observedMetrics.asScala.get(ObservationName)
      obs.foreach { row =>
        Seq("events", "invalid", "errors").foreach { m =>
          val idx = row.schema.fieldIndex(m)
          if (!row.isNullAt(idx))
            totals.merge(m, row.getLong(idx), (a, b) => a + b)
        }
      }
    }
  }
}
