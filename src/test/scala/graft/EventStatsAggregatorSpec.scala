package graft

import graft.functions.EventStatsAggregator
import graft.functions.EventStatsAggregator.{EventIn, Stats}
import graft.operators.Envelope
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Typed Aggregator (§2.9 aggregate-extension hook): must agree with the
  * equivalent built-in SQL aggregation over the real fixture.
  */
class EventStatsAggregatorSpec extends SparkSpec {

  test("typed EventStats aggregation matches the built-in SQL form") {
    import spark.implicits._
    val env = Envelope.withEnvelope(Tables.events(spark, sf()))
    val typedIn = env.select(
        col("event_type").as("eventType"),
        (col("event_id_s") =!= "").as("valid"),
        col("proc_ms").as("procMs"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[EventIn]

    val typed: Map[String, Stats] = typedIn
      .groupByKey(_.eventType)
      .agg(EventStatsAggregator.aggregator.toColumn.name("stats"))
      .collect().toMap

    val sqlForm = env.groupBy("event_type").agg(
        count(lit(1)).as("total"),
        count(when(col("event_id_s") =!= "" && col("event_type") =!= "error", 1)).as("ok"),
        count(when(col("event_type") === "error", 1)).as("err"),
        max(unix_micros(col("ts"))).as("last"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    assert(typed.keySet == sqlForm.keySet)
    typed.foreach { case (k, s) =>
      val (total, ok, err, last) = sqlForm(k)
      assert(s.totalEvents == total && s.successful == ok &&
        s.failed == err && s.lastEventMicros == last, s"group $k")
      assert(s.avgProcMs > 0.0)
    }
  }
}
