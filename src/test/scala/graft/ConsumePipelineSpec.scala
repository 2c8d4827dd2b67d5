package graft

import graft.operators.{Dedup, Envelope}
import graft.sources.Tables
import graft.streaming.ConsumePipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming E2E (SURVEY §5.3): the consume pipeline over micro-batches
  * must converge to the same results as the batch form — dedup across
  * batches, DLQ routing, retry-count progression.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class ConsumePipelineSpec extends SparkSpec {

  private def mkEv(id: Long, minute: Int, etype: String = "click"): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), id % 10, etype, 1.0, """{"k":1}""")

  test("streaming dedup across micro-batches matches batch keep-first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("consume").toString

    val input = MemoryStream[Ev]
    // batch 1: ids 1..5; batch 2 re-delivers 2,3 (later ts) + new 6,7
    val b1 = (1L to 5L).map(i => mkEv(i, i.toInt))
    val b2 = Seq(mkEv(2, 30), mkEv(3, 31), mkEv(6, 32), mkEv(7, 33))

    val enveloped = Envelope.withEnvelope(input.toDF())
    val q = ConsumePipeline.start(enveloped, out,
      ConsumePipeline.Config(dedupTtl = "2 hours"), availableNow = false)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val processed = spark.read.parquet(s"$out/processed")
    val ids = processed.select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L), "each id exactly once across batches")

    // batch form over the union sees the same surviving set
    val batchAll = Envelope.withEnvelope((b1 ++ b2).toDF())
    val batchKept = Dedup.keepFirst(batchAll, Seq("event_id"), Seq("ts"))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == batchKept)
  }

  test("startFromWire: raw bytes -> decode-once -> dedup -> route, across batches") {
    import spark.implicits._
    import graft.functions.ProtoWire._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("consume-wire").toString

    def wire(id: Long, minute: Int, retry: Long): Array[Byte] =
      message(lenField(1, message(
        stringField(1, if (id % 20 == 0) "" else id.toString),
        timestampField(4, 1704103200L + minute * 60L, 0),
        mapEntryField(6, "k", s"v$id"),
        stringField(7, s"t-${id % 5}"),
        varintField(10, retry))))

    val input = MemoryStream[(String, Array[Byte])]
    val q = ConsumePipeline.startFromWire(
      input.toDF().toDF("topic", "value"), out,
      ConsumePipeline.Config(dedupTtl = "2 hours"), availableNow = false)
    try {
      // batch 1: 3 ok events + 1 invalid (empty event_id on the wire)
      input.addData(Seq(1L, 2L, 3L).map(i => ("nnipa.events.click.recorded", wire(i, i.toInt, 0))) :+
        (("nnipa.events.click.recorded", wire(20L, 4, 0))): _*)
      q.processAllAvailable()
      // batch 2: event 2 redelivered (decodes to the same event_id -> deduped),
      // fresh 5, and a POISON PILL (truncated wire bytes) — the safe decode
      // turns it into the invalid branch instead of killing the stream
      val pill = wire(6L, 32, 0).dropRight(4)
      input.addData(
        ("nnipa.events.click.recorded", wire(2L, 30, 0)),
        ("nnipa.events.click.recorded", wire(5L, 31, 0)),
        ("nnipa.events.click.recorded", pill))
      q.processAllAvailable()
    } finally q.stop()

    val processed = spark.read.parquet(s"$out/processed")
    assert(processed.select("event_id_s").as[String].collect().sorted.toSeq ==
      Seq("1", "2", "3", "5"), "decoded ids, deduped across wire batches")
    // decoded envelope fields survived: headers-as-props JSON + tenant
    val r = processed.filter(col("event_id_s") === "3")
      .select("props", "tenant_id", "ts").head()
    assert(r.getString(0) == """{"k":"v3"}""")
    assert(r.getString(1) == "t-3")
    assert(r.getAs[java.sql.Timestamp](2).getTime == (1704103200L + 180L) * 1000L)
    // DLQ holds BOTH the empty-id event and the poison pill (2 rows)
    val dlq = spark.read.parquet(s"$out/dlq")
    assert(dlq.count() == 2)
    assert(dlq.select("error_message").as[String].collect().toSet == Set("Invalid event"))
  }

  test("invalid events route to DLQ, failures honor retry-vs-DLQ split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("consume2").toString

    val input = MemoryStream[Ev]
    // id 20 -> empty event_id (invalid, Envelope: id % 20 == 0)
    // event_type "error" marked failed; retry_count = id % 5 -> id 23 (rc 3) exhausts
    val evs = Seq(mkEv(20, 1), mkEv(21, 2, "error"), mkEv(23, 3, "error"), mkEv(24, 4))

    val enveloped = Envelope.withEnvelope(input.toDF())
    val q = ConsumePipeline.start(enveloped, out,
      failurePredicate = col("event_type") === "error", availableNow = false)
    input.addData(evs: _*)
    q.processAllAvailable()
    q.stop()

    val processed = spark.read.parquet(s"$out/processed").select("event_id").as[Long].collect().toSet
    val dlq = spark.read.parquet(s"$out/dlq")
      .select("event_id", "error_message").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val retry = spark.read.parquet(s"$out/retry")
      .select("event_id", "next_retry_count", "route_topic").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))

    assert(processed == Set(24L))
    assert(dlq(20L) == "Invalid event")
    assert(dlq(23L) == "Max retries exceeded")        // retry_count 3 = max
    assert(retry.toSeq == Seq((21L, 2, "nnipa.events.error.recorded.retry.2")))
  }
}
