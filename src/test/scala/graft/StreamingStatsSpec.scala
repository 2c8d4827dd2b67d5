package graft

import graft.streaming.StreamingStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class SEv(event_type: String, ts: java.sql.Timestamp, value: Double)
final case class UEv(user_id: Long, ts: java.sql.Timestamp)

/** Watermarked tumbling aggregation: append-mode finalization, exactly-once
  * emission per window, late-drop beyond the horizon, and equivalence with
  * the batch aggregation over the surviving events.
  */
class StreamingStatsSpec extends SparkSpec {

  private def t(minute: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windows finalize once, late events drop, result equals batch over survivors") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SEv]
    val q = StreamingStats.tumblingStats(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("sstats").outputMode("append").start()
    try {
      // window [10:00,10:10): two events; window [10:10,10:20): one event
      input.addData(SEv("a", t(1), 1.0), SEv("b", t(3), 2.0), SEv("a", t(12), 4.0))
      q.processAllAvailable()
      // advance the watermark far past both windows -> they finalize
      input.addData(SEv("a", t(50), 8.0))
      q.processAllAvailable()
      // this event is now far behind the watermark (10:45) -> dropped
      input.addData(SEv("a", t(2), 16.0))
      q.processAllAvailable()
      // and one more advance to prove the dropped event never surfaces
      input.addData(SEv("a", t(55), 32.0))
      q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("sstats")
      .filter(col("w_start") < t(20)) // the two windows under test
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
    // exactly-once: no (window, type) key appears twice
    assert(emitted.map(_._1).distinct.length == emitted.length)
    val byKey = emitted.toMap
    // equals the batch aggregation over the events that beat the watermark
    // (the 16.0 late event is NOT included)
    assert(byKey((t(0), "a")) == ((1L, 1.0)))
    assert(byKey((t(0), "b")) == ((1L, 2.0)))
    assert(byKey((t(10), "a")) == ((1L, 4.0)))
    assert(byKey.size == 3)
  }

  test("session windows gap-merge across batches and close under the watermark") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[UEv]
    val q = StreamingStats.sessionStats(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("ssess").outputMode("append").start()
    try {
      // user 1: events at 10:00 and 10:06 merge (gap < 10 min); user 2 alone
      input.addData(UEv(1, t(0)), UEv(2, t(2)))
      q.processAllAvailable()
      input.addData(UEv(1, t(6)))                 // extends user 1's session
      q.processAllAvailable()
      input.addData(UEv(1, t(59)))                // watermark -> closes both
      q.processAllAvailable()
      input.addData(UEv(2, t(59)))                // flush emission
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("ssess")
      .filter(col("session_start") < t(20))
      .collect()
      .map(r => (r.getLong(2), r.getTimestamp(0), r.getTimestamp(1), r.getLong(3)))
      .sortBy(_._1)
    // user 1: one merged session [10:00, 10:16) with 2 events
    assert(rows(0) == ((1L, t(0), t(16), 2L)))
    // user 2: singleton session [10:02, 10:12)
    assert(rows(1) == ((2L, t(2), t(12), 1L)))
    assert(rows.length == 2)
  }
}
