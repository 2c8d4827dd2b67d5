package graft

import graft.operators.Sessionize
import graft.streaming.{SessEvent, SessLabeled, TwsSessionize}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.util.Try

/** Streaming sessionization contract: watermark-gated label assignment
  * equals the batch Sessionize over the same rows (out-of-order arrivals
  * included), sessions continue across micro-batches, and state drains
  * as the watermark advances.
  */
class TwsSessionizeSpec extends SparkSpec {

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def results(out: String): Set[(String, Long, Timestamp, Long)] = {
    import spark.implicits._
    Try(spark.read.parquet(s"$out/rows").as[SessLabeled].collect()
      .map(l => (l.user, l.eventId, l.ts, l.sessionId)).toSet)
      .getOrElse(Set.empty)
  }

  private def pollUntil(out: String, n: Int, ms: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (results(out).size < n && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(results(out).size == n, s"wanted $n rows, got ${results(out)}")
  }

  private def withRocksDb(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("fixture-scale parity: 1000 streamed events label exactly as batch Sessionize") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select("user_id", "ts", "event_id").collect()
        .map(r => SessEvent(r.getAs[Number](0).toString, r.getTimestamp(1),
          r.getAs[Number](2).longValue))
      // split by time so no batch-2 row is later than batch-1's watermark;
      // scramble order inside each batch (the processor must re-sort)
      val sorted = ev.sortBy(e => (e.ts.getTime, e.eventId))
      val (b1, b2) = sorted.splitAt(sorted.length / 2)
      val rnd = new scala.util.Random(7)
      val horizon = SessEvent("horizon",
        new Timestamp(sorted.last.ts.getTime + 86400000L * 30), -1L)

      val out = java.nio.file.Files.createTempDirectory("tws-sess-fx").toString
      val input = MemoryStream[SessEvent]
      val q = TwsSessionize.sessionize(
          input.toDS().withWatermark("ts", "2 minutes"), gapSeconds = 86400L)
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SessLabeled], _: Long) =>
          b.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()
      try {
        Seq(rnd.shuffle(b1.toSeq), rnd.shuffle(b2.toSeq), Seq(horizon)).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
        pollUntil(out, ev.length)
        val got = results(out)
          .map(x => (x._1, x._2) -> x._4).toMap
        val batch = Sessionize.withSessionIds(
            graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
              .selectExpr("CAST(user_id AS STRING) AS user", "ts", "event_id"),
            "user", "ts", "event_id", gapSeconds = 86400L)
          .select("user", "event_id", "session_id").collect()
          .map(r => (r.getString(0), r.getAs[Number](1).longValue) -> r.getLong(2)).toMap
        assert(got == batch, {
          val diff = (got.toSet diff batch.toSet).take(5)
          s"stream and batch labels differ, e.g. $diff"
        })
      } finally q.stop()
    }
  }

  test("streaming labels equal batch Sessionize, sessions span micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-sess").toString
      val input = MemoryStream[SessEvent]
      val q = TwsSessionize.sessionize(
          input.toDS().withWatermark("ts", "2 minutes"), gapSeconds = 1800L)
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SessLabeled], _: Long) =>
          b.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()

      // u1: two sessions (10:00-10:20, then 11:30+); u2: one session.
      // b2 delivers an OUT-OF-ORDER event (10:10) before the watermark
      // passes it — it must still label inside u1's first session.
      val b1 = Seq(SessEvent("u1", t(10, 0), 1L), SessEvent("u2", t(10, 5), 10L))
      val b2 = Seq(SessEvent("u1", t(10, 20), 3L), SessEvent("u1", t(10, 10), 2L))
      val b3 = Seq(SessEvent("u1", t(11, 30), 4L), SessEvent("u2", t(11, 40), 11L))
      val b4 = Seq(SessEvent("u1", t(23, 59), 5L)) // horizon push drains all

      val all = b1 ++ b2 ++ b3 ++ b4
      try {
        Seq(b1, b2, b3, b4).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
        pollUntil(out, all.size - 1) // the horizon event itself is still held
        val got = results(out)

        // batch reference over the SAME rows (all of them are <= the final
        // watermark except the horizon event, which we exclude both sides)
        val delivered = all.filterNot(_.eventId == 5L)
        val batch = Sessionize.withSessionIds(
            delivered.toDF("user", "ts", "event_id"),
            "user", "ts", "event_id", gapSeconds = 1800L)
          .select("user", "event_id", "ts", "session_id").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
          .toSet
        assert(got == batch,
          s"stream labels must equal batch labels:\n got=$got\n want=$batch")
        // explicit shape: u1 has sessions 1,1,1,2; u2 has 1,2 (40min > 30min gap)
        assert(got.filter(_._1 == "u1").map(x => x._2 -> x._4).toMap ==
          Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
      } finally q.stop()
    }
  }
}
