package graft

import graft.operators.Funnel
import graft.streaming.{FunnelEvent, FunnelHit, TwsFunnel}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.util.Try

/** Streaming funnel contract: watermark-gated greedy step times equal the
  * batch `operators/Funnel.funnelTimes` over the same rows — including
  * out-of-order arrivals across micro-batch boundaries — and each step is
  * emitted exactly once.
  */
class TwsFunnelSpec extends SparkSpec {

  private val steps = Seq("view", "click", "purchase")

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def results(out: String): Set[(String, Int, Timestamp)] = {
    import spark.implicits._
    Try(spark.read.parquet(s"$out/rows").as[FunnelHit].collect()
      .map(h => (h.user, h.step, h.ts)).toSet)
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

  /** Batch reference melted to (user, step, ts) for the reached steps. */
  private def batchHits(df: org.apache.spark.sql.DataFrame): Set[(String, Int, Timestamp)] =
    Funnel.funnelTimes(df, "user", "event_type", "ts", steps)
      .collect().flatMap { r =>
        steps.indices.flatMap { i =>
          Option(r.getTimestamp(i + 1)).map(ts => (r.getString(0), i + 1, ts))
        }
      }.toSet

  test("fixture-scale parity: streamed funnel steps equal batch funnelTimes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("event_type").isin(steps: _*))
        .select("user_id", "ts", "event_id", "event_type").collect()
        .map(r => FunnelEvent(r.getAs[Number](0).toString, r.getTimestamp(1),
          r.getAs[Number](2).longValue,
          steps.indexOf(r.getString(3)) + 1))
      // split by time so no batch-2 row predates batch-1's watermark;
      // scramble inside each batch (the processor must re-sort)
      val sorted = raw.sortBy(e => (e.ts.getTime, e.eventId))
      val (b1, b2) = sorted.splitAt(sorted.length / 2)
      val rnd = new scala.util.Random(11)
      val horizon = FunnelEvent("horizon",
        new Timestamp(sorted.last.ts.getTime + 86400000L * 30), -1L, 1)

      val out = java.nio.file.Files.createTempDirectory("tws-funnel-fx").toString
      val input = MemoryStream[FunnelEvent]
      // retain-forever explicitly: this test pins stream ≡ batch over
      // ARBITRARY event-time gaps, which the default 7-day idle expiry
      // intentionally trades away (a silent user restarts from step 1)
      val q = TwsFunnel.funnel(
          input.toDS().withWatermark("ts", "2 minutes"), steps.length,
          idleTimeoutMs = None)
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelHit], _: Long) =>
          b.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()
      try {
        Seq(rnd.shuffle(b1.toSeq), rnd.shuffle(b2.toSeq), Seq(horizon)).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
        val want = batchHits(
          graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
            .selectExpr("CAST(user_id AS STRING) AS user", "ts", "event_id",
              "event_type"))
        pollUntil(out, want.size)
        val got = results(out).filterNot(_._1 == "horizon")
        assert(got == want, {
          val diff = ((got diff want) ++ (want diff got)).take(5)
          s"stream and batch funnel steps differ, e.g. $diff"
        })
      } finally q.stop()
    }
  }

  test("steps finalize across micro-batches; out-of-order step-1 still wins") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-funnel").toString
      val input = MemoryStream[FunnelEvent]
      val q = TwsFunnel.funnel(
          input.toDS().withWatermark("ts", "5 minutes"), steps.length)
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelHit], _: Long) =>
          b.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()

      // u1: click@10:02 arrives BEFORE its view@10:01 (cross-batch,
      // out-of-order) — the drain must still order view first and count
      // both. A second click@10:04 must NOT re-emit step 2. u2: purchase
      // with no prior steps never emits.
      val b1 = Seq(FunnelEvent("u1", t(10, 2), 2L, 2),
        FunnelEvent("u2", t(10, 3), 10L, 3))
      val b2 = Seq(FunnelEvent("u1", t(10, 1), 1L, 1),
        FunnelEvent("u1", t(10, 4), 3L, 2))
      val b3 = Seq(FunnelEvent("u1", t(10, 30), 4L, 3))
      val b4 = Seq(FunnelEvent("u1", t(23, 59), 5L, 1)) // horizon push
      try {
        Seq(b1, b2, b3, b4).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
        pollUntil(out, 3)
        val got = results(out)
        assert(got == Set(("u1", 1, t(10, 1)), ("u1", 2, t(10, 2)),
          ("u1", 3, t(10, 30))), s"got $got")

        // batch reference over the same delivered rows agrees
        val delivered = Seq(
          ("u1", t(10, 2), 2L, "click"), ("u2", t(10, 3), 10L, "purchase"),
          ("u1", t(10, 1), 1L, "view"), ("u1", t(10, 4), 3L, "click"),
          ("u1", t(10, 30), 4L, "purchase"))
          .toDF("user", "ts", "event_id", "event_type")
        assert(batchHits(delivered) == got)
      } finally q.stop()
    }
  }

  /** Users holding any rows in state var `varName` at the checkpoint's
    * latest committed batch (state data source reader, stateVarName).
    */
  private def usersInState(ckpt: String, varName: String): Set[String] =
    spark.read.format("statestore")
      .option("stateVarName", varName)
      .load(ckpt)
      .selectExpr("key.value AS user")
      .collect().map(_.getString(0)).toSet

  test("completion collapses keyed state to the done stamp (pending/times cleared)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-funnel-done").toString
      val input = MemoryStream[FunnelEvent]
      val q = TwsFunnel.funnel(
          input.toDS().withWatermark("ts", "1 minute"), steps.length)
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelHit], _: Long) =>
          b.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()
      // u1 completes all 3 steps; u2 stays in-flight at step 1 (the
      // contrast proving the state reader actually sees live state)
      val b1 = Seq(FunnelEvent("u1", t(10, 1), 1L, 1),
        FunnelEvent("u1", t(10, 2), 2L, 2), FunnelEvent("u1", t(10, 3), 3L, 3),
        FunnelEvent("u2", t(10, 2), 4L, 1))
      val b2 = Seq(FunnelEvent("wm", t(11, 10), 5L, 1)) // watermark push
      // post-completion event: dropped on arrival, never buffered
      val b3 = Seq(FunnelEvent("u1", t(11, 20), 6L, 1),
        FunnelEvent("wm", t(12, 30), 7L, 1))
      try {
        Seq(b1, b2, b3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
        pollUntil(out, 4 + 1) // u1 steps 1-3 + u2 step 1 + wm step 1
        val got = results(out).filterNot(_._1 == "wm")
        assert(got == Set(("u1", 1, t(10, 1)), ("u1", 2, t(10, 2)),
          ("u1", 3, t(10, 3)), ("u2", 1, t(10, 2))), s"got $got")
      } finally q.stop()
      // u1 finished: buffer and step times are gone, only the done stamp
      // remains; u2 in-flight: step times retained
      assert(!usersInState(s"$out/_ckpt", "pending").contains("u1"))
      assert(!usersInState(s"$out/_ckpt", "times").contains("u1"))
      assert(usersInState(s"$out/_ckpt", "done") == Set("u1"))
      assert(usersInState(s"$out/_ckpt", "times").contains("u2"))
    }
  }

  test("DEFAULT config bounds state: done stamp expires after the 7-day max-age") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-funnel-def").toString
      val input = MemoryStream[FunnelEvent]
      // NO idleTimeoutMs argument — this is the out-of-the-box posture
      val q = TwsFunnel.funnel(
          input.toDS().withWatermark("ts", "1 minute"), steps.length)
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelHit], _: Long) =>
          b.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()
      def day(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
      val b1 = Seq(FunnelEvent("u1", day(1, 10), 1L, 1),
        FunnelEvent("u1", day(1, 11), 2L, 2), FunnelEvent("u1", day(1, 12), 3L, 3))
      val b2 = Seq(FunnelEvent("wm", day(2, 0), 4L, 1))  // finalize completion
      val b3 = Seq(FunnelEvent("wm", day(9, 13), 5L, 1)) // wm past done + 7 days
      try {
        Seq(b1, b2, b3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
        pollUntil(out, 3 + 1)
      } finally q.stop()
      // bounded out of the box: 7 event-time days past completion, the
      // default (reference BaseEventConsumer.java:153 max-age) has cleared
      // every trace — keyed state is O(users active in the last 7 days)
      Seq("pending", "times", "lastSeen", "done").foreach { v =>
        assert(!usersInState(s"$out/_ckpt", v).contains("u1"),
          s"u1 still present in state var '$v' under the DEFAULT idle timeout")
      }
    }
  }

  test("idle timeout expires the done stamp: completed users leave state entirely") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-funnel-ttl").toString
      val input = MemoryStream[FunnelEvent]
      val q = TwsFunnel.funnel(
          input.toDS().withWatermark("ts", "1 minute"), steps.length,
          idleTimeoutMs = Some(3600000L)) // 1 h
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelHit], _: Long) =>
          b.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()
      val b1 = Seq(FunnelEvent("u1", t(10, 1), 1L, 1),
        FunnelEvent("u1", t(10, 2), 2L, 2), FunnelEvent("u1", t(10, 3), 3L, 3))
      val b2 = Seq(FunnelEvent("wm", t(11, 10), 4L, 1)) // finalize completion
      val b3 = Seq(FunnelEvent("wm", t(13, 0), 5L, 1))  // wm past 10:03+1h
      try {
        Seq(b1, b2, b3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
        pollUntil(out, 3 + 1)
      } finally q.stop()
      // done stamp expired 1 h past completion — no trace of u1 in any var
      Seq("pending", "times", "lastSeen", "done").foreach { v =>
        assert(!usersInState(s"$out/_ckpt", v).contains("u1"),
          s"u1 still present in state var '$v' after done-stamp expiry")
      }
    }
  }
}
