package graft

import java.sql.Timestamp

import graft.operators.Funnel
import graft.streaming.TwsFunnel
import graft.streaming.TwsFunnel.{FunnelAdvance, FunnelEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel == batch funnel on event-time-ordered batches (with
  * intra-batch disorder), plus the causal-across-batches contract.
  * RocksDB provider (transformWithState's store).
  */
class TwsFunnelSpec extends SparkSpec {

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private val steps = Seq("view", "click", "purchase")

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

  test("stream advances == batch funnel when batches respect event-time order") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val out = java.nio.file.Files.createTempDirectory("tws-funnel").toString
      // intra-batch rows deliberately SHUFFLED; batch boundary preserves
      // event-time order (b1 < b2). user 1 completes across batches;
      // user 2's click precedes their view; user 3 repeats views.
      val b1 = Seq(
        FunnelEvent(1L, "click", t(2)), FunnelEvent(1L, "view", t(1)),
        FunnelEvent(2L, "click", t(1)), FunnelEvent(2L, "view", t(3)),
        FunnelEvent(3L, "view", t(4)), FunnelEvent(3L, "view", t(2)))
      val b2 = Seq(
        FunnelEvent(1L, "purchase", t(11)), FunnelEvent(2L, "purchase", t(12)),
        FunnelEvent(3L, "click", t(10)))

      val input = MemoryStream[FunnelEvent]
      val q = TwsFunnel.advances(input.toDS(), steps)
        .writeStream
        .option("checkpointLocation", s"$out/_cp")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelAdvance], _: Long) =>
          b.write.mode("append").parquet(s"$out/adv"); ()
        }
        .start()
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()

      val streamDepth = spark.read.parquet(s"$out/adv")
        .groupBy("user_id").agg(max("step").as("d")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // batch reference over the union
      val all = (b1 ++ b2).toDF()
      val times = Funnel.funnelTimes(all, "user_id", "event_type", "ts", steps)
      val batchDepth = times.collect().map { r =>
        r.getLong(0) -> (1 to 3).takeWhile(i => !r.isNullAt(i)).size
      }.toMap
      assert(streamDepth == batchDepth,
        s"stream=$streamDepth batch=$batchDepth")
      assert(streamDepth == Map(1L -> 3, 2L -> 1, 3L -> 2))
      // per-advance rows carry the matched event's own timestamp
      val u1 = spark.read.parquet(s"$out/adv").filter(col("user_id") === 1L)
        .orderBy("step").select("ts").collect().map(_.getTimestamp(0)).toSeq
      assert(u1 == Seq(t(1), t(2), t(11)))
    }
  }

  test("causal across batches: a late step-1 event cannot re-anchor the funnel") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val out = java.nio.file.Files.createTempDirectory("tws-funnel-late").toString
      val input = MemoryStream[FunnelEvent]
      val q = TwsFunnel.advances(input.toDS(), steps)
        .writeStream
        .option("checkpointLocation", s"$out/_cp")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelAdvance], _: Long) =>
          b.write.mode("append").parquet(s"$out/adv"); ()
        }
        .start()
      try {
        // batch 1: view@5 anchors the funnel
        input.addData(FunnelEvent(9L, "view", t(5))); q.processAllAvailable()
        // batch 2: click@3 arrives late — BEFORE the anchor, so it cannot
        // advance (batch greedy over the union would also reject it; the
        // causal property under test is that view@1 arriving now cannot
        // RE-anchor either)
        input.addData(FunnelEvent(9L, "view", t(1)),
          FunnelEvent(9L, "click", t(3))); q.processAllAvailable()
      } finally q.stop()
      val depth = spark.read.parquet(s"$out/adv")
        .groupBy("user_id").agg(max("step")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(depth == Map(9L -> 1), s"got $depth")
    }
  }
}
