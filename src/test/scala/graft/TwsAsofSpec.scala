package graft

import graft.operators.AsofJoin
import graft.streaming.{AsofEvent, AsofFilled, TwsAsof}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.util.Try

/** Streaming as-of enrichment (transformWithState): watermark-held lefts,
  * out-of-order rights, inclusive ties, bounded state — and equality with
  * the batch AsofJoin over the same rows.
  */
class TwsAsofSpec extends SparkSpec {

  private def t(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private def results(out: String): Set[(String, Timestamp, String, Option[String], Option[Timestamp])] = {
    import spark.implicits._
    Try(spark.read.parquet(s"$out/rows")
      .select("key", "ts", "payload", "fill", "fill_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2),
        Option(r.getString(3)), Option(r.getTimestamp(4)))).toSet)
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

  test("watermark-held fills match the batch as-of join, out-of-order rights included") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-asof").toString
      val input = MemoryStream[AsofEvent]
      val q = TwsAsof.enrich(input.toDS().withWatermark("ts", "2 minutes"))
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[AsofFilled], _: Long) =>
          batch.write.mode("append").parquet(s"$out/rows")
          ()
        }
        .start()

      // every row fed to the stream, in arrival order per batch
      val b1 = Seq(
        AsofEvent("k1", t(0), isLeft = false, "cfgA"),
        AsofEvent("k1", t(3), isLeft = true, "e1"),
        AsofEvent("k2", t(2), isLeft = true, "e2"))      // k2 has no rights
      val b2 = Seq(
        AsofEvent("k1", t(2), isLeft = false, "cfgB"),   // out-of-order: lands between cfgA and e1
        AsofEvent("k3", t(5), isLeft = false, "cfgT"),
        AsofEvent("k3", t(5), isLeft = true, "eT"),      // inclusive tie
        AsofEvent("k1", t(12), isLeft = true, "e3"),
        AsofEvent("k1", t(11), isLeft = false, "cfgC"))
      val b3 = Seq(AsofEvent("k1", t(59), isLeft = false, "cfgZ")) // horizon push

      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
        input.addData(b3: _*); q.processAllAvailable()
        // e3's timer fires once the watermark from b3 propagates (no-data batch)
        pollUntil(out, 4)
      } finally q.stop()

      val got = results(out)
      assert(got == Set(
        ("k1", t(3), "e1", Some("cfgB"), Some(t(2))),   // out-of-order right wins
        ("k2", t(2), "e2", None, None),                 // left join: no right
        ("k3", t(5), "eT", Some("cfgT"), Some(t(5))),   // inclusive tie
        ("k1", t(12), "e3", Some("cfgC"), Some(t(11)))))

      // batch parity: the same rows through AsofJoin.latestAtOrBefore
      val all = b1 ++ b2 ++ b3
      val lefts = all.filter(_.isLeft)
        .map(e => (e.key, e.ts, e.payload)).toDF("key", "ts", "payload")
      val rights = all.filterNot(_.isLeft)
        .map(e => (e.key, e.ts, e.ts, e.payload)).toDF("key", "ts", "fill_ts", "fill")
      val batch = AsofJoin.latestAtOrBefore(lefts, rights, key = "key", ts = "ts")
        .select("key", "ts", "payload", "fill", "fill_ts").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2),
          Option(r.getString(3)), Option(r.getTimestamp(4)))).toSet
      assert(got == batch, s"stream=$got\nbatch=$batch")
    }
  }

  test("staleness bound: a too-old fill nulls out, matching the batch tolerance") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val out = tmp("tws-asof-ttl")
      val input = MemoryStream[AsofEvent]
      // 5-minute tolerance in micros
      val q = TwsAsof.enrich(input.toDS().withWatermark("ts", "2 minutes"),
          toleranceMicros = 5L * 60 * 1000000)
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[AsofFilled], _: Long) =>
          batch.write.mode("append").parquet(s"$out/rows")
          ()
        }
        .start()
      try {
        input.addData(
          AsofEvent("k1", t(0), isLeft = false, "cfgA"),
          AsofEvent("k1", t(4), isLeft = true, "fresh"),   // age 4 min <= 5
          AsofEvent("k1", t(9), isLeft = true, "stale"))   // age 9 min > 5
        q.processAllAvailable()
        input.addData(AsofEvent("k1", t(59), isLeft = false, "push"))
        q.processAllAvailable()
        pollUntil(out, 2)
      } finally q.stop()
      val got = results(out)
      assert(got == Set(
        ("k1", t(4), "fresh", Some("cfgA"), Some(t(0))),
        ("k1", t(9), "stale", None, None)))
    }
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("d").toString
}
