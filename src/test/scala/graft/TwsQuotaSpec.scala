package graft

import graft.streaming.TwsQuota
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Try

/** Stream ≡ batch for the per-tenant admission quota: TwsQuota over the
  * fixture events, fed in three micro-batches that SPLIT (tenant, bucket)
  * keys across batch boundaries, must produce exactly the batch
  * `row_number() <= limit` decisions — the carried per-key count is what
  * makes admission deterministic across the split.
  */
class TwsQuotaSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming quota decisions equal the batch row_number semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // tighter than the registered query (limit 1, 5 tenants) so the
    // quota actually binds on the sparse sf0.001 fixture
    val limit = 1L
    val ins = graft.sources.Tables.events(spark, sf())
      .select((col("user_id") % 5).as("tenant"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"),
        unix_micros(col("ts")).as("seq"),
        col("event_id").as("eventId"))
      .as[TwsQuota.In].collect().toSeq

    // batch truth: first `limit` per (tenant, bucket) in (seq, eventId) order
    val expected = ins.groupBy(r => (r.tenant, r.bucket)).flatMap {
      case (_, rows) =>
        rows.sortBy(r => (r.seq, r.eventId)).zipWithIndex.map {
          case (r, i) => r.eventId -> (i < limit)
        }
    }

    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-quota").toString
      val input = MemoryStream[TwsQuota.In]
      // three batches in event order — (tenant, bucket) runs straddle
      // the boundaries, so admission MUST carry counts through state
      val ordered = ins.sortBy(r => (r.seq, r.eventId))
      val batches = ordered.grouped((ordered.length + 2) / 3).toSeq
      batches.foreach { rows =>
        input.addData(rows: _*)
        val q = TwsQuota.admit(input.toDS(), limit)
          .writeStream
          .option("checkpointLocation", s"$out/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.Dataset[TwsQuota.Decision], _: Long) =>
            df.write.mode("append").parquet(s"$out/rows"); ()
          }
          .start()
        q.awaitTermination()
      }
      val got = Try(spark.read.parquet(s"$out/rows")).toOption.get
        .select("eventId", "admitted").as[(Long, Boolean)].collect().toMap
      assert(got.size == ins.size, "every event must get exactly one decision")
      val wrong = expected.count { case (id, adm) => got(id) != adm }
      assert(wrong == 0, s"$wrong decisions diverge from batch semantics")
      // sanity: quota actually binds on this fixture
      assert(got.valuesIterator.count(!_) > 0, "expected some rejections")
    }
  }

  test("batch operator form matches the registered query's aggregation") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, sf())
      .withColumn("tenant", col("user_id") % 20)
      .withColumn("bucket", date_trunc("hour", col("ts")))
    val w = Window.partitionBy("tenant", "bucket").orderBy(col("ts"), col("event_id"))
    val perEvent = e.withColumn("admitted", row_number().over(w) <= 5)
    val agg = perEvent.groupBy("tenant")
      .agg(sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"))
      .as[(Long, Long)].collect().toMap
    val reg = SparkEntry.queries("evt_quota_admission")(spark, sf())
      .select("tenant", "n_admitted").as[(Long, Long)].collect().toMap
    assert(agg == reg)
  }
}
