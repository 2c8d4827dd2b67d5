package graft

import graft.streaming.{ScoredRow, TwsTopN}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.util.Try

/** Stream ≡ batch for the continuous weighted sample: TwsTopN over the
  * fixture events (A-ES scores from the SAME `Sampling.uniformDraw^(1/w)`
  * column the batch draw uses), fed in three scrambled micro-batches,
  * must end at exactly the rows `Sampling.weightedSample` picks over the
  * whole input — per event-type group, same order.
  */
class TwsTopNSpec extends SparkSpec {

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

  test("streaming per-group top-10 equals the batch A-ES weighted draw") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = graft.sources.Tables.events(spark, sf())
      .filter(col("value") > 0)
    val scored = events.select(col("event_type").as("group"),
        col("event_id").as("key"),
        pow(graft.scale.Sampling.uniformDraw(col("event_id"), "tws-topn"),
          lit(1.0d) / col("value").cast("double")).as("score"))
      .as[ScoredRow].collect().toSeq

    // batch truth: per group the 10 highest (score desc, key) rows
    val expected = scored.groupBy(_.group).map { case (g, rows) =>
      g -> rows.sortBy(r => (-r.score, r.key)).take(10)
        .zipWithIndex.map { case (r, i) => (r.key, r.score, i + 1) }
    }

    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-topn").toString
      val input = MemoryStream[ScoredRow]
      // three scrambled batches crossing group boundaries
      val shuffled = scored.sortBy(r => (r.key * 2654435761L) % 1000003)
      val batches = shuffled.grouped((shuffled.length + 2) / 3).toSeq
      batches.zipWithIndex.foreach { case (rows, bi) =>
        input.addData(rows: _*)
        val q = TwsTopN.topNByKey(input.toDS(), n = 10)
          .writeStream
          .option("checkpointLocation", s"$out/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.TopNRow], _: Long) =>
            df.withColumn("feed", lit(bi))
              .write.mode("append").parquet(s"$out/rows"); ()
          }
          .start()
        q.awaitTermination()
      }
      val last = Try(spark.read.parquet(s"$out/rows")).toOption.get
      val maxFeed = last.agg(max("feed")).head.getInt(0)
      val got = last.filter(col("feed") === maxFeed)
        .select("group", "key", "score", "rank")
        .as[(String, Long, Double, Int)].collect()
        .groupBy(_._1).map { case (g, rows) =>
          g -> rows.sortBy(_._4).map(r => (r._2, r._3, r._4)).toSeq
        }
      assert(got.keySet == expected.keySet)
      expected.foreach { case (g, exp) =>
        assert(got(g) == exp.toSeq, s"group $g: stream ${got(g)} vs batch $exp")
      }
    }
  }
}
