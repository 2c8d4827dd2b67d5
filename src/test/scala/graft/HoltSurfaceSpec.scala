package graft

import graft.streaming.{SeriesPoint, TwsHolt}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.util.Try

/** Cross-surface equivalence for the two-component state fold: the
  * STREAMING TwsHolt over the fixture's daily per-type series emits the
  * rows the oracle-checked batch query `ts_holt` computes (level, trend
  * and forecast all agreeing at the batch side's 1e-6 rounding), with the
  * feed split mid-series so the (level, trend) tuple state must survive a
  * micro-batch boundary.
  */
class HoltSurfaceSpec extends SparkSpec {

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

  test("TwsHolt over the fixture daily series equals the oracle-checked ts_holt") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.queries.SignalQueries.defs("ts_holt")
      .build(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

    val series = batch.toSeq.sortBy(_._1).map { case ((tpe, day), (n, _, _, _)) =>
      SeriesPoint(tpe, day.replace("-", "").toLong, n.toDouble)
    }

    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("holt-surface").toString
      val input = MemoryStream[SeriesPoint]
      val (a, b) = series.splitAt(series.length / 2)
      Seq(a, b).foreach { batchRows =>
        if (batchRows.nonEmpty) input.addData(batchRows: _*)
        val q = TwsHolt.holtByKey(input.toDS(), alpha = 0.3, beta = 0.1)
          .writeStream
          .option("checkpointLocation", s"$out/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.HoltPoint], _: Long) =>
            df.write.mode("append").parquet(s"$out/rows"); ()
          }
          .start()
        q.awaitTermination()
      }
      val got = Try(spark.read.parquet(s"$out/rows")
        .as[graft.streaming.HoltPoint].collect().toSeq.distinct).getOrElse(Seq.empty)
      assert(got.size == batch.size, s"row counts: stream ${got.size} vs batch ${batch.size}")
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      got.foreach { p =>
        val day = p.seq.toString
        val key = (p.key, s"${day.take(4)}-${day.slice(4, 6)}-${day.drop(6)}")
        val (n, level, trend, forecast) = batch(key)
        assert(p.x == n.toDouble, s"$key raw value")
        assert(r6(p.level) == level, s"$key: stream level ${p.level} vs batch $level")
        assert(r6(p.trend) == trend, s"$key: stream trend ${p.trend} vs batch $trend")
        assert(r6(p.forecast) == forecast,
          s"$key: stream forecast ${p.forecast} vs batch $forecast")
      }
    }
  }
}
