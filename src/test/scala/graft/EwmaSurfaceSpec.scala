package graft

import graft.streaming.{SeriesPoint, TwsEwma}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.util.Try

/** Cross-surface equivalence: the STREAMING TwsEwma fold over the
  * fixture's daily per-type series emits exactly the rows the
  * oracle-checked batch query `ts_ewma_run` computes — the strongest
  * stream≡batch tie available, because the batch side is itself
  * DuckDB-hash-verified.
  */
class EwmaSurfaceSpec extends SparkSpec {

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

  test("TwsEwma over the fixture daily series equals the oracle-checked ts_ewma_run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.queries.AnalyticsQueries.defs("ts_ewma_run")
      .build(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap

    // the same daily series as stream input, seq = day ordinal
    val series = batch.toSeq.sortBy(_._1).map { case ((tpe, day), (n, _)) =>
      SeriesPoint(tpe, day.replace("-", "").toLong, n)
    }

    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("ewma-surface").toString
      val input = MemoryStream[SeriesPoint]
      // split the feed mid-series to cross a micro-batch boundary
      val (a, b) = series.splitAt(series.length / 2)
      Seq(a, b).foreach { batchRows =>
        if (batchRows.nonEmpty) input.addData(batchRows: _*)
        val q = TwsEwma.ewmaByKey(input.toDS(), alpha = 0.2)
          .writeStream
          .option("checkpointLocation", s"$out/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.EwmaPoint], _: Long) =>
            df.write.mode("append").parquet(s"$out/rows"); ()
          }
          .start()
        q.awaitTermination()
      }
      val got = Try(spark.read.parquet(s"$out/rows")
        .as[graft.streaming.EwmaPoint].collect().toSeq.distinct).getOrElse(Seq.empty)
      assert(got.size == batch.size, s"row counts: stream ${got.size} vs batch ${batch.size}")
      got.foreach { p =>
        val day = p.seq.toString
        val key = (p.key, s"${day.take(4)}-${day.slice(4, 6)}-${day.drop(6)}")
        val (n, ewma) = batch(key)
        assert(p.x == n, s"$key raw value")
        assert(math.rint(p.ewma * 1e6) / 1e6 == ewma,
          s"$key: stream ewma ${p.ewma} must round to the batch value $ewma")
      }
    }
  }
}
