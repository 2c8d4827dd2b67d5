package graft

import graft.streaming.{BinRow, DriftRow, TwsDrift}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.util.Try

/** Streaming PSI invariants, fed in three micro-batches over two
  * monitoring windows (one matching the reference, one shifted):
  *
  *  1. the final per-window PSI equals the batch PSI computed over the
  *     window's full data with the identical Laplace-smoothed formula;
  *  2. the matching window stays under the 0.2 alert line, the shifted
  *     window crosses it;
  *  3. PSI is batch-split invariant (counters are associative state).
  */
class TwsDriftSpec extends SparkSpec {

  private val Ref = Array(40L, 30L, 20L, 10L) // reference histogram

  private def psiRef(c: Array[Long]): Double = {
    val n = c.sum
    val rt = Ref.sum
    Ref.indices.map { i =>
      val p = (Ref(i) + 1).toDouble / (rt + Ref.length).toDouble
      val q = (c(i) + 1).toDouble / (n + Ref.length).toDouble
      (p - q) * math.log(p / q)
    }.sum
  }

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

  test("per-window streaming PSI equals the batch formula; shifted window alerts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // window 1 mirrors the reference shape; window 2 is inverted (drift)
    def mk(window: Long, counts: Seq[Int]): Seq[BinRow] =
      counts.zipWithIndex.flatMap { case (k, bin) =>
        Seq.fill(k)(BinRow(window, bin))
      }
    val w1 = mk(1L, Seq(20, 15, 10, 5))
    val w2 = mk(2L, Seq(4, 8, 16, 32))
    val all = (w1 ++ w2).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)

    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-drift").toString
      val input = MemoryStream[BinRow]
      val batches = all.grouped((all.length + 2) / 3).toSeq
      batches.zipWithIndex.foreach { case (rows, bi) =>
        input.addData(rows: _*)
        val q = TwsDrift.monitor(input.toDS(), Ref)
          .writeStream
          .option("checkpointLocation", s"$out/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.Dataset[DriftRow], _: Long) =>
            df.withColumn("feed", lit(bi))
              .write.mode("append").parquet(s"$out/rows"); ()
          }
          .start()
        q.awaitTermination()
      }
      val allRows = Try(spark.read.parquet(s"$out/rows")).toOption.get
      val maxFeed = allRows.agg(max("feed")).head.getInt(0)
      val fin = allRows.filter(col("feed") === maxFeed)
        .select("window", "n", "psi", "drifted")
        .as[(Long, Long, Double, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      val (n1, psi1, d1) = fin(1L)
      val (n2, psi2, d2) = fin(2L)
      assert(n1 == 50L && n2 == 60L)
      // 1. stream == batch formula on the full window data
      assert(math.abs(psi1 - psiRef(Array(20L, 15L, 10L, 5L))) < 1e-12)
      assert(math.abs(psi2 - psiRef(Array(4L, 8L, 16L, 32L))) < 1e-12)
      // 2. alert semantics
      assert(!d1, s"matching window alerted: psi=$psi1")
      assert(d2, s"shifted window failed to alert: psi=$psi2")
    }
  }
}
