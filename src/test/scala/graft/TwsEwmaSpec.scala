package graft

import graft.streaming.{EwmaPoint, SeriesPoint, TwsEwma}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.util.Try

/** Streaming EWMA contract: the fold matches the recursive definition,
  * is invariant to micro-batch boundaries (the stream≡batch property the
  * operator's doc promises), and anomaly flags compare against the
  * pre-update level.
  */
class TwsEwmaSpec extends SparkSpec {

  private val alpha = 0.2

  private def reference(xs: Seq[Double]): Seq[Double] =
    xs.tail.scanLeft(xs.head)((acc, x) => alpha * x + (1 - alpha) * acc)

  private def collectOut(out: String): Seq[EwmaPoint] = {
    import spark.implicits._
    // distinct: a replayed micro-batch may append its parquet twice; the
    // operator's output itself is unique per (key, seq)
    Try(spark.read.parquet(s"$out/rows").as[EwmaPoint].collect().toSeq
      .distinct.sortBy(p => (p.key, p.seq))).getOrElse(Seq.empty)
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

  /** Feed each element of `batches` as its own ingestion round: one
    * AvailableNow query run per round over a SHARED checkpoint, so the
    * processor's state must survive query restarts — a stronger form of
    * the cross-micro-batch contract (the default trigger's continuous
    * empty maintenance batches would otherwise never let the query
    * settle in a test).
    */
  private def runStream(batches: Seq[Seq[SeriesPoint]]): Seq[EwmaPoint] = withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("tws-ewma").toString
    val input = MemoryStream[SeriesPoint]
    batches.foreach { b =>
      if (b.nonEmpty) input.addData(b: _*)
      val q = TwsEwma.ewmaByKey(input.toDS(), alpha)
        .writeStream
        .option("checkpointLocation", s"$out/_cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[EwmaPoint], _: Long) =>
          df.write.mode("append").parquet(s"$out/rows"); ()
        }
        .start()
      q.awaitTermination()
    }
    val got = collectOut(out)
    assert(got.size == batches.map(_.size).sum,
      s"wanted ${batches.map(_.size).sum} distinct output rows, got ${got.size}")
    got
  }

  test("streaming fold equals the recursive EWMA definition") {
    val xs = Seq(10.0, 12.0, 8.0, 11.0, 30.0, 9.0)
    val pts = xs.zipWithIndex.map { case (x, i) => SeriesPoint("k", i.toLong, x) }
    val got = runStream(Seq(pts))
    assert(got.map(_.ewma) == reference(xs),
      "one-batch stream output must equal the recursive fold")
  }

  test("output is invariant to micro-batch boundaries") {
    val xs = Seq(5.0, 7.0, 6.0, 40.0, 6.5, 7.5, 6.0)
    val pts = xs.zipWithIndex.map { case (x, i) => SeriesPoint("k", i.toLong, x) }
    val oneBatch = runStream(Seq(pts))
    val perPoint = runStream(pts.map(Seq(_)))
    val mixed = runStream(Seq(pts.take(3), pts.slice(3, 4), pts.drop(4)))
    assert(oneBatch == perPoint, "per-point feed must match single-batch feed")
    assert(oneBatch == mixed, "arbitrary batch split must match single-batch feed")
  }

  test("keys smooth independently and anomaly compares to the pre-update level") {
    val a = Seq(10.0, 10.0, 10.0, 100.0, 10.0).zipWithIndex
      .map { case (x, i) => SeriesPoint("a", i.toLong, x) }
    val b = Seq(100.0, 100.0).zipWithIndex
      .map { case (x, i) => SeriesPoint("b", i.toLong, x) }
    val got = runStream(Seq(a ++ b))
    val byKey = got.groupBy(_.key)
    assert(byKey("b").map(_.ewma) == Seq(100.0, 100.0))
    val aFlags = byKey("a").sortBy(_.seq).map(_.anomaly)
    assert(!aFlags.head, "first point of a key is never anomalous")
    assert(aFlags == Seq(false, false, false, true, true),
      "the 100 spike is anomalous vs ~10, and the drop back is anomalous vs the raised level")
  }
}
