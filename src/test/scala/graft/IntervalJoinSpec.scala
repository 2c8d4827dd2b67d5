package graft

import graft.operators.IntervalJoin
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Click(user_id: Long, click_id: Long, click_ts: Timestamp)
case class Purchase(user_id: Long, purchase_id: Long, purchase_ts: Timestamp)

/** operators/IntervalJoin: the same function must produce identical pairs
  * as a batch equi+range join and as a watermarked stream-stream inner
  * join (state bounded by horizon + watermark delay).
  */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val clicks = Seq(
    Click(1, 101, ts(10, 0)), Click(1, 102, ts(10, 50)),
    Click(2, 201, ts(10, 0)), Click(3, 301, ts(12, 0)))
  private val purchases = Seq(
    Purchase(1, 901, ts(10, 20)),  // matches 101 only (before 102)
    Purchase(1, 902, ts(11, 40)),  // matches 102 only (101 + 1h < 11:40)
    Purchase(2, 903, ts(10, 5)),   // matches 201
    Purchase(2, 904, ts(11, 30)),  // beyond 201 + 1h: no match
    Purchase(3, 905, ts(11, 59)))  // before the user's click: no match

  private val wantPairs =
    Set((901L, 101L), (902L, 102L), (903L, 201L))

  test("batch interval join attributes within the horizon, key-scoped") {
    val got = IntervalJoin.attribute(
        clicks.toDF(), purchases.toDF(), "user_id",
        "click_ts", "purchase_ts", horizonSeconds = 3600)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == wantPairs)
  }

  test("stream-stream interval join emits the same pairs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[Click]
    val purchIn = MemoryStream[Purchase]
    val joined = IntervalJoin.attribute(
      clicksIn.toDF().withWatermark("click_ts", "10 minutes"),
      purchIn.toDF().withWatermark("purchase_ts", "10 minutes"),
      "user_id", "click_ts", "purchase_ts", horizonSeconds = 3600)
    val q = joined.selectExpr("purchase_id", "click_id")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      // batch 1: the early clicks and the early purchases (anything older
      // than the advancing watermark would be — correctly — dropped later)
      clicksIn.addData(clicks.take(3): _*)
      purchIn.addData(purchases(0), purchases(2))
      q.processAllAvailable()
      // batch 2: later arrivals — purchase 902 must still find the
      // buffered click 102 from batch 1's key state
      clicksIn.addData(clicks.drop(3): _*)
      purchIn.addData(purchases(1), purchases(3), purchases(4))
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == wantPairs)
    } finally q.stop()
  }
}
