package graft

import java.sql.Timestamp

import graft.operators.Behavior
import org.apache.spark.sql.functions._

/** Behavioral-analytics operator semantics on constructed streams:
  * transition probabilities row-normalize to 1, session paths respect
  * event order / gap boundaries / the step cap, and RFM quartiles are
  * balanced with deterministic tie-breaks.
  */
class BehaviorSpec extends SparkSpec {

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private def day(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("transitionMatrix counts consecutive pairs per user and row-normalizes") {
    import spark.implicits._
    val events = Seq(
      (1L, "a", t(1), 1L), (1L, "b", t(2), 2L), (1L, "a", t(3), 3L), (1L, "c", t(4), 4L),
      (2L, "a", t(1), 5L), (2L, "b", t(2), 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val m = Behavior.transitionMatrix(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // user 1: a->b, b->a, a->c; user 2: a->b
    assert(m.keySet == Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(m(("a", "b")) == ((2L, 0.666667)))
    assert(m(("a", "c")) == ((1L, 0.333333)))
    assert(m(("b", "a")) == ((1L, 1.0)))
  }

  test("transition probabilities sum to 1 per prev_type on the fixture") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val sums = Behavior.transitionMatrix(events, "user_id", "event_type", "ts", "event_id")
      .groupBy("prev_type").agg(sum("p").as("sp")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
      s"probabilities for ${r.getString(0)} sum to ${r.getDouble(1)}"))
  }

  test("sessionPaths: order within session, gap boundary, step cap") {
    import spark.implicits._
    val events = Seq(
      // user 1 session 1: a>b>c ... then 6 more events to exceed the cap
      (1L, "a", day(1, 1), 1L), (1L, "b", day(1, 2), 2L), (1L, "c", day(1, 3), 3L),
      (1L, "d", day(1, 4), 4L), (1L, "e", day(1, 5), 5L), (1L, "f", day(1, 6), 6L),
      // user 1 session 2 (next day, > 12h gap): single event
      (1L, "z", day(2, 7), 7L),
      // user 2: one session, ts tie broken by event_id
      (2L, "y", day(1, 1), 9L), (2L, "x", day(1, 1), 8L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val paths = Behavior.sessionPaths(events, "user_id", "event_type", "ts",
        "event_id", gapSeconds = 12 * 3600L, maxSteps = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(paths((1L, 1L)) == "a>b>c>d>e") // capped at 5 steps
    assert(paths((1L, 2L)) == "z")
    assert(paths((2L, 1L)) == "x>y") // event_id tie-break
  }

  test("rfm: metrics vs global anchor and balanced quartiles") {
    import spark.implicits._
    val events = (1 to 8).flatMap { u =>
      // user u: u purchases of 10.0 each, last on day u; plus a non-purchase
      // view on day 20 (anchors global recency without adding RFM rows)
      (1 to u).map(i => (u.toLong, "purchase", day(i, 12), 10.0)) :+
        ((u.toLong, "view", day(20, 0), 0.0))
    }.toDF("user_id", "event_type", "ts", "value")
    val out = Behavior.rfm(events, "user_id", "event_type", "ts", "value", "purchase")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    assert(out.size == 8)
    // user 8: last purchase day 8, anchor day 20 -> recency 12; 8 buys of 10.
    assert(out(8L)._1 == 12 && out(8L)._2 == 8L && out(8L)._3 == 80.0)
    // recency DESCENDS with user id here, so r-quartiles reverse user order;
    // frequency/monetary quartiles follow descending user id in blocks of 2.
    val rQ = out.toSeq.sortBy(_._1).map(_._2._4)
    val fQ = out.toSeq.sortBy(_._1).map(_._2._5)
    assert(rQ == Seq(4, 4, 3, 3, 2, 2, 1, 1)) // oldest buyers = worst recency
    assert(fQ == Seq(4, 4, 3, 3, 2, 2, 1, 1)) // fewest buys = worst frequency
    // every quartile label appears exactly twice in each dimension
    Seq(rQ, fQ, out.toSeq.map(_._2._6)).foreach { qs =>
      assert(qs.groupBy(identity).view.mapValues(_.size).toMap ==
        Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2))
    }
  }
}
