package graft

import java.sql.Timestamp

import graft.operators.{Funnel, Retention, Sessionize}
import org.apache.spark.sql.functions._

/** Greedy earliest-occurrence funnel semantics on a constructed stream:
  * order violations break the funnel, repeats don't explode rows, and the
  * earliest step-1 pick (not any later repeat) is what downstream steps
  * measure against.
  */
class FunnelSpec extends SparkSpec {

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel depths: completion, order violation, greedy earliest start") {
    import spark.implicits._
    val events = Seq(
      // user 1: clean view -> click -> purchase
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      // user 2: click BEFORE the first view — funnel stops after view
      (2L, "click", t(1)), (2L, "view", t(2)), (2L, "purchase", t(3)),
      // user 3: purchase before the click — stops after click
      (3L, "view", t(1)), (3L, "purchase", t(2)), (3L, "click", t(3)),
      // user 4: repeated views; greedy must anchor on the EARLIEST view
      // or the click at t(3) (< the later view t(5)) would be missed
      (4L, "view", t(5)), (4L, "view", t(1)), (4L, "click", t(3)),
      // user 5: never views — not in the funnel at all
      (5L, "purchase", t(1)))
      .toDF("user_id", "event_type", "ts")

    val times = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))))
      .toMap
    assert(times.keySet == Set(1L, 2L, 3L, 4L))
    assert(times(1L) == ((t(1), t(2), t(3))))
    assert(times(2L) == ((t(2), null, null))) // their only click precedes the view
    assert(times(3L) == ((t(1), t(3), null)))
    assert(times(4L) == ((t(1), t(3), null)))

    val report = Funnel.report(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report == Map("01_view" -> 4L, "02_click" -> 3L, "03_purchase" -> 1L))
  }

  test("retention cohorts: first-day anchoring, distinct daily activity, offset grid") {
    import spark.implicits._
    def d(day: Int, h: Int = 12) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val events = Seq(
      // user 1: cohort day 1, returns day 2 and day 4 (two events on day 2
      // count once)
      (1L, d(1)), (1L, d(2, 9)), (1L, d(2, 18)), (1L, d(4)),
      // user 2: cohort day 1, never returns
      (2L, d(1)),
      // user 3: cohort day 2, returns day 4
      (3L, d(2)), (3L, d(4)))
      .toDF("user_id", "ts").withColumn("event_type", lit("click"))

    val grid = Retention.dailyCohorts(events, "user_id", "ts").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(grid == Map(
      ("2024-01-01", 0) -> 2L, // users 1, 2
      ("2024-01-01", 1) -> 1L, // user 1 on day 2
      ("2024-01-01", 3) -> 1L, // user 1 on day 4
      ("2024-01-02", 0) -> 1L, // user 3
      ("2024-01-02", 2) -> 1L  // user 3 on day 4
    ))
  }

  test("sessionize: gap boundary is inclusive-new, ties deterministic, per-user ordinals") {
    import spark.implicits._
    val events = Seq(
      // user 1: events at 0s, 10min, exactly-30min-after-the-second (new
      // session at >= gap), then 1min later (same session)
      (1L, 1L, t(0)), (1L, 2L, t(10)), (1L, 3L, t(40)), (1L, 4L, t(41)),
      // user 2: single event; equal-ts pair for user 3 orders by event_id
      (2L, 5L, t(0)), (3L, 7L, t(0)), (3L, 6L, t(0)))
      .toDF("user_id", "event_id", "ts")
    val labeled = Sessionize.withSessionIds(events, "user_id", "ts",
      "event_id", gapSeconds = 1800L)
    val byEvent = labeled.collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap // event_id -> session_id
    assert(byEvent(1L) == 1L && byEvent(2L) == 1L,
      "within-gap events share the session")
    assert(byEvent(3L) == 2L, "a gap of exactly gapSeconds opens a new session")
    assert(byEvent(4L) == 2L)
    assert(byEvent(5L) == 1L)
    assert(byEvent(6L) == 1L && byEvent(7L) == 1L,
      "equal-ts events stay in one session regardless of tie order")
    // session count agrees with the session_window aggregate semantics
    val nSessions = labeled.select("user_id", "session_id").distinct().count()
    assert(nSessions == 4L)
  }

  test("sessionize invariants on random streams: gaps, contiguity, boundaries") {
    import spark.implicits._
    // deterministic pseudo-random event times: 40 users x up to 30 events
    // with gaps drawn around the session threshold so both cases are dense
    val rnd = new scala.util.Random(4242L)
    val gapS = 600L
    val events = (1L to 40L).flatMap { u =>
      var cur = 0L
      val n = 1 + rnd.nextInt(30)
      (1 to n).map { i =>
        cur += (rnd.nextInt(3) match {
          case 0 => rnd.nextInt(300).toLong          // well inside the gap
          case 1 => gapS + rnd.nextInt(300).toLong    // clearly beyond
          case _ => gapS - 150 + rnd.nextInt(300).toLong // straddling
        })
        (u, u * 1000 + i, new Timestamp(1700000000000L + cur * 1000L))
      }
    }.toDF("user_id", "event_id", "ts")
    val labeled = Sessionize.withSessionIds(events, "user_id", "ts",
        "event_id", gapS).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(3)))
      .groupBy(_._1)
    labeled.foreach { case (u, rows) =>
      val byTs = rows.sortBy(r => (r._2.getTime, r._1)).toSeq
      // labels are non-decreasing in time order, start at 1, step by <= 1
      val ids = byTs.map(_._3)
      assert(ids.head == 1L, s"user $u first label ${ids.head}")
      ids.sliding(2).foreach { case Seq(a, b) =>
        assert(b == a || b == a + 1, s"user $u labels jump $a -> $b")
      case _ => }
      // same session => gap < gapS; new session => gap >= gapS
      byTs.sliding(2).foreach {
        case Seq((_, t1, s1), (_, t2, s2)) =>
          val gap = (t2.getTime - t1.getTime) / 1000L
          if (s1 == s2) assert(gap < gapS, s"user $u in-session gap $gap")
          else assert(gap >= gapS, s"user $u boundary gap $gap")
        case _ =>
      }
    }
  }

  test("within-session funnel: a step crossing a session boundary does not convert") {
    import spark.implicits._
    // view at 10:00, click at 10:40 — beyond the 30 min gap, so the click
    // opens session 2; the LIFETIME funnel converts, the session funnel
    // must not
    val events = Seq(
      (1L, 1L, "view", t(0)), (1L, 2L, "click", t(40)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val lifetime = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click")).collect()
    assert(lifetime.length == 1 && !lifetime(0).isNullAt(2), "lifetime converts")
    val labeled = Sessionize.withSessionIds(events, "user_id", "ts",
        "event_id", gapSeconds = 1800L)
      .withColumn("sess_key", col("user_id") * 10000L + col("session_id"))
    val inSession = Funnel.funnelTimes(labeled, "sess_key", "event_type", "ts",
      Seq("view", "click")).collect()
    // only session 1 enters the funnel (session 2 has no view), and its
    // click slot stays empty
    assert(inSession.length == 1 && inSession(0).isNullAt(2),
      "session funnel must not convert across the boundary")
  }
}
