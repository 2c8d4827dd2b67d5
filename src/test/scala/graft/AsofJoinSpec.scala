package graft

import graft.operators.AsofJoin
import graft.plans.AsofJoinNative
import org.apache.spark.sql.functions._

/** AsofJoin semantics (the DuckDB ASOF LEFT JOIN contract the asof_enrich
  * oracle pins at fixture scale, exercised here on hand-built edges).
  */
class AsofJoinSpec extends SparkSpec {

  test("picks the latest right row at-or-before per key; null when none") {
    import spark.implicits._
    val left = Seq(("k1", 10L, "e1"), ("k1", 20L, "e2"), ("k1", 5L, "e0"),
        ("k2", 10L, "e3"))
      .toDF("k", "ts", "ev")
    val right = Seq(("k1", 10L, "cfgA"), ("k1", 15L, "cfgB"), ("k3", 1L, "cfgX"))
      .toDF("k", "ts", "cfg")
    val got = AsofJoin.latestAtOrBefore(left, right, "k", "ts")
      .select("ev", "cfg").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("e1").contains("cfgA")) // equal timestamps match (inclusive)
    assert(got("e2").contains("cfgB")) // latest earlier update wins
    assert(got("e0").isEmpty)          // nothing at or before
    assert(got("e3").isEmpty)          // key has no right rows at all
    assert(got.size == 4)              // left-join: every left row survives
  }

  test("payload fills atomically — a null field never mixes right rows") {
    import spark.implicits._
    val left = Seq(("k1", 20L)).toDF("k", "ts")
    val right = Seq(("k1", 10L, Some("cfgA"), None: Option[Long]),
        ("k1", 15L, None: Option[String], Some(7L)))
      .toDF("k", "ts", "v1", "v2")
    val row = AsofJoin.latestAtOrBefore(left, right, "k", "ts")
      .select("v1", "v2").collect()(0)
    // the ts=15 row wins as a unit: v1 null, v2 7 — NOT (cfgA, 7)
    assert(row.isNullAt(0) && row.getLong(1) == 7L)
  }

  test("one shuffle on the key, no join: plan stays linear") {
    import spark.implicits._
    val left = Seq(("k1", 10L, "e")).toDF("k", "ts", "ev")
    val right = Seq(("k1", 5L, "c")).toDF("k", "ts", "cfg")
    val plan = AsofJoin.latestAtOrBefore(left, right, "k", "ts")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"asof composition must not plan a join:\n${plan.take(1500)}")
  }

  // ---- native whole-operator path (plans.AsofJoinPlan/Strategy/Exec) ----

  test("native: same edge semantics as the composition") {
    import spark.implicits._
    val left = Seq(("k1", 10L, "e1"), ("k1", 20L, "e2"), ("k1", 5L, "e0"),
        ("k2", 10L, "e3"), (null.asInstanceOf[String], 10L, "e4"))
      .toDF("k", "ts", "ev")
    val right = Seq(("k1", 10L, "cfgA"), ("k1", 15L, "cfgB"), ("k3", 1L, "cfgX"),
        (null.asInstanceOf[String], 2L, "cfgNull"))
      .toDF("k", "ts", "cfg")
    val got = AsofJoinNative.latestAtOrBefore(left, right, "k", "ts")
      .select("ev", "cfg").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("e1").contains("cfgA")) // equal ts matches (inclusive)
    assert(got("e2").contains("cfgB")) // latest earlier right row wins
    assert(got("e0").isEmpty)          // nothing at or before
    assert(got("e3").isEmpty)          // key has no right rows
    assert(got("e4").isEmpty)          // null keys never match (both engines)
    assert(got.size == 5)              // left-join: every left row survives
  }

  test("native == composition on a seeded random workload (shared lineage)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = Seq.tabulate(800) { i =>
      (i.toLong, s"t${rnd.nextInt(17)}", rnd.nextInt(500).toLong, rnd.nextDouble())
    }.toDF("event_id", "k", "ts", "v")
    // both sides derive from the same parent -> exercises the attribute-id
    // re-alias path
    val right = base.filter($"event_id" % 9 === 0)
      .groupBy("k", "ts").agg(max("v").as("cfg"))
    val left = base.filter($"event_id" % 2 === 0).select("event_id", "k", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "k", "ts", "cfg").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).sortBy(t => (t._1, t._2))
    val nat = canon(AsofJoinNative.latestAtOrBefore(left, right, "k", "ts"))
    val comp = canon(AsofJoin.latestAtOrBefore(left, right, "k", "ts"))
    assert(nat.length == comp.length)
    assert(nat.sameElements(comp))
  }

  test("staleness bound: a too-old fill nulls out, both paths agree") {
    import spark.implicits._
    val left = Seq(("k1", 100L, "fresh"), ("k1", 500L, "stale"), ("k1", 50L, "none"))
      .toDF("k", "ts", "ev")
    val right = Seq(("k1", 90L, "cfgA")).toDF("k", "ts", "cfg")
    def got(df: org.apache.spark.sql.DataFrame) = df.select("ev", "cfg").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val comp = got(AsofJoin.latestAtOrBefore(left, right, "k", "ts", toleranceMicros = 100L))
    val nat = got(AsofJoinNative.latestAtOrBefore(left, right, "k", "ts", toleranceMicros = 100L))
    for (g <- Seq(comp, nat)) {
      assert(g("fresh").contains("cfgA")) // age 10 <= 100
      assert(g("stale").isEmpty)          // age 410 > 100
      assert(g("none").isEmpty)           // nothing at or before
    }
    // randomized differential with tolerance, shared lineage
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(600) { i =>
      (i.toLong, s"t${rnd.nextInt(11)}", rnd.nextInt(300).toLong, rnd.nextDouble())
    }.toDF("event_id", "k", "ts", "v")
    val r2 = base.filter($"event_id" % 8 === 0).groupBy("k", "ts").agg(max("v").as("cfg"))
    val l2 = base.filter($"event_id" % 2 === 1).select("event_id", "k", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "cfg").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    assert(canon(AsofJoinNative.latestAtOrBefore(l2, r2, "k", "ts", 40L))
      .sameElements(canon(AsofJoin.latestAtOrBefore(l2, r2, "k", "ts", 40L))))
  }

  // ---- hot-key two-pass variant (range-partition the timeline) ----

  test("ranged == single-pass on a synthetic hot key (>=50% of rows on one key)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // ~60% of rows land on the hot key; the rest spread over 9 cold keys
    val base = Seq.tabulate(1200) { i =>
      val k = if (rnd.nextInt(10) < 6) "hot" else s"cold${rnd.nextInt(9)}"
      (i.toLong, k, rnd.nextInt(400).toLong, rnd.nextDouble())
    }.toDF("event_id", "k", "ts", "v")
    val right = base.filter($"event_id" % 7 === 0)
      .groupBy("k", "ts").agg(max("v").as("cfg"))
    val left = base.filter($"event_id" % 2 === 0).select("event_id", "k", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "k", "ts", "cfg").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).sortBy(t => (t._1, t._2))
    for (buckets <- Seq(1, 4, 32)) {
      val ranged = canon(AsofJoin.latestAtOrBeforeRanged(left, right, "k", "ts", buckets))
      val single = canon(AsofJoin.latestAtOrBefore(left, right, "k", "ts"))
      assert(ranged.length == single.length)
      assert(ranged.sameElements(single), s"mismatch at buckets=$buckets")
    }
    // with the staleness bound
    val rT = canon(AsofJoin.latestAtOrBeforeRanged(left, right, "k", "ts", 8, toleranceMicros = 60L))
    val sT = canon(AsofJoin.latestAtOrBefore(left, right, "k", "ts", toleranceMicros = 60L))
    assert(rT.sameElements(sT))
  }

  test("ranged edge semantics: ties, missing keys, carry across empty slices") {
    import spark.implicits._
    // ts=0 and ts=399 pin the span ends; slice 2 has no right rows, so the
    // left row at ts=250 must fill from the slice-0 boundary carry
    val left = Seq(("k1", 0L, "tie"), ("k1", 250L, "carried"), ("k1", 399L, "late"),
        ("k2", 100L, "nokey"))
      .toDF("k", "ts", "ev")
    val right = Seq(("k1", 0L, "cfg0"), ("k1", 390L, "cfg390"))
      .toDF("k", "ts", "cfg")
    val got = AsofJoin.latestAtOrBeforeRanged(left, right, "k", "ts", buckets = 4)
      .select("ev", "cfg").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("tie").contains("cfg0"))       // inclusive tie at slice start
    assert(got("carried").contains("cfg0"))   // carry-in across an empty slice
    assert(got("late").contains("cfg390"))    // within-slice last wins over carry
    assert(got("nokey").isEmpty)
    assert(got.size == 4)
  }

  test("ranged plan: the big window partitions on (key, slice), carry join broadcasts") {
    import spark.implicits._
    val left = Seq(("k1", 10L, "e")).toDF("k", "ts", "ev")
    val right = Seq(("k1", 5L, "c")).toDF("k", "ts", "cfg")
    val plan = AsofJoin.latestAtOrBeforeRanged(left, right, "k", "ts", 16)
      .queryExecution.executedPlan.toString
    // the hot-key sort is spread: the running-last window keys on __b too
    assert("hashpartitioning\\(k[#\\d]*, __b".r.findFirstIn(plan).isDefined,
      s"running-last window must partition on (key, slice):\n${plan.take(2000)}")
    // the carry-in attaches as a broadcast, never a shuffled join
    assert(plan.contains("BroadcastHashJoin"),
      s"carry join must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no shuffled join allowed on the carry path:\n${plan.take(2000)}")
  }

  test("native plan: AsofJoinExec with exactly one co-partitioning shuffle per side") {
    import spark.implicits._
    val left = Seq(("k1", 10L, "e")).toDF("k", "ts", "ev")
    val right = Seq(("k1", 5L, "c")).toDF("k", "ts", "cfg")
    val plan = AsofJoinNative.latestAtOrBefore(left, right, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native exec missing:\n${plan.take(1500)}")
    val shuffles = "(?i)exchange".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 shuffles, got $shuffles:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.toLowerCase.contains("window"),
      s"native path must not fall back to join/window:\n${plan.take(1500)}")
  }
}
