package graft

import graft.operators.AsofJoin
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
}
