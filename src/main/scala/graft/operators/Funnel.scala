package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) matching over the event stream — the
  * analytics consumers of an event service ask first: of the users who did
  * step 1, how many went on to step 2 within the stream's order, and so
  * on. (The reference's event taxonomy carries the steps —
  * `events/EventType` enums like view/click/purchase — but ships no
  * sequence operator; this is the Spark-side analytic over the same
  * stream.)
  *
  * Semantics: greedy earliest-occurrence. t1 = the user's earliest step-1
  * event; t_i = the earliest step-i event strictly after t_{i-1}. Greedy
  * is optimal for reachability: taking the earliest occurrence of each
  * step can only enlarge the window for later steps, so a user completes
  * the funnel under SOME assignment iff they complete it under the greedy
  * one.
  *
  * Scale shape: one row per user after the first aggregation, then k-1
  * join+re-aggregate rounds on the SAME user key (co-partitioned after
  * the first shuffle; AQE keeps the small accumulator side broadcast at
  * low depths). No per-user event collection, no row explosion however
  * many times a user repeats a step.
  */
object Funnel {

  /** One row per user who reached step 1: (user, t1, t2, ..., tk) with
    * t_i null once the funnel broke. With `windowSeconds` set, each step
    * must land within that many seconds of the previous one (the
    * "conversion window" real funnels measure) — the greedy-optimality
    * argument still holds per transition: the earliest qualifying
    * occurrence maximizes the remaining window for later steps.
    */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  windowSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (s, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val keys: Seq[Column] = col(userCol) +: (1 to i).map(j => col(s"t$j"))
      val qualifies = windowSeconds.foldLeft(col("_ts") > col(prev)) { (c, w) =>
        c && (unix_micros(col("_ts")) - unix_micros(col(prev)) <= w * 1000000L)
      }
      acc.join(events.filter(col(typeCol) === s)
          .select(col(userCol), col(tsCol).as("_ts")), Seq(userCol), "left")
        .groupBy(keys: _*)
        .agg(min(when(qualifies, col("_ts"))).as(cur))
    }
  }

  /** Conversion report: one row per step — users still in the funnel at
    * that step and their id-sum (a hash-strong checksum column).
    */
  def report(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             windowSeconds: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps, windowSeconds)
    steps.zipWithIndex.map { case (s, i) =>
      times.filter(col(s"t${i + 1}").isNotNull)
        .agg(count(lit(1)).as("n_users"), sum(col(userCol)).as("sum_uids"))
        .select(lit(f"${i + 1}%02d_$s").as("step"), col("n_users"), col("sum_uids"))
    }.reduce(_.unionByName(_)).orderBy("step")
  }
}
