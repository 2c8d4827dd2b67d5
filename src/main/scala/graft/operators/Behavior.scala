package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Behavioral analytics over the event stream: the next layer an analytics
  * consumer builds on the reference's event taxonomy (`events/EventType` —
  * view/click/purchase/...) once Sessionize and Funnel exist — where do
  * users GO next (transition matrix), what do whole sessions look like
  * (path mining), and who are the users worth keeping (RFM segmentation).
  *
  * All three are deterministic batch operators with DuckDB-reproducible
  * oracles; ties on event time are always broken by an explicit `tieCol`.
  */
object Behavior {

  /** Markov transition matrix between consecutive event types per key:
    * one row per (prev_type, next_type) with the count and the row-
    * normalized transition probability.
    *
    * Scale shape: ONE shuffle on the key for the lag window; the
    * aggregation output is |types|^2 rows, so the probability window and
    * final sort are driver-trivial at any corpus size.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(typeCol).as("next_type"),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("prev_type")).cast("double"), 6))
  }

  /** Per-session event-type paths: the first `maxSteps` event types of each
    * gap-based session, joined with `>`. Returns one row per
    * (user, session_id, path).
    *
    * Scale shape: the per-event work (session labels, in-session ordinal)
    * all rides the ONE user-key shuffle+sort — the in-session row number
    * is derived inside the same window spec as the session label
    * (ordinal = running row number minus the session's first row number),
    * so Catalyst evaluates everything in a single Window operator and no
    * second per-event shuffle on (user, session) is needed. The path
    * aggregation then ships one row per SESSION, not per event (the
    * in-partition partial aggregation collapses each session map-side
    * because session rows are contiguous after the window sort).
    */
  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, tieCol: String, gapSeconds: Long,
                   maxSteps: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sessionize.withSessionIds(events, userCol, tsCol, tieCol, gapSeconds)
      .withColumn("rn_user", row_number().over(w))
      // session_id is 1-based and strictly increasing per user, so a session
      // starts where it differs from the previous row's label (0 for row 1).
      .withColumn("is_start", col("session_id") =!=
        coalesce(lag(col("session_id"), 1).over(w), lit(0L)))
      .withColumn("rn",
        col("rn_user") - max(when(col("is_start"), col("rn_user"))).over(wRun) + 1)
      .filter(col("rn") <= maxSteps)
      .groupBy(col(userCol), col("session_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rn").as("i"), col(typeCol).as("t")))),
          x => x.getField("t")),
        ">").as("path"))
  }

  /** RFM (recency / frequency / monetary) user segmentation over one event
    * type: per-user metrics plus exact quartile labels (`ntile(4)` with a
    * deterministic user-id tie-break).
    *
    * Scale shape: the metric aggregation is one user-key shuffle; the
    * quartile labels are an exact global sort over one row per user —
    * correct but single-ordered at any size. A 100 TB deployment keeps the
    * metric stage as-is and swaps the exact `ntile` for bucketing against
    * `approx_percentile(metric, [0.25, 0.5, 0.75])` thresholds (same
    * output schema, sketch-accurate boundaries, no global sort); the exact
    * form here is the oracle-checkable baseline of that path.
    */
  def rfm(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
          valueCol: String, eventType: String): DataFrame = {
    val per = events.filter(col(typeCol) === eventType)
      .groupBy(col(userCol))
      .agg(
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast(DecimalType(12, 2))).cast("double").as("monetary"),
        max(to_date(col(tsCol))).as("last_day"))
    val globalLast = events.agg(max(to_date(col(tsCol))).as("global_last"))
    def quartile(order: Column*): Column = ntile(4).over(Window.orderBy(order: _*))
    per.crossJoin(broadcast(globalLast))
      .withColumn("recency_days", datediff(col("global_last"), col("last_day")))
      .withColumn("r_q", quartile(col("recency_days"), col(userCol)))
      .withColumn("f_q", quartile(col("frequency").desc, col(userCol)))
      .withColumn("m_q", quartile(col("monetary").desc, col(userCol)))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary"), col("r_q"), col("f_q"), col("m_q"))
  }
}
