package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level sessionization: label every event with its gap-based session
  * ordinal, the per-event complement of the `session_window` AGGREGATE the
  * window queries use — downstream work (within-session funnels,
  * session-scoped joins, session sampling) needs the label on the row,
  * not the collapsed window.
  *
  * Scale shape: one shuffle on the user key, one sort per partition —
  * both window frames (the gap lag and the running session count) share
  * the same (user, ts, tiebreak) spec, so Catalyst evaluates them in a
  * single Window operator over a single sort. Ties on `ts` are broken by
  * `tieCol` so the labeling is deterministic.
  */
object Sessionize {

  /** Adds `session_id` (1-based ordinal per user, gap = `gapSeconds`). */
  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
                     tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) >= gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
