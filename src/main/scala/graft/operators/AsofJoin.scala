package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the most recent right row at or
  * before its timestamp, per key — "what was the live config / schema
  * version / committed offset when this event happened". Spark has no ASOF
  * JOIN operator; the naive encodings are a range join (quadratic blow-up)
  * or a per-row subquery (not expressible). This is the scalable
  * composition: union both sides, one shuffle on the key, and a running
  * `last(payload, ignoreNulls)` over the time-ordered window — linear work,
  * one sort, no pair explosion, whatever the timestamp skew.
  *
  * Tie semantics match DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts` (inclusive): right rows order before left rows at equal
  * timestamps. Rows with no earlier right row keep null payload (left-join
  * semantics). Right must be unique per (key, ts) — pre-aggregate if not,
  * or the fill is nondeterministic (both engines agree on that caveat).
  */
object AsofJoin {

  /** `left` keeps all its columns; every non-(key, ts) column of `right` is
    * filled in as the as-of payload.
    *
    * `toleranceMicros >= 0` bounds staleness: a right row older than the
    * tolerance (in microseconds for TIMESTAMP ts; raw units for numeric
    * ts) no longer fills — "the config applies for at most an hour". The
    * fill itself stays a running `last`; the bound is a post-fill null-out
    * using the carried right timestamp, so the plan shape (one shuffle,
    * one sort, no join) is unchanged.
    */
  def latestAtOrBefore(left: DataFrame, right: DataFrame,
                       key: String, ts: String,
                       toleranceMicros: Long = -1L): DataFrame = {
    val payload = right.columns.filter(c => c != key && c != ts).toSeq
    val leftCols = left.columns.filter(c => c != key && c != ts).toSeq
    require(leftCols.intersect(payload).isEmpty,
      s"left/right column collision: ${leftCols.intersect(payload).mkString(",")}")

    val ordered = (Seq(key, ts, "__is_left") ++ leftCols ++ payload).map(col)
    val l = payload.foldLeft(left.withColumn("__is_left", lit(1))) {
      (d, c) => d.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }.select(ordered: _*)
    val r = leftCols.foldLeft(right.withColumn("__is_left", lit(0))) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(ordered: _*)

    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }

    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Fill one struct, not per-column: a right row with a null inside its
    // payload must still be carried forward atomically (per-column
    // last(ignoreNulls) would mix payloads from different right rows).
    // The right ts rides along as __rts for the staleness bound.
    val packed = l.unionByName(r)
      .withColumn("__p",
        when(col("__is_left") === 0,
          struct(payload.map(col) :+ col(ts).as("__rts"): _*)))
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val tsType = right.schema(ts).dataType
    val fresh =
      if (toleranceMicros < 0) col("__p").isNotNull
      else col("__p").isNotNull &&
        micros(col(ts), tsType) - micros(col("__p").getField("__rts"), tsType) <=
          toleranceMicros
    payload.foldLeft(packed) { (d, c) =>
      d.withColumn(c, when(fresh, col("__p").getField(c)))
    }
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__p")
  }
}
