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

  /** Hot-key escape hatch: [[latestAtOrBefore]] with the running-last
    * split into a two-pass prefix scan, so a pathologically hot key no
    * longer serializes its sort in one partition.
    *
    * Pass 1 range-partitions each key's timeline into `buckets` uniform
    * time slices ("__b", a monotone function of ts — equal timestamps land
    * in the same slice, preserving the right-before-left tie order) and
    * runs the running `last(payload)` window per (key, slice): the hot
    * key's sort spreads across `buckets` partitions. Pass 2 computes each
    * slice's carry-in — the latest right payload of any EARLIER slice —
    * on a frame of at most (keys × buckets) rows (per-slice `max_by`
    * aggregate + running-last over slice numbers), broadcast back. A left
    * row's fill is then `coalesce(within-slice last, carry-in)`.
    *
    * Same contract as [[latestAtOrBefore]] (left join, inclusive ties,
    * right unique per (key, ts), `toleranceMicros` staleness bound);
    * result equality is spec-pinned on a synthetic hot key
    * (AsofJoinSpec). Cost: one extra tiny aggregate + broadcast join over
    * the one-shuffle composition.
    */
  def latestAtOrBeforeRanged(left: DataFrame, right: DataFrame,
                             key: String, ts: String, buckets: Int = 32,
                             toleranceMicros: Long = -1L): DataFrame = {
    require(buckets > 0, "buckets must be positive")
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

    val tsType = right.schema(ts).dataType
    def micros(c: Column): Column = tsType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }

    val u0 = l.unionByName(r)
      .withColumn("__p",
        when(col("__is_left") === 0,
          struct(payload.map(col) :+ col(ts).as("__rts"): _*)))
    // uniform time slicing over the observed range: a broadcast scalar,
    // computed once (one cheap extra scan of the union)
    val span = u0.agg(min(micros(col(ts))).as("__tmin"),
                      max(micros(col(ts))).as("__tmax"))
    val u = u0.crossJoin(broadcast(span))
      .withColumn("__b",
        least(floor((micros(col(ts)) - col("__tmin")) * buckets /
          greatest(col("__tmax") - col("__tmin") + 1, lit(1L))), lit(buckets - 1L))
          .cast("int"))
      .drop("__tmin", "__tmax")

    val w1 = Window.partitionBy(key, "__b")
      .orderBy(col(ts).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w1))

    // pass 2: per-slice boundary summaries -> carry-in per (key, slice);
    // at most keys x buckets rows, so the join back is a broadcast
    val slices = u.select(key, "__b").distinct()
    val bounds = u.filter(col("__is_left") === 0)
      .groupBy(key, "__b").agg(max_by(col("__p"), micros(col(ts))).as("__blast"))
    val wCarry = Window.partitionBy(key).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = slices.join(bounds, Seq(key, "__b"), "left")
      .withColumn("__carry", last(col("__blast"), ignoreNulls = true).over(wCarry))
      .select(col(key), col("__b"), col("__carry"))

    val packed = within.join(broadcast(carry), Seq(key, "__b"), "left")
      .withColumn("__p", coalesce(col("__p"), col("__carry")))
    val fresh =
      if (toleranceMicros < 0) col("__p").isNotNull
      else col("__p").isNotNull &&
        micros(col(ts)) - micros(col("__p").getField("__rts")) <= toleranceMicros
    payload.foldLeft(packed) { (d, c) =>
      d.withColumn(c, when(fresh, col("__p").getField(c)))
    }
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__p", "__b", "__carry")
  }
}
