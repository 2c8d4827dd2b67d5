package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-operator Catalyst integration for the as-of join ((c)-tier of the
  * custom-operator ladder): a logical node, a planner strategy, and a
  * physical operator, injectable via `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]) or `spark.experimental.extraStrategies`.
  *
  * Semantics are identical to [[graft.operators.AsofJoin.latestAtOrBefore]]
  * (DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`): each left row
  * is enriched with the payload of the latest right row at or before its
  * timestamp, per key; unmatched left rows keep a null payload. Right rows
  * with a null key or timestamp never match (ASOF semantics on both
  * engines); right should be unique per (key, ts).
  *
  * Scale shape: the exec demands `ClusteredDistribution` on the key for both
  * children and per-partition `(key, ts)` ordering — `EnsureRequirements`
  * plans exactly one co-partitioning shuffle and one sort per side, then the
  * merge streams both sorted iterators with O(1) state (the single most
  * recent candidate row), never buffering a key group. Unlike the
  * window-composition form this needs no union materialization and no
  * running-`last` window state, and unlike a range join it never produces
  * intermediate pairs.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    toleranceMicros: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native as-of join. */
object AsofJoinNative {

  /** Make [[AsofJoinStrategy]] available to a live session (idempotent).
    * The declarative route is `spark.sql.extensions=graft.GraftExtensions`,
    * which injects the same strategy at session build time.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** Same contract as [[graft.operators.AsofJoin.latestAtOrBefore]]: `left`
    * keeps all its columns; every non-(key, ts) column of `right` fills in
    * as the as-of payload, null when no right row is at or before. Key and
    * ts must be orderable atomic types (the merge compares evaluated
    * values). `toleranceMicros >= 0` bounds staleness (ts must be
    * TIMESTAMP or integral — both evaluate to a long internally).
    */
  def latestAtOrBefore(left: DataFrame, right: DataFrame,
                       key: String, ts: String,
                       toleranceMicros: Long = -1L): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    if (toleranceMicros >= 0) {
      val dt = left.schema(ts).dataType
      require(dt == org.apache.spark.sql.types.TimestampType ||
          dt == org.apache.spark.sql.types.LongType ||
          dt == org.apache.spark.sql.types.IntegerType,
        s"tolerance requires a timestamp or integral ts column, got $dt")
    }
    val lPlan = left.queryExecution.analyzed
    // Self-join safety: when both sides descend from the same source the
    // attribute ids collide; re-alias the right side to fresh ids (what the
    // analyzer's DeduplicateRelations does for built-in joins).
    val rPlan0 = right.queryExecution.analyzed
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
        .queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column '$n'"))
    val payload = rPlan.output.filterNot(a => a.name == key || a.name == ts)
    val collisions = lPlan.output.map(_.name)
      .filterNot(c => c == key || c == ts).intersect(payload.map(_.name))
    require(collisions.isEmpty,
      s"left/right column collision: ${collisions.mkString(",")}")
    PlanBridge.ofRows(spark, AsofJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key, "left"), attr(lPlan, ts, "left"),
      attr(rPlan, key, "right"), attr(rPlan, ts, "right"), payload,
      toleranceMicros))
  }
}

/** Plans [[AsofJoinPlan]] into [[AsofJoinExec]]; a no-op on everything else. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, payload, tol) =>
      AsofJoinExec(lk, lt, rk, rt, payload, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Streaming sorted-merge as-of join. Children arrive co-partitioned on the
  * key and sorted by (key asc, ts asc); each partition pair is merged in one
  * pass holding only the latest matching right row (copied out of the
  * iterator's reused buffer).
  */
case class AsofJoinExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    toleranceMicros: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyB = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTsB = BindReferences.bindReference(leftTs: Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTsB = BindReferences.bindReference(rightTs: Expression, rOut)
    val payloadB = payload.map(a => BindReferences.bindReference(a: Expression, rOut))
    val keyType = rightKey.dataType
    val nPayload = payload.length
    val tol = toleranceMicros
    val numOutputRows = longMetric("numOutputRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Evaluated atomic values box to Comparable (Long, Integer, Double,
      // UTF8String, Decimal, ...); the operator is declared for orderable
      // atomic key/ts types.
      def cmp(a: Any, b: Any): Int =
        a.asInstanceOf[Comparable[Any]].compareTo(b)
      val keyProj = UnsafeProjection.create(Seq(rKeyB))
      val payloadProj = UnsafeProjection.create(payloadB)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      // Null key/ts rows on the right can never match any left row.
      val rBuf = rIter.filter { r =>
        rKeyB.eval(r) != null && rTsB.eval(r) != null
      }.buffered

      // O(1) merge state: the latest right row consumed for the key at hand.
      var matchKeyRow: InternalRow = null
      var matchPayload: InternalRow = null
      var matchTs: Any = null

      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTsB.eval(l)
        var usable = lk != null && lt != null
        if (usable) {
          // Consume right rows at or before (lk, lt). Keys strictly below lk
          // are discarded permanently: left is key-sorted, so no later left
          // row can need them.
          var done = false
          while (!done && rBuf.hasNext) {
            val r = rBuf.head
            val c = cmp(rKeyB.eval(r), lk)
            if (c < 0) rBuf.next()
            else if (c == 0 && cmp(rTsB.eval(r), lt) <= 0) {
              matchKeyRow = keyProj(r).copy()
              matchPayload = payloadProj(r).copy()
              matchTs = rTsB.eval(r)
              rBuf.next()
            } else done = true
          }
          usable = matchPayload != null && cmp(matchKeyRow.get(0, keyType), lk) == 0 &&
            (tol < 0 || lt.asInstanceOf[Number].longValue -
              matchTs.asInstanceOf[Number].longValue <= tol)
        }
        numOutputRows += 1
        resultProj(joined(l, if (usable) matchPayload else nullPayload))
      }
    }
  }
}
