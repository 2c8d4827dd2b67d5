package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's single `private[sql]`-scoped access point: wrap a custom
  * [[LogicalPlan]] (e.g. [[graft.plans.AsofJoinPlan]]) back into a
  * [[DataFrame]]. Spark exposes no public constructor for this — every
  * extension library that adds whole-operator plans ships exactly this
  * shim, scoped to the one call that needs it. Everything else in the
  * engine lives under `graft.*` on public API only.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
