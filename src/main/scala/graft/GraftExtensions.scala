package graft

import graft.plans.AsofJoinStrategy
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: install the engine's native functions at
  * session build time —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (equivalently `graft.functions.Hashing.register(spark)` at runtime).
  * This is the (c)-tier extension route from the build brief: custom
  * Catalyst expressions registered via SparkSessionExtensions, usable from
  * both the Column API and SQL text.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Same single source of truth as the runtime route
    // (graft.functions.Hashing.register): one entry per native function.
    graft.functions.Hashing.nativeFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(builder.getClass.getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // Whole-operator extension: plans graft.plans.AsofJoinPlan into its
    // streaming-merge exec (runtime equivalent: AsofJoinNative.install).
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}
