package graft

import graft.functions.{FloatDotExpr, JavaHashPartitionExpr, MinHashSigExpr, Murmur2PartitionExpr, PolyHashExpr, ShingleHashesExpr, ShinglesExpr, SimHash32Expr}
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
    ext.injectFunction((
      FunctionIdentifier("murmur2_partition"),
      new ExpressionInfo(classOf[Murmur2PartitionExpr].getName, "murmur2_partition"),
      (exprs: Seq[Expression]) => Murmur2PartitionExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("java_hash_partition"),
      new ExpressionInfo(classOf[JavaHashPartitionExpr].getName, "java_hash_partition"),
      (exprs: Seq[Expression]) => JavaHashPartitionExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHashExpr].getName, "graft_poly_hash"),
      (exprs: Seq[Expression]) => PolyHashExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_f"),
      new ExpressionInfo(classOf[FloatDotExpr].getName, "graft_dot_f"),
      (exprs: Seq[Expression]) => FloatDotExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashesExpr(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => ShinglesExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSigExpr(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32Expr].getName, "graft_simhash32"),
      (exprs: Seq[Expression]) => SimHash32Expr(exprs(0), exprs(1))))
    // Whole-operator extension: plans graft.plans.AsofJoinPlan into its
    // streaming-merge exec (runtime equivalent: AsofJoinNative.install).
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}
