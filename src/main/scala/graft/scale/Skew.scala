package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY §7.4.7 / build-brief "salting for
  * skew").
  *
  * AQE's skew-join handling covers joins; for *aggregations* over heavily
  * skewed keys the standard fix is salting: split each hot key across
  * `nSalts` sub-keys, pre-aggregate, then merge. Two shuffles, but each
  * partition is bounded by total/nSalts — the 100 TB shape for power-law
  * tenant distributions (one tenant = 40% of traffic is the norm in
  * multi-tenant event streams).
  *
  * The salt derives from a deterministic column (not rand()) so results
  * are oracle-checkable; any column with per-row variance works.
  */
object Skew {

  /** Salted two-stage grouped aggregation: counts + decimal-exact sums.
    * Result is identical to a direct groupBy — only the shuffle shape
    * changes.
    */
  def saltedAgg(df: DataFrame, keyCol: String, saltSource: Column, nSalts: Int,
                valueCol: String): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"),
           sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("__s"))
    partial.groupBy(keyCol)
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("sum_value"))
  }
}
