package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohorted retention over the event stream — the other first-ask event
  * analytic next to funnels: of the users whose FIRST activity fell on day
  * D, how many were active again k days later. (Operates on the same raw
  * stream as [[Funnel]]; the reference ships the stream, not the
  * analytic.)
  *
  * Scale shape: the (user, day) activity set is distinct-collapsed FIRST —
  * repeated daily events cost one row — then one aggregation derives each
  * user's cohort day and one co-partitioned join + aggregation produces
  * the (cohort, offset) grid. Everything shuffles on the user key once;
  * the output is bounded by days x days, not data volume.
  */
object Retention {

  /** One row per (cohort_day, offset_days) with the distinct active-user
    * count; offset 0 is the cohort's size.
    */
  def dailyCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val activity = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val cohorts = activity.groupBy("u").agg(min(col("d")).as("cohort_day"))
    // cohort_day as ISO text: DATE round-trips differently through the
    // oracle harness's pandas read (date vs midnight timestamp), so the
    // hashed column is the unambiguous string form
    activity.join(cohorts, "u")
      .withColumn("offset_days", datediff(col("d"), col("cohort_day")))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"))
      .agg(countDistinct("u").as("n_active"))
      .orderBy("cohort_day", "offset_days")
  }
}
