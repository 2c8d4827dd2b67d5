package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the scale/ extensions) is
  * registered here as a named deterministic batch query; those with a
  * `oracle` are hash-compared against DuckDB by the driver at sf0.01.
  */
object SparkEntry {

  /** All registered queries, assembled from the per-family modules. */
  val registry: Map[String, QueryDef] = QueryReg.collect(Seq(
    TpchQueries.defs,
    EventQueries.defs,
    StatsQueries.defs,
    WindowQueries.defs,
    ScaleQueries.defs,
    MiscQueries.defs,
    CoverageQueries.defs,
    ScalarQueries.defs,
    SubqueryQueries.defs,
    BehaviorQueries.defs,
    AnalyticsQueries.defs,
    SignalQueries.defs,
    InferenceQueries.defs))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q1_pricing").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, d) => name -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, QueryDef(_, Some(sql), _)) => name -> sql }
}
