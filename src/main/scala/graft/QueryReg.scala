package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark build plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  * Column names must match between the two — the driver sorts columns by
  * name before hashing values.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryReg {
  /** Assembled in SparkEntry; modules each contribute a Map[String, QueryDef]. */
  def collect(modules: Seq[Map[String, QueryDef]]): Map[String, QueryDef] =
    modules.foldLeft(Map.empty[String, QueryDef]) { (acc, m) =>
      require(acc.keySet.intersect(m.keySet).isEmpty,
        s"duplicate query names: ${acc.keySet.intersect(m.keySet)}")
      acc ++ m
    }
}
