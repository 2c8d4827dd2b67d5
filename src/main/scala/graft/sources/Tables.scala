package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders over the driver-generated parquet at
  * `/root/testdata/sf*` (see TESTDATA.md / FIXTURES.md).
  *
  * The `events` table is written with nanosecond parquet timestamps, which
  * Spark refuses by default (`PARQUET_TYPE_ILLEGAL`). We read them as raw
  * nanos (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  * microseconds — the exact semantics DuckDB applies when it coerces
  * TIMESTAMP_NS to its microsecond TIMESTAMP, so oracle comparisons agree.
  *
  * Integer division (`div`) is mandatory: the nano values (~1.7e18) exceed
  * 2^53, so a double-typed `/ 1000` would silently lose precision.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalizes a raw-nanos `ts` LONG column (nanosAsLong read) to a
    * microsecond TIMESTAMP; passthrough when already a timestamp.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }

  /** `events` with `ts` normalized to a microsecond TIMESTAMP. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
