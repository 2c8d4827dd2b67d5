package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the at-rest analog of the reference's keyed
  * topic partitioning (a Kafka topic hash-places records by key so every
  * consumer of that key reads one partition; a bucketed table hash-places
  * rows by key so every join/agg on that key reads co-located files).
  *
  * 100 TB posture: a fact table that is joined or aggregated on the same
  * key query after query should be written bucketed ONCE — every
  * subsequent `join`/`groupBy` on the bucket key then plans with no
  * Exchange on that side (BucketedPlanSpec pins this). At 1000 executors
  * that removes the dominant all-to-all shuffle from every run of the
  * pipeline; the one-time write cost amortizes across every downstream
  * query. Choose bucket counts as a multiple of the cluster's parallelism
  * and split/merge by powers of two so repartitioning stays cheap.
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted managed parquet table.
    * Sorting by the key lets sort-merge joins skip their per-task sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count:
    * plans shuffle-free (co-located scan -> sort-merge join).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
