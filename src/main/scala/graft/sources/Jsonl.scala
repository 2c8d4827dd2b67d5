package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) interchange for document corpora —
  * the de-facto wire format LLM corpus pipelines exchange (export to a
  * labeling vendor, import a crawl dump). Spark's `json` source IS
  * line-delimited JSON; this wrapper pins the two decisions that make a
  * round trip exact rather than approximate:
  *
  *  - reads take an EXPLICIT schema — never inference, which samples the
  *    data (a full extra pass at 100 TB) and widens/narrows types on
  *    whatever the sample contained;
  *  - `ignoreNullFields=false` on write, so a null column survives the
  *    trip as an explicit `"col": null` instead of disappearing and
  *    re-reading as an indistinguishable null-by-absence.
  *
  * Content with embedded newlines, tabs, quotes and non-ASCII survives
  * exactly (JSON string escaping) — spec-pinned on injected content.
  * Scale shape: both directions are narrow per-partition passes; gzip
  * splits per file, so export shards should be written pre-partitioned.
  */
object Jsonl {

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("ignoreNullFields", "false")
      .json(dir)

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)
}
