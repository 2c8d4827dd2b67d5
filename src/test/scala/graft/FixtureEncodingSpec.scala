package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import graft.sources.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression pin for fixture `ts` encodings (VERDICT r5 #6): the driver
  * has shipped `events.parquet` with nanosecond INT64 timestamps AND with
  * microsecond TIMESTAMP_NTZ (isAdjustedToUTC=false) across rounds. Either
  * way, `Tables.events` must yield a session-timezone TIMESTAMP on which
  * `unix_micros` resolves — a future silent encoding change should fail
  * HERE, by name, not as ten broken queries at dump time.
  */
class FixtureEncodingSpec extends SparkSpec {

  private val wantedMicros = Seq(1700000000000000L, 1700000123456789L)

  private def writeAndRead(rows: Seq[Row], schema: StructType): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fixture-enc").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TIMESTAMP, got ${got.schema("ts").dataType}")
    val micros = got.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    assert(micros == wantedMicros, s"micros mismatch: $micros vs $wantedMicros")
  }

  test("TIMESTAMP_NTZ micros fixture reads as TIMESTAMP, values preserved (UTC session)") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    val rows = wantedMicros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    }
    writeAndRead(rows, schema)
  }

  test("UTC-adjusted TIMESTAMP micros fixture passes through unchanged") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    val rows = wantedMicros.zipWithIndex.map { case (us, i) =>
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      Row(i.toLong, t)
    }
    writeAndRead(rows, schema)
  }

  test("raw-nanos LONG fixture truncates to micros (legacy nanosAsLong path)") {
    // Spark cannot WRITE parquet TIMESTAMP_NS, but the nanosAsLong read of
    // one yields exactly a LongType `ts` — a plain INT64 column exercises
    // the identical normalizeEventTs branch.
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType)))
    val rows = wantedMicros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, us * 1000L + 777L) // sub-micro nanos must truncate away
    }
    writeAndRead(rows, schema)
  }
}
