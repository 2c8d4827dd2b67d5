package graft

import graft.operators.{Envelope, Validation}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Envelope synthesis determinism + F3 validity semantics over the real
  * fixture table.
  */
class EnvelopeSpec extends SparkSpec {

  test("envelope is deterministic across reads") {
    val a = Envelope.withEnvelope(Tables.events(spark, sf())).orderBy("event_id")
    val b = Envelope.withEnvelope(Tables.events(spark, sf())).orderBy("event_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ts normalization preserves microseconds under any fixture encoding") {
    import org.apache.spark.sql.types._
    // Expected micros from the RAW read, branched on whatever encoding the
    // fixture generation actually used: nanos-as-LONG truncates (div 1000),
    // NTZ casts value-preserving under the pinned UTC session timezone,
    // TIMESTAMP passes through.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawDf = spark.read.parquet(s"${sf()}/events.parquet")
    val expectedCol = rawDf.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _                => unix_micros(col("ts"))
    }
    val raw = rawDf.select(col("event_id"), expectedCol.as("us")).limit(5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cooked = Tables.events(spark, sf())
      .select(col("event_id"), unix_micros(col("ts")).as("us")).limit(5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cooked.foreach { case (id, us) => assert(us == raw(id)) }
  }

  test("F3: exactly the id%20==0 rows are invalid; metadata struct carries them") {
    val e = Envelope.withEnvelope(Tables.events(spark, sf()))
    val invalid = e.filter(!Validation.isValid(col("event_id_s"), col("props")))
      .select("event_id").collect().map(_.getLong(0))
    assert(invalid.nonEmpty && invalid.forall(_ % 20 == 0))
    val meta = e.select(Envelope.metadataStruct.as("m"))
      .select("m.event_id", "m.tenant_id", "m.priority").limit(3).collect()
    assert(meta.forall(r => r.getString(1).startsWith("tenant-")))
  }
}
