package graft

import graft.io.KafkaIO
import org.apache.spark.sql.functions._

/** Confluent wire-format prefix handling (SURVEY §7.4.5): the Avro/JSON
  * flavor is magic(1) + schema-id(4); the protobuf flavor additionally
  * carries a zigzag-varint message-index list before the payload.
  */
class KafkaWireSpec extends SparkSpec {

  private val payload = Array[Byte](0x0a, 0x03, 'f', 'o', 'o')
  private val magicId = Array[Byte](0, 0, 0, 0, 1)

  private def strip(wire: Array[Byte],
                    f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Option[Array[Byte]] = {
    import spark.implicits._
    Option(Seq(wire).toDF("value").select(f(col("value")).as("p"))
      .collect()(0).getAs[Array[Byte]]("p"))
  }

  test("Avro/JSON flavor strips exactly the 5-byte magic + schema id") {
    val got = strip(magicId ++ payload, KafkaIO.stripConfluentPrefix)
    assert(got.exists(_.sameElements(payload)))
  }

  test("protobuf flavor skips the compressed single-0 message-index list") {
    val got = strip(magicId ++ Array[Byte](0) ++ payload,
      KafkaIO.stripConfluentProtobufPrefix)
    assert(got.exists(_.sameElements(payload)))
  }

  test("protobuf flavor skips a multi-entry index list (zigzag varints)") {
    // nested message indexes [1, 3]: count 2 -> zigzag 4; 1 -> 2; 3 -> 6
    val got = strip(magicId ++ Array[Byte](4, 2, 6) ++ payload,
      KafkaIO.stripConfluentProtobufPrefix)
    assert(got.exists(_.sameElements(payload)))
  }

  test("S4 sink posture is option-for-option the reference producer config") {
    // config/KafkaConfig.java:69-88 — a drifted option must fail here,
    // not silently change the producer posture on a live cluster
    assert(KafkaIO.sinkOptions("broker:9092") == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "kafka.acks" -> "all",
      "kafka.retries" -> "3",
      "kafka.enable.idempotence" -> "true",
      "kafka.compression.type" -> "snappy",
      "kafka.batch.size" -> "16384",
      "kafka.linger.ms" -> "10",
      "kafka.max.in.flight.requests.per.connection" -> "5"))
  }

  test("S4 batch records: keyed entries project to the sink's record shape") {
    import spark.implicits._
    import org.apache.spark.sql.types.{BinaryType, StringType}
    // the publishBatch(topic, Map<String, Message>) analog: keyed wire
    // payloads, one constant topic
    val events = Seq(("k1", "v-one"), ("k2", "v-two")).toDF("key", "value")
    val rec = KafkaIO.toBatchRecords(events, "nnipa.events.tenant.created")
    assert(rec.schema.fieldNames.toSeq == Seq("key", "value", "topic"))
    assert(rec.schema("key").dataType == BinaryType)
    assert(rec.schema("value").dataType == BinaryType)
    assert(rec.schema("topic").dataType == StringType)
    val rows = rec.collect().map(r => (
      new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
      new String(r.getAs[Array[Byte]]("value"), "UTF-8"),
      r.getAs[String]("topic"))).toSet
    assert(rows == Set(
      ("k1", "v-one", "nnipa.events.tenant.created"),
      ("k2", "v-two", "nnipa.events.tenant.created")))
  }

  test("serialize mirrors: wire bytes round-trip through the strip helpers") {
    import spark.implicits._
    val df = Seq((1, payload), (131071, payload)).toDF("schema_id", "p")
    // Avro/JSON flavor: magic + big-endian id + payload, byte-exact
    val wire = df.select(
        KafkaIO.toConfluentWireFormat(col("schema_id"), col("p")).as("w"),
        col("schema_id"), col("p"))
      .collect()
    wire.foreach { r =>
      val w = r.getAs[Array[Byte]]("w")
      val id = r.getInt(1)
      assert(w(0) == 0 &&
        java.nio.ByteBuffer.wrap(w.slice(1, 5)).getInt == id &&
        w.drop(5).sameElements(payload))
    }
    // and both flavors strip back to the original payload
    val rt = df.select(
      KafkaIO.stripConfluentPrefix(
        KafkaIO.toConfluentWireFormat(col("schema_id"), col("p"))).as("a"),
      KafkaIO.stripConfluentProtobufPrefix(
        KafkaIO.toConfluentProtobufWireFormat(col("schema_id"), col("p"))).as("b"))
      .collect()
    rt.foreach { r =>
      assert(r.getAs[Array[Byte]]("a").sameElements(payload))
      assert(r.getAs[Array[Byte]]("b").sameElements(payload))
    }
  }

  test("protobuf flavor yields null (not a misparse) beyond the 1-byte-varint bound") {
    // first index-list byte with the varint continuation bit set
    val multi = strip(magicId ++ Array[Byte](0x81.toByte, 0x01) ++ payload,
      KafkaIO.stripConfluentProtobufPrefix)
    assert(multi.isEmpty)
    // odd wire byte = zigzag-negative count: invalid, also null
    val neg = strip(magicId ++ Array[Byte](3) ++ payload,
      KafkaIO.stripConfluentProtobufPrefix)
    assert(neg.isEmpty)
  }
}
