package graft

import graft.functions.ProtoWire._
import graft.io.WireDecoders
import graft.schema.EventSchemas
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** io/WireDecoders — per-subject wire decode vs the EventSchemas
  * StructTypes, plus value round-trips for the nested/enum/map/Any shapes.
  */
class WireDecodersSpec extends SparkSpec {

  import spark.implicits._

  private def norm(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, norm(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(norm(a.elementType), containsNull = true)
    case m: MapType => MapType(norm(m.keyType), norm(m.valueType), valueContainsNull = true)
    case o => o
  }

  test("every well-known subject decodes to exactly its registered schema") {
    val df = Seq(Tuple1(Array.empty[Byte])).toDF("value")
    EventSchemas.wellKnownSubjects.foreach { case (subject, want) =>
      val got = df.select(WireDecoders.forSubject(subject)(col("value")).as("e"))
        .schema("e").dataType
      assert(norm(got) == norm(want), s"schema mismatch for $subject")
    }
  }

  test("tenant.created round-trips nested contact info, enums, maps, lists") {
    val bytes = message(
      lenField(1, stringField(1, "ev-1")),
      lenField(2, message(
        stringField(1, "t-1"), stringField(2, "Acme"), stringField(3, "acme.io"),
        varintField(4, 2),              // ORGANIZATION_TYPE_CORPORATION
        varintField(5, 4),              // TIER_ENTERPRISE
        varintField(6, 3),              // ISOLATION_DATABASE_ISOLATION
        varintField(8, 1),
        timestampField(9, 1700000000L, 0),
        lenField(10, message(           // ContactInfo
          stringField(1, "a@acme.io"),
          lenField(5, message(          // Address
            stringField(2, "Berlin"), doubleField(6, 52.52), doubleField(7, 13.4))))),
        mapEntryField(11, "theme", "dark"),
        lenField(12, "sso".getBytes("UTF-8")),
        lenField(12, "audit".getBytes("UTF-8")))))
    val e = Seq(Tuple1(bytes)).toDF("value")
      .select(WireDecoders.forSubject("nnipa.events.tenant.created-value")(col("value")).as("e"))
      .select("e.*").head()
    val t = e.getStruct(e.fieldIndex("tenant"))
    assert(t.getAs[String]("name") == "Acme")
    assert(t.getAs[String]("organization_type") == "ORGANIZATION_TYPE_CORPORATION")
    assert(t.getAs[String]("subscription_tier") == "TIER_ENTERPRISE")
    assert(t.getAs[String]("isolation_strategy") == "ISOLATION_DATABASE_ISOLATION")
    assert(t.getAs[Boolean]("is_active"))
    val c = t.getStruct(t.fieldIndex("contact_info"))
    assert(c.getAs[String]("email") == "a@acme.io")
    val a = c.getStruct(c.fieldIndex("address"))
    assert(a.getAs[String]("city") == "Berlin" && a.getAs[Double]("latitude") == 52.52)
    assert(t.getAs[Map[String, String]]("settings") == Map("theme" -> "dark"))
    assert(t.getAs[scala.collection.Seq[String]]("enabled_features").toSeq == Seq("sso", "audit"))
  }

  test("tenant.updated renders google.protobuf.Value fields as JSON") {
    // Value kinds: string, number, bool, null, nested struct, list
    def v(body: Array[Byte]) = body
    val strVal = v(stringField(3, "hello"))
    val numVal = v(doubleField(2, 42.0))
    val boolVal = v(varintField(4, 1))
    val nullVal = v(varintField(1, 0))
    val listVal = v(lenField(6, lenField(1, strVal) ++ lenField(1, numVal)))
    val structVal = v(lenField(5,
      lenField(1, stringField(1, "inner") ++ lenField(2, boolVal))))
    def entry(k: String, value: Array[Byte]) =
      lenField(2, stringField(1, k) ++ lenField(2, value))
    val bytes = message(lenField(2, message(
      stringField(1, "t-9"),
      entry("s", strVal), entry("n", numVal), entry("b", boolVal),
      entry("z", nullVal), entry("l", listVal), entry("o", structVal),
      stringField(3, "admin"))))
    val row = Seq(Tuple1(bytes)).toDF("value")
      .select(WireDecoders.forSubject("nnipa.events.tenant.updated-value")(col("value")).as("e"))
      .select("e.update.*").head()
    val cf = row.getAs[Map[String, String]]("changed_fields")
    assert(cf("s") == "\"hello\"")
    assert(cf("n") == "42")
    assert(cf("b") == "true")
    assert(cf("z") == "null")
    assert(cf("l") == "[\"hello\",42]")
    assert(cf("o") == "{\"inner\":true}")
    assert(row.getAs[String]("updated_by") == "admin")
  }

  test("audit.log carries google.protobuf.Any as (type_url, bytes)") {
    val packed = stringField(1, "payload")
    val bytes = message(lenField(2, message(
      stringField(3, "UPDATE"),
      lenField(6, stringField(1, "type.example.com/Old") ++ lenField(2, packed)))))
    val row = Seq(Tuple1(bytes)).toDF("value")
      .select(WireDecoders.forSubject("nnipa.commands.audit.log-value")(col("value")).as("e"))
      .select("e.entry.*").head()
    val old = row.getStruct(row.fieldIndex("old_value"))
    assert(old.getAs[String]("type_url") == "type.example.com/Old")
    assert(old.getAs[Array[Byte]]("value").sameElements(packed))
    assert(row.getStruct(row.fieldIndex("new_value")).getAs[String]("type_url") == "")
    assert(row.getAs[String]("action") == "UPDATE")
  }
}
