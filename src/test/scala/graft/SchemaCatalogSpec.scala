package graft

import graft.schema.{EventSchemas, SchemaCatalog}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SchemaCatalog semantics (SURVEY §1.3): registration, versioning,
  * FULL_TRANSITIVE structural compatibility, forced evolution, persistence.
  */
class SchemaCatalogSpec extends AnyFunSuite {

  private val v1 = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("tenant_id", StringType, nullable = true)))
  private val v2AddOptional = v1.add(StructField("user_id", StringType, nullable = true))
  private val v2AddRequired = v1.add(StructField("user_id", StringType, nullable = false))
  private val v2TypeChange = StructType(Seq(
    StructField("event_id", IntegerType, nullable = false),
    StructField("tenant_id", StringType, nullable = true)))

  test("register returns 1-based versions; identical latest is a no-op") {
    val cat = new SchemaCatalog
    assert(cat.register("t-value", v1) == 1)
    assert(cat.register("t-value", v1) == 1)
    assert(cat.register("t-value", v2AddOptional) == 2)
    assert(cat.latestVersion("t-value").contains(2))
    assert(cat.versions("t-value") == Seq(1, 2))
    assert(cat.get("t-value", 1).contains(v1))
    assert(cat.latest("t-value").contains(v2AddOptional))
  }

  test("adding an optional field is compatible; required add/type change are not") {
    val cat = new SchemaCatalog
    cat.register("s-value", v1)
    assert(cat.testCompatibility("s-value", v2AddOptional))
    assert(!cat.testCompatibility("s-value", v2AddRequired))
    assert(!cat.testCompatibility("s-value", v2TypeChange))
    assertThrows[IllegalArgumentException](cat.register("s-value", v2TypeChange))
  }

  test("compatibility is transitive across all prior versions") {
    val cat = new SchemaCatalog
    cat.register("u-value", v1)
    cat.register("u-value", v2AddOptional)
    // removing the optional field again is fine; changing event_id never is
    assert(cat.testCompatibility("u-value", v1))
    assert(!cat.testCompatibility("u-value", v2TypeChange))
  }

  test("forceRegister bypasses the gate (evolveSchema force flag)") {
    val cat = new SchemaCatalog
    cat.register("f-value", v1)
    assert(cat.forceRegister("f-value", v2TypeChange) == 2)
    assert(cat.latest("f-value").contains(v2TypeChange))
  }

  test("save/load round-trip preserves subjects and versions") {
    val cat = new SchemaCatalog
    cat.register("nnipa.events.tenant.created-value", v1)
    cat.register("nnipa.events.tenant.created-value", v2AddOptional)
    cat.register("nnipa.events.tenant.created-key", v1)
    val dir = java.nio.file.Files.createTempDirectory("schemacat").toString
    cat.save(dir)
    val loaded = SchemaCatalog.load(dir)
    assert(loaded.subjects.toSet == cat.subjects.toSet)
    assert(loaded.versions("nnipa.events.tenant.created-value") == Seq(1, 2))
    assert(loaded.get("nnipa.events.tenant.created-value", 2).contains(v2AddOptional))
  }

  test("subject naming follows the <topic>-value/-key convention") {
    val cat = new SchemaCatalog
    assert(cat.subjectForTopic("nnipa.events.auth.login") == "nnipa.events.auth.login-value")
    assert(cat.subjectForTopic("nnipa.events.auth.login", isKey = true) == "nnipa.events.auth.login-key")
  }

  test("bootstrap registers the reference's 10 well-known subjects at v1, idempotently") {
    val cat = EventSchemas.bootstrap()
    val expected = Seq(
      "nnipa.events.tenant.created-value", "nnipa.events.tenant.updated-value",
      "nnipa.events.tenant.activated-value", "nnipa.events.tenant.deactivated-value",
      "nnipa.events.auth.login-value", "nnipa.events.auth.logout-value",
      "nnipa.events.auth.login-failed-value", "nnipa.events.auth.password-changed-value",
      "nnipa.commands.notification.send-value", "nnipa.commands.audit.log-value")
    assert(cat.subjects == expected) // registration order preserved
    expected.foreach(s => assert(cat.latestVersion(s).contains(1), s))
    // every subject name derives from its topic via the -value convention
    expected.foreach(s => assert(cat.subjectForTopic(s.stripSuffix("-value")) == s))
    // re-bootstrap on the same catalog is a no-op (registry semantics)
    EventSchemas.bootstrap(cat)
    expected.foreach(s => assert(cat.latestVersion(s).contains(1), s))
  }

  test("bootstrapped schemas carry the common EventMetadata and domain payloads") {
    val cat = EventSchemas.bootstrap()
    // every event embeds metadata (common.proto:38-49) with the 10 fields
    EventSchemas.wellKnownSubjects.foreach { case (subject, _) =>
      val schema = cat.latest(subject).get
      val meta = schema("metadata").dataType.asInstanceOf[StructType]
      assert(meta == EventSchemas.eventMetadata, subject)
      assert(meta.fieldNames.toSeq == Seq("event_id", "correlation_id",
        "source_service", "timestamp", "version", "headers", "tenant_id",
        "user_id", "priority", "retry_count"))
    }
    // spot-check the §1.2 type mapping on the richest payload
    val tenant = cat.latest("nnipa.events.tenant.created-value").get("tenant")
      .dataType.asInstanceOf[StructType]
    assert(tenant("is_active").dataType == BooleanType)
    assert(tenant("created_at").dataType == TimestampType)
    assert(tenant("settings").dataType == MapType(StringType, StringType))
    assert(tenant("enabled_features").dataType == ArrayType(StringType))
    assert(tenant("organization_type").dataType == StringType) // enum -> name
    val contact = tenant("contact_info").dataType.asInstanceOf[StructType]
    assert(contact("address").dataType.asInstanceOf[StructType]("latitude").dataType == DoubleType)
    // google.protobuf.Any -> (type_url, value BINARY)
    val entry = cat.latest("nnipa.commands.audit.log-value").get("entry")
      .dataType.asInstanceOf[StructType]
    assert(entry("old_value").dataType.asInstanceOf[StructType]("value").dataType == BinaryType)
  }

  test("bootstrapped subjects evolve under the same FULL_TRANSITIVE gate") {
    val cat = EventSchemas.bootstrap()
    val subject = "nnipa.events.auth.login-value"
    val evolved = cat.latest(subject).get
      .add(StructField("geo_region", StringType, nullable = true))
    assert(cat.testCompatibility(subject, evolved))
    assert(cat.register(subject, evolved) == 2)
    val broken = StructType(cat.latest(subject).get.fields.map {
      case f if f.name == "metadata" => f.copy(dataType = StringType)
      case f => f
    })
    assert(!cat.testCompatibility(subject, broken))
  }
}
