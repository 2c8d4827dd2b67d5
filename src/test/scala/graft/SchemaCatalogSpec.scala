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

  test("save/load preserves the never-reuse watermark and versionless overrides") {
    val cat = new SchemaCatalog
    cat.register("t-value", v1)
    cat.register("t-value", v2AddOptional)
    cat.deleteVersion("t-value", 2)              // latest deleted BEFORE save
    cat.setCompatibility("empty-value", "NONE")  // override, zero versions
    val dir = java.nio.file.Files.createTempDirectory("schemacat").toString
    cat.save(dir)
    val loaded = SchemaCatalog.load(dir)
    // the watermark survives the round trip: a post-reload registration may
    // not reuse the deleted version number
    assert(loaded.forceRegister("t-value", v2AddOptional) == 3)
    // a compat override on a subject with no registered versions (valid
    // registry state) is not silently dropped
    assert(loaded.getCompatibility("empty-value") == "NONE")
  }

  test("f16 evolution pair: added-optional passes the gate, a type change is refused") {
    // the SAME v1/v2 descriptors the f16_proto_evolution wire query
    // decodes with — the structural gate and the wire behavior must agree
    import graft.functions.ProtoStruct.{PField, KStr, KI64, KI32, KTs, structOf}
    val v1d = Vector(PField(1, "tenant_id", KStr), PField(2, "name", KStr),
      PField(3, "seats", KI64), PField(4, "created_at", KTs))
    val v2d = v1d ++ Vector(PField(5, "region", KStr), PField(6, "tier", KI32))
    val cat = new SchemaCatalog
    assert(cat.register("evo-value", structOf(v1d)) == 1)
    assert(cat.testCompatibility("evo-value", structOf(v2d)))
    assert(cat.register("evo-value", structOf(v2d)) == 2)
    // the incompatible change: seats int64 -> string must be refused
    val broken = v2d.map(f => if (f.name == "seats") f.copy(kind = KStr) else f)
    assert(!cat.testCompatibility("evo-value", structOf(broken)))
    intercept[IllegalArgumentException](cat.register("evo-value", structOf(broken)))
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

  test("deleteSubject drops every version and returns them (registry semantics)") {
    val cat = new SchemaCatalog
    cat.register("del-value", v1)
    cat.register("del-value", v2AddOptional)
    cat.setCompatibility("del-value", "NONE")
    assert(cat.deleteSubject("del-value") == Seq(1, 2))
    assert(cat.subjects.isEmpty && cat.latest("del-value").isEmpty)
    // policy override died with the subject -> back to the global default
    assert(cat.getCompatibility("del-value") == "FULL_TRANSITIVE")
    assert(cat.deleteSubject("never-registered") == Seq.empty)
  }

  test("deleteVersion refuses the last remaining version unless forced; numbers never reused") {
    val cat = new SchemaCatalog
    cat.register("dv-value", v1)
    cat.register("dv-value", v2AddOptional)
    cat.deleteVersion("dv-value", 1)
    assert(cat.versions("dv-value") == Seq(2))
    assert(cat.get("dv-value", 1).isEmpty)
    assertThrows[IllegalArgumentException](cat.deleteVersion("dv-value", 2))
    assertThrows[IllegalArgumentException](cat.deleteVersion("dv-value", 99, force = true))
    // a new registration continues the version sequence past the deletes
    assert(cat.register("dv-value", v1) == 3)
    cat.deleteVersion("dv-value", 3)
    cat.deleteVersion("dv-value", 2, force = true)
    assert(cat.latestVersion("dv-value").isEmpty)
  }

  test("per-subject compatibility overrides the FULL_TRANSITIVE default") {
    val cat = new SchemaCatalog
    cat.register("c-value", v1)
    assert(cat.getCompatibility("c-value") == "FULL_TRANSITIVE")
    // BACKWARD allows removing a required field (old readers are the
    // FORWARD concern), still refuses adding one or changing a type
    cat.setCompatibility("c-value", "BACKWARD")
    assert(cat.getCompatibility("c-value") == "BACKWARD")
    val removedRequired = StructType(v1.fields.filter(_.name != "event_id"))
    assert(cat.testCompatibility("c-value", removedRequired))
    assert(!cat.testCompatibility("c-value", v2AddRequired))
    assert(!cat.testCompatibility("c-value", v2TypeChange))
    // FORWARD is the mirror: required add ok, required remove refused
    cat.setCompatibility("c-value", "FORWARD")
    assert(cat.testCompatibility("c-value", v2AddRequired))
    assert(!cat.testCompatibility("c-value", removedRequired))
    // NONE waives everything, including type changes
    cat.setCompatibility("c-value", "NONE")
    assert(cat.register("c-value", v2TypeChange) == 2)
    // non-transitive FULL checks only the LATEST version (v2TypeChange),
    // so v1's event_id type no longer constrains candidates
    cat.setCompatibility("c-value", "FULL")
    assert(cat.testCompatibility("c-value",
      v2TypeChange.add(StructField("extra", StringType, nullable = true))))
    assert(!cat.testCompatibility("c-value", v1)) // vs latest: type change
    assertThrows[IllegalArgumentException](cat.setCompatibility("c-value", "SIDEWAYS"))
  }

  test("getSchemaById resolves catalog-global ids; schemasForTopic keys value/key") {
    val cat = new SchemaCatalog
    cat.register("t1-value", v1)
    cat.register("t1-value", v2AddOptional)
    cat.register("t1-key", v1)
    val id2 = cat.schemaId("t1-value", 2).get
    assert(cat.getById(id2).contains(("t1-value", 2, v2AddOptional)))
    assert(cat.getById(9999).isEmpty)
    val forTopic = cat.schemasForTopic("t1")
    assert(forTopic("value") == v2AddOptional) // latest version wins
    assert(forTopic("key") == v1)
    assert(cat.schemasForTopic("no-such-topic").isEmpty)
  }

  test("save/load round-trips ids, version holes, and per-subject policies") {
    val cat = new SchemaCatalog
    cat.register("rt-value", v1)
    cat.register("rt-value", v2AddOptional)
    cat.deleteVersion("rt-value", 1)          // leaves a version hole
    cat.setCompatibility("rt-value", "BACKWARD")
    cat.register("rt-key", v1)
    val idV2 = cat.schemaId("rt-value", 2).get
    val dir = java.nio.file.Files.createTempDirectory("schemacat-meta").toString
    cat.save(dir)
    val loaded = SchemaCatalog.load(dir)
    assert(loaded.versions("rt-value") == Seq(2))
    assert(loaded.schemaId("rt-value", 2).contains(idV2))
    assert(loaded.getById(idV2).contains(("rt-value", 2, v2AddOptional)))
    assert(loaded.getCompatibility("rt-value") == "BACKWARD")
    assert(loaded.getCompatibility("rt-key") == "FULL_TRANSITIVE")
    // id allocation continues past the loaded ids, no collisions
    loaded.register("rt-key", v2AddOptional)
    val newId = loaded.schemaId("rt-key", 2).get
    assert(loaded.getById(newId).contains(("rt-key", 2, v2AddOptional)))
    assert(newId != idV2 && newId != loaded.schemaId("rt-key", 1).get)
    // version numbering also continues past the hole after a reload
    assert(loaded.register("rt-value", v2AddOptional.add(
      StructField("opt2", StringType, nullable = true))) == 3)
  }
}
