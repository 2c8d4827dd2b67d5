package graft

import graft.schema.SchemaCatalog
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
}
