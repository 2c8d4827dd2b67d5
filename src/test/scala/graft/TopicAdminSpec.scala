package graft

import graft.admin.TopicAdmin
import org.scalatest.funsuite.AnyFunSuite

/** Admin-plane catalog semantics (TopicManagementService verbs offline). */
class TopicAdminSpec extends AnyFunSuite {

  test("naming conventions and retention families") {
    assert(TopicAdmin.eventTopic("tenant", "created") == "nnipa.events.tenant.created")
    assert(TopicAdmin.commandTopic("audit", "log") == "nnipa.commands.audit.log")
    assert(TopicAdmin.dlqTopic("events") == "nnipa.dlq.events")
    assert(TopicAdmin.defaultConfigFor("nnipa.events.x.y").retentionMs == 7L * 24 * 3600 * 1000)
    assert(TopicAdmin.defaultConfigFor("nnipa.dlq.x").retentionMs == TopicAdmin.DlqRetentionMs)
    assert(TopicAdmin.defaultConfigFor("nnipa.commands.audit.log").retentionMs == TopicAdmin.AuditRetentionMs)
  }

  test("consumer-group verbs: commit/describe/groups-for-topic/reset/delete") {
    val admin = new TopicAdmin
    admin.commitOffset("cg-1", "nnipa.events.a", 0, 100L)
    admin.commitOffset("cg-1", "nnipa.events.a", 1, 200L)
    admin.commitOffset("cg-2", "nnipa.events.b", 0, 50L)
    assert(admin.listGroups() == Seq("cg-1", "cg-2"))
    assert(admin.describeGroup("cg-1") == Map(("nnipa.events.a", 0) -> 100L,
      ("nnipa.events.a", 1) -> 200L))
    assert(admin.groupsForTopic("nnipa.events.a") == Seq("cg-1"))
    assert(admin.resetOffsets("cg-1", "nnipa.events.a", (_, _) => 0L) == 2)
    assert(admin.describeGroup("cg-1").values.forall(_ == 0L))
    assert(admin.deleteGroup("cg-2") == 1)
    assert(admin.listGroups() == Seq("cg-1"))
  }

  test("create/list/describe/alter/delete with F8 internal filtering") {
    val admin = new TopicAdmin
    assert(admin.create("nnipa.events.tenant.created"))
    assert(!admin.create("nnipa.events.tenant.created"))     // already exists
    assert(admin.create("_internal.metrics"))
    assert(admin.create("nnipa.dlq.events"))
    assert(admin.list() == Seq("nnipa.dlq.events", "nnipa.events.tenant.created"))
    assert(admin.listAll().contains("_internal.metrics"))
    assert(admin.describe("nnipa.events.tenant.created").exists(_.partitions == 6))
    // partitions can only grow
    assert(admin.alter("nnipa.events.tenant.created", TopicAdmin.TopicConfig(partitions = 12)))
    assert(!admin.alter("nnipa.events.tenant.created", TopicAdmin.TopicConfig(partitions = 3)))
    assert(admin.delete("_internal.metrics"))
    assert(!admin.exists("_internal.metrics"))
  }

  test("createDefaultTopics bootstraps the reference topic set, idempotently") {
    val admin = new TopicAdmin
    val created = admin.createDefaultTopics()
    assert(created.size == 7)
    assert(admin.exists("nnipa.events.tenant.created"))
    assert(admin.exists("nnipa.commands.audit.log"))
    // per-family shapes: DLQ is 3 partitions / 14 d, audit 28 d, events 7 d
    assert(admin.describe("nnipa.dlq.events").get.partitions == 3)
    assert(admin.describe("nnipa.dlq.events").get.retentionMs == TopicAdmin.DlqRetentionMs)
    assert(admin.describe("nnipa.commands.audit.log").get.retentionMs == TopicAdmin.AuditRetentionMs)
    assert(admin.describe("nnipa.events.auth.login").get.retentionMs == 7L * 24 * 3600 * 1000)
    // idempotent: existing topics skipped, not clobbered
    admin.alter("nnipa.dlq.events",
      admin.describe("nnipa.dlq.events").get.copy(partitions = 12))
    assert(admin.createDefaultTopics().isEmpty)
    assert(admin.describe("nnipa.dlq.events").get.partitions == 12)
  }

  test("Bootstrap.initialize: topics + schemas + health, never-fail-startup") {
    val status = graft.admin.Bootstrap.initialize()
    assert(status.topicsInitialized && status.topicCount == 7)
    assert(status.schemasInitialized && status.subjectCount == 10)
    assert(status.healthy && status.errors.isEmpty)
    // a blowing-up probe is RECORDED, not thrown (InitializationService
    // catches everything so the app still starts)
    val degraded = graft.admin.Bootstrap.initialize(
      healthProbe = () => throw new IllegalStateException("broker down"))
    assert(degraded.topicsInitialized && degraded.schemasInitialized)
    assert(!degraded.healthy)
    assert(degraded.errors.exists(_.contains("broker down")))
  }

}

/** Native functions resolve from SQL text; the extensions class installs
  * the same builders at session build time (applied to a fresh
  * SparkSessionExtensions here — getOrCreate would ignore the config once
  * any session exists in the test JVM).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("registered native functions resolve from SQL text") {
    graft.functions.Hashing.register(spark)
    val r = spark.sql(
      "SELECT java_hash_partition('tenant-1', 6) AS j, murmur2_partition('tenant-1', 6) AS m")
      .collect()(0)
    assert(r.getInt(0) == math.abs("tenant-1".hashCode) % 6)
    assert(r.getInt(1) >= 0 && r.getInt(1) < 6)
  }

  test("every entry in the native-function table resolves after register") {
    // the extensions route and Hashing.register share this table; a kernel
    // added to functions/ but left out of it would be Column-API-only and
    // silently absent from SQL/extension sessions (the round-1 graft_dot_f
    // gap). Resolve each name through the registry.
    graft.functions.Hashing.register(spark)
    val reg = spark.sessionState.functionRegistry
    graft.functions.Hashing.nativeFunctions.foreach { case (name, _) =>
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from the function registry")
    }
    // and the newest kernel actually evaluates from SQL text
    val fp = spark.sql(
      s"SELECT graft_winnow('a b c d e f g h', 3, 4, ${graft.scale.TextOps.P}) AS f")
      .collect()(0).getSeq[Long](0)
    assert(fp.nonEmpty)
  }

  test("GraftExtensions applies its injections cleanly") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must not throw
  }
}
