package graft.admin

import scala.collection.mutable

/** Topic management plane (SURVEY §2.1/§2.6 management computations;
  * reference `service/TopicManagementService.java:70-412`).
  *
  * Offline/catalog-backed: the same create/delete/list/describe/alter
  * surface the reference exposes over Kafka AdminClient, kept as local
  * catalog state so the management queries (F8, A3) and naming conventions
  * are testable without a broker. Where a broker exists, the same interface
  * fronts AdminClient (kafka-clients is not on this classpath by design).
  */
object TopicAdmin {

  /** Default topic shape (application.yml:135-141 / TopicManagementService.java:43-56). */
  final case class TopicConfig(
      partitions: Int = 6,
      replicationFactor: Int = 3,
      retentionMs: Long = 7L * 24 * 3600 * 1000,   // 7 d events
      minInSyncReplicas: Int = 2,
      compression: String = "snappy")

  val DlqRetentionMs: Long = 14L * 24 * 3600 * 1000   // 14 d
  val AuditRetentionMs: Long = 28L * 24 * 3600 * 1000 // 28 d

  /** Well-known topic name builders (application.yml:107-132,
    * TopicManagementService.java:574-641).
    */
  def eventTopic(domain: String, action: String): String = s"nnipa.events.$domain.$action"
  def commandTopic(service: String, action: String): String = s"nnipa.commands.$service.$action"
  def dlqTopic(suffix: String): String = s"nnipa.dlq.$suffix"

  /** Retention policy by topic family (W3). */
  def defaultConfigFor(topic: String): TopicConfig =
    if (topic.startsWith("nnipa.dlq.")) TopicConfig(retentionMs = DlqRetentionMs)
    else if (topic.contains(".audit.")) TopicConfig(retentionMs = AuditRetentionMs)
    else TopicConfig()
}

/** Mutable catalog with the reference's admin verbs. */
final class TopicAdmin {
  import TopicAdmin._

  private val topics = mutable.LinkedHashMap.empty[String, TopicConfig]

  def create(name: String, config: Option[TopicConfig] = None): Boolean =
    if (topics.contains(name)) false
    else { topics(name) = config.getOrElse(defaultConfigFor(name)); true }

  def delete(name: String): Boolean = topics.remove(name).isDefined

  /** F8: visible topics — internal (leading underscore) filtered, sorted. */
  def list(): Seq[String] = topics.keys.filterNot(_.startsWith("_")).toSeq.sorted

  def listAll(): Seq[String] = topics.keys.toSeq.sorted

  def describe(name: String): Option[TopicConfig] = topics.get(name)

  /** Alter = replace config (partitions can only grow, as in Kafka). */
  def alter(name: String, config: TopicConfig): Boolean =
    topics.get(name) match {
      case Some(old) if config.partitions >= old.partitions =>
        topics(name) = config; true
      case _ => false
    }

  def exists(name: String): Boolean = topics.contains(name)

  /** Startup bootstrap (`TopicManagementService.createDefaultTopics`,
    * `:571-651`): the reference's default topic set — 6-partition 7-day
    * event/command topics (audit at 28 d), and the 3-partition 14-day DLQ.
    * Existing topics are left untouched (create is idempotent-skip, the
    * reference's catch-and-warn). Returns the names actually created.
    */
  def createDefaultTopics(): Seq[String] = {
    val defaults = Seq(
      eventTopic("tenant", "created") -> defaultConfigFor(eventTopic("tenant", "created")),
      eventTopic("tenant", "updated") -> defaultConfigFor(eventTopic("tenant", "updated")),
      eventTopic("auth", "login") -> defaultConfigFor(eventTopic("auth", "login")),
      eventTopic("auth", "logout") -> defaultConfigFor(eventTopic("auth", "logout")),
      commandTopic("notification", "send") -> defaultConfigFor(commandTopic("notification", "send")),
      commandTopic("audit", "log") -> defaultConfigFor(commandTopic("audit", "log")),
      dlqTopic("events") -> defaultConfigFor(dlqTopic("events")).copy(partitions = 3))
    defaults.collect { case (n, c) if create(n, Some(c)) => n }
  }

  // ---- consumer-group verbs (TopicManagementService.java:258-412) ----

  private val groupOffsets = mutable.LinkedHashMap
    .empty[(String, String, Int), Long] // (group, topic, partition) -> committed

  def commitOffset(group: String, topic: String, partition: Int, offset: Long): Unit =
    groupOffsets((group, topic, partition)) = offset

  def listGroups(): Seq[String] = groupOffsets.keys.map(_._1).toSeq.distinct.sorted

  /** Per-partition committed offsets of one group. */
  def describeGroup(group: String): Map[(String, Int), Long] =
    groupOffsets.collect { case ((g, t, p), o) if g == group => (t, p) -> o }.toMap

  /** Groups whose committed offsets touch a topic (A10 semi-join). */
  def groupsForTopic(topic: String): Seq[String] =
    groupOffsets.keys.collect { case (g, t, _) if t == topic => g }.toSeq.distinct.sorted

  /** Offset reset: rewrite every committed offset of `group` on `topic`
    * via `newOffset(partition, current)` — the earliest/latest/timestamp
    * strategies supply the function (the per-partition targets themselves
    * are a data-plane computation: query a11_offset_reset).
    */
  def resetOffsets(group: String, topic: String,
                   newOffset: (Int, Long) => Long): Int = {
    val touched = groupOffsets.keys.filter(k => k._1 == group && k._2 == topic).toSeq
    touched.foreach { case k @ (_, _, p) => groupOffsets(k) = newOffset(p, groupOffsets(k)) }
    touched.size
  }

  def deleteGroup(group: String): Int = {
    val touched = groupOffsets.keys.filter(_._1 == group).toSeq
    touched.foreach(groupOffsets.remove)
    touched.size
  }
}
