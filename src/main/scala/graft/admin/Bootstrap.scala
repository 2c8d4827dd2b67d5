package graft.admin

import graft.schema.{EventSchemas, SchemaCatalog}

/** Startup initialization (`service/InitializationService.java:16-190`):
  * default topics → schema bootstrap → health probe, in that order, with
  * the reference's never-fail-startup contract — a failing stage is
  * recorded in the returned status, never thrown (`onApplicationReady`
  * catches and logs). The health probe is injectable: in a full
  * deployment it fronts `observe/HealthCheck` over the lag frame; the
  * catalog-only default reports healthy.
  */
object Bootstrap {

  /** `InitializationService.InitializationStatus` (`:193-236`). */
  final case class Status(
      topicsInitialized: Boolean, topicCount: Int,
      schemasInitialized: Boolean, subjectCount: Int,
      healthy: Boolean, errors: Seq[String])

  def initialize(admin: TopicAdmin = new TopicAdmin,
                 catalog: SchemaCatalog = new SchemaCatalog,
                 healthProbe: () => Boolean = () => true): Status = {
    val errors = scala.collection.mutable.ListBuffer.empty[String]

    val topicsOk =
      try { admin.createDefaultTopics(); true }
      catch { case e: Exception => errors += s"topics: ${e.getMessage}"; false }

    val schemasOk =
      try { EventSchemas.bootstrap(catalog); true }
      catch { case e: Exception => errors += s"schemas: ${e.getMessage}"; false }

    val healthy =
      try healthProbe()
      catch { case e: Exception => errors += s"health: ${e.getMessage}"; false }

    Status(
      topicsInitialized = topicsOk, topicCount = admin.listAll().size,
      schemasInitialized = schemasOk, subjectCount = catalog.subjects.size,
      healthy = healthy, errors = errors.toList)
  }
}
