package graft.schema

import java.nio.file.{Files, Paths, Path}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Versioned, compatibility-checked schema catalog (SURVEY §1.3) — the
  * Spark-native stand-in for the reference's Confluent Schema Registry
  * usage (`service/SchemaRegistryService.java:56-319`).
  *
  * Subjects follow the `<topic>-value` / `<topic>-key` convention
  * (`SchemaRegistryService.java:277-299`); versions are 1-based; every
  * accepted registration gets a catalog-global schema id
  * (`getSchemaById`, `SchemaRegistryService.java:255`); evolution is
  * gated by a structural compatibility check over `StructType`
  * (default policy FULL_TRANSITIVE, `application.yml:101`, overridable
  * per subject — `SchemaRegistryService.java:190-214`).
  *
  * Compatibility rule (structural translation of the protobuf levels):
  * a field present in both versions must keep its exact type (all
  * levels); BACKWARD additionally forbids *adding* a required field
  * (old data lacks it), FORWARD forbids *removing* a required field
  * (old readers need it), FULL forbids both. `_TRANSITIVE` variants
  * check every prior version, plain ones only the latest; NONE skips
  * the gate.
  *
  * Deletion follows the management-plane semantics the reference
  * exposes (`SchemaRegistryService.java:157-183`): `deleteSubject`
  * drops every version (returning them, registry-style);
  * `deleteVersion` refuses to delete the last remaining version unless
  * forced, and version numbers are never reused after a delete.
  *
  * Persistence is plain JSON-per-subject files (StructType.json) plus a
  * `_catalog_meta.json` sidecar (ids, versions, per-subject policy) —
  * schema metadata is driver-side catalog state, not a distributed
  * dataset. Directories written by older versions (no sidecar) still
  * load, with fresh ids.
  */
final class SchemaCatalog {

  private final case class Entry(version: Int, id: Int, schema: StructType)

  private val store = mutable.LinkedHashMap.empty[String, Vector[Entry]]
  private val compatOverride = mutable.LinkedHashMap.empty[String, String]
  private val highestVersion = mutable.HashMap.empty[String, Int]
  private var nextId = 1

  val defaultCompatibility: String = "FULL_TRANSITIVE"

  def subjectForTopic(topic: String, isKey: Boolean = false): String =
    if (isKey) s"$topic-key" else s"$topic-value"

  private def append(subject: String, schema: StructType): Int = {
    val versions = store.getOrElse(subject, Vector.empty)
    val v = highestVersion.getOrElse(subject, 0) + 1
    store(subject) = versions :+ Entry(v, nextId, schema)
    highestVersion(subject) = v
    nextId += 1
    v
  }

  /** Registers a schema; returns its 1-based version. Re-registering the
    * latest schema is a no-op returning the existing version (registry
    * semantics). Incompatible schemas (per the subject's policy) are
    * refused.
    */
  def register(subject: String, schema: StructType): Int = {
    val versions = store.getOrElse(subject, Vector.empty)
    if (versions.nonEmpty && versions.last.schema == schema) versions.last.version
    else {
      val incompat = incompatibilities(subject, schema)
      require(incompat.isEmpty,
        s"incompatible schema for $subject: ${incompat.mkString("; ")}")
      append(subject, schema)
    }
  }

  /** Forced evolution: bypasses the compatibility gate
    * (`SchemaRegistryService.java:304-319` evolveSchema force flag).
    */
  def forceRegister(subject: String, schema: StructType): Int =
    append(subject, schema)

  def get(subject: String, version: Int): Option[StructType] =
    store.get(subject).flatMap(_.find(_.version == version)).map(_.schema)

  def latest(subject: String): Option[StructType] =
    store.get(subject).flatMap(_.lastOption).map(_.schema)

  def latestVersion(subject: String): Option[Int] =
    store.get(subject).flatMap(_.lastOption).map(_.version)

  def versions(subject: String): Seq[Int] =
    store.get(subject).map(_.map(_.version)).getOrElse(Vector.empty)

  def subjects: Seq[String] = store.keys.toSeq

  /** The catalog-global id of a registered (subject, version). */
  def schemaId(subject: String, version: Int): Option[Int] =
    store.get(subject).flatMap(_.find(_.version == version)).map(_.id)

  /** Schema lookup by global id (`SchemaRegistryService.java:255`):
    * (subject, version, schema), or None for unknown/deleted ids.
    */
  def getById(id: Int): Option[(String, Int, StructType)] =
    store.iterator.flatMap { case (s, es) =>
      es.find(_.id == id).map(e => (s, e.version, e.schema))
    }.nextOption()

  /** Both schemas registered for a topic, keyed "value" / "key" — absent
    * subjects are simply missing (`SchemaRegistryService.java:277-299`).
    */
  def schemasForTopic(topic: String): Map[String, StructType] =
    Seq("value" -> subjectForTopic(topic), "key" -> subjectForTopic(topic, isKey = true))
      .flatMap { case (kind, subject) => latest(subject).map(kind -> _) }
      .toMap

  /** Drops a subject entirely, returning the deleted version numbers
    * (`SchemaRegistryService.java:157-166`); its per-subject policy and
    * version counter go with it.
    */
  def deleteSubject(subject: String): Seq[Int] = {
    val deleted = versions(subject)
    store.remove(subject)
    compatOverride.remove(subject)
    highestVersion.remove(subject)
    deleted
  }

  /** Deletes one version (`SchemaRegistryService.java:173-183`). Refuses
    * to delete the last remaining version unless `force` — a subject with
    * zero versions but live consumers is an outage, not a cleanup. The
    * version number is never reused by later registrations.
    */
  def deleteVersion(subject: String, version: Int, force: Boolean = false): Unit = {
    val entries = store.getOrElse(subject, Vector.empty)
    require(entries.exists(_.version == version),
      s"unknown version $version for subject $subject")
    require(entries.size > 1 || force,
      s"refusing to delete the last version of $subject (use force)")
    val remaining = entries.filterNot(_.version == version)
    if (remaining.isEmpty) { store.remove(subject); () }
    else store(subject) = remaining
  }

  /** Per-subject compatibility override (`SchemaRegistryService.java:190-200`).
    * Levels: NONE, BACKWARD[_TRANSITIVE], FORWARD[_TRANSITIVE],
    * FULL[_TRANSITIVE].
    */
  def setCompatibility(subject: String, level: String): Unit = {
    require(SchemaCatalog.Levels.contains(level), s"unknown compatibility level $level")
    compatOverride(subject) = level
  }

  /** The subject's effective policy: its override, else the global
    * default (`SchemaRegistryService.java:207-214`).
    */
  def getCompatibility(subject: String): String =
    compatOverride.getOrElse(subject, defaultCompatibility)

  /** True when `candidate` is compatible with `subject` under its
    * effective policy.
    */
  def testCompatibility(subject: String, candidate: StructType): Boolean =
    incompatibilities(subject, candidate).isEmpty

  /** All violations of the subject's effective policy. */
  def incompatibilities(subject: String, candidate: StructType): Seq[String] = {
    val level = getCompatibility(subject)
    val entries = store.getOrElse(subject, Vector.empty)
    if (entries.isEmpty || level == "NONE") Seq.empty
    else {
      val targets = if (level.endsWith("_TRANSITIVE")) entries else Vector(entries.last)
      targets.flatMap { e =>
        SchemaCatalog.diffFor(level.stripSuffix("_TRANSITIVE"), e.schema, candidate)
          .map(v => s"v${e.version}: $v")
      }
    }
  }

  /** Persists every subject as `<dir>/<urlencoded-subject>.jsonl` (one
    * schema JSON per version) plus the `_catalog_meta.json` sidecar
    * carrying ids, version numbers, and per-subject policies.
    */
  def save(dir: String): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    store.foreach { case (subject, entries) =>
      val f = d.resolve(java.net.URLEncoder.encode(subject, "UTF-8") + ".jsonl")
      Files.write(f, entries.map(_.schema.json).asJava)
    }
    // one meta line per subject the catalog KNOWS about, not just per
    // subject with surviving versions: a compat override on a versionless
    // subject (valid registry state) and the never-reuse version watermark
    // of a subject whose latest version was deleted both live outside
    // `store`, and dropping them made save/load disagree with in-memory
    // behavior (post-reload registration could reuse a deleted version
    // number, or silently lose a policy)
    val subjectsKnown = (store.keys ++ compatOverride.keys ++ highestVersion.keys)
      .toSeq.distinct
    val meta = subjectsKnown.map { subject =>
      val entries = store.getOrElse(subject, Vector.empty)
      val vs = entries.map(e => s"""{"version":${e.version},"id":${e.id}}""").mkString("[", ",", "]")
      val compat = compatOverride.get(subject)
        .map(c => s""","compat":"$c"""").getOrElse("")
      val highest = highestVersion.get(subject)
        .map(h => s""","highest":$h""").getOrElse("")
      s"""{"subject":${quote(subject)},"entries":$vs$highest$compat}"""
    }
    Files.write(d.resolve("_catalog_meta.json"),
      (meta.toSeq :+ s"""{"next_id":$nextId}""").asJava)
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}

object SchemaCatalog {

  val Levels: Set[String] = Set("NONE",
    "BACKWARD", "BACKWARD_TRANSITIVE",
    "FORWARD", "FORWARD_TRANSITIVE",
    "FULL", "FULL_TRANSITIVE")

  /** Violations making `candidate` incompatible with `prior` under FULL
    * (the strictest single-version rule — kept as the public structural
    * diff).
    */
  def diff(prior: StructType, candidate: StructType): Seq[String] =
    diffFor("FULL", prior, candidate)

  /** Violations under one base level (BACKWARD / FORWARD / FULL). */
  def diffFor(base: String, prior: StructType, candidate: StructType): Seq[String] = {
    val pf = prior.fields.map(f => f.name -> f).toMap
    val cf = candidate.fields.map(f => f.name -> f).toMap
    // BACKWARD: the new schema must read old data -> it may not demand
    // a required field old data never carried
    val added = cf.collect {
      case (n, f) if !pf.contains(n) && !f.nullable =>
        s"added required field '$n'"
    }
    // FORWARD: old readers must read new data -> a field they require
    // may not disappear
    val removed = pf.collect {
      case (n, f) if !cf.contains(n) && !f.nullable =>
        s"removed required field '$n'"
    }
    val changed = cf.collect {
      case (n, f) if pf.contains(n) && pf(n).dataType != f.dataType =>
        s"field '$n' type ${pf(n).dataType.simpleString} -> ${f.dataType.simpleString}"
    }
    (base match {
      case "BACKWARD" => added ++ changed
      case "FORWARD"  => removed ++ changed
      case _          => added ++ removed ++ changed
    }).toSeq
  }

  def load(dir: String): SchemaCatalog = {
    val cat = new SchemaCatalog
    val d = Paths.get(dir)
    if (Files.isDirectory(d)) {
      Files.list(d).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".jsonl")).sortBy(_.toString)
        .foreach { f: Path =>
          val subject = java.net.URLDecoder.decode(
            f.getFileName.toString.stripSuffix(".jsonl"), "UTF-8")
          Files.readAllLines(f).asScala.foreach { json =>
            cat.forceRegister(subject, DataType.fromJson(json).asInstanceOf[StructType])
          }
        }
      // sidecar (if present) restores ids, version numbers, policies
      val metaFile = d.resolve("_catalog_meta.json")
      if (Files.exists(metaFile)) {
        var maxId = cat.nextId
        Files.readAllLines(metaFile).asScala.foreach { line =>
          val subjectR = """"subject":"((?:[^"\\]|\\.)*)"""".r
          val compatR = """"compat":"([A-Z_]+)"""".r
          val entriesR = """\{"version":(\d+),"id":(\d+)\}""".r
          subjectR.findFirstMatchIn(line).foreach { m =>
            val subject = m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
            compatR.findFirstMatchIn(line)
              .foreach(c => cat.setCompatibility(subject, c.group(1)))
            val pairs = entriesR.findAllMatchIn(line)
              .map(e => (e.group(1).toInt, e.group(2).toInt)).toVector
            cat.store.get(subject).filter(_.size == pairs.size).foreach { es =>
              cat.store(subject) = es.zip(pairs).map { case (e, (v, id)) =>
                e.copy(version = v, id = id)
              }
              cat.highestVersion(subject) = pairs.map(_._1).max
              maxId = math.max(maxId, pairs.map(_._2).max + 1)
            }
            // the persisted watermark wins over max-of-surviving-entries:
            // it carries the versions that were deleted before save(), so
            // the never-reuse invariant holds across a reload
            """"highest":(\d+)""".r.findFirstMatchIn(line).foreach { h =>
              cat.highestVersion(subject) =
                math.max(cat.highestVersion.getOrElse(subject, 0), h.group(1).toInt)
            }
          }
          """"next_id":(\d+)""".r.findFirstMatchIn(line)
            .foreach(m => maxId = math.max(maxId, m.group(1).toInt))
        }
        cat.nextId = maxId
      }
    }
    cat
  }
}
