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
  * (`SchemaRegistryService.java:277-299`); versions are 1-based; evolution
  * is gated by a structural compatibility check over `StructType`
  * (default policy FULL_TRANSITIVE, `application.yml:101`).
  *
  * Compatibility rule (structural translation of protobuf FULL_TRANSITIVE):
  * fields may be *added* only as nullable, *removed* only if they were
  * nullable, and a field present in both versions must keep its exact
  * type. Checked against every prior version (transitive).
  *
  * Persistence is plain JSON-per-subject files (StructType.json) — schema
  * metadata is driver-side catalog state, not a distributed dataset.
  */
final class SchemaCatalog {

  private val store = mutable.LinkedHashMap.empty[String, Vector[StructType]]

  def subjectForTopic(topic: String, isKey: Boolean = false): String =
    if (isKey) s"$topic-key" else s"$topic-value"

  /** Registers a schema; returns its 1-based version. Re-registering the
    * latest schema is a no-op returning the existing version (registry
    * semantics). Incompatible schemas are refused.
    */
  def register(subject: String, schema: StructType): Int = {
    val versions = store.getOrElse(subject, Vector.empty)
    if (versions.nonEmpty && versions.last == schema) versions.size
    else {
      val incompat = incompatibilities(subject, schema)
      require(incompat.isEmpty,
        s"incompatible schema for $subject: ${incompat.mkString("; ")}")
      store(subject) = versions :+ schema
      versions.size + 1
    }
  }

  /** Forced evolution: bypasses the compatibility gate
    * (`SchemaRegistryService.java:304-319` evolveSchema force flag).
    */
  def forceRegister(subject: String, schema: StructType): Int = {
    val versions = store.getOrElse(subject, Vector.empty)
    store(subject) = versions :+ schema
    versions.size + 1
  }

  def get(subject: String, version: Int): Option[StructType] =
    store.get(subject).flatMap(_.lift(version - 1))

  def latest(subject: String): Option[StructType] = store.get(subject).flatMap(_.lastOption)

  def latestVersion(subject: String): Option[Int] =
    store.get(subject).map(_.size).filter(_ > 0)

  def versions(subject: String): Seq[Int] =
    store.get(subject).map(v => 1 to v.size).getOrElse(Seq.empty)

  def subjects: Seq[String] = store.keys.toSeq

  /** True when `candidate` is FULL_TRANSITIVE-compatible with every
    * registered version of `subject`.
    */
  def testCompatibility(subject: String, candidate: StructType): Boolean =
    incompatibilities(subject, candidate).isEmpty

  /** All violations of the compatibility rule vs every prior version. */
  def incompatibilities(subject: String, candidate: StructType): Seq[String] =
    store.getOrElse(subject, Vector.empty).zipWithIndex.flatMap {
      case (prior, i) => SchemaCatalog.diff(prior, candidate).map(v => s"v${i + 1}: $v")
    }

  /** Persists every subject as `<dir>/<urlencoded-subject>.json` lines
    * (one schema JSON per version).
    */
  def save(dir: String): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    store.foreach { case (subject, versions) =>
      val f = d.resolve(java.net.URLEncoder.encode(subject, "UTF-8") + ".jsonl")
      Files.write(f, versions.map(_.json).asJava)
    }
  }
}

object SchemaCatalog {

  /** Violations making `candidate` incompatible with `prior`. */
  def diff(prior: StructType, candidate: StructType): Seq[String] = {
    val pf = prior.fields.map(f => f.name -> f).toMap
    val cf = candidate.fields.map(f => f.name -> f).toMap
    val added = cf.collect {
      case (n, f) if !pf.contains(n) && !f.nullable =>
        s"added required field '$n'"
    }
    val removed = pf.collect {
      case (n, f) if !cf.contains(n) && !f.nullable =>
        s"removed required field '$n'"
    }
    val changed = cf.collect {
      case (n, f) if pf.contains(n) && pf(n).dataType != f.dataType =>
        s"field '$n' type ${pf(n).dataType.simpleString} -> ${f.dataType.simpleString}"
    }
    (added ++ removed ++ changed).toSeq
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
    }
    cat
  }
}
