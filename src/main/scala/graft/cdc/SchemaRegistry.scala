package graft.cdc

import org.apache.spark.sql.types.StructType

import SchemaEvolution.{Backward, Compatible, Incompatible, Mode, Verdict}

/** In-engine schema registry: versioned schemas per subject, compat-gated
  * registration — the data-plane behavior of the Glue/Confluent registry
  * the reference wires up (`/root/reference/bin/mskc-connector.sh:273-281`
  * registry creation, `:443-445` auto-registration + BACKWARD gate;
  * subject-per-topic naming as in `README.md:436`).
  *
  * Registration is auto (new subjects accepted, matching
  * `schemaAutoRegistrationEnabled=true`) but evolution is gated: an
  * incompatible schema is rejected exactly like the reference's case 3
  * (`README.md:476-479`). Thread-safe; driver-side only (schemas are
  * metadata, never per-row state).
  */
final class SchemaRegistry(mode: Mode = Backward) {

  private val versions =
    scala.collection.mutable.LinkedHashMap[String, Vector[StructType]]()

  /** Register `schema` under `subject`; returns the new version number
    * (1-based) or the incompatibility verdict.
    */
  def register(subject: String, schema: StructType)
      : Either[Incompatible, Int] = synchronized {
    versions.get(subject) match {
      case None | Some(Vector()) =>
        versions(subject) = Vector(schema)
        Right(1)
      case Some(history) =>
        // idempotent re-register by CONTENT against the whole history,
        // not just the latest version — Confluent/Glue resolve a known
        // schema to its existing version id, which is what lets a
        // crash-replayed stream batch re-present an OLD writer version
        // without polluting the registry or tripping the gate
        val known = history.indexOf(schema)
        if (known >= 0) Right(known + 1)
        else SchemaEvolution.check(history.last, schema, mode) match {
          case Compatible =>
            versions(subject) = history :+ schema
            Right(history.size + 1)
          case i: Incompatible => Left(i)
        }
    }
  }

  /** Would `schema` be accepted for `subject`? (pre-write fail-fast gate,
    * SURVEY.md §4 "Schema validation before produce").
    */
  def checkCompatibility(subject: String, schema: StructType): Verdict =
    synchronized {
      versions.get(subject).flatMap(_.lastOption) match {
        case None => Compatible
        case Some(prev) => SchemaEvolution.check(prev, schema, mode)
      }
    }

  def latest(subject: String): Option[StructType] =
    synchronized(versions.get(subject).flatMap(_.lastOption))

  def history(subject: String): Seq[StructType] =
    synchronized(versions.getOrElse(subject, Vector.empty))

  /** Merged read-schema for scanning the subject's whole history. */
  def readSchema(subject: String): Option[StructType] = synchronized {
    versions.get(subject).filter(_.nonEmpty)
      .map(SchemaEvolution.mergeReadSchema)
  }

  def subjects: Seq[String] = synchronized(versions.keys.toSeq)
}
