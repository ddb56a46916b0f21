package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Schema-history (DDL) event stream — SURVEY.md §2.A S7: the reference
  * routes schema-change events to a dedicated topic
  * (`include.schema.changes=true`, `/root/reference/bin/mskc-connector.sh:399`,
  * history topic `:407-408`) and the registry gates each resulting
  * schema version (`:443-445`).
  *
  * Here a DDL event is `(subject, ts, action, column, dataType,
  * nullable)` with `action ∈ {add_column, drop_column}` — the exact
  * surface the reference's acceptance cases exercise
  * (`README.md:453-480`: ALTER TABLE ADD/DROP COLUMN). Applying the
  * stream folds each event into the subject's current schema and
  * attempts registration; incompatible DDL (add NOT NULL, no default)
  * is rejected and recorded, exactly like case 3's producer failure.
  */
object SchemaHistory {

  final case class DdlEvent(subject: String, ts: Long, action: String,
                            column: String, dataType: String,
                            nullable: Boolean)

  final case class Applied(event: DdlEvent, version: Option[Int],
                           rejection: Option[String])

  private def parseType(name: String): DataType = name.toLowerCase match {
    case "string" | "varchar" | "text" => StringType
    case "int" | "integer" => IntegerType
    case "bigint" | "long" => LongType
    case "double" | "float8" => DoubleType
    case "boolean" | "bool" => BooleanType
    case "timestamp" => TimestampType
    case other => throw new IllegalArgumentException(s"type: $other")
  }

  /** Fold one DDL event into a schema. Unknown columns on drop are a
    * no-op (idempotent replay); duplicate adds replace the field.
    */
  def applyDdl(schema: StructType, e: DdlEvent): StructType = e.action match {
    case "add_column" =>
      StructType(schema.fields.filterNot(_.name == e.column) :+
        StructField(e.column, parseType(e.dataType), e.nullable))
    case "drop_column" =>
      StructType(schema.fields.filterNot(_.name == e.column))
    case other =>
      throw new IllegalArgumentException(s"DDL action: $other")
  }

  /** Replay a batch of DDL events (ordered by ts per subject) against
    * the registry. Rejected events do NOT advance the subject's schema —
    * the producer keeps running on the last good version, which is the
    * deployed stack's behavior when the registry refuses a schema.
    */
  def replay(registry: SchemaRegistry, events: Seq[DdlEvent])
      : Seq[Applied] = {
    val current = scala.collection.mutable.Map[String, StructType]()
    events.sortBy(e => (e.subject, e.ts)).map { e =>
      val base = current.getOrElse(e.subject,
        registry.latest(e.subject).getOrElse(StructType(Seq.empty)))
      val next = applyDdl(base, e)
      registry.register(e.subject, next) match {
        case Right(v) =>
          current(e.subject) = next
          Applied(e, Some(v), None)
        case Left(inc) =>
          Applied(e, None, Some(inc.reasons.mkString("; ")))
      }
    }
  }

  /** DataFrame adapter: replay a DDL-event frame (driver-side fold —
    * schemas are metadata; a DDL stream is tiny by construction).
    */
  def replayFrame(registry: SchemaRegistry, ddl: DataFrame): Seq[Applied] = {
    val events = ddl
      .select("subject", "ts", "action", "column", "dataType", "nullable")
      .collect().toSeq.map { (r: Row) =>
        DdlEvent(r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getString(4), r.getBoolean(5))
      }
    replay(registry, events)
  }
}
