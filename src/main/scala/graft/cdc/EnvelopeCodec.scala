package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire codec for change-event envelopes (SURVEY.md §2.A P1-P3).
  *
  * The reference serializes envelopes as Avro with a schema-registry
  * converter (`/root/reference/bin/mskc-connector.sh:440-445`) and keys
  * as strings (`:438`). This sandbox ships no `spark-avro` module, so
  * the wire format here is JSON via `to_json`/`from_json` — the same
  * record-shaped, registry-validated contract; swapping the two
  * functions for `to_avro`/`from_avro` is the only change a real
  * deployment makes.
  *
  * Decode is driven by a [[SchemaRegistry]] subject so mixed-version
  * topic histories decode per-version and normalize
  * ([[SchemaEvolution.normalizeHistory]]).
  */
object EnvelopeCodec {

  /** Envelope schema for a given row-image schema (Debezium 2.2 shape). */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema, nullable = true),
    StructField("after", rowSchema, nullable = true),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("server_id", LongType),
      StructField("ts_us", LongType))), nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_us", LongType, nullable = false)))

  /** Encode to the keyed wire record: (key string, value json, topic). */
  def encode(envelopes: DataFrame): DataFrame =
    envelopes.select(
      col("key").cast("string").as("key"),
      to_json(struct(col("before"), col("after"), col("source"),
        col("op"), col("ts_us"))).as("value"),
      col("topic"))

  /** Decode keyed wire records with an explicit value schema. */
  def decode(records: DataFrame, rowSchema: StructType): DataFrame =
    records.select(
      col("key").cast("string").as("key"),
      from_json(col("value"), envelopeSchema(rowSchema)).as("env"),
      col("topic"))
      .select(col("key"), col("env.before").as("before"),
        col("env.after").as("after"), col("env.source").as("source"),
        col("env.op").as("op"), col("env.ts_us").as("ts_us"), col("topic"))

  /** Encode to the keyed BINARY-AVRO wire record — the reference's
    * actual wire format (`/root/reference/bin/mskc-connector.sh:440-445`:
    * GlueSchemaRegistry AvroConverter, GENERIC_RECORD). Value bytes are
    * raw Avro binary encoding of the envelope record, the payload a
    * registry converter frames.
    */
  def encodeAvro(envelopes: DataFrame,
                 passthrough: Seq[String] = Nil): DataFrame =
    envelopes.select(
      (Seq(
        col("key").cast("string").as("key"),
        org.apache.spark.sql.graft.Native.toAvro(
          struct(col("before"), col("after"), col("source"),
            col("op"), col("ts_us"))).as("value"),
        col("topic")) ++ passthrough.map(col)): _*)

  /** Decode keyed binary-Avro wire records with an explicit row schema.
    * `passthrough` columns (consumer-side record metadata — the Kafka
    * topic/partition/offset analog) ride alongside untouched.
    * `permissive = true` nulls malformed values (poison pills) so the
    * pipeline can quarantine them (`WHERE op IS NULL`) instead of dying.
    */
  def decodeAvro(records: DataFrame, rowSchema: StructType,
                 passthrough: Seq[String] = Nil,
                 permissive: Boolean = false): DataFrame =
    records.select(
      (Seq(
        col("key").cast("string").as("key"),
        org.apache.spark.sql.graft.Native.fromAvro(
          col("value"), envelopeSchema(rowSchema),
          failOnError = !permissive).as("env"),
        col("topic")) ++ passthrough.map(col)): _*)
      .select((Seq(col("key"), col("env.before").as("before"),
        col("env.after").as("after"), col("env.source").as("source"),
        col("env.op").as("op"), col("env.ts_us").as("ts_us"),
        col("topic")) ++ passthrough.map(col)): _*)

  /** Decode a topic history whose value schema evolved: each version's
    * slice decodes with its registered schema, then the frames normalize
    * into the merged read-schema (absent columns null) — the consumer
    * view of a BACKWARD-compatible history.
    *
    * `versionCol` tags each record with its producer schema version
    * (1-based registry version).
    */
  def decodeEvolved(records: DataFrame, registry: SchemaRegistry,
                    subject: String, versionCol: String = "schema_version")
      : DataFrame =
    decodeEvolvedWith(records, registry, subject, versionCol, decode)

  /** [[decodeEvolved]] for a binary-Avro topic history: identical
    * version dispatch, Avro serde per slice — the registry-consumer
    * resolution path (writer version looked up, then decoded).
    * `passthrough` columns ride alongside each slice untouched.
    */
  def decodeEvolvedAvro(records: DataFrame, registry: SchemaRegistry,
                        subject: String,
                        versionCol: String = "schema_version",
                        passthrough: Seq[String] = Nil)
      : DataFrame =
    decodeEvolvedWith(records, registry, subject, versionCol,
      decodeAvro(_, _, passthrough))

  private def decodeEvolvedWith(records: DataFrame,
                                registry: SchemaRegistry, subject: String,
                                versionCol: String,
                                decodeFn: (DataFrame, StructType) => DataFrame)
      : DataFrame = {
    val versions = registry.history(subject)
    require(versions.nonEmpty, s"no schemas registered for $subject")
    val frames = versions.zipWithIndex.map { case (rowSchema, i) =>
      decodeFn(records.filter(col(versionCol) === (i + 1)), rowSchema)
        .withColumn(versionCol, lit(i + 1))
    }
    SchemaEvolution.normalizeHistory(frames)
  }
}
