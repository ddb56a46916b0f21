package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Golden Debezium-shaped envelope fixtures (FIXTURES.md B.2): snapshot
  * reads, out-of-order updates, duplicate delivery, delete-then-reinsert,
  * and a key whose final op is a tombstone — replayed through the full
  * decode → dedup → materialize kernel.
  */
class GoldenEnvelopeSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("age", LongType)))

  private def golden: DataFrame = {
    val path = getClass.getResource("/cdc/envelopes.jsonl").getPath
    val raw = spark.read
      .schema(StructType(Seq(
        StructField("key", StringType),
        StructField("value", EnvelopeCodec.envelopeSchema(rowSchema)))))
      .json(path)
    raw.select(col("key"), col("value.before").as("before"),
      col("value.after").as("after"), col("value.source").as("source"),
      col("value.op").as("op"), col("value.ts_us").as("ts_us"))
  }

  private def materialized: DataFrame = {
    val deduped = Materialize.dedupDeliveries(golden,
      Seq("key", "ts_us", "op"))
    Materialize.currentState(deduped, Seq("key"),
      Seq(col("ts_us")))
  }

  test("golden replay: final state matches the hand-computed truth") {
    val state = materialized
      .select(col("key"), col("after.name").as("name"),
        col("after.age").as("age"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(state === Map(
      "1" -> ("alice2", 31L), // out-of-order ts=150 update lost to ts=200
      "3" -> ("carol2", 26L), // duplicate c collapsed, then updated
      "4" -> ("dave2", 51L),  // delete-then-reinsert resurrects the key
      "5" -> ("eve", 22L)))   // untouched single create
    // key 2's latest op is d → tombstoned out entirely
    assert(!state.contains("2"))
  }

  test("duplicate delivery collapses before materialization") {
    val deduped = Materialize.dedupDeliveries(golden, Seq("key", "ts_us", "op"))
    assert(golden.count() === 12)
    assert(deduped.count() === 11) // carol's double-delivered create
  }

  test("wire codec round-trips the golden envelopes losslessly") {
    val withTopic = golden.withColumn("topic", lit("osci.t"))
    val decoded = EnvelopeCodec.decode(
      EnvelopeCodec.encode(withTopic), rowSchema)
    assert(decoded.count() === withTopic.count())
    assert(decoded.select("key", "op", "ts_us", "before", "after")
      .except(withTopic.select("key", "op", "ts_us", "before", "after"))
      .isEmpty)
  }

  test("binary-Avro codec round-trips the golden envelopes losslessly") {
    val withTopic = golden.withColumn("topic", lit("osci.t"))
    val decoded = EnvelopeCodec.decodeAvro(
      EnvelopeCodec.encodeAvro(withTopic), rowSchema)
    assert(decoded.count() === withTopic.count())
    assert(decoded.select("key", "op", "ts_us", "before", "after")
      .except(withTopic.select("key", "op", "ts_us", "before", "after"))
      .isEmpty)
    // nulls survive: op=c rows carry null before, op=d rows null after
    assert(decoded.filter(col("op") === "c")
      .filter(col("before").isNotNull).isEmpty)
    assert(decoded.filter(col("op") === "d")
      .filter(col("after").isNotNull).isEmpty)
  }

  test("Avro wire bytes decode with the plain Apache Avro runtime") {
    // independence check: the bytes are REAL Avro binary, readable by a
    // GenericDatumReader built from the same structural schema — no
    // knowledge of the engine's expression needed.
    val env = EnvelopeCodec.envelopeSchema(rowSchema)
    val row = golden.withColumn("topic", lit("t"))
      .filter(col("op") === "u" && col("key") === "1")
      .orderBy(col("ts_us"))
    val bytes = EnvelopeCodec.encodeAvro(row)
      .select("value").head().getAs[Array[Byte]](0)
    val avroSchema = org.apache.spark.sql.graft.AvroSchemas
      .toAvroSchema(env, "Envelope")
    val reader =
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord](avroSchema)
    val dec = org.apache.avro.io.DecoderFactory.get()
      .binaryDecoder(bytes, null)
    val rec = reader.read(null, dec)
    assert(rec.get("op").toString === "u")
    val after = rec.get("after")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(after.get("name").toString.startsWith("alice"))
    assert(rec.get("before") != null)
  }

  test("permissive Avro decode quarantines poison pills, strict fails") {
    import spark.implicits._
    val good = EnvelopeCodec.encodeAvro(golden.withColumn("topic", lit("t")))
    val poison = Seq(("x", Array[Byte](1, 2, 3), "t"))
      .toDF("key", "value", "topic")
    val wire = good.unionByName(poison)

    val permissive = EnvelopeCodec.decodeAvro(wire, rowSchema,
      permissive = true)
    assert(permissive.count() === golden.count() + 1)
    // poison row decodes to a null envelope (op is non-null in every
    // real record) and is filterable; good rows decode intact
    assert(permissive.filter(col("op").isNull).count() === 1)
    assert(permissive.filter(col("op").isNotNull).count() === golden.count())

    // NB: count() would prune the decode expression — materialize rows.
    // Local mode may surface the raw decode error unwrapped.
    val strict = EnvelopeCodec.decodeAvro(wire, rowSchema)
    assertThrows[Exception] {
      strict.collect()
    }
  }

  test("mixed-version binary-Avro history decodes and normalizes") {
    val reg = new SchemaRegistry()
    reg.register("person-avro", rowSchema)
    val v2 = StructType(rowSchema.fields :+
      StructField("email", StringType, nullable = true))
    assert(reg.register("person-avro", v2).isRight)

    // v1 records encoded under the v1 row schema
    val wireV1 = EnvelopeCodec
      .encodeAvro(golden.withColumn("topic", lit("t")))
      .withColumn("schema_version", lit(1))
    // one v2 record (extra email column) encoded under the v2 schema
    import spark.implicits._
    val v2env = Seq(("9", "zoe", 20L, "z@x"))
      .toDF("id9", "name9", "age9", "email9")
      .select(col("id9").as("key"),
        lit(null).cast(v2).as("before"),
        struct(col("id9").cast("long").as("id"), col("name9").as("name"),
          col("age9").as("age"), col("email9").as("email")).as("after"),
        struct(lit("d").as("db"), lit("t").as("table"),
          lit(1L).as("server_id"), lit(900L).as("ts_us")).as("source"),
        lit("c").as("op"), lit(900L).as("ts_us"), lit("t").as("topic"))
    val wireV2 = EnvelopeCodec.encodeAvro(v2env)
      .withColumn("schema_version", lit(2))

    val decoded = EnvelopeCodec.decodeEvolvedAvro(
      wireV1.unionByName(wireV2), reg, "person-avro")
    assert(decoded.count() === 13)
    assert(decoded.filter(col("schema_version") === 1)
      .filter(col("after").isNotNull)
      .filter(col("after.email").isNotNull).isEmpty)
    assert(decoded.filter(col("key") === "9")
      .select(col("after.email")).head().getString(0) === "z@x")
  }

  test("evolved history decodes per-version and normalizes columns") {
    val reg = new SchemaRegistry()
    reg.register("person-value", rowSchema)
    val v2 = StructType(rowSchema.fields :+
      StructField("email", StringType, nullable = true))
    assert(reg.register("person-value", v2).isRight)

    val wireV1 = EnvelopeCodec.encode(golden.withColumn("topic", lit("t")))
      .withColumn("schema_version", lit(1))
    val v2row = """{"before": null, "after": {"id": 9, "name": "zoe",
      "age": 20, "email": "z@x"},
      "source": {"db": "d", "table": "t", "server_id": 1, "ts_us": 900},
      "op": "c", "ts_us": 900}""".replaceAll("\n\\s*", " ")
    import spark.implicits._
    val wireV2 = Seq(("9", v2row, "t", 2))
      .toDF("key", "value", "topic", "schema_version")
    val decoded = EnvelopeCodec.decodeEvolved(
      wireV1.unionByName(wireV2), reg, "person-value")
    assert(decoded.count() === 13)
    // v1 rows surface the v2-only column as null
    assert(decoded.filter(col("schema_version") === 1)
      .filter(col("after").isNotNull)
      .filter(col("after.email").isNotNull).isEmpty)
    assert(decoded.filter(col("key") === "9")
      .select(col("after.email")).head().getString(0) === "z@x")
  }
}
