package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary Avro wire codec for change-event envelopes.
  *
  * The reference's data plane is Avro end-to-end: the connector ships
  * `value.converter=AWSKafkaAvroConverter` with GENERIC_RECORD records
  * (`/root/reference/bin/mskc-connector.sh:440-445`) or the Confluent
  * `AvroConverter` (`:455-457`), so a consumer of those topics reads
  * binary Avro on byte one. This sandbox has no `spark-avro` module, but
  * the core Apache Avro runtime IS on Spark's classpath — these
  * expressions are a minimal serde over it for the engine's
  * schema-registry-governed envelope shape (records, nullable unions,
  * primitives, arrays), schema derived structurally from the Catalyst
  * type.
  *
  * Design mirror of `to_avro`/`from_avro`: per-partition reusable
  * writer/reader + encoder, `CodegenFallback` (the cost is the serde
  * call itself, exactly as in spark-avro; encode/decode sit at the wire
  * boundary, not inside hot relational loops).
  */
object AvroSchemas {

  /** Catalyst → Avro schema. Every field is union(null, T) — Catalyst
    * nullability is advisory and Debezium's own envelope declares
    * optional before/after the same way. Record names are path-derived
    * so nested records (before/after sharing a row shape) get distinct,
    * stable full names.
    */
  def toAvroSchema(dt: DataType, path: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(et, _) =>
      Schema.createArray(nullable(toAvroSchema(et, path + "_item")))
    case st: StructType =>
      val fields = st.fields.map { f =>
        new Schema.Field(f.name,
          nullable(toAvroSchema(f.dataType, path + "_" + f.name)), null, null)
      }
      Schema.createRecord(path, null, "graft.avro", false,
        fields.toSeq.asJava)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported Avro envelope type: $other")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  /** Catalyst value → Avro generic value (schema-directed). */
  def toAvro(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    // unwrap union(null, T)
    val s = if (schema.getType == Schema.Type.UNION) schema.getTypes.get(1)
            else schema
    dt match {
      case StringType => value.asInstanceOf[UTF8String].toString
      case BinaryType => java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case LongType | IntegerType | DoubleType | FloatType | BooleanType =>
        value
      case ArrayType(et, _) =>
        val arr = value.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(toAvro(arr.get(i, et), et, s.getElementType))
          i += 1
        }
        out
      case st: StructType =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.length) {
          val f = st.fields(i)
          val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          rec.put(i, toAvro(v, f.dataType, s.getFields.get(i).schema()))
          i += 1
        }
        rec
      case other =>
        throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }

  /** Avro generic value → Catalyst value. */
  def fromAvro(value: Any, dt: DataType): Any = {
    if (value == null) return null
    dt match {
      case StringType => UTF8String.fromString(value.toString)
      case BinaryType =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case LongType | IntegerType | DoubleType | FloatType | BooleanType =>
        value
      case ArrayType(et, _) =>
        val in = value.asInstanceOf[java.util.Collection[Any]]
        new GenericArrayData(in.asScala.map(fromAvro(_, et)).toArray)
      case st: StructType =>
        val rec = value.asInstanceOf[GenericRecord]
        val out = new Array[Any](st.length)
        var i = 0
        while (i < st.length) {
          out(i) = fromAvro(rec.get(i), st.fields(i).dataType)
          i += 1
        }
        new GenericInternalRow(out)
      case other =>
        throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }
}

/** struct → binary (Avro binary encoding, no container framing — the
  * per-record wire value a registry-converter producer emits).
  */
case class AvroEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_to_avro"

  @transient private lazy val structType =
    child.dataType.asInstanceOf[StructType]
  @transient private lazy val avroSchema =
    AvroSchemas.toAvroSchema(structType, "Envelope")
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](avroSchema)
  // per-thread stream+encoder reuse: one allocation per task, not per
  // row (binaryEncoder(_, reuse) rebinds the buffered encoder cheaply)
  @transient private lazy val local =
    new ThreadLocal[(ByteArrayOutputStream,
        Array[org.apache.avro.io.BinaryEncoder])] {
      override def initialValue() =
        (new ByteArrayOutputStream(), Array(null: org.apache.avro.io.BinaryEncoder))
    }

  override protected def nullSafeEval(input: Any): Any = {
    val rec = AvroSchemas
      .toAvro(input, structType, avroSchema).asInstanceOf[GenericRecord]
    val (baos, encHolder) = local.get()
    baos.reset()
    val enc = EncoderFactory.get().binaryEncoder(baos, encHolder(0))
    encHolder(0) = enc
    writer.write(rec, enc)
    enc.flush()
    baos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AvroEncode = copy(child = newChild)
}

/** binary → struct with the given Catalyst read schema (writer schema =
  * reader schema — version dispatch happens a level up in
  * [[graft.cdc.EnvelopeCodec.decodeEvolved]], exactly as a registry
  * consumer resolves the writer version before decoding).
  *
  * `failOnError = false` is PERMISSIVE mode: malformed bytes decode to
  * null instead of failing the task — the from_json/from_avro
  * convention that lets a pipeline quarantine poison-pill records
  * (`WHERE decoded IS NULL`) rather than dying mid-stream.
  */
case class AvroDecode(child: Expression, schema: StructType,
                      failOnError: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_from_avro"

  @transient private lazy val avroSchema =
    AvroSchemas.toAvroSchema(schema, "Envelope")
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](avroSchema)
  @transient private lazy val local =
    new ThreadLocal[Array[org.apache.avro.io.BinaryDecoder]] {
      override def initialValue() =
        Array(null: org.apache.avro.io.BinaryDecoder)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val holder = local.get()
    val dec = DecoderFactory.get()
      .binaryDecoder(input.asInstanceOf[Array[Byte]], holder(0))
    holder(0) = dec
    if (failOnError) AvroSchemas.fromAvro(reader.read(null, dec), schema)
    else
      try AvroSchemas.fromAvro(reader.read(null, dec), schema)
      catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AvroDecode = copy(child = newChild)
}
