package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.{UDF1, UDF2}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

/** Avro (de)serialization without the spark-avro module.
  *
  * The reference exposes `from_avro` / `from_avro_with_registry`
  * (`lakehouse_engine/transformers/column_reshapers.py:237-346`); this
  * build has no spark-avro jar, but the core Avro runtime ships with
  * Spark, so the codec is implemented as a deserializing UDF over
  * `GenericDatumReader` plus an Avro->Catalyst schema translation. Fine
  * for Kafka-payload-style decode; for widest-path scans a native
  * Expression would be the next step (documented trade-off).
  */
object AvroCodec {

  /** Translate an Avro schema to the corresponding Catalyst type. */
  def avroToSparkType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.NULL => NullType
    case Schema.Type.ARRAY =>
      ArrayType(avroToSparkType(schema.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, avroToSparkType(schema.getValueType))
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), avroToSparkType(f.schema()))))
    case Schema.Type.UNION =>
      val nonNull = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size == 1) avroToSparkType(nonNull.head)
      else sys.error(s"unsupported non-nullable union: $schema")
  }

  private def convert(value: Any, schema: Schema): Any = value match {
    case null => null
    case r: GenericRecord =>
      Row(r.getSchema.getFields.asScala.toSeq.map(f =>
        convert(r.get(f.pos()), f.schema())): _*)
    case u: org.apache.avro.util.Utf8 => u.toString
    case e: GenericData.EnumSymbol => e.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case f: GenericData.Fixed => f.bytes()
    case l: java.util.List[_] =>
      val elem = resolve(schema).getElementType
      l.asScala.toSeq.map(convert(_, elem))
    case m: java.util.Map[_, _] =>
      val valueSchema = resolve(schema).getValueType
      m.asScala.map { case (k, v) => String.valueOf(k) -> convert(v, valueSchema) }.toMap
    case other => other
  }

  /** Strip the nullable-union wrapper. */
  private def resolve(schema: Schema): Schema = schema.getType match {
    case Schema.Type.UNION =>
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(schema)
    case _ => schema
  }

  /** Decode a binary Avro column into a struct column. */
  def fromAvro(data: Column, schemaJson: String): Column = {
    val sparkType = avroToSparkType(new Schema.Parser().parse(schemaJson))
    val fn = new UDF1[Array[Byte], Any] with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
      @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
      @transient private var decoder: BinaryDecoder = _
      override def call(bytes: Array[Byte]): Any = {
        if (bytes == null) null
        else {
          decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
          convert(reader.read(null, decoder), schema)
        }
      }
    }
    udf(fn, sparkType).apply(data)
  }

  /** Encode a struct column to binary Avro. */
  def toAvro(data: Column, schemaJson: String): Column = {
    val fn = new UDF1[Row, Array[Byte]] with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
      @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
      @transient private var encoder: BinaryEncoder = _
      override def call(row: Row): Array[Byte] = {
        if (row == null) null
        else {
          val rec = rowToRecord(row, schema)
          val out = new ByteArrayOutputStream()
          encoder = EncoderFactory.get().binaryEncoder(out, encoder)
          writer.write(rec, encoder)
          encoder.flush()
          out.toByteArray
        }
      }
    }
    udf(fn, BinaryType).apply(data)
  }

  /** Decode a Confluent-wire-format column: 1 magic byte (0x00) + 4-byte
    * big-endian schema id + Avro body. The schema is resolved driver-side
    * (once, by subject) and `expectedId` pins it: a message carrying a
    * different id means the subject evolved under us — that fails loudly
    * rather than mis-decoding with a stale schema. `expectedId < 0` skips
    * the id check (registries that don't assign ids). */
  def fromAvroFramed(data: Column, schemaJson: String, expectedId: Int): Column = {
    val sparkType = avroToSparkType(new Schema.Parser().parse(schemaJson))
    val fn = new UDF1[Array[Byte], Any] with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
      @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
      @transient private var decoder: BinaryDecoder = _
      override def call(bytes: Array[Byte]): Any = {
        if (bytes == null) null
        else {
          require(bytes.length >= 5 && bytes(0) == 0,
            s"not a Confluent-framed Avro payload (len=${bytes.length}, " +
              s"magic=${if (bytes.isEmpty) "none" else bytes(0).toString})")
          val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
            ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
          require(expectedId < 0 || id == expectedId,
            s"message schema id $id != resolved subject id $expectedId " +
              "(subject evolved after resolution — re-run to re-resolve)")
          decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, decoder)
          convert(reader.read(null, decoder), schema)
        }
      }
    }
    udf(fn, sparkType).apply(data)
  }

  /** Encode a struct column to Confluent wire format (magic byte + schema
    * id + Avro body) — the producer-side counterpart of [[fromAvroFramed]]. */
  def toAvroFramed(data: Column, schemaJson: String, schemaId: Int): Column = {
    val fn = new UDF1[Row, Array[Byte]] with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
      @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
      @transient private var encoder: BinaryEncoder = _
      override def call(row: Row): Array[Byte] = {
        if (row == null) null
        else {
          val out = new ByteArrayOutputStream()
          out.write(0)
          out.write((schemaId >>> 24) & 0xff); out.write((schemaId >>> 16) & 0xff)
          out.write((schemaId >>> 8) & 0xff); out.write(schemaId & 0xff)
          encoder = EncoderFactory.get().binaryEncoder(out, encoder)
          writer.write(rowToRecord(row, schema), encoder)
          encoder.flush()
          out.toByteArray
        }
      }
    }
    udf(fn, BinaryType).apply(data)
  }

  /** Container-file bridge ([[graft.io.AvroFiles]]): decoded record → Row. */
  def recordToRow(rec: GenericRecord, schema: Schema): Row =
    convert(rec, schema).asInstanceOf[Row]

  /** Container-file bridge: Row → record under the writer schema. */
  def rowToRecordPublic(row: Row, schema: Schema): GenericRecord =
    rowToRecord(row, schema)

  private def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      rec.put(f.pos(), valueToAvro(row.get(f.pos()), f.schema()))
    }
    rec
  }

  /** Catalyst value → Avro datum, schema-directed. Matches on
    * `scala.collection.Seq`/`Map` (NOT the immutable aliases): Spark
    * surfaces array columns as `mutable.ArraySeq`, which the plain
    * `Seq` pattern silently misses in Scala 2.13, leaving a raw Scala
    * collection to fail inside the Avro writer. */
  private def valueToAvro(v: Any, fieldSchema: Schema): Any = v match {
    case null => null
    case r: Row => rowToRecord(r, resolve(fieldSchema))
    case s: scala.collection.Seq[_] =>
      val es = resolve(fieldSchema).getElementType
      s.map(valueToAvro(_, es)).asJava
    case m: scala.collection.Map[_, _] =>
      val vs = resolve(fieldSchema).getValueType
      m.map { case (k, vv) => String.valueOf(k) -> valueToAvro(vv, vs) }
        .toMap.asJava
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other
  }
}
