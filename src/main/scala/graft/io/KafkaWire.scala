package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The spark-sql-kafka wire contract, pinned as code.
  *
  * The kafka connector jar is absent from this zero-egress build, so the
  * KafkaReader/KafkaWriter paths (reference `io/readers/kafka_reader.py`,
  * `io/writers/kafka_writer.py`) pass `format("kafka")` through and can't
  * be driven live. What CAN be proven without the jar is everything above
  * the socket: the exact row schema the source emits
  * (spark-sql-kafka-0-10 `KafkaRecordToRowConverter`) and the exact
  * projection the sink accepts (`KafkaWriter.validateQuery`: required
  * binary/string `value`, optional `key`/`topic`/`partition`/`headers`).
  * Pipelines built against these helpers run unchanged the moment the
  * jar appears — StreamingSpec drives both directions over MemoryStream
  * fixtures shaped by these schemas.
  */
object KafkaWire {

  /** Row schema a kafka SOURCE emits (without `includeHeaders`). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** `headers` element shape: array<struct<key:string, value:binary>>. */
  val headersType: ArrayType =
    ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType))))

  /** Source schema with `includeHeaders=true`. */
  val sourceSchemaWithHeaders: StructType =
    StructType(sourceSchema.fields :+ StructField("headers", headersType))

  /** One header entry for [[encode]]'s `headers` array. */
  def header(key: String, value: Column): Column =
    struct(lit(key).as("key"), value.cast(BinaryType).as("value"))

  /** Project arbitrary columns into the shape the kafka SINK accepts:
    * binary `value` (required by the connector), optional binary `key`,
    * `topic` (when not fixed by the `topic` writer option), `partition`
    * and `headers`. Works on batch and streaming frames alike. */
  def encode(
      df: DataFrame,
      value: Column,
      key: Option[Column] = None,
      topic: Option[Column] = None,
      partition: Option[Column] = None,
      headers: Option[Column] = None): DataFrame = {
    val cols =
      key.map(_.cast(BinaryType).as("key")).toSeq ++
        Seq(value.cast(BinaryType).as("value")) ++
        topic.map(_.cast(StringType).as("topic")) ++
        partition.map(_.cast(IntegerType).as("partition")) ++
        headers.map(_.cast(headersType).as("headers"))
    df.select(cols: _*)
  }

  /** Decode a kafka SOURCE frame: key/value back to strings, the value
    * optionally parsed as JSON into `valueSchema`, kafka metadata kept.
    * The inverse of [[encode]] plus the connector's metadata columns. */
  def decode(df: DataFrame, valueSchema: Option[StructType] = None): DataFrame = {
    val value = valueSchema match {
      case Some(s) => from_json(col("value").cast(StringType), s).as("value")
      case None => col("value").cast(StringType).as("value")
    }
    val meta = Seq("topic", "partition", "offset", "timestamp")
      .filter(df.columns.contains).map(col)
    val hdrs =
      if (df.columns.contains("headers")) Seq(col("headers")) else Seq.empty
    df.select(Seq(col("key").cast(StringType).as("key"), value) ++ meta ++ hdrs: _*)
  }
}
