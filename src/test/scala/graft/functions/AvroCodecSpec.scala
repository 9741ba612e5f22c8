package graft.functions

import graft.SparkSpec
import graft.transform.{TransformContext, Transformers}
import org.apache.spark.sql.functions._

class AvroCodecSpec extends SparkSpec {

  import spark.implicits._

  private val schemaJson =
    """{"type": "record", "name": "Event", "fields": [
      |  {"name": "id", "type": "long"},
      |  {"name": "name", "type": ["null", "string"], "default": null},
      |  {"name": "scores", "type": {"type": "array", "items": "double"}},
      |  {"name": "nested", "type": {"type": "record", "name": "N",
      |    "fields": [{"name": "flag", "type": "boolean"}]}}
      |]}""".stripMargin

  test("avro round trip: struct -> bytes -> struct") {
    val df = Seq((1L, "a", Seq(1.5, 2.5), true), (2L, null.asInstanceOf[String], Seq(3.0), false))
      .toDF("id", "name", "scores", "flag")
      .select(struct(col("id"), col("name"), col("scores"),
        struct(col("flag")).as("nested")).as("payload"))
    val encoded = df.select(AvroCodec.toAvro(col("payload"), schemaJson).as("value"))
    assert(encoded.schema("value").dataType.typeName == "binary")
    val decoded = encoded.select(AvroCodec.fromAvro(col("value"), schemaJson).as("e"))
      .select("e.id", "e.name", "e.scores", "e.nested.flag")
    val rows = decoded.as[(Long, Option[String], Seq[Double], Boolean)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, Some("a"), Seq(1.5, 2.5), true)))
    assert(rows(1) == ((2L, None, Seq(3.0), false)))
  }

  test("from_avro / to_avro transformers in the registry") {
    val ctx = TransformContext(spark)
    val src = Seq((1L, "x", Seq(9.0), true)).toDF("id", "name", "scores", "flag")
      .select(col("id"), col("name"), col("scores"), struct(col("flag")).as("nested"))
    val enc = src.transform(Transformers.resolve("to_avro",
      Map("in_cols" -> Seq("id", "name", "scores", "nested"),
        "out_col" -> "value", "schema" -> schemaJson), ctx))
    val dec = enc.transform(Transformers.resolve("from_avro",
      Map("input_col" -> "value", "output_col" -> "decoded",
        "schema" -> schemaJson), ctx))
    assert(dec.select("decoded.name").as[String].collect().head == "x")
  }

  test("from_avro_with_registry resolves subjects through the pluggable registry") {
    val ctx = TransformContext(spark)
    graft.io.SchemaRegistry.register("mem://avro-spec",
      new graft.io.InMemorySchemaRegistry(Map("events-value" -> schemaJson)))
    val src = Seq((1L, "reg", Seq(4.0), true)).toDF("id", "name", "scores", "flag")
      .select(col("id"), col("name"), col("scores"), struct(col("flag")).as("nested"))
    val enc = src.transform(Transformers.resolve("to_avro",
      Map("in_cols" -> Seq("id", "name", "scores", "nested"),
        "out_col" -> "value", "schema" -> schemaJson), ctx))
      .select(lit("k1").as("key"), col("value"), lit(7).as("offset"))
    // expand_value=true (default): the record's fields replace the value col
    val dec = enc.transform(Transformers.resolve("from_avro_with_registry",
      Map("schema_registry" -> "mem://avro-spec",
        "value_schema" -> "events-value"), ctx))
    assert(dec.columns.toSeq == Seq("key", "offset", "id", "name", "scores", "nested"))
    assert(dec.select("name").as[String].collect().head == "reg")
    // expand_value=false keeps the struct column
    val keep = enc.transform(Transformers.resolve("from_avro_with_registry",
      Map("schema_registry" -> "mem://avro-spec",
        "value_schema" -> "events-value", "expand_value" -> false), ctx))
    assert(keep.schema("value").dataType.typeName == "struct")
    // unknown registry url / subject fail loudly
    intercept[IllegalStateException] {
      Transformers.resolve("from_avro_with_registry",
        Map("schema_registry" -> "http://nowhere", "value_schema" -> "x"), ctx)(enc)
    }
    intercept[NoSuchElementException] {
      Transformers.resolve("from_avro_with_registry",
        Map("schema_registry" -> "mem://avro-spec", "value_schema" -> "missing"), ctx)(enc)
    }
  }
}
