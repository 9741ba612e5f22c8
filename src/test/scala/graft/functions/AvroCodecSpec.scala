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
    intercept[UnsupportedOperationException] {
      Transformers.resolve("from_avro_with_registry", Map.empty, ctx)(src)
    }
  }
}
