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

  test("HTTP registry e2e: Confluent wire format decode via a local fake registry") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    // a minimal Confluent REST fake: one subject at id 7, plus the id index
    val subject = "events-value"
    def jsonEscape(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case c => c.toString }
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var sawAuth: Option[String] = None
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        sawAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val body = ex.getRequestURI.getPath match {
          case p if p == s"/subjects/$subject/versions/latest" =>
            s"""{"subject": "$subject", "version": 1, "id": 7, "schema": "${jsonEscape(schemaJson)}"}"""
          case "/schemas/ids/7" =>
            s"""{"schema": "${jsonEscape(schemaJson)}"}"""
          case _ => null
        }
        val (code, bytes) =
          if (body == null) (404, """{"error_code": 40401, "message": "not found"}""".getBytes("UTF-8"))
          else (200, body.getBytes("UTF-8"))
        ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val registry = new graft.io.HttpSchemaRegistry(base,
        authHeader = Some(() => "Basic dGVzdDp0ZXN0"))
      // REST surface: latest carries the wire id; the id index agrees
      val rs = registry.latest(subject)
      assert(rs.id == 7 && rs.schemaJson == schemaJson)
      assert(registry.schemaById(7) == schemaJson)
      assert(sawAuth.contains("Basic dGVzdDp0ZXN0"))
      intercept[NoSuchElementException](registry.latest("nope"))
      intercept[NoSuchElementException](registry.schemaById(9))

      // e2e: frame with the registry id, decode through the ACON transformer
      graft.io.SchemaRegistry.register(base, registry)
      val ctx = TransformContext(spark)
      val src = Seq((1L, "wire", Seq(2.0), true)).toDF("id", "name", "scores", "flag")
        .select(struct(col("id"), col("name"), col("scores"),
          struct(col("flag")).as("nested")).as("payload"))
      val framed = src.select(lit("k").as("key"),
        AvroCodec.toAvroFramed(col("payload"), schemaJson, rs.id).as("value"))
      // wire bytes start with magic 0x00 + big-endian id 7
      val head = framed.select(col("value")).as[Array[Byte]].collect().head.take(5)
      assert(head.toSeq == Seq[Byte](0, 0, 0, 0, 7))
      val dec = framed.transform(Transformers.resolve("from_avro_with_registry",
        Map("schema_registry" -> base, "value_schema" -> subject,
          "wire_format" -> true), ctx))
      assert(dec.select("name").as[String].collect().head == "wire")
      // a payload framed with a DIFFERENT id fails loudly, not silently
      val stale = src.select(
        AvroCodec.toAvroFramed(col("payload"), schemaJson, 99).as("value"))
      val ex = intercept[Exception] {
        stale.transform(Transformers.resolve("from_avro_with_registry",
          Map("schema_registry" -> base, "value_schema" -> subject,
            "wire_format" -> true), ctx)).collect()
      }
      assert(ex.getMessage != null)
    } finally server.stop(0)
  }
}
