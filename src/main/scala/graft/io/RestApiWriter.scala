package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-wise REST sink: POST/PUT a JSON payload column to an endpoint.
  *
  * Capability parity with `lakehouse_engine/io/writers/rest_api_writer.py`:
  * rows stream through `foreachPartition` with one transport instance per
  * partition (connection reuse, no driver involvement — the scalable
  * shape for side-effect sinks). The transport is pluggable so tests and
  * offline builds inject a recorder instead of a live HTTP client.
  */
object RestApiWriter {

  /** Serializable transport: returns an HTTP-ish status code. */
  trait Sender extends Serializable {
    def send(payload: String): Int
    /** Send with an explicit content type (multipart file payloads);
      * transports that don't care delegate to [[send]]. */
    def send(payload: String, contentType: String): Int = send(payload)
    def close(): Unit = ()
  }

  /** java.net.http-based transport (used when a live endpoint exists). */
  final class HttpSender(url: String, method: String = "POST",
      contentType: String = "application/json",
      headers: Map[String, String] = Map.empty) extends Sender {
    @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
    override def send(payload: String): Int = send(payload, contentType)
    override def send(payload: String, ct: String): Int = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", ct)
        .method(method, java.net.http.HttpRequest.BodyPublishers.ofString(payload))
      headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
    }
  }

  // ------------------------------------------------------------------
  // Payload construction (reference `rest_api_writer.py:45-139`
  // `_get_func_to_send_payload_to_rest_api`): the row's `payload` JSON
  // string becomes either the parsed JSON body, or — for file payloads —
  // a `{file_payload_name: raw_string}` form dict; either way
  // `rest_api_extra_json_payload` merges on top (dict.update semantics:
  // overwrite in place, append new keys at the end). Pinned verbatim by
  // ReferenceRestApiSpec against `tests/unit/test_rest_api_functions.py`.
  // ------------------------------------------------------------------

  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Ordered JSON object — distinct from a JSON array so `{}` and `[]`
    * survive the round trip (an empty Vector can't tell them apart). */
  final case class JsonObj(pairs: Vector[(String, Any)])

  private def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      JsonObj(m.asScala.toVector.map { case (k, x) => String.valueOf(k) -> fromJava(x) })
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.toVector.map(fromJava)
    case other => other
  }

  /** Parse a JSON object preserving key order (Python dicts are ordered;
    * the final-payload rendering depends on it). */
  def parseJsonOrdered(json: String): Vector[(String, Any)] =
    fromJava(mapper.readValue(json, classOf[java.util.LinkedHashMap[String, Object]]))
      .asInstanceOf[JsonObj].pairs

  /** The final payload as ordered pairs. */
  def buildFinalPayload(strPayload: String, isFilePayload: Boolean,
      filePayloadName: String, extraJsonPayload: Seq[(String, Any)]): Vector[(String, Any)] = {
    val base: Vector[(String, Any)] =
      if (isFilePayload) Vector(filePayloadName -> strPayload)
      else parseJsonOrdered(strPayload)
    extraJsonPayload.foldLeft(base) { case (acc, (k, v)) =>
      if (acc.exists(_._1 == k)) acc.map { case (a, b) => a -> (if (a == k) v else b) }
      else acc :+ (k -> v)
    }
  }

  /** Python-repr rendering of the final payload, as the reference's
    * "Final payload: ..." debug line shows it. */
  def pyDict(pairs: Seq[(String, Any)]): String =
    pairs.map { case (k, v) => s"${pyRepr(k)}: ${pyRepr(v)}" }
      .mkString("{", ", ", "}")

  private def pyRepr(v: Any): String = v match {
    case null => "None"
    case true => "True"
    case false => "False"
    case s: String =>
      if (s.contains("'") && !s.contains("\"")) "\"" + s + "\""
      else "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case JsonObj(pairs) => pyDict(pairs)
    // raw acon maps (extra_json_payload values) render as dicts too
    case m: Map[_, _] =>
      pyDict(m.toVector.map { case (k, x) => String.valueOf(k) -> x })
    case seq: Seq[_] => seq.map(pyRepr).mkString("[", ", ", "]")
    case other => String.valueOf(other)
  }

  /** Render the final payload for the wire: JSON body for object
    * payloads, multipart/form-data for file payloads (one part per
    * entry, like requests' `files=` dict). Returns (body, contentType). */
  def renderBody(pairs: Seq[(String, Any)], isFilePayload: Boolean,
      boundary: String): (String, String) =
    if (!isFilePayload) {
      val node = mapper.createObjectNode()
      pairs.foreach { case (k, v) => node.putPOJO(k, toJava(v)) }
      mapper.writeValueAsString(node) -> "application/json"
    } else {
      val body = pairs.map { case (k, v) =>
        s"--$boundary\r\n" +
          s"""Content-Disposition: form-data; name="$k"; filename="$k"\r\n""" +
          "Content-Type: application/octet-stream\r\n\r\n" +
          String.valueOf(v) + "\r\n"
      }.mkString + s"--$boundary--\r\n"
      body -> s"multipart/form-data; boundary=$boundary"
    }

  private def toJava(v: Any): Object = v match {
    case JsonObj(pairs) =>
      val m = new java.util.LinkedHashMap[String, Object]()
      pairs.foreach { case (k, x) => m.put(k, toJava(x)) }
      m
    case mm: Map[_, _] =>
      val m = new java.util.LinkedHashMap[String, Object]()
      mm.foreach { case (k, x) => m.put(String.valueOf(k), toJava(x)) }
      m
    case seq: Seq[_] =>
      val l = new java.util.ArrayList[Object]()
      seq.foreach(x => l.add(toJava(x)))
      l
    case other => other.asInstanceOf[Object]
  }

  /** Send `payloadCol` of every row; returns the number of failed sends
    * (status >= 400), counted distributedly via an accumulator. */
  def write(df: DataFrame, payloadCol: String, sender: Sender): Long = {
    val failures = df.sparkSession.sparkContext.longAccumulator("rest_failures")
    df.select(col(payloadCol).cast("string")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        try rows.foreach { r =>
          val status = sender.send(r.getString(0))
          if (status >= 400) failures.add(1)
        } finally sender.close()
    }
    failures.value
  }

  /** Convenience: build the payload from a set of columns as JSON then send. */
  def writeColumns(df: DataFrame, cols: Seq[String], sender: Sender): Long =
    write(df.withColumn("__payload", to_json(struct(cols.map(col): _*))), "__payload", sender)

  /** Test hook for the ACON path: when set, [[writeSpec]] builds its
    * sender here instead of over live HTTP. */
  @volatile var senderFactory: (String, String) => Sender =
    (url, method) => new HttpSender(url, method)

  /** ACON-facing entry (reference `rest_api_writer.py:44-121` option
    * names): the input DataFrame must carry a `payload` JSON-string
    * column (the reference's contract, usually built upstream with
    * `to_json(struct(...))`); `rest_api_url` / `rest_api_method` select
    * the endpoint; any send outside `rest_api_success_status_codes`
    * (default 200,201,202) raises after the pass completes, so a failed
    * batch surfaces instead of silently dropping rows. */
  def writeSpec(df: DataFrame, options: Map[String, String],
      optionsRaw: Map[String, Any] = Map.empty): Long = {
    require(df.columns.contains("payload"),
      "Input DataFrame must contain 'payload' column.")
    val url = options.getOrElse("rest_api_url",
      sys.error("rest_api output needs rest_api_url"))
    val method = options.getOrElse("rest_api_method", "POST")
    val ok = options.get("rest_api_success_status_codes")
      .map(_.split(",").map(_.trim.toInt).toSet).getOrElse(Set(200, 201, 202))
    val isFilePayload = options.get("rest_api_is_file_payload").exists(_.toBoolean)
    val filePayloadName = options.getOrElse("rest_api_file_payload_name", "file")
    val extra: Seq[(String, Any)] =
      optionsRaw.get("rest_api_extra_json_payload").toSeq.flatMap {
        case m: Map[_, _] => m.toSeq.map { case (k, v) => String.valueOf(k) -> v }
        case _ => Seq.empty
      }
    val sender = senderFactory(url, method)
    val needsBuild = isFilePayload || extra.nonEmpty
    val failures = df.sparkSession.sparkContext.longAccumulator("rest_failures")
    df.select(col("payload").cast("string")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val boundary = "graft" + java.util.UUID.randomUUID().toString.replace("-", "")
        try rows.foreach { r =>
          val strPayload = r.getString(0)
          val status =
            if (!needsBuild) sender.send(strPayload)
            else {
              val (body, ct) = renderBody(
                buildFinalPayload(strPayload, isFilePayload, filePayloadName, extra),
                isFilePayload, boundary)
              sender.send(body, ct)
            }
          if (!ok.contains(status)) failures.add(1)
        } finally sender.close()
    }
    if (failures.value > 0)
      sys.error(s"rest_api sink: ${failures.value} sends outside success codes $ok")
    failures.value
  }

  /** [[write]] with an explicit success-code set. */
  private def failingSends(
      df: DataFrame, payloadCol: String, sender: Sender, ok: Set[Int]): Long = {
    val failures = df.sparkSession.sparkContext.longAccumulator("rest_failures")
    df.select(col(payloadCol).cast("string")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        try rows.foreach { r =>
          if (!ok.contains(sender.send(r.getString(0)))) failures.add(1)
        } finally sender.close()
    }
    failures.value
  }
}
