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
    def close(): Unit = ()
  }

  /** java.net.http-based transport (used when a live endpoint exists). */
  final class HttpSender(url: String, method: String = "POST",
      contentType: String = "application/json") extends Sender {
    @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
    override def send(payload: String): Int = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", contentType)
        .method(method, java.net.http.HttpRequest.BodyPublishers.ofString(payload))
        .build()
      client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
    }
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
  def writeSpec(df: DataFrame, options: Map[String, String]): Long = {
    require(df.columns.contains("payload"),
      "Input DataFrame must contain 'payload' column.")
    val url = options.getOrElse("rest_api_url",
      sys.error("rest_api output needs rest_api_url"))
    val method = options.getOrElse("rest_api_method", "POST")
    val ok = options.get("rest_api_success_status_codes")
      .map(_.split(",").map(_.trim.toInt).toSet).getOrElse(Set(200, 201, 202))
    val failures = failingSends(df, "payload", senderFactory(url, method), ok)
    if (failures > 0)
      sys.error(s"rest_api sink: $failures sends outside success codes $ok")
    failures
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
