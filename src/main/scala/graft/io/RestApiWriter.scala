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
}
