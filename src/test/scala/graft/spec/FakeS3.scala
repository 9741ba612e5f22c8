package graft.spec

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** In-process S3 endpoint for the file-manager scenario specs — the
  * moto-equivalent the reference tests run against
  * (`tests/feature/test_file_manager_s3.py` uses `@mock_s3`). Implements
  * the slice of the S3 REST surface the choreography needs:
  *
  *  - `PUT /bucket/key` (with optional `x-amz-storage-class`, and
  *    server-side copy via `x-amz-copy-source`)
  *  - `GET /bucket?list-type=2&prefix=&max-keys=&continuation-token=`
  *    with real pagination (sorted keys, opaque token = last key)
  *  - `POST /bucket?delete` multi-object delete
  *  - `POST /bucket/key?restore` — like moto, the restore completes
  *    immediately (`ongoing-request="false"`); non-archival objects 403
  *  - `HEAD /bucket/key` reporting storage class + restore state
  *
  * Single-threaded executor → serialized, deterministic state.
  */
final class FakeS3 {

  final case class Obj(body: Array[Byte], storageClass: String,
      var restore: Option[String])

  /** bucket -> key -> object, keys kept sorted for listing. */
  val buckets: mutable.Map[String, mutable.SortedMap[String, Obj]] =
    mutable.Map.empty

  def createBucket(name: String): Unit =
    buckets.getOrElseUpdate(name, mutable.SortedMap.empty)

  def put(bucket: String, key: String, body: String = "",
      storageClass: String = "STANDARD"): Unit = {
    createBucket(bucket)
    buckets(bucket)(key) = Obj(body.getBytes(UTF_8), storageClass, None)
  }

  def keys(bucket: String): Seq[String] =
    buckets.get(bucket).map(_.keys.toSeq).getOrElse(Seq.empty)

  def restoredCount(bucket: String): Int =
    buckets.get(bucket).map(_.values.count(o =>
      o.restore.exists(_.contains("ongoing-request=\"false\"")))).getOrElse(0)

  private val server =
    HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor())

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k) => dec(k) -> ""
          case Array(k, v) => dec(k) -> dec(v)
        }
      }.toMap

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)

  private def reply(ex: HttpExchange, status: Int, body: String = "",
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(UTF_8)
    if (ex.getRequestMethod == "HEAD") {
      ex.sendResponseHeaders(status, -1)
    } else {
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    }
    ex.close()
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case e: Throwable => reply(ex, 500, s"<Error>${e.getMessage}</Error>")
    }
  })

  private def handle(ex: HttpExchange): Unit = {
    val path = dec(ex.getRequestURI.getRawPath).stripPrefix("/")
    val (bucket, key) = path.split("/", 2) match {
      case Array(b) => (b, "")
      case Array(b, k) => (b, k)
    }
    val q = query(ex)
    val store = buckets.get(bucket)
    (ex.getRequestMethod, key) match {
      case _ if store.isEmpty => reply(ex, 404, "<Error>NoSuchBucket</Error>")

      case ("GET", "") if q.get("list-type").contains("2") =>
        val prefix = q.getOrElse("prefix", "")
        val maxKeys = q.get("max-keys").map(_.toInt).getOrElse(1000)
        val token = q.get("continuation-token")
        val all = store.get.keys.filter(_.startsWith(prefix)).toSeq
        val after = token match {
          case Some(t) => all.filter(_ > t)
          case None => all
        }
        val page = after.take(maxKeys)
        val truncated = after.size > maxKeys
        val contents = page.map(k =>
          s"<Contents><Key>${xmlEscape(k)}</Key></Contents>").mkString
        val next =
          if (truncated)
            s"<NextContinuationToken>${xmlEscape(page.last)}" +
              "</NextContinuationToken>"
          else ""
        reply(ex, 200,
          "<?xml version=\"1.0\"?><ListBucketResult>" +
            s"<KeyCount>${page.size}</KeyCount>" +
            s"<IsTruncated>$truncated</IsTruncated>" + contents + next +
            "</ListBucketResult>")

      case ("POST", "") if q.contains("delete") =>
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val toDelete = "(?s)<Key>(.*?)</Key>".r.findAllMatchIn(body)
          .map(_.group(1)).toSeq
        toDelete.foreach(store.get.remove)
        reply(ex, 200,
          "<?xml version=\"1.0\"?><DeleteResult>" + toDelete.map(k =>
            s"<Deleted><Key>${xmlEscape(k)}</Key></Deleted>").mkString +
            "</DeleteResult>")

      case ("PUT", k) if k.nonEmpty =>
        Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
          case Some(src) =>
            val Array(sb, sk) = dec(src).stripPrefix("/").split("/", 2)
            buckets.get(sb).flatMap(_.get(sk)) match {
              case None => reply(ex, 404, "<Error>NoSuchKey</Error>")
              case Some(srcObj) =>
                // copies land as STANDARD unless a class is requested,
                // as in S3 CopyObject
                store.get(k) = Obj(srcObj.body,
                  Option(ex.getRequestHeaders.getFirst("x-amz-storage-class"))
                    .getOrElse("STANDARD"), None)
                reply(ex, 200, "<CopyObjectResult/>")
            }
          case None =>
            val body = ex.getRequestBody.readAllBytes()
            store.get(k) = Obj(body,
              Option(ex.getRequestHeaders.getFirst("x-amz-storage-class"))
                .getOrElse("STANDARD"), None)
            reply(ex, 200)
        }

      case ("POST", k) if q.contains("restore") =>
        store.get.get(k) match {
          case None => reply(ex, 404, "<Error>NoSuchKey</Error>")
          case Some(obj) if !Set("GLACIER", "DEEP_ARCHIVE", "GLACIER_IR")
              .contains(obj.storageClass) =>
            reply(ex, 403, "<Error>InvalidObjectState</Error>")
          case Some(obj) if obj.restore.isDefined =>
            reply(ex, 200) // already restored (moto returns immediately)
          case Some(obj) =>
            obj.restore =
              Some("ongoing-request=\"false\", expiry-date=\"fake\"")
            reply(ex, 202)
        }

      case ("HEAD", k) =>
        store.get.get(k) match {
          case None => reply(ex, 404)
          case Some(obj) =>
            reply(ex, 200, headers =
              Map("x-amz-storage-class" -> obj.storageClass) ++
                obj.restore.map("x-amz-restore" -> _))
        }

      case ("GET", k) =>
        store.get.get(k) match {
          case None => reply(ex, 404, "<Error>NoSuchKey</Error>")
          case Some(obj) => reply(ex, 200, new String(obj.body, UTF_8))
        }

      case ("DELETE", k) =>
        store.get.remove(k)
        reply(ex, 204)

      case _ => reply(ex, 400, "<Error>Unsupported</Error>")
    }
  }

  def start(): FakeS3 = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
