package graft.io

import java.io.InputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** Microsoft-Graph HTTP transport for [[SharepointIo]] — the wire layer
  * behind the reference's Sharepoint reader/writer
  * (`utils/sharepoint_utils.py:30-660`, which drives the same
  * `sites/{site}/drives/{drive}` item endpoints through msal + requests).
  *
  * Built entirely on the JDK (`java.net.http.HttpClient`): no vendored
  * HTTP or auth library. Auth is a pluggable `() => String` bearer-token
  * provider; [[GraphHttp.clientCredentialsTokenProvider]] implements the
  * standard OAuth2 client-credentials flow (the reference's msal
  * confidential-client equivalent) with expiry-aware caching.
  *
  * The Graph surface used (all public, documented endpoints):
  *   - `GET  root:/{path}`                    — exists
  *   - `GET  root:/{folder}:/children`        — list (files only)
  *   - `GET  root:/{path}:/content`           — download (follows 302)
  *   - `PUT  root:/{path}:/content?@microsoft.graph.conflictBehavior=…`
  *   - `PATCH root:/{path}` with a parentReference — move
  *
  * This zero-egress environment has no live Graph tenant, so IoSpec
  * drives the full protocol against a local `com.sun.net.httpserver`
  * fake implementing these endpoints — requests, auth headers, JSON
  * bodies and status handling are all exercised for real; only the host
  * name differs in production.
  */
object GraphHttp {

  private def parseJson(body: String): Map[String, Any] =
    graft.spec.Specs.parseJsonMap(body)

  /** OAuth2 client-credentials token provider with expiry-aware caching
    * (re-fetches 60 s before expiry; thread-safe). `tokenUrl` is the
    * tenant token endpoint, e.g.
    * `https://login.microsoftonline.com/{tenant}/oauth2/v2.0/token`. */
  def clientCredentialsTokenProvider(
      tokenUrl: String, clientId: String, clientSecret: String,
      scope: String = "https://graph.microsoft.com/.default",
      client: HttpClient = defaultClient): () => String = {
    val lock = new Object
    var cached: Option[(String, Long)] = None // (token, expiry epoch millis)
    () => lock.synchronized {
      val now = System.currentTimeMillis()
      cached.filter(_._2 - 60000 > now).map(_._1).getOrElse {
        val form = Seq(
          "grant_type" -> "client_credentials",
          "client_id" -> clientId,
          "client_secret" -> clientSecret,
          "scope" -> scope
        ).map { case (k, v) =>
          s"$k=${URLEncoder.encode(v, UTF_8)}"
        }.mkString("&")
        val req = HttpRequest.newBuilder(URI.create(tokenUrl))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(form)).build()
        val res = client.send(req, HttpResponse.BodyHandlers.ofString())
        require(res.statusCode() == 200,
          s"token endpoint returned ${res.statusCode()}: ${res.body().take(300)}")
        val body = parseJson(res.body())
        val token = body.get("access_token").map(String.valueOf(_))
          .getOrElse(sys.error("token response missing access_token"))
        val expiresIn = body.get("expires_in")
          .collect { case n: Number => n.longValue() }.getOrElse(300L)
        cached = Some((token, now + expiresIn * 1000))
        token
      }
    }
  }

  private lazy val defaultClient: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL) // Graph content GETs 302
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  /** Graph drive transport. `baseUrl` defaults to the public Graph v1.0
    * host; tests point it at a local fake. */
  final class GraphHttpTransport(
      siteId: String,
      driveId: String,
      tokenProvider: () => String,
      baseUrl: String = "https://graph.microsoft.com/v1.0",
      client: HttpClient = defaultClient) extends SharepointIo.SharepointTransport {

    private def enc(seg: String): String =
      seg.split("/").map(URLEncoder.encode(_, UTF_8).replace("+", "%20"))
        .mkString("/")

    private def itemUrl(path: String, suffix: String = ""): String = {
      val p = path.stripPrefix("/").stripSuffix("/")
      s"$baseUrl/sites/$siteId/drives/$driveId/root:/${enc(p)}$suffix"
    }

    private def request(b: HttpRequest.Builder): HttpRequest =
      b.header("Authorization", s"Bearer ${tokenProvider()}").build()

    private def send[T](req: HttpRequest,
        handler: HttpResponse.BodyHandler[T]): HttpResponse[T] =
      client.send(req, handler)

    def exists(path: String): Boolean = {
      val res = send(request(HttpRequest.newBuilder(URI.create(itemUrl(path)))
        .GET()), HttpResponse.BodyHandlers.ofString())
      res.statusCode() match {
        case 200 => true
        case 404 => false
        case other => sys.error(s"graph exists($path) returned $other")
      }
    }

    def list(folder: String): Seq[String] = {
      // folder children; files only (folder facet rows skipped), paging
      // via @odata.nextLink
      var url = itemUrl(folder, ":/children")
      val names = Seq.newBuilder[String]
      while (url != null) {
        val res = send(request(HttpRequest.newBuilder(URI.create(url)).GET()),
          HttpResponse.BodyHandlers.ofString())
        require(res.statusCode() == 200,
          s"graph list($folder) returned ${res.statusCode()}")
        val body = parseJson(res.body())
        body.get("value").collect { case items: Seq[_] =>
          items.foreach {
            case item: Map[_, _] =>
              val m = item.asInstanceOf[Map[String, Any]]
              if (m.contains("file"))
                m.get("name").foreach(n => names += String.valueOf(n))
            case _ => ()
          }
        }
        url = body.get("@odata.nextLink").map(String.valueOf(_)).orNull
      }
      names.result().sorted
    }

    def download(path: String): InputStream = {
      val res = send(request(HttpRequest.newBuilder(
          URI.create(itemUrl(path, ":/content"))).GET()),
        HttpResponse.BodyHandlers.ofInputStream())
      require(res.statusCode() == 200,
        s"graph download($path) returned ${res.statusCode()}")
      res.body()
    }

    def upload(path: String, data: Array[Byte], conflictBehaviour: String): Unit = {
      val behavior = conflictBehaviour match {
        case "fail" => "fail"
        case _ => "replace"
      }
      val res = send(request(HttpRequest.newBuilder(URI.create(
          itemUrl(path, s":/content?@microsoft.graph.conflictBehavior=$behavior")))
        .header("Content-Type", "application/octet-stream")
        .PUT(HttpRequest.BodyPublishers.ofByteArray(data))),
        HttpResponse.BodyHandlers.ofString())
      if (behavior == "fail" && res.statusCode() == 409)
        sys.error(s"sharepoint upload conflict: $path exists (conflict_behaviour=fail)")
      require(res.statusCode() == 200 || res.statusCode() == 201,
        s"graph upload($path) returned ${res.statusCode()}: ${res.body().take(300)}")
    }

    def move(path: String, toFolder: String): Unit = {
      val destPath = s"/drives/$driveId/root:/${toFolder.stripPrefix("/").stripSuffix("/")}"
        .replace("\\", "\\\\").replace("\"", "\\\"")
      val body = s"""{"parentReference": {"path": "$destPath"}}"""
      val res = send(request(HttpRequest.newBuilder(URI.create(itemUrl(path)))
        .header("Content-Type", "application/json")
        .method("PATCH", HttpRequest.BodyPublishers.ofString(body))),
        HttpResponse.BodyHandlers.ofString())
      require(res.statusCode() == 200,
        s"graph move($path -> $toFolder) returned ${res.statusCode()}: ${res.body().take(300)}")
    }
  }
}
