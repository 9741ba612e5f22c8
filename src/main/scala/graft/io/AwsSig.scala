package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing + the minimal S3 archive
  * surface the reference's file manager needs
  * (`lakehouse_engine/core/s3_file_manager.py`: restore_object issuance
  * and restore-status checks; the reference drives them through boto3).
  *
  * Pure-JDK implementation of the published SigV4 algorithm
  * (HMAC-SHA256 canonical request -> string-to-sign -> derived signing
  * key) — no AWS SDK in this build. The signer is verified against an
  * independently computed reference signature (python hashlib/hmac) in
  * AlgorithmsSpec, and the S3 calls are driven end-to-end against a
  * local fake S3 endpoint; only the endpoint host differs in production.
  */
object AwsSig {

  final case class Credentials(accessKey: String, secretKey: String,
      sessionToken: Option[String] = None)

  /** Outcome of a `RestoreObject` request. Three states, not two:
    * conflating InProgress (409) with AlreadyRestored (200) lets a
    * racing HEAD that has no `x-amz-restore` header yet end a restore
    * wait while the object is still archived. */
  sealed abstract class RestoreOutcome(val describe: String)
  object RestoreOutcome {
    /** 202 — restore newly accepted; the service is thawing the object. */
    case object Accepted extends RestoreOutcome("accepted")
    /** 200 — object already restored (or never archived); copy is safe now. */
    case object AlreadyRestored extends RestoreOutcome("already restored")
    /** 409 RestoreAlreadyInProgress — someone else's restore is running;
      * the object is NOT yet readable. */
    case object InProgress extends RestoreOutcome("already in progress")
  }

  private val AmzDate = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")

  private def sha256Hex(data: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(data)
      .map("%02x".format(_)).mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** URI-encode per SigV4 rules (RFC 3986, '/' preserved only for paths). */
  private def uriEncode(s: String, keepSlash: Boolean): String = {
    val enc = URLEncoder.encode(s, UTF_8)
      .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")
    if (keepSlash) enc.replace("%2F", "/") else enc
  }

  /** Compute the SigV4 Authorization header (plus the x-amz-* headers
    * the request must carry). `headers` must include `host`; keys are
    * case-insensitive per the spec and lowercased here.
    * Returns (authorizationHeaderValue, amzDate, payloadHash). */
  def sign(
      method: String,
      path: String,
      query: Seq[(String, String)],
      headers: Map[String, String],
      payload: Array[Byte],
      region: String,
      service: String,
      creds: Credentials,
      at: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC))
      : (String, String, String) = {
    val amzDate = at.format(AmzDate)
    val dateStamp = amzDate.take(8)
    val payloadHash = sha256Hex(payload)

    // SigV4 canonicalization: trim AND collapse sequential inner spaces
    val allHeaders = (headers.map { case (k, v) =>
      k.toLowerCase -> v.trim.replaceAll(" +", " ") } ++
      Map("x-amz-date" -> amzDate, "x-amz-content-sha256" -> payloadHash) ++
      creds.sessionToken.map("x-amz-security-token" -> _)).toSeq.sortBy(_._1)
    val canonicalHeaders = allHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = allHeaders.map(_._1).mkString(";")
    val canonicalQuery = query
      .map { case (k, v) => (uriEncode(k, keepSlash = false),
        uriEncode(v, keepSlash = false)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val canonicalRequest = Seq(
      method.toUpperCase,
      uriEncode(path, keepSlash = true),
      canonicalQuery,
      canonicalHeaders,
      signedHeaders,
      payloadHash).mkString("\n")

    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val signingKey =
      hmac(hmac(hmac(hmac(s"AWS4${creds.secretKey}".getBytes(UTF_8),
        dateStamp), region), service), "aws4_request")
    val signature = hmac(signingKey, stringToSign).map("%02x".format(_)).mkString
    val auth = s"AWS4-HMAC-SHA256 Credential=${creds.accessKey}/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
    (auth, amzDate, payloadHash)
  }

  /** Minimal S3 client for the archive-restore surface. `endpoint` is
    * the service base URL (`https://s3.{region}.amazonaws.com` in
    * production, a local fake in tests); requests are path-style
    * (`/{bucket}/{key}`), the shape every S3-compatible endpoint
    * accepts. */
  /** One shared connection pool for every default-constructed client. */
  lazy val defaultHttpClient: HttpClient = HttpClient.newHttpClient()

  private val KeyTag = "(?s)<Key>(.*?)</Key>".r
  private val NextTokenTag = "(?s)<NextContinuationToken>(.*?)</NextContinuationToken>".r
  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&amp;", "&")

  final class S3RestoreClient(
      endpoint: String,
      region: String,
      creds: Credentials,
      client: HttpClient = defaultHttpClient) {

    private def send(method: String, bucket: String, key: String,
        query: Seq[(String, String)], payload: Array[Byte],
        extraHeaders: Map[String, String] = Map.empty)
        : HttpResponse[String] = {
      val path = s"/$bucket/${key.stripPrefix("/")}"
      val host = URI.create(endpoint).getAuthority
      val (auth, amzDate, payloadHash) = sign(method, path, query,
        Map("host" -> host) ++ extraHeaders, payload, region, "s3", creds)
      // the URL query must be byte-identical to the canonical query the
      // signature was computed over (same uriEncode, same sort) — encoding
      // values with a different scheme ('+' for space, raw keys) would
      // produce SignatureDoesNotMatch for any key/value needing escaping
      val qs =
        if (query.isEmpty) ""
        else "?" + query
          .map { case (k, v) => (uriEncode(k, keepSlash = false),
            uriEncode(v, keepSlash = false)) }
          .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
      // the request URL must carry the SAME percent-encoded path the
      // signature was computed over — a raw key with spaces/'#'/non-ASCII
      // would otherwise be an illegal URI, address the wrong object, or
      // 403 with SignatureDoesNotMatch
      val encodedPath = uriEncode(path, keepSlash = true)
      var b = HttpRequest.newBuilder(URI.create(s"$endpoint$encodedPath$qs"))
        .header("Authorization", auth)
        .header("x-amz-date", amzDate)
        .header("x-amz-content-sha256", payloadHash)
      extraHeaders.foreach { case (k, v) => b = b.header(k, v) }
      creds.sessionToken.foreach(t => b = b.header("x-amz-security-token", t))
      val req = (method match {
        case "POST" => b.POST(HttpRequest.BodyPublishers.ofByteArray(payload))
        case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofByteArray(payload))
        case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
        case "GET" => b.GET()
        case other => sys.error(s"unsupported method $other")
      }).build()
      client.send(req, HttpResponse.BodyHandlers.ofString())
    }

    /** PUT an object (test fixtures + small control files). Optional
      * `x-amz-storage-class` (e.g. GLACIER) as in S3's PutObject. */
    def putObject(bucket: String, key: String, body: Array[Byte],
        storageClass: Option[String] = None): Unit = {
      val res = send("PUT", bucket, key, Seq.empty, body,
        storageClass.map("x-amz-storage-class" -> _).toMap)
      require(res.statusCode() == 200,
        s"put_object $bucket/$key returned ${res.statusCode()}")
    }

    /** One page of `ListObjectsV2` (GET /bucket?list-type=2): keys with
      * `prefix`, at most `maxKeys` (S3's default page size is 1000), plus
      * the continuation token when the listing is truncated — the same
      * paginated contract the reference walks in
      * `core/s3_file_manager.py:46-80` (`_list_objects`). */
    def listObjectsV2(bucket: String, prefix: String,
        continuationToken: Option[String] = None, maxKeys: Int = 1000)
        : (Seq[String], Option[String]) = {
      val query = Seq("list-type" -> "2", "prefix" -> prefix,
        "max-keys" -> maxKeys.toString) ++
        continuationToken.map("continuation-token" -> _)
      val res = send("GET", bucket, "", query, Array.emptyByteArray)
      require(res.statusCode() == 200,
        s"list_objects_v2 $bucket prefix=$prefix returned ${res.statusCode()}")
      val body = res.body()
      val keys = KeyTag.findAllMatchIn(body).map(m => xmlUnescape(m.group(1))).toSeq
      val token = NextTokenTag.findFirstMatchIn(body).map(m => xmlUnescape(m.group(1)))
      (keys, token)
    }

    /** Batch `DeleteObjects` (POST /bucket?delete), up to 1000 keys per
      * call as in S3. Carries Content-MD5 — the real service rejects the
      * multi-object delete without it. */
    def deleteObjects(bucket: String, keys: Seq[String]): Unit = {
      require(keys.nonEmpty && keys.size <= 1000,
        s"delete_objects takes 1..1000 keys, got ${keys.size}")
      val xml = "<Delete>" + keys.map(k =>
        s"<Object><Key>${xmlEscape(k)}</Key></Object>").mkString + "</Delete>"
      val payload = xml.getBytes(UTF_8)
      val md5 = java.util.Base64.getEncoder.encodeToString(
        MessageDigest.getInstance("MD5").digest(payload))
      val res = send("POST", bucket, "", Seq("delete" -> ""), payload,
        Map("content-md5" -> md5))
      require(res.statusCode() == 200,
        s"delete_objects $bucket returned ${res.statusCode()}: ${res.body().take(300)}")
    }

    /** HEAD the object: `(storageClass, x-amz-restore header)` — the two
      * facts the reference's archive choreography branches on
      * (`s3_file_manager.py:657-680` `_get_archived_object`). None when
      * the object does not exist. */
    def headObject(bucket: String, key: String)
        : Option[(String, Option[String])] = {
      val res = send("HEAD", bucket, key, Seq.empty, Array.emptyByteArray)
      res.statusCode() match {
        case 200 =>
          val sc = res.headers().firstValue("x-amz-storage-class")
          val restore = res.headers().firstValue("x-amz-restore")
          Some((if (sc.isPresent) sc.get() else "STANDARD",
            if (restore.isPresent) Some(restore.get()) else None))
        case 404 => None
        case other => sys.error(s"head_object $bucket/$key returned $other")
      }
    }

    /** Issue `RestoreObject` (S3 POST ?restore) and map the status to a
      * [[RestoreOutcome]]: 202 Accepted, 200 AlreadyRestored, 409
      * InProgress (RestoreAlreadyInProgress); any other status throws.
      * Expedited|Standard|Bulk tiers as in the reference's ACON surface. */
    def requestRestore(bucket: String, key: String, days: Int,
        tier: String): RestoreOutcome = {
      require(Seq("Expedited", "Standard", "Bulk").contains(tier),
        s"invalid restore tier '$tier'")
      val xml =
        s"""<RestoreRequest xmlns="http://s3.amazonaws.com/doc/2006-03-01/">""" +
          s"<Days>$days</Days><GlacierJobParameters><Tier>$tier</Tier>" +
          "</GlacierJobParameters></RestoreRequest>"
      val res = send("POST", bucket, key, Seq("restore" -> ""), xml.getBytes(UTF_8))
      res.statusCode() match {
        case 202 => RestoreOutcome.Accepted
        case 200 => RestoreOutcome.AlreadyRestored
        case 409 => RestoreOutcome.InProgress
        case other => sys.error(
          s"restore_object $bucket/$key returned $other: ${res.body().take(300)}")
      }
    }

    /** HEAD the object and report its `x-amz-restore` state:
      * None = not an archive restore in any state; Some(true) = restore
      * in progress; Some(false) = restored (ongoing-request="false"). */
    def restoreStatus(bucket: String, key: String): Option[Boolean] = {
      val res = send("HEAD", bucket, key, Seq.empty, Array.emptyByteArray)
      require(res.statusCode() == 200,
        s"head_object $bucket/$key returned ${res.statusCode()}")
      val h = res.headers().firstValue("x-amz-restore")
      if (h.isEmpty) None
      else Some(h.get().contains("ongoing-request=\"true\""))
    }

    /** Server-side CopyObject: PUT the destination with an
      * `x-amz-copy-source` header — no payload transits the client,
      * which is what makes restore-to-destination viable for archive
      * objects of any size. */
    def copyObject(srcBucket: String, srcKey: String,
        destBucket: String, destKey: String): Unit = {
      val res = send("PUT", destBucket, destKey, Seq.empty, Array.emptyByteArray,
        Map("x-amz-copy-source" -> s"/$srcBucket/${srcKey.stripPrefix("/")}"))
      require(res.statusCode() == 200,
        s"copy_object $srcBucket/$srcKey -> $destBucket/$destKey " +
          s"returned ${res.statusCode()}: ${res.body().take(300)}")
    }

    /** Issue a restore and poll until it completes, then server-side
      * copy to the destination (the reference's
      * `request_restore_to_destination_and_wait`). `pollMillis` between
      * HEAD checks, at most `maxAttempts` of them. */
    def restoreToDestinationAndWait(
        bucket: String, key: String, destBucket: String, destKey: String,
        days: Int, tier: String,
        pollMillis: Long = 30000, maxAttempts: Int = 240): Unit = {
      val outcome = requestRestore(bucket, key, days, tier)
      var attempts = 0
      // a HEAD issued right after a 202 (ours) OR during someone else's
      // restore (409) can race the service's restore registration and
      // return no x-amz-restore header at all — in both states None means
      // "not registered yet", not "complete"; only ongoing-request="false"
      // (or AlreadyRestored + no header: object was never archived) ends
      // the wait. Treating 409 like 200 here was the bug: the copy would
      // run while the object was still archived.
      var done = false
      while (!done) {
        restoreStatus(bucket, key) match {
          case Some(false) => done = true
          case None if outcome == RestoreOutcome.AlreadyRestored =>
            done = true // never archived; nothing to wait on
          case _ => // ongoing, or issued/in-progress-but-not-yet-registered
            attempts += 1
            require(attempts <= maxAttempts,
              s"restore of $bucket/$key still in progress after $maxAttempts checks")
            Thread.sleep(pollMillis)
        }
      }
      copyObject(bucket, key, destBucket, destKey)
    }
  }
}
