package graft.io

/** Pluggable Avro schema-registry access for `from_avro_with_registry`
  * (reference `transformers/column_reshapers.py:284-346`, which resolves
  * subjects against a Confluent-style registry URL at decode time).
  *
  * The reference's Databricks `from_avro(..., subject, schemaRegistryAddress)`
  * overload talks to a live registry; this build separates the TRANSPORT
  * (how a subject's schema is fetched) from the decode (plain Avro via
  * [[graft.functions.AvroCodec]]): resolution happens once, driver-side,
  * and executors only ever see the resolved schema JSON — the right shape
  * at scale anyway, since per-row registry lookups from 1000 executors
  * would DDoS the registry.
  *
  * Transports register per URL; the zero-egress build ships the in-memory
  * one. An HTTP transport is a ~20-line `SchemaRegistryClient` (GET
  * `/subjects/<subject>/versions/latest`) a user can register without
  * touching engine code.
  */
/** A schema as the registry serves it: global id + schema JSON. Id -1
  * means "registry doesn't assign ids" (the in-memory transport). */
final case class RegisteredSchema(id: Int, schemaJson: String)

trait SchemaRegistryClient {

  /** Latest Avro schema JSON for a subject. */
  def latestSchema(subject: String): String

  /** Latest schema WITH its registry-assigned id (Confluent wire-format
    * framing embeds this id in every message). */
  def latest(subject: String): RegisteredSchema = RegisteredSchema(-1, latestSchema(subject))

  /** Schema JSON by global id (`GET /schemas/ids/{id}` wire shape). */
  def schemaById(id: Int): String =
    throw new UnsupportedOperationException("this registry transport has no id index")
}

/** A registry preloaded with subject -> schema-JSON entries (tests, or
  * air-gapped deployments shipping schemas with the job). Ids are assigned
  * by DECLARED order (1-based), mirroring a real registry's globally
  * unique monotone ids — pass a Seq to control the order. The Map
  * constructor sorts by SUBJECT NAME (an unsorted Map's iteration order
  * reshuffles above 4 entries), so its ids are deterministic for given
  * contents but CAN shift when a subject sorting earlier is added — if
  * ids are pinned into framed payloads across runs, use the Seq
  * constructor. */
final class InMemorySchemaRegistry(subjects: Seq[(String, String)])
    extends SchemaRegistryClient {
  def this(subjects: Map[String, String]) = this(subjects.toSeq.sortBy(_._1))
  private val ordered = subjects
  def latestSchema(subject: String): String = latest(subject).schemaJson
  override def latest(subject: String): RegisteredSchema =
    ordered.indexWhere(_._1 == subject) match {
      case -1 => throw new NoSuchElementException(s"schema registry: unknown subject '$subject'")
      case i => RegisteredSchema(i + 1, ordered(i)._2)
    }
  override def schemaById(id: Int): String =
    if (id >= 1 && id <= ordered.size) ordered(id - 1)._2
    else throw new NoSuchElementException(s"schema registry: unknown schema id $id")
}

/** Confluent-wire HTTP registry transport over the JDK HttpClient (the
  * reference's Databricks `from_avro(..., subject, schemaRegistryAddress)`
  * resolves against the same REST surface —
  * `transformers/column_reshapers.py:284-346`). Endpoints used (public
  * Confluent Schema Registry API):
  *   - `GET {base}/subjects/{subject}/versions/latest` -> {id, schema}
  *   - `GET {base}/schemas/ids/{id}`                   -> {schema}
  *
  * Resolution happens once, driver-side; executors only see resolved
  * schema JSON (per-row lookups from 1000 executors would DDoS the
  * registry). `authHeader` supplies e.g. a Basic credentials value. */
final class HttpSchemaRegistry(
    baseUrl: String,
    authHeader: Option[() => String] = None,
    client: java.net.http.HttpClient = HttpSchemaRegistry.defaultClient)
    extends SchemaRegistryClient {

  import java.net.http.{HttpRequest, HttpResponse}

  private def get(path: String): Map[String, Any] = {
    val b = HttpRequest.newBuilder(java.net.URI.create(s"${baseUrl.stripSuffix("/")}$path"))
      .header("Accept", "application/vnd.schemaregistry.v1+json").GET()
    authHeader.foreach(h => b.header("Authorization", h()))
    val res = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    res.statusCode() match {
      case 200 => graft.spec.Specs.parseJsonMap(res.body())
      case 404 => throw new NoSuchElementException(s"schema registry: $path not found")
      case other => sys.error(s"schema registry GET $path returned $other: ${res.body().take(300)}")
    }
  }

  /** Percent-encode a path SEGMENT: URLEncoder does form encoding, where
    * a space becomes '+' — literal in a URL path — so swap it for %20. */
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
      .replace("+", "%20")

  def latestSchema(subject: String): String = latest(subject).schemaJson

  override def latest(subject: String): RegisteredSchema = {
    val body = get(s"/subjects/${enc(subject)}/versions/latest")
    val id = body.get("id").collect { case n: Number => n.intValue() }
      .getOrElse(sys.error(s"registry response for '$subject' missing id"))
    val schema = body.get("schema").map(String.valueOf(_))
      .getOrElse(sys.error(s"registry response for '$subject' missing schema"))
    RegisteredSchema(id, schema)
  }

  override def schemaById(id: Int): String =
    get(s"/schemas/ids/$id").get("schema").map(String.valueOf(_))
      .getOrElse(sys.error(s"registry response for id $id missing schema"))
}

object HttpSchemaRegistry {
  private[io] lazy val defaultClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
}

object SchemaRegistry {

  private val clients =
    scala.collection.concurrent.TrieMap.empty[String, SchemaRegistryClient]

  /** Register the client serving `url` (e.g. an [[InMemorySchemaRegistry]]
    * for tests, an HTTP client in a connected deployment). */
  def register(url: String, client: SchemaRegistryClient): Unit =
    clients(url) = client

  def resolve(url: String): SchemaRegistryClient =
    clients.getOrElse(url,
      throw new IllegalStateException(
        s"no SchemaRegistryClient registered for '$url'; register one with " +
          "SchemaRegistry.register(url, client) — this zero-egress build does " +
          "not auto-create HTTP transports"))
}
