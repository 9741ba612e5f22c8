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
trait SchemaRegistryClient {

  /** Latest Avro schema JSON for a subject. */
  def latestSchema(subject: String): String
}

/** A registry preloaded with subject -> schema-JSON entries (tests, or
  * air-gapped deployments shipping schemas with the job). */
final class InMemorySchemaRegistry(subjects: Map[String, String])
    extends SchemaRegistryClient {
  def latestSchema(subject: String): String =
    subjects.getOrElse(subject,
      throw new NoSuchElementException(s"schema registry: unknown subject '$subject'"))
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
