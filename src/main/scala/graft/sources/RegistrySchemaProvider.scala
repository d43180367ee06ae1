package graft.sources

/** Confluent-protocol Schema Registry client behind the
  * [[SchemaProvider]] seam — the HTTP resolution path of the
  * reference's consumer (`kafka-plugin/.../KafkaIngestor.java:149-157`,
  * where `KafkaAvroDeserializer` resolves each frame's schema id
  * against `schema.registry.url`). Protocol: `GET
  * {baseUrl}/schemas/ids/{id}` → `{"schema": "<avro json>"}`.
  *
  * The transport is injectable: the default is a plain
  * `HttpURLConnection` GET with timeouts, and tests script a fake
  * transport — so the full client behavior (caching, 404 vs error,
  * retry/backoff, malformed body) is pinned in a zero-egress
  * environment, and a live registry is pure configuration.
  *
  * Error contract, matching the seam's scaladoc:
  *   - 200 → schema JSON, positively cached per id (per-JVM; the
  *     decode loop adds its own per-partition cache).
  *   - 404 → `None` (unknown id → frames DLQ as unknown-schema). Not
  *     negative-cached, so a late-registered schema recovers.
  *   - transient failures (5xx, IOException) retry with exponential
  *     backoff, then THROW — a registry outage must fail the task (task
  *     retry + restart-from-checkpoint absorb it), never silently
  *     mis-route a healthy topic's frames to the DLQ.
  */
final class RegistrySchemaProvider(
    baseUrl: String,
    transport: RegistrySchemaProvider.Transport =
      RegistrySchemaProvider.http(),
    maxRetries: Int = 2,
    backoffMs: Long = 200L) extends SchemaProvider {
  require(baseUrl.nonEmpty, "registry baseUrl must be non-empty")
  require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")

  private val base = baseUrl.stripSuffix("/")

  // per-JVM positive cache; @transient so a serialized copy shipping to
  // an executor starts clean rather than dragging driver-side entries
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  override def resolve(schemaId: Int): Option[String] = {
    val hit = cache.get(schemaId)
    if (hit != null) return Some(hit)
    val url = s"$base/schemas/ids/$schemaId"
    var attempt = 0
    while (true) {
      val outcome =
        try Right(transport.get(url))
        catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(r) if r.status == 200 =>
          val schema = RegistrySchemaProvider.extractSchema(r.body)
            .getOrElse(throw new IllegalStateException(
              s"registry GET $url returned 200 with no textual " +
                s"'schema' field: ${r.body.take(200)}"))
          cache.putIfAbsent(schemaId, schema)
          return Some(schema)
        case Right(r) if r.status == 404 =>
          return None
        case Right(r) if r.status >= 500 && attempt < maxRetries =>
          Thread.sleep(backoffMs << attempt)
        case Right(r) =>
          throw new IllegalStateException(
            s"registry GET $url failed: HTTP ${r.status} " +
              s"${r.body.take(200)}")
        case Left(_) if attempt < maxRetries =>
          Thread.sleep(backoffMs << attempt)
        case Left(e) => throw e
      }
      attempt += 1
    }
    None // unreachable
  }
}

object RegistrySchemaProvider {

  final case class Response(status: Int, body: String)

  /** One HTTP GET. Implementations must be Serializable (the provider
    * ships inside executor closures) and thread-safe.
    */
  trait Transport extends Serializable {
    def get(url: String): Response
  }

  /** Default transport: `HttpURLConnection` with connect/read timeouts
    * and the registry content-type accepted. IOExceptions propagate to
    * the provider's retry loop.
    */
  def http(connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 5000): Transport = new Transport {
    def get(url: String): Response = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept",
        "application/vnd.schemaregistry.v1+json, application/json")
      try {
        val status = conn.getResponseCode
        val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
        val body =
          if (is == null) ""
          else try scala.io.Source.fromInputStream(is, "UTF-8").mkString
          finally is.close()
        Response(status, body)
      } finally conn.disconnect()
    }
  }

  /** The `schema` field of a registry response body (jackson ships on
    * the Spark classpath — no added dependency).
    */
  private[sources] def extractSchema(body: String): Option[String] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body)
      Option(node.get("schema")).filter(_.isTextual).map(_.asText)
    } catch { case _: java.io.IOException => None }
}
