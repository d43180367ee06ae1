package graft.sources

/** Writer-schema resolution seam for the Confluent wire decode — the
  * Schema Registry's role in the reference's consumer path
  * (`kafka-plugin/.../KafkaIngestor.java:149-157`: the
  * `KafkaAvroDeserializer` resolves each frame's schema id against
  * `schema.registry.url`). The environment ships no registry (zero
  * egress), so the static map is the default implementation and an HTTP
  * registry client is a drop-in: implement `resolve` with a cached GET
  * of `/schemas/ids/{id}`.
  *
  * Contract: `resolve` is called EXECUTOR-side, once per schema id per
  * partition (results are cached in the decode loop; the returned JSON
  * is parsed into an Avro `Schema` there — `Schema` itself is not
  * serializable, strings are). Implementations must therefore be
  * `Serializable` and thread-safe; returning `None` routes every frame
  * of that id to the DLQ as an unknown-schema error rather than failing
  * the task.
  */
trait SchemaProvider extends Serializable {
  /** The Avro writer schema JSON for `schemaId`, or None if unknown. */
  def resolve(schemaId: Int): Option[String]
}

object SchemaProvider {
  /** Static table of writer schemas (the offline default): ids resolve
    * from the map, anything else falls back to `default` (the common
    * schema-per-topic case) or is unknown.
    */
  def fromMap(byId: Map[Int, String],
      default: Option[String] = None): SchemaProvider =
    new SchemaProvider {
      def resolve(schemaId: Int): Option[String] =
        byId.get(schemaId).orElse(default)
    }
}
