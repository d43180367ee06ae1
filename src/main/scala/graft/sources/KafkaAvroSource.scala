package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka source wiring (SURVEY §2.1 S1): one streaming DataFrame over a
  * subscribed topic with the reference's rate limits mapped to Spark
  * options —
  *
  *   - MAX_POLL_RECORDS (1000/poll/partition) → `maxOffsetsPerTrigger`
  *     (records per micro-batch, across partitions)
  *   - per-partition consumer threads → the source's one-task-per-
  *     partition layout (Kafka partition ordering preserved within tasks)
  *   - `commitSync` after index commit → the checkpoint offset log written
  *     only after `foreachBatch` completes (B1/B5 for free)
  *
  * Value decoding: the Confluent wire format is a magic byte + 4-byte
  * schema id + Avro payload. The schema-registry client and the
  * `spark-avro` module are not shipped in this offline environment, so
  * `decodeConfluent` documents the seam: strip the 5-byte header in a
  * `Column` expression and hand the payload to `from_avro` (when the
  * spark-avro package is on the cluster classpath) or to
  * [[AvroDocConverter]] inside `mapPartitions` with a
  * `GenericDatumReader`. The conversion semantics themselves (flatten,
  * unions, multi-valued arrays) live in [[AvroDocConverter]] and are
  * golden-tested without a broker.
  */
object KafkaAvroSource {

  final case class KafkaConfig(
      bootstrapServers: String,
      topic: String,
      maxRecordsPerTrigger: Long = 1000L,
      startingOffsets: String = "earliest")

  /** Raw stream: (key binary, value binary, partition, offset, timestamp). */
  def stream(spark: SparkSession, cfg: KafkaConfig): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topic)
      .option("startingOffsets", cfg.startingOffsets)
      .option("maxOffsetsPerTrigger", cfg.maxRecordsPerTrigger)
      .load()

  /** Strip the Confluent wire-format header (magic 0x00 + schema id),
    * yielding the bare Avro payload for downstream decoding.
    */
  def confluentPayload(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.substring(value, 6, Int.MaxValue)
}
