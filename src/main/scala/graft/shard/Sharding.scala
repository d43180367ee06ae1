package graft.shard

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-pruning sharding strategies (SURVEY §2.3 F1–F5).
  *
  * The reference pushes `partition_field == shardId` into the Paimon
  * `ReadBuilder` as a partition filter so entire data files are pruned at
  * the manifest level (`ModuloShardingStrategy.java:129-146`; the README
  * claims ~N× I/O reduction for N shards). In Spark the same effect is
  * Catalyst partition pruning: filtering on a partition column of a
  * partitioned table prunes files before any data is read — so a strategy
  * here just produces the filter `Column`; no custom rule is needed.
  */
trait ShardingStrategy {
  /** Optional pruning predicate to apply to the source scan. */
  def filter(df: DataFrame): Option[Column]

  /** Fail fast if the table cannot support this strategy
    * (`ShardingStrategy.java:54-63` validateTable contract).
    */
  def validate(df: DataFrame): Unit = ()

  def description: String
}

/** Identity strategy — read everything (`NoShardingStrategy.java:34-51`). */
case object NoSharding extends ShardingStrategy {
  def filter(df: DataFrame): Option[Column] = None
  val description = "no sharding (reads all partitions)"
}

/** Shard by `partitionField % maxShards == shardId`, where the shard id is
  * parsed from the trailing integer of the service name
  * (`ModuloShardingStrategy.java:174-209`: `"svc-23"` → 23, validated in
  * `[0, maxShards)`).
  */
final case class ModuloSharding(partitionField: String, maxShards: Int,
    shardId: Int) extends ShardingStrategy {
  require(maxShards > 0, s"maxShards must be positive, got $maxShards")
  require(shardId >= 0 && shardId < maxShards,
    s"shard id $shardId out of range [0, $maxShards)")

  def filter(df: DataFrame): Option[Column] =
    Some(pmod(col(partitionField), lit(maxShards)) === lit(shardId))

  override def validate(df: DataFrame): Unit =
    require(df.columns.contains(partitionField),
      s"table has no partition field '$partitionField'")

  def description =
    s"modulo sharding on $partitionField (shard $shardId of $maxShards)"
}

object ModuloSharding {
  /** Parse the shard id from the service name's LAST `[_-]`-separated
    * segment, which must be entirely numeric
    * (`ModuloShardingStrategy.java:174-209` splits on `[_-]` and
    * Integer-parses the whole segment — 'svc-v2' must FAIL FAST, not
    * silently map to shard 2 via its trailing digits).
    */
  def shardIdFromServiceName(serviceName: String): Int = {
    require(serviceName != null && serviceName.nonEmpty,
      "service name must be non-empty")
    val seg = serviceName.split("[_-]").last
    require(seg.nonEmpty && seg.forall(_.isDigit),
      s"service name '$serviceName' must end in a numeric shard segment, got '$seg'")
    try seg.toInt
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"shard suffix '$seg' of '$serviceName' overflows Int")
    }
  }

  def forService(partitionField: String, maxShards: Int,
      serviceName: String): ModuloSharding =
    ModuloSharding(partitionField, maxShards,
      shardIdFromServiceName(serviceName))
}

/** EXTENSION (beyond the reference, whose `GeoShardingStrategy.java:26-44`
  * is an unimplemented placeholder we mirror under the name "geo"):
  * geographic sharding by interleaved-bit geohash cell. Each row's
  * (lat, lon) maps to a `precision`-bit Z-order cell id; the shard is
  * `hash(cell) % maxShards`, so one shard owns a stable, spatially-
  * coherent set of cells. On a table partitioned by the (precomputed)
  * cell column the filter prunes at file level exactly like modulo
  * sharding; otherwise it still pushes to the scan as a row predicate.
  */
final case class GeohashSharding(latField: String, lonField: String,
    maxShards: Int, shardId: Int, precision: Int = 12)
    extends ShardingStrategy {
  require(maxShards > 0, s"maxShards must be positive, got $maxShards")
  require(shardId >= 0 && shardId < maxShards,
    s"shard id $shardId out of range [0, $maxShards)")
  require(precision >= 1 && precision <= 30,
    s"precision must be in [1,30] bits per axis, got $precision")

  /** Z-order (Morton) cell id: `precision` bits per axis, interleaved. */
  def cell(lat: Column, lon: Column): Column = {
    val scale = (1L << precision).toDouble
    // quantize each axis to [0, 2^precision)
    val latQ = least(floor((lat + 90.0) / 180.0 * scale), lit(scale - 1)).cast("long")
    val lonQ = least(floor((lon + 180.0) / 360.0 * scale), lit(scale - 1)).cast("long")
    // interleave via the classic shift-or fold (expression-composed, so it
    // stays in codegen; precision ≤ 30 keeps the result in a signed long)
    (0 until precision).map { b =>
      val latBit = shiftleft(shiftright(latQ, b).bitwiseAND(1), 2 * b + 1)
      val lonBit = shiftleft(shiftright(lonQ, b).bitwiseAND(1), 2 * b)
      latBit.bitwiseOR(lonBit)
    }.reduce(_.bitwiseOR(_))
  }

  def filter(df: DataFrame): Option[Column] =
    Some(pmod(xxhash64(cell(col(latField), col(lonField))),
      lit(maxShards.toLong)) === lit(shardId.toLong))

  override def validate(df: DataFrame): Unit = {
    require(df.columns.contains(latField), s"table has no field '$latField'")
    require(df.columns.contains(lonField), s"table has no field '$lonField'")
  }

  def description =
    s"geohash sharding on ($latField, $lonField) " +
      s"(shard $shardId of $maxShards, ${precision}b/axis)"
}

/** Config-driven dispatch (`ShardingStrategyFactory.java:38-77`); unknown
  * names default to [[NoSharding]] like the reference.
  */
object ShardingStrategyFactory {
  /** `latField`/`lonField` configure the geohash extension's coordinate
    * columns (pipeline-config-level knobs, like `partitionField` for
    * modulo — previously hardcoded to "lat"/"lon").
    */
  def create(strategy: String, partitionField: String = "", maxShards: Int = 0,
      serviceName: String = "", latField: String = "lat",
      lonField: String = "lon"): ShardingStrategy =
    strategy.toLowerCase match {
      case "modulo" =>
        ModuloSharding.forService(partitionField, maxShards, serviceName)
      case "geo" =>
        throw new UnsupportedOperationException(
          "geo sharding is not implemented") // GeoShardingStrategy.java:26-44
      case "geohash" => // extension — see GeohashSharding
        GeohashSharding(latField, lonField, maxShards,
          ModuloSharding.shardIdFromServiceName(serviceName))
      case _ => NoSharding
    }

  /** Build the strategy a [[graft.config.PipelineConfig]] describes —
    * the reference's factory reads the same knobs from its YAML config
    * (`ShardingStrategyFactory.java:38-77`).
    */
  def fromConfig(cfg: graft.config.PipelineConfig): ShardingStrategy =
    create(cfg.shardingStrategy, cfg.shardingPartitionField, cfg.maxShards,
      cfg.serviceName, cfg.shardingLatField, cfg.shardingLonField)

  def apply(df: DataFrame, s: ShardingStrategy): DataFrame = {
    s.validate(df)
    s.filter(df).map(df.filter).getOrElse(df)
  }
}
