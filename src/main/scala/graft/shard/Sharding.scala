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

/** Config-driven dispatch (`ShardingStrategyFactory.java:38-77`); unknown
  * names default to [[NoSharding]] like the reference.
  */
object ShardingStrategyFactory {
  def create(strategy: String, partitionField: String = "", maxShards: Int = 0,
      serviceName: String = ""): ShardingStrategy =
    strategy.toLowerCase match {
      case "modulo" =>
        ModuloSharding.forService(partitionField, maxShards, serviceName)
      case "geo" =>
        throw new UnsupportedOperationException(
          "geo sharding is not implemented") // GeoShardingStrategy.java:26-44
      case _ => NoSharding
    }

  def apply(df: DataFrame, s: ShardingStrategy): DataFrame = {
    s.validate(df)
    s.filter(df).map(df.filter).getOrElse(df)
  }
}
