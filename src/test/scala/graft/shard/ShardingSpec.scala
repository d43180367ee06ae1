package graft.shard

import graft.SparkSpec
import graft.Tables

/** Service-name parsing and pruning semantics mirroring
  * ModuloShardingStrategyTest.java:35-262.
  */
class ShardingSpec extends SparkSpec {

  test("shard id parses from a fully-numeric last [_-] segment") {
    assert(ModuloSharding.shardIdFromServiceName("svc-23") == 23)
    assert(ModuloSharding.shardIdFromServiceName("nrtsearch-index-0") == 0)
    assert(ModuloSharding.shardIdFromServiceName("svc_idx_4") == 4)
  }

  test("non-numeric last segment fails fast (no silent digit-suffix parse)") {
    assertThrows[IllegalArgumentException] {
      ModuloSharding.shardIdFromServiceName("no-digits")
    }
    assertThrows[IllegalArgumentException] {
      ModuloSharding.shardIdFromServiceName("")
    }
    // 'svc-v2' must NOT map to shard 2 — the whole segment must be numeric
    assertThrows[IllegalArgumentException] {
      ModuloSharding.shardIdFromServiceName("svc-v2")
    }
    assertThrows[IllegalArgumentException] {
      ModuloSharding.shardIdFromServiceName("a7")
    }
  }

  test("overflowing shard suffix is rejected") {
    assertThrows[IllegalArgumentException] {
      ModuloSharding.shardIdFromServiceName("svc-99999999999999999999")
    }
  }

  test("shard id out of [0, maxShards) is rejected") {
    assertThrows[IllegalArgumentException] {
      ModuloSharding("f", maxShards = 8, shardId = 8)
    }
  }

  test("geo strategy is an explicit unsupported placeholder") {
    assertThrows[UnsupportedOperationException] {
      ShardingStrategyFactory.create("geo")
    }
  }

  test("unknown strategy defaults to no sharding") {
    assert(ShardingStrategyFactory.create("whatever") == NoSharding)
  }

  test("geohash coordinate columns are configurable, not hardcoded lat/lon") {
    import spark.implicits._
    val s = ShardingStrategyFactory.create("geohash", maxShards = 4,
      serviceName = "svc-2", latField = "latitude", lonField = "longitude")
    assert(s == GeohashSharding("latitude", "longitude", 4, 2))
    val pts = Seq((1L, 10.0, 20.0), (2L, -45.0, 170.0))
      .toDF("id", "latitude", "longitude")
    // validates + filters against the configured columns
    val kept = (0 until 4).map(i =>
      ShardingStrategyFactory(pts,
        GeohashSharding("latitude", "longitude", 4, i)).count()).sum
    assert(kept == 2)
    // and the same knobs flow from PipelineConfig
    val cfg = graft.config.PipelineConfig(indexName = "i",
      shardingStrategy = "geohash", maxShards = 4, serviceName = "svc-1",
      shardingLatField = "latitude", shardingLonField = "longitude")
    assert(ShardingStrategyFactory.fromConfig(cfg) ==
      GeohashSharding("latitude", "longitude", 4, 1))
  }

  test("modulo filter keeps exactly the shard's rows and they partition completely") {
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val counts = (0 until 8).map { i =>
      ShardingStrategyFactory(ev, ModuloSharding("user_id", 8, i)).count()
    }
    assert(counts.sum == total) // shards are a partition of the table
  }

  test("validate rejects a missing partition field") {
    assertThrows[IllegalArgumentException] {
      ShardingStrategyFactory(Tables.events(spark, sf),
        ModuloSharding("not_a_col", 8, 1))
    }
  }

  test("geohash shards partition completely and are spatially coherent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // deterministic lat/lon grid incl. the domain corners
    val pts = (0 until 400).map { i =>
      (i.toLong, -90.0 + (i % 20) * 9.47, -180.0 + (i / 20) * 18.9)
    }.toDF("id", "lat", "lon")
    val total = pts.count()
    val counts = (0 until 4).map { s =>
      ShardingStrategyFactory(pts, GeohashSharding("lat", "lon", 4, s)).count()
    }
    assert(counts.sum == total) // shards are a partition of the table
    assert(counts.forall(_ > 0)) // hash spreads cells across all shards
    // coherence: nearby points in the same cell land in the same shard
    val g = GeohashSharding("lat", "lon", 4, 0, precision = 8)
    val cells = Seq((1L, 10.0001, 20.0001), (2L, 10.0002, 20.0002))
      .toDF("id", "lat", "lon")
      .select(g.cell(col("lat"), col("lon")).as("c")).as[Long].collect()
    assert(cells(0) == cells(1))
    // corners stay in range after quantization clamp
    val corners = Seq((1L, 90.0, 180.0), (2L, -90.0, -180.0))
      .toDF("id", "lat", "lon")
      .select(g.cell(col("lat"), col("lon")).as("c")).as[Long].collect()
    assert(corners.forall(c => c >= 0 && c < (1L << 16)))
  }
}
