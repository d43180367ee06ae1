package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the shuffle-reduction pattern for semi and
  * anti joins whose build side is too large to broadcast as an exact set
  * but whose key membership fits a compact probabilistic filter
  * (~10 bits/key at 1% false positives: a billion-key build side is a
  * ~1.2 GB filter, and a 10M-key one ~12 MB — broadcastable where the
  * key set itself is not).
  *
  * Build: `DataFrameStatFunctions.bloomFilter` aggregates per-partition
  * sketches and merges them once at the driver — the SKETCH travels, never
  * the rows. The merged filter is then broadcast to every probe task.
  *
  * Probe: a map-side `mightContain` drops (1 − fpp) of non-matching probe
  * rows BEFORE the join shuffle, so the shuffle moves ~|matches| +
  * fpp·|probe| rows instead of |probe|. A Bloom filter has no false
  * negatives, so the exact join over the survivors returns exactly the
  * semi-join — correctness never depends on the filter, only the pruning
  * rate does.
  *
  * This is the 100 TB form of [[Corpus.decontaminate]]'s broadcast set:
  * when the eval/blocklist side outgrows an exact broadcast, swap the set
  * probe for a Bloom probe and keep the exact verify join.
  */
object BloomJoin {

  /** Semi-join `probe ⋉ build` with map-side Bloom pruning on long-typed
    * keys. `expectedKeys`/`fpp` size the filter (standard m/k formulas
    * inside Spark's implementation); overshooting `expectedKeys` only
    * wastes filter bits, undershooting only raises the false-positive
    * rate — the result stays exact either way.
    */
  def semiJoinPruned(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bfB = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bfB.value.mightContainLong(k))
    val buildKeys = build.select(col(buildKey).as("_graft_bk")).distinct()
    probe.filter(might(col(probeKey)))
      .join(buildKeys, col(probeKey) === col("_graft_bk"), "left_semi")
  }

  /** Anti-join `probe ▷ build` with the dual pruning: rows the filter
    * definitely-excludes pass through with NO join at all (the common
    * case for a selective blocklist); only might-contain rows — the
    * matches plus the fpp sliver — reach the exact anti-join.
    */
  def antiJoinPruned(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bfB = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bfB.value.mightContainLong(k))
    val buildKeys = build.select(col(buildKey).as("_graft_bk")).distinct()
    val definiteMiss = probe.filter(!might(col(probeKey)))
    val needCheck = probe.filter(might(col(probeKey)))
      .join(buildKeys, col(probeKey) === col("_graft_bk"), "left_anti")
    definiteMiss.unionAll(needCheck)
  }
}
