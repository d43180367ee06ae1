package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus export — the exchange format training pipelines emit
  * (one JSON object per line, sharded). The write is DETERMINISTIC end
  * to end: rows hash-partition on the id column (a pure function of
  * the value — no sampled range boundaries, no round-robin), each
  * shard sorts by id, and field order in every line is the frame's
  * column order — so two exports of the same frame are byte-identical,
  * shard by shard (spec-pinned). That reproducibility is what makes a
  * 100 TB corpus export auditable: a re-run diff is empty unless the
  * DATA changed.
  *
  * Scale shape: one hash exchange + per-shard sort; `to_json` is a
  * codegen'd projection; no driver involvement at any size.
  */
object JsonlSink {

  def write(df: DataFrame, idCol: String, dir: String, shards: Int): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.repartition(shards, col(idCol))
      .sortWithinPartitions(idCol)
      .select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(dir)
  }

  /** Read an export back with an explicit schema (exports are a
    * contract — inferring would let drift pass silently).
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.text(dir)
      .select(from_json(col("value"), schema).as("_r"))
      .select(col("_r.*"))
}
