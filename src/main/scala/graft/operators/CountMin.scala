package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan '05): a `depth × width`
  * grid of counters answering point frequency queries within an
  * ε-overcount — the fixed-size frequency summary that completes the
  * sketch family next to HLL distinct ([[graft.functions
  * .SketchAggregates]]), quantile sketch, and Misra–Gries heavy
  * hitters. CM never undercounts: `est(t) = min_r cell(r, h_r(t)) ≥
  * true(t)`, with the overcount bounded by collisions per row.
  *
  * Hashes derive from the engine-portable md5-56 convention
  * (`md5_56(r ":" term) % width`, [[Corpus.sampleHash]]), so a SQL
  * oracle rebuilds the identical grid — same reason the sampling and
  * projection operators use it.
  */
object CountMin {

  /** Row-`r` bucket of `term`: md5-56 of `"r:term"` mod `width`. The
    * hash value is non-negative (56-bit), so `%` and `pmod` agree —
    * mirrored exactly by `md5_number_lower(...) % 2^56 % width`.
    */
  private[graft] def bucket(r: Column, term: Column, width: Int): Column =
    Corpus.sampleHash(concat(r.cast("string"), lit(":"), term)) % width

  /** Build the sketch over `items(itemCol)`: returns the occupied
    * cells `(r, bucket, n)` — at most `depth × width` rows regardless
    * of input size (absent cells are zero).
    *
    * Scale shape: one map-side-combinable term aggregate collapses the
    * item stream to vocabulary space FIRST; the per-row hashing then
    * touches `vocab × depth` rows, never items, and the cell aggregate
    * is grid-sized. The grid is mergeable by cell-wise addition —
    * union two corpora by unioning their cell frames and re-summing —
    * which is what makes it the per-partition/per-window summary shape
    * at 100 TB.
    */
  def sketch(items: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1, width >= 2, got $depth/$width")
    items.groupBy(col(itemCol).as("_t"))
      .agg(count(lit(1)).as("_c"))
      .select(col("_t"), col("_c"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("r"), bucket(col("r"), col("_t"), width).as("bucket"))
      .agg(sum(col("_c")).as("n"))
  }

  /** Point-query `terms` against a built sketch: `(term, est)` with
    * `est = min_r cell(r, h_r(t))`, absent cells counting zero. The
    * probe frame is `|terms| × depth` rows joined against the
    * grid-sized cell frame — broadcast-sized on both sides.
    */
  def estimate(cells: DataFrame, terms: Seq[String], depth: Int,
      width: Int): DataFrame = {
    require(terms.nonEmpty, "no probe terms")
    val spark = cells.sparkSession
    val probes = spark.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(col("term"),
        explode(sequence(lit(0), lit(depth - 1))).as("_pr"))
      .select(col("term"), col("_pr"),
        bucket(col("_pr"), col("term"), width).as("_pb"))
    probes.join(broadcast(cells),
        col("_pr") === col("r") && col("_pb") === col("bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
