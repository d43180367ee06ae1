package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-column data-layout
  * optimization (Delta `OPTIMIZE ZORDER BY`, Iceberg sort orders):
  * interleaving the bits of two dimensions and sorting the layout by
  * the result puts rows that are close in BOTH dimensions into the
  * same parquet row groups, so a conjunctive 2-D range predicate
  * skips most row groups on min/max stats — where a single-column
  * sort only ever prunes one dimension. At 100 TB the difference is
  * reading ~√sel vs sel of the corpus for a selective 2-D query.
  *
  * The z-value is pure codegen'd bit arithmetic (2·bits shift/or
  * terms, folded at plan time); the layout write is one range
  * exchange + per-partition sort. Out-of-domain inputs (negative or
  * ≥ 2^bits — the caller normalizes) raise loudly rather than
  * silently interleaving garbage bits.
  */
object Zorder {

  /** Morton interleave of two non-negative ints below `2^bits`:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val bound = 1L << bits
    def checked(c: Column, name: String) =
      when(c.isNull || c < 0 || c >= bound,
        raise_error(concat(lit(s"zValue: $name out of [0, $bound): "),
          c.cast("string"))))
        .otherwise(c.cast("long"))
    val av = checked(a, "a")
    val bv = checked(b, "b")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(av, i) bitwiseAND 1L, 2 * i)
      val bbit = shiftleft(shiftright(bv, i) bitwiseAND 1L, 2 * i + 1)
      abit bitwiseOR bbit
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` as a z-ordered parquet layout on `(colA, colB)`:
    * range-partition + sort by the interleaved key, so row-group
    * min/max stats become tight 2-D tiles. `rowGroupBytes` keeps row
    * groups small enough that skipping has granularity (the knob maps
    * to `parquet.block.size`).
    */
  def cluster(df: DataFrame, colA: String, colB: String, dir: String,
      bits: Int, shards: Int = 4,
      rowGroupBytes: Long = 128 * 1024): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.withColumn("_z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(shards, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(dir)
  }
}
