package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling for pipeline observability: per-column non-null/null
  * counts, approximate distinct cardinality (HLL++), and min/max — the
  * "analyze table" a curation pipeline runs before and after every
  * transform to catch schema drift, null storms, and key-cardinality
  * regressions.
  *
  * ONE aggregate pass over the table, fixed-size state per column
  * (counters + an HLL sketch each, all map-side combinable), then a
  * driver-free melt to one row per column. Cost is a single scan
  * regardless of how many columns are profiled — at 100 TB the scan is
  * the floor, and this never adds a second one.
  */
object Profile {

  /** Render a min/max value as a string for the melted profile frame.
    * Exact engine-portable rendering for ints/strings/dates via plain
    * cast; FLOAT/DOUBLE columns get a deterministic 6-decimal
    * fixed-point rendering (`cast(decimal(38,6))` — half-up, trailing
    * zeros kept, e.g. `0.500000`) instead of engine float formatting,
    * which differs across engines (`1.0E-4` vs `0.0001`) and would make
    * a float-column profile a cross-engine gate hazard. Magnitudes
    * decimal(38,6) can't hold (|x| ≥ 1e32, NaN, ±Inf) fall back to the
    * engine's float string — the range is gated explicitly (under ANSI
    * mode, Spark 4's default, an overflowing decimal cast THROWS rather
    * than nulling) — documented contract, asserted by the golden spec.
    */
  private def renderValue(v: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    dt match {
      case FloatType | DoubleType =>
        when(abs(v) < lit(1e32), v.cast("decimal(38,6)").cast("string"))
          .otherwise(v.cast("string"))
      case _ => v.cast("string")
    }
  }

  /** Profile `columns` of `df` → one row per column:
    * `(col_name, n_nonnull, n_null, approx_distinct, min_v, max_v)`.
    * min/max are rendered as strings so heterogeneous column types melt
    * into one frame (exact values, engine-portable for ints/strings;
    * floating-point columns render as 6-decimal fixed-point — see
    * [[renderValue]]).
    * `rsd` is the HLL++ relative standard deviation — the 0.02 default
    * keeps the estimate comfortably inside a ±5% gate at any cardinality.
    */
  def profile(df: DataFrame, columns: Seq[String],
      rsd: Double = 0.02): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.foreach(c => require(df.columns.contains(c),
      s"profile: no column '$c' (have ${df.columns.mkString(", ")})"))
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
        approx_count_distinct(col(c), rsd).as(s"_dist_$c"),
        renderValue(min(col(c)), df.schema(c).dataType).as(s"_min_$c"),
        renderValue(max(col(c)), df.schema(c).dataType).as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"_cnt_$c").as("n_nonnull"),
        coalesce(col(s"_null_$c"), lit(0L)).as("n_null"),
        col(s"_dist_$c").as("approx_distinct"),
        col(s"_min_$c").as("min_v"),
        col(s"_max_$c").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Profile the KEYS of a JSON-string column: per key, how many rows
    * carry it and the approximate-distinct/min/max of its (stringified)
    * values — the schema-drift report for semi-structured payloads,
    * where a renamed or newly-appearing key is invisible to column-level
    * profiling. Values compare as strings (heterogeneous JSON value
    * types melt into one frame, same contract as [[profile]]'s min/max
    * rendering).
    *
    * Scale shape: one `from_json` projection + explode (no UDF), then a
    * key-keyed hash aggregate with fixed-size per-key state — distinct
    * counting is HLL++ (like [[profile]]) because an EXACT distinct
    * would shuffle (key, value)-cardinality state, corpus-sized for
    * id/timestamp-valued keys. Output size is payload-schema-sized.
    * Rows that fail to parse contribute nothing (from_json yields null).
    */
  def jsonKeyProfile(df: DataFrame, jsonCol: String,
      rsd: Double = 0.02): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    df.select(explode(from_json(col(jsonCol), MapType(StringType, StringType)))
        .as(Seq("key", "value")))
      .groupBy("key")
      .agg(count(lit(1)).as("n_present"),
        approx_count_distinct(col("value"), rsd).as("approx_values"),
        min("value").as("min_value"),
        max("value").as("max_value"))
  }
}
