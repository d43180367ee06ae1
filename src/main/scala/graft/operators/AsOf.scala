package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with `rightTime <= leftTime` per key — the temporal-join
  * operator analytic engines ship natively (DuckDB `ASOF JOIN`,
  * kdb-style aj).
  *
  * Spark-first composition (preference (a) — no custom SparkStrategy
  * needed): tag both sides, union on (key, time), and carry the latest
  * right payload forward with `last(_, ignoreNulls)` over an ordered
  * per-key window; keep only left rows. Cost is ONE shuffle + sort on the
  * key — the same sort-merge layout a dedicated as-of physical operator
  * would use, so it scales like a regular sort-merge join (AQE handles
  * skewed keys). Right rows at exactly `leftTime` are visible (<=
  * semantics): at equal timestamps the right row sorts first.
  */
object AsOf {

  /** Left as-of join. Right payload columns come back null when no right
    * row precedes the left row (LEFT semantics).
    *
    * @param keys       equality key columns present on both sides
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c)).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"overlapping payload columns: ${leftPayload.intersect(rightPayload).mkString(", ")}")
    require(rightPayload.nonEmpty, "right side has no payload columns")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"time column types differ: ${left.schema(leftTime).dataType} vs " +
        s"${right.schema(rightTime).dataType}")

    // the ENTIRE right payload travels as one struct: carrying columns
    // individually with last(ignoreNulls) would replace a null field of
    // the newest right row with a staler row's value — and could stitch
    // fields from different right rows. The struct is non-null for every
    // right row, so ignoreNulls skips only the interleaved left rows.
    // `_t` keeps the original (comparable) time type — casting to long
    // would truncate timestamps to whole seconds.
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
      .select(keys.map(col) ++ Seq(col("_t"), col("_is_left")) ++
        leftPayload.map(col) :+
        lit(null).cast(right.select(rightPayload.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
          .alias("_rpay"): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_is_left", lit(0))
      .select(keys.map(col) ++ Seq(col("_t"), col("_is_left")) ++
        leftPayload.map(c => lit(null).alias(c)) :+
        struct(rightPayload.map(col): _*).alias("_rpay"): _*)

    // right rows sort before left rows at the same instant → `<=` semantics.
    // Two right rows tied on (key, rightTime) would otherwise be carried
    // forward plan-dependently: break the tie on the payload struct itself
    // (greatest payload wins, field by field — deterministic and
    // content-based, so safe under task retry). Skipped only when the
    // payload contains a non-orderable type (map), where ties stay
    // plan-arbitrary like DuckDB ASOF.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _ => true
    }
    val tiebreak =
      if (orderable(right.select(rightPayload.map(col): _*).schema)) Seq(col("_rpay"))
      else Nil
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t") +: col("_is_left") +: tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    taggedLeft.unionByName(taggedRight)
      .withColumn("_rpay", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(keys.map(col) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"_rpay.$c").alias(c)): _*)
  }

  /** As-of join with a LOOKBACK BOUND (pandas `merge_asof(tolerance=…)`,
    * DuckDB has no equivalent): the carried right row only attaches
    * when `leftTime − rightTime <= maxGap` — a stale quote must not
    * decorate today's trade. `maxGap` is any expression comparable
    * against the time difference (an interval literal for timestamps, a
    * numeric literal for epoch columns), so the bound stays type-safe
    * without the operator caring which time representation flows
    * through. Same single shuffle+sort as [[join]]: the right TIME
    * rides the carried payload struct and the bound is a post-window
    * projection — no extra pass, no extra join.
    */
  def joinWithTolerance(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      maxGap: Column): DataFrame = {
    val rightPayload = right.columns
      .filterNot(c => keys.contains(c) || c == rightTime).toSeq
    // carry the right time INSIDE the payload struct (renamed so it can
    // never collide), run the unbounded as-of, then null out carried
    // rows older than the bound
    val carried = join(left,
      right.withColumn("_asof_rt", col(rightTime)),
      keys, leftTime, rightTime)
    val inRange = col(leftTime) - col("_asof_rt") <= maxGap
    rightPayload.foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(inRange, col(c)))
    }.drop("_asof_rt")
  }
}
