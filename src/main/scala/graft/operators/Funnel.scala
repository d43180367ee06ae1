package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for a stage sequence
  * like view → click → purchase, a user completes stage `i` at the
  * EARLIEST event of that type occurring strictly after their stage
  * `i-1` completion time (the standard product-analytics funnel, where
  * ordering matters — a purchase before the click does not count).
  * An optional `maxGap` bounds each stage transition ("click within 7
  * days of the view"): stage `i` must land in `(t_{i-1}, t_{i-1} +
  * maxGap]` — one extra predicate in the stage join, same scale shape.
  *
  * Scale shape: one pass per stage, each a type-filtered scan (the
  * event-type predicate pushes into the parquet scan) + a user-keyed
  * min aggregate (map-side combinable) + a user-keyed equi-join against
  * the previous stage's (user, time) table — which only SHRINKS as
  * stages progress. No windows, no per-user event buffering: state per
  * user is one timestamp per stage. At 100 TB of events the cost is
  * `stages` filtered scans, not a per-user sort.
  */
object Funnel {

  /** One frame per stage PREFIX: frame `i` holds `(userCol, t_0 … t_i)`
    * for users who completed stages 0..i in order. Built in one fold so
    * each stage's scan/aggregate is planned once, not once per prefix.
    */
  private def prefixFrames(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, stages: Seq[String],
      maxGap: Option[Column]): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    stages.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (stage, i)) =>
        val hits = events.filter(col(typeCol) === stage)
          .select(col(userCol), col(tsCol))
        val gated = acc.lastOption match {
          case None => hits
          case Some(p) =>
            val inOrder = hits.join(p, userCol)
              .filter(col(tsCol) > col(s"t_${i - 1}"))
            maxGap.fold(inOrder)(g =>
              inOrder.filter(col(tsCol) <= col(s"t_${i - 1}") + g))
        }
        val t = gated.groupBy(col(userCol))
          .agg(min(col(tsCol)).as(s"t_$i"))
        // re-attach the earlier stage times (the groupBy kept only t_i)
        acc :+ acc.lastOption.fold(t)(_.join(t, userCol))
    }
  }

  /** Per-user completion times `(userCol, t_0 … t_{n-1})` for users who
    * completed ALL stages, in order (each transition within `maxGap` of
    * the previous stage when bounded; the gap is in `tsCol`'s own units).
    */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      maxGap: Option[Column] = None): DataFrame =
    prefixFrames(events, userCol, typeCol, tsCol, stages, maxGap).last

  /** One-row funnel report: per stage, how many users have completed it
    * in order, plus an id checksum pinning WHICH users (not just how
    * many). Counts are monotonically non-increasing by construction.
    */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      maxGap: Option[Column] = None): DataFrame = {
    // ONE aggregate job: the per-prefix membership legs union into a
    // stage-tagged frame and fold through conditional aggregates — N
    // single-row aggregates cross-joined would re-run a job per stage
    // over the shared prefix lineage
    val tagged = prefixFrames(events, userCol, typeCol, tsCol, stages, maxGap)
      .zipWithIndex
      .map { case (f, i) => f.select(col(userCol), lit(i).as("_stage")) }
      .reduce(_.unionByName(_))
    // coalesce: a sum over ZERO rows is NULL, but the count of an empty
    // funnel window is 0 — preserve the count-of-empty-set-is-0 contract
    // (and 0-checksum) the per-stage count(1) formulation had
    val aggs = stages.zipWithIndex.flatMap { case (s, i) => Seq(
      coalesce(sum(when(col("_stage") === i, 1).otherwise(0)), lit(0L))
        .as(s"n_$s"),
      coalesce(sum(when(col("_stage") === i, col(userCol))), lit(0L))
        .as(s"users_sum_$s"))
    }
    tagged.agg(aggs.head, aggs.tail: _*)
  }

  /** Cohort retention: bucket users by their FIRST-activity period (the
    * cohort), then count how many of each cohort are active again
    * `offset` periods later — the companion report to the funnel.
    * `periodCol` is any integer period expression already computed from
    * the timestamp (epoch day / week / month).
    *
    * Returns `(cohort, offset, n_users)` with `offset ≥ 0` (offset 0 is
    * the cohort size).
    *
    * Scale shape: distinct (user, period) activity first (one hash
    * aggregate — collapses all of a user's events in a period before
    * anything joins), a user-keyed min for the cohort, a keyed join of
    * the two user-keyed tables, one final (cohort, offset) count. Every
    * stage is map-side combinable; per-user state is one period value.
    */
  def retention(events: DataFrame, userCol: String,
      periodCol: org.apache.spark.sql.Column): DataFrame = {
    val activity = events.select(col(userCol), periodCol.cast("long").as("_p"))
      .distinct()
    val cohorts = activity.groupBy(col(userCol)).agg(min("_p").as("_cohort"))
    activity.join(cohorts, userCol)
      .groupBy(col("_cohort").as("cohort"),
        (col("_p") - col("_cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
