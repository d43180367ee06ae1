package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair left and right rows on equal keys whose
  * event times lie within `tolerance` of each other.
  *
  * A naive `|lt − rt| <= tol` predicate is a non-equi join — Spark plans
  * it as a broadcast-nested-loop (O(n·m) per key, death at scale). The
  * binning trick makes it an equi-join: bucket both sides into
  * `tolerance`-wide time bins; any qualifying pair is at most one bin
  * apart, so replicating the right side into its bin and both neighbors
  * turns the candidate search into a hash join on (keys, bin), followed
  * by the exact predicate. Cost: one 3× replication of the right side +
  * one hash shuffle — the standard interval-join layout streaming engines
  * use.
  */
object RangeJoin {

  /** @param leftTs   long-typed event time on `left` (e.g. epoch micros)
    * @param rightTs  long-typed event time on `right`, same unit
    * @param tolerance max |leftTs − rightTs|, same unit
    */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty, s"overlapping non-key columns: ${overlap.mkString(", ")}")

    val binnedLeft = left.withColumn("_bin", expr(s"$leftTs div $tolerance"))
    val binnedRight = right.withColumn("_bin",
      explode(array(expr(s"$rightTs div $tolerance - 1"),
        expr(s"$rightTs div $tolerance"),
        expr(s"$rightTs div $tolerance + 1"))))
    binnedLeft.join(binnedRight, keys :+ "_bin")
      .filter(abs(col(leftTs) - col(rightTs)) <= tolerance)
      .drop("_bin")
  }
}
