package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; these are for
  * the shapes AQE does not cover:
  *
  *   - [[saltedAgg]]: two-phase aggregation — rows are spread across
  *     `salts` sub-keys, partially aggregated, then re-aggregated on the
  *     true key. The first (wide) shuffle distributes a hot key over
  *     `salts` reducers; the second shuffle carries only
  *     `keys × salts` pre-aggregated rows. Correct for any
  *     associative-and-commutative aggregate (sum/count/min/max).
  *   - [[saltedJoin]]: salted shuffle join — replicates the build side
  *     once per salt so a skewed probe key fans out across `salts`
  *     reducers (broadcast joins need no salting: no reducer to overload).
  */
object Skew {

  /** Salt in [0, salts), a DETERMINISTIC hash of `spreadCols`. Determinism
    * matters: a nondeterministic salt (row ids, rand) used as a shuffle
    * key double-counts or drops rows when failed map tasks recompute with
    * different values. The trade-off: byte-identical duplicate rows
    * collide into one bucket — pass a row-unique column (an ingestion id)
    * as `spreadCols` when the hot key is made of exact duplicates.
    */
  def saltCol(salts: Int, spreadCols: Seq[Column]): Column =
    pmod(xxhash64(spreadCols: _*), lit(salts.toLong))

  final case class AggSpec(colName: String, agg: String) {
    require(Set("sum", "count", "min", "max").contains(agg),
      s"'$agg' is not algebraic-mergeable (sum/count/min/max only)")
  }

  /** Two-phase (salted) aggregation equivalent to
    * `df.groupBy(keys).agg(specs)` but skew-tolerant. Count re-aggregates
    * as a sum of partial counts; min/max/sum merge with themselves.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], specs: Seq[AggSpec],
      salts: Int = 16, spreadCols: Seq[String] = Nil): DataFrame = {
    val spread = if (spreadCols.nonEmpty) spreadCols else df.columns.toSeq
    val salted = df.withColumn("_salt", saltCol(salts, spread.map(col)))
    val partialAggs = specs.map { s =>
      val fn = s.agg match {
        case "sum" => sum(col(s.colName))
        case "count" => count(col(s.colName))
        case "min" => min(col(s.colName))
        case "max" => max(col(s.colName))
      }
      fn.as(s"_p_${s.agg}_${s.colName}")
    }
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = specs.map { s =>
      val p = col(s"_p_${s.agg}_${s.colName}")
      val fn = s.agg match {
        case "sum" => sum(p)
        case "count" => sum(p) // partial counts merge by summing
        case "min" => min(p)
        case "max" => max(p)
      }
      fn.as(s"${s.agg}_${s.colName}")
    }
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted SHUFFLE join for a skewed probe side against a build side too
    * large to broadcast (a broadcast join needs no salting — it has no
    * reducer to overload): probe rows get a spread salt, the build side
    * is replicated once per salt value, and the shuffle key becomes
    * (key, salt), so a hot key's rows land on `salts` reducers.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      keys: Seq[String], salts: Int = 16, spreadCols: Seq[String] = Nil): DataFrame = {
    val spread = if (spreadCols.nonEmpty) spreadCols else probe.columns.toSeq
    val saltedProbe = probe.withColumn("_salt", saltCol(salts, spread.map(col)))
    val explodedBuild = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedProbe.join(explodedBuild, keys :+ "_salt").drop("_salt")
  }
}
