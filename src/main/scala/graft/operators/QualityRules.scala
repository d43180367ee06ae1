package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/Great-Expectations shape):
  * a rule set over a frame → one row per rule with its violation count
  * — the admission gate a training-data pipeline runs before a corpus
  * slice is allowed into the mix, and the freshness check a serving
  * sink runs after every ingest batch.
  *
  * Scale shape: every scan-expressible rule (not-null, range, custom
  * predicate, tuple uniqueness) folds into ONE map-side-combinable
  * aggregate pass over the frame — rule count changes expression
  * width, not pass count; uniqueness is `count(*) −
  * count(distinct struct(keys))`, no self-join. Only referential rules
  * join, one left-anti per foreign key (broadcast/shuffled-hash by ref
  * size). Results are a rule-count-sized frame.
  *
  * Violation semantics (documented, mirrored by the oracle):
  * `NotNull` counts nulls; `InRange` counts NON-null out-of-range
  * values (nulls are NotNull's business); `Check` counts rows where
  * the predicate is not TRUE (null predicate = violation); `Unique`
  * counts surplus rows beyond one per key tuple (null key fields
  * participate as values); `ForeignKey` counts rows whose key finds no
  * referenced row (a null key matches nothing — a violation).
  */
object QualityRules {

  sealed trait Rule { def name: String }
  final case class NotNull(name: String, column: String) extends Rule
  final case class InRange(name: String, column: String, lo: Double,
    hi: Double) extends Rule
  final case class Check(name: String, predicate: Column) extends Rule
  final case class Unique(name: String, columns: Seq[String]) extends Rule
  final case class ForeignKey(name: String, columns: Seq[String],
    ref: DataFrame, refColumns: Seq[String]) extends Rule

  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    val (scanRules, fkRules) = rules.partition {
      case _: ForeignKey => false
      case _ => true
    }
    val scanAggs = scanRules.map {
      case NotNull(n, c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(n)
      case InRange(n, c, lo, hi) =>
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)).as(n)
      case Check(n, p) =>
        sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(n)
      case Unique(n, cs) =>
        (count(lit(1)) - countDistinct(struct(cs.map(col): _*))).as(n)
      case fk: ForeignKey => throw new IllegalStateException(fk.name)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val scanRows: DataFrame =
      if (scanAggs.isEmpty) Seq.empty[(String, Long)].toDF("rule", "n_violations")
      else {
        val one = df.agg(scanAggs.head, scanAggs.tail: _*)
        // unpivot the single aggregate row into (rule, n_violations)
        // backtick-quote the alias lookup: a rule name containing a dot
        // would otherwise parse as a nested-field reference
        one.select(explode(array(scanRules.map(r =>
            struct(lit(r.name).as("rule"),
              col(s"`${r.name.replace("`", "``")}`").cast("long")
                .as("n_violations"))): _*)).as("_r"))
          .select(col("_r.rule"), col("_r.n_violations"))
      }
    val fkRows = fkRules.map { case ForeignKey(n, cs, ref, rcs) =>
      require(cs.size == rcs.size,
        s"foreign key '$n' must map columns 1:1")
      val refKeys = ref.select(rcs.zip(cs).map { case (rc, c) =>
        col(rc).as(c)
      }: _*).distinct()
      df.select(cs.map(col): _*).join(refKeys, cs, "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(n).as("rule"), col("n_violations"))
    }
    val all = fkRows.foldLeft(scanRows)(_ unionByName _)
    all.withColumn("passed", col("n_violations") === 0)
  }
}
