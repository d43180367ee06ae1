package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression,
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{GeoFunctions, Haversine}

/** Catalyst optimizer rules for the geo surface — the (c)-tier of the
  * build ladder: semantics users DECLARE naively, the optimizer makes
  * scale-correct.
  */
object GeoRules {

  /** Rewrites a naive radius predicate `haversine_km(lat, lon, LAT, LON)
    * ≤ R` (literal center + radius, either argument order, ≤ / <, or the
    * flipped ≥ / > form) into `boundingBox(...) AND original` — the
    * conservative rectangle is plain literal comparisons on the raw
    * columns, so it PUSHES into the parquet scan (row-group min/max
    * pruning on clustered layouts) and rejects the bulk before any trig
    * runs. Users no longer need to know the `withinRadiusKm` idiom: the
    * declarative predicate gets the pruned plan automatically.
    *
    * Sound because the exact-extent box never excludes a point within
    * the radius (GeoFunctionsSpec's box-never-excludes property, incl.
    * antimeridian split + polar saturation — the rule reuses
    * [[GeoFunctions.inBoundingBox]] verbatim). Idempotent under
    * fixed-point batches: the rewritten [[Haversine]] node carries
    * `prefiltered = true` and is never matched again. Registered via
    * `GraftExtensions` (`spark.sql.extensions`) or
    * `spark.experimental.extraOptimizations`.
    *
    * Scope boundary — LITERAL centers only, by design: a predicate
    * whose center is column-valued (e.g. joined in from another frame,
    * `haversine_km(lat, lon, c.clat, c.clon) <= r`) gets NO prefilter
    * from this rule, silently — a bounding box cannot be folded to
    * literals when the center varies per row, and emitting a per-row
    * box here would just re-evaluate trig per row without enabling any
    * scan pruning, so the rewrite would be cost without benefit. For
    * the join case use [[graft.sink.GeoIndex.radiusJoin]]/`knnJoin` or
    * `GeoJoin.replicateToCells`, which prune via the cell equi-join
    * (each point shuffled once, never a cross product). A negative
    * rule-spec pins this: column-valued centers leave the plan
    * unchanged.
    */
  object GeoRadiusPrefilter extends Rule[LogicalPlan] {

    private object Radius {
      /** (haversine node, centerLat, centerLon) for an un-guarded node
        * with a literal center on either side.
        */
      def unapply(e: Expression): Option[(Haversine, Double, Double)] =
        e match {
          case h @ Haversine(_, _, Literal(la: Double, DoubleType),
              Literal(lo: Double, DoubleType), false) => Some((h, la, lo))
          case h @ Haversine(Literal(la: Double, DoubleType),
              Literal(lo: Double, DoubleType), _, _, false) => Some((h, la, lo))
          case _ => None
        }
    }

    private def guard(h: Haversine, la: Double, lo: Double, r: Double,
        cmp: Expression): Expression = {
      // the point columns are whichever pair is NOT the literal center
      val (latE, lonE) = h match {
        case Haversine(Literal(_, _), Literal(_, _), plat, plon, _) =>
          (plat, plon)
        case Haversine(plat, plon, _, _, _) => (plat, plon)
      }
      // RAW resolved expressions (the Column API would re-introduce
      // unresolved nodes into an already-optimized plan)
      def dlit(v: Double) = Literal(v, DoubleType)
      val (minLat, maxLat, ranges) = GeoFunctions.boxBounds(la, lo, r)
      val latPred = And(GreaterThanOrEqual(latE, dlit(minLat)),
        LessThanOrEqual(latE, dlit(maxLat)))
      val bbox = ranges match {
        case None => latPred
        case Some(rs) => And(latPred,
          rs.map { case (l0, l1) =>
            And(GreaterThanOrEqual(lonE, dlit(l0)),
              LessThanOrEqual(lonE, dlit(l1))): Expression
          }.reduce(Or(_, _)))
      }
      And(bbox, cmp)
    }

    private def marked(h: Haversine): Haversine = h.copy(prefiltered = true)

    private def rewrite(cond: Expression): Expression = cond.transform {
      case c @ LessThanOrEqual(Radius(h, la, lo), Literal(r: Double,
          DoubleType)) if r >= 0 =>
        guard(h, la, lo, r, c.copy(left = marked(h)))
      case c @ LessThan(Radius(h, la, lo), Literal(r: Double,
          DoubleType)) if r >= 0 =>
        guard(h, la, lo, r, c.copy(left = marked(h)))
      case c @ GreaterThanOrEqual(Literal(r: Double, DoubleType),
          Radius(h, la, lo)) if r >= 0 =>
        guard(h, la, lo, r, c.copy(right = marked(h)))
      case c @ GreaterThan(Literal(r: Double, DoubleType),
          Radius(h, la, lo)) if r >= 0 =>
        guard(h, la, lo, r, c.copy(right = marked(h)))
    }

    // FILTER conditions only: there null ≡ false, so strengthening a
    // null-input comparison to And(bbox, cmp) cannot change which rows
    // survive; in a projection it could turn a NULL flag into FALSE.
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.copy(condition = rewrite(f.condition))
    }
  }
}
