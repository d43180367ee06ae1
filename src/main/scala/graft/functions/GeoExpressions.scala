package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{DataType, DoubleType, NumericType}

/** Haversine distance as ONE Catalyst expression node instead of the
  * composed trig tree. Numerically BIT-IDENTICAL to the composition
  * ([[Haversine.compute]] replays the same IEEE op order, and Spark's
  * trig builtins are `java.lang.Math` — so every 3dp-rounded oracle is
  * unaffected), but now the predicate `haversine(...) <= r` is a single
  * recognizable node the optimizer can PATTERN-MATCH — which is what
  * [[graft.plans.GeoRules.GeoRadiusPrefilter]] needs to inject the
  * scan-pushable bounding-box prefilter automatically. `prefiltered`
  * marks a node the rule already guarded (evaluation-neutral; it only
  * makes the rewrite idempotent under fixed-point optimizer batches).
  */
case class Haversine(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression, prefiltered: Boolean = false)
  extends Expression {

  override def children: Seq[Expression] = Seq(lat1, lon1, lat2, lon2)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_km expects four DOUBLE arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "haversine_km"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else Haversine.compute(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val nullCheck = gens.map(_.isNull).mkString(" || ")
    val call = s"graft.functions.Haversine.compute(" +
      gens.map(_.value).mkString(", ") + ")"
    ev.copy(code = code"""
      ${gens.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $nullCheck;
      double ${ev.value} = ${ev.isNull} ? 0.0 : $call;""")
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(lat1 = c(0), lon1 = c(1), lat2 = c(2), lon2 = c(3))
}

object Haversine {
  /** The exact IEEE op order of the former column composition
    * (`sin²(Δφ/2) + (cosφ₁·cosφ₂)·sin(Δλ/2)·sin(Δλ/2)`, left
    * associative; constant `2R` folded first) — bit-identical results.
    */
  def compute(lat1: Double, lon1: Double, lat2: Double,
      lon2: Double): Double = {
    val dLat = Math.toRadians(lat2 - lat1) / 2
    val dLon = Math.toRadians(lon2 - lon1) / 2
    val sLat = Math.sin(dLat)
    val sLon = Math.sin(dLon)
    val a = sLat * sLat +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) *
        sLon * sLon
    2 * GeoFunctions.EarthRadiusKm * Math.asin(Math.sqrt(a))
  }
}
