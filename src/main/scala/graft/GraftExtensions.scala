package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{VectorCosine, VectorDot, VectorL2Sq}

/** Session extensions registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT vector_cosine(a, b) ...")` works the
  * same as the Column API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   // or, on a live session: GraftExtensions.registerAll(spark)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def binary(name: String, f: (Expression, Expression) => Expression)
      (args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "cosine similarity of two float/double arrays"),
      binary("vector_cosine", VectorCosine) _),
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "dot product of two float/double arrays"),
      binary("vector_dot", VectorDot) _),
    (FunctionIdentifier("vector_l2sq"),
      info("vector_l2sq", "squared L2 distance of two float/double arrays"),
      binary("vector_l2sq", VectorL2Sq) _))

  /** Register into an already-built session (tests, notebooks). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
