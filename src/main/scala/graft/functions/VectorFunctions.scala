package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns as pure
  * higher-order-function compositions (`zip_with`/`aggregate`) — codegen'd
  * by Catalyst, no UDF, no serialization of the array to the JVM heap per
  * element. All math is done in double after an explicit element cast so
  * results are deterministic and engine-comparable.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ — sequential left-to-right accumulation (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe only insofar as null vectors yield null. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Squared L2 distance (avoids the sqrt when only ranking matters). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** L2-normalize to a unit vector (`array<double>`): the ingest-time
    * canonicalization that turns cosine ranking into plain dot products
    * (and makes int8 quantization error uniform across rows). Zero vectors
    * pass through unscaled (a 0/0 NaN fill would poison every downstream
    * distance). Pure per-row projection — no shuffle, no state.
    *
    * Delegates to the native [[VectorExpressions.VectorL2Normalize]]: the
    * HOF composition (`transform(a, _ / norm2(a))`) re-evaluates the norm
    * subexpression once per ELEMENT inside the lambda — O(dim²)
    * interpreted work per row, ~1 ms/row at dim 64.
    */
  def l2Normalize(a: Column): Column = VectorExpressions.l2NormalizeFast(a)
}
