package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are evaluated
  * interpreted — one closure dispatch + boxing per element — which makes a
  * 64-dim cosine ~1000× slower than a fused loop. These expressions
  * generate a single primitive `while` loop inside whole-stage codegen
  * (with an equivalent interpreted fallback), so an all-pairs similarity
  * join is bounded by memory bandwidth, not expression overhead.
  *
  * Numerics: accumulation is double, element order is left-to-right —
  * bit-identical to the `VectorFunctions` HOF formulation and to a
  * sequential reference implementation. Null arrays propagate null;
  * null *elements* are treated as 0 (embeddings never carry them).
  */
abstract class VectorBinaryLoop extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Element width is resolved PER SIDE — `vector_cosine(float_col,
    * array(0.5d, …))` mixes array<float> with array<double>, and reading
    * a double slot with a float getter returns garbage bits.
    */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def leftIsFloat: Boolean = isFloat(left)
  protected def rightIsFloat: Boolean = isFloat(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Combine step in generated code: updates accumulators from x, y.
    * `acc` is a FRESH name prefix — accumulators must not use fixed
    * names, or two instances of the same expression in one codegen scope
    * (e.g. the IVF argmin over k centroids) collide and Janino falls back
    * to interpretation.
    */
  protected def genAccumulate(acc: String, x: String, y: String): String
  /** Accumulator declarations (generated code). */
  protected def genInit(acc: String): String
  /** Final result expression from accumulators (generated code). */
  protected def genResult(acc: String): String

  /** Interpreted twin of the generated loop. */
  protected def evalLoop(a: ArrayData, b: ArrayData, n: Int): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    evalLoop(x, y, n)
  }

  protected def leftAt(a: ArrayData, i: Int): Double =
    if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
  protected def rightAt(b: ArrayData, i: Int): Double =
    if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      val lGet = if (leftIsFloat) "getFloat" else "getDouble"
      val rGet = if (rightIsFloat) "getFloat" else "getDouble"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        ${genInit(acc)}
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.$lGet($i);
          double $y = (double) $b.$rGet($i);
          ${genAccumulate(acc, x, y)}
        }
        ${ev.value} = ${genResult(acc)};
      """
    })
}

/** Σ aᵢ·bᵢ in one fused loop. */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryLoop {
  override def prettyName: String = "vector_dot"
  protected def genInit(acc: String) = s"double ${acc}_dot = 0.0;"
  protected def genAccumulate(acc: String, x: String, y: String) =
    s"${acc}_dot += $x * $y;"
  protected def genResult(acc: String) = s"${acc}_dot"
  protected def evalLoop(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var i = 0
    while (i < n) { dot += leftAt(a, i) * rightAt(b, i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Cosine similarity — dot and both norms in a single pass. */
case class VectorCosine(left: Expression, right: Expression) extends VectorBinaryLoop {
  override def prettyName: String = "vector_cosine"
  protected def genInit(acc: String) =
    s"double ${acc}_dot = 0.0; double ${acc}_na = 0.0; double ${acc}_nb = 0.0;"
  protected def genAccumulate(acc: String, x: String, y: String) =
    s"${acc}_dot += $x * $y; ${acc}_na += $x * $x; ${acc}_nb += $y * $y;"
  protected def genResult(acc: String) =
    s"${acc}_dot / (java.lang.Math.sqrt(${acc}_na) * java.lang.Math.sqrt(${acc}_nb))"
  protected def evalLoop(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = leftAt(a, i); val y = rightAt(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Squared L2 distance in one pass. */
case class VectorL2Sq(left: Expression, right: Expression) extends VectorBinaryLoop {
  override def prettyName: String = "vector_l2sq"
  protected def genInit(acc: String) = s"double ${acc}_d = 0.0;"
  protected def genAccumulate(acc: String, x: String, y: String) =
    s"double ${acc}_t = $x - $y; ${acc}_d += ${acc}_t * ${acc}_t;"
  protected def genResult(acc: String) = s"${acc}_d"
  protected def evalLoop(a: ArrayData, b: ArrayData, n: Int): Double = {
    var d = 0.0; var i = 0
    while (i < n) { val t = leftAt(a, i) - rightAt(b, i); d += t * t; i += 1 }
    d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Nearest-centroid id: argmin over a k×dim centroid matrix of the
  * squared L2 distance to the input vector, ties to the LOWEST id — the
  * IVF cell assignment ([[graft.operators.Ivf]]).
  *
  * The matrix rides along as a REFERENCE OBJECT (`ctx.addReferenceObj`):
  * the generated source is IDENTICAL for every model of any k/dim by
  * CONSTRUCTION, so all Lloyd iterations, all fits and serve-side
  * assigns reuse one compiled class from the codegen cache. (The
  * `array_min(array(struct(l2sq, id)…))` tree this replaces was, it
  * turns out, also model-stable — constant folding references complex
  * literals — but only by the optimizer's grace; what it measurably
  * cost was a ~50-node tree analyzed and codegen-text-built per plan,
  * 4 plans per fit+assign, plus k struct allocations and an array_min
  * struct comparator PER ROW. One node, one fused loop, zero per-row
  * allocation here: x_sim_ivf canary context −20%, BENCH_NOTES r15.)
  *
  * Semantics match the `array_min(array(struct(l2sq, id)…)).id`
  * formulation it replaces bit-for-bit on non-null input: same
  * left-to-right double accumulation, same `min(vec.len, cen.len)`
  * truncation (the package-doc length contract), same lowest-id
  * tie-break. Null vector → null cell (the callers all filter nulls
  * before assignment; the struct formulation's null-field ordering was
  * never exercised).
  */
case class IvfAssign(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "ivf_assign needs at least one centroid")

  override def prettyName: String = "ivf_assign"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val t = x - cen(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c } // strict < keeps the lowest id on ties
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cen = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
      val get = if (childIsFloat) "getFloat" else "getDouble"
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val row = ctx.freshName("row")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
        int $best = 0;
        double $bestD = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $cen.length; $c++) {
          double[] $row = $cen[$c];
          int $n = java.lang.Math.min($v.numElements(), $row.length);
          double $d = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $t = ((double) $v.$get($i)) - $row[$i];
            $d += $t * $t;
          }
          if ($d < $bestD) { $bestD = $d; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nProbe` nearest centroid ids, ascending by (squared L2 distance,
  * id) — the IVF multi-probe assignment for a whole COLUMN of query
  * vectors ([[graft.operators.Ivf.probeCellsExpr]], the batch-retrieval
  * path). Replaces an `array_sort(array(struct(l2sq, id)…))` + slice +
  * transform tree: that formulation allocated k structs per row and
  * sorted ALL k of them to keep nProbe; this is one fused k×dim distance
  * loop into a local double[k], then an O(k·nProbe) partial selection —
  * zero struct allocation, and the centroid matrix rides as a codegen
  * reference object (model-independent source, [[IvfAssign]]).
  *
  * Ordering parity with the struct sort it replaces, including edges:
  * comparisons go through `Double.compare`, so NaN distances (a NaN
  * component in the query vector) rank LAST and tie among themselves by
  * id — exactly Spark's DoubleType ordering inside the struct sort.
  * Fewer centroids than `nProbe` returns all k, still ordered. Null
  * vector → null.
  */
case class IvfProbe(child: Expression, centroids: Array[Array[Double]],
    nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "ivf_probe needs at least one centroid")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def prettyName: String = "ivf_probe"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = centroids.length
    val ds = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val t = x - cen(i)
        d += t * t
        i += 1
      }
      ds(c) = d
      c += 1
    }
    val p = math.min(nProbe, k)
    val out = new Array[Int](p)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < p) {
      var best = -1
      var cc = 0
      while (cc < k) {
        // Double.compare: NaN sorts last, ids break exact ties — the
        // struct-sort ordering this expression replaces
        if (!used(cc) && (best < 0 || java.lang.Double.compare(ds(cc), ds(best)) < 0))
          best = cc
        cc += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cen = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
      val get = if (childIsFloat) "getFloat" else "getDouble"
      val k = ctx.freshName("k")
      val ds = ctx.freshName("ds")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val row = ctx.freshName("row")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val cc = ctx.freshName("cc")
      s"""
        int $k = $cen.length;
        double[] $ds = new double[$k];
        for (int $c = 0; $c < $k; $c++) {
          double[] $row = $cen[$c];
          int $n = java.lang.Math.min($v.numElements(), $row.length);
          double $d = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $t = ((double) $v.$get($i)) - $row[$i];
            $d += $t * $t;
          }
          $ds[$c] = $d;
        }
        int $p = java.lang.Math.min($nProbe, $k);
        int[] $out = new int[$p];
        boolean[] $used = new boolean[$k];
        for (int $j = 0; $j < $p; $j++) {
          int $best = -1;
          for (int $cc = 0; $cc < $k; $cc++) {
            if (!$used[$cc] && ($best < 0 ||
                java.lang.Double.compare($ds[$cc], $ds[$best]) < 0)) $best = $cc;
          }
          $used[$best] = true;
          $out[$j] = $best;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nBits-bit random-hyperplane LSH signature of a vector, fused into ONE
  * loop: all nBits plane dot-products accumulate per element, planes are
  * derived on the fly from `XXH64(plane<<32 | dim, seed)` (never
  * materialized or broadcast — every executor computes identical planes).
  *
  * Replaces the round-1 `aggregate(zip_with(...))` formulation, which was
  * interpreted per bit × per element (the 50-70× HOF trap this package
  * documents). Bit p is set iff plane_p · v ≥ 0.
  */
case class RhpSignature(child: Expression, nBits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")

  override def prettyName: String = "rhp_signature"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${t.simpleString}")
    }

  /** Uniform plane component in [-1, 1) for (plane p, dimension i). */
  @inline private def component(p: Int, i: Int): Double =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong((p.toLong << 32) | (i.toLong & 0xffffffffL), seed)
      .toDouble / Long.MaxValue.toDouble

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val acc = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      var p = 0
      while (p < nBits) { acc(p) += x * component(p, i); p += 1 }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < nBits) { if (acc(p) >= 0) sig |= (1L << p); p += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      val get = if (childIsFloat) "getFloat" else "getDouble"
      s"""
        int $n = $a.numElements();
        double[] $acc = new double[$nBits];
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.$get($i);
          for (int $p = 0; $p < $nBits; $p++) {
            $acc[$p] += $x * ((double) $xxh.hashLong(
              (((long) $p) << 32) | (((long) $i) & 0xffffffffL), ${seed}L)
              / (double) Long.MAX_VALUE);
          }
        }
        long $sig = 0L;
        for (int $p = 0; $p < $nBits; $p++) {
          if ($acc[$p] >= 0) $sig |= (1L << $p);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantize→dequantize roundtrip of an embedding — the
  * 4× (float32) / 8× (float64) storage-and-bandwidth reduction step an
  * ANN index applies at ingest, exposed as the roundtrip so downstream
  * distance code is unchanged and recall loss is directly measurable.
  *
  * Per vector: `scale = max|xᵢ| / 127`; `qᵢ = clamp(floor(xᵢ/scale + 0.5),
  * ±127)`; output `qᵢ·scale` as array<double>. A zero vector roundtrips
  * to zeros. `floor(x + 0.5)` (not banker's rounding) — replicable
  * bit-for-bit in any engine, which is what lets the DuckDB oracle gate
  * the whole pipeline. Once-per-row at ingest → `CodegenFallback`
  * granularity (one JVM call per row) is not on a pair-wise hot path.
  */
case class VectorQ8Roundtrip(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "vector_q8_roundtrip"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    def at(i: Int): Double =
      if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var maxAbs = 0.0
    var i = 0
    while (i < n) { val v = math.abs(at(i)); if (v > maxAbs) maxAbs = v; i += 1 }
    val out = new Array[Double](n)
    if (maxAbs > 0.0) {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        var q = math.floor(at(i) / scale + 0.5)
        if (q > 127.0) q = 127.0
        if (q < -127.0) q = -127.0
        out(i) = q * scale
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass L2 normalization to a unit vector (array<double>): the
  * ingest-time canonicalization that turns cosine ranking into plain dot
  * products. Zero vectors pass through unscaled (a 0/0 NaN fill would
  * poison every downstream distance). For null-free arrays the numerics
  * match the HOF reference `VectorFunctions.l2Normalize` bit-for-bit
  * (double accumulation left-to-right, one IEEE division per element);
  * null ELEMENTS are read as 0 like the rest of the native vector family
  * (the HOF form would propagate them — embeddings never carry null
  * elements, and [[VectorBinaryLoop]] documents the same convention).
  * The HOF form re-evaluates its norm subexpression once PER ELEMENT
  * inside the lambda (measured ~1 ms/row at dim 64), which is why the
  * ingest path gets a native expression. Once-per-row at ingest →
  * CodegenFallback granularity, same reasoning as [[VectorQ8Roundtrip]].
  */
case class VectorL2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "vector_l2_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    def at(i: Int): Double =
      if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var ss = 0.0
    var i = 0
    while (i < n) { val v = at(i); ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    if (norm == 0.0) while (i < n) { out(i) = at(i); i += 1 }
    else while (i < n) { out(i) = at(i) / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sparse random projection (Achlioptas' database-friendly
  * Johnson–Lindenstrauss transform) as ONE native expression:
  * `y_j = round(sqrt(3/outDim) · Σᵢ signs(j)(i) · x_i, 6)` with
  * `signs(j)(i) ∈ {+1, 0, −1}` at probabilities 1/6, 2/3, 1/6 keyed by
  * `md5_56("seed:i:j") % 6` — the shared [[Md5Low56]] convention, so an
  * oracle rebuilds the identical matrix from the seed alone.
  *
  * Why an expression and not an unrolled `element_at` tree (the r9
  * form): the unrolled plan carries inDim×outDim/3 nodes — ~688 at
  * 64→16 and ~100k at production 768→128, where Catalyst analysis alone
  * takes minutes — and Spark duplicated the whole tree into the parquet
  * scan's `DataFilters`, re-evaluating it interpreted per row. Here the
  * plan carries ONE node; the sign matrix builds lazily once per
  * executor JVM (`@transient lazy`, derived from three literal ints —
  * no broadcast, no driver state) and the row cost is a primitive loop
  * over the ~inDim/3 nonzero terms per output component.
  *
  * Numerics are bit-identical to the unrolled form (pinned in
  * SimilaritySpec): terms accumulate left-to-right in ascending input
  * index starting FROM the first term (`reduceLeft`, not `0.0 + …`,
  * preserving a leading −0.0), and the 6dp round replicates Spark's
  * `Round` on doubles (`BigDecimal(v).setScale(6, HALF_UP)`). A null
  * input element nullifies exactly the components it contributes to
  * (the `element_at … cast` propagation of the unrolled form). Rows
  * whose vector is shorter than `inDim` fail loudly (the unrolled form
  * raised ANSI out-of-bounds) — a truncated projection is
  * plausible-looking but meaningless.
  *
  * Once-per-row at ingest → `CodegenFallback` granularity (one JVM call
  * per row) is off the pair-wise hot path, same as [[VectorQ8Roundtrip]].
  */
case class SparseRandomProject(child: Expression, seed: Int,
    inDim: Int, outDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(inDim >= 1 && outDim >= 1,
    s"dims must be positive, got $inDim -> $outDim")

  override def prettyName: String = "sparse_random_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${t.simpleString}")
    }

  /** Nonzero matrix entries, CSR-style: component j reads input indices
    * `idx(off(j) until off(j+1))` with signs `sgn(…)`, ascending — the
    * term order the oracle mirrors. Built once per JVM per instance.
    * ONE un-destructured field: @transient on a pattern-bound lazy val
    * would not reliably mark the synthetic tuple field, and a
    * materialized 768×128 CSR must never ship with every task.
    */
  @transient private lazy val nz: (Array[Int], Array[Int], Array[Byte]) =
    SparseRandomProject.nonzeros(seed, inDim, outDim)
  private def offs: Array[Int] = nz._1
  private def idxs: Array[Int] = nz._2
  private def sgns: Array[Byte] = nz._3

  private val scale: Double = math.sqrt(3.0 / outDim)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() < inDim)
      throw new IllegalArgumentException(
        s"$prettyName: vector has ${a.numElements()} elements, need $inDim")
    val isF = childIsFloat
    val off = offs; val idx = idxs; val sg = sgns // hot-loop locals
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var p = off(j)
      val end = off(j + 1)
      var s = 0.0
      var isNull = false
      var first = true
      while (p < end && !isNull) {
        val i = idx(p)
        if (a.isNullAt(i)) isNull = true
        else {
          val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
          if (first) { s = if (sg(p) > 0) x else -x; first = false }
          else if (sg(p) > 0) s += x
          else s -= x
        }
        p += 1
      }
      out(j) =
        if (isNull) null
        else BigDecimal(scale * s)
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SparseRandomProject {
  /** `signs(j)(i) ∈ {+1, 0, −1}` with probabilities 1/6, 2/3, 1/6 keyed
    * by `md5_56("seed:i:j") % 6` — THE definition of the projection
    * matrix; `Similarity.projectionSigns` (the oracle's builder)
    * delegates here so engine and oracle cannot drift.
    */
  def sign(seed: Int, i: Int, j: Int): Int =
    (Md5Low56.hash(s"$seed:$i:$j") % 6) match {
      case 0 => 1
      case 1 => -1
      case _ => 0
    }

  /** CSR arrays (offsets, indices, signs) of the nonzero entries. */
  private[functions] def nonzeros(seed: Int, inDim: Int, outDim: Int)
      : (Array[Int], Array[Int], Array[Byte]) = {
    val offs = new Array[Int](outDim + 1)
    val idxB = Array.newBuilder[Int]
    val sgnB = Array.newBuilder[Byte]
    var nnz = 0
    var j = 0
    while (j < outDim) {
      var i = 0
      while (i < inDim) {
        val s = sign(seed, i, j)
        if (s != 0) { idxB += i; sgnB += s.toByte; nnz += 1 }
        i += 1
      }
      offs(j + 1) = nnz
      j += 1
    }
    (offs, idxB.result(), sgnB.result())
  }
}

/** Column entry points for the fused-loop vector expressions.
  *
  * Length contract: all binary ops iterate `min(a.length, b.length)`
  * elements — mismatched dimensions are NOT an error (matching the HOF
  * formulation they replaced). Callers mixing embedding versions of
  * different dimensionality must length-check upstream
  * (`size(col) === expectedDim`) — a truncated cosine is plausible-looking
  * but meaningless.
  */
/** Count of positions where two integral signature arrays agree — the
  * banded-LSH probe's `est_jaccard` numerator (count / numHashes).
  *
  * Replaces the interpreted
  * `size(filter(zip_with(a, b, (x,y) => (x===y).cast("int")), _===1))`
  * tree evaluated per candidate PAIR on the probe legs
  * (`SignatureStore.probeCore`/`selfPairs`,
  * `Dedup.minhashLshCandidates`): one closure dispatch + boxing per
  * hash per pair plus two intermediate arrays allocated per pair —
  * the interpreted-HOF trap this package documents, on the one leg of
  * the dedup path whose row count is the CANDIDATE set (which grows
  * with the corpus at 100 TB even though it is tiny at gate scale).
  *
  * Semantics pinned bit-for-bit to the HOF form (`SigMatchCountSpec`):
  * count over the min-length prefix (zip_with pads the shorter array
  * with nulls; `x === null` is null and the filter drops it), null
  * ELEMENTS never count on either side (`null === null` is null in
  * SQL), null ARRAY input → null result (`size(zip_with(null, b))` is
  * null with `spark.sql.legacy.sizeOfNull=false`, the Spark 3+
  * default this build uses).
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sig_match_count"
  override def dataType: DataType = IntegerType

  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right) && elem(left) == elem(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> or two array<int> " +
          s"arguments of the SAME element type, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isLong: Boolean = elem(left) == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) &&
          (if (isLong) x.getLong(i) == y.getLong(i)
           else x.getInt(i) == y.getInt(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val get = if (isLong) "getLong" else "getInt"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        int $c = 0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
              $a.$get($i) == $b.$get($i)) $c++;
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 64-bit SimHash of an `array<string>` token list — one pass per ROW.
  *
  * Replaces the explode + 64-conditional-sum AGGREGATE formulation that
  * `Dedup.simhashSignatures` carried since the r6 codegen migration:
  * that shape multiplies the row count by tokens-per-document and then
  * SHUFFLES on the document id to reassemble signatures — the one axis
  * that grows without bound at 100 TB — while this expression is a pure
  * map (no explode, no shuffle, whole-stage-codegen'd; measured ~4×
  * faster warm at sf0.1 and strictly better at scale, BENCH_NOTES r17).
  *
  * Semantics pinned bit-for-bit to both prior forms (`SimHash64Spec`):
  * token hash = `xxhash64(token)` (XXH64 over the UTF-8 bytes, seed 42
  * — Spark's `xxhash64` single-argument semantics); per bit position
  * the token contributes +1 if the hash bit is set else −1; the
  * signature bit is set iff the sum is STRICTLY positive (a tie → 0,
  * the HOF's `when(c > 0)`). A NULL element contributes −1 to every
  * bit (the HOF's `when(null === 1).otherwise(-1)` collapse — h = 0
  * has no set bits, which is the same contribution). Empty array → 0L;
  * null array → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${t.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L // xxhash64(null) = the seed
        else {
          val u = arr.getUTF8String(j)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        }
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (sums(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one bit-sum buffer per operator instance, reused across rows
      val buf = ctx.addMutableState("int[]", "simhashBuf",
        v => s"$v = new int[64];")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val u = ctx.freshName("u")
      val sig = ctx.freshName("sig")
      s"""
        java.util.Arrays.fill($buf, 0);
        int $n = $a.numElements();
        for (int $j = 0; $j < $n; $j++) {
          long $h = 42L; // xxhash64(null) = the seed
          if (!$a.isNullAt($j)) {
            org.apache.spark.unsafe.types.UTF8String $u = $a.getUTF8String($j);
            $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $u.getBaseObject(), $u.getBaseOffset(), $u.numBytes(), 42L);
          }
          for (int $i = 0; $i < 64; $i++) {
            if ((($h >>> $i) & 1L) == 1L) $buf[$i]++; else $buf[$i]--;
          }
        }
        long $sig = 0L;
        for (int $i = 0; $i < 64; $i++) if ($buf[$i] > 0) $sig |= (1L << $i);
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature of an `array<string>` shingle list — `numHashes`
  * seeded minima in one pass per ROW.
  *
  * Bit-equivalent to the explode + `min(xxhash64(shingle, lit(seed)))`
  * aggregate formulation `Dedup.bandedSignatures` carried (proven on all
  * 5,000 sf0.1 docs before landing, then spec-pinned): per element
  * h₀ = xxhash64 of the UTF-8 bytes at seed 42, then per hash function
  * s the candidate is `hashInt(s, h₀)` — exactly Spark's
  * `xxhash64(shingle, lit(s))` two-argument fold — and the signature
  * entry is the minimum over elements. A NULL element contributes
  * h₀ = 42 (the no-bytes hash, matching the SQL form's null-skip).
  * Empty array → all-`Long.MaxValue` signature (callers drop token-less
  * docs first, preserving the aggregate form's explode semantics); null
  * array → null.
  *
  * Why: the aggregate shape explodes rows ×shingles-per-doc and
  * SHUFFLES on the doc id to reassemble signatures; this is a pure map.
  * Locally the hash work dominates (~17% warm at sf0.1, BENCH_NOTES
  * r17) — the case for it is the shuffle it deletes at corpus scale,
  * same argument as [[SimHash64]] with an honestly smaller constant.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${t.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h0 =
        if (arr.isNullAt(j)) 42L // xxhash64's no-bytes hash = the seed
        else {
          val u = arr.getUTF8String(j)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        }
      var s = 0
      while (s < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(s, h0)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.addMutableState("long[]", "mhMins",
        v => s"$v = new long[$numHashes];")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val h0 = ctx.freshName("h0")
      val h = ctx.freshName("h")
      val u = ctx.freshName("u")
      s"""
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $a.numElements();
        for (int $j = 0; $j < $n; $j++) {
          long $h0 = 42L;
          if (!$a.isNullAt($j)) {
            org.apache.spark.unsafe.types.UTF8String $u = $a.getUTF8String($j);
            $h0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $u.getBaseObject(), $u.getBaseOffset(), $u.numBytes(), 42L);
          }
          for (int $s = 0; $s < $numHashes; $s++) {
            long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($s, $h0);
            if ($h < $mins[$s]) $mins[$s] = $h;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          java.util.Arrays.copyOf($mins, $numHashes));
      """
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object VectorExpressions {
  def sigMatchCount(a: Column, b: Column): Column =
    column(SigMatchCount(expression(a), expression(b)))
  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(shingles), numHashes))
  def dotFast(a: Column, b: Column): Column = column(VectorDot(expression(a), expression(b)))
  def cosineFast(a: Column, b: Column): Column = column(VectorCosine(expression(a), expression(b)))
  def l2sqFast(a: Column, b: Column): Column = column(VectorL2Sq(expression(a), expression(b)))
  def rhpSignature(v: Column, nBits: Int, seed: Long): Column =
    column(RhpSignature(expression(v), nBits, seed))
  def ivfAssign(v: Column, centroids: Array[Array[Double]]): Column =
    column(IvfAssign(expression(v), centroids))
  def ivfProbe(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    column(IvfProbe(expression(v), centroids, nProbe))
  def q8Roundtrip(v: Column): Column = column(VectorQ8Roundtrip(expression(v)))
  def l2NormalizeFast(v: Column): Column = column(VectorL2Normalize(expression(v)))
  def sparseRandomProject(v: Column, seed: Int, inDim: Int, outDim: Int): Column =
    column(SparseRandomProject(expression(v), seed, inDim, outDim))
}
