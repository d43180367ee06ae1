package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise vector sum aggregate (`TypedImperativeAggregate` with a
  * primitive `Array[Double]` buffer).
  *
  * This is the scale-critical piece of centroid computation: partial
  * aggregation happens map-side, so one k-means iteration over N vectors
  * shuffles only `numPartitions × k × dim` doubles instead of N rows (a
  * posexplode/groupBy formulation would shuffle N × dim rows). Vectors of
  * differing lengths are summed up to the longest seen (missing tail
  * treated as 0).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum expects array<float|double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def elem(a: ArrayData, i: Int): Double =
    if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf = if (buffer.length >= n) buffer
        else java.util.Arrays.copyOf(buffer, n)
      var i = 0
      while (i < n) { buf(i) += elem(arr, i); i += 1 }
      buf
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSum =
    copy(child = c.head)
}

/** Bounded top-k-by-score aggregate: keeps the `k` highest-scoring
  * `(score: double, id: long)` pairs per group, ties broken by smaller id.
  *
  * This is the scale-critical piece of a KNN join: the aggregate is
  * map-side combinable with O(k) state, so ranking N corpus rows against a
  * query shuffles only `numPartitions × k` pairs per query instead of N
  * rows (the window-rank formulation shuffles every scored row into one
  * task per query — the skew-by-construction case). Returns an
  * array<struct<score double, id long>> sorted score-descending.
  *
  * Buffer is a flat growable array compacted back to `k` whenever it
  * reaches `2k` (amortized O(log k) per row, O(k) memory, no per-row heap
  * churn); determinism comes from the (score desc, id asc) total order.
  */
case class TopKByScore(
    scoreChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else (scoreChild.dataType, idChild.dataType) match {
      case (DoubleType | FloatType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  // (score desc, id asc): total order shared by compact, merge, and eval
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  private def compact(buf: java.util.ArrayList[(Double, Long)]): Unit =
    if (buf.size > k) {
      val arr = buf.toArray(new Array[(Double, Long)](buf.size))
      java.util.Arrays.sort(arr, ord)
      buf.clear()
      var i = 0
      while (i < k) { buf.add(arr(i)); i += 1 }
    }

  override def createAggregationBuffer(): java.util.ArrayList[(Double, Long)] =
    new java.util.ArrayList[(Double, Long)](k + 1)

  override def update(buf: java.util.ArrayList[(Double, Long)],
      input: InternalRow): java.util.ArrayList[(Double, Long)] = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    if (s != null && i != null) {
      val sd = s match { case f: java.lang.Float => f.toDouble; case d: java.lang.Double => d.doubleValue() }
      val il = i match { case n: java.lang.Integer => n.toLong; case l: java.lang.Long => l.longValue() }
      buf.add((sd, il))
      if (buf.size >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(b1: java.util.ArrayList[(Double, Long)],
      b2: java.util.ArrayList[(Double, Long)]): java.util.ArrayList[(Double, Long)] = {
    b1.addAll(b2)
    compact(b1)
    b1
  }

  override def eval(buf: java.util.ArrayList[(Double, Long)]): Any = {
    val arr = buf.toArray(new Array[(Double, Long)](buf.size))
    java.util.Arrays.sort(arr, ord)
    val n = math.min(k, arr.length)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = InternalRow(arr(i)._1, arr(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.ArrayList[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.ArrayList[(Double, Long)](n + 1)
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(scoreChild = c(0), idChild = c(1))
}

object VectorAggregates {
  /** Column form: element-wise sum of an array<float|double> column. */
  def vectorSum(c: Column): Column =
    ColumnBridge.column(
      VectorSum(ColumnBridge.expression(c)).toAggregateExpression())

  /** Column form: top-k (score, id) pairs per group, score-descending. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
