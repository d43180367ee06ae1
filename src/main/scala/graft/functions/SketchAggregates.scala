package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (`TypedImperativeAggregate` with a
  * bounded counter map) — frequent-item counting with HARD O(k) state no
  * matter the vocabulary. The plain `groupBy(term).count` holds
  * distinct-terms state per partition; on web-scale text (typos, urls,
  * hashes) the vocabulary grows with the corpus and so does that state.
  * This sketch never does: at most `k` counters survive in any buffer,
  * partials merge by the Agarwal et al. mergeable-summaries rule, and
  * the result carries deterministic GUARANTEES rather than exact counts:
  *
  *   - every item with true frequency > N/(k+1) is PRESENT;
  *   - each reported count is an UNDER-estimate by at most N/(k+1);
  *   - with k ≥ distinct(items), no decrement ever fires and counts are
  *     EXACT (how the oracle gate pins it on a bounded vocabulary).
  *
  * Update: +1 if tracked, insert if room, else decrement ALL counters
  * (dropping zeros) — one shared decrement per overflow, amortized O(1)
  * per row. Merge: sum counters, then subtract the (k+1)-largest count
  * from every survivor and drop non-positives (keeps the error bound
  * additive across partials). Output: `array<struct<item string, count
  * long>>` sorted (count desc, item asc).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects a string column, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else {
        // the MG step: one shared decrement, zeros evicted
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b2.forEach { (s, c) =>
      val cur = b1.get(s)
      b1.put(s, cur + c)
    }
    if (b1.size > k) {
      // subtract the (k+1)-largest count from all, drop non-positives
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val arr = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1
    }
    java.util.Arrays.sort(arr,
      Ordering.by[(String, Long), (Long, String)] { case (s, c) => (-c, s) })
    val rows = new Array[Any](arr.length)
    i = 0
    while (i < arr.length) {
      rows(i) = InternalRow(UTF8String.fromString(arr(i)._1), arr(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    buf.forEach { (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      entries.add((b, c))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    entries.forEach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, Long](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGries =
    copy(child = c(0))
}

object SketchAggregates {
  /** Column form: Misra–Gries heavy hitters over a string column —
    * `array<struct<item, count>>`, (count desc, item asc)-sorted, O(k)
    * state per group however large the item domain.
    */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())
}
