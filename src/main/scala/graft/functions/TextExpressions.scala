package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as a single row-level expression.
  *
  * The composed built-in form (`transform(sequence(...), slice +
  * array_join)`) is evaluated interpreted with one closure dispatch and an
  * O(n) slice copy PER SHINGLE — quadratic per document and the dominant
  * cost of the minhash/Jaccard dedup benchmarks. This expression does the
  * whole document in one JVM call (still `CodegenFallback`, but the
  * fallback granularity is per row, not per element).
  *
  * Semantics match `TextFunctions.wordShingles` exactly: whitespace
  * tokens; documents shorter than `n` words yield one whole-doc shingle
  * (possibly the empty string for empty docs).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    val out: Array[String] =
      if (toks.length < n) Array(toks.mkString(" "))
      else {
        val m = toks.length - n + 1
        val res = new Array[String](m)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          res(i) = sb.toString; i += 1
        }
        res
      }
    new GenericArrayData(out.map(UTF8String.fromString(_): AnyRef))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object TextExpressions {
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
