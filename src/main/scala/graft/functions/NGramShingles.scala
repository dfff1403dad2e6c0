package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.regex.Pattern

/** Word n-gram shingling as a native Catalyst expression.
  *
  * One virtual call per row with a tight hand-written loop — versus the
  * equivalent `transform(sequence(..), i -> array_join(slice(toks,i,n)))`
  * higher-order-function pipeline, which evaluates every element through
  * interpreted expression dispatch (measured ~15× slower on the sf0.1
  * documents table, and array_distinct on top of it is quadratic).
  *
  * Semantics: whitespace-tokenize the (already normalized) input; emit all
  * consecutive n-grams joined by a single space; inputs shorter than n
  * collapse to one shingle of the whole token list (empty input → [""]).
  * `distinct = true` dedups while preserving first-occurrence order.
  */
case class NGramShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.trim
    val toks: Array[String] = if (s.isEmpty) Array.empty else ws.split(s)
    val grams: Seq[String] =
      if (toks.length < n) Seq(toks.mkString(" "))
      else {
        val out = new Array[String](toks.length - n + 1)
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          out(i) = sb.toString
          i += 1
        }
        out.toSeq
      }
    val vals = if (distinct) grams.distinct else grams
    new GenericArrayData(vals.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}

object NGramShingles {
  /** Column API: shingles of an (already normalized) text column. */
  def shingles(text: Column, n: Int, distinct: Boolean = false): Column =
    GraftBridge.column(NGramShingles(GraftBridge.expression(text), n, distinct))
}
