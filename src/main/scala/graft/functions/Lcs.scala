package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length between two token arrays — the
  * kernel of ROUGE-L ([[graft.operators.Rouge]]). Classic O(m·n) DP
  * with a two-row rolling buffer (O(min-side) memory, no m×n table),
  * run as ONE native expression call per pair so the whole-stage
  * codegen span stays intact (the generated code calls the static
  * [[LcsLength.compute]] kernel — same shape as Spark's own
  * `levenshtein`, which is char-grain where this is token-grain).
  *
  * Per-row cost is quadratic in token counts, which is fine at
  * generation-eval grain (candidates/references are single responses,
  * not corpora); the operator stays a shuffle-free projection at any
  * pair count. Null tokens inside an array match nothing.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_length requires two array<string> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any =
    LcsLength.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.LcsLength.compute($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {

  /** O(m·n) two-row DP. Static so generated code calls it directly. */
  def compute(ca: ArrayData, ra: ArrayData): Int = {
    val m = ca.numElements()
    val n = ra.numElements()
    if (m == 0 || n == 0) return 0
    val c = new Array[UTF8String](m)
    var i = 0
    while (i < m) { c(i) = if (ca.isNullAt(i)) null else ca.getUTF8String(i); i += 1 }
    val r = new Array[UTF8String](n)
    var j = 0
    while (j < n) { r(j) = if (ra.isNullAt(j)) null else ra.getUTF8String(j); j += 1 }
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    i = 1
    while (i <= m) {
      val ci = c(i - 1)
      j = 1
      while (j <= n) {
        cur(j) =
          if (ci != null && ci.equals(r(j - 1))) prev(j - 1) + 1
          else if (prev(j) >= cur(j - 1)) prev(j) else cur(j - 1)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }

  def lcsLength(candidate: Column, reference: Column): Column =
    GraftBridge.column(LcsLength(
      GraftBridge.expression(candidate), GraftBridge.expression(reference)))
}
