package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Dynamic-time-warping distance between two integer series — the
  * time-series similarity that tolerates local tempo shifts (a metric
  * that ramps a day late still matches its reference), where Euclidean
  * per-bucket deltas and [[graft.operators.Wasserstein]]'s
  * distribution distance both miss alignment. Classic O(m·n) min-plus
  * DP with |x−y| step cost, two-row rolling buffer, and an optional
  * Sakoe–Chiba band (|i−j| ≤ band) that caps warping and cuts the DP
  * to O(band) per row. ONE native expression call per series pair so
  * the projection stays inside whole-stage codegen (the [[LcsLength]]
  * pattern — generated code calls the static kernel).
  *
  * All arithmetic is exact long min-plus: fully engine-replayable.
  * Returns null when no band-feasible path exists (band < |m−n|) or
  * either series is empty. Nulls inside a series are rejected upstream
  * by the operator contract.
  */
case class DtwDistance(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"dtw_distance requires (array<bigint>, array<bigint>, int), " +
          s"got ${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, band: Any): Any =
    DtwDistance.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], band.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, band) => {
      val boxed = ctx.freshName("dtw")
      s"""
         |Object $boxed = graft.functions.DtwDistance.compute($a, $b, $band);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): DtwDistance =
    copy(first = f, second = s, third = t)
}

object DtwDistance {

  private final val Inf = Long.MaxValue / 4

  /** O(m·n) banded min-plus DP; null (boxed) when infeasible. Static so
    * generated code calls it directly.
    */
  def compute(xa: ArrayData, ya: ArrayData, band: Int): java.lang.Long = {
    val m = xa.numElements()
    val n = ya.numElements()
    if (m == 0 || n == 0 || band < 0 || math.abs(m - n) > band) return null
    val xs = xa.toLongArray()
    val ys = ya.toLongArray()
    val prev = Array.fill(n + 1)(Inf)
    val cur = new Array[Long](n + 1)
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, Inf)
      val lo = math.max(1, i - band)
      val hi = math.min(n, i + band)
      var j = lo
      while (j <= hi) {
        val d = math.abs(xs(i - 1) - ys(j - 1))
        val best =
          if (i == 1 && j == 1) 0L
          else {
            val diag = if (j > 1) prev(j - 1) else Inf
            val up = prev(j)
            val left = cur(j - 1)
            math.min(diag, math.min(up, left))
          }
        cur(j) = if (best >= Inf) Inf else best + d
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    if (prev(n) >= Inf) null else java.lang.Long.valueOf(prev(n))
  }

  def dtwDistance(a: Column, b: Column, band: Column): Column =
    GraftBridge.column(DtwDistance(GraftBridge.expression(a),
      GraftBridge.expression(b), GraftBridge.expression(band)))
}
