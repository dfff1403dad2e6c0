package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused single-pass vector arithmetic over `array<float>` /
  * `array<double>` columns, as native codegen expressions.
  *
  * The `zip_with`/`aggregate` higher-order-function formulation computes
  * the same values but evaluates every element through interpreted
  * expression dispatch and allocates an intermediate array per row — and
  * forcing a common element type needs a per-row `cast("array<double>")`
  * that copies the vector. These expressions read both element types
  * directly (mixed float/double operands allowed, e.g. a float corpus
  * against a double literal hyperplane), keep one accumulator loop per
  * row, and stay inside whole-stage codegen.
  *
  * Both operands must have the same length (enforced — a silent
  * min-length loop would return plausible-but-wrong similarities on
  * mismatched vectors); elements must be non-null.
  */
trait VectorBinaryOp { self: BinaryExpression =>
  override def dataType: DataType = DoubleType

  /** Analysis-time type check: both operands must be array<float|double>.
    * Without it a wrong-typed SQL call (e.g. `vec_dot(l_orderkey, ...)`)
    * surfaces as a ClassCastException or Janino compile error at execution
    * time instead of a clear AnalysisException.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType | IntegerType | ByteType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} requires array<float|double|int|tinyint|bigint> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def getD(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case _           => arr.getDouble(i)
  }

  protected def getter(t: DataType): String = t match {
    case FloatType   => "getFloat"
    case IntegerType => "getInt"
    case ByteType    => "getByte"
    case LongType    => "getLong"
    case _           => "getDouble"
  }

  protected def checkedLen(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"vector length mismatch: $n vs ${y.numElements()}")
    n
  }

  /** Codegen prelude: assigns the checked common length to `n`. */
  protected def lenCode(a: String, b: String, n: String): String =
    s"""
       |int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  throw new IllegalArgumentException("vector length mismatch: " +
       |    $n + " vs " + $b.numElements());
       |}
     """.stripMargin
}

/** v · w (double). */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorBinaryOp {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val ta = elemType(left); val tb = elemType(right)
    val n = checkedLen(x, y)
    var dot = 0.0; var i = 0
    while (i < n) { dot += getD(x, i, ta) * getD(y, i, tb); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |${lenCode(a, b, n)}
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.${getter(elemType(left))}($i)
         |        * (double) $b.${getter(elemType(right))}($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** v · w / (|v| |w|) in one pass (dot and both norms share the loop).
  * Zero-length or all-zero vectors yield NaN (0/0), matching the
  * higher-order-function formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorBinaryOp {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val ta = elemType(left); val tb = elemType(right)
    val n = checkedLen(x, y)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = getD(x, i, ta); val yv = getD(y, i, tb)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |${lenCode(a, b, n)}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.${getter(elemType(left))}($i);
         |  double $yv = (double) $b.${getter(elemType(right))}($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))
}
