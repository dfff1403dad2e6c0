package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The engine's portable-uniform kernel, fused: the first 60 bits of
  * md5(bytes) as a long — semantically identical to the composed SQL
  * `conv(substring(md5(x), 1, 15), 16, 10)` that every deterministic
  * draw in this engine is specified with (DSIR Gumbel, DP Laplace,
  * Poisson bootstrap, shuffle permutation, LSH bands…), but ONE digest
  * and ZERO string work instead of digest → 32-char hex render →
  * substring → base-16 string parse → decimal string → numeric cast.
  * [[graft.plans.FuseMd5Uniform]] rewrites the composed pattern to this
  * expression at optimization time, so call sites keep the portable
  * spelling (the DuckDB oracle replays the hex route) and the plan runs
  * the fused kernel.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires binary input, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes): digest bytes 0..6 (56 bits) then the
    * high nibble of byte 7 — exactly the value of the first 15 hex
    * characters parsed base 16.
    */
  def compute(bytes: Array[Byte]): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def apply(c: Column): Column =
    GraftBridge.column(Md5Prefix60(GraftBridge.expression(c)))
}
