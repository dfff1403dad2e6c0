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

/** ALL character n-gram md5-prefix60 keys of a string in ONE pass — the
  * PORTABLE gram-key twin of [[NGramRollingHashes]]: value-identical to
  * the composed per-window spelling
  * `transform(sequence(1, len-n+1), i -> conv(substring(md5(substr(txt,
  * i, n)), 1, 15), 16, 10))` (pinned by Md5PrefixSpec), but with no gram
  * substring, no hex render and no per-window array-of-strings
  * materialization: one codepoint-boundary scan of the UTF-8 bytes, then
  * one digest per window fed directly from the shared byte buffer.
  *
  * Window boundaries use Spark's own UTF-8 char-length table
  * ([[UTF8String.numBytesForFirstByte]]) so gram identity matches
  * `substr`'s character semantics byte-for-byte — the md5 input is
  * exactly the substring's bytes, hence the digest is exactly the
  * oracle-replayed one (no collisions-modulo caveat; this IS the
  * portable key).
  */
case class NGramMd5Prefixes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "n-gram size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_md5_prefixes requires a string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def prettyName: String = "ngram_md5_prefixes"

  override def nullSafeEval(input: Any): Any =
    NGramMd5Kernel.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramMd5Kernel.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramMd5Prefixes =
    copy(child = newChild)
}

/** Row kernel for [[NGramMd5Prefixes]] — plain object ⇒ static forwarder
  * reachable from generated Java (the NGramHashKernel pattern).
  */
object NGramMd5Kernel {
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val bufPool: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))

  def compute(input: org.apache.spark.unsafe.types.UTF8String,
              n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = input.getBytes
    // codepoint start offsets via Spark's UTF-8 char-length table — the
    // SAME walk UTF8String.substringSQL does, so window byte slices are
    // exactly the substr() results (incl. on malformed UTF-8)
    val offs = new Array[Int](input.numChars() + 1)
    var cn = 0
    var i = 0
    while (i < bytes.length) {
      offs(cn) = i; cn += 1
      i += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(i))
    }
    offs(cn) = bytes.length
    val m = cn - n + 1
    if (m <= 0)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[Long])
    val md = mdPool.get()
    val d = bufPool.get()
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      md.reset()
      md.update(bytes, offs(j), offs(j + n) - offs(j))
      md.digest(d, 0, 16)
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(j) = (v << 4) | ((d(7) & 0xffL) >>> 4)
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

object NGramMd5Prefixes {
  def ngramMd5(text: Column, n: Int): Column =
    GraftBridge.column(NGramMd5Prefixes(GraftBridge.expression(text), n))
}
